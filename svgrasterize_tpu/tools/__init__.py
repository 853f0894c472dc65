"""Companion tools: font specimen sheets, font transforms, sprite packing,
TTF conversion — the equivalents of the reference's helper scripts
(font_speciment.py, font_transform.py, spritify.py, ttf2svg)."""
