"""Font specimen sheets: render every glyph of a font as a labeled grid.

Equivalent of the reference's font_speciment.py (reference repo, 183 LoC):
glyphs are grouped by unicodedata category, laid out on a `cols`-wide grid at
`size` px per cell, with the font name as a title and per-category rules.
Output formats: svg (path embedded in a document), path (raw path data),
json (glyph name -> unicode map), png (rasterized on device).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import unicodedata

from ..core.layer import Layer
from ..core.transform import Transform
from ..geom.path import Path
from ..text.fonts import DEFAULT_FONTS, Font, FontsDB

DEFAULT_COLS = 42
DEFAULT_SIZE = 32.0

_SKIP_CATEGORIES = {"Cc", "Zs", "Cf", "Zl", "Zp"}  # control/space-like

_SVG_DOC = """\
<svg width="{width}" height="{height}" viewBox="0 0 {width} {height}">
  <path fill="#ffffff" d="M0,0 H{width} V{height} H-{width}Z" />
  <path fill="#000000" d="{path}" />
</svg>
"""


def specimen(
    font: Font,
    size: float = DEFAULT_SIZE,
    cols: int = DEFAULT_COLS,
    show_baseline: bool = False,
) -> tuple[Path, tuple[float, float]]:
    """Build the specimen sheet path; returns (path, (width, height))."""
    label_font = font
    if os.path.isfile(DEFAULT_FONTS):
        db = FontsDB()
        db.register_file(DEFAULT_FONTS)
        label_font = db.resolve("sans") or font

    # group glyphs by unicode category
    groups: dict[str, dict[str, object]] = {}
    for key, glyph in font.glyphs.items():
        try:
            category = unicodedata.category(key)
        except TypeError:
            category = "Other"
        groups.setdefault(category, {})[key] = glyph

    cell_scale = (size - 4) / font.units_per_em
    to_cell = (
        Transform()
        .translate(2, 2)
        .scale(cell_scale, -cell_scale)
        .translate(0, -font.units_per_em)
    )

    subpaths: list = []
    row = 0

    title, title_width = label_font.str_to_path(size / 1.5, f"{font.family} {size}")
    title_tr = Transform().translate((cols * size - title_width) / 2.0, size)
    subpaths.extend(title.transform(title_tr).subpaths)

    for category, glyphs in sorted(groups.items()):
        if category in _SKIP_CATEGORIES:
            continue
        if all(g.path.is_empty() for g in glyphs.values()):
            continue

        # category header: label + horizontal rule
        row += 1
        x, y = 2.0, (row + 0.5) * size
        header, header_width = label_font.str_to_path(size / 1.5, category + " ")
        subpaths.extend(header.transform(Transform().translate(x, y + size * 0.2)).subpaths)
        rule = Path.from_svg(
            f"M{x + header_width},{y} h{cols * size - header_width - size / 3.0}Z"
        )
        subpaths.extend(rule.stroke(2).subpaths)

        index = 0
        for _key, glyph in sorted(glyphs.items()):
            col = index % cols
            if col == 0:
                row += 1
                if show_baseline:
                    baseline = Path.from_svg(
                        f"M{header_width * 0.5},{size * (row + 1)} "
                        f"h{cols * size - header_width}Z"
                    )
                    subpaths.extend(baseline.stroke(0.25).subpaths)

            cell = Transform().translate(col * size, row * size)
            if glyph.advance > font.units_per_em:
                cell = cell.scale(font.units_per_em / glyph.advance)
            placed = glyph.path.transform(cell @ to_cell)
            if placed.subpaths:
                subpaths.extend(placed.subpaths)
                index += 1

    return Path(subpaths), (cols * size, (row + 1) * size)


def _load_font(spec: str) -> Font | None:
    """Load a font from an SVG file, a TTF (via ttf2svg), or by family name."""
    filename = spec
    _, ext = os.path.splitext(spec)
    if ext.lower() in (".ttf", ".otf"):
        converted = f"/tmp/{os.path.splitext(os.path.basename(spec))[0]}.svg"
        from .ttf2svg import convert

        convert(spec, converted)
        filename = converted

    db = FontsDB()
    if os.path.isfile(filename):
        db.register_file(filename)
        db.resolve("")  # force the lazy load
        fonts = db.all_fonts()
        return fonts[0] if fonts else None
    sys.stderr.write("[info] not a file; resolving as a font family name\n")
    db.register_file(DEFAULT_FONTS)
    return db.resolve(spec)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="render a font specimen sheet")
    parser.add_argument("font", help="SVG/TTF font file, or a font family name")
    parser.add_argument("output", nargs="?", help="output file (format from extension)")
    parser.add_argument("-f", "--format", choices=["svg", "path", "json", "png"])
    parser.add_argument("-s", "--size", type=float, default=DEFAULT_SIZE)
    parser.add_argument("--cols", type=int, default=DEFAULT_COLS)
    parser.add_argument("-b", "--baseline", action="store_true", help="show baselines")
    args = parser.parse_args(argv)

    font = _load_font(args.font)
    if font is None:
        sys.stderr.write(f"[error] cannot load font: {args.font}\n")
        return 1

    path, (width, height) = specimen(font, args.size, args.cols, args.baseline)
    out_format = args.format or (
        os.path.splitext(args.output)[1][1:].lower() if args.output else "png"
    )
    output = args.output or "-"

    if out_format == "json":
        with open(output, "w", encoding="utf-8") as file:
            json.dump(font.glyph_names(), file)
    elif out_format == "path":
        with open(output, "w", encoding="utf-8") as file:
            file.write(path.to_svg())
    elif out_format == "svg":
        with open(output, "w", encoding="utf-8") as file:
            file.write(_SVG_DOC.format(width=int(width), height=int(height), path=path.to_svg()))
    elif out_format == "png":
        import jax.numpy as jnp

        tr = Transform().matrix(0, 1, 0, 1, 0, 0)
        result = path.mask(tr)
        if result is None:
            sys.stderr.write("[error] nothing to render\n")
            return 1
        mask, _hull = result
        # black glyphs on a white background
        white = jnp.asarray([1.0, 1.0, 1.0, 0.0])
        image = jnp.asarray([1.0, 1.0, 1.0, 1.0]) - mask.image * white
        layer = Layer(image, (0, 0), pre_alpha=False, linear_rgb=True)
        with open(output, "wb") as file:
            layer.write_png(file)
    else:
        sys.stderr.write(f"[error] unsupported format: {out_format}\n")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
