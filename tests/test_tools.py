"""Companion tools (reference parity: font_speciment / font_transform /
spritify; the --render rasterization path is beyond the reference)."""

import os

import numpy as np
import pytest

from svgrasterize_tpu.core.png import read_png


@pytest.fixture()
def icon_dir(tmp_path):
    for name, color in (("a", "red"), ("b", "blue"), ("c", "green")):
        (tmp_path / f"{name}.svg").write_text(
            f'<svg xmlns="http://www.w3.org/2000/svg" width="20" height="20">'
            f'<circle cx="10" cy="10" r="8" fill="{color}"/></svg>'
        )
    return str(tmp_path)


def test_spritify_pack_and_render(icon_dir, tmp_path):
    from svgrasterize_tpu.tools.spritify import main

    out_svg = str(tmp_path / "sprite.svg")
    out_png = str(tmp_path / "sprite.png")
    assert main([icon_dir, out_svg, "-s", "32", "--render", out_png]) == 0
    assert os.path.getsize(out_svg) > 0
    img = np.asarray(read_png(open(out_png, "rb")))
    assert img.shape[-1] == 4 and (img[..., 3] > 0).sum() > 100


def test_font_transform_roundtrip(tmp_path):
    from svgrasterize_tpu.tools.font_transform import main

    src = tmp_path / "font.svg"
    src.write_text(
        '<svg xmlns="http://www.w3.org/2000/svg"><defs>'
        '<font id="f"><font-face font-family="T" units-per-em="1000"/>'
        '<glyph unicode="a" horiz-adv-x="500" d="M0 0 L100 0 L100 100 Z"/>'
        "</font></defs></svg>"
    )
    dst = tmp_path / "out.svg"
    assert main(["scale(2)", str(src), str(dst)]) == 0
    text = dst.read_text()
    assert "M0,0" in text.replace(" ", "") or "200" in text
