"""Demo-scale golden parity: the lowered pipeline vs the reference's PNGs.

Renders the reference's three headline demos (material-design, icons,
prompt — /root/reference/demo/) at native size through `render_fast` (the
same path the CLI and serving use) and compares against the reference
implementation's own committed golden PNGs.  Thresholds are the parity
levels measured in round 1 (PARITY.md): any regression of the headline
numbers fails here.

Marked slow: a demo-scale render through the lowered pipeline is
compile-heavy on the CPU test backend.  Run with `pytest -m slow`.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import svgrasterize_tpu.render_plan as rp
from svgrasterize_tpu import scene_from_filepath
from svgrasterize_tpu.core.png import read_png
from svgrasterize_tpu.core.transform import Transform
from svgrasterize_tpu.text.fonts import DEFAULT_FONTS, FontsDB

DEMO = "/root/reference/demo"

# (svg, golden png, max allowed count of pixels with any channel diff > 8,
# max allowed channel diff) on images COMPOSITED OVER WHITE — round-2
# measured levels (adaptive reference-matched flattening + group-level clip
# passes + sealed stroke contours: prompt 0 px / max 1, material 2 px /
# max 9, icons 0 px / max 1) plus margin.  Over-white, not raw channels:
# the reference's stroke outlines do not close exactly, which leaks ~1e-3
# winding rightward; its golden PNGs store that as de-premultiplied RGB
# garbage on alpha<=2/255 pixels (icons.png rows 248/92).  Our outlines
# seal exactly (geom/stroke.py), so those invisible pixels differ by up to
# 187/255 raw while the composited image matches to 1/255.
CASES = [
    ("material-design.svg", "material-design.png", 8, 16),
    ("icons.svg", "icons.png", 8, 8),
    ("prompt.svg", "prompt.png", 8, 8),
]


@pytest.fixture(scope="module")
def fonts_db():
    db = FontsDB()
    db.register_file(DEFAULT_FONTS)
    return db


def _over_white(img8: np.ndarray) -> np.ndarray:
    """Straight-alpha RGBA (int16, 0..255) composited over opaque white."""
    alpha = img8[..., 3:].astype(np.float64) / 255.0
    return img8[..., :3].astype(np.float64) * alpha + 255.0 * (1.0 - alpha)


@pytest.mark.slow
@pytest.mark.parametrize("svg,golden,npx8,maxdiff", CASES)
def test_demo_parity(svg, golden, npx8, maxdiff, fonts_db):
    path = os.path.join(DEMO, svg)
    if not os.path.isfile(path):
        pytest.skip("reference demo assets not available")
    scene, _ids, size = scene_from_filepath(path, fonts=fonts_db)
    w, h = int(size[0]), int(size[1])
    out = rp.render_fast(
        scene, Transform().matrix(0, 1, 0, 1, 0, 0), (0, 0, h, w), False
    )
    layer, _hull = out
    img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
    img8 = np.clip(np.round(img * 255), 0, 255).astype(np.int16)

    with open(os.path.join(DEMO, golden), "rb") as f:
        gold = np.asarray(read_png(f), dtype=np.int16)
    aligned = np.zeros_like(gold)
    aligned[: img8.shape[0], : img8.shape[1]] = img8[: gold.shape[0], : gold.shape[1]]
    diff = np.abs(_over_white(aligned) - _over_white(gold)).max(axis=-1)
    count = int((diff > 8).sum())
    assert count <= npx8, f"{svg}: {count} pixels >8/255 over white (limit {npx8})"
    assert diff.max() <= maxdiff, f"{svg}: max diff {diff.max():.1f} (limit {maxdiff})"


@pytest.mark.slow
def test_material_live_reference_exact(fonts_db, reference):
    """material-design vs the LIVE reference implementation: exact to <1/255.

    The committed golden PNG drifts from the reference's own current code by
    2 px (bubble_chart circle AA, alpha 34 vs 43.08 at (1031,358)/(1033,360)
    — verified round 5 by running /root/reference/svgrasterize.py directly:
    it reproduces OUR value, so the golden was rendered by an older version).
    Against the living implementation our whole-image max channel diff over
    white is 0.51/255; pin it at <=2 so any real regression fails loudly.
    """
    path = os.path.join(DEMO, "material-design.svg")
    if not os.path.isfile(path):
        pytest.skip("reference demo assets not available")
    scene, _ids, size = scene_from_filepath(path, fonts=fonts_db)
    w, h = int(size[0]), int(size[1])
    layer, _hull = rp.render_fast(
        scene, Transform().matrix(0, 1, 0, 1, 0, 0), (0, 0, h, w), False
    )
    img = np.asarray(layer.convert(pre_alpha=False, linear_rgb=False).image)
    ours8 = np.clip(np.round(img * 255), 0, 255).astype(np.int16)

    ref_scene, _i, ref_size = reference.svg_scene_from_filepath(path)
    ref_layer, _ = ref_scene.render(
        reference.Transform().matrix(0, 1, 0, 1, 0, 0),
        viewport=np.array([0, 0, h, w], dtype=int),
    )
    base = np.ones((h, w, 4), dtype=reference.FLOAT)
    canvas = reference.canvas_merge_at(base, ref_layer.image, ref_layer.offset)
    ref_img = reference.color_pre_to_straight_alpha(canvas.copy())
    ref8 = np.clip(np.round(ref_img * 255), 0, 255).astype(np.int16)

    diff = np.abs(_over_white(ours8) - _over_white(ref8)).max(axis=-1)
    assert diff.max() <= 2, f"max diff vs live reference {diff.max():.2f}/255"
