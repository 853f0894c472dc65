"""Golden-image tests: full pipeline vs the reference renderer on demo icons.

Each icon is rendered at a small width by both implementations with the same
transform/viewport and compared as final composited canvases.  Tolerances
allow AA-edge and stroke-join differences (f32 vs f64, different curve
flattening and offset heuristics) while catching any structural regression.
"""

import numpy as np
import pytest

from svgrasterize_tpu import scene_from_filepath
from svgrasterize_tpu.core.layer import merge_at
from svgrasterize_tpu.core.transform import Transform

WIDTH = 96

# (icon, allowed fraction of pixels with channel diff > 16/255) —
# the full demo/icons suite.  With reference-matched adaptive curve
# flattening every icon measures 0.000% (stroke-heavy rust/tiger
# included); the small budgets below only absorb fp-order noise.
ICONS = [
    ("python.svg", 0.002),
    ("fontforge.svg", 0.002),
    ("format-fill-color.svg", 0.002),
    ("gamepad.svg", 0.002),
    ("rust.svg", 0.002),
    ("tiger.svg", 0.002),
    ("firefox-2019.svg", 0.002),
    ("firefox.svg", 0.002),
    ("games-solve.svg", 0.002),
    ("inkscape.svg", 0.002),
    ("kde.svg", 0.002),
    ("office.svg", 0.002),
    ("present.svg", 0.002),
]


def _render_ours(path: str):
    import jax.numpy as jnp

    scene, _ids, size = scene_from_filepath(path, width=WIDTH)
    w, h = int(size[0]), int(size[1])
    tr = Transform().matrix(0, 1, 0, 1, 0, 0)
    layer, _hull = scene.render(tr, viewport=(0, 0, h, w), linear_rgb=False)
    canvas = jnp.zeros((h, w, 4), dtype=jnp.float32)
    layer = layer.convert(pre_alpha=True, linear_rgb=False)
    canvas = merge_at(canvas, layer.image, layer.offset)
    return np.asarray(canvas)


def _render_reference(reference, path: str):
    scene, _ids, size = reference.svg_scene_from_filepath(path, width=WIDTH)
    w, h = int(size[0]), int(size[1])
    tr = reference.Transform().matrix(0, 1, 0, 1, 0, 0)
    layer, _hull = scene.render(tr, viewport=[0, 0, h, w], linear_rgb=False)
    layer = layer.convert(pre_alpha=True, linear_rgb=False)
    canvas = np.zeros((h, w, 4))
    reference.canvas_merge_at(canvas, layer.image, layer.offset)
    return canvas


@pytest.mark.parametrize("icon,tolerance", ICONS)
def test_icon_matches_reference(reference, demo_dir, icon, tolerance):
    import os
    import warnings

    path = os.path.join(demo_dir, "icons", icon)
    ours = _render_ours(path)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        theirs = _render_reference(reference, path)
    if ours.shape != theirs.shape:
        # rust.svg declares width="100%" with a viewBox: the reference
        # mis-parses the percentage as 100px and letterboxes the content
        # into a square canvas (svgrasterize.py:3546-3548); we resolve it
        # against the viewBox and keep the aspect.  Re-render the oracle
        # with the root width/height stripped so it takes its own viewBox
        # sizing path — identical geometry, no letterbox.
        import re

        text = open(path, encoding="utf-8").read()
        text = re.sub(
            r'(<svg\b[^>]*?)\s(?:width|height)="[^"]*"',
            r"\1", re.sub(r'(<svg\b[^>]*?)\s(?:width|height)="[^"]*"', r"\1", text),
        )
        scene, _ids, size = reference.svg_scene_from_str(text, width=WIDTH)
        w, h = int(size[0]), int(size[1])
        tr = reference.Transform().matrix(0, 1, 0, 1, 0, 0)
        layer, _hull = scene.render(tr, viewport=[0, 0, h, w], linear_rgb=False)
        layer = layer.convert(pre_alpha=True, linear_rgb=False)
        theirs = np.zeros((h, w, 4))
        reference.canvas_merge_at(theirs, layer.image, layer.offset)
    assert ours.shape == theirs.shape

    diff = np.abs(ours - theirs).max(axis=-1)
    bad = (diff > 16 / 255).mean()
    assert bad <= tolerance, f"{icon}: {bad:.4f} of pixels differ by >16/255"
    # interiors must be essentially exact
    assert np.median(diff) < 1 / 255
