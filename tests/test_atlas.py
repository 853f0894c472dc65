"""Batch atlas rendering: single-device vs sharded vs per-document."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from svgrasterize_tpu import scene_from_filepath
from svgrasterize_tpu.parallel.atlas import atlas_scene, layout_grid, render_atlas


@pytest.fixture(scope="module")
def docs(demo_dir):
    import os

    from svgrasterize_tpu import scene_from_str

    out = []
    for name in ["python.svg", "gamepad.svg"]:  # real icons that fully lower
        scene, _ids, size = scene_from_filepath(os.path.join(demo_dir, "icons", name))
        out.append((scene, size))
    for color in ("tomato", "steelblue"):
        scene, _ids, size = scene_from_str(
            f'<svg xmlns="http://www.w3.org/2000/svg" width="40" height="40">'
            f'<circle cx="20" cy="20" r="18" fill="{color}"/></svg>'
        )
        out.append((scene, size))
    return out


def test_atlas_with_unlowerable_doc_falls_back(demo_dir):
    import os

    # fontforge.svg contains filters; the batch must still produce a canvas
    scene, _ids, size = scene_from_filepath(
        os.path.join(demo_dir, "icons", "fontforge.svg")
    )
    layer = render_atlas([(scene, size)], cell=48)
    assert layer.image.shape == (48, 48, 4)
    assert np.asarray(layer.image)[..., 3].max() > 0.5


def test_layout_grid():
    assert layout_grid(4, 64) == (2, 2, 128, 128)
    assert layout_grid(5, 64, cols=5, margin=8) == (5, 1, 5 * 72 + 8, 72 + 8)


def test_atlas_renders(docs):
    layer = render_atlas(docs, cell=64)
    assert layer.image.shape == (128, 128, 4)
    img = np.asarray(layer.image)
    # every quadrant has content
    for r in (0, 64):
        for c in (0, 64):
            assert img[r : r + 64, c : c + 64, 3].max() > 0.5


def test_atlas_sharded_matches(docs):
    single = np.asarray(render_atlas(docs, cell=64).image)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    sharded = np.asarray(render_atlas(docs, cell=64, mesh=mesh).image)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_atlas_scene_scales_documents(docs):
    combined, (w, h) = atlas_scene(docs[:1], cell=32)
    assert (w, h) == (32, 32)
    assert combined is not None
