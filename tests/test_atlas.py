"""Batch atlas rendering: single-device vs sharded vs per-document."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from svgrasterize_tpu import scene_from_filepath, scene_from_str
from svgrasterize_tpu.core.transform import Transform
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


def test_compile_atlas_dedups_repeated_docs(monkeypatch):
    monkeypatch.setenv("SVGR_TILE", "32")  # CPU default 128 > cell
    """compile_atlas renders each unique document once and serves
    duplicates as device tile-gathers.  Blur-free docs must match the
    plain combined plan exactly; blur-bearing docs are allowed the
    reference's own offset-dependent blur-truncation deviation (repeated
    placements of such a doc differ by ~0.05 premultiplied within ONE
    plain render already — the dedup output is the bit-exact unique
    placement)."""
    from svgrasterize_tpu.parallel.atlas import atlas_scene, compile_atlas
    from svgrasterize_tpu.render_plan import compile_scene

    docs = []
    for i, color in enumerate(("#c03020", "#2060c0", "#20a040")):
        doc = (
            f"<svg xmlns='http://www.w3.org/2000/svg' width='48' height='48'>"
            f"<defs><linearGradient id='g'><stop offset='0' stop-color='{color}'/>"
            f"<stop offset='1' stop-color='#222222'/></linearGradient></defs>"
            f"<circle cx='24' cy='24' r='{14 + i * 3}' fill='url(#g)'/>"
            f"<rect x='4' y='4' width='12' height='12' fill='{color}'/></svg>"
        )
        scene, _ids, size = scene_from_str(doc)
        docs.append((scene, (float(size[0]), float(size[1]))))
    repeated = docs * 4  # 12 docs, 3 unique
    srv = compile_atlas(repeated, cell=64)
    assert srv is not None and srv.n_unique == 3 and srv.n_docs == 12
    got = np.asarray(srv.render().image)
    combined, (aw, ah) = atlas_scene(repeated, cell=64)
    plain = compile_scene(
        combined, Transform().matrix(0, 1, 0, 1, 0, 0), (0, 0, ah, aw), False
    )
    ref = np.asarray(plain.render().image)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_compile_atlas_unique_docs_falls_back_to_plain():
    from svgrasterize_tpu.parallel.atlas import compile_atlas

    scenes = []
    for color in ("#aa1122", "#22aa11"):
        scene, _ids, size = scene_from_str(
            f"<svg xmlns='http://www.w3.org/2000/svg' width='32' height='32'>"
            f"<rect width='20' height='20' fill='{color}'/></svg>"
        )
        scenes.append((scene, (float(size[0]), float(size[1]))))
    srv = compile_atlas(scenes, cell=64)
    assert srv is not None and srv.n_unique == srv.n_docs == 2
    out = np.asarray(srv.render().image)
    assert out.shape[2] == 4 and np.isfinite(out).all()
