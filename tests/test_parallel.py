"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svgrasterize_tpu.parallel.batch import (
    fill_batch,
    sharded_fill_batch,
    sharded_render_step,
)
from svgrasterize_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def batch():
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import _edge_batch

    lines, colors = _edge_batch(n_paths=8, n_segs=64, extent=32.0, seed=7)
    return jnp.asarray(lines), jnp.asarray(colors)


def test_mesh_factoring():
    mesh = make_mesh(jax.devices()[:8])
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "seg")
    assert make_mesh(jax.devices()[:1]).devices.shape == (1, 1)
    assert make_mesh(jax.devices()[:6]).devices.shape in ((3, 2), (2, 3))


def test_sharded_fill_matches_single_device(batch):
    lines, colors = batch
    expected = fill_batch(lines, colors, height=32, width=32)
    mesh = make_mesh(jax.devices()[:8])
    sharded = sharded_fill_batch(mesh, lines, colors, height=32, width=32)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(expected), atol=1e-5)


def test_sharded_render_step_composites_in_order(batch):
    lines, colors = batch
    tiles = np.asarray(fill_batch(lines, colors, height=32, width=32))
    expected = tiles[0]
    for tile in tiles[1:]:
        expected = tile + expected * (1.0 - tile[..., -1:])

    mesh = make_mesh(jax.devices()[:8])
    canvas = sharded_render_step(mesh, lines, colors, height=32, width=32)
    np.testing.assert_allclose(np.asarray(canvas), expected, atol=1e-5)


def test_graft_entry_single_chip():
    import sys

    sys.path.insert(0, ".")
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 128, 128, 4)
    assert bool(jnp.isfinite(out).all())
