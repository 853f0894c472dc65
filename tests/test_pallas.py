"""Pallas TPU coverage kernel vs the portable XLA formulation (oracle).

Runs in Pallas interpreter mode on CPU; the same kernel compiles via Mosaic
on real TPUs (exercised by the TPU-gated test below).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import svgrasterize_tpu.ops.pallas_coverage as pc
from svgrasterize_tpu.ops.coverage import pad_lines, winding


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pc.pl, "pallas_call", interp)


def _random_lines(seed, n, lo, hi):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(lo, hi, size=(n, 2, 2)).astype(np.float32)
    return jnp.asarray(pad_lines(pts.reshape(-1, 4)))


def test_matches_xla_winding(interpret_pallas):
    lines = _random_lines(3, 48, -10, 70)
    ref = np.asarray(winding(lines, 60, 150))
    out = np.asarray(pc.winding_pallas(lines, 60, 150))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_non_block_multiple_shape(interpret_pallas):
    lines = _random_lines(11, 32, 0, 37)
    ref = np.asarray(winding(lines, 37, 41))
    out = np.asarray(pc.winding_pallas(lines, 37, 41))
    assert out.shape == (37, 41)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_closed_polygon_interior(interpret_pallas):
    # a closed square: winding must be exactly 1 inside, 0 outside
    square = jnp.asarray(
        pad_lines(
            np.array(
                [
                    [8, 8, 8, 24],
                    [8, 24, 24, 24],
                    [24, 24, 24, 8],
                    [24, 8, 8, 8],
                ],
                dtype=np.float32,
            )
        )
    )
    out = np.asarray(pc.winding_pallas(square, 32, 32))
    assert abs(abs(out[16, 16]) - 1.0) < 1e-6
    assert abs(out[4, 4]) < 1e-6


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs a TPU")
def test_compiles_on_tpu():
    lines = _random_lines(5, 64, 0, 128)
    ref = np.asarray(winding(lines, 128, 128))
    out = np.asarray(pc.winding_pallas(lines, 128, 128))
    np.testing.assert_allclose(out, ref, atol=1e-4)
