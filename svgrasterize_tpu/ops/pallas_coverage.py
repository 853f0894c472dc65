"""Pallas TPU kernel for AA signed-coverage (winding) accumulation.

Same math as ops/coverage.py (closed-form clamped-trapezoid contribution per
(edge, pixel) pair), but hand-scheduled for the TPU memory hierarchy: the
output tile accumulator lives in VMEM registers across ALL segment chunks,
so HBM sees exactly one write per output element instead of one read+write
per lax.scan step.  The segment list is small and rides along in VMEM.

Grid: (H / BLOCK_H, W / BLOCK_W) output blocks; each program streams the
whole padded segment list in chunks of SEG_CHUNK through the VPU.

Used automatically by `winding_auto` on TPU backends; the XLA formulation
remains the portable fallback (and the oracle for the equality tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import DEVICE_FLOAT

BLOCK_H = 8
BLOCK_W = 128
SEG_CHUNK = 32


def _clamp_antideriv(t):
    return jnp.where(t <= 0, 0.0, jnp.where(t >= 1, t - 0.5, 0.5 * t * t))


def _winding_kernel(lines_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = (i * BLOCK_H).astype(DEVICE_FLOAT)
    col0 = (j * BLOCK_W).astype(DEVICE_FLOAT)
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (BLOCK_H, 1), 0).astype(DEVICE_FLOAT) + row0
    )  # (BH, 1)
    cols = (
        jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK_W), 1).astype(DEVICE_FLOAT) + col0
    )  # (1, BW)

    n_chunks = lines_ref.shape[0] // SEG_CHUNK

    def chunk_body(k, acc):
        chunk = lines_ref[pl.ds(k * SEG_CHUNK, SEG_CHUNK), :]  # (C, 4)
        a0 = chunk[:, 0][:, None, None]
        a1 = chunk[:, 1][:, None, None]
        b0 = chunk[:, 2][:, None, None]
        b1 = chunk[:, 3][:, None, None]
        sign = jnp.sign(b0 - a0)
        y_lo = jnp.minimum(a0, b0)
        y_hi = jnp.maximum(a0, b0)
        x_lo = jnp.where(a0 <= b0, a1, b1)
        x_hi = jnp.where(a0 <= b0, b1, a1)
        dy_seg = y_hi - y_lo
        slope = (x_hi - x_lo) / jnp.where(dy_seg > 0, dy_seg, 1.0)

        lo = jnp.maximum(y_lo, rows[None])          # (C, BH, 1)
        hi = jnp.minimum(y_hi, rows[None] + 1.0)
        dy = jnp.maximum(hi - lo, 0.0)
        xs_lo = x_lo + slope * (lo - y_lo)
        xs_hi = x_lo + slope * (hi - y_lo)

        g0 = (cols[None] + 1.0) - xs_lo             # (C, BH, BW)
        g1 = (cols[None] + 1.0) - xs_hi
        den = g1 - g0
        safe = jnp.abs(den) > 1e-7
        mean = jnp.where(
            safe,
            (_clamp_antideriv(g1) - _clamp_antideriv(g0)) / jnp.where(safe, den, 1.0),
            jnp.clip(0.5 * (g0 + g1), 0.0, 1.0),
        )
        return acc + jnp.sum(sign * dy * mean, axis=0)

    out_ref[:] = jax.lax.fori_loop(
        0, n_chunks, chunk_body, jnp.zeros((BLOCK_H, BLOCK_W), DEVICE_FLOAT)
    )


def winding_pallas_impl(lines, height: int, width: int):
    """Traceable Pallas winding; lines (S, 4), S a multiple of SEG_CHUNK."""
    hp = -(-height // BLOCK_H) * BLOCK_H
    wp = -(-width // BLOCK_W) * BLOCK_W
    lines = lines.astype(DEVICE_FLOAT)
    out = pl.pallas_call(
        _winding_kernel,
        out_shape=jax.ShapeDtypeStruct((hp, wp), DEVICE_FLOAT),
        grid=(hp // BLOCK_H, wp // BLOCK_W),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (BLOCK_H, BLOCK_W),
            lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
    )(lines)
    if (hp, wp) != (height, width):
        out = out[:height, :width]
    return out


@partial(jax.jit, static_argnums=(1, 2))
def winding_pallas(lines, height: int, width: int):
    """Jitted Pallas winding field (see winding_pallas_impl)."""
    return winding_pallas_impl(lines, height, width)


def winding_auto(lines, height: int, width: int):
    """Pick the Pallas kernel on TPU, the portable XLA formulation elsewhere."""
    from .coverage import winding

    if jax.default_backend() == "tpu":
        return winding_pallas(lines, height, width)
    return winding(lines, height, width)
