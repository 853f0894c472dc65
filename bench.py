"""Headline benchmark: anti-aliased batched fill throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The workload is the framework's flagship device program (`fill_batch`): a
batch of closed AA paths rasterized to premultiplied RGBA tiles — the same
work the reference does with its scalar scanline loop + numpy paint
(/root/reference/svgrasterize.py:922-1019).  vs_baseline compares against
the reference's best measured end-to-end AA fill throughput on this machine
(1.34 Mpx/s, BASELINE.md — it publishes no numbers of its own).

Measurement notes: iterations run inside ONE jitted lax.scan dispatch with a
data dependency between steps (no elision, no overlap games), and the
throughput is the SLOPE between two iteration counts — dispatch latency,
device<->host transfer, and compile time all cancel out.  This is robust on
remote-tunnel TPU setups where block_until_ready can return early.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

REFERENCE_MPX_S = 1.34  # BASELINE.md: material-design.svg @3840, best case

N_PATHS = 64
N_SEGS = 64
TILE = 256
ITERS_LO = 8
ITERS_HI = 108


def main() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _edge_batch
    from svgrasterize_tpu.ops import fill_rule as fill_rule_ops
    from svgrasterize_tpu.ops.coverage import winding_impl

    lines_np, colors_np = _edge_batch(N_PATHS, N_SEGS, float(TILE))
    lines = jnp.asarray(lines_np)
    colors = jnp.asarray(colors_np)

    @jax.jit
    def bench_loop(lines, colors, iters):
        # runtime trip count: one compiled computation serves every `iters`
        def fill(lines):
            def one(segs, color):
                mask = fill_rule_ops.apply(winding_impl(segs, TILE, TILE))
                return mask[..., None] * color[None, None, :]

            return jax.vmap(one)(lines, colors)

        def body(_i, carry):
            out = fill(lines + carry)  # carry == 0, but only provable at runtime
            return out[0, 0, 0, 0] * 0.0 + jnp.float32(1e-30)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def timed(iters: int) -> float:
        start = time.perf_counter()
        probe = bench_loop(lines, colors, jnp.int32(iters))
        _ = float(probe)  # scalar readback forces execution to completion
        return time.perf_counter() - start

    _ = float(bench_loop(lines, colors, jnp.int32(1)))  # compile once

    t_lo = min(timed(ITERS_LO) for _ in range(2))
    t_hi = min(timed(ITERS_HI) for _ in range(2))
    per_iter = max((t_hi - t_lo) / (ITERS_HI - ITERS_LO), 1e-9)

    mpx_per_iter = N_PATHS * TILE * TILE / 1e6
    mpx_s = mpx_per_iter / per_iter
    print(
        json.dumps(
            {
                "metric": "aa_fill_throughput",
                "value": round(mpx_s, 2),
                "unit": "Mpx/s",
                "vs_baseline": round(mpx_s / REFERENCE_MPX_S, 1),
            }
        )
    )
    print(
        f"[bench] device={jax.devices()[0]} batch={N_PATHS}x{N_SEGS}segs "
        f"tile={TILE}x{TILE} t({ITERS_LO})={t_lo:.3f}s t({ITERS_HI})={t_hi:.3f}s "
        f"per_iter={per_iter * 1e3:.2f}ms",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
