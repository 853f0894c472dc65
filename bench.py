"""Headline benchmark: full-scene render throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the reference's own headline demo (demo/material-design.svg,
1488x1488, ~1900 fills + 935 clip paths + gradients) rendered by the batched
whole-scene executor (render_plan + ops/batch_exec) — the same scene the
reference renders in 2.08s (1.06 Mpx/s) on this machine (BASELINE.md; the
reference publishes no numbers of its own).  vs_baseline is the speedup of
the device render over that measured reference throughput.

Falls back to a synthetic fill-batch kernel benchmark when the demo asset is
unavailable.  Timing is the SLOPE between 1 and K chained executions (each
iteration data-depends on the previous), so dispatch latency, transfers, and
compile time cancel — robust on remote-tunnel TPU setups where
block_until_ready can return early.
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE_SCENE_MPX_S = 1.06  # BASELINE.md: material-design.svg native size
REFERENCE_KERNEL_MPX_S = 1.34  # BASELINE.md: best measured reference rate
DEMO = "/root/reference/demo/material-design.svg"
ITERS = 8


def _slope_time(run_chain) -> float:
    """min-of-3 slope between 1 and 1+ITERS chained executions.

    The remote-tunnel TPU shows multi-ms per-call jitter; taking the min
    of three slope estimates keeps the recorded metric stable."""
    slopes = []
    for _ in range(3):
        t1 = run_chain(1)
        tk = run_chain(1 + ITERS)
        slopes.append(max((tk - t1) / ITERS, 1e-9))
    return min(slopes)


def bench_scene():
    import jax
    import jax.numpy as jnp

    from svgrasterize_tpu import scene_from_filepath
    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.ops import batch_exec
    from svgrasterize_tpu.ops.fused_exec import execute_items_fused, plan_features
    from svgrasterize_tpu.render_plan import lower_scene

    scene, _ids, size = scene_from_filepath(DEMO)
    w, h = int(size[0]), int(size[1])
    tr = Transform().matrix(0, 1, 0, 1, 0, 0)
    t_lower = time.perf_counter()
    lowered = lower_scene(scene, tr, (0, 0, h, w), False)
    assert not lowered.groups, "headline scene should lower to a single pass"
    t_lower = time.perf_counter() - t_lower
    gh, gw = lowered.grid
    items = lowered.items
    dev = {k: jnp.asarray(v) for k, v in items.items()}
    bigs = tuple(jnp.asarray(b) for b in lowered.bigs)
    clips = jnp.asarray(lowered.clips) if lowered.clips.shape[0] else None
    feats = plan_features(items, lowered.bigs, lowered.clips, None, None,
                          lowered.tile, gh * gw)

    @jax.jit
    def loop(dev, bigs, clips, iters):
        def body(_i, carry):
            d = dict(dev)
            d["opacity"] = dev["opacity"] + carry  # serialize iterations
            if feats is not None:
                tiles = execute_items_fused(
                    d, lowered.tile, gh * gw, bigs, None, None, clips, feats
                )
            else:
                tiles = batch_exec.execute_items(
                    d, lowered.tile, gh * gw, bigs, None, None, clips
                )
            return tiles[0, 0, 0, 0] * 0.0

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def run_chain(k: int) -> float:
        start = time.perf_counter()
        float(loop(dev, bigs, clips, jnp.int32(k)))  # readback forces completion
        return time.perf_counter() - start

    run_chain(1)  # compile
    per_render = _slope_time(run_chain)
    mpx = h * w / 1e6
    return {
        "metric": "material_design_scene_render",
        "value": round(mpx / per_render, 2),
        "unit": "Mpx/s",
        "vs_baseline": round(mpx / per_render / REFERENCE_SCENE_MPX_S, 1),
    }, (
        f"items={items['tile_id'].shape[0]} segs={items['lines'].shape[1]} "
        f"bigs={[b.shape for b in lowered.bigs]} clips={lowered.clips.shape} "
        f"lower={t_lower:.2f}s per_render={per_render * 1e3:.1f}ms"
    )


def bench_kernel():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _edge_batch
    from svgrasterize_tpu.ops import fill_rule as fill_rule_ops
    from svgrasterize_tpu.ops.coverage import winding_impl

    n_paths, n_segs, tile = 64, 64, 256
    lines_np, colors_np = _edge_batch(n_paths, n_segs, float(tile))
    lines = jnp.asarray(lines_np)
    colors = jnp.asarray(colors_np)

    @jax.jit
    def loop(lines, colors, iters):
        def fill(lines):
            def one(segs, color):
                mask = fill_rule_ops.apply(winding_impl(segs, tile, tile))
                return mask[..., None] * color[None, None, :]

            return jax.vmap(one)(lines, colors)

        def body(_i, carry):
            out = fill(lines + carry)
            return out[0, 0, 0, 0] * 0.0

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def run_chain(k: int) -> float:
        start = time.perf_counter()
        float(loop(lines, colors, jnp.int32(k)))
        return time.perf_counter() - start

    run_chain(1)
    per_iter = _slope_time(run_chain)
    mpx = n_paths * tile * tile / 1e6
    return {
        "metric": "aa_fill_throughput",
        "value": round(mpx / per_iter, 2),
        "unit": "Mpx/s",
        "vs_baseline": round(mpx / per_iter / REFERENCE_KERNEL_MPX_S, 1),
    }, f"batch={n_paths}x{n_segs} tile={tile} per_iter={per_iter * 1e3:.2f}ms"


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) or ".")
    import jax

    if os.path.isfile(DEMO):
        result, detail = bench_scene()
    else:
        result, detail = bench_kernel()
    print(json.dumps(result))
    print(f"[bench] device={jax.devices()[0]} {detail}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
