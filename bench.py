"""Headline benchmark: full-scene render throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "configs"}.
The headline metric is the reference's own flagship demo
(demo/material-design.svg, 1488x1488) rendered by the fused whole-scene
executor; "configs" carries the rest of BASELINE.json's config matrix:

  material_1488_mpx_s  raw fused-executor throughput (the headline)
  material_3840_mpx_s  the same scene at 4K (3840x3840, tile 64)
  icons_serve_ms       icons.svg (32 Gaussian blurs, 891 refs) per-call
                       CompiledScene serving latency, dispatch included
  prompt_serve_ms      prompt.svg (SVG-font text) serving latency
  sprite_atlas_mpx_s   13-icon sprite atlas batch via CompiledScene

The reference renders material-design in 2.08s (1.06 Mpx/s) on this
machine (BASELINE.md; it publishes no numbers of its own); vs_baseline is
the speedup over that.  Timing is the SLOPE between 1 and K chained
executions (each iteration data-depends on the previous), so dispatch
latency, transfers, and compile time cancel — robust on remote-tunnel TPU
setups where block_until_ready can return early.  Serving latencies use
the per-call delta (t(n) - t(1)) / (n - 1) instead, which keeps the
per-call dispatch cost in the number (that IS the serving metric).

Falls back to a synthetic fill-batch kernel benchmark when the demo assets
are unavailable.
"""

from __future__ import annotations

import json
import os
import sys
import time

REFERENCE_SCENE_MPX_S = 1.06  # BASELINE.md: material-design.svg native size
REFERENCE_KERNEL_MPX_S = 1.34  # BASELINE.md: best measured reference rate
DEMO_DIR = "/root/reference/demo"
DEMO = os.path.join(DEMO_DIR, "material-design.svg")
# slope noise scales as jitter/ITERS and the tunnel's per-force jitter is
# multi-ms: at 8 iters a sub-ms frame read up to 2x off run to run, at 32
# the chain still costs <30 ms device time on every config
ITERS = 32


def _slope_time(run_chain, reps: int = 5) -> float:
    """median-of-reps slope between 1 and 1+ITERS chained executions.

    The remote-tunnel TPU shows multi-ms per-call jitter on BOTH chain
    timings; the min of several slopes is biased fast (a slow t(1) call
    deflates that rep's slope — observed reading 0.6 ms for a 1.4 ms
    frame), so the recorded metric is the median."""
    slopes = []
    for _ in range(reps):
        t1 = run_chain(1)
        tk = run_chain(1 + ITERS)
        slopes.append(max((tk - t1) / ITERS, 1e-9))
    return sorted(slopes)[len(slopes) // 2]


def _material_throughput(width: int | None, reps: int):
    """Raw fused-executor throughput on material-design, Mpx/s."""
    import jax
    import jax.numpy as jnp

    from svgrasterize_tpu import scene_from_filepath
    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.ops import batch_exec
    from svgrasterize_tpu.ops.fused_exec import (
        execute_items_fused,
        plan_features,
        prepare_fused_cached,
    )
    from svgrasterize_tpu.render_plan import lower_scene

    scene, _ids, size = scene_from_filepath(DEMO, width=width)
    w, h = int(size[0]), int(size[1])
    tr = Transform().matrix(0, 1, 0, 1, 0, 0)
    t_lower = time.perf_counter()
    lowered = lower_scene(scene, tr, (0, 0, h, w), False)
    assert not lowered.groups, "headline scene should lower to a single pass"
    t_lower = time.perf_counter() - t_lower
    gh, gw = lowered.grid
    items = lowered.items
    from svgrasterize_tpu import render_plan as rp

    # the scene-static prep (expanded winding params + pre-pass stacks) is
    # computed once per plan in serving (render_plan._device_plan caches
    # it), so the per-frame figure starts at the kernel — same contract.
    # _device_plan also decides the launch structure: one fused launch, a
    # canvas-chunked set of resident-canvas launches (4K), or None (XLA)
    cache = rp._device_plan(
        items, lowered.bigs, lowered.clips, None, None, lowered.tile,
        gh * gw,
    )
    chunks = cache.get("chunks")
    feats = cache["features"]
    dev = cache["items"]
    bigs = cache["bigs"]
    clips = cache["clips"]
    prep = cache.get("prepared")

    chunk_ops = (
        [(ch["items"], ch["prepared"])
         for ch in chunks if "zero_rows" not in ch]
        if chunks is not None else None
    )

    @jax.jit
    def loop(dev, bigs, clips, prep, iters, chunk_ops=None):
        def body(_i, carry):
            if chunks is not None:
                parts = []
                live = iter(chunk_ops)
                for ch in chunks:
                    if "zero_rows" in ch:
                        parts.append(jnp.zeros(
                            (ch["zero_rows"], lowered.tile, 4 * lowered.tile),
                            parts[0].dtype if parts else jnp.float32,
                        ))
                        continue
                    c_items, c_prep = next(live)
                    p = dict(c_prep)
                    p["fpar"] = p["fpar"] + carry  # serialize iterations
                    parts.append(execute_items_fused(
                        c_items, lowered.tile, ch["num_tiles"],
                        ch["bigs"], None, None, ch["clips"], ch["features"],
                        prepared=p, planar_out=True,
                    ))
                tiles = jnp.concatenate(parts, axis=0)
                return tiles[0, 0, 0] * 0.0
            if feats is not None:
                p = dict(prep)
                p["fpar"] = prep["fpar"] + carry  # serialize iterations
                tiles = execute_items_fused(
                    dev, lowered.tile, gh * gw, bigs, None, None, clips,
                    feats, prepared=p, planar_out=True,
                )
                return tiles[0, 0, 0] * 0.0
            else:
                d = dict(dev)
                d["opacity"] = dev["opacity"] + carry
                tiles = batch_exec.execute_items(
                    d, lowered.tile, gh * gw, bigs, None, None, clips
                )
            return tiles[0, 0, 0, 0] * 0.0

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def run_chain(k: int) -> float:
        start = time.perf_counter()
        # readback forces completion
        float(loop(dev, bigs, clips, prep, jnp.int32(k), chunk_ops))
        return time.perf_counter() - start

    run_chain(1)  # compile
    per_render = _slope_time(run_chain, reps)
    mpx = h * w / 1e6
    detail = (
        f"items={items['tile_id'].shape[0]} segs={items['lines'].shape[1]} "
        f"bigs={[b.shape for b in lowered.bigs]} clips={lowered.clips.shape} "
        f"tile={lowered.tile} lower={t_lower:.2f}s per_render={per_render * 1e3:.1f}ms"
    )
    return mpx / per_render, detail


def _call_latency(fn, calls: int = 8, reps: int = 2) -> float:
    """Amortized per-call latency of fn() in seconds, dispatch included:
    delta between 1 and 1+calls pipelined invocations (only the tail
    forces), so the per-call figure matches serving throughput.

    The chain must be long enough that the delta clears the tunnel's
    dispatch-timing noise (several ms between two chained forces): for
    sub-ms scenes the call count auto-scales until the measured chain
    spans >= ~60 ms, else the delta can go negative and clamp to zero."""
    import numpy as np

    def run(n: int) -> float:
        start = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(np.asarray(out[(0,) * out.ndim]))  # force the tail call
        return time.perf_counter() - start

    run(1)  # compile
    for _ in range(4):
        vals = []
        for _ in range(reps + 1):
            t1 = run(1)
            tn = run(1 + calls)
            vals.append(max((tn - t1) / calls, 1e-9))
        vals.sort()
        med = vals[len(vals) // 2]  # min is biased fast under t(1) jitter
        if med * calls >= 0.06 or calls >= 512:
            return med
        calls *= 8
    return med


def _serve_latency(compiled, calls: int = 8, reps: int = 2) -> float:
    """Per-call CompiledScene latency in seconds, dispatch included.
    Measures the planar-tile entry point — the layout render() consumes
    (de-planarization rides the image-assembly shuffle)."""
    fn = getattr(compiled, "render_tiles_planar", compiled.render_tiles)
    return _call_latency(fn, calls, reps)


def bench_4k():
    """3840x3840 material through the chunk-aware plan executor (its
    stacks exceed the fused VMEM budget, so this exercises the multi-
    launch fused path; measured 435 Mpx/s vs 385 for the XLA fallback)."""
    from svgrasterize_tpu import scene_from_filepath
    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.render_plan import execute_lowered, lower_scene

    scene, _ids, size = scene_from_filepath(DEMO, width=3840)
    w, h = int(size[0]), int(size[1])
    lowered = lower_scene(
        scene, Transform().matrix(0, 1, 0, 1, 0, 0), (0, 0, h, w), False
    )
    per = _call_latency(
        lambda: execute_lowered(lowered, (0, 0), False, whole=False)
    )
    return w * h / 1e6 / per


def bench_serve(path: str, with_fonts: bool):
    from svgrasterize_tpu import scene_from_filepath
    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.render_plan import compile_scene

    fonts = None
    if with_fonts:
        from svgrasterize_tpu.text.fonts import DEFAULT_FONTS, FontsDB

        fonts = FontsDB()
        fonts.register_file(DEFAULT_FONTS)
    scene, _ids, size = scene_from_filepath(path, fonts=fonts)
    w, h = int(size[0]), int(size[1])
    compiled = compile_scene(
        scene, Transform().matrix(0, 1, 0, 1, 0, 0), (0, 0, h, w), False
    )
    assert compiled is not None, f"{path} must lower"
    return _serve_latency(compiled)


def bench_atlas():
    """Sprite-atlas batch: the 13 demo icons served as one tiled plan."""
    from svgrasterize_tpu import scene_from_filepath
    from svgrasterize_tpu.core.transform import Transform
    from svgrasterize_tpu.parallel.atlas import atlas_scene
    from svgrasterize_tpu.render_plan import compile_scene

    icon_dir = os.path.join(DEMO_DIR, "icons")
    docs = []
    for name in sorted(os.listdir(icon_dir)):
        if not name.endswith(".svg"):
            continue
        scene, _ids, size = scene_from_filepath(os.path.join(icon_dir, name))
        if scene is not None:
            docs.append((scene, (float(size[0]), float(size[1]))))
    combined, (aw, ah) = atlas_scene(docs, cell=128)
    compiled = compile_scene(
        combined, Transform().matrix(0, 1, 0, 1, 0, 0), (0, 0, ah, aw), False
    )
    assert compiled is not None, "atlas must lower"
    per_call = _serve_latency(compiled)
    return len(docs), aw * ah / 1e6 / per_call


def bench_scene():
    # secondary configs respect a wall-clock budget: cold remote compiles
    # on tunnel TPU setups cost minutes per program, and the headline
    # metric must never be lost to a driver timeout
    budget = float(os.environ.get("SVGR_BENCH_BUDGET", "480"))
    t_start = time.perf_counter()

    mpx_s, detail = _material_throughput(None, reps=3)
    configs = {"material_1488_mpx_s": round(mpx_s, 2)}
    errors = {}

    def atlas_cfg():
        n_docs, atlas_mpx_s = bench_atlas()
        configs["sprite_atlas_docs"] = n_docs
        return round(atlas_mpx_s, 2)

    for key, fn in (
        ("icons_serve_ms",
         lambda: round(bench_serve(os.path.join(DEMO_DIR, "icons.svg"), False)
                       * 1e3, 2)),
        ("prompt_serve_ms",
         lambda: round(bench_serve(os.path.join(DEMO_DIR, "prompt.svg"), True)
                       * 1e3, 3)),
        ("sprite_atlas_mpx_s", atlas_cfg),
        ("material_3840_mpx_s", lambda: round(bench_4k(), 2)),
    ):
        if time.perf_counter() - t_start > budget:
            errors[key] = "skipped: bench time budget exhausted"
            continue
        try:
            configs[key] = fn()
        except Exception as exc:  # record, never sink the headline
            errors[key] = f"{type(exc).__name__}: {exc}"[:200]

    result = {
        "metric": "material_design_scene_render",
        "value": round(mpx_s, 2),
        "unit": "Mpx/s",
        "vs_baseline": round(mpx_s / REFERENCE_SCENE_MPX_S, 1),
        "configs": configs,
    }
    if errors:
        result["errors"] = errors
    return result, detail


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
