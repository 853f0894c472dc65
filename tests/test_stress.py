"""Pathological stress scene (slow lane): the anti-collapse worst case.

utils/stress.stress_doc builds thousands of small overlapping gradient/
clip items with scattered opacity passes — nothing collapses, tile runs
mix pass classes deeply.  Guards: (a) the plan must actually BE
pathological (almost no field items), (b) the fused executor still
matches the XLA oracle on it, (c) on real TPU hardware the serve latency
must not regress more than 2x past the recorded round-4 number.
"""

import jax
import numpy as np
import pytest

import svgrasterize_tpu.render_plan as rp
from svgrasterize_tpu import scene_from_str
from svgrasterize_tpu.core.transform import Transform
from svgrasterize_tpu.utils.stress import stress_doc

TR = Transform().matrix(0, 1, 0, 1, 0, 0)

# measured 2026-08-20 on v5e through the tunnel (bench.py opt-in
# "stress_serve_ms" config, whole-plan serving, dispatch included):
# 1.216 ms/call, spread [1.04, 1.29] — ~0.4 us/item, same per-item
# floor as the demo plans, i.e. the deep pass mixes do not blow it up
# (doc version: gradient shapes interleaved with opacity-group tex
# items so the round-4 gradient/pattern collapse cannot dissolve it)
STRESS_SERVE_MS_R4 = 1.22


@pytest.mark.slow
def test_stress_plan_resists_collapse_and_matches_oracle(monkeypatch):
    doc = stress_doc(n_items=400, size=512)
    scene, _ids, size = scene_from_str(doc)
    w, h = int(size[0]), int(size[1])
    lowered = rp.lower_scene(scene, TR, (0, 0, h, w), False, tile=32)
    assert lowered is not None
    n_real = int(
        (lowered.items["tile_id"] < lowered.grid[0] * lowered.grid[1]).sum()
    )
    fidx = lowered.items.get("field_idx")
    n_field = 0 if fidx is None else int((fidx >= 0).sum())
    # gradients + interleaved clips must leave the stack uncollapsible
    assert n_real > 300
    assert n_field <= n_real // 20, (n_field, n_real)
    monkeypatch.setenv("SVGR_FUSED", "0")
    ref = np.asarray(rp.execute_lowered(lowered, (0, 0), False))
    monkeypatch.setenv("SVGR_FUSED", "interp")
    got = np.asarray(rp.execute_lowered(lowered, (0, 0), False))
    assert np.abs(ref - got).max() <= 2e-5


@pytest.mark.slow
@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="perf guard needs real TPU hardware",
)
def test_stress_serve_latency_guard():
    import time

    from svgrasterize_tpu.render_plan import compile_scene

    doc = stress_doc()
    scene, _ids, size = scene_from_str(doc)
    w, h = int(size[0]), int(size[1])
    compiled = compile_scene(scene, TR, (0, 0, h, w), False)
    assert compiled is not None
    fn = getattr(compiled, "render_tiles_planar", compiled.render_tiles)
    out = fn()
    np.asarray(out[(0,) * out.ndim])

    def chain(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(np.asarray(out[(0,) * out.ndim]))
        return time.perf_counter() - t0

    per = (chain(9) - chain(1)) / 8
    assert per * 1e3 < 2 * STRESS_SERVE_MS_R4, f"{per * 1e3:.2f} ms/call"
