"""Fully-fused whole-scene executor: one Pallas TPU kernel per scene.

The XLA executor (ops/batch_exec.py) hits a traffic floor on dense scenes:
per-chunk it materializes an (C, T, T, 4) rgba stack to HBM, runs a
log-depth associative scan over it, and gathers/scatters canvas tiles with
dynamic indices (XLA lowers those to sequential dynamic-slice loops).
Ablations show compute (winding / paint / scan math) is NOT the limit —
memory movement is.

This module replaces all of that with two Pallas kernels:

  * the MAIN kernel: grid = (N,), one sequential step per z-sorted work
    item.  The canvas tile a run composites into is a *revisited output
    block* (its index comes from the scalar-prefetched tile_id), so an
    entire tile run composes in VMEM and HBM sees exactly one write per
    canvas tile.  Pre-pass winding stacks (big segment classes), the
    host-precomputed clip coverage fields, and the isolation-pass texture
    pool stay VMEM-resident and are read per item by dynamic row index —
    measured ~30x faster than per-step block gathers through index_maps.
    Inline winding, fill-rule coverage, paint evaluation, and Porter-Duff
    OVER all happen in registers between the block DMAs.
  * the PREPASS kernel: grid = one step per big segment class row,
    rasterizing each padded edge list into a (T, T) winding field with
    the same packed-lane inner loop (the XLA formulation wastes 4/G of
    the VPU on lane padding and dominates dense scenes once the main
    kernel is fused).  Clip coverage is NOT a prepass: fill rules and
    carries fold into per-(clip, tile) coverage fields at lowering time
    (render_plan._clip_tile), so the kernel just multiplies a row in.

Data layout: a canvas tile is stored channel-PLANAR as (T, 4T) f32 with
lane = channel * T + column — for T == 32 that is exactly a (32, 128)
block, one fp32 VREG tile, full lane utilization.  Planar (not
interleaved) because pltpu.repeat/pltpu.roll give exact channel
expansion / alpha broadcast in that layout; MXU f32 matmuls are NOT
exact (~2e-3) and visibly diverge from the XLA executor when composing
deep stacks.  Inline edges are packed G = 128//T per winding pass
into the lane dimension: HBM holds compact per-edge parameter columns
(N, P, 8, G) and the kernel broadcasts each edge across its T columns
with one tiny MXU matmul per pass, so the inner loop runs at full lanes
without inflating HBM traffic.  A per-item dynamic pass count skips the
padding work the XLA executor burns VPU time on.

The per-(edge, pixel) coverage math is bit-identical to ops/coverage.py
(the closed-form clamped-trapezoid formulation of the reference's font-rs
scanline algorithm, /root/reference/svgrasterize.py:2213-2304); the
composition order matches ops/batch_exec.py, so the two executors agree to
f32 rounding and are fuzz-tested against each other.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.constants import DEVICE_FLOAT

LANES = 128

# paint kinds (must match render_plan.PAINT_*)
MAX_STOP_GUARD = 1 << 20  # "no guard": run the whole static stop table

PAINT_SOLID = 0
PAINT_LINEAR = 1
PAINT_RADIAL = 2
PAINT_PATTERN = 3

# fall back / chunk when the resident stacks would not fit (bytes of
# LANE-PADDED VMEM: a (T, T) winding tile at T == 32 occupies full
# 128-lane rows, 4x its logical size — a 52 MB stack compiled to 200 MB
# and OOM'd the 128 MB chip before the padding entered the accounting).
# SVGR_VMEM_BUDGET overrides — tests use a tiny budget to force chunking.
VMEM_BUDGET = 88 * 1024 * 1024


def vmem_budget() -> int:
    try:
        return int(os.environ.get("SVGR_VMEM_BUDGET", VMEM_BUDGET))
    except ValueError:
        return VMEM_BUDGET


def stack_bytes(tt_rows: int, pool_rows: int, t_size: int) -> int:
    """Padded VMEM bytes of resident stacks: tt_rows (T, T) winding tiles
    (lane-padded to 128) + pool_rows channel-planar (T, 4T) rows."""
    return (
        tt_rows * t_size * max(t_size, LANES) * 4
        + pool_rows * t_size * max(4 * t_size, LANES) * 4
    )


def canvas_bytes(num_tiles: int, t_size: int) -> int:
    """VMEM bytes of a resident channel-planar canvas (num_tiles+1 rows)."""
    return (num_tiles + 1) * t_size * max(4 * t_size, LANES) * 4


def _interpret() -> bool:
    return os.environ.get("SVGR_FUSED") == "interp"


def fused_k() -> int:
    """Items per main-kernel grid step (v2); 1 selects the v1 kernel.

    Measured on v5e material-design: K=1 2.7 ms, K=8 2.5-2.6 ms,
    K=16 1.71 ms per frame (fewer grid steps amortize the per-step
    pipeline overhead).  Round-5 re-sweep with the kvec/vstore kernel on
    device-chained runs: K=32 beats or ties K=16 on every config (stress
    0.93 -> 0.89 ms/frame, 52-doc atlas 3.19 -> 3.10, icons 0.59 ==,
    material headline parity), outputs bit-identical, so 32 is the
    default; K=64 measured no further win."""
    try:
        return max(1, int(os.environ.get("SVGR_FUSED_K", "32")))
    except ValueError:
        return 32


def fused_vout() -> bool:
    """Resident-canvas (v3) kernel opt-out, for A/B measurement."""
    return os.environ.get("SVGR_FUSED_VOUT", "1") != "0"


def prepass_k() -> int:
    """Edge classes per prepass grid step."""
    try:
        return max(1, int(os.environ.get("SVGR_PREPASS_K", "8")))
    except ValueError:
        return 8


def _ablate() -> str:
    """Measurement hook: skip kernel stages to attribute frame time.
    '' (off) | 'stub' | 'nowind' | 'nocov' | 'nochain' (kvec: break the
    phase-2 compose dependency chain, keep every store)."""
    return os.environ.get("SVGR_ABLATE", "")


def fused_unroll() -> bool:
    """Unroll the K-item loop in the resident-canvas kernel (static item
    index -> static operand-block offsets, cross-item software pipelining)."""
    return os.environ.get("SVGR_FUSED_UNROLL", "0") == "1"


def static_passes() -> bool:
    """Run every item's winding loop to the static maximum pass count
    instead of its own dynamic count (padding edges contribute exactly
    zero, so the result is identical).  Trades ~2.6x more pass
    iterations for a statically-bounded (unrollable) inner loop."""
    return os.environ.get("SVGR_STATIC_PASSES", "0") == "1"


def wind_unroll_max() -> int:
    """Guarded-unroll cap for the winding pass loop (0 disables).

    Up to this static pass count the kernel unrolls the loop and wraps
    each pass in a scalar-predicated cond on the item's live count: the
    loop structure is static (Mosaic can schedule/pipeline across
    passes — a dynamic-trip fori_loop measured ~2.5x the vector-op cost
    of its body on material-design) without paying the padded passes'
    VPU time the way SVGR_STATIC_PASSES does.  Above the cap the code
    size would bloat compile time; the dynamic loop remains."""
    try:
        return int(os.environ.get("SVGR_WIND_UNROLL", "8"))
    except ValueError:
        return 8


def solid_skip() -> bool:
    """Per-item scalar cond around the gradient math, skipping the full
    linear+radial evaluation for solid items in a "grad" launch.
    Default OFF: measured on v5e icons.svg (1691 of 2560 main items
    solid) the cond cost MORE than the skipped VPU time — 3.32 ms serve
    vs 3.10 without it; the branch stalls Mosaic's cross-item pipeline
    more than ~30 small vector ops cost.  Kept as an A/B knob for
    gradient-heavy pathologies."""
    return os.environ.get("SVGR_SOLID_SKIP", "0") != "0"


def stop_guard() -> bool:
    """Allow the "sguard" feature (per-item guarded unroll of the
    gradient stop-interpolation loop); see plan_features.  Default OFF:
    same v5e measurement as solid_skip — per-stop conds (icons: 15 for a
    mean-4-stop population) read 3.23 ms serve vs 3.10 unguarded."""
    return os.environ.get("SVGR_SGUARD", "0") != "0"


def pregrad() -> bool:
    """Pre-render gradient paint at prep time ("pregrad" feature).

    Gradient paint is scene-static (it depends only on the item's params
    and tile origin, never on the isolation pool), so prep evaluates the
    batched XLA paint path once per plan and the kernel streams each
    item's finished (T, 4T) paint field as an ordinary pipeline block —
    deleting the whole in-kernel gradient evaluation (~25 (T,T) ops plus
    the k_stops-wide (T,4T) interpolation loop, which ran for EVERY item
    of a "grad" launch; icons.svg main pays k_stops=16 for a mean-4-stop
    population).  HBM cost: 16 KB/item of scene-static storage +
    streaming (~42 MB on icons main, ~50 us/frame of bandwidth)."""
    return os.environ.get("SVGR_PREGRAD", "1") != "0"


def pretex() -> bool:
    """Allow the "pretex" feature (stream gathered pool rows per item on
    compose-dense launches); see plan_features."""
    return os.environ.get("SVGR_PRETEX", "1") != "0"


def _pretex_gather_budget() -> int:
    """Per-frame bytes the pretex pool-row gather may stream before the
    planner prefers the resident-pool kres path (when it fits VMEM).
    Measured round 5 on the 52-doc sprite atlas: the 6,144-item main's
    ~100 MB/frame gather cost ~0.4 ms; kres served the same plan 13%
    faster end-to-end.  icons.svg's dense level launches gather a few MB
    and keep pretex; the stress scene's 50 MB main measured slightly
    FASTER on pretex (0.94 vs 0.98 ms/frame), so the cap sits above it.
    SVGR_PRETEX_GATHER_MB overrides."""
    return int(os.environ.get("SVGR_PRETEX_GATHER_MB", "64")) << 20


def kres() -> bool:
    """Allow the "kres" feature: kvec with a VMEM-resident pool.

    Sparse tex/mask launches (pool share < the pretex threshold) used to
    fall back to the fully serial kernel; kres keeps phase 1 (winding,
    coverage, paint) vectorized across the K block and does only the
    pool row reads + blends per item in phase 2.  SVGR_KRES=0 disables."""
    return os.environ.get("SVGR_KRES", "1") != "0"


def zout() -> bool:
    """Allow the "zout" feature: in-kernel zeroing of untouched canvas
    rows on ring-path (canvas-over-VMEM) launches.

    Without it the ring kernel's output keeps a +1 pad scratch row and
    garbage in untouched rows, forcing a post-kernel [:num_tiles] slice
    plus a membership select — two full-canvas HBM round trips (~0.7 ms
    at 3840x3840).  zout remaps pad items to the last real tile (their
    flushes rewrite its final value), drops the scratch row, and DMAs
    zeros into the untouched rows at step 0 from a VMEM scratch tile,
    windowed to bound in-flight copies.  SVGR_ZOUT=0 disables."""
    return os.environ.get("SVGR_ZOUT", "1") != "0"


def vstore() -> bool:
    """Allow the "vstore" feature: branch-free phase-2 compose in the
    kvec resident-canvas kernel.

    The serial compose tail costs ~2 scalar-core regions per item (a
    pl.when'd conditional canvas write plus a scalar-cond vector select).
    vstore replaces both with straight-line code: the run-continuation
    flag (host-static — tile runs are fixed at pack time) streams as vpar
    row 4 and folds into the compose as an exact multiplicative blend
    (acc*(1-a)*same, same in {0,1}), and EVERY item unconditionally
    stores its running composite to its tile's canvas row (last writer of
    a run wins; pad items are remapped at prep to rewrite the last real
    tile with an unchanged value).  SVGR_VSTORE=0 disables."""
    return os.environ.get("SVGR_VSTORE", "1") != "0"


def kscan() -> bool:
    """Compose the vstore tail with a log2(K) Kogge-Stone scan instead of
    the serial per-item chain (SVGR_KSCAN=1, default off pending device
    A/B).

    The vstore recurrence acc_k = rgba_k + fac_k * acc_{k-1} is a linear
    first-order recurrence whose run boundaries are already encoded in
    fac (the run-continuation flag zeroes it at run starts), so it admits
    an associative scan: pairs (F, R) combine as (F2*F1, R2 + F2*R1).
    log2(K) levels of (K, T, 4T) block ops replace the K-step serial
    chain of scalar-sequenced mul+add+store — ~6x the raw VPU flops, but
    straight-line with no per-item dependency.  Stores stay per item
    (last writer of a run wins), so output is fp-reassociated but
    otherwise identical; equivalence tests compare with tolerance."""
    return os.environ.get("SVGR_KSCAN", "0") == "1"


def kvec() -> bool:
    """Allow the "kvec" feature: vectorize phase 1 of the K-items kernel.

    The v2/v3 kernels run the WHOLE per-item pipeline serially inside a
    grid step (fori over K); measured per-item cost (~0.37 us at K=16 on
    icons) is ~2.6x the raw vector-op estimate — scalar-core address
    computation, loop control, and scalar<->vector stalls between items.
    kvec computes winding + coverage + paint for ALL K items of a step as
    (K, ., .) block ops (one instruction stream, no per-item scalar
    dependencies) and keeps only the tile-run composition serial (a
    statically unrolled ~6-op tail per item).  The cost is winding pass
    padding: every item in a step runs the step's MAX live pass count
    (measured 2.5-3.4x the summed pass count on the demos) — but the
    per-pass body is an (8,128)-register op, so the padding is cheap
    next to the deleted per-item overhead, and compose-only launches
    (icons isolation levels: zero passes) skip winding entirely.

    Measured on v5e (material-design 1488^2 raw executor): serial 1.41 ms
    -> kvec 0.7-0.9 ms (~3.1 Gpx/s median; sub-ms configs jitter ~2x).
    Bit-identical output to the serial kernel on hardware.  Default ON."""
    return os.environ.get("SVGR_KVEC", "1") != "0"


def pregather() -> bool:
    """Materialize per-item big winding / clip coverage fields at prep
    time instead of keeping the stacks VMEM-resident and
    dynamic-row-reading them per item.  The per-item fields stream as ordinary sequential
    (K, T, T) pipeline blocks (+T*T*4 bytes/item of HBM traffic, ~40 us
    on material-design), and the kernel's per-item dynamic VMEM reads —
    a scalar-core address dependency on the critical path — disappear.
    Also frees the stack bytes from the VMEM budget, admitting larger
    scenes to the fused/vout path."""
    return os.environ.get("SVGR_PREGATHER", "1") != "0"


def _clamp_antideriv(t):
    return jnp.where(t <= 0, 0.0, jnp.where(t >= 1, t - 0.5, 0.5 * t * t))


def _coverage(wind, rule):
    """rule: 0 nonzero, 1 evenodd (scalar)."""
    nonzero = jnp.clip(jnp.abs(wind), 0.0, 1.0)
    evenodd = jnp.abs(jnp.remainder(wind + 1.0, 2.0) - 1.0)
    return jnp.where(rule == 0, nonzero, evenodd)


def _edge_params(lines, t_size: int):
    """Packed winding params: lines (N, S, 4) -> (N, P, 8, 128).

    Row k of each pass holds parameter k (sign, y_lo, y_hi, x_lo, slope,
    band offset, 2 zero-pad rows) for the pass's G = 128//T edges, each
    pre-broadcast across its T lanes by this device-side prep (HBM pays
    G*T/G = T x the compact size, ~0.1ms of bandwidth for a dense scene,
    and the kernel's inner loop needs no broadcast at all — an exact
    HIGHEST-precision MXU broadcast matmul per pass measured ~25% of the
    whole render).  Row 5 holds each edge's 8-row band offset (the host
    packer band-splits edges, render_plan._band_split, so an edge lives
    entirely inside band [band8, band8+8)); the kernel evaluates each
    pass on an (8, LANES) register at that offset instead of the full
    (T, LANES) — most edges span a row or two, so the unbanded
    formulation wasted 3/4 of the VPU on provably-zero rows.  Also
    returns the per-row live pass count.
    """
    f32 = DEVICE_FLOAT
    g = LANES // t_size
    n, s, _ = lines.shape
    n_pass = -(-s // g)
    if n_pass * g != s:
        lines = jnp.concatenate(
            [lines, jnp.zeros((n, n_pass * g - s, 4), f32)], axis=1
        )
    a0, a1, b0, b1 = lines[..., 0], lines[..., 1], lines[..., 2], lines[..., 3]
    sign = jnp.sign(b0 - a0)
    y_lo = jnp.minimum(a0, b0)
    y_hi = jnp.maximum(a0, b0)
    x_lo = jnp.where(a0 <= b0, a1, b1)
    x_hi = jnp.where(a0 <= b0, b1, a1)
    dy = y_hi - y_lo
    slope = (x_hi - x_lo) / jnp.where(dy > 0, dy, 1.0)
    band8 = jnp.clip(jnp.floor(y_lo / 8.0), 0, t_size // 8 - 1) * 8.0
    zero = jnp.zeros_like(sign)
    ep = jnp.stack([sign, y_lo, y_hi, x_lo, slope, band8, zero, zero], axis=-1)
    ep = ep.reshape(n, n_pass, g, 8).transpose(0, 1, 3, 2)  # (N, P, 8, G)
    ep = jnp.repeat(ep, t_size, axis=-1)                    # (N, P, 8, 128)

    live = jnp.abs(lines).max(axis=-1) > 0                  # (N, P*G)
    last = jnp.max(
        jnp.where(live, jnp.arange(1, n_pass * g + 1, dtype=jnp.int32), 0),
        axis=-1,
    )
    passes = (last + g - 1) // g                            # (N,) i32
    return ep, passes, n_pass


def _winding_pass_body(edge_at, rows8, lane_col, n_bands: int):
    """The shared packed-lane banded winding inner loop (one pass = G edges).

    edge_at(p) -> (8, 128) params pre-broadcast across lanes; rows8 is the
    (8, 1) in-band row iota.  Each pass evaluates its edges on the 8-row
    band they live in (param row 5, host band-split) — (8, 128) vector ops
    cost a quarter of the old (T, 128) formulation at tile 32 — and
    lane-selects the result into that band's accumulator.  Rows outside an
    edge's band contribute a hard zero in the unbanded form (the dy clamp),
    so banded accumulation is bit-identical.
    """

    def body(p, accs):
        e = edge_at(p)
        sign = e[0:1, :]
        y_lo = e[1:2, :]
        y_hi = e[2:3, :]
        x_lo = e[3:4, :]
        slope = e[4:5, :]
        band8 = e[5:6, :]
        rows = rows8 + band8                  # (8, 128)
        lo = jnp.maximum(y_lo, rows)
        hi = jnp.minimum(y_hi, rows + 1.0)
        dy = jnp.maximum(hi - lo, 0.0)
        xs0 = x_lo + slope * (lo - y_lo)
        xs1 = x_lo + slope * (hi - y_lo)
        g0 = (lane_col + 1.0) - xs0
        g1 = (lane_col + 1.0) - xs1
        den = g1 - g0
        safe = jnp.abs(den) > 1e-7
        mean = jnp.where(
            safe,
            (_clamp_antideriv(g1) - _clamp_antideriv(g0))
            / jnp.where(safe, den, 1.0),
            jnp.clip(0.5 * (g0 + g1), 0.0, 1.0),
        )
        r = sign * dy * mean
        return tuple(
            a + jnp.where(band8 == b * 8.0, r, 0.0)
            for b, a in enumerate(accs)
        )

    return body


def _winding_accs(n_bands: int):
    return tuple(
        jnp.zeros((8, LANES), DEVICE_FLOAT) for _ in range(n_bands)
    )


def _fold_groups(acc, t_size: int):
    """Sum the G edge groups of an (R, 128) accumulator -> (R, T)."""
    wind = acc[:, 0:t_size]
    for g in range(1, LANES // t_size):
        wind = wind + acc[:, g * t_size : (g + 1) * t_size]
    return wind


def _fold_bands(accs, t_size: int):
    """Band accumulators (B x (8, 128)) -> the (T, T) winding field."""
    return jnp.concatenate([_fold_groups(a, t_size) for a in accs], axis=0)


# --------------------------------------------------------------------------
# pre-pass: winding stacks for big segment classes
# --------------------------------------------------------------------------


def _prepass_kernel_factory(t_size: int, k_block: int):
    T = t_size
    B = T // 8

    def kernel(np_ref, edges_ref, out_ref):
        f32 = DEVICE_FLOAT
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(f32)
        lane_col = (
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) % T
        ).astype(f32)

        def row(k, _):
            accs = jax.lax.fori_loop(
                0,
                np_ref[k, 0, 0],
                _winding_pass_body(
                    lambda p: edges_ref[k, p], rows8, lane_col, B
                ),
                _winding_accs(B),
            )
            out_ref[k] = _fold_bands(accs, T)
            return 0

        jax.lax.fori_loop(0, k_block, row, 0)

    return kernel


def prepass_winding(arrays, t_size: int):
    """Pallas winding stack for padded edge-list classes (M_c, S_c, 4).

    Drop-in replacement for batch_exec._prepass_winding: concatenates the
    per-class winding fields plus a trailing zeros scratch row.  The
    packed-lane kernel runs at full VPU width where the XLA formulation
    pads T lanes up to 128.  K classes are rasterized per grid step (the
    per-step overhead otherwise rivals the main kernel's on dense scenes
    with many big classes).
    """
    T = t_size
    winds = []
    for arr in arrays:
        if arr is None or arr.shape[0] == 0:
            continue
        m = arr.shape[0]
        kb = prepass_k()
        m_pad = -(-m // kb) * kb
        edges, passes, n_pass = _edge_params(arr.astype(DEVICE_FLOAT), T)
        if m_pad != m:
            edges = jnp.concatenate(
                [edges, jnp.zeros((m_pad - m,) + edges.shape[1:], edges.dtype)]
            )
            passes = jnp.concatenate(
                [passes, jnp.zeros((m_pad - m,), passes.dtype)]
            )
        wind = pl.pallas_call(
            _prepass_kernel_factory(T, kb),
            grid_spec=pl.GridSpec(
                grid=(m_pad // kb,),
                in_specs=[
                    pl.BlockSpec((kb, 1, 8), lambda i: (i, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((kb, n_pass, 8, LANES),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((kb, T, T), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((m_pad, T, T), DEVICE_FLOAT),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interpret(),
        )(
            jnp.broadcast_to(passes[:, None, None], (m_pad, 1, 8)),
            edges,
        )
        winds.append(wind[:m])
    if not winds:
        return None
    winds.append(jnp.zeros((1, T, T), DEVICE_FLOAT))
    return jnp.concatenate(winds, axis=0)


# --------------------------------------------------------------------------
# main kernel
# --------------------------------------------------------------------------


def _item_compute(
    T: int, k_stops: int, features: frozenset, rows, rows8, lane_col,
    edge_at, ip, fp, carry_col, color_row, stop_off, stop_row,
    big_field, clip_field, tex_field, mask_field, pat_field,
    n_pass: int | None = None, grad_field=None,
):
    """One work item's premultiplied (rgba, alpha) planar tiles (T, 4T).

    All per-item operands arrive as accessor callables / gathered values so
    the single-item (v1) and K-items-per-step (v2) kernels share every line
    of the winding / coverage / paint / mask math.  ip(j)/fp(j) read the
    item's int/float scalar params; *_field are the pre-gathered stack rows
    (or None when the feature is off).
    """
    f32 = DEVICE_FLOAT
    has_grad = "grad" in features
    ablate = _ablate()

    if "stub" in ablate:
        if color_row is None:
            rgba = jnp.full((T, 4 * T), 0.5, f32)
        else:
            rgba = jnp.broadcast_to(color_row.reshape(1, 4 * T), (T, 4 * T))
        return rgba, pltpu.repeat(rgba[:, 3 * T : 4 * T], 4, axis=1)

    # ---- inline winding: G edges per pass, banded (8, 128) registers ----
    if ablate == "nowind":
        wind = jnp.zeros((T, T), f32)
    else:
        body = _winding_pass_body(edge_at, rows8, lane_col, T // 8)
        accs = _winding_accs(T // 8)
        if (static_passes() or "wunroll" in features) and n_pass:
            n_live = ip(4)
            for p in range(n_pass):
                accs = jax.lax.cond(
                    p < n_live,
                    functools.partial(body, p),
                    lambda a: a,
                    accs,
                )
        else:
            accs = jax.lax.fori_loop(0, ip(4), body, accs)
        wind = _fold_bands(accs, T)

    if big_field is not None:
        wind = wind + big_field
    if carry_col is not None:
        wind = wind + carry_col
    if ablate == "nocov":
        mask = wind
    else:
        cov = _coverage(wind, ip(1))
        if clip_field is not None:
            # host-precomputed clip coverage (rules + carries folded in)
            cov = cov * clip_field
        mask = cov * fp(16)
        mask = jnp.where(mask < 1e-6, 0.0, mask)
    mask128 = pltpu.repeat(mask, 4, axis=1)  # planar tile -> (T, 4T)

    # ---- paint ------------------------------------------------------
    if grad_field is not None:
        # "pregrad_paint": the streamed field IS the finished paint
        # (solid colors included — _paint_item broadcasts them)
        paint = grad_field
    else:
        paint = jnp.broadcast_to(color_row.reshape(1, 4 * T), (T, 4 * T))
    if has_grad:
        kind = ip(0)

        def _grad_paint(paint):
            r = rows + fp(17) + 0.5                                   # (T,1)
            c = (jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(f32)
                 + fp(18) + 0.5)
            gx = r * fp(0) + c * fp(1) + fp(2)                        # (T,T)
            gy = r * fp(3) + c * fp(4) + fp(5)
            vec0 = fp(8) - fp(6)
            vec1 = fp(9) - fp(7)
            denom = jnp.maximum(vec0 * vec0 + vec1 * vec1, 1e-30)
            t_lin = ((gx - fp(6)) * vec0 + (gy - fp(7)) * vec1) / denom
            cd0 = fp(10) - fp(12)
            cd1 = fp(11) - fp(13)
            pd0 = gx - fp(12)
            pd1 = gy - fp(13)
            radius = fp(14)
            fradius = fp(15)
            rd = radius - fradius
            a_q = cd0 * cd0 + cd1 * cd1 - rd * rd
            b_q = pd0 * cd0 + pd1 * cd1 + fradius * rd
            c_q = pd0 * pd0 + pd1 * pd1 - fradius * fradius
            det = b_q * b_q - a_q * c_q
            sq = jnp.sqrt(jnp.maximum(det, 0.0))
            a_safe = jnp.where(jnp.abs(a_q) > 1e-30, a_q, 1e-30)
            t_rad = jnp.maximum((b_q + sq) / a_safe, (b_q - sq) / a_safe)
            # f32 throughout: Mosaic cannot select on i1 vectors
            rad_valid = (det >= 0).astype(f32)
            lim = fradius / jnp.where(
                jnp.abs(rd) > 1e-12, fradius - radius, 1.0
            )
            rad_valid = jnp.where(jnp.abs(rd) > 1e-12,
                                  rad_valid * (t_rad > lim).astype(f32),
                                  rad_valid)
            t = jnp.where(kind == PAINT_LINEAR, t_lin, t_rad)
            mode = ip(3)
            repeat = t - jnp.trunc(t)
            reflect = jnp.abs(jnp.remainder(t + 1.0, 2.0) - 1.0)
            t = jnp.where(mode == 0, t, jnp.where(mode == 1, repeat, reflect))
            t128 = pltpu.repeat(t, 4, axis=1)                       # (T,4T)
            grad = jnp.broadcast_to(stop_row(0).reshape(1, 4 * T), (T, 4 * T))
            n_live_stops = ip(7) if "sguard" in features else None

            def stop_step(k, grad):
                span = stop_off(k) - stop_off(k - 1)
                ok = span > 1e-12
                ratio = jnp.clip(
                    (t128 - stop_off(k - 1)) / jnp.where(ok, span, 1.0),
                    0.0, 1.0,
                )
                ratio = jnp.where(
                    ok, ratio, (t128 >= stop_off(k)).astype(f32)
                )
                return grad + ratio * (stop_row(k) - stop_row(k - 1)).reshape(
                    1, 4 * T
                )

            for k in range(1, k_stops):
                if n_live_stops is None:
                    grad = stop_step(k, grad)
                else:
                    # padded stops are numeric no-ops (offset 1.0, zero
                    # color delta); the cond skips their VPU time
                    grad = jax.lax.cond(
                        k < n_live_stops,
                        functools.partial(stop_step, k),
                        lambda g: g,
                        grad,
                    )
            valid128 = pltpu.repeat(rad_valid, 4, axis=1)
            return grad * jnp.where(kind == PAINT_RADIAL, valid128, 1.0)

        if solid_skip():
            # one scalar-predicated branch per item: solid fills (the
            # majority on dense scenes) skip the whole gradient block
            paint = jax.lax.cond(
                kind == PAINT_SOLID, lambda p: p, _grad_paint, paint
            )
        else:
            paint = jnp.where(kind == PAINT_SOLID, paint, _grad_paint(paint))
    if pat_field is not None:
        # pattern items' paint tiles are pre-rendered by the XLA paint
        # path into a small planar pool (see execute_items_fused)
        paint = jnp.where(ip(0) == PAINT_PATTERN, pat_field, paint)
    if tex_field is not None:
        paint = jnp.where(ip(5) >= 0, tex_field, paint)
    if mask_field is not None:
        # SVG mask value = luminance weights dotted with premultiplied
        # rgb: channel-plane slices + one repeat (exact, unlike an MXU
        # matmul, and quarter-width where the old roll reduction paid
        # full lanes)
        lum_tt = (
            mask_field[:, 0:T] * 0.2125
            + mask_field[:, T : 2 * T] * 0.7154
            + mask_field[:, 2 * T : 3 * T] * 0.072
        )
        lum = pltpu.repeat(lum_tt, 4, axis=1)
        mask128 = mask128 * jnp.where(ip(6) >= 0, lum, 1.0)

    rgba = mask128 * paint
    # per-pixel alpha = rgba's alpha plane broadcast to all four planes;
    # one quarter-width slice + repeat, bit-identical to the old
    # asel-mask + 3-roll reduction
    alpha = pltpu.repeat(rgba[:, 3 * T : 4 * T], 4, axis=1)
    return rgba, alpha


def _kernel_factory(t_size: int, k_stops: int, features: frozenset):
    """Build the kernel fn for one static configuration."""
    T = t_size

    has_big = "big" in features
    has_clip = "clip" in features
    has_grad = "grad" in features
    pre_grad = "pregrad_paint" in features
    has_tex = "tex" in features
    has_mask = "mask" in features
    has_pat = "pat" in features
    pre = "pregather" in features
    wpack = "wpack" in features

    # scalar-prefetch slot of each gathered array's row index (pregather
    # streams big/clip as per-item blocks instead — no row scalars)
    pretex_on = "pretex" in features
    s_slots = {"tile": 0}
    for name, on in (("big", has_big and not pre),
                     ("clip", has_clip and not pre),
                     ("tex", has_tex and not pretex_on),
                     ("mask", has_mask and not pretex_on),
                     ("pat", has_pat)):
        if on:
            s_slots[name] = len(s_slots)
    n_scalars = len(s_slots)

    def kernel(*refs):
        scalar_refs = refs[:n_scalars]
        tile_ref = scalar_refs[s_slots["tile"]]
        it = iter(refs[n_scalars:-1])
        edges_ref = next(it)     # (1, P, 8, 128) VMEM lane-broadcast params
        if not wpack:
            carries_ref = next(it)   # (1, T, 1) VMEM
        iparams_ref = next(it)   # (1, 1, 8) SMEM int32
        fparams_ref = next(it)   # (1, 1, 24) SMEM f32
        color_ref = next(it)     # (1, 1, 4T) VMEM (channel-planar)
        if has_grad:
            stop_off_ref = next(it)  # (1, 1, K) SMEM
            stops_ref = next(it)     # (1, K, 4T) VMEM
        if pre_grad:
            grad_ref = next(it)      # (1, T, 4T) VMEM pre-rendered paint
        if wpack:
            wind_ref = next(it)      # (1, T, 128) packed wind/clip lanes
        if has_big and not wpack:
            big_ref = next(it)       # resident (M+1,T,T) or pregather (1,T,T)
        if has_clip and not wpack:
            clip_ref = next(it)      # resident (U+1,T,T) or pregather (1,T,T)
        if pretex_on:
            if has_tex:
                tex_blk = next(it)   # (1, T, 4T) streamed pool row
            if has_mask:
                msk_blk = next(it)
        elif has_tex or has_mask:
            # (P+1, T, 4T) VMEM-resident pool; tex and mask gather rows
            # from the SAME buffer (separate scalar row indices)
            pool_ref = next(it)
            tex_ref = msk_ref = pool_ref
        if has_pat:
            pat_ref = next(it)       # (Q+1, T, 4T) VMEM-resident pattern tiles
        out_ref = refs[-1]           # (1, T, 4T) VMEM, revisited per tile run

        i = pl.program_id(0)
        f32 = DEVICE_FLOAT
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).astype(f32)
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(f32)
        lane_col = (
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) % T
        ).astype(f32)

        rgba, alpha = _item_compute(
            T, k_stops, features, rows, rows8, lane_col,
            edge_at=lambda p: edges_ref[0, p],
            ip=lambda j: iparams_ref[0, 0, j],
            fp=lambda j: fparams_ref[0, 0, j],
            carry_col=None if wpack else carries_ref[0, :, 0:1],
            color_row=color_ref[0, 0],
            stop_off=(lambda k: stop_off_ref[0, 0, k]) if has_grad else None,
            stop_row=(lambda k: stops_ref[0, k]) if has_grad else None,
            grad_field=grad_ref[0] if pre_grad else None,
            big_field=(wind_ref[0][:, 0:T] if wpack else
                       (big_ref[0] if pre else
                        big_ref[scalar_refs[s_slots["big"]][i]])
                       if has_big else None),
            clip_field=(wind_ref[0][:, T : 2 * T] if (wpack and has_clip)
                        else (clip_ref[0] if pre else
                              clip_ref[scalar_refs[s_slots["clip"]][i]])
                        if has_clip else None),
            tex_field=(tex_blk[0] if pretex_on else
                       tex_ref[scalar_refs[s_slots["tex"]][i]])
            if has_tex else None,
            mask_field=(msk_blk[0] if pretex_on else
                        msk_ref[scalar_refs[s_slots["mask"]][i]])
            if has_mask else None,
            pat_field=pat_ref[scalar_refs[s_slots["pat"]][i]] if has_pat else None,
            n_pass=edges_ref.shape[1],
        )

        # ---- Porter-Duff OVER into the revisited canvas block -----------
        j = jnp.maximum(i - 1, 0)
        first = (i == 0) | (tile_ref[i] != tile_ref[j])
        prev = jnp.where(first, 0.0, out_ref[0])
        out_ref[0] = rgba + prev * (1.0 - alpha)

    return kernel, s_slots, n_scalars


RING = 8


ZWIN = 16  # in-flight window for untouched-row zero fills (zout)


def _zout_fill(s, out_ref, zrows_ref, zsrc, zsem, t_size):
    """Step-0 zero fill of untouched canvas rows by windowed async copies.

    zrows_ref is [count, row ids...] (scalar prefetch, host-static).  The
    window bounds in-flight descriptors; every start is waited before the
    item loop runs, so the fills can never race a ring flush (flushes
    target touched rows only — disjoint)."""

    @pl.when(s == 0)
    def _():
        zsrc[...] = jnp.zeros((t_size, 4 * t_size), DEVICE_FLOAT)
        n0 = zrows_ref[0]

        def start(j, c):
            pltpu.make_async_copy(
                zsrc, out_ref.at[zrows_ref[1 + j]], zsem
            ).start()

            @pl.when(j >= ZWIN)
            def _():
                # same-shape descriptor waits the same sem + byte count
                pltpu.make_async_copy(zsrc, out_ref.at[0], zsem).wait()

            return c

        jax.lax.fori_loop(0, n0, start, 0)

        def drain(j, c):
            pltpu.make_async_copy(zsrc, out_ref.at[0], zsem).wait()
            return c

        jax.lax.fori_loop(0, jnp.minimum(n0, ZWIN), drain, 0)


def _kernel_factory_kvec(t_size: int, features: frozenset, k_items: int):
    """Vectorized-phase-1 K-items kernel (the "kvec" feature; vout only).

    The v2/v3 kernels run the whole per-item pipeline serially inside a
    grid step; the measured per-item cost (~0.37 us at K=16) is ~2.6x the
    raw vector-op estimate — scalar-core address computation, loop
    control, and scalar<->vector stalls BETWEEN items.  Here phase 1
    (winding, coverage, clip, opacity, paint select) runs for all K items
    of the step as (K, ., .) block ops: ONE winding loop whose dynamic
    trip is the step's scalar-prefetched max live pass count (so
    compose-only steps skip winding entirely), every per-item scalar
    (opacity, fill rule, tex/mask flags) streamed as lane planes in a
    (K, 4, 128) "vpar" block and applied by exact multiplicative blends
    (flag in {0,1}: a*(1-flag) + b*flag is bit-exact, unlike a+(b-a)*f).
    Phase 2 (tile-run composition into the VMEM-resident canvas) stays
    serial but is a statically unrolled ~6-op tail per item.

    Eligibility (plan_features): wpack when big/clip present; pregrad
    (no in-kernel gradients); pretex when tex/mask present; no patterns.
    Edge params arrive pass-major (P, K, 8, 128) so the loop index rides
    the leading dim.  Phase 2 composes into the VMEM-resident canvas
    ("vout") or through the ring-flush DMA machinery (same sequencing as
    the serial kernel) when the canvas exceeds the budget.
    """
    T = t_size
    K = k_items
    B = T // 8
    G = LANES // T

    vout = "vout" in features
    wpack = "wpack" in features
    has_clip = "clip" in features
    pre_grad = "pregrad_paint" in features
    has_tex = "tex" in features
    has_mask = "mask" in features
    has_zout = "zout" in features and not vout
    kres_on = "kres" in features  # resident pool, per-item phase-2 blends

    s_slots = {"tile": 0}
    if kres_on and has_tex:
        s_slots["tex"] = len(s_slots)
    if kres_on and has_mask:
        s_slots["mask"] = len(s_slots)
    s_slots["smax"] = len(s_slots)
    if kres_on and (has_tex or has_mask) and vout:
        # per-step pool flag: steps whose K items are all pool-free (the
        # common case on sparse tex/mask launches) take a pure K-block
        # compose tail — no per-item pool row reads, no per-item blends
        s_slots["pmax"] = len(s_slots)
    if has_zout:
        s_slots["zrows"] = len(s_slots)
    n_scalars = len(s_slots)

    def kernel(*refs):
        tile_ref = refs[s_slots["tile"]]
        smax_ref = refs[s_slots["smax"]]
        pmax_ref = refs[s_slots["pmax"]] if "pmax" in s_slots else None
        it = iter(refs[n_scalars:])
        edges_ref = next(it)          # (P, K, 8, 128) pass-major
        if not wpack:
            carries_ref = next(it)    # (K, T, 1)
        _iparams_ref = next(it)       # (K, 1, 8) SMEM (phase-1 needs none)
        _fparams_ref = next(it)       # (K, 1, 24) SMEM
        color_ref = next(it)          # (K, 1, 4T)
        vpar_ref = next(it)           # (K, 8, 128): op, rule, texf, maskf,
        #                               same, 3 sublane-padding rows
        if pre_grad:
            grad_ref = next(it)       # (K, T, 4T)
        if wpack:
            wind_ref = next(it)       # (K, T, 128)
        if kres_on:
            if has_tex or has_mask:
                pool_ref = next(it)   # (P+1, T, 4T) VMEM-resident pool
        else:
            if has_tex:
                tex_ref = next(it)    # (K, T, 4T) streamed pool rows
            if has_mask:
                msk_ref = next(it)
        out_ref = next(it)            # vout: (num_tiles, T, 4T) VMEM
        if not vout:                  # else HBM + manual ring DMA
            ring = next(it)           # (RING, T, 4T) VMEM scratch
            state = next(it)          # (2,) SMEM: flush count, cur tile
            sems = next(it)           # (RING,) DMA semaphores
            if has_zout:
                zsrc = next(it)       # (T, 4T) VMEM zero source
                zsem = next(it)       # untouched-row fill semaphore

        s = pl.program_id(0)
        f32 = DEVICE_FLOAT
        # full-lane iotas: adding a (1, 8, 1) row iota to a (K, 1, 128)
        # operand would need a sublane+lane vector broadcast, which
        # Mosaic does not implement
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, LANES), 1).astype(f32)
        lane_col = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANES), 2) % T
        ).astype(f32)

        # ---- phase 1: winding, all K items per pass step --------------
        def body(p, accs):
            e = edges_ref[p]                       # (K, 8, 128)
            sign = e[:, 0:1, :]
            y_lo = e[:, 1:2, :]
            y_hi = e[:, 2:3, :]
            x_lo = e[:, 3:4, :]
            slope = e[:, 4:5, :]
            band8 = e[:, 5:6, :]
            rows = rows8 + band8                   # (K, 8, 128)
            lo = jnp.maximum(y_lo, rows)
            hi = jnp.minimum(y_hi, rows + 1.0)
            dy = jnp.maximum(hi - lo, 0.0)
            xs0 = x_lo + slope * (lo - y_lo)
            xs1 = x_lo + slope * (hi - y_lo)
            g0 = (lane_col + 1.0) - xs0
            g1 = (lane_col + 1.0) - xs1
            den = g1 - g0
            safe = jnp.abs(den) > 1e-7
            mean = jnp.where(
                safe,
                (_clamp_antideriv(g1) - _clamp_antideriv(g0))
                / jnp.where(safe, den, 1.0),
                jnp.clip(0.5 * (g0 + g1), 0.0, 1.0),
            )
            r = sign * dy * mean
            return tuple(
                a + jnp.where(band8 == b * 8.0, r, 0.0)
                for b, a in enumerate(accs)
            )

        accs = tuple(jnp.zeros((K, 8, LANES), f32) for _ in range(B))
        ablate = _ablate()
        if ablate not in ("nowind", "stub"):
            accs = jax.lax.fori_loop(0, smax_ref[s], body, accs)

        def foldg(a):                              # (K, 8, 128) -> (K, 8, T)
            w = a[:, :, 0:T]
            for g in range(1, G):
                w = w + a[:, :, g * T : (g + 1) * T]
            return w

        wind = jnp.concatenate([foldg(a) for a in accs], axis=1)  # (K,T,T)

        if wpack:
            wp = wind_ref[...]
            wind = wind + wp[:, :, 0:T]
        else:
            wind = wind + carries_ref[...]         # (K, T, 1) broadcast

        # coverage: rule is {0,1} per item; the multiplicative blend is
        # bit-exact (x*1 + y*0 == x), where the serial kernel's scalar
        # where() would be a vector-cond select here.  vpar rows are
        # lane-replicated, so every plane below broadcasts along ONE of
        # the last two dims only — Mosaic rejects a combined
        # sublane+lane vector broadcast ((K,1,1) -> (K,T,T))
        def lanes4(row):                           # (K, 1, 128) -> (K, 1, 4T)
            return jnp.concatenate([row] * (4 * T // LANES), axis=2) \
                if 4 * T > LANES else row[:, :, : 4 * T]

        rule = vpar_ref[:, 1:2, 0:T]               # (K, 1, T)
        nonzero = jnp.clip(jnp.abs(wind), 0.0, 1.0)
        evenodd = jnp.abs(jnp.remainder(wind + 1.0, 2.0) - 1.0)
        cov = nonzero * (1.0 - rule) + evenodd * rule
        if has_clip:
            cov = cov * wp[:, :, T : 2 * T]
        mask = cov * vpar_ref[:, 0:1, 0:T]         # opacity
        mask = jnp.where(mask < 1e-6, 0.0, mask)
        mask128 = jnp.concatenate([mask] * 4, axis=2)  # (K, T, 4T)

        # ---- paint ----------------------------------------------------
        if pre_grad:
            paint = grad_ref[...]
        else:
            paint = jnp.broadcast_to(
                color_ref[...].reshape(K, 1, 4 * T), (K, T, 4 * T)
            )
        if not kres_on:
            if has_tex:
                texf = lanes4(vpar_ref[:, 2:3, :])  # (K, 1, 4T) in {0,1}
                paint = paint * (1.0 - texf) + tex_ref[...] * texf
            if has_mask:
                mb = msk_ref[...]
                lum_tt = (
                    mb[:, :, 0:T] * 0.2125
                    + mb[:, :, T : 2 * T] * 0.7154
                    + mb[:, :, 2 * T : 3 * T] * 0.072
                )
                lum = jnp.concatenate([lum_tt] * 4, axis=2)
                maskf = lanes4(vpar_ref[:, 3:4, :])
                mask128 = mask128 * (lum * maskf + (1.0 - maskf))

            rgba_all = mask128 * paint             # (K, T, 4T)
            if ablate == "stub":
                # phase-2-only measurement: constant item tiles, phase 1
                # (winding/coverage/paint) dropped entirely
                rgba_all = jnp.full((K, T, 4 * T), 0.25, f32)

        # ---- phase 2: serial tile-run compose (static unroll) ---------
        def rgba_k(kq):
            if kres_on:
                # resident-pool blends per item: same formulas as the
                # streamed (K,.) blends above, sliced to this item —
                # only the dynamic pool row reads stay on the per-item
                # path (sparse launches; most items skip via {0,1} flags)
                i = s * K + kq
                p = paint[kq]
                if has_tex:
                    texf = lanes4(vpar_ref[kq : kq + 1, 2:3, :])[0]
                    p = p * (1.0 - texf) + (
                        pool_ref[refs[s_slots["tex"]][i]] * texf
                    )
                m = mask128[kq]
                if has_mask:
                    mb = pool_ref[refs[s_slots["mask"]][i]]  # (T, 4T)
                    lum_tt = (
                        mb[:, 0:T] * 0.2125
                        + mb[:, T : 2 * T] * 0.7154
                        + mb[:, 2 * T : 3 * T] * 0.072
                    )
                    lum = jnp.concatenate([lum_tt] * 4, axis=1)
                    maskf = lanes4(vpar_ref[kq : kq + 1, 3:4, :])[0]
                    m = m * (lum * maskf + (1.0 - maskf))
                r = m * p
                return r, pltpu.repeat(r[:, 3 * T : 4 * T], 4, axis=1)
            r = rgba_all[kq]                       # static slice (T, 4T)
            return r, pltpu.repeat(r[:, 3 * T : 4 * T], 4, axis=1)

        def scan_chain(rgba_kb, fac_kb, prev):
            # log2(K) Kogge-Stone inclusive scan of the linear recurrence
            # acc_k = rgba_k + fac_k * acc_{k-1}, acc_{-1} = prev.  Run
            # boundaries need no segmentation: fac is 0 at run starts
            # (the continuation flag), so the running product F kills any
            # cross-run leak.  Identity padding is (F=1, R=0).
            F, R = fac_kb, rgba_kb
            d = 1
            while d < K:
                pf = jnp.ones((d,) + F.shape[1:], f32)
                pr = jnp.zeros((d,) + R.shape[1:], f32)
                Fs = jnp.concatenate([pf, F[: K - d]], axis=0)
                Rs = jnp.concatenate([pr, R[: K - d]], axis=0)
                R = R + F * Rs
                F = F * Fs
                d *= 2
            return R + F * prev[None]

        scan_on = "kscan" in features

        if vout:
            @pl.when(s == 0)
            def _():
                zero = jnp.zeros((T, 4 * T), f32)

                def zrow(r, c):
                    out_ref[r] = zero
                    return c

                jax.lax.fori_loop(0, out_ref.shape[0], zrow, 0)

            nt = out_ref.shape[0]
            i0 = s * K

            if "vstore" in features:
                # branch-free compose: the run-continuation flag (vpar
                # row 4, host-static) folds in as an exact {0,1} blend
                # and every item stores its running composite — the last
                # writer of a run wins, so no conditional writes and no
                # scalar-cond selects remain on the per-item path.  tile
                # ids arrive via the pad-remapped "tile_store" prefetch,
                # so every store lands inside the canvas.
                if kres_on:
                    # per-item rgba (pool blends); carry factor per item
                    def fac(kq, alpha):
                        same = lanes4(vpar_ref[kq : kq + 1, 4:5, :])[0]
                        return (1.0 - alpha) * same

                    @pl.when(pmax_ref[s] > 0)
                    def _pool_tail():
                        tile = tile_ref[i0]
                        rgba, alpha = rgba_k(0)
                        acc = rgba + out_ref[tile] * fac(0, alpha)
                        out_ref[tile] = acc
                        for kq in range(1, K):
                            tile = tile_ref[i0 + kq]
                            rgba, alpha = rgba_k(kq)
                            acc = rgba + acc * fac(kq, alpha)
                            out_ref[tile] = acc

                    @pl.when(pmax_ref[s] == 0)
                    def _fast_tail():
                        # all K items pool-free: their tex/mask flags are
                        # 0, so the per-item pool blends are exact
                        # identities (x*1 + row*0 == x for finite rows)
                        # and the whole tail collapses to the K-block
                        # form below
                        rgba_nt = mask128 * paint          # (K, T, 4T)
                        alpha_nt = jnp.concatenate(
                            [rgba_nt[:, :, 3 * T : 4 * T]] * 4, axis=2
                        )
                        fac_nt = (1.0 - alpha_nt) * lanes4(
                            vpar_ref[:, 4:5, :]
                        )
                        if scan_on:
                            acc_nt = scan_chain(
                                rgba_nt, fac_nt, out_ref[tile_ref[i0]]
                            )
                            for kq in range(K):
                                out_ref[tile_ref[i0 + kq]] = acc_nt[kq]
                            return
                        tile = tile_ref[i0]
                        acc = rgba_nt[0] + out_ref[tile] * fac_nt[0]
                        out_ref[tile] = acc
                        for kq in range(1, K):
                            tile = tile_ref[i0 + kq]
                            acc = rgba_nt[kq] + acc * fac_nt[kq]
                            out_ref[tile] = acc

                    return

                # the whole carry factor (1-alpha)*same is one K-block
                # op, leaving a mul+add+store tail per item ({0,1}
                # blends and x*1.0 are bit-exact, so this equals the
                # branchy tail)
                alpha_all = jnp.concatenate(
                    [rgba_all[:, :, 3 * T : 4 * T]] * 4, axis=2
                )                                      # (K, T, 4T)
                fac_all = (1.0 - alpha_all) * lanes4(vpar_ref[:, 4:5, :])

                if scan_on and ablate != "nochain":
                    acc_all = scan_chain(
                        rgba_all, fac_all, out_ref[tile_ref[i0]]
                    )
                    for kq in range(K):
                        out_ref[tile_ref[i0 + kq]] = acc_all[kq]
                    return

                tile = tile_ref[i0]
                prev = out_ref[tile]
                acc = rgba_all[0] + prev * fac_all[0]
                out_ref[tile] = acc
                if ablate == "nochain":
                    # dependency-chain measurement: same stores, but each
                    # item's value is independent (WRONG output)
                    for kq in range(1, K):
                        out_ref[tile_ref[i0 + kq]] = rgba_all[kq]
                    return
                for kq in range(1, K):
                    tile = tile_ref[i0 + kq]
                    acc = rgba_all[kq] + acc * fac_all[kq]
                    out_ref[tile] = acc
                return

            tile0 = tile_ref[i0]
            rgba, alpha = rgba_k(0)
            j0 = jnp.maximum(i0 - 1, 0)
            first = (i0 == 0) | (tile0 != tile_ref[j0])
            prev = jnp.where(first, 0.0, out_ref[jnp.minimum(tile0, nt - 1)])
            acc, cur = rgba + prev * (1.0 - alpha), tile0
            for kq in range(1, K):
                tile = tile_ref[s * K + kq]
                rgba, alpha = rgba_k(kq)
                changed = tile != cur

                @pl.when(changed)
                def _(cur=cur, acc=acc):
                    out_ref[cur] = acc

                acc = jnp.where(changed, rgba, rgba + acc * (1.0 - alpha))
                cur = tile

            @pl.when(cur < nt)
            def _():
                out_ref[cur] = acc

            return

        # ring path: identical DMA sequencing to the serial kernel (the
        # semaphore accounting invariant and the final-flush rule are
        # deadlock-critical; see _kernel_factory_k) — only the per-item
        # compute is replaced by phase-1 slices
        nsteps = pl.num_programs(0)

        if has_zout:
            _zout_fill(s, out_ref, refs[s_slots["zrows"]], zsrc, zsem, T)

        @pl.when(s == 0)
        def _():
            state[0] = 0
            state[1] = tile_ref[0]

        def start_flush():
            fc = state[0]
            slot = jax.lax.rem(fc, RING)
            pltpu.make_async_copy(
                ring.at[slot], out_ref.at[state[1]], sems.at[slot]
            ).start()
            state[0] = fc + 1

        def flush():
            start_flush()
            fc = state[0]
            nslot = jax.lax.rem(fc, RING)

            @pl.when(fc >= RING)
            def _():
                pltpu.make_async_copy(
                    ring.at[nslot], out_ref.at[0], sems.at[nslot]
                ).wait()

        for kq in range(K):
            i = s * K + kq
            tile = tile_ref[i]
            changed = (i > 0) & (tile != state[1])

            @pl.when(changed)
            def _():
                flush()

            state[1] = tile
            rgba, alpha = rgba_k(kq)
            slot = jax.lax.rem(state[0], RING)
            prev = jnp.where(changed | (i == 0), 0.0, ring[slot])
            ring[slot] = rgba + prev * (1.0 - alpha)

        @pl.when(s == nsteps - 1)
        def _():
            start_flush()
            for ss in range(RING):
                @pl.when(ss < state[0])
                def _():
                    pltpu.make_async_copy(
                        ring.at[ss], out_ref.at[0], sems.at[ss]
                    ).wait()

    return kernel, s_slots, n_scalars


def _kernel_factory_k(t_size: int, k_stops: int, features: frozenset,
                      k_items: int):
    """K-items-per-grid-step kernel with ring-buffer canvas flushes.

    The v1 kernel's floor is per-grid-step overhead: one step per work item
    means ~N pipelined block fetches of tiny per-item operands plus the
    revisited-output-block bookkeeping — measured ~70% of a dense frame.
    Here each grid step fetches K items' operands in one set of blocks and
    loops over them in-kernel.  Composition no longer rides the revisited
    output block (a step may span several tile runs): the running tile
    accumulates in a ring of VMEM scratch tiles, and on each tile-run
    boundary the finished (T, 4T) tile is flushed to its canvas row by a
    manual async copy — HBM still sees exactly one write per touched tile,
    and the ring (with per-slot DMA semaphores) keeps RING flushes in
    flight so compute never stalls on the copies.  Cross-step state (flush
    counter, current tile) lives in SMEM scratch, which persists across
    the sequential TPU grid.

    With the "vout" feature (v3) the ring machinery disappears entirely:
    the WHOLE canvas is a VMEM-resident output (plan_features admits
    "vout" only when stacks + canvas fit the budget) and each item
    read-modify-writes its tile's row by dynamic index — the same
    dynamic-row access the resident stacks already use.  Pallas copies
    the canvas to HBM once after the last step, replacing the ~one flush
    DMA per tile run (descriptor start + semaphore wait each, measured
    half the frame on dense scenes) with a single bulk copy.
    """
    if "kvec" in features:
        return _kernel_factory_kvec(t_size, features, k_items)
    T = t_size
    K = k_items

    vout = "vout" in features
    has_big = "big" in features
    has_clip = "clip" in features
    has_grad = "grad" in features
    pre_grad = "pregrad_paint" in features
    has_tex = "tex" in features
    has_mask = "mask" in features
    has_pat = "pat" in features
    pre = "pregather" in features
    wpack = "wpack" in features
    pretex_on = "pretex" in features

    s_slots = {"tile": 0}
    has_zout = "zout" in features and not vout
    for name, on in (("big", has_big and not pre),
                     ("clip", has_clip and not pre),
                     ("tex", has_tex and not pretex_on),
                     ("mask", has_mask and not pretex_on),
                     ("pat", has_pat),
                     ("zrows", has_zout)):
        if on:
            s_slots[name] = len(s_slots)
    n_scalars = len(s_slots)

    ablate = _ablate()

    def kernel(*refs):
        scalar_refs = refs[:n_scalars]
        tile_ref = scalar_refs[s_slots["tile"]]
        it = iter(refs[n_scalars:])
        edges_ref = next(it)     # (K, P, 8, 128) VMEM lane-broadcast params
        if not wpack:
            carries_ref = next(it)   # (K, T, 1) VMEM
        iparams_ref = next(it)   # (K, 1, 8) SMEM int32
        fparams_ref = next(it)   # (K, 1, 24) SMEM f32
        color_ref = next(it)     # (K, 1, 4T) VMEM (channel-planar)
        if has_grad:
            stop_off_ref = next(it)  # (K, 1, S) SMEM
            stops_ref = next(it)     # (K, S, 4T) VMEM
        if pre_grad:
            grad_ref = next(it)      # (K, T, 4T) VMEM pre-rendered paint
        if wpack:
            wind_ref = next(it)      # (K, T, 128): lanes [0,T) winding
            #                          base (big + carry), [T,2T) clip
        if has_big and not wpack:
            big_ref = next(it)       # resident (M+1,T,T) or pregather (K,T,T)
        if has_clip and not wpack:
            clip_ref = next(it)      # resident (U+1,T,T) or pregather (K,T,T)
        if pretex_on:
            if has_tex:
                tex_blk = next(it)   # (K, T, 4T) streamed pool rows
            if has_mask:
                msk_blk = next(it)
        elif has_tex or has_mask:
            # (P+1, T, 4T) VMEM-resident pool; tex and mask gather rows
            # from the SAME buffer (separate scalar row indices)
            pool_ref = next(it)
            tex_ref = msk_ref = pool_ref
        if has_pat:
            pat_ref = next(it)       # (Q+1, T, 4T) VMEM-resident pattern tiles
        out_ref = next(it)           # (num_tiles+1, T, 4T): vout = VMEM
        if not vout:                 # else HBM + manual ring DMA
            ring = next(it)          # (RING, T, 4T) VMEM scratch
            state = next(it)         # (2,) SMEM: flush count, cur tile
            sems = next(it)          # (RING,) DMA semaphores
            if has_zout:
                zsrc = next(it)      # (T, 4T) VMEM zero source
                zsem = next(it)      # untouched-row fill semaphore

        s = pl.program_id(0)
        nsteps = pl.num_programs(0)
        f32 = DEVICE_FLOAT
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).astype(f32)
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(f32)
        lane_col = (
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) % T
        ).astype(f32)

        def compute(kq, i):
            return _item_compute(
                T, k_stops, features, rows, rows8, lane_col,
                edge_at=lambda p: edges_ref[kq, p],
                ip=lambda j: iparams_ref[kq, 0, j],
                fp=lambda j: fparams_ref[kq, 0, j],
                carry_col=None if wpack else carries_ref[kq, :, 0:1],
                color_row=color_ref[kq, 0],
                stop_off=(lambda k: stop_off_ref[kq, 0, k]) if has_grad else None,
                stop_row=(lambda k: stops_ref[kq, k]) if has_grad else None,
                grad_field=grad_ref[kq] if pre_grad else None,
                big_field=(wind_ref[kq][:, 0:T] if wpack else
                           (big_ref[kq] if pre else
                            big_ref[scalar_refs[s_slots["big"]][i]])
                           if has_big else None),
                clip_field=(wind_ref[kq][:, T : 2 * T] if (wpack and has_clip)
                            else (clip_ref[kq] if pre else
                                  clip_ref[scalar_refs[s_slots["clip"]][i]])
                            if has_clip else None),
                tex_field=(tex_blk[kq] if pretex_on else
                           tex_ref[scalar_refs[s_slots["tex"]][i]])
                if has_tex else None,
                mask_field=(msk_blk[kq] if pretex_on else
                            msk_ref[scalar_refs[s_slots["mask"]][i]])
                if has_mask else None,
                pat_field=pat_ref[scalar_refs[s_slots["pat"]][i]]
                if has_pat else None,
                n_pass=edges_ref.shape[1],
            )

        if vout:
            # v3: compose into the VMEM-resident canvas; no ring, no
            # semaphores.  tile_id is sorted, so each tile is ONE
            # contiguous run: the running tile accumulates in a register
            # and touches its canvas row only at run boundaries (a fresh
            # run always starts from zero; a run continuing across the
            # step boundary is re-read once by the peeled first item,
            # matching the end-of-step flush below).  A dynamic-index
            # VMEM read-modify-write per ITEM was the single largest
            # line item of the stub-kernel floor.
            @pl.when(s == 0)
            def _():
                # zero-fill the whole canvas (VMEM stores, ~30 us on a
                # 1488^2 grid) so untouched tiles come out exact zeros —
                # replaces the XLA searchsorted/select membership pass
                # that re-streamed the canvas through HBM twice
                zero = jnp.zeros((T, 4 * T), f32)

                def zrow(r, c):
                    out_ref[r] = zero
                    return c

                jax.lax.fori_loop(0, out_ref.shape[0], zrow, 0)

            # the canvas has NO pad scratch row (a post-kernel [:num_tiles]
            # slice materialized a whole-canvas copy, ~0.11 ms at 1488^2):
            # trailing pad items carry tile_id == num_tiles, so reads
            # clamp and writes are predicated off instead
            nt = out_ref.shape[0]
            i0 = s * K
            tile0 = tile_ref[i0]
            rgba, alpha = compute(0, i0)
            j0 = jnp.maximum(i0 - 1, 0)
            first = (i0 == 0) | (tile0 != tile_ref[j0])
            prev = jnp.where(first, 0.0, out_ref[jnp.minimum(tile0, nt - 1)])
            carry = (rgba + prev * (1.0 - alpha), tile0)

            def item_vout(kq, carry):
                acc, cur = carry
                i = s * K + kq
                tile = tile_ref[i]
                rgba, alpha = compute(kq, i)
                changed = tile != cur

                # no pad guard needed here: pads sort last globally, so
                # once cur == nt (the pad run) every later item in the
                # step is also a pad -> changed stays False; an in-loop
                # flush can never fire with cur == nt.  Only the
                # post-loop flush and the peeled prev read are guarded.
                @pl.when(changed)
                def _():
                    out_ref[cur] = acc

                acc = jnp.where(changed, rgba, rgba + acc * (1.0 - alpha))
                return acc, tile

            if fused_unroll():
                for kq in range(1, K):
                    carry = item_vout(kq, carry)
            else:
                carry = jax.lax.fori_loop(1, K, item_vout, carry)
            acc, cur = carry

            @pl.when(cur < nt)
            def _():
                out_ref[cur] = acc

            return

        if has_zout:
            _zout_fill(s, out_ref, scalar_refs[s_slots["zrows"]],
                       zsrc, zsem, T)

        @pl.when(s == 0)
        def _():
            state[0] = 0
            state[1] = tile_ref[0]

        def start_flush():
            fc = state[0]
            slot = jax.lax.rem(fc, RING)
            pltpu.make_async_copy(
                ring.at[slot], out_ref.at[state[1]], sems.at[slot]
            ).start()
            state[0] = fc + 1

        def flush():
            # tile-run boundary: flush the finished tile, then clear the
            # RING-ago flush before accumulating into its slot.  The
            # semaphore accounting invariant: reuse-waits clear starts
            # {0..F-9}, so exactly min(F, RING) starts stay outstanding —
            # one per slot — for the end-of-kernel drain.  (The FINAL
            # flush must NOT take this wait: it would leave one drained
            # slot with no outstanding DMA and deadlock the drain loop —
            # observed as a TPU watchdog kill on dense scenes.)
            start_flush()
            fc = state[0]
            nslot = jax.lax.rem(fc, RING)

            @pl.when(fc >= RING)
            def _():
                # a same-shape descriptor waits the same sem + byte count
                pltpu.make_async_copy(
                    ring.at[nslot], out_ref.at[0], sems.at[nslot]
                ).wait()

        def item(kq, _):
            i = s * K + kq
            tile = tile_ref[i]
            changed = (i > 0) & (tile != state[1])

            @pl.when(changed)
            def _():
                flush()

            state[1] = tile

            rgba, alpha = compute(kq, i)

            slot = jax.lax.rem(state[0], RING)
            prev = jnp.where(changed | (i == 0), 0.0, ring[slot])
            ring[slot] = rgba + prev * (1.0 - alpha)
            return 0

        jax.lax.fori_loop(0, K, item, 0)

        @pl.when(s == nsteps - 1)
        def _():
            start_flush()
            for ss in range(RING):
                @pl.when(ss < state[0])
                def _():
                    pltpu.make_async_copy(
                        ring.at[ss], out_ref.at[0], sems.at[ss]
                    ).wait()

    return kernel, s_slots, n_scalars



def _resident_spec(arr):
    """Whole-array VMEM spec for a resident stack (kept as one buffer)."""
    return pl.BlockSpec(memory_space=pltpu.VMEM)

def _gather_map(pos):
    return lambda i, *s: (s[pos][i], 0, 0)


def prepare_fused(
    items: dict, t_size: int, big_lines=(), clip_cov=None, patterns=None,
    features=frozenset(), pool_rows: int = 0, static_pass: bool = False,
    num_tiles: int = 0,
):
    """Scene-static device prep for the fused executor.

    Everything here depends only on the packed plan (edge lists, paints,
    pre-pass stacks, the pattern atlas) — NOT on the isolation-pass pool —
    so a served scene computes it once and every later frame starts at the
    kernel.  The lane-broadcast winding params alone are T x the compact
    edge lists (~67 MB main + ~97 MB prepass on material-design), and the
    prepass winding stack was re-rasterized every call; _device_plan
    caches the returned dict per plan and feeds it back through the
    `prepared` argument of execute_items_fused.
    """
    f32 = DEVICE_FLOAT
    T = t_size
    features = frozenset(features)
    n = items["tile_id"].shape[0]

    edges, passes, _n_pass = _edge_params(items["lines"].astype(f32), T)
    # big items REPLACE their winding with the pre-pass field in the XLA
    # executor (their inline lines are not guaranteed empty) — skip their
    # inline passes so add == replace
    big_item = items["big_idx"].astype(jnp.int32) >= 0
    passes = jnp.where(big_item, 0, passes)
    if static_pass:
        # the kernel runs every pass unconditionally; zeroed params make
        # a padding edge contribute exactly 0, so zero big items' inline
        # edges instead of relying on the dynamic pass count
        edges = jnp.where(big_item[:, None, None, None], 0.0, edges)

    wpack = "wpack" in features
    carries = items["carry"].astype(f32)[:, :, None]  # (N, T, 1)

    ipar = jnp.stack(
        [
            items["kind"].astype(jnp.int32),
            items["fill_rule"].astype(jnp.int32),
            jnp.zeros((n,), jnp.int32),  # (was clip rule — folded into cov)
            items["spread"].astype(jnp.int32),
            passes,
            items["tex_idx"].astype(jnp.int32),
            items["mask_idx"].astype(jnp.int32),
            # real gradient stop count (for the "sguard" guarded unroll);
            # plans packed before the field existed run the full table
            (items["n_stops"].astype(jnp.int32) if "n_stops" in items
             else jnp.full((n,), MAX_STOP_GUARD, jnp.int32)),
        ],
        axis=-1,
    )[:, None, :]  # (N, 1, 8)

    aff = items["affine"].astype(f32).reshape(n, 6)
    fpar = jnp.concatenate(
        [
            aff,
            items["p0"].astype(f32),
            items["p1"].astype(f32),
            items["center"].astype(f32),
            items["fcenter"].astype(f32),
            items["radius"].astype(f32)[:, None],
            items["fradius"].astype(f32)[:, None],
            items["opacity"].astype(f32)[:, None],
            items["tile_r"].astype(f32)[:, None],
            items["tile_c"].astype(f32)[:, None],
            jnp.zeros((n, 5), f32),
        ],
        axis=-1,
    )[:, None, :]  # (N, 1, 24)

    # channel-planar paint vector: lane l holds color[l // T]
    colorv = jnp.broadcast_to(
        items["color"].astype(f32)[:, :, None], (n, 4, T)
    ).reshape(n, 1, 4 * T)

    if "kvec" in features:
        # kvec reads one PASS of all K items per loop step: transpose to
        # pass-major (P, N, 8, 128) so the in-kernel dynamic index rides
        # the leading dim (the well-supported Mosaic pattern); the loop
        # trip is the step's max live pass count (scalar-prefetched)
        edges = edges.transpose(1, 0, 2, 3)
    prepared = {
        "edges": edges,
        "ipar": ipar,
        "fpar": fpar,
        "colorv": colorv,
        "tile_id": items["tile_id"].astype(jnp.int32),
    }
    n_real = n
    for feat in features:
        if isinstance(feat, tuple) and feat[0] == "nreal":
            n_real = max(1, min(int(feat[1]), n))
    if "kvec" in features or "zout" in features:
        # pad-remapped scalar-prefetch tile array (vstore + zout): pads
        # (sorted last) retarget the last REAL item's tile, so their
        # stores/flushes rewrite that run's final value instead of
        # escaping into a scratch canvas row — which lets the canvas
        # drop the +1 scratch row and the whole-canvas [:num_tiles]
        # slice copy it forced
        tid = items["tile_id"].astype(jnp.int32)
        idx = jnp.arange(n)
        prepared["tile_store"] = jnp.where(
            idx >= n_real, tid[n_real - 1], tid
        )
    if "zout" in features and num_tiles:
        # untouched canvas rows, front-packed behind their count: the
        # ring kernel zero-fills them by DMA at step 0, replacing the
        # XLA membership select that re-streamed the canvas through HBM
        # twice (~0.7 ms at 3840x3840).  tile_id is sorted on ring plans.
        probe = jnp.arange(num_tiles, dtype=jnp.int32)
        pos = jnp.clip(jnp.searchsorted(tid, probe), 0, n - 1)
        touched = tid[pos] == probe
        order = jnp.argsort(touched.astype(jnp.int32), stable=True)
        count = (num_tiles - touched.sum()).astype(jnp.int32)
        prepared["zrows"] = jnp.concatenate([count[None], probe[order]])
    if "kvec" in features:
        # per-item scalars the vectorized pipeline needs as lane planes:
        # row 0 opacity, row 1 fill rule (0/1), row 2 tex flag, row 3
        # mask flag, row 4 run-continuation flag (same tile as the
        # previous item; pads chain through so a pad's compose is a
        # no-op rewrite) — each broadcast across the 128 lanes
        same = jnp.concatenate(
            [jnp.zeros((1,), jnp.bool_), tid[1:] == tid[:-1]]
        )
        same = jnp.where(idx >= n_real, True, same)
        vrows = jnp.stack(
            [
                items["opacity"].astype(f32),
                items["fill_rule"].astype(f32),
                (items["tex_idx"].astype(jnp.int32) >= 0).astype(f32),
                (items["mask_idx"].astype(jnp.int32) >= 0).astype(f32),
                same.astype(f32),
                jnp.zeros((n,), f32),  # rows 5-7: sublane padding so one
                jnp.zeros((n,), f32),  # item = exactly one (8, 128) tile
                jnp.zeros((n,), f32),
            ],
            axis=-1,
        )  # (N, 8)
        # committed as 2D (N*8, 128): a 2D array has only one possible
        # layout, so the launch program's reshape back to (N, 8, 128) is
        # a tile-aligned bitcast.  Committing the 3D form let the prep
        # jit pick {2,0,1}, which cost a whole-array layout copy at every
        # serve call (22 us on icons' main program alone).
        prepared["vpar"] = jnp.broadcast_to(
            vrows[:, :, None], (n, 8, LANES)
        ).reshape(n * 8, LANES)
    if not wpack:
        prepared["carries"] = carries

    if "grad" in features:
        k_stops = int(items["stop_offsets"].shape[1])
        prepared["stop_off"] = items["stop_offsets"].astype(f32)[:, None, :]
        prepared["stops"] = jnp.broadcast_to(
            items["stop_colors"].astype(f32)[:, :, :, None], (n, k_stops, 4, T)
        ).reshape(n, k_stops, 4 * T)
    if "pregrad_paint" in features:
        # scene-static paint fields via the batched XLA paint path (the
        # exact formulas batch_exec uses; solid items come out as their
        # broadcast color, so the kernel's paint IS this field)
        from .batch_exec import _paint_item

        sub = {
            k: items[k].astype(f32) if items[k].dtype.kind == "f" else items[k]
            for k in ("affine", "p0", "p1", "center", "fcenter", "radius",
                      "fradius", "spread", "stop_offsets", "stop_colors",
                      "color", "kind")
        }
        fields = jax.vmap(
            lambda it, tr, tc: _paint_item(it, tr, tc, T)
        )(sub, items["tile_r"].astype(f32), items["tile_c"].astype(f32))
        if "field_idx" in items:
            # collapsed-run items: the streamed paint IS the precomposed
            # premultiplied RGBA field (full-coverage carry makes the
            # kernel's compose exactly P + acc * (1 - P.alpha))
            fidx = items["field_idx"].astype(jnp.int32)
            stack = items["field"].astype(f32)
            fields = jnp.where(
                (fidx >= 0)[:, None, None, None],
                stack[jnp.maximum(fidx, 0)],
                fields,
            )
        prepared["grad_field"] = (
            fields.astype(f32).transpose(0, 1, 3, 2).reshape(n, T, 4 * T)
        )

    pre = "pregather" in features
    big_base = clip_part = None
    if "big" in features:
        if big_lines is not None and not isinstance(big_lines, (tuple, list)):
            big_lines = (big_lines,)
        big_wind = prepass_winding(tuple(big_lines or ()), T)   # (M+1, T, T)
        m = big_wind.shape[0] - 1
        big_idx = items["big_idx"].astype(jnp.int32)
        rows = jnp.where(big_idx >= 0, big_idx, m)
        if wpack:
            big_base = big_wind[rows]                           # (n, T, T)
        elif pre:
            prepared["big_field"] = big_wind[rows]              # (n, T, T)
        else:
            prepared["big_wind"] = big_wind
            prepared["big_rows"] = rows
    if "clip" in features:
        # host-precomputed coverage fields; all-ones scratch row for
        # clip_idx == -1 (unclipped / padding items)
        clip_stack = jnp.concatenate(
            [clip_cov.astype(f32), jnp.ones((1, T, T), f32)], axis=0
        )                                                       # (U+1, T, T)
        u = clip_stack.shape[0] - 1
        clip_idx = items["clip_idx"].astype(jnp.int32)
        rows = jnp.where(clip_idx >= 0, clip_idx, u)
        if wpack:
            clip_part = clip_stack[rows]                        # (n, T, T)
        elif pre:
            prepared["clip_field"] = clip_stack[rows]           # (n, T, T)
        else:
            prepared["clip_cov"] = clip_stack
            prepared["clip_rows"] = rows
    if wpack:
        # one full-lane (n, T, 128) per-item block: lanes [0, T) hold the
        # item's winding base (big-class field + row carry), lanes
        # [T, 2T) its clip coverage.  Separate (T, T)/(T, 1) operands
        # VMEM-pad their lanes to 128 each anyway, and their
        # jit-output layouts drew per-call input normalization copies.
        base = jnp.broadcast_to(carries, (n, T, T))
        if big_base is not None:
            base = big_base + carries
        parts = [base]
        if clip_part is not None:
            parts.append(clip_part)
        lanes_used = T * len(parts)
        if lanes_used < LANES:
            parts.append(jnp.zeros((n, T, LANES - lanes_used), f32))
        prepared["wind_pack"] = jnp.concatenate(parts, axis=2)
    # the runtime pool (isolation-pass textures) gathers by row index; the
    # scratch row for "-1" sits at pool_rows (execute pads the pool by
    # one).  pretex launches instead remap misses to row 0: their blend
    # flag is 0, so x*1 + row*0 == x for any finite row — which lets the
    # callers drop the scratch-row append entirely (a 50 MB pad op cost
    # 66 us/call on the stress scene)
    miss = 0 if "pretex" in features else pool_rows
    if "tex" in features:
        tex_idx = items["tex_idx"].astype(jnp.int32)
        prepared["tex_rows"] = jnp.where(tex_idx >= 0, tex_idx, miss)
    if "mask" in features:
        mask_idx = items["mask_idx"].astype(jnp.int32)
        prepared["mask_rows"] = jnp.where(mask_idx >= 0, mask_idx, miss)
    if "pat" in features:
        # pre-render the Q pattern items' paint tiles with the XLA paint
        # path (exact same modular-gather semantics, batch_exec._paint_item)
        from .batch_exec import _paint_item

        rows = items["pat_rows"].astype(jnp.int32)        # (Q,) item indices
        sub = {
            k: items[k][rows]
            for k in ("affine", "pat_fwd", "pat_xy", "pat_wh", "pat_lo",
                      "pat_max", "p0", "p1", "center", "fcenter", "radius",
                      "fradius", "spread", "stop_offsets", "stop_colors",
                      "color", "kind")
        }
        pat_tex = patterns[items["pat_idx"][rows].astype(jnp.int32)]
        tiles = jax.vmap(
            lambda it, tr, tc, tex: _paint_item(it, tr, tc, T, tex)
        )(sub, items["tile_r"][rows], items["tile_c"][rows], pat_tex)
        pat_pool = jnp.concatenate(
            [tiles.astype(f32), jnp.zeros((1, T, T, 4), f32)], axis=0
        ).transpose(0, 1, 3, 2).reshape(-1, T, 4 * T)     # channel-planar
        q_rows = pat_pool.shape[0] - 1
        prepared["pat_pool"] = pat_pool
        # per-item position in the pool (host-precomputed rank, Q for none)
        prepared["pat_pos"] = jnp.minimum(
            items["pat_pos"].astype(jnp.int32), q_rows
        )
    return prepared


_prepare_jit = None


def prepare_fused_cached(items, t_size, big_lines=(), clip_cov=None,
                         patterns=None, features=frozenset(),
                         pool_rows: int = 0, num_tiles: int = 0):
    """Jitted prepare_fused (one program instead of op-by-op dispatches —
    the remote tunnel pays ~0.4s per eager dispatch)."""
    global _prepare_jit
    if _prepare_jit is None:
        _prepare_jit = jax.jit(
            prepare_fused,
            static_argnames=(
                "t_size", "features", "pool_rows", "static_pass",
                "num_tiles",
            ),
        )
    return _prepare_jit(
        items, t_size, tuple(big_lines or ()), clip_cov, patterns,
        frozenset(features), pool_rows, static_passes(), num_tiles,
    )


def execute_items_fused(
    items: dict, t_size: int, num_tiles: int, big_lines=(), pool=None,
    patterns=None, clip_cov=None, features=frozenset(), prepared=None,
    planar_out: bool = False,
):
    """Traceable fused execution; same contract as batch_exec.execute_items.

    Requires: patterns is None or an atlas, LANES % t_size == 0.
    `features` is the static capability set computed by plan_features from
    the host-side plan ("big", "clip", "grad", "tex", "mask", "pat").
    `prepared` (from prepare_fused) skips the scene-static prep — the
    serving path caches it per plan.  planar_out returns the kernel's
    native channel-planar (num_tiles, T, 4T) canvas instead of
    (num_tiles, T, T, 4) — the serving program keeps every intermediate
    canvas planar, skipping one whole-canvas shuffle copy per launch.
    """
    f32 = DEVICE_FLOAT
    T = t_size
    features = frozenset(features)
    _STATS["fused_launches"] += 1
    if prepared is None:
        prepared = prepare_fused(
            items, T, big_lines, clip_cov, patterns, features,
            # a planar (ndim-3) pool already carries its scratch row last
            pool_rows=(
                pool.shape[0] - (1 if pool.ndim == 3 else 0)
                if pool is not None else 0
            ),
            static_pass=static_passes(),
            num_tiles=num_tiles,
        )

    edges = prepared["edges"]
    if "kvec" in features:
        n, n_pass = edges.shape[1], edges.shape[0]
    else:
        n, n_pass = edges.shape[0], edges.shape[1]
    tile_id = prepared["tile_id"]

    # K items per grid step (v2); K=1 selects the single-item v1 kernel.
    # The K=32 default only pays at tile 32 (device-chained A/Bs: stress
    # 0.93 -> 0.89 ms, 52-doc atlas 3.19 -> 3.10, icons ==).  At fatter
    # tiles each (K, T, 4T) stream block quadruples: tile-64 4K serving
    # measured K=16 22% FASTER than K=32 (2.54 vs 3.24 ms/frame), and at
    # tile 128 (the 8K canvas) K=32's 8 MB blocks crash the TPU compile
    # helper outright where K=16 serves 9.3 Gpx/s — so fat tiles cap at
    # 16, plus a ~4 MB/block byte guard for anything fatter still.
    kb = fused_k()
    if t_size >= 64:
        kb = min(kb, 16)
    kb = min(kb, max(1, (4 << 20) // (t_size * 4 * t_size * 4)))
    while kb > 1 and n % kb:
        kb //= 2

    kvec_on = "kvec" in features and kb > 1
    if "kvec" in features and not kvec_on:
        # degenerate launch (n not divisible by any K): the v1 kernel
        # wants the classic item-major layout back
        edges = edges.transpose(1, 0, 2, 3)
        features = features - {"kvec", "kres"}

    wpack = "wpack" in features
    vstore_on = (
        "vstore" in features and kvec_on and "vout" in features
    )
    zout_on = "zout" in features and kb > 1 and "zrows" in prepared
    scalars = [
        prepared["tile_store"] if (vstore_on or zout_on) else tile_id
    ]
    tensors = [edges]
    if kvec_on:
        in_specs = [
            pl.BlockSpec((n_pass, kb, 8, LANES), lambda i, *s: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((kb, n_pass, 8, LANES), lambda i, *s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if not wpack:
        tensors.append(prepared["carries"])
        in_specs.append(pl.BlockSpec((kb, T, 1), lambda i, *s: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    tensors += [prepared["ipar"], prepared["fpar"], prepared["colorv"]]
    in_specs += [
        pl.BlockSpec((kb, 1, 8), lambda i, *s: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((kb, 1, 24), lambda i, *s: (i, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((kb, 1, 4 * T), lambda i, *s: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    if kvec_on:
        vpar = prepared["vpar"].reshape(-1, 8, LANES)  # bitcast (see prep)
        tensors.append(vpar)
        in_specs.append(pl.BlockSpec((kb, vpar.shape[1], LANES),
                                     lambda i, *s: (i, 0, 0),
                                     memory_space=pltpu.VMEM))

    k_stops = 1
    if "grad" in features:
        k_stops = int(prepared["stops"].shape[1])
        tensors += [prepared["stop_off"], prepared["stops"]]
        in_specs += [
            pl.BlockSpec((kb, 1, k_stops), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((kb, k_stops, 4 * T), lambda i, *s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    if "pregrad_paint" in features:
        tensors.append(prepared["grad_field"])
        in_specs.append(pl.BlockSpec((kb, T, 4 * T), lambda i, *s: (i, 0, 0),
                                     memory_space=pltpu.VMEM))

    pre = "pregather" in features
    if wpack:
        tensors.append(prepared["wind_pack"])
        in_specs.append(pl.BlockSpec((kb, T, LANES), lambda i, *s: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    if "big" in features and not wpack:
        if pre:
            tensors.append(prepared["big_field"])
            in_specs.append(pl.BlockSpec((kb, T, T), lambda i, *s: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
        else:
            scalars.append(prepared["big_rows"])
            tensors.append(prepared["big_wind"])
            in_specs.append(_resident_spec(prepared["big_wind"]))
    if "clip" in features and not wpack:
        if pre:
            tensors.append(prepared["clip_field"])
            in_specs.append(pl.BlockSpec((kb, T, T), lambda i, *s: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
        else:
            scalars.append(prepared["clip_rows"])
            tensors.append(prepared["clip_cov"])
            in_specs.append(_resident_spec(prepared["clip_cov"]))
    pretex_on = "pretex" in features
    if "tex" in features or "mask" in features:
        if pool.ndim == 3:
            # the serving path keeps the pool channel-planar (P+1, T, 4T)
            # with the trailing scratch row baked in — no per-launch
            # concatenate + layout transpose of the whole pool (measured
            # ~0.1 ms per pool launch on icons.svg at pool cap 2048).
            # pretex launches may arrive WITHOUT the scratch row (their
            # miss indices remap to row 0 at prep)
            pool128 = pool.astype(f32)
        else:
            pool128 = pool.astype(f32).transpose(0, 1, 3, 2).reshape(
                -1, T, 4 * T
            )  # channel-planar
            if not pretex_on:
                pool128 = jnp.concatenate(
                    [pool128, jnp.zeros((1, T, 4 * T), f32)], axis=0
                )
    if pretex_on:
        # compose-dense launch: one XLA gather per frame turns the pool
        # reads into ordinary (K, T, 4T) pipeline blocks
        blk = pl.BlockSpec((kb, T, 4 * T), lambda i, *s: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        if "tex" in features:
            tensors.append(pool128[prepared["tex_rows"]])
            in_specs.append(blk)
        if "mask" in features:
            tensors.append(pool128[prepared["mask_rows"]])
            in_specs.append(blk)
    else:
        if "tex" in features:
            scalars.append(prepared["tex_rows"])
        if "mask" in features:
            scalars.append(prepared["mask_rows"])
        if "tex" in features or "mask" in features:
            # ONE resident operand shared by tex and mask gathers: two
            # specs of the same buffer would double the VMEM reservation
            tensors.append(pool128)
            in_specs.append(_resident_spec(pool128))
    if "pat" in features:
        scalars.append(prepared["pat_pos"])
        tensors.append(prepared["pat_pool"])
        in_specs.append(_resident_spec(prepared["pat_pool"]))

    # padding items (tile_id == num_tiles) sort last; the grid stops at the
    # real item count instead of burning steps on them (the XLA executor's
    # CHUNK_ITEMS padding is irrelevant here)
    n_real = n
    for f in features:
        if isinstance(f, tuple) and f[0] == "nreal":
            n_real = max(1, min(int(f[1]), n))
    use_vout = "vout" in features and kb > 1
    if kvec_on:
        # per-step max live pass count: the vectorized winding loop's
        # dynamic trip (compose-only steps skip winding entirely)
        grid_n = -(-n_real // kb)
        passes = prepared["ipar"][:, 0, 4]
        scalars.append(
            passes[: grid_n * kb].reshape(grid_n, kb)
            .max(axis=1).astype(jnp.int32)
        )
        if ("kres" in features and use_vout
                and ("tex" in features or "mask" in features)):
            # per-step pool flag (mirrors the factory's "pmax" slot):
            # rows below the scratch index are real pool references
            scratch = pool.shape[0] - (1 if pool.ndim == 3 else 0)
            flag = jnp.zeros(n, jnp.int32)
            if "tex" in features:
                flag = flag | (prepared["tex_rows"] < scratch).astype(
                    jnp.int32
                )
            if "mask" in features:
                flag = flag | (prepared["mask_rows"] < scratch).astype(
                    jnp.int32
                )
            scalars.append(
                flag[: grid_n * kb].reshape(grid_n, kb).max(axis=1)
            )
    if zout_on:
        scalars.append(prepared["zrows"])
    if kb > 1:
        if not zout_on:
            features = features - {"zout"}
        kernel, _slots, n_scalars = _kernel_factory_k(T, k_stops, features, kb)
        if use_vout:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=n_scalars,
                grid=(-(-n_real // kb),),
                in_specs=in_specs,
                # whole canvas VMEM-resident across the grid, one bulk
                # copy-out after the last step
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
        else:
            scratch = [
                pltpu.VMEM((RING, T, 4 * T), f32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA((RING,)),
            ]
            if zout_on:
                # zero source tile + completion semaphore for the
                # untouched-row fills
                scratch += [
                    pltpu.VMEM((T, 4 * T), f32),
                    pltpu.SemaphoreType.DMA,
                ]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=n_scalars,
                grid=(-(-n_real // kb),),
                in_specs=in_specs,
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=scratch,
            )
    else:
        features = features - {"zout"}
        kernel, _slots, n_scalars = _kernel_factory(T, k_stops, features)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalars,
            grid=(n_real,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, T, 4 * T), _gather_map(0),
                                   memory_space=pltpu.VMEM),
        )
    assert n_scalars == len(scalars)
    # vout: no pad scratch row — the kernel predicates pad-item writes off
    # (a post-kernel [:num_tiles] slice copied the whole canvas); zout
    # ring launches remap pads instead; other ring and v1 kernels keep
    # the +1 row to absorb pad flushes
    out_rows = num_tiles if (use_vout or zout_on) else num_tiles + 1
    canvas128 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, T, 4 * T), f32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the pre-pass winding stacks and the isolation pool stay
            # VMEM-resident (dynamic per-item row reads beat per-step
            # block gathers by ~30x); raise the scoped limit accordingly
            vmem_limit_bytes=(120 if use_vout else 100) * 1024 * 1024,
            has_side_effects=kb > 1 and not use_vout,
        ),
        interpret=_interpret(),
    )(*scalars, *tensors)

    if use_vout or zout_on:
        # vout zero-fills every row at step 0; zout ring launches DMA
        # zeros into untouched rows — either way no membership pass
        canvas = canvas128
    else:
        # tiles no item touched hold garbage (their output block was never
        # written — possibly NaN, so select rather than multiply).  The
        # scratch row absorbs pads.  tile_id is sorted, so membership is a
        # searchsorted probe — TPU scatters lower to sequential
        # dynamic-slices and are slow.
        probe = jnp.arange(num_tiles, dtype=tile_id.dtype)
        pos = jnp.clip(jnp.searchsorted(tile_id, probe), 0, n - 1)
        touched = tile_id[pos] == probe
        canvas = jnp.where(
            touched[:, None, None], canvas128[:num_tiles], 0.0
        )
    if planar_out:
        return canvas
    # channel-planar (T, 4T) -> (T, T, 4)
    return canvas.reshape(num_tiles, T, 4, T).transpose(0, 1, 3, 2)


def to_planar(tiles):
    """(N, T, T, 4) -> channel-planar (N, T, 4T)."""
    n, t = tiles.shape[0], tiles.shape[1]
    return tiles.transpose(0, 1, 3, 2).reshape(n, t, 4 * t)


def from_planar(canvas):
    """Channel-planar (N, T, 4T) -> (N, T, T, 4)."""
    n, t = canvas.shape[0], canvas.shape[1]
    return canvas.reshape(n, t, 4, t).transpose(0, 1, 3, 2)


@functools.lru_cache(maxsize=None)
def _backend_is_tpu() -> bool:
    return jax.default_backend() == "tpu"


_FALLBACK_SEEN: set = set()
_LAST_REASON: list = [None]
_FALLBACK_LOG: list = []  # every rejection, NOT deduped (tests/dryrun audit)
_STATS = {"fused_launches": 0}


def _fallback(reason: str, kind: str = "other"):
    """Log (once per distinct reason) why a plan left the fused path —
    silently landing on the 2.4x-slower XLA executor is a debugging trap.
    The structured `kind` is kept for callers that can recover (the
    render plan chunks over-budget stacks into several fused launches)."""
    import warnings

    _LAST_REASON[0] = kind
    _FALLBACK_LOG.append((kind, reason))
    if reason not in _FALLBACK_SEEN:
        _FALLBACK_SEEN.add(reason)
        warnings.warn(f"fused executor unavailable: {reason}; "
                      "using the XLA executor")
    return None


def last_fallback_kind():
    """The structured reason of the most recent plan_features rejection."""
    return _LAST_REASON[0]


def fallback_audit():
    """Snapshot for callers that must PROVE the fused path ran: returns
    (fused_launch_count, tuple of every (kind, reason) rejection so far).
    Compare before/after a render; see tests/test_parallel_scene.py and
    __graft_entry__.dryrun_multichip stage 3."""
    return _STATS["fused_launches"], tuple(_FALLBACK_LOG)


def plan_features(items, bigs, clips, pool, patterns, t_size: int,
                  num_tiles: int | None = None,
                  subpool_rows: int | None = None):
    """Host-side: the static feature set for the fused path, or None when
    the plan (or platform) requires the XLA executor.  `items` here are the
    host numpy arrays of a lowered plan.  With num_tiles, the set carries
    the real (non-padding) item count so the kernel grid skips the
    trailing pads.  subpool_rows: the caller will hand the kernel a
    gathered sub-pool of that many rows (render_plan vpool/subpool), so
    the VMEM budget charges the sub-pool, not the full pool capacity —
    a 2+ Mpx sprite atlas carries 5-12k pool rows but any one launch
    references a fraction of them."""
    mode = os.environ.get("SVGR_FUSED", "")
    _LAST_REASON[0] = None
    if mode == "0":
        return None  # explicit opt-out, not worth a warning
    if LANES % t_size != 0 or 4 * t_size < LANES:
        # 4T must fill whole 128-lane registers: the circular alpha /
        # luminance rolls would wrap at the padded lane count otherwise
        return _fallback(f"tile {t_size} does not pack 128 lanes")
    if mode not in ("1", "interp") and not _backend_is_tpu():
        return None  # CPU/GPU backends: the XLA executor is the design
    n_pat = int((items["pat_idx"] >= 0).sum())
    if n_pat and patterns is None:
        return _fallback("pattern paints without a pattern atlas")
    f = []
    pre = pregather()
    tt_rows = 2  # scratch rows
    pool_rows = 0
    if bigs is not None and any(b is not None and b.shape[0] for b in bigs):
        f.append("big")
        if not pre:
            tt_rows += sum(b.shape[0] for b in bigs if b is not None)
    if clips is not None and clips.shape[0]:
        f.append("clip")
        if not pre:
            tt_rows += clips.shape[0]
    if pre and ("big" in f or "clip" in f):
        # per-item fields stream as sequential pipeline blocks instead of
        # resident stacks + dynamic row reads; see pregather().  "wpack"
        # packs (big winding + carry) and clip coverage into lane groups
        # of ONE (N, T, 128) per-item block: the separate (N, T, T) /
        # (N, T, 1) operands drew nonstandard jit output layouts whose
        # per-call input normalization copies cost ~0.3 ms on icons.svg,
        # and each (T, T) block VMEM-pads its lanes to 128 anyway — the
        # pack halves the stream and keeps every layout standard
        f.append("pregather")
        if (1 + ("clip" in f)) * t_size <= LANES:
            f.append("wpack")
    kinds = items["kind"]
    # collapsed-run field items (render_plan._collapse_runs) deliver their
    # precomposed paint through the pregrad stream — prepare_fused swaps
    # the item's pre-rendered paint for the packed field row
    has_field = "field_idx" in items and (items["field_idx"] >= 0).any()
    if ((kinds == PAINT_LINEAR) | (kinds == PAINT_RADIAL)).any() or has_field:
        if pregrad():
            f.append("pregrad_paint")
        elif has_field:
            return _fallback(
                "collapsed field items require the pregrad paint stream "
                "(SVGR_PREGRAD=0 set with SVGR_COLLAPSE on)"
            )
        else:
            f.append("grad")
            n_stops = items.get("n_stops")
            k_stops = int(items["stop_offsets"].shape[1])
            if (n_stops is not None and k_stops > 4 and stop_guard()):
                import numpy as np

                grad_sel = (kinds == PAINT_LINEAR) | (kinds == PAINT_RADIAL)
                spans = np.maximum(
                    np.asarray(n_stops)[np.asarray(grad_sel)] - 1, 0
                )
                # guard each stop-interpolation step behind the item's
                # real count when the launch-wide table is mostly padding
                # (one long gradient widens k_stops for every item)
                if spans.size and (k_stops - 1) > 2.0 * max(float(spans.mean()), 0.5):
                    f.append("sguard")
    lines = items.get("lines")
    if lines is not None and wind_unroll_max() > 0:
        import numpy as np

        g = LANES // t_size
        s = lines.shape[1]
        n_pass = -(-s // g)
        live = np.abs(np.asarray(lines)).max(-1) > 0
        last = np.where(live, np.arange(1, s + 1), 0).max(-1)
        mean_passes = float((-(-last // g)).mean())
        # unrolling pays ~2.5x per-pass throughput (measured: the
        # dynamic-trip loop blocks cross-iteration scheduling) but runs
        # every item to the static max; profitable iff the padding
        # factor stays under that break-even
        if n_pass <= wind_unroll_max() and n_pass <= 2.6 * max(mean_passes, 0.4):
            f.append("wunroll")
    if pool is not None and (items["tex_idx"] >= 0).any():
        f.append("tex")
    if pool is not None and (items["mask_idx"] >= 0).any():
        f.append("mask")
    if ("tex" in f or "mask" in f) and pool is not None:
        # dense pool use (compose-heavy isolation levels): gather the
        # items' pool rows with XLA before the launch and stream them as
        # per-item blocks — the per-item dynamic VMEM row read is a
        # scalar-core dependency on the critical path.  Sparse use keeps
        # the resident pool (a full (N, T, 4T) gather would be ~80%
        # padding on icons.svg's main stream)
        share = float((
            (items["tex_idx"] >= 0) | (items["mask_idx"] >= 0)
        ).mean())
        # (widening pretex to every kvec-eligible launch was measured a
        # REGRESSION on icons.svg serving: the per-frame whole-stream
        # pool gather (~74 MB at share 0.22) costs more than the
        # vectorized kernel saves on a sparse launch — sparse launches
        # keep the resident pool and the serial kernel)
        #
        # pretex is also traffic-capped (round 5): the gather streams one
        # (T, 4T) row per padded item per FRAME, and on the 52-doc sprite
        # atlas's 6,144-item main that was ~100 MB/frame (173 us gather +
        # 88 us pad alone); forcing the resident-pool kres path instead
        # measured 3.59 -> 3.19 ms/frame whole-serve.  Dense levels keep
        # pretex (their gathers are a few MB); a launch over the cap only
        # drops to kres when the resident stacks actually fit the VMEM
        # budget — otherwise pretex stays (fused-with-gather still beats
        # the XLA-executor fallback by ~8x).
        gather_bytes = len(items["tile_id"]) * t_size * 4 * t_size * 4
        kres_pool = (subpool_rows + 1 if subpool_rows is not None
                     else pool.shape[0])
        kres_fits = (
            stack_bytes(tt_rows, pool_rows + kres_pool, t_size)
            <= vmem_budget()
        )
        if share >= 0.3 and pretex() and not (
            gather_bytes > _pretex_gather_budget()
            and kres() and kres_fits
        ):
            f.append("pretex")
        elif subpool_rows is not None:
            pool_rows += subpool_rows + 1  # + scratch row
        else:
            pool_rows += pool.shape[0]
    if n_pat:
        f.append("pat")
        pool_rows += n_pat + 1
    if stack_bytes(tt_rows, pool_rows, t_size) > vmem_budget():
        return _fallback(
            f"resident stacks ({tt_rows} winding tiles + {pool_rows} pool "
            f"rows at tile {t_size}) exceed the {vmem_budget() >> 20} MB "
            "VMEM budget",
            kind="vmem",
        )
    if num_tiles is not None:
        # padding items carry the scratch tile id (== num_tiles), sorted last
        n_real = int((items["tile_id"] < num_tiles).sum())
        f.append(("nreal", max(n_real, 1)))
        if fused_vout() and (
            stack_bytes(tt_rows, pool_rows, t_size)
            + canvas_bytes(num_tiles, t_size)
            <= vmem_budget()
        ):
            f.append("vout")
        elif zout():
            # ring path: zero untouched rows in-kernel and remap pads so
            # the output needs neither the +1 scratch row nor the
            # post-kernel membership select (two canvas HBM round trips)
            f.append("zout")
    if (
        kvec()
        and "grad" not in f                  # in-kernel gradients: not yet
        and "pat" not in f                   # resident atlas scalar rows
        and ("wpack" in f or ("big" not in f and "clip" not in f))
    ):
        if "pretex" not in f and ("tex" in f or "mask" in f):
            # sparse pool use: keep the pool VMEM-resident and do the
            # per-item pool blends in phase 2 ("kres") — phase 1 still
            # vectorizes winding/coverage/paint across the K block.
            # (Streaming the whole pool per item, pretex, was measured a
            # regression at share 0.22: ~74 MB/frame of gather traffic.)
            if kres():
                f.extend(["kvec", "kres"])
        else:
            f.append("kvec")
        if "kvec" in f and "vout" in f and vstore():
            f.append("vstore")
            if kscan():
                f.append("kscan")
    if ("kvec" in f and "wpack" not in f and "big" not in f
            and "clip" not in f and pre):
        # carry-only wpack: without it the (N, T, 1) carries operand
        # commits in a jit-chosen {0,2,1:T(1,128)} layout and pays a
        # whole-array normalization copy per call (77 us on the stress
        # scene's 3k-item main program — same disease as the round-4
        # vpar fix).  Packing the carry into the standard (N, T, 128)
        # wind stream costs ~12 us/call of extra stream bytes instead
        f.append("wpack")
    return frozenset(f)


def kvec_cluster(items, num_tiles: int, t_size: int):
    """Host: permutation clustering tile runs by winding pass count.

    The kvec kernel runs every item of a K-step to the step's MAX live
    pass count; with tiles in raster order the demos pay 2.5-3.4x the
    summed pass count in padding.  Tile runs are independent (z-order is
    per tile), so reordering whole runs by their max pass count packs
    similar items into the same steps.  Stable within a tile (z order
    kept) and pads stay last.  Returns the permutation, or None when it
    is the identity / does not apply.  Only valid for launches that will
    compose via the VMEM-resident canvas ("vout"): the ring path's
    membership probe (searchsorted) requires ascending tile ids.
    """
    import numpy as np

    tid = np.asarray(items["tile_id"])
    n = tid.shape[0]
    n_real = int((tid < num_tiles).sum())
    if n_real <= 1:
        return None
    lines = np.asarray(items["lines"])
    g = LANES // t_size
    s = lines.shape[1]
    live = np.abs(lines).max(-1) > 0
    last = np.where(live, np.arange(1, s + 1), 0).max(-1)
    passes = (-(-last // g)).astype(np.int64)
    passes[np.asarray(items["big_idx"]) >= 0] = 0
    key = np.zeros(n, np.int64)
    tmax = np.zeros(num_tiles + 1, np.int64)
    np.maximum.at(tmax, tid[:n_real], passes[:n_real])
    key[:n_real] = tmax[tid[:n_real]]
    key[n_real:] = 1 << 40
    # secondary: run pool-ness — clustering pool-referencing runs into as
    # few K-steps as possible lets the kres per-step gate ("pmax") route
    # the remaining steps through the pool-free K-block compose tail
    pool = (
        (np.asarray(items["tex_idx"]) >= 0)
        | (np.asarray(items["mask_idx"]) >= 0)
    ).astype(np.int64)
    pkey = np.zeros(n, np.int64)
    pmax = np.zeros(num_tiles + 1, np.int64)
    np.maximum.at(pmax, tid[:n_real], pool[:n_real])
    pkey[:n_real] = pmax[tid[:n_real]]
    # primary: run pass class; then pool-ness; then tile id; then
    # original index (z order within a tile is kept)
    perm = np.lexsort((np.arange(n), tid, pkey, key))
    if (perm == np.arange(n)).all():
        return None
    return perm


def pattern_rows(items):
    """Host-side companion arrays for the "pat" feature: the pattern
    items' indices (pow2-padded) and every item's rank in that list."""
    import numpy as np

    pat_idx = np.asarray(items["pat_idx"])
    sel = np.nonzero(pat_idx >= 0)[0]
    q = 1
    while q < sel.size:
        q *= 2
    rows = np.concatenate(
        [sel, np.full(q - sel.size, sel[0], dtype=sel.dtype)]
    ).astype(np.int32)
    pos = np.full(pat_idx.shape[0], 1 << 30, dtype=np.int32)
    pos[sel] = np.arange(sel.size, dtype=np.int32)
    return rows, pos
