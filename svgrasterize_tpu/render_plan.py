"""Host lowering: Scene -> flat tiled work-item plan -> few device programs.

The interpreter in scene.py issues one device call per path; on TPU the
dispatch latency dominates.  This module compiles a whole scene into the
batched form ops/batch_exec.py executes:

  * the canvas is a grid of T x T tiles (T viewport-adaptive, _pick_tile)
  * every FILL/STROKE draw is flattened on host (one batched flatten per
    subtree) and *binned*: each tile the draw overlaps gets its edges in
    tile-local coordinates; edges entirely LEFT of a tile become an exact
    per-row winding carry vector (_row_carry) added after rasterization —
    interior tiles of a large shape carry no segments at all
  * clip coverage (the union of per-part rule coverages, matching the
    reference's mask_only OVER composition) is precomputed on host per
    (clip, tile), deduplicated by content, and multiplied in by the
    executors; heavy draw edge lists group into per-width segment
    classes (_pack)
  * items sort by (tile, z) so per-tile composition is a segmented scan
  * isolation subtrees (group opacity, masks, filters, nested and
    bbox-units clips) lower to passes whose output tiles re-enter the
    parent stream as texture items from a pool; passes merge per
    dependency level into single programs (_plan_groups); pattern paints
    render once into an atlas and evaluate by modular gather

Everything the frontend produces lowers except per-paint colorspace
overrides and >MAX_STOPS gradients; those scenes return None and render
through the interpreter (render_group_hybrid still batches every
lowerable sibling run).
"""

from __future__ import annotations

import math
import os
from typing import Any, NamedTuple

import numpy as np

from .core import color as color_ops
from .core.layer import Layer
from .core.transform import Transform
from .geom.hull import ConvexHull
from .ops import batch_exec
from .ops.batch_exec import (
    CHUNK_ITEMS,
    MAX_STOPS,
    PAINT_LINEAR,
    PAINT_PATTERN,
    PAINT_RADIAL,
    PAINT_SOLID,
)
from .paint import GradLinear, GradRadial, Pattern, stops_to_arrays
from .scene import (
    RENDER_CLIP,
    RENDER_FILL,
    RENDER_FILTER,
    RENDER_GROUP,
    RENDER_MASK,
    RENDER_OPACITY,
    RENDER_STROKE,
    RENDER_TRANSFORM,
)
from .utils.constants import DEVICE_FLOAT, FLATNESS

def _default_tile() -> int:
    """Canvas tile size: 32 on TPU, 128 elsewhere.

    Measured on v5e (material-design.svg): 32 -> 9.7ms, 64 -> 13.2ms,
    128 -> 26.4ms, 16 -> 41ms per render — small tiles slash the per-item
    pixel area (every item rasterizes and paints a full tile) until item
    scheduling overhead takes over.  On CPU the per-item overhead dominates
    much earlier, so big tiles win there.  Override with SVGR_TILE.
    """
    import os

    if os.environ.get("SVGR_TILE"):
        return int(os.environ["SVGR_TILE"])
    try:
        import jax

        return 32 if jax.default_backend() == "tpu" else 128
    except Exception:  # pragma: no cover - jax always importable here
        return 64


_TILE_CACHE: list = []


def default_tile() -> int:
    """Lazy, cached _default_tile: querying the backend at import time
    would initialize XLA before jax.distributed.initialize can run."""
    if not _TILE_CACHE:
        _TILE_CACHE.append(_default_tile())
    return _TILE_CACHE[0]


def _pick_tile(viewport) -> int:
    """Viewport-adaptive tile size.

    On TPU small tiles win until the grid gets huge (3840x3840 measured:
    32 -> 0.30s, 64 -> 0.18s per render): the per-item pixel saving is
    eventually beaten by item-scheduling and canvas-scatter overhead, so
    grow the tile to keep the grid under ~4k tiles.  A forced SVGR_TILE or
    a non-TPU backend uses the static default.
    """
    import os

    if os.environ.get("SVGR_TILE"):
        return int(os.environ["SVGR_TILE"])
    if default_tile() != 32:
        return default_tile()
    _v0, _v1, h, w = viewport
    tile = 32
    while tile < 128 and math.ceil(h / tile) * math.ceil(w / tile) > 4096:
        tile *= 2
    return tile

# interpreter group-run batching switch (tests disable it to get a pure
# per-path oracle)
HYBRID_ENABLED = True

_FILL_RULE_ID = {None: 0, "nonzero": 0, "evenodd": 1}


class _Unsupported(Exception):
    """Scene contains a node the batched path cannot lower."""


def _subtree_hull(scene, transform: Transform) -> ConvexHull:
    """Hull of a subtree's draw geometry (device coords).

    Matches the hull Scene.render returns for the subtree — clips, masks,
    filters, and opacity do not shrink it (parity: svgrasterize.py:649-752)
    — so objectBoundingBox clip/mask transforms can be resolved at lowering
    time without rendering the target first.
    """
    hulls: list = []

    def walk(scene, tr):
        kind, args = scene
        if kind == RENDER_FILL:
            if args[1] is None:
                return  # paintless fill renders (and bounds) nothing
            lines = args[0].flatten(tr, FLATNESS)
            if lines.size:
                hulls.append(ConvexHull(lines))
        elif kind == RENDER_STROKE:
            path, paint, width, linecap, linejoin = args
            if paint is None:
                return
            lines = path.stroke(width, linecap, linejoin).flatten(tr, FLATNESS)
            if lines.size:
                hulls.append(ConvexHull(lines))
        elif kind == RENDER_GROUP:
            for child in args:
                walk(child, tr)
        elif kind == RENDER_TRANSFORM:
            walk(args[0], tr @ args[1])
        elif kind in (RENDER_OPACITY, RENDER_FILTER, RENDER_CLIP, RENDER_MASK):
            walk(args[0], tr)
        else:
            raise _Unsupported(f"scene kind {kind}")

    walk(scene, transform)
    return ConvexHull.merge(hulls)


def _collect_draws(scene, transform: Transform, opacity: float, clip, out: list) -> None:
    """clip: None or (clip_scene, clip_transform) active for this subtree."""
    kind, args = scene
    if kind == RENDER_FILL:
        path, paint, fill_rule = args
        out.append(("draw", path, transform, paint, fill_rule, opacity, clip))
    elif kind == RENDER_STROKE:
        path, paint, width, linecap, linejoin = args
        outline = path.stroke(width, linecap, linejoin)
        out.append(("draw", outline, transform, paint, None, opacity, clip))
    elif kind == RENDER_GROUP:
        for child in args:
            _collect_draws(child, transform, opacity, clip, out)
    elif kind == RENDER_TRANSFORM:
        target, inner = args
        _collect_draws(target, transform @ inner, opacity, clip, out)
    elif kind == RENDER_OPACITY:
        target, value = args
        # opacity over a single draw folds into its paint; opacity over a
        # group needs isolation -> rendered as a separate pass whose tiles
        # re-enter the parent stream as texture items
        if target[0] in (RENDER_FILL, RENDER_STROKE):
            _collect_draws(target, transform, opacity * value, clip, out)
        else:
            out.append(("pass", target, transform, opacity * value, clip))
    elif kind == RENDER_CLIP:
        target, clip_scene, bbox_units = args
        if clip is not None:
            # nested clip: isolate the inner clip chain as a pass; the outer
            # clip multiplies its texture items (alpha products commute)
            out.append(("pass", scene, transform, opacity, clip))
            return
        clip_tr = transform
        if bbox_units:
            hull = _subtree_hull(target, transform)
            if len(hull.raw_points) == 0:
                return  # target renders nothing (interpreter returns None)
            clip_tr = hull.bbox_transform(transform)
        # group-level clip semantics (reference svgrasterize.py:698-715):
        # the subtree composes in isolation FIRST, then multiplies by the
        # clip coverage once.  A single record is identical either way, and
        # a BINARY clip (exact 0/1 coverage everywhere) distributes over
        # composition, so both keep the cheap per-item multiply; several
        # records under a clip with AA edges diverge wherever they overlap,
        # so those isolate as a pass whose texture items carry the clip.
        sub: list = []
        _collect_draws(target, transform, opacity, (clip_scene, clip_tr), sub)
        if len(sub) > 1 and not _clip_is_binary(clip_scene, clip_tr):
            out.append(("pass", target, transform, opacity, (clip_scene, clip_tr)))
        else:
            out.extend(sub)
    elif kind == RENDER_MASK:
        target, mask_scene, bbox_units = args
        mask_tr = transform
        if bbox_units:
            hull = _subtree_hull(target, transform)
            if len(hull.raw_points) == 0:
                return
            mask_tr = hull.bbox_transform(transform)
        out.append(("mask", target, mask_scene, transform, mask_tr, opacity, clip))
    elif kind == RENDER_FILTER:
        target, flt = args
        out.append(("filter", target, flt, transform, opacity, clip))
    else:
        raise _Unsupported(f"scene kind {kind}")


def _clip_parts(clip_scene, transform: Transform, cache: dict):
    """Flatten a clip scene to per-fill (edge list, fill rule id) parts.

    Clip coverage follows the reference's mask_only render exactly
    (/root/reference/svgrasterize.py:698-715 + the group OVER merge): each
    fill contributes rule(winding) coverage and the fills compose with
    OVER, i.e. the clip mask is the alpha UNION  1 - prod(1 - cov_p).
    The parts stay separate here; _Builder._clip_tile turns them into a
    precomputed per-tile coverage field, so per-part rules (including
    evenodd in a multi-path clip) and overlapping / opposite-orientation
    parts are exact.
    """
    # key by transform VALUE: clip transforms are often temporaries that
    # die between passes, and CPython reuses their ids — an id-keyed
    # entry then collides with a LATER different clip and silently
    # returns stale parts (observed as nondeterministically dropped
    # tiles on pass-heavy scenes; the clip scene itself is owned by the
    # long-lived scene graph, so its id is stable for the whole lower)
    key = (id(clip_scene), transform.m.tobytes())
    cached = cache.get(key)
    if cached is not None:
        return cached

    parts: list = []

    def walk(scene, tr):
        kind, args = scene
        if kind == RENDER_FILL:
            flat = args[0].flatten(tr, FLATNESS)
            if flat.size:
                parts.append((flat.reshape(-1, 4), _FILL_RULE_ID.get(args[2], 0)))
        elif kind == RENDER_GROUP:
            for child in args:
                walk(child, tr)
        elif kind == RENDER_TRANSFORM:
            walk(args[0], tr @ args[1])
        else:
            raise _Unsupported(f"clip scene kind {kind}")

    walk(clip_scene, transform)
    if not parts:
        raise _Unsupported("empty clip")
    cache[key] = parts
    return parts


def _clip_is_binary(clip_scene, clip_tr: Transform) -> bool:
    """True when the clip's coverage is exactly 0/1 at every pixel: all
    flattened edges axis-aligned on integer pixel boundaries (viewport
    clips of nested <svg>/<symbol>/<marker> are the common case; the
    union of binary part masks is itself binary).  A binary clip
    multiplied into each draw equals the reference's group-layer
    COMPOSE_IN exactly, so such clips skip the isolation pass
    (material-design: 936 nested-svg viewport clips stay one program)."""
    try:
        parts = _clip_parts(clip_scene, clip_tr, {})
    except _Unsupported:
        return False  # the normal path re-raises with context
    for edges, _rule in parts:
        if edges.shape[0] == 0:
            continue
        axis_aligned = (edges[:, 0] == edges[:, 2]) | (edges[:, 1] == edges[:, 3])
        if not (axis_aligned.all() and np.all(edges == np.round(edges))):
            return False
    return True


def _host_winding(edges: np.ndarray, tile: int) -> np.ndarray:
    """Numpy (f64) twin of ops/coverage.py's closed-form AA winding.

    Same clamped-trapezoid formulation as the device kernels (see
    ops/coverage.py for the derivation; the reference's scalar algorithm
    is /root/reference/svgrasterize.py:2213-2304), evaluated on host at
    lowering time for scene-static clip coverage fields.  f64 throughout —
    the executors consume the resulting field verbatim, so host/device fp
    agreement is not required, only accuracy.
    """
    return _edge_contrib(edges.astype(np.float64), tile).sum(axis=0)


def _host_winding_batch(edge_arrays: list, tile: int) -> np.ndarray:
    """Per-record winding fields for many edge lists in one batched pass.

    The naive per-record _host_winding loop pays numpy dispatch overhead
    per record (~6 ms each at tile 32); static-run collapse needs fields
    for ~1M tile-local edges on material-design.  Row-compacted: each edge
    only contributes on the tile rows intersecting [y_lo, y_hi), and
    0.1px-flattened demo edges span ~1-2 of a 32-row tile, so expanding to
    (edge, row) pairs and evaluating (pairs, tile) column vectors cuts the
    full (S, tile, tile) formulation's memory traffic ~10x (the entire
    cost of this pass; measured 3.7 s -> 0.35 s on material's collapse).
    Pairs reduce into the output by a sorted (owner, row) key.

    Returns (R, tile, tile) f32: the per-edge temporaries dominate wall
    time, the executors consume f32, and worst-case winding error on dense
    adversarial edge sets is ~4e-4 (measured vs the f64 oracle on random
    near-vertical + integer axis-aligned edges; typical demo tiles ~1e-6)
    — test_collapse's 1e-3 atol sits above that bound.
    """
    counts = np.array([a.shape[0] for a in edge_arrays], np.int64)
    n_rec = len(edge_arrays)
    out = np.zeros((n_rec, tile, tile), np.float32)
    total = int(counts.sum())
    if total == 0:
        return out
    e = np.concatenate(
        [a for a in edge_arrays if a.shape[0]], axis=0
    ).astype(np.float32)
    owner = np.repeat(np.arange(n_rec, dtype=np.int64), counts)
    a0, a1, b0, b1 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    sign = np.sign(b0 - a0)
    y_lo = np.minimum(a0, b0)
    y_hi = np.maximum(a0, b0)
    x_at_lo = np.where(a0 <= b0, a1, b1)
    x_at_hi = np.where(a0 <= b0, b1, a1)
    dy_seg = y_hi - y_lo
    slope = (x_at_hi - x_at_lo) / np.where(dy_seg > 0, dy_seg, 1.0)
    r0 = np.clip(np.floor(y_lo), 0.0, float(tile)).astype(np.int64)
    r1 = np.clip(np.ceil(y_hi), 0.0, float(tile)).astype(np.int64)
    n_rows = np.where(sign != 0, np.maximum(r1 - r0, 0), 0)
    cum = np.concatenate([[0], np.cumsum(n_rows)])
    cols = np.arange(tile, dtype=np.float32)[None, :] + 1.0
    out2 = out.reshape(n_rec * tile, tile)
    # chunk by pair budget so the (pairs, tile) temporaries stay ~32 MB
    pair_budget = max(1024, (1 << 23) // tile)
    lo_i = 0
    while lo_i < total:
        hi_i = int(np.searchsorted(cum, cum[lo_i] + pair_budget, "right")) - 1
        hi_i = max(hi_i, lo_i + 1)
        n_pairs = int(cum[hi_i] - cum[lo_i])
        if n_pairs == 0:
            lo_i = hi_i
            continue
        c = n_rows[lo_i:hi_i]
        idx = np.repeat(np.arange(lo_i, hi_i), c)
        offs = np.arange(n_pairs) - np.repeat(cum[lo_i:hi_i] - cum[lo_i], c)
        row = r0[idx] + offs
        rowf = row.astype(np.float32)
        lo_y = np.maximum(y_lo[idx], rowf)
        hi_y = np.minimum(y_hi[idx], rowf + 1.0)
        dy = np.maximum(hi_y - lo_y, 0.0)
        sl = slope[idx]
        xl = x_at_lo[idx] + sl * (lo_y - y_lo[idx])
        xh = x_at_lo[idx] + sl * (hi_y - y_lo[idx])
        # per-column mean of clip(t,0,1) over t in [cols-xmax, cols-xmin]:
        # bounded quadratic part K(t)=clip(t,0,1)^2/2 plus the exact
        # above-1 interval fraction.  The naive antiderivative difference
        # (F(g1)-F(g0))/den cancels catastrophically in f32 when |g|>>1
        # (error ~eps*|g|/|den|); every term here is bounded, so error
        # stays ~1e-7/d.  Near-vertical rows (d < 1e-3, common: rect
        # edges) evaluate on the interval widened to 1e-3 about its
        # center — measured error up to ~4e-4 per winding value on
        # adversarial near-vertical/axis-aligned fuzz (vs f64 oracle),
        # and it deletes the per-column midpoint-fallback select
        xmin = np.minimum(xl, xh)
        d = np.maximum(xl, xh) - xmin
        d_eff = np.maximum(d, 1e-3)
        dinv = 1.0 / d_eff
        hi_g = cols - (xmin - 0.5 * (d_eff - d))[:, None]
        lo_g = hi_g - d_eff[:, None]
        num = _quad_part(hi_g)
        num -= _quad_part(lo_g)
        num += np.clip(hi_g - 1.0, 0.0, d_eff[:, None])
        num *= (sign[idx] * dy * dinv)[:, None]
        mean = num
        key = owner[idx] * tile + row
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        bounds = np.concatenate([[0], 1 + np.nonzero(np.diff(key_s))[0]])
        out2[key_s[bounds]] += np.add.reduceat(mean[order], bounds, axis=0)
        lo_i = hi_i
    return out


def _antideriv(t: np.ndarray) -> np.ndarray:
    """Piecewise 0 / 0.5 t^2 / t - 0.5 antiderivative of the clamped pixel
    overlap, without nested np.where — these temporaries dominate wall
    time in the batched winding passes."""
    u = np.clip(t, 0.0, 1.0)
    u *= u
    u *= 0.5
    u += np.maximum(t - 1.0, 0.0)
    return u


def _quad_part(t: np.ndarray) -> np.ndarray:
    """clip(t,0,1)^2 / 2 — the bounded quadratic piece of _antideriv
    (values in [0, 0.5], so f32 differences don't cancel)."""
    u = np.clip(t, 0.0, 1.0)
    u *= u
    u *= 0.5
    return u


def _edge_contrib(edges: np.ndarray, tile: int) -> np.ndarray:
    """(S, tile, tile) per-edge winding contributions (see _host_winding).

    Computes in the caller's dtype: f64 for clip fields (_host_winding),
    f32 for the collapse batch where temporaries dominate wall time.
    """
    if edges.shape[0] == 0:
        return np.zeros((0, tile, tile), edges.dtype)
    e = edges if edges.dtype in (np.float32, np.float64) else edges.astype(np.float64)
    a0, a1, b0, b1 = e[:, 0], e[:, 1], e[:, 2], e[:, 3]
    rows = np.arange(tile, dtype=e.dtype)[None, :, None]  # (1,T,1)
    cols = np.arange(tile, dtype=e.dtype)[None, None, :]  # (1,1,T)
    sign = np.sign(b0 - a0)[:, None, None]
    y_lo = np.minimum(a0, b0)
    y_hi = np.maximum(a0, b0)
    x_at_lo = np.where(a0 <= b0, a1, b1)
    x_at_hi = np.where(a0 <= b0, b1, a1)
    dy_seg = y_hi - y_lo
    slope = (x_at_hi - x_at_lo) / np.where(dy_seg > 0, dy_seg, 1.0)
    lo = np.maximum(y_lo[:, None, None], rows)
    hi = np.minimum(y_hi[:, None, None], rows + 1.0)
    dy = np.maximum(hi - lo, 0.0)
    x_lo = x_at_lo[:, None, None] + slope[:, None, None] * (lo - y_lo[:, None, None])
    x_hi = x_at_lo[:, None, None] + slope[:, None, None] * (hi - y_lo[:, None, None])
    g0 = (cols + 1.0) - x_lo
    g1 = (cols + 1.0) - x_hi

    # g1 - g0 == slope (lo - hi): constant along columns, so den/safe stay
    # (S, T, 1) instead of full (S, T, T)
    den = slope[:, None, None] * (lo - hi)
    safe = np.abs(den) > 1e-12
    num = _antideriv(g1)
    num -= _antideriv(g0)
    num /= np.where(safe, den, 1.0)
    mid = 0.5 * (g0 + g1)
    np.clip(mid, 0.0, 1.0, out=mid)
    mean = np.where(safe, num, mid)
    mean *= sign * dy
    return mean


def _paint_fields_np(
    params_list, tile_rs, tile_cs, tile: int, pattern_tiles=None,
) -> np.ndarray:
    """Batched numpy twin of ops/batch_exec._paint_item for the
    scene-static paint kinds — same affine, spread, telescoping stop
    interpolation, pixman two-circle radial math, and (with
    pattern_tiles, the builder's host tile list) the pattern modular
    gather incl. the reference's int truncation — evaluated on host at
    lowering time so gradient- and pattern-painted runs can
    static-collapse (pregrad/the atlas already prove these paints are
    scene-static per pixel).  Returns (L, tile, tile, 4) f32
    premultiplied RGBA.
    """
    L = len(params_list)
    f32 = np.float32
    # records binned from the same draw share ONE params dict; dedup by
    # identity so the per-key scalar tables build over unique paints
    # (atlas plans: ~10x fewer) and members gather by index
    uniq: list = []
    seen: dict = {}
    uidx = np.empty(L, np.int64)
    for i, p in enumerate(params_list):
        j = seen.get(id(p))
        if j is None:
            j = len(uniq)
            seen[id(p)] = j
            uniq.append(p)
        uidx[i] = j
    tab = lambda k: np.stack([np.asarray(p[k], f32) for p in uniq])
    all_kinds = np.array([int(p["kind"]) for p in uniq])[uidx]
    result = np.empty((L, tile, tile, 4), f32)
    sol = np.nonzero(all_kinds == PAINT_SOLID)[0]
    if len(sol):
        result[sol] = tab("color")[uidx[sol]][:, None, None, :]
    for i in np.nonzero(all_kinds == PAINT_PATTERN)[0]:
        p = params_list[i]
        tex = pattern_tiles[int(p["pat_idx"])]
        m = np.asarray(p["affine"], f32)
        rows = (np.arange(tile, dtype=f32) + 0.5) + f32(tile_rs[i])
        cols = (np.arange(tile, dtype=f32) + 0.5) + f32(tile_cs[i])
        gx = rows[:, None] * m[0, 0] + cols[None, :] * m[0, 1] + m[0, 2]
        gy = rows[:, None] * m[1, 0] + cols[None, :] * m[1, 1] + m[1, 2]
        fwd = np.asarray(p["pat_fwd"], f32)
        q0 = np.remainder(gx - f32(p["pat_xy"][0]), f32(p["pat_wh"][0]))
        q1 = np.remainder(gy - f32(p["pat_xy"][1]), f32(p["pat_wh"][1]))
        s0 = q0 * fwd[0, 0] + q1 * fwd[0, 1] + fwd[0, 2]
        s1 = q0 * fwd[1, 0] + q1 * fwd[1, 1] + fwd[1, 2]
        i0 = np.clip(
            s0.astype(np.int32) - int(p["pat_lo"][0]), 0, int(p["pat_max"][0])
        )
        i1 = np.clip(
            s1.astype(np.int32) - int(p["pat_lo"][1]), 0, int(p["pat_max"][1])
        )
        result[i] = np.asarray(tex, f32).reshape(-1, 4)[
            i0 * tex.shape[1] + i1
        ]
    g_idx = np.nonzero(
        (all_kinds == PAINT_LINEAR) | (all_kinds == PAINT_RADIAL)
    )[0]
    if not len(g_idx):
        return result
    # gradient math only on the gradient subset (solid-heavy plans —
    # material is ~all solids — would pay ~25 wasted passes otherwise)
    gsel = uidx[g_idx]
    tile_rs = np.asarray(tile_rs, f32)[g_idx]
    tile_cs = np.asarray(tile_cs, f32)[g_idx]
    L = len(g_idx)
    get = lambda k: tab(k)[gsel]
    kind = all_kinds[g_idx]
    m = get("affine")                      # (L,2,3)
    rows = (np.arange(tile, dtype=f32) + 0.5)[None, :, None] \
        + np.asarray(tile_rs, f32)[:, None, None]
    cols = (np.arange(tile, dtype=f32) + 0.5)[None, None, :] \
        + np.asarray(tile_cs, f32)[:, None, None]
    gx = rows * m[:, 0, 0, None, None] + cols * m[:, 0, 1, None, None] \
        + m[:, 0, 2, None, None]
    gy = rows * m[:, 1, 0, None, None] + cols * m[:, 1, 1, None, None] \
        + m[:, 1, 2, None, None]

    p0 = get("p0")
    p1 = get("p1")
    vec = p1 - p0
    denom = np.maximum(vec[:, 0] ** 2 + vec[:, 1] ** 2, 1e-30)
    t_lin = (
        (gx - p0[:, 0, None, None]) * vec[:, 0, None, None]
        + (gy - p0[:, 1, None, None]) * vec[:, 1, None, None]
    ) / denom[:, None, None]

    center = get("center")
    fc = get("fcenter")
    radius = get("radius")
    fradius = get("fradius")
    cd = center - fc
    pd0 = gx - fc[:, 0, None, None]
    pd1 = gy - fc[:, 1, None, None]
    rd = radius - fradius
    a = cd[:, 0] ** 2 + cd[:, 1] ** 2 - rd * rd
    b = pd0 * cd[:, 0, None, None] + pd1 * cd[:, 1, None, None] \
        + (fradius * rd)[:, None, None]
    c = pd0 * pd0 + pd1 * pd1 - (fradius * fradius)[:, None, None]
    det = b * b - a[:, None, None] * c
    sq = np.sqrt(np.maximum(det, 0.0))
    a_safe = np.where(np.abs(a) > 1e-30, a, 1e-30)[:, None, None]
    t_rad = np.maximum((b + sq) / a_safe, (b - sq) / a_safe)
    rad_valid = det >= 0
    lim = fradius / np.where(np.abs(rd) > 1e-12, fradius - radius, 1.0)
    rad_valid = np.where(
        (np.abs(rd) > 1e-12)[:, None, None],
        rad_valid & (t_rad > lim[:, None, None]),
        rad_valid,
    )

    t = np.where((kind == PAINT_LINEAR)[:, None, None], t_lin, t_rad)
    mode = np.array([int(p["spread"]) for p in uniq])[gsel][:, None, None]
    t = np.where(
        mode == 0, t,
        np.where(mode == 1, t - np.trunc(t),
                 np.abs(np.remainder(t + 1.0, 2.0) - 1.0)),
    )
    offsets = get("stop_offsets")          # (L,K)
    colors = get("stop_colors")            # (L,K,4)
    k_max = max(
        (int(p["_n_stops"]) for p in uniq
         if int(p["kind"]) in (PAINT_LINEAR, PAINT_RADIAL)),
        default=1,
    )
    grad = np.broadcast_to(
        colors[:, 0][:, None, None, :], (L, tile, tile, 4)
    ).copy()
    for i in range(1, k_max):
        span = offsets[:, i] - offsets[:, i - 1]
        ratio = np.clip(
            (t - offsets[:, i - 1, None, None])
            / np.where(span > 1e-12, span, 1.0)[:, None, None],
            0.0, 1.0,
        )
        ratio = np.where(
            (span > 1e-12)[:, None, None], ratio,
            (t >= offsets[:, i, None, None]).astype(f32),
        )
        grad += ratio[..., None] * (
            colors[:, i] - colors[:, i - 1]
        )[:, None, None, :]
    grad = np.where(
        ((kind == PAINT_RADIAL)[:, None, None] & ~rad_valid)[..., None],
        0.0, grad,
    )
    result[g_idx] = grad.astype(f32)
    return result


def _coverage_np(wind: np.ndarray, rule: int) -> np.ndarray:
    """Host twin of the executors' fill-rule coverage mapping."""
    if rule:
        return np.abs(np.remainder(wind + 1.0, 2.0) - 1.0)
    return np.clip(np.abs(wind), 0.0, 1.0)


def _union_cov_field(parts_tile: list, tile: int) -> np.ndarray:
    """Union clip coverage of tile-local parts [(edges, carry, rule)].

    OVER-composition of the part masks: 1 - prod(1 - rule(wind + carry)).
    Returns a (tile, tile) f64 field.
    """
    inv = np.ones((tile, tile))
    for edges, carry, rule in parts_tile:
        wind = _host_winding(edges, tile) + carry.astype(np.float64)[:, None]
        inv *= 1.0 - _coverage_np(wind, rule)
    return 1.0 - inv


def _paint_params(paint, hull: ConvexHull, transform: Transform, linear_rgb: bool):
    """Resolve a paint to the per-item param dict fields (numpy scalars/arrays)."""
    zeros2 = np.zeros(2, DEVICE_FLOAT)
    base = {
        "_n_stops": 1,  # real stop count (host-only; packing trims the tables)
        "kind": PAINT_SOLID,
        "color": np.zeros(4, DEVICE_FLOAT),
        "affine": np.zeros((2, 3), DEVICE_FLOAT),
        "p0": zeros2,
        "p1": zeros2,
        "center": zeros2,
        "fcenter": zeros2,
        "radius": np.float32(0),
        "fradius": np.float32(0),
        "spread": np.int32(0),
        "stop_offsets": np.ones(MAX_STOPS, DEVICE_FLOAT),
        "stop_colors": np.zeros((MAX_STOPS, 4), DEVICE_FLOAT),
        "pat_idx": np.int32(-1),
        "pat_fwd": np.zeros((2, 3), DEVICE_FLOAT),
        "pat_xy": np.zeros(2, DEVICE_FLOAT),
        "pat_wh": np.ones(2, DEVICE_FLOAT),
        "pat_lo": np.zeros(2, np.int32),
        "pat_max": np.zeros(2, np.int32),
    }

    if isinstance(paint, np.ndarray) and paint.shape == (4,):
        color = paint
        if not linear_rgb:
            color = color_ops.pre_linear_to_pre_srgb(color)
        base["color"] = color.astype(DEVICE_FLOAT)
        return base

    if isinstance(paint, (GradLinear, GradRadial)):
        if paint.linear_rgb is not None and paint.linear_rgb != linear_rgb:
            raise _Unsupported("per-paint colorspace override")
        if paint.bbox_units:
            user_tr = hull.bbox_transform(transform).invert
        else:
            user_tr = transform.invert
        to_grad = user_tr if paint.transform is None else paint.transform.invert @ user_tr
        offsets, colors = stops_to_arrays(paint.stops, linear_rgb)
        k = len(offsets)
        if k > MAX_STOPS:
            raise _Unsupported(f"{k} gradient stops > {MAX_STOPS}")
        base["affine"] = to_grad.m[:2, :].astype(DEVICE_FLOAT)
        base["spread"] = np.int32({"pad": 0, "repeat": 1, "reflect": 2}[paint.spread])
        stop_offsets = np.ones(MAX_STOPS, DEVICE_FLOAT)
        stop_offsets[:k] = offsets
        stop_colors = np.broadcast_to(colors[-1], (MAX_STOPS, 4)).copy()
        stop_colors[:k] = colors
        base["stop_offsets"] = stop_offsets
        base["stop_colors"] = stop_colors.astype(DEVICE_FLOAT)
        base["_n_stops"] = k
        if isinstance(paint, GradLinear):
            base["kind"] = PAINT_LINEAR
            base["p0"] = np.asarray(paint.p0, DEVICE_FLOAT)
            base["p1"] = np.asarray(paint.p1, DEVICE_FLOAT)
        else:
            base["kind"] = PAINT_RADIAL
            base["center"] = np.asarray(paint.center, DEVICE_FLOAT)
            base["radius"] = np.float32(paint.radius)
            fc = paint.center if paint.fcenter is None else paint.fcenter
            base["fcenter"] = np.asarray(fc, DEVICE_FLOAT)
            base["fradius"] = np.float32(paint.fradius or 0.0)
        return base

    raise _Unsupported(f"paint {type(paint).__name__}")


_NO_EDGES = np.zeros((0, 4), dtype=DEVICE_FLOAT)
_UNCLIPPED = object()  # _clip_tile: full coverage, no clip row needed
_CARRY_CONSTS: dict = {}  # tile -> (row indices f64, zero carry, ones carry)


def _carry_consts(tile: int):
    consts = _CARRY_CONSTS.get(tile)
    if consts is None:
        consts = (
            np.arange(tile, dtype=np.float64),
            np.zeros(tile, dtype=DEVICE_FLOAT),
            np.ones(tile, dtype=DEVICE_FLOAT),
        )
        _CARRY_CONSTS[tile] = consts
    return consts


def _row_carry(sel: np.ndarray, ti: int, tile: int) -> np.ndarray:
    """Per-row winding carried into a tile by edges entirely to its left.

    For an edge left of every pixel of the tile, the coverage kernel's
    closed form reduces to sign(dy) * row-overlap — the clamped mean is 1 —
    so the whole contribution is this exact (tile,) vector, added to the
    winding field after rasterization instead of rasterizing clamped edges.
    """
    rows = _carry_consts(tile)[0]
    a0 = sel[:, 0] - ti * tile
    b0 = sel[:, 2] - ti * tile
    lo = np.minimum(a0, b0)[:, None]
    hi = np.maximum(a0, b0)[:, None]
    sign = np.sign(b0 - a0)[:, None]
    dy = np.clip(np.minimum(hi, rows + 1.0) - np.maximum(lo, rows), 0.0, None)
    return (sign * dy).sum(axis=0).astype(DEVICE_FLOAT)


def _tile_local_edges(lines, r_lo, r_hi, c_lo, c_hi, ti: int, tj: int, tile: int):
    """Edges of `lines` relevant to tile (ti, tj), in tile-local coords.

    Edges entirely left of the tile become a per-row winding carry vector
    (exact row-clipped contribution, see _row_carry); edges with no row
    overlap or entirely right of the tile are dropped.  Returns
    (edges (K, 4), carry (tile,)), both possibly all-empty/zero.
    """
    _rows, zero_carry, _ones = _carry_consts(tile)
    row_sel = (r_hi > ti * tile) & (r_lo < (ti + 1) * tile) & (c_lo < (tj + 1) * tile)
    if not row_sel.any():
        return _NO_EDGES, zero_carry
    fully_left = row_sel & (c_hi <= tj * tile)
    keep = row_sel & ~fully_left
    edges = lines[keep].copy()
    edges[:, 0] -= ti * tile
    edges[:, 2] -= ti * tile
    edges[:, 1] -= tj * tile
    edges[:, 3] -= tj * tile
    carry = _row_carry(lines[fully_left], ti, tile) if fully_left.any() else zero_carry
    return edges, carry


def _band_split_batch(edges: np.ndarray, tile: int, owner: np.ndarray):
    """Split edges at 8-row band boundaries, preserving order and owners.

    The fused kernel evaluates each winding pass on an (8, LANES) register
    covering only the 8-row band the pass's edges live in — a 4x VPU
    saving at tile 32, since a flattened curve edge typically spans a row
    or two while the unbanded formulation paid for all 32 rows per edge.
    That layout requires every edge to sit inside one band.  Splitting is
    semantically exact: split points land on row boundaries, so each
    row's coverage comes entirely from one piece (the other contributes a
    hard zero), identical to the unsplit edge up to fp rounding of the
    split x.  Components: [:, 0]/[:, 2] are row coords, [:, 1]/[:, 3]
    columns (see _edge_params / _row_carry).

    Batched over the whole plan: owner[i] labels each edge's source
    record, pieces stay contiguous per source (split back with
    np.bincount(owner_out)).  Called once per _pack — per-record calls
    spent ~45% of dense-scene lowering in numpy dispatch.
    """
    cur, own = edges, owner
    for c in range(8, tile, 8):
        y0 = cur[:, 0]
        y1 = cur[:, 2]
        cross = (np.minimum(y0, y1) < c) & (np.maximum(y0, y1) > c)
        if not cross.any():
            continue
        reps = 1 + cross.astype(np.int64)
        out = np.repeat(cur, reps, axis=0)
        own = np.repeat(own, reps)
        last = np.cumsum(reps) - 1          # each edge's final output slot
        sp = cur[cross]
        t = (c - sp[:, 0]) / (sp[:, 2] - sp[:, 0])
        xc = sp[:, 1] + t * (sp[:, 3] - sp[:, 1])
        out[last[cross] - 1, 2] = c
        out[last[cross] - 1, 3] = xc
        out[last[cross], 0] = c
        out[last[cross], 1] = xc
        cur = out
    return cur, own


def _band_split(edges: np.ndarray, tile: int) -> np.ndarray:
    """Single-array convenience wrapper over _band_split_batch."""
    if edges.shape[0] == 0:
        return edges
    return _band_split_batch(
        edges, tile, np.zeros(edges.shape[0], np.int64)
    )[0]


def _edge_extents(lines):
    r_lo = np.minimum(lines[:, 0], lines[:, 2])
    r_hi = np.maximum(lines[:, 0], lines[:, 2])
    c_lo = np.minimum(lines[:, 1], lines[:, 3])
    c_hi = np.maximum(lines[:, 1], lines[:, 3])
    return r_lo, r_hi, c_lo, c_hi


def _bin_draw(lines: np.ndarray, grid_h: int, grid_w: int, tile: int):
    """Bin one draw's edges into tiles; yields (ti, tj, edges, carry)."""
    for _di, ti, tj, edges, carry in _bin_draws([lines], grid_h, grid_w, tile):
        yield ti, tj, edges, carry


def _bin_draws(draw_lines: list, grid_h: int, grid_w: int, tile: int):
    """Bin MANY draws' edges into tiles in one vectorized pass; yields
    (draw_index, ti, tj, edges, carry) grouped per (draw, tile).

    The host hot loop of lowering.  Through round 4 this was a Python
    loop per (draw, tile-row, tile-col) of small numpy ops (~70 us per
    draw of pure call overhead at material scale); now every edge of
    every draw expands to its covered (tile-row) pairs at once, signed
    row-overlap vectors batch as one clipped-interval computation, and
    per-tile edge lists come from one stable argsort of flat slot keys.
    The winding carry (edges fully left of a tile contribute sign(dy) x
    row-overlap to every column right of them) accumulates per draw row
    as a segmented cumsum over a flat slot buffer: each (draw, tile-row)
    owns a slab of (window-cols + 1) slots, pairs scatter-add their
    overlap vector at their first fully-left column, and a global cumsum
    minus the slab-start prefix yields every tile's carry.  Same values
    as the loop formulation up to fp association in the carry sums
    (~1e-13 in f64, below the f32 output resolution).
    """
    sizes = [d.shape[0] for d in draw_lines]
    n_draws = len(draw_lines)
    if n_draws == 0:
        return
    lines = np.concatenate(draw_lines) if n_draws > 1 else draw_lines[0]
    owner = np.repeat(np.arange(n_draws), sizes)
    r_lo, r_hi, c_lo, c_hi = _edge_extents(lines)
    rows_idx = _carry_consts(tile)[0]

    # per-draw tile windows (clipped to the grid)
    seg = np.cumsum([0] + sizes[:-1])
    tr0d = np.maximum(
        np.floor(np.minimum.reduceat(r_lo, seg) / tile).astype(np.int64), 0
    )
    tr1d = np.minimum(
        np.floor((np.maximum.reduceat(r_hi, seg) - 1e-9) / tile).astype(np.int64) + 1,
        grid_h,
    )
    tc0d = np.maximum(
        np.floor(np.minimum.reduceat(c_lo, seg) / tile).astype(np.int64), 0
    )
    tc1d = np.minimum(
        np.floor((np.maximum.reduceat(c_hi, seg) - 1e-9) / tile).astype(np.int64) + 1,
        grid_w,
    )
    n_rows_d = np.maximum(tr1d - tr0d, 0)
    n_cols_d = np.maximum(tc1d - tc0d, 0)
    live_d = (n_rows_d > 0) & (n_cols_d > 0)
    n_rows_d *= live_d
    n_cols_d *= live_d

    # flat slot layout: each (draw, tile-row) owns n_cols+1 slots (the +1
    # absorbs carry buckets past the window); slabs are contiguous
    row_of_draw = np.cumsum(n_rows_d) - n_rows_d        # first row id per draw
    total_rows = int(n_rows_d.sum())
    if total_rows == 0:
        return
    d_of_row = np.repeat(np.arange(n_draws), n_rows_d)
    ti_of_row = (
        np.arange(total_rows) - np.repeat(row_of_draw, n_rows_d)
        + np.repeat(tr0d, n_rows_d)
    )
    slab_len = n_cols_d[d_of_row] + 1
    slab_start = np.cumsum(slab_len) - slab_len          # per row id
    total_slots = int(slab_len.sum())

    # (edge, tile-row) pair expansion over each edge's covered row span
    # intersected with its draw's window (empty intersection -> count 0)
    e_tr0 = np.maximum(np.floor(r_lo / tile).astype(np.int64), tr0d[owner])
    e_tr1 = np.minimum(
        np.floor((r_hi - 1e-9) / tile).astype(np.int64), tr1d[owner] - 1
    )
    counts = np.maximum(e_tr1 - e_tr0 + 1, 0) * live_d[owner]
    total = int(counts.sum())
    if total == 0:
        return
    eidx = np.repeat(np.arange(lines.shape[0]), counts)
    starts = np.cumsum(counts) - counts
    ti_pair = (
        np.arange(total) - np.repeat(starts, counts) + np.repeat(e_tr0, counts)
    )
    d_pair = owner[eidx]
    row_pair = row_of_draw[d_pair] + (ti_pair - tr0d[d_pair])
    a0 = lines[eidx, 0] - ti_pair * tile
    b0 = lines[eidx, 2] - ti_pair * tile
    lo = np.minimum(a0, b0)[:, None]
    hi = np.maximum(a0, b0)[:, None]
    overlap = np.clip(
        np.minimum(hi, rows_idx + 1.0) - np.maximum(lo, rows_idx), 0.0, None
    )
    signed = np.sign(b0 - a0)[:, None] * overlap  # (P, tile)

    # carry: scatter each pair's overlap vector at its first fully-left
    # column, then segmented cumsum along every row slab (global cumsum
    # minus the slab-start prefix; cross-slab magnitudes stay ~tile, so
    # the subtraction error is ~1e-12 f64 — invisible in the f32 output)
    e_tc0 = np.floor(c_lo / tile).astype(np.int64)
    e_tc_last = np.floor((c_hi - 1e-9) / tile).astype(np.int64)
    carry_flat = np.zeros((total_slots, tile))
    bucket = slab_start[row_pair] + np.clip(
        e_tc_last[eidx] + 1 - tc0d[d_pair], 0, n_cols_d[d_pair]
    )
    np.add.at(carry_flat, bucket, signed)
    csum = np.cumsum(carry_flat, axis=0)
    base = np.concatenate(
        [np.zeros((1, tile)), csum[slab_start[1:] - 1]], axis=0
    )
    carry_flat = csum - np.repeat(base, slab_len, axis=0)
    carry_live = np.abs(carry_flat).max(axis=1) > 0.0
    # the +1 overflow slot of each slab never names a real tile
    carry_live[slab_start + n_cols_d[d_of_row]] = False

    # per-tile edge lists: expand each pair over its kept column span;
    # the flat slot id doubles as the (draw, ti, tj) group key
    span0 = np.maximum(e_tc0[eidx], tc0d[d_pair])
    span1 = np.minimum(e_tc_last[eidx], tc1d[d_pair] - 1)
    ccounts = np.maximum(span1 - span0 + 1, 0)
    totc = int(ccounts.sum())
    if totc:
        pidx = np.repeat(np.arange(total), ccounts)
        cstarts = np.cumsum(ccounts) - ccounts
        tj_pair = (
            np.arange(totc) - np.repeat(cstarts, ccounts)
            + np.repeat(span0, ccounts)
        )
        entries = np.empty((totc, 4), dtype=lines.dtype)
        entries[:, 0] = a0[pidx]
        entries[:, 2] = b0[pidx]
        entries[:, 1] = lines[eidx[pidx], 1] - tj_pair * tile
        entries[:, 3] = lines[eidx[pidx], 3] - tj_pair * tile
        key = slab_start[row_pair[pidx]] + (tj_pair - tc0d[d_pair[pidx]])
        order = np.argsort(key, kind="stable")  # edge order kept per tile
        key_s = key[order]
        entries = entries[order]
        bounds = np.concatenate(
            [[0], 1 + np.nonzero(np.diff(key_s))[0], [totc]]
        )
        edge_keys = key_s[bounds[:-1]]
    else:
        bounds = np.array([0])
        edge_keys = np.zeros(0, np.int64)

    # yield tiles with edges and/or carry (all lookups pre-vectorized:
    # this loop runs per emitted tile, thousands of times on demo scenes)
    all_keys = np.union1d(edge_keys, np.nonzero(carry_live)[0])
    row_of_slot = np.searchsorted(slab_start, all_keys, side="right") - 1
    d_arr = d_of_row[row_of_slot]
    ti_arr = ti_of_row[row_of_slot]
    tj_arr = tc0d[d_arr] + (all_keys - slab_start[row_of_slot])
    e_pos = np.searchsorted(edge_keys, all_keys)
    if len(edge_keys):
        has_edge = (e_pos < len(edge_keys)) & (
            edge_keys[np.minimum(e_pos, len(edge_keys) - 1)] == all_keys
        )
    else:
        has_edge = np.zeros(len(all_keys), bool)
    live_arr = carry_live[all_keys]
    carry_f32 = carry_flat[all_keys].astype(DEVICE_FLOAT)
    zero_carry = _carry_consts(tile)[1]
    for idx in range(len(all_keys)):
        i = e_pos[idx]
        edges = entries[bounds[i]:bounds[i + 1]] if has_edge[idx] else _NO_EDGES
        carry = carry_f32[idx] if live_arr[idx] else zero_carry
        yield int(d_arr[idx]), int(ti_arr[idx]), int(tj_arr[idx]), edges, carry


def _filter_margin(flt, transform: Transform) -> tuple[int, int]:
    """Conservative device-pixel growth of a filter chain in (rows, cols)."""
    from .filter import FE_DROP_SHADOW, FE_GAUSSIAN_BLUR, FE_MORPHOLOGY, FE_OFFSET
    from .ops import blur as blur_ops

    mr = mc = 0.0
    for kind, attrs, _inputs in flt.filters:
        if kind == FE_GAUSSIAN_BLUR:
            std_x, std_y = attrs
            kernel = blur_ops.gaussian_kernel(transform, (std_x, std_x if std_y is None else std_y))
            if kernel is not None:
                mr += kernel.shape[0]
                mc += kernel.shape[1]
        elif kind == FE_OFFSET:
            dx, dy = attrs
            moved = transform.apply_vectors(np.array([[dx, dy]]))[0]
            mr += abs(moved[0])
            mc += abs(moved[1])
        elif kind == FE_MORPHOLOGY:
            rx, ry, _method = attrs
            unit = transform.apply_vectors(np.array([[rx, 0.0], [0.0, ry]]))
            mr += 2 * float(np.linalg.norm(unit[0]))
            mc += 2 * float(np.linalg.norm(unit[1]))
        elif kind == FE_DROP_SHADOW:
            dx, dy, std, _color = attrs
            kernel = blur_ops.gaussian_kernel(transform, (std, std))
            if kernel is not None:
                mr += kernel.shape[0]
                mc += kernel.shape[1]
            moved = transform.apply_vectors(np.array([[dx, dy]]))[0]
            mr += abs(moved[0])
            mc += abs(moved[1])
    return int(np.ceil(mr)), int(np.ceil(mc))


def _bucket(count: int, minimum: int = 32) -> int:
    size = minimum
    while size < count:
        size *= 2
    return size


def _round_count(count: int, step: int) -> int:
    """Round a row count up to step * {1..6, 8, 10, .., 16, 20, .., 32, 40 ..}.

    Pow2 rounding wastes up to 50% of the winding work on padding rows; this
    set keeps waste under ~17% while bounding the number of distinct
    compiled shapes (remote TPU compiles cost minutes each).
    """
    need = -(-count // step)
    if need > 6:
        granule = 2
        while need > 8 * granule:
            granule *= 2
        need = -(-need // granule) * granule
    return need * step


class _Pass:
    """One isolation pass: raw records + where its output lands in the pool."""

    __slots__ = ("records", "src_tiles", "out_tiles", "post", "pool_base", "refs")

    def __init__(self, records, src_tiles, out_tiles, post, pool_base, refs):
        self.records = records
        self.src_tiles = src_tiles
        self.out_tiles = out_tiles
        self.post = post
        self.pool_base = pool_base
        self.refs = refs


class _Builder:
    """Lowers a scene into one or more packed passes over a shared tile grid.

    Isolation groups (opacity over a group; later masks/filters) become
    separate passes rendered before the stream that references them: each
    output tile of a pass re-enters its parent stream as a texture item
    gathered from the pass pool.
    """

    def __init__(self, viewport, linear_rgb: bool, tile: int = None):
        v0, v1, h, w = viewport
        self.tile = tile or _pick_tile(viewport)
        self.v0, self.v1 = v0, v1
        self.grid_h = math.ceil(h / self.tile)
        self.grid_w = math.ceil(w / self.tile)
        self.num_tiles = self.grid_h * self.grid_w
        self.shift = np.array([v0, v1, v0, v1], dtype=np.float64)
        self.linear_rgb = linear_rgb
        self.clip_flat_cache: dict = {}  # clip_key -> [(lines, extents, rule)]
        self.clip_tile_cache: dict = {}  # (clip_key, ti, tj) -> tile result
        self.clip_cov_cache: dict = {}   # parts content key -> tile result
        self.clip_cov_dedup: dict = {}   # coverage f32 bytes -> canonical array
        self.passes: list = []  # [_Pass] in emission order; merged by _plan_groups
        self.pool_size = 0
        self.all_points: list = []
        self.patterns: list = []  # host copies of rendered pattern tiles
        self.pattern_cache: dict = {}
        self._blank_params = _paint_params(
            np.zeros(4, dtype=np.float64), None, Transform(), linear_rgb
        )

    # -- clip helpers -------------------------------------------------------
    def _clip_tile(self, clip, ti: int, tj: int):
        """Tile-local clip coverage for tile (ti, tj).

        Returns _UNCLIPPED (full coverage — the record needs no clip
        reference), None (zero coverage — the tile is invisible, skip the
        record), or a deduplicated (tile, tile) f32 coverage field: the
        alpha UNION of the clip's per-part rule coverages, precomputed on
        host (see _union_cov_field) so the executors just multiply it in.
        """
        if clip is None:
            return _UNCLIPPED
        clip_scene, clip_tr = clip
        # id(clip_tr) would collide when a dead transform's id is reused
        # by a later different clip (nondeterministic dropped/phantom
        # tiles); the matrix bytes are the real identity
        clip_key = (id(clip_scene), clip_tr.m.tobytes())
        tiles_map = self.clip_flat_cache.get(clip_key)
        if tiles_map is None:
            # bin every part over its whole tile window in one batched
            # pass (round 5: the old per-(part, tile) lazy _row_bin /
            # _col_bin evaluation cost ~0.27 s of material's lower).
            # Tiles outside every part's window read as None (invisible)
            # — the old path computed those as exact-zero or ~1e-16
            # carry residues of closed contours, invisible either way
            parts = []
            for lines, rule in _clip_parts(clip_scene, clip_tr, {}):
                parts.append((lines - self.shift, rule))
            tiles_map = {}
            if parts:
                for p, ti_, tj_, edges, carry in _bin_draws(
                    [p[0] for p in parts], self.grid_h, self.grid_w, self.tile
                ):
                    tiles_map.setdefault((ti_, tj_), []).append(
                        (edges, carry, parts[p][1])
                    )
            self.clip_flat_cache[clip_key] = tiles_map
        tile_key = (clip_key, ti, tj)
        cached = self.clip_tile_cache.get(tile_key, False)
        if cached is not False:
            return cached
        result = self._clip_cov_of(tiles_map.get((ti, tj), []))
        self.clip_tile_cache[tile_key] = result
        return result

    def _clip_cov_of(self, parts_tile: list):
        """Coverage field of live tile-local parts, with fast paths.

        Deduplicated twice: by part content (skip recomputing the union)
        and by the resulting coverage bytes (identical fields from
        different clip scenes share one packed row).
        """
        if not parts_tile:
            return None  # no part reaches this tile
        for edges, carry, rule in parts_tile:
            # carry-only part covering every pixel -> the union is full
            if edges.shape[0] == 0 and np.all(
                _coverage_np(carry.astype(np.float64), rule) >= 1.0
            ):
                return _UNCLIPPED
        key = tuple(
            (e.tobytes(), c.tobytes(), r) for e, c, r in parts_tile
        )
        result = self.clip_cov_cache.get(key, False)
        if result is not False:
            return result
        cov = np.ascontiguousarray(
            _union_cov_field(parts_tile, self.tile).astype(DEVICE_FLOAT)
        )
        if not cov.any():
            result = None
        elif np.all(cov >= 1.0):
            result = _UNCLIPPED
        else:
            b = cov.tobytes()
            result = self.clip_cov_dedup.setdefault(b, cov)
        self.clip_cov_cache[key] = result
        return result

    # -- pattern paints -------------------------------------------------------
    def _pattern_params(self, paint: Pattern, hull: ConvexHull, transform: Transform):
        """Resolve a Pattern paint: render its tile once, return item params.

        The rendered tile is cached per (paint, transform[, target bbox]) and
        appended to the scene's pattern atlas; the item carries the modular
        gather frame (parity: svgrasterize.py:1049-1094).  Returns None when
        the pattern draws nothing (reference skips the fill, :1053-1056).
        """
        if paint.width <= 0 or paint.height <= 0:
            return None
        key = (id(paint), transform.m.tobytes())
        if paint.bbox_units or paint.scene_bbox_units:
            key = (*key, tuple(np.round(hull.bbox(transform), 6)))
        if key in self.pattern_cache:
            return self.pattern_cache[key]

        from .render import pattern_texture

        setup = pattern_texture(paint, hull, transform, self.linear_rgb)
        if setup is None:
            self.pattern_cache[key] = None
            return None
        pat, repeat_tr, lo, (tile_h, tile_w), pat_layer = setup
        layer = Layer(pat, (0, 0), pat_layer.pre_alpha, pat_layer.linear_rgb)
        tex = np.asarray(
            layer.convert(pre_alpha=True, linear_rgb=self.linear_rgb).image,
            dtype=DEVICE_FLOAT,
        )
        params = dict(self._blank_params)
        params["kind"] = np.int32(PAINT_PATTERN)
        params["affine"] = repeat_tr.invert.m[:2, :].astype(DEVICE_FLOAT)
        params["pat_fwd"] = repeat_tr.m[:2, :].astype(DEVICE_FLOAT)
        params["pat_xy"] = np.array([paint.x, paint.y], DEVICE_FLOAT)
        params["pat_wh"] = np.array([paint.width, paint.height], DEVICE_FLOAT)
        params["pat_lo"] = np.asarray(lo, np.int32)
        params["pat_max"] = np.array([tile_h, tile_w], np.int32)
        params["pat_idx"] = np.int32(len(self.patterns))
        self.patterns.append(tex)
        self.pattern_cache[key] = params
        return params

    # -- pass emission --------------------------------------------------------
    def _finish_pass(self, sub_records: list, out_tiles=None, post=None):
        """Record sorted records as a pass; returns {tile_id: pool_idx}.

        Packing is deferred to _plan_groups so that independent passes merge
        into one device program (icons.svg: 127 passes -> a handful of
        programs instead of 128 dispatches with distinct compiled shapes).
        """
        sub_records.sort(key=lambda r: (r[0], r[1]))
        src_tiles = sorted({r[0] for r in sub_records})
        if out_tiles is None:
            out_tiles = src_tiles
        base = self.pool_size
        self.pool_size += len(out_tiles)
        refs = sorted(
            {r[10] for r in sub_records if r[10] >= 0}
            | {r[11] for r in sub_records if r[11] >= 0}
        )
        self.passes.append(_Pass(sub_records, src_tiles, list(out_tiles), post, base, refs))
        return {tile: base + rank for rank, tile in enumerate(out_tiles)}

    def _emit_pass(self, scene, transform: Transform):
        """Lower a subtree as an isolation pass; returns {tile_id: pool_idx}."""
        sub_records = self.build(scene, transform)
        if not sub_records:
            return None
        return self._finish_pass(sub_records)

    def _emit_filter_pass(self, target, flt, transform: Transform):
        """Lower filter(target): the pass output is the filtered, grown region."""
        points_start = len(self.all_points)
        sub_records = self.build(target, transform)
        if not sub_records:
            return None
        # bbox-tight source region (the reference filters bbox-tight layers;
        # its blur placement truncation is offset-dependent, so the same
        # origin must reach the convolution)
        pts = np.concatenate(self.all_points[points_start:], axis=0)
        content_bbox = (
            int(np.floor(pts[:, 0].min())) - 1,
            int(np.floor(pts[:, 1].min())) - 1,
            int(np.ceil(pts[:, 0].max())) + 1,
            int(np.ceil(pts[:, 1].max())) + 1,
        )
        src_tiles = sorted({r[0] for r in sub_records})
        mr, mc = _filter_margin(flt, transform)
        rows = [t // self.grid_w for t in src_tiles]
        cols = [t % self.grid_w for t in src_tiles]
        ti0 = max(min(rows) - -(-mr // self.tile), 0)
        ti1 = min(max(rows) + -(-mr // self.tile), self.grid_h - 1)
        tj0 = max(min(cols) - -(-mc // self.tile), 0)
        tj1 = min(max(cols) + -(-mc // self.tile), self.grid_w - 1)
        dst_tiles = [
            ti * self.grid_w + tj
            for ti in range(ti0, ti1 + 1)
            for tj in range(tj0, tj1 + 1)
        ]
        post = (flt, transform, content_bbox)
        return self._finish_pass(sub_records, out_tiles=dst_tiles, post=post)

    def _texture_record(self, tile: int, z: int, opacity, clip, tex_idx: int, mask_idx: int):
        ti, tj = divmod(tile, self.grid_w)
        clip_cov = self._clip_tile(clip, ti, tj)
        if clip_cov is None:
            return None
        return (
            tile, z, _NO_EDGES, _carry_consts(self.tile)[2],
            None if clip_cov is _UNCLIPPED else clip_cov,
            self._blank_params, 0, opacity, ti * self.tile, tj * self.tile,
            tex_idx, mask_idx,
        )

    # -- lowering -----------------------------------------------------------
    def _flatten_draws(self, draws: list) -> dict:
        """Flatten all draw geometry in one batched pass: {draw index: lines}.

        Per-draw flattening spends most of its time in numpy dispatch on
        small curve arrays; concatenating every draw's (transformed) cubics
        into one flatten_cubics call amortizes it (material-design lowering:
        the flatten share drops ~3x).
        """
        from .geom import bezier

        line_parts: dict = {}
        cubic_parts: list = []
        cubic_owner: list = []
        for z, entry in enumerate(draws):
            if entry[0] != "draw" or entry[3] is None:
                continue
            path, tr = entry[1], entry[2]
            lines, cubics = path.segments_as_curves()
            line_parts[z] = tr(lines) if lines.size else lines
            if cubics.size:
                cubic_parts.append(tr(cubics))
                cubic_owner.append(z)
        out: dict = {}
        if cubic_parts:
            counts = np.array([c.shape[0] for c in cubic_parts])
            stacked = np.concatenate(cubic_parts, axis=0)
            flat, per_curve = bezier.flatten_cubics_counts(stacked, FLATNESS)
            # split the flattened stream back into per-draw chunks (the
            # flatten returns segments grouped by source curve)
            per_draw = np.add.reduceat(per_curve, np.concatenate([[0], np.cumsum(counts)[:-1]]))
            splits = np.cumsum(per_draw)[:-1]
            pieces = np.split(flat, splits)
            for z, piece in zip(cubic_owner, pieces):
                lines = line_parts[z]
                out[z] = np.concatenate([lines, piece]) if lines.size else piece
        for z, lines in line_parts.items():
            if z not in out:
                out[z] = lines
        return out

    def build(self, scene, transform: Transform) -> list:
        """Subtree -> record list (z-sorted later); may append nested passes."""
        draws: list = []
        _collect_draws(scene, transform, 1.0, None, draws)
        flattened = self._flatten_draws(draws)

        records: list = []
        plain: list = []  # (z, flat lines, params, rule, opacity, clip)
        for z, entry in enumerate(draws):
            if entry[0] == "pass":
                _tag, target, tr, opacity, clip = entry
                pool_of_tile = self._emit_pass(target, tr)
                if pool_of_tile is None:
                    continue
                for tile, pool_idx in pool_of_tile.items():
                    record = self._texture_record(tile, z, opacity, clip, pool_idx, -1)
                    if record is not None:
                        records.append(record)
                continue

            if entry[0] == "mask":
                _tag, target, mask_scene, tr, mask_tr, opacity, clip = entry
                target_tiles = self._emit_pass(target, tr)
                if target_tiles is None:
                    continue
                mask_tiles = self._emit_pass(mask_scene, mask_tr)
                if mask_tiles is None:
                    continue  # empty mask hides the target entirely
                for tile in sorted(set(target_tiles) & set(mask_tiles)):
                    record = self._texture_record(
                        tile, z, opacity, clip, target_tiles[tile], mask_tiles[tile]
                    )
                    if record is not None:
                        records.append(record)
                continue

            if entry[0] == "filter":
                _tag, target, flt, tr, opacity, clip = entry
                pool_of_tile = self._emit_filter_pass(target, flt, tr)
                if pool_of_tile is None:
                    continue
                for tile, pool_idx in pool_of_tile.items():
                    record = self._texture_record(tile, z, opacity, clip, pool_idx, -1)
                    if record is not None:
                        records.append(record)
                continue

            _tag, path, tr, paint, fill_rule, opacity, clip = entry
            if paint is None:
                continue
            lines = flattened.get(z)
            if lines is None or lines.size == 0:
                continue
            self.all_points.append(lines[:, 0])
            flat = lines.reshape(-1, 4) - self.shift
            if isinstance(paint, Pattern):
                params = self._pattern_params(paint, ConvexHull(lines), tr)
                if params is None:
                    continue  # empty pattern scene draws nothing
            else:
                params = _paint_params(paint, ConvexHull(lines), tr, self.linear_rgb)
            rule = _FILL_RULE_ID.get(fill_rule)
            if rule is None:
                raise _Unsupported(f"fill rule {fill_rule}")
            plain.append((z, flat, params, rule, opacity, clip))

        # all plain draws bin in ONE vectorized pass (records z-sort later;
        # passes above already emitted their pool rows in z order)
        for di, ti, tj, edges, carry in _bin_draws(
            [p[1] for p in plain], self.grid_h, self.grid_w, self.tile
        ):
            z, _flat, params, rule, opacity, clip = plain[di]
            clip_cov = self._clip_tile(clip, ti, tj)
            if clip_cov is None:
                continue  # zero clip coverage: the tile is invisible
            records.append(
                (ti * self.grid_w + tj, z, edges, carry,
                 None if clip_cov is _UNCLIPPED else clip_cov,
                 params, rule, opacity, ti * self.tile, tj * self.tile,
                 -1, -1)
            )
        return records

    # -- packing ------------------------------------------------------------
    @staticmethod
    def _cull_occluded(records: list) -> list:
        """Drop records hidden behind a full-tile opaque solid in their tile.

        A record with no inline edges, full-coverage carry rows, no clip /
        texture / mask, opacity 1 and a solid premultiplied color with
        alpha exactly 1 composes to exactly its own color: alpha==1 makes
        acc*(1-alpha) an exact f32 zero, so every earlier record of the
        same tile in the stream is dead weight.  Interior tiles of large
        opaque shapes (backgrounds, cards) hit this constantly — the item
        stream is the executors' unit of work, so this is a free device-
        time win with bit-identical output.  SVGR_CULL=0 disables (A/B).
        """
        if os.environ.get("SVGR_CULL", "1") == "0":
            return records
        last_occ: dict[int, int] = {}
        for i, r in enumerate(records):
            params = r[5]
            if (
                r[2].shape[0] == 0           # no inline edges
                and r[4] is None             # no clip coverage
                and r[10] < 0 and r[11] < 0  # no texture / mask compose
                and r[7] >= 1.0              # group opacity
                and params["kind"] == PAINT_SOLID
                and float(params["color"][3]) >= 1.0
            ):
                cov = _coverage_np(r[3].astype(np.float64), r[6])
                if (cov >= 1.0).all():
                    last_occ[r[0]] = i
        if not last_occ:
            return records
        return [
            r for i, r in enumerate(records) if i >= last_occ.get(r[0], -1)
        ]

    def _collapse_runs(self, records: list):
        """Collapse z-consecutive scene-static solid items per tile into one
        precomposed full-coverage "field" item.

        The kernels' per-item cost (serial K-loop + scalar-core overhead,
        ~0.15-0.37 us/item on v5e) is the material-design floor, so fewer,
        fatter items beat faster per-item code.  A run of consecutive
        same-tile records whose paint is a plain solid with no pool /
        pattern reads is scene-static end to end: each member's coverage
        (winding + carry, fill rule, precomputed clip, opacity) and its
        premultiplied color are known at lowering time, so the run's
        OVER-composite is a fixed premultiplied RGBA field P whose alpha
        plane is A = 1 - prod(1 - a_i cov_i).  Emitting P as ONE
        full-coverage item (ones carry, no edges, rule 0) reproduces the
        run exactly in both executors: acc' = P + acc (1 - A).  The field
        streams through the pregrad paint path (ops/fused_exec
        prepare_fused overrides the item's pre-rendered paint), so the
        fused kernel needs no new code — a field item is a "solid" whose
        streamed paint happens to be P.  material-design @1488 collapses
        3730 -> 2131 items at tile 32.  SVGR_COLLAPSE=0 disables (A/B).

        Returns (records, field_stack | None) where field_stack is
        (F, T, T, 4) f32 premultiplied RGBA, referenced by the replacement
        records' params["_field_row"].
        """
        if os.environ.get("SVGR_COLLAPSE", "1") == "0" or len(records) < 2:
            return records, None

        # gradient paints are scene-static per pixel too (pregrad streams
        # them pre-rendered), so gradient-painted runs collapse as well —
        # the host evaluates the same affine/spread/stop math as the
        # device (_paint_fields_np).  SVGR_COLLAPSE_GRAD=0 limits the
        # collapse to solids (A/B knob).  Patterns and pool-reading items
        # (tex/mask) stay out: the atlas gather and the pool are not
        # mirrored on host / not scene-static.
        grad_ok = os.environ.get("SVGR_COLLAPSE_GRAD", "1") != "0"
        kinds_ok = (
            (PAINT_SOLID, PAINT_LINEAR, PAINT_RADIAL, PAINT_PATTERN)
            if grad_ok else (PAINT_SOLID,)
        )

        def eligible(r):
            p = r[5]
            # "_field_row" excludes already-emitted field records (their
            # winding comes from an empty edge array and a zero dummy
            # color, so a second collapse pass would dissolve them into
            # transparent zeros) — makes the collapse idempotent.
            # Pattern paints are scene-static too (the atlas tiles are
            # rendered at build time); only pool reads (tex/mask) are
            # frame-dynamic and can never collapse.
            return (
                p["kind"] in kinds_ok
                and (p["kind"] == PAINT_PATTERN or int(p["pat_idx"]) < 0)
                and "_field_row" not in p
                and r[10] < 0 and r[11] < 0
            )

        runs: list = []  # (start, end) half-open index ranges
        i, n = 0, len(records)
        while i < n:
            if not eligible(records[i]):
                i += 1
                continue
            j = i
            while (j + 1 < n and records[j + 1][0] == records[i][0]
                   and eligible(records[j + 1])):
                j += 1
            if j > i:
                runs.append((i, j + 1))
            i = j + 1
        if not runs:
            return records, None

        members = [k for i0, i1 in runs for k in range(i0, i1)]
        winds = _host_winding_batch(
            [records[k][2] for k in members], self.tile
        )
        T = self.tile
        # batched member coverages, mirroring batch_exec._raster_item's
        # mask semantics exactly: winding carry, fill rule, precomputed
        # clip, the 1e-6 floor, then opacity (f32 — the executors consume
        # f32 fields; test_collapse's 1e-3 atol covers the accumulation)
        winds += np.stack(
            [records[k][3] for k in members]
        ).astype(np.float32)[:, :, None]
        rules = np.array(
            [records[k][6] for k in members], bool
        )[:, None, None]
        cov = np.where(
            rules,
            np.abs(np.remainder(winds + 1.0, 2.0) - 1.0),
            np.clip(np.abs(winds), 0.0, 1.0),
        )
        for m, k in enumerate(members):
            if records[k][4] is not None:
                cov[m] *= records[k][4]
        cov = np.where(cov < 1e-6, 0.0, cov)
        cov *= np.array(
            [records[k][7] for k in members], np.float32
        )[:, None, None]
        # per-member (T,T,4) paint fields, evaluated in chunks (the whole
        # array is M x 16 KB at tile 32; chunking bounds the gradient-math
        # temporaries).  v0/v1: gradient affines expect canvas coords, the
        # same origin _pack writes into items["tile_r"/"tile_c"]
        paints = np.empty((len(members), T, T, 4), np.float32)
        for lo in range(0, len(members), 1024):
            part = members[lo : lo + 1024]
            paints[lo : lo + len(part)] = _paint_fields_np(
                [records[k][5] for k in part],
                [records[k][8] + self.v0 for k in part],
                [records[k][9] + self.v1 for k in part],
                T, pattern_tiles=self.patterns,
            )
        # run OVER-composites via suffix products,
        # P = sum_k paint_k cov_k prod_{j>k}(1 - a_j(x,y) cov_j),
        # vectorized per run-LENGTH bucket (a per-run loop paid ~10 small
        # numpy dispatches x ~1000 runs ~ 0.4 s of the material lower)
        from collections import defaultdict

        lens = [i1 - i0 for i0, i1 in runs]
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        by_len: dict = defaultdict(list)
        for ri, ln in enumerate(lens):
            by_len[ln].append(ri)
        P_all = np.empty((len(runs), T, T, 4), np.float32)
        for ln, idxs in by_len.items():
            mi = (starts[idxs][:, None] + np.arange(ln)).ravel()
            c = cov[mi].reshape(len(idxs), ln, T, T)
            pa = paints[mi].reshape(len(idxs), ln, T, T, 4)
            q = 1.0 - pa[..., 3] * c
            sp = np.cumprod(q[:, ::-1], axis=1)[:, ::-1]
            sp[:, :-1] = sp[:, 1:]
            sp[:, -1] = 1.0
            P_all[idxs] = ((c * sp)[..., None] * pa).sum(axis=1)

        empty = np.zeros((0, 4), DEVICE_FLOAT)
        ones = np.ones(T, DEVICE_FLOAT)
        fields: list = []
        out: list = []
        pos = 0
        for ri, (i0, i1) in enumerate(runs):
            out.extend(records[pos:i0])
            pos = i1
            P = P_all[ri]
            first = records[i0]
            params = _paint_params(
                np.zeros(4, DEVICE_FLOAT), None, None, True
            )
            params["_field_row"] = len(fields)
            fields.append(P)
            out.append((
                first[0], first[1], empty, ones, None, params,
                0, 1.0, first[8], first[9], -1, -1,
            ))
        out.extend(records[pos:])
        return out, np.stack(fields).astype(DEVICE_FLOAT)

    def _pack(self, records: list, pad_tile: int | None = None):
        """Sorted records -> (items dict, big-class tuple, clip array).

        pad_tile: tile id written into padding items (the executor's scratch
        row) — the canvas tile count for the main stream, the virtual row
        count for merged pass groups.

        Items over SMALL_SEGS edges go to per-width class arrays (the big
        pre-pass); each class pads to its own power-of-two width, so one
        1000-segment path does not inflate every heavy item to its width.
        Clip coverage fields (host-precomputed, _clip_tile) are deduplicated
        by identity, packed as (U, T, T) rows, and referenced by index.
        """
        from .ops.batch_exec import CHUNK_BIG, SMALL_SEGS

        records = self._cull_occluded(records)
        records, field_stack = self._collapse_runs(records)
        if pad_tile is None:
            pad_tile = self.num_tiles
        n = len(records)
        # small passes pad to a small power of two; large ones to an
        # economically-rounded count of full chunks
        if n <= CHUNK_ITEMS:
            n_pad = _bucket(n, minimum=16)
        else:
            n_pad = _round_count(n, CHUNK_ITEMS)

        # band-split every edge list so the fused kernel's 8-row banded
        # winding passes apply (see _band_split_batch); one batched call
        # over the whole plan, dedup'd by array identity (clip coverage is
        # a precomputed field now — only draw edges need banding)
        band_cache: dict[int, np.ndarray] = {}
        uniques: list[np.ndarray] = []
        for r in records:
            arr = r[2]
            if arr.shape[0] and id(arr) not in band_cache:
                band_cache[id(arr)] = arr  # placeholder, filled below
                uniques.append(arr)
        if uniques:
            counts = np.array([a.shape[0] for a in uniques])
            owner = np.repeat(np.arange(len(uniques)), counts)
            split, own_out = _band_split_batch(
                np.concatenate(uniques, axis=0), self.tile, owner
            )
            bounds = np.cumsum(np.bincount(own_out, minlength=len(uniques)))
            pieces = np.split(split, bounds[:-1])
            for arr, piece in zip(uniques, pieces):
                band_cache[id(arr)] = piece

        def banded(arr: np.ndarray) -> np.ndarray:
            out = band_cache.get(id(arr))
            return out if out is not None else arr

        # segment-class scheduling: the inline budget adapts to the scene's
        # MEDIAN edge count (winding cost is linear in the padded width, so
        # a handful of complex tiles must not tax the typical item); heavier
        # edge lists group into per-width class arrays for the pre-pass
        seg_counts = np.array([banded(r[2]).shape[0] for r in records])
        median = int(np.median(seg_counts[seg_counts > 0])) if (seg_counts > 0).any() else 0
        s_bucket = min(_bucket(max(median, 1), 8), SMALL_SEGS)
        try:
            s_env = int(os.environ.get("SVGR_INLINE_SEGS", "0"))
        except ValueError:
            s_env = 0
        if s_env > 0:
            # cap the inline budget below the median-adaptive choice:
            # pregather turned the big-class prepass into scene-static
            # prep, so serving can trade inline per-frame winding passes
            # for (prep-time) class rows.  Measured same-run A/B on
            # material (v5e): offloading at 16 LOSES (1303 vs 1687
            # Mpx/s) — the per-item pregathered-field gather in the
            # kernel costs more than the inline passes it saves, so the
            # median-adaptive default stands; the knob stays for scenes
            # with pathological tails
            s_bucket = max(min(s_bucket, _bucket(s_env, 8)), 8)
        widths = sorted(
            {_bucket(banded(r[2]).shape[0], 2 * s_bucket) for r in records
             if banded(r[2]).shape[0] > s_bucket}
        )
        class_of_width = {w: c for c, w in enumerate(widths)}
        class_rows: list[list] = [[] for _ in widths]

        # clip coverage rows, deduplicated by array identity: _clip_tile
        # already dedups by content (material-design: 935 clip scenes share
        # ~100 unique tile-local fields), so identical tiles arrive as one
        # ndarray object
        clip_index: dict[int, int] = {}
        clip_arrays: list[np.ndarray] = []
        for r in records:
            cov = r[4]
            if cov is None:
                continue
            if id(cov) not in clip_index:
                clip_index[id(cov)] = len(clip_arrays)
                clip_arrays.append(cov)
        if clip_arrays:
            u = len(clip_arrays)
            u_pad = _bucket(u, 8) if u <= CHUNK_BIG else _round_count(u, CHUNK_BIG)
            clips = np.zeros((u_pad, self.tile, self.tile), DEVICE_FLOAT)
            for i, a in enumerate(clip_arrays):
                clips[i] = a
        else:
            clips = np.zeros((0, self.tile, self.tile), DEVICE_FLOAT)

        # stop tables shrink to the scene's real maximum (paint evaluation
        # cost is linear in the table width)
        k_bucket = _bucket(max(r[5]["_n_stops"] for r in records), minimum=4)
        k_bucket = min(k_bucket, MAX_STOPS)

        items = {
            "lines": np.zeros((n_pad, s_bucket, 4), DEVICE_FLOAT),
            "carry": np.zeros((n_pad, self.tile), DEVICE_FLOAT),
            "big_idx": np.full(n_pad, -1, np.int32),
            "tex_idx": np.full(n_pad, -1, np.int32),
            "mask_idx": np.full(n_pad, -1, np.int32),
            "clip_idx": np.full(n_pad, -1, np.int32),
            "tile_id": np.full(n_pad, pad_tile, np.int32),
            "fill_rule": np.zeros(n_pad, np.int32),
            "opacity": np.zeros(n_pad, DEVICE_FLOAT),
            "tile_r": np.zeros(n_pad, DEVICE_FLOAT),
            "tile_c": np.zeros(n_pad, DEVICE_FLOAT),
            "kind": np.zeros(n_pad, np.int32),
            "color": np.zeros((n_pad, 4), DEVICE_FLOAT),
            "affine": np.zeros((n_pad, 2, 3), DEVICE_FLOAT),
            "p0": np.zeros((n_pad, 2), DEVICE_FLOAT),
            "p1": np.zeros((n_pad, 2), DEVICE_FLOAT),
            "center": np.zeros((n_pad, 2), DEVICE_FLOAT),
            "fcenter": np.zeros((n_pad, 2), DEVICE_FLOAT),
            "radius": np.zeros(n_pad, DEVICE_FLOAT),
            "fradius": np.zeros(n_pad, DEVICE_FLOAT),
            "spread": np.zeros(n_pad, np.int32),
            "n_stops": np.zeros(n_pad, np.int32),
            "stop_offsets": np.ones((n_pad, k_bucket), DEVICE_FLOAT),
            "stop_colors": np.zeros((n_pad, k_bucket, 4), DEVICE_FLOAT),
            "pat_idx": np.full(n_pad, -1, np.int32),
            "pat_fwd": np.zeros((n_pad, 2, 3), DEVICE_FLOAT),
            "pat_xy": np.zeros((n_pad, 2), DEVICE_FLOAT),
            "pat_wh": np.ones((n_pad, 2), DEVICE_FLOAT),
            "pat_lo": np.zeros((n_pad, 2), np.int32),
            "pat_max": np.zeros((n_pad, 2), np.int32),
        }
        if field_stack is not None:
            # collapsed-run paint fields (_collapse_runs): the (F, T, T, 4)
            # stack is plan-global (NOT per-item — every consumer that
            # slices/permutes/shards the per-item arrays must pass it
            # through whole), referenced by field_idx
            f_pad = _bucket(field_stack.shape[0], 8)
            stack = np.zeros((f_pad, self.tile, self.tile, 4), DEVICE_FLOAT)
            stack[: field_stack.shape[0]] = field_stack
            items["field"] = stack
            items["field_idx"] = np.full(n_pad, -1, np.int32)
        for i, (tile_id, _z, edges, carry, clip_cov, params,
                rule, opacity, tr_origin, tc_origin, tex_idx, mask_idx) in enumerate(records):
            edges = banded(edges)
            if edges.shape[0] > s_bucket:
                cls = class_of_width[_bucket(edges.shape[0], 2 * s_bucket)]
                class_rows[cls].append((i, edges))
            else:
                items["lines"][i, : edges.shape[0]] = edges
            items["carry"][i] = carry
            items["tex_idx"][i] = tex_idx
            items["mask_idx"][i] = mask_idx
            if clip_cov is not None:
                items["clip_idx"][i] = clip_index[id(clip_cov)]
            items["tile_id"][i] = tile_id
            items["fill_rule"][i] = rule
            items["opacity"][i] = opacity
            # gradient affines expect canvas coordinates: add viewport origin
            items["tile_r"][i] = tr_origin + self.v0
            items["tile_c"][i] = tc_origin + self.v1
            for key in (
                "kind", "color", "affine", "p0", "p1", "center", "fcenter",
                "radius", "fradius", "spread",
                "pat_idx", "pat_fwd", "pat_xy", "pat_wh", "pat_lo", "pat_max",
            ):
                items[key][i] = params[key]
            items["n_stops"][i] = min(params["_n_stops"], k_bucket)
            items["stop_offsets"][i] = params["stop_offsets"][:k_bucket]
            items["stop_colors"][i] = params["stop_colors"][:k_bucket]
            if field_stack is not None:
                items["field_idx"][i] = params.get("_field_row", -1)

        # pack big classes; big_idx is a row into the concatenated stack
        bigs: list[np.ndarray] = []
        offset = 0
        for width, rows in zip(widths, class_rows):
            m = len(rows)
            m_pad = _bucket(m, 8) if m <= CHUNK_BIG else _round_count(m, CHUNK_BIG)
            arr = np.zeros((m_pad, width, 4), DEVICE_FLOAT)
            for row, (i, edges) in enumerate(rows):
                arr[row, : edges.shape[0]] = edges
                items["big_idx"][i] = offset + row
            bigs.append(arr)
            offset += m_pad
        return items, tuple(bigs), clips


def _plan_groups(builder: "_Builder") -> list:
    """Merge independent isolation passes into per-level device programs.

    A pass depends only on pool rows written by passes emitted before it, so
    leveling by referenced owners gives a correct topological batching: every
    level is one packed program over a *virtual row space* (the concatenation
    of its passes' output/source tiles), followed by one pool update (plus
    host-coordinated filter post-ops for filter passes).

    Pool rows are RENUMBERED into the post stage's EMISSION order — level
    by level, per-part outputs first, then each batched-blur chunk's
    (ops/filter_batch) — so each level's outputs form one contiguous,
    already-ordered block ("pool_lo" + "pool_n" on the group): the
    level's pool update is then a single dynamic_update_slice with no
    row permutation.  (A static row scatter lowers to one sequential
    per-row update on TPU, ~3.3 ms of icons.svg's 7.2 ms serve; a
    device-side whole-row permutation gather costs ~2.5 ms of the same.)
    Returns (groups, lut) where lut maps emission-order pool rows to the
    new order; the caller remaps the main stream's tex/mask references.
    """
    from .ops import filter_batch

    passes = builder.passes
    if not passes:
        return [], None
    owner = np.zeros(builder.pool_size, np.int32)
    for i, p in enumerate(passes):
        owner[p.pool_base : p.pool_base + len(p.out_tiles)] = i
    level = [0] * len(passes)
    for i, p in enumerate(passes):
        if p.refs:
            level[i] = 1 + max(level[int(owner[r])] for r in p.refs)

    lut = np.zeros(max(builder.pool_size, 1), np.int32)
    new_row = 0
    groups = []
    for lev in range(max(level) + 1):
        members = [p for i, p in enumerate(passes) if level[i] == lev]
        pool_lo = new_row
        row = 0
        merged: list = []
        parts: list = []
        for p in members:
            # filter passes render their source tiles; the post-op produces
            # the (grown) out_tiles. Plain passes output what they render.
            row_tiles = p.src_tiles if p.post is not None else p.out_tiles
            rank = {t: k for k, t in enumerate(row_tiles)}
            for r in p.records:
                merged.append((row + rank[r[0]],) + r[1:])
            parts.append(
                {
                    "row_start": row,
                    "n_rows": len(row_tiles),
                    "src_tiles": p.src_tiles,
                    "out_tiles": p.out_tiles,
                    "post": p.post,
                    "pool_base": None,  # assigned below, in emission order
                }
            )
            row += len(row_tiles)

        chunk_groups, batched = filter_batch.plan_level(
            parts, builder.grid_w, (builder.v0, builder.v1), builder.tile
        )

        def assign(pi):
            nonlocal new_row
            n = len(members[pi].out_tiles)
            parts[pi]["pool_base"] = new_row
            base = members[pi].pool_base
            lut[base : base + n] = np.arange(new_row, new_row + n)
            new_row += n

        for pi in range(len(parts)):
            if pi not in batched:
                assign(pi)
        for grp, _lin in chunk_groups:
            for pi, spec in grp:
                assign(pi)
                spec["pool_base"] = parts[pi]["pool_base"]
        chunks = filter_batch.build_chunks(chunk_groups, builder.grid_w, builder.tile)

        merged.sort(key=lambda r: (r[0], r[1]))
        items, bigs, clips = builder._pack(merged, pad_tile=row)
        for key in ("tex_idx", "mask_idx"):
            arr = items[key]
            items[key] = np.where(arr >= 0, lut[np.maximum(arr, 0)], arr)
        groups.append(
            {
                "items": items,
                "bigs": bigs,
                "clips": clips,
                "rows": row,
                "parts": parts,
                "pool_lo": pool_lo,
                "pool_n": new_row - pool_lo,
                "_blur_batch": (chunks, batched),
                "needs_pool": any(p.refs for p in members),
            }
        )
    return groups, lut


class Lowered(NamedTuple):
    """A fully lowered scene: packed device arrays + the pass schedule."""

    items: dict  # main-stream per-item arrays (leading dim N)
    bigs: tuple  # heavy edge lists, one (M_c, S_c, 4) array per width class
    clips: Any  # deduplicated (U, T, T) precomputed clip coverage fields
    grid: tuple  # (grid_h, grid_w) canvas tiles
    hull: Any  # ConvexHull of all draw geometry
    groups: list  # merged isolation-pass programs (see _plan_groups)
    patterns: Any  # (Q, TH, TW, 4) pattern-tile atlas or None
    tile: int  # canvas tile size this plan was lowered for


def lower_scene(scene, transform: Transform, viewport, linear_rgb: bool, tile: int = None):
    """Lower a scene to packed device arrays; None if unsupported.

    viewport: (origin0, origin1, extent0, extent1) in device pixels.
    Returns a Lowered plan: the main item stream, its segment-class and
    clip arrays, the merged isolation-pass groups whose pooled output tiles
    the main items reference by tex_idx/mask_idx, and the pattern atlas.
    tile overrides the viewport-adaptive tile size (_pick_tile).
    """
    builder = _Builder(viewport, linear_rgb, tile)
    try:
        records = builder.build(scene, transform)
    except _Unsupported:
        return None
    if not records:
        return None
    records.sort(key=lambda r: (r[0], r[1]))
    items, bigs, clips = builder._pack(records)
    if builder.all_points:
        hull = ConvexHull(np.concatenate(builder.all_points, axis=0))
    else:
        hull = ConvexHull(np.zeros((0, 2)))
    groups, pool_lut = _plan_groups(builder)
    if pool_lut is not None:
        for key in ("tex_idx", "mask_idx"):
            arr = items[key]
            items[key] = np.where(arr >= 0, pool_lut[np.maximum(arr, 0)], arr)
    if builder.patterns:
        p_h = _bucket(max(t.shape[0] for t in builder.patterns), minimum=8)
        p_w = _bucket(max(t.shape[1] for t in builder.patterns), minimum=8)
        patterns = np.zeros((len(builder.patterns), p_h, p_w, 4), DEVICE_FLOAT)
        for i, t in enumerate(builder.patterns):
            patterns[i, : t.shape[0], : t.shape[1]] = t
    else:
        patterns = None
    return Lowered(
        items, bigs, clips, (builder.grid_h, builder.grid_w), hull, groups, patterns,
        builder.tile,
    )


def _group_post_program(group, grid_w, viewport, linear_rgb, t_size):
    """One jitted program for a whole group's post-op stage:
    (canvas, pool) -> updated pool.

    Every part's post-op (row gather, span assembly, crop, filter chain,
    re-tiling) plus the final pool scatter is traceable — all layout
    decisions are static host metadata and every primitive is jnp — so the
    entire stage collapses into ONE device dispatch per dependency level.
    icons.svg has 37 filter parts; on the remote-tunnel TPU, per-dispatch
    latency dominates that scene, and fusing parts per level beats one
    program per part (the previous design) both on dispatch count and on
    total remote-compile time.  The program is cached on the group dict, so
    repeated renders of the same lowered plan reuse trace and executable.
    """
    program = group.get("_post_program")
    if program is None:
        import jax

        program = jax.jit(
            lambda canvas, pool: _apply_group_post(
                canvas, pool, group, grid_w, viewport, linear_rgb, t_size
            )
        )
        group["_post_program"] = program
    return program


def _apply_group_post(canvas, pool, group, grid_w, viewport, linear_rgb, t_size,
                      planar: bool = False, return_rows: bool = False):
    """Traceable post-op stage for one group: (canvas, pool) -> pool.

    With return_rows, the level's NEW pool rows are returned directly
    (no dynamic-update-slice into a big pool buffer) — the vpool serving
    program keeps per-level row blocks instead; pool may be None then.

    Single-blur filter parts (the dominant population in filter-heavy
    scenes) execute in a few batched-matmul chunks instead of one op
    chain per part — see ops/filter_batch.  The batch plan is host
    metadata, computed once and cached on the group dict.  With planar,
    `canvas` (and the pool) are channel-planar (N, T, 4T) and the stage
    emits planar rows directly — no per-level layout round trip."""
    import jax.numpy as jnp
    from jax import lax

    from .ops import filter_batch
    from .ops.fused_exec import from_planar, to_planar

    plan = group.get("_blur_batch")
    if plan is None:
        plan = group["_blur_batch"] = filter_batch.plan_level_batches(
            group["parts"], grid_w, viewport, t_size
        )
    chunks, batched = plan

    if os.environ.get("SVGR_ABLATE", "").startswith("nopost"):
        # measurement hook: zero pool rows, no filter/gather work — the
        # serve delta vs this attributes the post-op stage's device time
        is_planar = planar or (pool is not None and pool.ndim == 3)
        shape = ((group["pool_n"], t_size, 4 * t_size) if is_planar
                 else (group["pool_n"], t_size, t_size, 4))
        if return_rows:
            return jnp.zeros(shape, DEVICE_FLOAT)
        return lax.dynamic_update_slice_in_dim(
            pool, jnp.zeros(shape, DEVICE_FLOAT), group["pool_lo"], axis=0
        )

    # _plan_groups numbers each level's pool rows contiguously, so the
    # update is ONE dynamic-update-slice at pool_lo — never a row scatter
    # (a static scatter lowers to a sequential per-row update on TPU;
    # measured ~3.3 ms of icons.svg's 7.2 ms serve)
    lo = group["pool_lo"]
    pos: list = []
    outs: list = []
    for pi, p in enumerate(group["parts"]):
        if pi in batched:
            continue
        if p["post"] is None:
            outs.append(canvas[p["row_start"] : p["row_start"] + p["n_rows"]])
            n = p["n_rows"]
        else:
            # the per-part filter path works on (T, T, 4) tiles; convert
            # only this part's rows (rare: non-separable / multi-primitive
            # chains — the batched chunks cover the dominant population)
            if planar:
                src = from_planar(
                    canvas[p["row_start"] : p["row_start"] + p["n_rows"]]
                )
                out = _apply_part_filter(
                    src, dict(p, row_start=0), grid_w, viewport,
                    linear_rgb, t_size,
                )
                outs.append(to_planar(out))
            else:
                outs.append(_apply_part_filter(
                    canvas, p, grid_w, viewport, linear_rgb, t_size
                ))
            n = len(p["out_tiles"])
        pos.extend(range(p["pool_base"] - lo, p["pool_base"] - lo + n))
    for ck in chunks:
        pos.extend(i - lo for i in ck["pool_idx"])
        outs.append(
            filter_batch.apply_chunk(canvas, ck, t_size, linear_rgb, planar)
        )
    new_rows = jnp.concatenate(outs, axis=0)
    if pos != list(range(len(pos))):
        # batched chunks emit out of pool order: one whole-row permutation
        perm = np.empty(len(pos), np.int64)
        perm[np.asarray(pos)] = np.arange(len(pos))
        new_rows = new_rows[jnp.asarray(perm, jnp.int32)]
    if pool is not None and pool.ndim == 3 and not planar:
        # per-stage callers hand interleaved rows into a planar pool:
        # convert only the level's NEW rows — never the whole pool
        new_rows = new_rows.transpose(0, 1, 3, 2).reshape(
            -1, t_size, 4 * t_size
        )
    if return_rows:
        return new_rows
    if (
        planar
        and os.environ.get("SVGR_POOL_ALIAS", "0") != "0"
    ):
        from .ops.fused_exec import _backend_is_tpu

        if _backend_is_tpu():
            return _pool_update_aliased(pool, new_rows, lo, t_size)
    return lax.dynamic_update_slice_in_dim(pool, new_rows, lo, axis=0)


def _pool_update_aliased(pool, new_rows, lo: int, t_size: int):
    """Pool level-update as an input-output-aliased Pallas row writer.

    XLA cannot prove the level DUS may alias (the old pool value feeds
    the same level's kernels), so it materializes a whole-pool copy per
    level (two copy-done events, ~165 us/frame on the 52-doc atlas's
    68 MB pool).  An explicitly aliased custom call sequences after the
    readers, so the rows land in place; unwritten output blocks keep the
    aliased input's bytes (the same guarantee the fused executor's
    revisited canvas blocks rely on)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .ops.fused_exec import _interpret

    n = new_rows.shape[0]
    T = t_size

    def kern(_pool_ref, rows_ref, out_ref):
        out_ref[...] = rows_ref[...]

    return pl.pallas_call(
        kern,
        grid_spec=pl.GridSpec(
            grid=(n,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec((1, T, 4 * T), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, 4 * T), lambda i: (lo + i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct(pool.shape, pool.dtype),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(pool, new_rows)


def _apply_part_filter(canvas, part, grid_w, viewport, linear_rgb, t_size):
    """Filter post-op for one merged-group part: assemble the pass's rendered
    rows into an image, run the filter chain, re-tile the grown result into
    out_tiles order.  Traceable; see _part_filter_program."""
    import jax.numpy as jnp

    from .core.layer import Layer, merge_at

    flt, transform, content_bbox = part["post"]
    v0, v1 = int(viewport[0]), int(viewport[1])
    src_tiles = part["src_tiles"]
    rows = canvas[part["row_start"] : part["row_start"] + part["n_rows"]]

    # assemble the span of source tiles into one image
    s_rows = [t // grid_w for t in src_tiles]
    s_cols = [t % grid_w for t in src_tiles]
    si0, sj0 = min(s_rows), min(s_cols)
    nsi = max(s_rows) - si0 + 1
    nsj = max(s_cols) - sj0 + 1
    span = jnp.zeros((nsi * nsj, t_size, t_size, 4), DEVICE_FLOAT)
    local = [(r - si0) * nsj + (c - sj0) for r, c in zip(s_rows, s_cols)]
    span = span.at[jnp.asarray(local, jnp.int32)].set(rows)
    image = span.reshape(nsi, nsj, t_size, t_size, 4)
    image = image.transpose(0, 2, 1, 3, 4).reshape(nsi * t_size, nsj * t_size, 4)

    # bbox-tight source crop: the filter sees the same layer origin the
    # reference's interpreter would, so truncation-sensitive placement
    # (blur offsets) matches bit-for-bit
    or_, oc = si0 * t_size, sj0 * t_size  # span origin in canvas pixels
    r0 = max(content_bbox[0] - v0 - or_, 0)
    c0 = max(content_bbox[1] - v1 - oc, 0)
    r1 = min(content_bbox[2] - v0 - or_, nsi * t_size)
    c1 = min(content_bbox[3] - v1 - oc, nsj * t_size)
    crop = image[r0:r1, c0:c1]
    layer = Layer(crop, (v0 + or_ + r0, v1 + oc + c0), pre_alpha=True, linear_rgb=linear_rgb)
    filtered = flt(transform, layer).convert(pre_alpha=True, linear_rgb=linear_rgb)

    out_tiles = part["out_tiles"]
    d_rows = [int(t) // grid_w for t in out_tiles]
    d_cols = [int(t) % grid_w for t in out_tiles]
    di0, dj0 = min(d_rows), min(d_cols)
    dst = jnp.zeros(
        ((max(d_rows) - di0 + 1) * t_size, (max(d_cols) - dj0 + 1) * t_size, 4),
        DEVICE_FLOAT,
    )
    dst = merge_at(dst, filtered.image, (filtered.x - v0 - di0 * t_size, filtered.y - v1 - dj0 * t_size))
    nti = dst.shape[0] // t_size
    ntj = dst.shape[1] // t_size
    tiles = dst.reshape(nti, t_size, ntj, t_size, 4).transpose(0, 2, 1, 3, 4)
    tiles = tiles.reshape(nti * ntj, t_size, t_size, 4)
    local = [(r - di0) * ntj + (c - dj0) for r, c in zip(d_rows, d_cols)]
    return tiles[jnp.asarray(local, jnp.int32)]


def _device_plan(items, bigs, clips, pool, patterns, t_size, num_tiles=None):
    """Host->device conversion of a packed plan, cached on the items dict.

    On the remote-tunnel TPU the upload costs ~70ms for a dense scene —
    an order of magnitude more than the fused render — so repeated
    renders of one plan must not pay it.  Also computes and caches the
    fused-executor capability set (plus its pattern companions); the
    cache is invalidated when SVGR_FUSED changes.  `pool`/`patterns`
    matter only by presence and leading dimension here.
    """
    import os

    import jax.numpy as jnp

    from .ops.fused_exec import plan_features

    mode = (
        os.environ.get("SVGR_FUSED", "")
        + ":" + os.environ.get("SVGR_FUSED_K", "")
        + ":" + os.environ.get("SVGR_PREPASS_K", "")
        + ":" + os.environ.get("SVGR_FUSED_VOUT", "")
        + ":" + os.environ.get("SVGR_VMEM_BUDGET", "")
        + ":" + os.environ.get("SVGR_STATIC_PASSES", "")
        + ":" + os.environ.get("SVGR_WIND_UNROLL", "")
        + ":" + os.environ.get("SVGR_PREPARED", "")
        + ":" + os.environ.get("SVGR_PREGATHER", "")
        + ":" + os.environ.get("SVGR_PREGRAD", "")
        + ":" + os.environ.get("SVGR_FUSED_UNROLL", "")
        + ":" + os.environ.get("SVGR_PRETEX", "")
        + ":" + os.environ.get("SVGR_KVEC", "")
        + ":" + os.environ.get("SVGR_VSTORE", "")
        + ":" + os.environ.get("SVGR_CHUNK_VOUT", "")
        + ":" + os.environ.get("SVGR_ZOUT", "")
        + ":" + os.environ.get("SVGR_KRES", "")
        + ":" + os.environ.get("SVGR_SUBPOOL", "")
        + ":" + os.environ.get("SVGR_VPOOL", "")
        + ":" + os.environ.get("SVGR_KSCAN", "")
        # the prepared tex/mask scratch index is pool.shape[0]: the same
        # plan served with a tight (whole-program) vs pow2 (per-stage)
        # pool capacity must not share a cache entry
        + ":" + str(pool.shape[0] if pool is not None else 0)
    )
    cache = items.get("_device_cache")
    if cache is None or cache["mode"] != mode:
        # prospective sub-pool size: with vpool/subpool on, any fused
        # launch keeps only its referenced rows resident, so the VMEM
        # budget must charge those, not the pool capacity (a 2+ Mpx
        # sprite atlas carries 5-12k pool rows; one launch reads ~1/3)
        sub_count = None
        if pool is not None and (
            os.environ.get("SVGR_VPOOL", "1") == "1"
            or os.environ.get("SVGR_SUBPOOL", "0") == "1"
        ):
            _ti = np.asarray(items["tex_idx"])
            _mi = np.asarray(items["mask_idx"])
            sub_count = len(np.unique(np.concatenate(
                [_ti[_ti >= 0], _mi[_mi >= 0]]
            )))
        features = plan_features(
            items, bigs, clips, pool, patterns, t_size, num_tiles,
            subpool_rows=sub_count,
        )
        # a plan whose canvas exceeds the VMEM budget can split into
        # resident-canvas (vout) launches over tile ranges (SVGR_CHUNK_VOUT
        # opt-in).  Measured NEUTRAL on 3840x3840: the final chunk concat
        # re-pays exactly the membership-select traffic it deletes, and
        # the ring kernel's "zout" (in-kernel zero DMAs + pad-remapped
        # stores) removes that traffic without splitting — kept as a knob
        # for canvases whose single launch cannot fit streams in VMEM.
        vout_chunks = None
        if (
            features is not None and "vout" not in features
            and num_tiles is not None and "pat" not in features
            and os.environ.get("SVGR_CHUNK_VOUT", "0") == "1"
        ):
            vout_chunks = _chunk_fused_plan(
                items, bigs, clips, t_size, num_tiles, for_vout=True
            )
            if vout_chunks is not None:
                features = None  # routes the executors to the chunk path
        host = {k: v for k, v in items.items() if not k.startswith("_")}
        if (
            features is not None and "kvec" in features
            and "vout" in features and num_tiles is not None
        ):
            # cluster tile runs by pass count: the kvec kernel runs every
            # item of a step to the step's max live pass count, so raster
            # order pays 2.5-3.4x the summed passes in padding (see
            # fused_exec.kvec_cluster; z order within a tile is kept)
            from .ops.fused_exec import kvec_cluster

            perm = kvec_cluster(items, num_tiles, t_size)
            if perm is not None:
                n = items["tile_id"].shape[0]
                host = {
                    # "field" is the plan-global stack — its row count can
                    # coincide with n, so exclude it by name, not shape
                    k: (v[perm] if k != "field"
                        and getattr(v, "shape", ())[:1] == (n,) else v)
                    for k, v in host.items()
                }
        pool_sub = None
        if (
            features is not None
            and ("tex" in features or "mask" in features)
            and (
                (os.environ.get("SVGR_SUBPOOL", "0") == "1"
                 and "pretex" not in features)
                # vpool (virtual pool, see _whole_plan fn): EVERY
                # pool-consuming fused launch takes a gathered sub-pool so
                # the big pool buffer never materializes — levels keep
                # their output rows as separate blocks and the per-level
                # whole-pool DUS copy disappears
                or os.environ.get("SVGR_VPOOL", "1") == "1"
            )
        ):
            # launch-local pool (same scheme as _chunk_fused_plan): the
            # kernel's resident operand becomes a gather of just the rows
            # this launch references, so the full pool buffer is no
            # longer a kernel input and XLA may update the per-level
            # pool DUS in place instead of copying the whole pool.
            # NOTE: only the default/serving executors apply the gather;
            # parallel/scene's sharded exec passes the full pool and must
            # not see remapped indices (SVGR_SUBPOOL stays opt-in).
            ti = np.asarray(host["tex_idx"])
            mi = np.asarray(host["mask_idx"])
            rows = np.unique(np.concatenate([ti[ti >= 0], mi[mi >= 0]]))
            if len(rows):
                lut = np.full(int(rows.max()) + 1, -1, np.int32)
                lut[rows] = np.arange(len(rows), dtype=np.int32)
                host = dict(host)
                host["tex_idx"] = np.where(
                    ti >= 0, lut[np.maximum(ti, 0)], ti
                ).astype(ti.dtype)
                host["mask_idx"] = np.where(
                    mi >= 0, lut[np.maximum(mi, 0)], mi
                ).astype(mi.dtype)
                pool_sub = rows.astype(np.int32)
        dev = {k: jnp.asarray(v) for k, v in host.items()}
        if features is not None and "pat" in features:
            from .ops.fused_exec import pattern_rows

            rows, pos = pattern_rows(items)
            dev["pat_rows"] = jnp.asarray(rows)
            dev["pat_pos"] = jnp.asarray(pos)
        cache = {
            "mode": mode,
            "items": dev,
            "bigs": tuple(jnp.asarray(b) for b in bigs),
            "clips": jnp.asarray(clips) if clips.shape[0] else None,
            "features": features,
            "pool_rows": jnp.asarray(pool_sub) if pool_sub is not None else None,
            "pool_rows_np": pool_sub,  # host copy: vpool block slicing
        }
        if features is not None and os.environ.get("SVGR_PREPARED") != "0":
            # scene-static fused prep (lane-broadcast winding params +
            # pre-pass winding stacks) computed ONCE per plan: every
            # subsequent frame starts at the kernel instead of re-paying
            # ~T x the compact edge bytes in expansion traffic per call
            from .ops.fused_exec import prepare_fused_cached

            cache["prepared"] = prepare_fused_cached(
                dev, t_size, cache["bigs"], cache["clips"],
                jnp.asarray(patterns)
                if (patterns is not None and "pat" in features) else None,
                features,
                pool_rows=(
                    int(pool_sub.shape[0]) if pool_sub is not None
                    else pool.shape[0] if pool is not None else 0
                ),
                num_tiles=num_tiles or 0,
            )
        if vout_chunks is not None:
            cache["chunks"] = vout_chunks
        elif features is None and num_tiles is not None:
            from .ops.fused_exec import last_fallback_kind

            if last_fallback_kind() == "vmem":
                cache["chunks"] = _chunk_fused_plan(
                    items, bigs, clips, t_size, num_tiles
                )
        items["_device_cache"] = cache
    return cache


def _chunk_fused_plan(items, bigs, clips, t_size, num_tiles, for_vout=False):
    """Host: partition the tile range into chunks whose referenced stacks
    fit the fused executor's VMEM budget.

    A plan whose big/clip/pool stacks exceed the resident budget used to
    fall back to the XLA executor wholesale; tile runs are independent
    (z-order is per tile), so instead the item stream splits at tile
    boundaries into several fused launches, each with only the stack rows
    its own items reference (indices remapped chunk-locally).  Returns a
    list of chunk dicts, or None when chunking does not apply (pattern
    paints, or a single tile alone over budget).

    for_vout additionally budgets each chunk's CANVAS so every chunk
    qualifies for the VMEM-resident (vout) kernel: a plan whose whole
    canvas exceeds the budget runs the ring-flush kernel plus a
    whole-canvas membership select (untouched rows hold garbage), ~0.7 ms
    of pure HBM traffic at 3840x3840.  Chunk tile ranges then span only
    [first touched, last touched] and untouched gaps between chunks are
    emitted as {"zero_rows": n} entries the executors materialize as
    zeros directly.
    """
    from .ops.fused_exec import (
        canvas_bytes, plan_features, pregather, stack_bytes, vmem_budget,
    )
    from .parallel.scene import _flatten_big_classes

    if (items["pat_idx"] >= 0).any():
        return None
    tile_id = items["tile_id"]
    n_real = int((tile_id < num_tiles).sum())
    if n_real == 0:
        return None
    budget = vmem_budget()
    flat_big = _flatten_big_classes(bigs)
    # under pregather the big/clip fields stream as per-item blocks
    # instead of resident stacks — mirror plan_features' accounting or
    # the walk splits far earlier than the kernel requires
    pre = pregather()

    # walk tile runs, greedily accumulating referenced stack rows
    run_starts = np.concatenate(
        [[0], 1 + np.nonzero(np.diff(tile_id[:n_real]))[0], [n_real]]
    )
    chunks_ix: list = []  # (i0, i1, t0, t1)
    cur_i0 = 0
    cur_t0 = 0 if not for_vout else int(tile_id[0])
    cur_big: set = set()
    cur_clip: set = set()
    cur_pool: set = set()

    def cost(t_hi=None):
        rows = 0 if pre else len(cur_big) + len(cur_clip)
        sb = stack_bytes(rows + 2, len(cur_pool), t_size)
        if for_vout and t_hi is not None:
            sb += canvas_bytes(t_hi - cur_t0, t_size)
        return sb

    for r in range(len(run_starts) - 1):
        i0, i1 = int(run_starts[r]), int(run_starts[r + 1])
        nb = set(items["big_idx"][i0:i1][items["big_idx"][i0:i1] >= 0].tolist())
        nc = set(items["clip_idx"][i0:i1][items["clip_idx"][i0:i1] >= 0].tolist())
        np_ = set(items["tex_idx"][i0:i1][items["tex_idx"][i0:i1] >= 0].tolist())
        np_ |= set(items["mask_idx"][i0:i1][items["mask_idx"][i0:i1] >= 0].tolist())
        trial = stack_bytes(
            (0 if pre else len(cur_big | nb) + len(cur_clip | nc)) + 2,
            len(cur_pool | np_), t_size,
        )
        if for_vout:
            trial += canvas_bytes(int(tile_id[i1 - 1]) + 1 - cur_t0, t_size)
        if trial > budget and i0 > cur_i0:
            # close the chunk at its own last touched tile when canvases
            # count: untouched tiles between chunks become zero entries
            t1 = int(tile_id[i0 - 1]) + 1 if for_vout else int(tile_id[i0])
            chunks_ix.append((cur_i0, i0, cur_t0, t1))
            cur_i0, cur_t0 = i0, int(tile_id[i0])
            cur_big, cur_clip, cur_pool = nb, nc, np_
            if cost(int(tile_id[i1 - 1]) + 1) > budget:
                return None  # one tile run alone exceeds the budget
        else:
            cur_big |= nb
            cur_clip |= nc
            cur_pool |= np_
    chunks_ix.append((
        cur_i0, n_real, cur_t0,
        int(tile_id[n_real - 1]) + 1 if for_vout else num_tiles,
    ))
    if len(chunks_ix) < 2:
        return None

    import jax.numpy as jnp

    chunks = []
    next_t0 = 0  # first canvas row not yet covered (for_vout gap tracking)
    for i0, i1, t0, t1 in chunks_ix:
        if for_vout and t0 > next_t0:
            chunks.append({"zero_rows": t0 - next_t0})
        next_t0 = t1
        cnt = i1 - i0
        npad = 16
        while npad < cnt:
            npad *= 2
        sub = {}
        for k, v in items.items():
            if k.startswith("_") or k == "field":
                continue
            arr = np.zeros((npad, *v.shape[1:]), v.dtype)
            arr[:cnt] = v[i0:i1]
            sub[k] = arr
        # the collapse field stack subselects per chunk below (a 3840^2
        # plan's full stack is ~134 MB; attaching it to every chunk
        # multiplied that by the chunk count)
        chunk_tiles = t1 - t0
        sub["tile_id"][:cnt] -= t0
        sub["tile_id"][cnt:] = chunk_tiles
        sub["stop_offsets"][cnt:] = 1.0
        for key in ("big_idx", "clip_idx", "tex_idx", "mask_idx", "pat_idx"):
            sub[key][cnt:] = -1
        if "field_idx" in sub:
            sub["field_idx"][cnt:] = -1

        def remap(idx_key, rows_all):
            rows = np.unique(sub[idx_key][:cnt][sub[idx_key][:cnt] >= 0])
            lut = np.full(rows_all + 1, -1, np.int32)
            lut[rows] = np.arange(len(rows), dtype=np.int32)
            col = sub[idx_key]
            sub[idx_key] = lut[np.where(col >= 0, col, rows_all)]
            return rows

        big_rows = remap("big_idx", flat_big.shape[0]) if flat_big.shape[0] else np.zeros(0, np.int64)
        clip_rows = remap("clip_idx", clips.shape[0]) if clips.shape[0] else np.zeros(0, np.int64)
        pool_rows = np.unique(np.concatenate([
            sub["tex_idx"][:cnt][sub["tex_idx"][:cnt] >= 0],
            sub["mask_idx"][:cnt][sub["mask_idx"][:cnt] >= 0],
        ]))
        if len(pool_rows):
            cap = int(pool_rows.max()) + 1
            lut = np.full(cap + 1, -1, np.int32)
            lut[pool_rows] = np.arange(len(pool_rows), dtype=np.int32)
            for key in ("tex_idx", "mask_idx"):
                col = sub[key]
                sub[key] = lut[np.where(col >= 0, np.minimum(col, cap), cap)]

        if "field" in items:
            f_rows = remap("field_idx", items["field"].shape[0])
            f_pad = 8
            while f_pad < max(len(f_rows), 1):
                f_pad *= 2
            stack = np.zeros(
                (f_pad, *items["field"].shape[1:]), items["field"].dtype
            )
            if len(f_rows):
                stack[: len(f_rows)] = np.asarray(items["field"])[f_rows]
            sub["field"] = stack

        sub_big = flat_big[big_rows] if len(big_rows) else np.zeros((0, 0, 4), DEVICE_FLOAT)
        sub_clips = (
            clips[clip_rows] if len(clip_rows)
            else np.zeros((0, t_size, t_size), DEVICE_FLOAT)
        )
        features = plan_features(
            sub, (sub_big,) if sub_big.shape[0] else (),
            sub_clips if sub_clips.shape[0] else None,
            _PoolShape(len(pool_rows)) if len(pool_rows) else None,
            None, t_size, chunk_tiles,
        )
        if for_vout and (features is None or "vout" not in features):
            # only worth adopting when every launch gets the resident-
            # canvas kernel — a ring chunk would re-pay the membership
            # select; bail before any device prep work
            return None
        chunk = {
            "items": {k: jnp.asarray(v) for k, v in sub.items()},
            "bigs": (jnp.asarray(sub_big),) if sub_big.shape[0] else (),
            "clips": jnp.asarray(sub_clips) if sub_clips.shape[0] else None,
            "pool_rows": jnp.asarray(pool_rows.astype(np.int32)) if len(pool_rows) else None,
            "num_tiles": chunk_tiles,
            "features": features,
            "n_items": cnt,
        }
        if features is not None and os.environ.get("SVGR_PREPARED") != "0":
            from .ops.fused_exec import prepare_fused_cached

            chunk["prepared"] = prepare_fused_cached(
                chunk["items"], t_size, chunk["bigs"], chunk["clips"],
                None, features, pool_rows=len(pool_rows),
                num_tiles=chunk_tiles,
            )
        chunks.append(chunk)
    if for_vout and next_t0 < num_tiles:
        chunks.append({"zero_rows": num_tiles - next_t0})
    return chunks


def _default_exec(items, bigs, clips, num_tiles, pool, patterns, t_size):
    """Single-device plan executor (one jitted program).

    On TPU, plans run through the fully-fused Pallas executor
    (ops/fused_exec.py) when _device_plan's capability set allows it;
    plans whose stacks exceed the VMEM budget run as several fused
    launches over tile ranges (_chunk_fused_plan) before falling back to
    the XLA executor.
    """
    import jax.numpy as jnp

    cache = _device_plan(items, bigs, clips, pool, patterns, t_size, num_tiles)
    if cache["features"] is None and cache.get("chunks"):
        # ONE jitted program for all chunk launches: eagerly the 4-6
        # per-chunk dispatches through a remote-tunnel TPU cost several
        # ms each and drown the kernels (measured 8x on 3840x3840)
        chunks = cache["chunks"]
        prog = cache.get("_chunks_prog")
        if prog is None:
            import jax

            def chunks_fn(chunk_ops, pool):
                canvases = []
                live = iter(chunk_ops)
                for ch in chunks:
                    if "zero_rows" in ch:
                        canvases.append(jnp.zeros(
                            (ch["zero_rows"], t_size, t_size, 4), DEVICE_FLOAT
                        ))
                        continue
                    c_items, c_prep = next(live)
                    sub_pool = (
                        pool[ch["pool_rows"]]
                        if (pool is not None and ch["pool_rows"] is not None)
                        else None
                    )
                    canvases.append(batch_exec.execute_plan(
                        c_items, t_size, ch["num_tiles"], ch["bigs"],
                        sub_pool, None, ch["clips"], features=ch["features"],
                        prepared=c_prep,
                    ))
                return jnp.concatenate(canvases, axis=0)

            prog = jax.jit(chunks_fn)
            cache["_chunks_prog"] = prog
        chunk_ops = [
            (ch["items"], ch.get("prepared"))
            for ch in chunks if "zero_rows" not in ch
        ]
        return prog(chunk_ops, pool)
    if (
        pool is not None and cache.get("pool_rows") is not None
        and cache["features"] is not None
    ):
        # launch-local pool (indices in cache["items"] are remapped);
        # pretex launches skip the scratch row (misses remap to row 0
        # at prep, see fused_exec.prepare_fused)
        if pool.ndim != 3:
            pool = pool[cache["pool_rows"]]
        elif "pretex" in cache["features"]:
            pool = pool[cache["pool_rows"]]
        else:
            pool = jnp.concatenate(
                [pool[cache["pool_rows"]], pool[-1:]], axis=0
            )
    return batch_exec.execute_plan(
        cache["items"],
        t_size,
        num_tiles,
        cache["bigs"],
        pool,
        patterns,
        cache["clips"],
        features=cache["features"],
        prepared=cache.get("prepared"),
    )


def execute_lowered(
    lowered, viewport=(0, 0), linear_rgb: bool = False, t_size: int = None,
    exec_fn=None, whole: bool | None = None, planar: bool = False,
):
    """Execute a lowered plan: merged isolation-pass groups (with any post-op
    filters) in level order, then the main stream referencing the pool.

    exec_fn(items, bigs, clips, num_tiles, pool, patterns, t_size) -> canvas
    overrides the plan executor — parallel/scene.py supplies a mesh-sharded
    one; the default runs one device program per group.

    planar returns the canvas channel-planar (num_tiles, T, 4T) — the
    whole-plan program's native layout, so serving callers that fold the
    de-planarization into their own image assembly skip a canvas copy.
    """
    import os

    import jax.numpy as jnp

    from .ops.fused_exec import from_planar, to_planar

    t_size = t_size or lowered.tile
    grid_h, grid_w = lowered.grid
    groups = lowered.groups
    num_tiles = grid_h * grid_w
    # whole-plan fusion trades per-scene compile time for dispatch count:
    # the single program's signature is scene-specific, so one-shot renders
    # (CLI) keep the per-stage programs whose shape buckets recompile far
    # less across scenes; serving (CompiledScene) opts in.
    env_whole = os.environ.get("SVGR_WHOLE", "")
    if whole is None:
        whole = env_whole == "1"
    if exec_fn is None and whole and env_whole != "0":
        out = _whole_plan_program(lowered, viewport, linear_rgb, t_size)()
        return out if planar else from_planar(out)
    atlas = jnp.asarray(lowered.patterns) if lowered.patterns is not None else None
    run = exec_fn or _default_exec

    # the pool is preallocated at power-of-two capacity so its shape (part of
    # every downstream program's signature) stays stable across scenes
    pool = None
    if groups:
        total = max(p["pool_base"] + len(p["out_tiles"]) for g in groups for p in g["parts"])
        cap = 16
        while cap < total:
            cap *= 2
        pool = jnp.zeros((cap, t_size, t_size, 4), DEVICE_FLOAT)

    for g in groups:
        canvas = run(
            g["items"],
            g["bigs"],
            g["clips"],
            g["rows"],
            pool if g["needs_pool"] else None,
            atlas if bool((g["items"]["pat_idx"] >= 0).any()) else None,
            t_size,
        )
        pool = _group_post_program(g, grid_w, viewport, linear_rgb, t_size)(canvas, pool)
    tiles = run(
        lowered.items,
        lowered.bigs,
        lowered.clips,
        num_tiles,
        pool,
        atlas if bool((lowered.items["pat_idx"] >= 0).any()) else None,
        t_size,
    )
    return to_planar(tiles) if planar else tiles


def _pool_capacity(groups, tight: bool = False) -> int:
    """Pool row capacity: pow2-bucketed for shape-stable per-stage
    programs, or (tight) rounded to the next multiple of 16 for the
    scene-specific whole-plan program."""
    total = max(p["pool_base"] + len(p["out_tiles"]) for g in groups for p in g["parts"])
    if tight:
        return max(-(-total // 16) * 16, 16)
    cap = 16
    while cap < total:
        cap *= 2
    return cap


class _PoolShape:
    """Stand-in with just a .shape for plan_features' pool-presence tests."""

    def __init__(self, cap: int):
        self.shape = (cap,)


def _whole_plan_program(lowered, viewport, linear_rgb, t_size):
    """ONE jitted program for an entire multi-pass plan.

    Every group run, its filter post-op stage, and the final main-stream
    run trace into a single device program (the per-stage programs remain
    for pluggable exec_fns).  On the remote-tunnel TPU, per-dispatch
    latency makes this worth ~2x on filter-heavy scenes: icons.svg goes
    from ~8 dispatches to 1.  Program + device operands are cached on the
    plan; the cache key tracks viewport/colorspace/tile/SVGR_FUSED.
    """
    import jax

    key = (tuple(viewport), bool(linear_rgb), t_size, _whole_mode_key())
    cached = lowered.items.get("_whole_program")
    if cached is not None and cached[0] == key:
        program, operands = cached[1], cached[2]
        return lambda: program(operands)

    fn, operands = _whole_plan_build(lowered, viewport, linear_rgb, t_size)
    program = jax.jit(fn)
    lowered.items["_whole_program"] = (key, lambda ops: program(*ops), operands)
    prog = lowered.items["_whole_program"]
    return lambda: prog[1](prog[2])


def _whole_plan_build(lowered, viewport, linear_rgb, t_size):
    """(fn, operands) for the whole-plan program: fn(g_ops, main_ops,
    atlas) traces every stage of the plan; operands are the scene-static
    device arrays passed as program arguments (embedding them as closure
    constants would bloat the executable and the persistent cache)."""
    import os

    import jax
    import jax.numpy as jnp

    from .ops import batch_exec
    from .ops.fused_exec import execute_items_fused, to_planar

    grid_h, grid_w = lowered.grid
    num_tiles = grid_h * grid_w
    groups = lowered.groups
    # the whole-plan program's signature is scene-specific anyway, so the
    # pool skips the cross-scene pow2 bucketing: a tight cap halves the
    # per-level dynamic-update-slice traffic on filter-heavy scenes
    # (icons.svg: 1100 rows used vs 2048 pow2-padded)
    cap = _pool_capacity(groups, tight=True) if groups else 0
    pool_probe = _PoolShape(cap)
    atlas_np = lowered.patterns

    g_caches = []
    for g in groups:
        has_pat = bool((g["items"]["pat_idx"] >= 0).any())
        g_caches.append(
            _device_plan(
                g["items"], g["bigs"], g["clips"],
                pool_probe if g["needs_pool"] else None,
                atlas_np if has_pat else None, t_size, g["rows"],
            )
        )
    main_pat = bool((lowered.items["pat_idx"] >= 0).any())
    main_cache = _device_plan(
        lowered.items, lowered.bigs, lowered.clips,
        pool_probe if groups else None, atlas_np if main_pat else None,
        t_size, num_tiles,
    )

    def _run(cache, ops, rows, pool, patterns, pool_is_sub=False):
        # every stage canvas stays channel-planar (N, T, 4T): the fused
        # kernel's native output layout, consumed as-is by the filter
        # batches and the pool — one whole-canvas shuffle copy per launch
        # (icons.svg: 5) drops to zero; callers de-planarize once at the end
        if cache.get("chunks"):
            # over-budget canvas split into resident-canvas launches over
            # tile ranges; untouched gaps materialize as zeros directly
            parts = []
            live = iter(ops["chunks"])
            for ch in cache["chunks"]:
                if "zero_rows" in ch:
                    parts.append(jnp.zeros(
                        (ch["zero_rows"], t_size, 4 * t_size), DEVICE_FLOAT
                    ))
                    continue
                c_items, c_prep = next(live)
                sub_pool = None
                if pool is not None and ch["pool_rows"] is not None:
                    # chunk-local pool: referenced rows + the scratch row
                    # (pretex chunks skip it — misses remap to row 0)
                    if "pretex" in (ch["features"] or ()):
                        sub_pool = pool[ch["pool_rows"]]
                    else:
                        sub_pool = jnp.concatenate(
                            [pool[ch["pool_rows"]], pool[-1:]], axis=0
                        )
                parts.append(execute_items_fused(
                    c_items, t_size, ch["num_tiles"], ch["bigs"], sub_pool,
                    None, ch["clips"], ch["features"], prepared=c_prep,
                    planar_out=True,
                ))
            return jnp.concatenate(parts, axis=0)
        if cache["features"] is not None:
            if (pool is not None and cache.get("pool_rows") is not None
                    and not pool_is_sub):
                # launch-local pool: referenced rows + the scratch row
                # (frees the full pool buffer for in-place level updates);
                # pretex misses remap to row 0 so no scratch needed
                if "pretex" in cache["features"]:
                    pool = pool[cache["pool_rows"]]
                else:
                    pool = jnp.concatenate(
                        [pool[cache["pool_rows"]], pool[-1:]], axis=0
                    )
            return execute_items_fused(
                ops["items"], t_size, rows, cache["bigs"], pool, patterns,
                cache["clips"], cache["features"], prepared=ops["prepared"],
                planar_out=True,
            )
        return to_planar(batch_exec.execute_items(
            ops["items"], t_size, rows, cache["bigs"], pool, patterns,
            cache["clips"],
        ))

    def _cache_ops(cache):
        # the scene-static device arrays enter as PROGRAM ARGUMENTS (see
        # fn below) — per chunk when the cache is a chunked plan
        if cache.get("chunks"):
            return {"chunks": [
                (ch["items"], ch.get("prepared"))
                for ch in cache["chunks"] if "zero_rows" not in ch
            ]}
        return {"items": cache["items"], "prepared": cache.get("prepared")}

    def _stage_vpool_ok(g_needs_pool, cache):
        if not g_needs_pool:
            return True
        f = cache["features"]
        if f is None or cache.get("chunks"):
            return False
        if "tex" not in f and "mask" not in f:
            return True  # receives the pool but never reads it
        return cache.get("pool_rows_np") is not None

    # vpool: the big pool buffer never materializes — each level keeps its
    # output rows as a separate block and every pool-consuming launch takes
    # a gathered sub-pool assembled from the blocks.  This deletes the
    # per-level whole-pool dynamic-update-slice, whose copy triple
    # re-materialized the 16.6 MB icons.svg pool ~3x per serve (XLA will
    # not alias the DUS around the kernel custom-calls).
    use_vpool = bool(
        groups
        and os.environ.get("SVGR_VPOOL", "1") == "1"
        and all(
            _stage_vpool_ok(g["needs_pool"], gc)
            for g, gc in zip(groups, g_caches)
        )
        and _stage_vpool_ok(True, main_cache)
    )

    def _vpool_gather(blocks, rows_np, scratch=True):
        """Sub-pool for one launch: the launch's referenced rows sliced
        out of the emission-ordered level blocks, + the scratch row
        (skipped for pretex launches, whose misses remap to row 0)."""
        parts = []
        for lo, n, arr in blocks:
            sel = rows_np[(rows_np >= lo) & (rows_np < lo + n)] - lo
            if not len(sel):
                continue
            if sel[-1] - sel[0] + 1 == len(sel):
                parts.append(arr[int(sel[0]):int(sel[-1]) + 1])
            else:
                parts.append(arr[jnp.asarray(sel, jnp.int32)])
        if scratch or not parts:
            parts.append(jnp.zeros((1, t_size, 4 * t_size), DEVICE_FLOAT))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    # the scene-static prepared arrays (expanded winding params, pre-pass
    # winding stacks) enter as PROGRAM ARGUMENTS, not closure captures —
    # captured concrete arrays would be embedded in the executable as
    # constants (100+ MB programs, useless persistent-cache entries)
    def fn(g_ops, main_ops, atlas):
        if use_vpool:
            blocks: list = []  # (pool_lo, n_rows, planar rows)

            def sub_pool(cache, needs):
                if not needs or cache.get("pool_rows_np") is None:
                    return None
                f = cache["features"]
                return _vpool_gather(
                    blocks, cache["pool_rows_np"],
                    scratch=not (f is not None and "pretex" in f),
                )

            for g, gc, ops in zip(groups, g_caches, g_ops):
                canvas = _run(
                    gc, ops, g["rows"], sub_pool(gc, g["needs_pool"]),
                    atlas if bool((g["items"]["pat_idx"] >= 0).any()) else None,
                    pool_is_sub=True,
                )
                rows_new = _apply_group_post(
                    canvas, None, g, grid_w, viewport, linear_rgb, t_size,
                    planar=True, return_rows=True,
                )
                blocks.append((g["pool_lo"], g["pool_n"], rows_new))
            return _run(main_cache, main_ops, num_tiles,
                        sub_pool(main_cache, True),
                        atlas if main_pat else None, pool_is_sub=True)
        # channel-planar pool (+1 trailing scratch row for idx == -1
        # gathers) end-to-end: the executors consume it as-is instead of
        # paying a whole-pool concatenate + layout transpose per launch
        pool = (
            jnp.zeros((cap + 1, t_size, 4 * t_size), DEVICE_FLOAT)
            if groups else None
        )
        for g, gc, ops in zip(groups, g_caches, g_ops):
            canvas = _run(
                gc, ops, g["rows"],
                pool if g["needs_pool"] else None,
                atlas if bool((g["items"]["pat_idx"] >= 0).any()) else None,
            )
            pool = _apply_group_post(
                canvas, pool, g, grid_w, viewport, linear_rgb, t_size,
                planar=True,
            )
        return _run(main_cache, main_ops, num_tiles, pool,
                    atlas if main_pat else None)

    operands = (
        [_cache_ops(gc) for gc in g_caches],
        _cache_ops(main_cache),
        jnp.asarray(atlas_np) if atlas_np is not None else None,
    )
    return fn, operands


def _perturb_ops(ops, carry):
    """Stage operands with a zero-valued data dependency on `carry` mixed
    into one float array per launch — serializes fori_loop iterations of
    the whole-plan program without changing any value (x + 0.0 == x)."""
    def _one(items, prep):
        if prep is not None and "fpar" in prep:
            prep = dict(prep)
            prep["fpar"] = prep["fpar"] + carry
        else:
            items = dict(items)
            items["opacity"] = items["opacity"] + carry
        return items, prep

    ops = dict(ops)
    if ops.get("chunks") is not None:
        ops["chunks"] = [_one(ci, cp) for ci, cp in ops["chunks"]]
        return ops
    items, prep = _one(ops["items"], ops.get("prepared"))
    ops["items"] = items
    if prep is not None:
        ops["prepared"] = prep
    return ops


def _whole_plan_many_program(lowered, viewport, linear_rgb, t_size):
    """k-frame serving program: the whole plan re-rendered `iters` times
    inside ONE jitted fori_loop (each iteration data-depends on the last
    frame through a zero-valued perturbation, so XLA cannot collapse or
    hoist stages), returning the final frame's planar tiles.

    On the remote tunnel a serve call pays 0.25-0.8 ms of per-dispatch
    latency per frame (weather-dependent); chaining k frames in-program
    amortizes that to one dispatch — CompiledScene.render_many(k) makes
    serving throughput device-bound.  `iters` is a traced scalar, so one
    compiled program serves every k.
    """
    import jax
    import jax.numpy as jnp

    grid_h, grid_w = lowered.grid
    num_tiles = grid_h * grid_w
    key = (tuple(viewport), bool(linear_rgb), t_size, _whole_mode_key())
    cached = lowered.items.get("_whole_many")
    if cached is not None and cached[0] == key:
        return lambda k: cached[1](cached[2], k)

    fn, operands = _whole_plan_build(lowered, viewport, linear_rgb, t_size)

    def fn_many(g_ops, main_ops, atlas, iters):
        def body(_i, prev):
            carry = prev[0, 0, 0] * 0.0
            g2 = [_perturb_ops(o, carry) for o in g_ops]
            m2 = _perturb_ops(main_ops, carry)
            return fn(g2, m2, atlas)

        init = jnp.zeros((num_tiles, t_size, 4 * t_size), DEVICE_FLOAT)
        return jax.lax.fori_loop(0, iters, body, init)

    program = jax.jit(fn_many)
    lowered.items["_whole_many"] = (
        key,
        lambda ops, k: program(*ops, jnp.int32(k)),
        operands,
    )
    cached = lowered.items["_whole_many"]
    return lambda k: cached[1](cached[2], k)


def _whole_mode_key() -> str:
    import os

    return ":".join(
        os.environ.get(v, "")
        for v in ("SVGR_FUSED", "SVGR_FUSED_K", "SVGR_PREPASS_K",
                  "SVGR_FUSED_VOUT", "SVGR_VMEM_BUDGET",
                  "SVGR_STATIC_PASSES", "SVGR_WIND_UNROLL",
                  "SVGR_PREPARED", "SVGR_PREGATHER", "SVGR_SOLID_SKIP",
                  "SVGR_SGUARD", "SVGR_PREGRAD", "SVGR_ABLATE",
                  "SVGR_FUSED_UNROLL", "SVGR_PRETEX", "SVGR_KVEC",
                  "SVGR_VSTORE", "SVGR_CHUNK_VOUT", "SVGR_ZOUT",
                  "SVGR_KRES", "SVGR_SUBPOOL", "SVGR_CHUNK_FOLD",
                  "SVGR_KSCAN")
    )


def render_fast(scene, transform: Transform, viewport, linear_rgb: bool = False):
    """Whole-scene batched render; returns (Layer, hull) or None if unsupported."""
    lowered = lower_scene(scene, transform, viewport, linear_rgb)
    if lowered is None:
        return None
    grid_h, grid_w = lowered.grid
    hull = lowered.hull
    t = lowered.tile
    tiles = execute_lowered(lowered, viewport[:2], linear_rgb)
    canvas = tiles.reshape(grid_h, grid_w, t, t, 4)
    canvas = canvas.transpose(0, 2, 1, 3, 4).reshape(grid_h * t, grid_w * t, 4)
    v0, v1, h, w = viewport
    layer = Layer(
        canvas[: int(h), : int(w)], (int(v0), int(v1)), pre_alpha=True, linear_rgb=linear_rgb
    )
    return layer, hull


class CompiledScene:
    """A scene lowered once and rendered many times (the serving path).

    Wraps a Lowered plan; repeated .render() calls reuse the packed host
    arrays, every compiled device program (including per-part filter
    programs), and — with a mesh — the sharded executor.  Use for
    animation/serving loops where per-frame lowering would dominate.
    """

    def __init__(self, lowered, viewport, linear_rgb: bool, mesh=None):
        self._lowered = lowered
        self._viewport = viewport
        self._linear_rgb = linear_rgb
        if mesh is not None:
            from .parallel.scene import sharded_exec_fn

            self._exec_fn = sharded_exec_fn(mesh)
        else:
            self._exec_fn = None

    @property
    def tile(self) -> int:
        return self._lowered.tile

    @property
    def hull(self):
        return self._lowered.hull

    def render_tiles(self):
        """Raw canvas tiles (num_tiles, T, T, 4), premultiplied."""
        return execute_lowered(
            self._lowered, self._viewport[:2], self._linear_rgb,
            exec_fn=self._exec_fn,
            # serving renders one plan many times: the whole-plan single
            # program amortizes its scene-specific compile immediately
            whole=self._exec_fn is None,
        )

    def render_tiles_planar(self):
        """Raw canvas tiles, channel-planar (num_tiles, T, 4T) — the
        executor's native layout (no de-planarizing canvas copy)."""
        return execute_lowered(
            self._lowered, self._viewport[:2], self._linear_rgb,
            exec_fn=self._exec_fn, whole=self._exec_fn is None, planar=True,
        )

    def render_tiles_many(self, k: int):
        """k frames chained in ONE device program; returns the final
        frame's planar tiles (num_tiles, T, 4T).

        Each serve call pays the wire's per-dispatch latency (0.25-0.8 ms
        on the remote tunnel, weather-dependent); chaining k frames in a
        single jitted fori_loop amortizes that to one dispatch, making
        throughput device-bound.  Iterations are serialized by a
        zero-valued data dependency on the previous frame, so XLA renders
        all k (values are unchanged: x + 0.0).  `k` is a traced scalar —
        one compiled program serves every k.  Single-device plans only
        (mesh serving dispatches per stage already).
        """
        if self._exec_fn is not None:
            raise ValueError("render_tiles_many: single-device plans only")
        run = _whole_plan_many_program(
            self._lowered, self._viewport, self._linear_rgb,
            self._lowered.tile,
        )
        return run(int(k))

    def render_many(self, k: int) -> Layer:
        """k frames in one dispatch; the final frame as a Layer."""
        grid_h, grid_w = self._lowered.grid
        t = self._lowered.tile
        tiles = self.render_tiles_many(k)
        canvas = tiles.reshape(grid_h, grid_w, t, 4, t)
        canvas = canvas.transpose(0, 2, 1, 4, 3).reshape(grid_h * t, grid_w * t, 4)
        v0, v1, h, w = self._viewport
        return Layer(
            canvas[: int(h), : int(w)], (int(v0), int(v1)),
            pre_alpha=True, linear_rgb=self._linear_rgb,
        )

    def render(self) -> Layer:
        """Viewport-sized premultiplied Layer."""
        grid_h, grid_w = self._lowered.grid
        t = self._lowered.tile
        # consume the planar layout directly: the tile->image shuffle has
        # to run anyway, so de-planarization rides it for free
        tiles = self.render_tiles_planar()
        canvas = tiles.reshape(grid_h, grid_w, t, 4, t)
        canvas = canvas.transpose(0, 2, 1, 4, 3).reshape(grid_h * t, grid_w * t, 4)
        v0, v1, h, w = self._viewport
        return Layer(
            canvas[: int(h), : int(w)], (int(v0), int(v1)),
            pre_alpha=True, linear_rgb=self._linear_rgb,
        )


def raw_tile_upgrade(lowered, scene, transform, viewport, linear_rgb):
    """Re-lower a qualifying plan at tile 64 for RAW fused-executor loops.

    The static-run collapse inverted the tile sweep for single-pass
    plans: fewer, fatter items make the per-item pixel area cheap, so the
    1488² material-design plan's raw fused executor measured 6.4 Gpx/s at
    tile 32 vs 11.2 Gpx/s at tile 64 (v5e, 2026-08-20 refined A/B).  The
    upgrade only fires for pass-free plans on >=1 Mpx canvases — and is
    NOT applied by compile_scene: multi-pass plans move the other way at
    64 (4x pool rows blow the fused VMEM budget; icons serve 1.5 -> 12 ms
    measured), and even the pass-free material WHOLE-PLAN serving program
    measured 4.0 ms/call at 64 vs 0.58 at 32 — the serving glue around
    the kernel does not inherit the raw kernel's tile-64 win (untraced;
    see CLAUDE.md round-4 notes).

    `viewport` is (row0, col0, height, width) — the >=1 Mpx gate reads
    viewport[2] * viewport[3].
    """
    h, w = viewport[2], viewport[3]
    if (
        lowered is None or lowered.groups or lowered.tile != 32
        or os.environ.get("SVGR_TILE")
        or int(h) * int(w) < 1_000_000
    ):
        return lowered
    up = lower_scene(scene, transform, viewport, linear_rgb, tile=64)
    return up if up is not None and not up.groups else lowered


def compile_scene(scene, transform: Transform, viewport, linear_rgb: bool = False,
                  mesh=None, tile: int = None):
    """Lower a scene once for repeated rendering; None if unsupported."""
    lowered = lower_scene(scene, transform, viewport, linear_rgb, tile)
    if lowered is None:
        return None
    return CompiledScene(lowered, viewport, linear_rgb, mesh)


def can_lower(scene, linear_rgb: bool, in_clip: bool = False) -> bool:
    """Cheap structural predicate: would lower_scene accept this subtree?

    Mirrors _collect_draws / _paint_params / _clip_parts checks without
    touching geometry, so the hybrid group renderer can partition children
    into batchable runs in O(nodes).
    """
    kind, args = scene
    if kind in (RENDER_FILL, RENDER_STROKE):
        paint = args[1]
        if paint is None:
            return True
        if isinstance(paint, np.ndarray):
            return True
        if isinstance(paint, (GradLinear, GradRadial)):
            if paint.linear_rgb is not None and paint.linear_rgb != linear_rgb:
                return False
            return len(paint.stops) <= MAX_STOPS
        if isinstance(paint, Pattern):
            # the tile is rendered through the interpreter at lowering time,
            # so any pattern content batches
            return True
        return False
    if kind == RENDER_GROUP:
        return all(can_lower(c, linear_rgb, in_clip) for c in args)
    if kind == RENDER_TRANSFORM:
        return can_lower(args[0], linear_rgb, in_clip)
    if kind == RENDER_OPACITY:
        # single draws fold; groups become isolation passes — both lower
        return can_lower(args[0], linear_rgb, in_clip)
    if kind == RENDER_CLIP:
        target, clip_scene, _bbox_units = args
        # nested clips isolate as passes, so in_clip does not block;
        # bbox-units resolve from the target hull at lowering time
        return _clip_scene_ok(clip_scene) and can_lower(target, linear_rgb, True)
    if kind == RENDER_MASK:
        target, mask_scene, _bbox_units = args
        return can_lower(target, linear_rgb, in_clip) and can_lower(
            mask_scene, linear_rgb, in_clip
        )
    if kind == RENDER_FILTER:
        return can_lower(args[0], linear_rgb, in_clip)
    return False


def _clip_scene_ok(scene) -> bool:
    # any mix of fill rules lowers: clip coverage is the precomputed
    # per-part union (_clip_tile), matching the reference's mask_only
    # OVER composition exactly
    def walk(scene) -> bool:
        kind, args = scene
        if kind == RENDER_FILL:
            return True
        if kind == RENDER_GROUP:
            return all(walk(c) for c in args)
        if kind == RENDER_TRANSFORM:
            return walk(args[0])
        return False

    return walk(scene)


def crop_layer_to_hull(layer: Layer, hull: ConvexHull, viewport) -> Layer:
    """Crop a viewport-sized layer down to its hull's bucketed bbox.

    Downstream layer ops (colorspace conversion, filters, composition) then
    run on content-sized tensors; bucketed dims keep the set of compiled
    shapes small.
    """
    from .utils.buckets import bucket_dim

    pts = hull.raw_points
    if len(pts) == 0:
        return layer
    v0, v1, vh, vw = (int(x) for x in viewport)
    r0 = max(int(np.floor(pts[:, 0].min())) - 1, v0)
    c0 = max(int(np.floor(pts[:, 1].min())) - 1, v1)
    r1 = min(int(np.ceil(pts[:, 0].max())) + 1, v0 + vh)
    c1 = min(int(np.ceil(pts[:, 1].max())) + 1, v1 + vw)
    if r1 <= r0 or c1 <= c0:
        return layer
    h = bucket_dim(r1 - r0)
    w = bucket_dim(c1 - c0)
    if h >= layer.height and w >= layer.width:
        return layer
    # shift the window up-left so the bucketed extent stays inside the canvas
    r0 = max(min(r0, v0 + vh - h), v0)
    c0 = max(min(c0, v1 + vw - w), v1)
    h = min(h, layer.height)
    w = min(w, layer.width)
    image = layer.image[r0 - layer.x : r0 - layer.x + h, c0 - layer.y : c0 - layer.y + w]
    return Layer(image, (r0, c0), layer.pre_alpha, layer.linear_rgb)


def render_group_hybrid(children, transform: Transform, viewport, linear_rgb: bool):
    """Render a group's children, batching maximal runs of lowerable ones.

    Returns a list of (Layer, hull) results in paint order (callers compose
    with OVER); non-batchable children render through Scene.render.
    """
    from .scene import Scene

    results: list = []
    run: list = []

    def flush():
        if not run:
            return
        group = Scene.group(run) if len(run) > 1 else run[0]
        rendered = render_fast(group, transform, viewport, linear_rgb)
        if rendered is not None:
            layer, hull = rendered
            results.append((crop_layer_to_hull(layer, hull, viewport), hull))
        else:  # predicate was optimistic; render the run via the interpreter
            for child in run:
                sub = child.render(transform, viewport=viewport, linear_rgb=linear_rgb)
                if sub is not None:
                    results.append(sub)
        run.clear()

    for child in children:
        if viewport is not None and can_lower(child, linear_rgb):
            run.append(child)
            continue
        flush()
        sub = child.render(transform, viewport=viewport, linear_rgb=linear_rgb)
        if sub is not None:
            results.append(sub)
    flush()
    return results
