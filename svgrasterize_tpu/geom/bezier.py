"""Cubic bezier math (host numpy, fully vectorized).

Flattening uses Wang's formula — an a-priori bound on the number of uniform
parameter subdivisions needed to stay within a chord-distance tolerance —
instead of the reference's data-dependent split-until-flat loop
(/root/reference/svgrasterize.py:2091-2098).  Wang's formula gives static,
computable-in-advance segment counts, which is what lets the device pipeline
run with fixed shapes.
"""

from __future__ import annotations

import numpy as np

from ..utils.constants import FLOAT

# Bernstein basis matrix for cubics: B(t) = [1 t t^2 t^3] @ M @ P
CUBIC_BASIS = np.array(
    [[1, 0, 0, 0], [-3, 3, 0, 0], [3, -6, 3, 0], [-1, 3, -3, 1]], dtype=FLOAT
)
QUAD_BASIS = np.array([[1, 0, 0], [-2, 2, 0], [1, -2, 1]], dtype=FLOAT)

# Exact degree elevation quad -> cubic.
QUAD_TO_CUBIC = np.array(
    [[1, 0, 0], [1 / 3, 2 / 3, 0], [0, 2 / 3, 1 / 3], [0, 0, 1]], dtype=FLOAT
)


def quad_to_cubic(points):
    """Degree-elevate quadratic bezier(s) (..., 3, 2) to cubic (..., 4, 2)."""
    points = np.asarray(points, dtype=FLOAT)
    return np.einsum("ij,...jk->...ik", QUAD_TO_CUBIC, points)


def cubic_eval(curves, ts):
    """Evaluate cubic beziers.

    curves: (..., 4, 2); ts: broadcastable to (...,); returns (..., 2).
    """
    curves = np.asarray(curves, dtype=FLOAT)
    ts = np.asarray(ts, dtype=FLOAT)
    tpow = np.stack([np.ones_like(ts), ts, ts * ts, ts * ts * ts], axis=-1)
    coeff = np.einsum("ij,...jk->...ik", CUBIC_BASIS, curves)
    return np.einsum("...j,...jk->...k", tpow, coeff)


def cubic_deriv(curves, ts):
    curves = np.asarray(curves, dtype=FLOAT)
    ts = np.asarray(ts, dtype=FLOAT)
    dmat = (CUBIC_BASIS * np.arange(4)[:, None])[1:]
    tpow = np.stack([np.ones_like(ts), ts, ts * ts], axis=-1)
    coeff = np.einsum("ij,...jk->...ik", dmat, curves)
    return np.einsum("...j,...jk->...k", tpow, coeff)


def wang_segments(curves, tolerance: float) -> np.ndarray:
    """Number of uniform subdivisions per curve to stay within `tolerance`.

    For a cubic, ||B''(t)|| <= 6 * M with M = max(|p0-2p1+p2|, |p1-2p2+p3|),
    and chord deviation with n uniform pieces is bounded by ||B''|| / (8 n^2),
    so n = ceil(sqrt(3 M / (4 tol))) suffices.
    """
    curves = np.asarray(curves, dtype=FLOAT).reshape(-1, 4, 2)
    d1 = curves[:, 0] - 2 * curves[:, 1] + curves[:, 2]
    d2 = curves[:, 1] - 2 * curves[:, 2] + curves[:, 3]
    m = np.maximum(np.linalg.norm(d1, axis=-1), np.linalg.norm(d2, axis=-1))
    n = np.ceil(np.sqrt(3.0 * m / (4.0 * tolerance)))
    return np.maximum(n, 1).astype(np.int64)


def flatten_cubics_counts(curves, tolerance: float):
    """Adaptively flatten cubics (N, 4, 2) -> (lines (M, 2, 2), counts (N,)).

    Half-splitting against the control-point flatness criterion
    max(ux^2, uy^2) + max(vx^2, vy^2) < 16 tol^2 with u = 3p1 - 2p0 - p3,
    v = 3p2 - p0 - 2p3 (font-rs lineage; NOTE the max groups per
    DEVIATION VECTOR — the reference's code does the same even though its
    own docstring says per-coordinate, and matching it is what removes the
    prompt.svg text parity tail measured against uniform Wang
    subdivision; /root/reference/svgrasterize.py:2071-2098).  Each level
    splits the whole not-yet-flat batch at t=1/2, so the loop runs
    O(max depth) numpy passes, not per-curve; segments come out grouped
    by source curve (stable, not arc-ordered — fills are order-free).
    """
    curves = np.asarray(curves, dtype=FLOAT).reshape(-1, 4, 2)
    n = len(curves)
    if curves.size == 0:
        return np.zeros((0, 2, 2), dtype=FLOAT), np.zeros(n, np.int64)
    limit = 16.0 * tolerance * tolerance
    owner = np.arange(n)
    t0 = np.zeros(n, dtype=FLOAT)   # parametric start of each piece
    dt = np.ones(n, dtype=FLOAT)
    out_lines = []
    out_owner = []
    out_t0 = []
    while curves.size:
        u = 3.0 * curves[:, 1] - 2.0 * curves[:, 0] - curves[:, 3]
        v = 3.0 * curves[:, 2] - curves[:, 0] - 2.0 * curves[:, 3]
        err = np.maximum(u[:, 0] ** 2, u[:, 1] ** 2) + np.maximum(
            v[:, 0] ** 2, v[:, 1] ** 2
        )
        flat = err < limit
        if flat.any():
            out_lines.append(curves[flat][:, [0, 3]])
            out_owner.append(owner[flat])
            out_t0.append(t0[flat])
        rest = curves[~flat]
        owner = owner[~flat]
        t0 = t0[~flat]
        dt = dt[~flat]
        if rest.size == 0:
            break
        m01 = (rest[:, 0] + rest[:, 1]) / 2
        m12 = (rest[:, 1] + rest[:, 2]) / 2
        m23 = (rest[:, 2] + rest[:, 3]) / 2
        m012 = (m01 + m12) / 2
        m123 = (m12 + m23) / 2
        mid = (m012 + m123) / 2
        left = np.stack([rest[:, 0], m01, m012, mid], axis=1)
        right = np.stack([mid, m123, m23, rest[:, 3]], axis=1)
        curves = np.concatenate([left, right])
        dt = dt / 2
        owner = np.concatenate([owner, owner])
        t0 = np.concatenate([t0, t0 + dt])
        dt = np.concatenate([dt, dt])
    lines = np.concatenate(out_lines)
    owners = np.concatenate(out_owner)
    starts = np.concatenate(out_t0)
    # per-curve, in parametric order: polyline consumers (dash, markers)
    # rely on head-to-tail chains
    order = np.lexsort((starts, owners))
    return lines[order], np.bincount(owners, minlength=n).astype(np.int64)


def flatten_cubics(curves, tolerance: float) -> np.ndarray:
    """Flatten a batch of cubics (N, 4, 2) into line segments (M, 2, 2)."""
    return flatten_cubics_counts(curves, tolerance)[0]


def flatten_cubics_uniform(curves, tolerance: float) -> np.ndarray:
    """Uniform-count flattening via Wang's bound (one-shot, loop-free).

    Kept for fixed-shape device-side flattening experiments; the default
    host path uses the adaptive variant above for reference parity.
    """
    curves = np.asarray(curves, dtype=FLOAT).reshape(-1, 4, 2)
    if curves.size == 0:
        return np.zeros((0, 2, 2), dtype=FLOAT)
    counts = wang_segments(curves, tolerance)
    total = int(counts.sum())
    owner = np.repeat(np.arange(len(curves)), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    local = np.arange(total) - starts[owner]
    inv_n = 1.0 / counts[owner]
    t0 = local * inv_n
    t1 = (local + 1) * inv_n
    own_curves = curves[owner]
    p0 = cubic_eval(own_curves, t0)
    p1 = cubic_eval(own_curves, t1)
    # pin endpoints exactly to the control points (avoids cracks)
    first = local == 0
    last = local == counts[owner] - 1
    p0[first] = own_curves[first, 0]
    p1[last] = own_curves[last, 3]
    return np.stack([p0, p1], axis=1)


def cubic_split_half(curve):
    """Split one cubic (4, 2) at t = 0.5 into two cubics (2, 4, 2)."""
    c = np.asarray(curve, dtype=FLOAT)
    m01 = (c[0] + c[1]) / 2
    m12 = (c[1] + c[2]) / 2
    m23 = (c[2] + c[3]) / 2
    m012 = (m01 + m12) / 2
    m123 = (m12 + m23) / 2
    mid = (m012 + m123) / 2
    return np.array([[c[0], m01, m012, mid], [mid, m123, m23, c[3]]])


def cubic_bbox(curve):
    """Tight bbox of a cubic via stationary points of each coordinate."""
    c = np.asarray(curve, dtype=FLOAT)
    # derivative coefficients per axis: 3*(a t^2 + b t + c)
    a = -c[0] + 3 * c[1] - 3 * c[2] + c[3]
    b = 2 * (c[0] - 2 * c[1] + c[2])
    d = c[1] - c[0]
    ts = [0.0, 1.0]
    for axis in range(2):
        aa, bb, dd = a[axis], b[axis], d[axis]
        if abs(aa) < 1e-12:
            if abs(bb) > 1e-12:
                ts.append(-dd / bb)
        else:
            det = bb * bb - 4 * aa * dd
            if det >= 0:
                s = np.sqrt(det)
                ts.extend([(-bb + s) / (2 * aa), (-bb - s) / (2 * aa)])
    ts = np.clip([t for t in ts if 0 <= t <= 1], 0, 1)
    pts = cubic_eval(np.broadcast_to(c, (len(ts), 4, 2)), np.asarray(ts))
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    return (lo[0], lo[1], hi[0] - lo[0], hi[1] - lo[1])
