"""Convex hulls (Andrew's monotone chain) and objectBoundingBox transforms.

Parity target: /root/reference/svgrasterize.py:1963-2029.  Hull points are
kept in the presentation (device) coordinate system so merging is free of
transform round-trips.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from ..utils.constants import FLOAT
from ..core.transform import Transform


class ConvexHull:
    __slots__ = ("points",)

    def __init__(self, points):
        pts = np.asarray(points, dtype=FLOAT).reshape(-1, 2)
        self.points = _monotone_chain(pts)

    @classmethod
    def merge(cls, hulls: Iterable["ConvexHull"]) -> "ConvexHull":
        stacked = [h.points for h in hulls if h is not None and len(h.points)]
        if not stacked:
            return cls(np.zeros((0, 2)))
        return cls(np.concatenate(stacked, axis=0))

    def bbox(self, transform: Transform):
        """Bounding box (x, y, w, h) in user space (inverse-transformed)."""
        if len(self.points) == 0:
            return (0.0, 0.0, 0.0, 0.0)
        points = transform.invert(self.points)
        lo = points.min(axis=0)
        hi = points.max(axis=0)
        return (lo[0], lo[1], hi[0] - lo[0], hi[1] - lo[1])

    def bbox_transform(self, transform: Transform) -> Transform:
        """Transform mapping the unit square onto this hull's user-space bbox."""
        x, y, w, h = self.bbox(transform)
        if w <= 0 and h <= 0:
            return transform
        return transform.translate(x, y).scale(w, h)

    def path(self):
        from .path import Path, PATH_CLOSED, PATH_LINE

        pts = self.points.tolist()
        segs = [(PATH_LINE, [a, b]) for a, b in zip(pts, pts[1:])]
        segs.append((PATH_CLOSED, [pts[-1], pts[0]]))
        return Path([segs])


def _monotone_chain(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; returns hull vertices in CCW order."""
    if len(pts) <= 2:
        return pts.copy()
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def build(points):
        out: list[np.ndarray] = []
        for p in points:
            while len(out) >= 2 and _cross(out[-2], out[-1], p) <= 0:
                out.pop()
            if not out or not np.array_equal(out[-1], p):
                out.append(p)
        return out

    lower = build(pts)
    upper = build(pts[::-1])
    hull = lower + upper[1:-1]
    return np.asarray(hull, dtype=FLOAT)


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (b[0] - o[0]) * (a[1] - o[1])
