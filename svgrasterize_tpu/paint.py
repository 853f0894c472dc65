"""Paint server descriptors (host-side, immutable).

Colors are stored as premultiplied-alpha linear-RGB numpy arrays, the same
canonical form as the reference (svgrasterize.py:3581-3624).  Device
evaluation lives in ops/gradient.py; these NamedTuples are the scene-graph
facing API (parity: svgrasterize.py:1544-1713).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

from .core.transform import Transform
from .core import color as color_ops


class GradLinear(NamedTuple):
    p0: np.ndarray
    p1: np.ndarray
    stops: list  # [(offset, premult-linear rgba)]
    transform: Transform | None
    spread: str
    bbox_units: bool
    linear_rgb: bool | None


class GradRadial(NamedTuple):
    center: np.ndarray
    radius: float
    fcenter: np.ndarray | None
    fradius: float | None
    stops: list
    transform: Transform | None
    spread: str
    bbox_units: bool
    linear_rgb: bool | None


class Pattern(NamedTuple):
    scene: Any  # Scene
    scene_bbox_units: bool
    scene_view_box: tuple | None
    x: float
    y: float
    width: float
    height: float
    transform: Transform
    bbox_units: bool

    def bbox(self):
        return (self.x, self.y, self.width, self.height)


def stops_to_arrays(stops, linear_rgb: bool):
    """Sorted stop arrays for the device interpolator, colorspace-adjusted.

    Gradients interpolate in sRGB unless rendering in linear RGB
    (ref svgrasterize.py:1686-1695).
    """
    offsets = np.array([o for o, _ in stops], dtype=np.float32)
    colors = np.stack([c for _, c in stops]).astype(np.float64)
    if not linear_rgb:
        colors = color_ops.pre_linear_to_pre_srgb(colors)
    return offsets, colors.astype(np.float32)
