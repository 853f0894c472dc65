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


class RasterImage:
    """Scene-like raster content (duck-typed .render, usable as a Pattern
    sub-scene).

    Wraps a straight-alpha sRGB uint8 (H, W, 4) array; render() maps the
    (0, 0, W, H) user box through the transform axis-aligned (rotated
    placements degrade to their bounding box) with bilinear resampling.
    An <image> element lowers to a rect filled by a single-cell Pattern
    whose sub-scene is this object, so raster drawing rides the ordinary
    pattern paths (interpreter, batched executor, fused kernel) without a
    new scene node kind.
    """

    def __init__(self, array):
        self.array = np.ascontiguousarray(array)

    def render(self, transform, mask_only: bool = False, viewport=None,
               linear_rgb: bool = False):
        import jax
        import jax.numpy as jnp

        from .core.layer import Layer
        from .geom.hull import ConvexHull
        from .utils.constants import DEVICE_FLOAT

        h, w = self.array.shape[:2]
        corners = transform(
            np.array([[0, 0], [w, 0], [0, h], [w, h]], dtype=np.float64)
        )
        lo = np.floor(corners.min(axis=0)).astype(int)
        hi = np.ceil(corners.max(axis=0)).astype(int)
        rows, cols = int(hi[0] - lo[0]), int(hi[1] - lo[1])
        if rows <= 0 or cols <= 0:
            return None
        img = jnp.asarray(self.array, DEVICE_FLOAT) / 255.0
        img = jax.image.resize(img, (rows, cols, 4), method="linear")
        layer = Layer(img, (int(lo[0]), int(lo[1])), pre_alpha=False,
                      linear_rgb=False)
        layer = layer.convert(pre_alpha=True, linear_rgb=linear_rgb)
        if mask_only:
            layer = Layer(
                layer.image * jnp.asarray([0.0, 0.0, 0.0, 1.0], layer.image.dtype),
                layer.offset, True, linear_rgb,
            )
        return layer, ConvexHull(corners)


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
