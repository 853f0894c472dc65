"""SVG filter engine: an SSA-style op list interpreted over Layers.

The Filter holds named results plus a list of (kind, attrs, input-indices);
execution seeds a stack with [SourceAlpha, SourceGraphic] and pushes each
primitive's result (parity: svgrasterize.py:1718-1957).  Implemented
primitives: feOffset, feMerge, feBlend (degraded to OVER), feComposite (all
Porter-Duff + arithmetic), feGaussianBlur, feColorMatrix, feMorphology.
All pixel math runs on device; filters operate in straight-alpha linear RGB.
"""

from __future__ import annotations

import math
import warnings
from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as np

from .core.layer import Layer
from .core.transform import Transform
from .ops import blur as blur_ops

FE_BLEND = 0
FE_COLOR_MATRIX = 1
FE_COMPONENT_TRANSFER = 2
FE_COMPOSITE = 3
FE_CONVOLVE_MATRIX = 4
FE_DIFFUSE_LIGHTING = 5
FE_DISPLACEMENT_MAP = 6
FE_FLOOD = 7
FE_GAUSSIAN_BLUR = 8
FE_MERGE = 9
FE_MORPHOLOGY = 10
FE_OFFSET = 11
FE_SPECULAR_LIGHTING = 12
FE_TILE = 13
FE_TURBULENCE = 14

FE_SOURCE_ALPHA = "SourceAlpha"
FE_SOURCE_GRAPHIC = "SourceGraphic"

COLOR_MATRIX_LUM = np.array(
    [[0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0, 0, 0, 0, 0], [0.2125, 0.7154, 0.0721, 0, 0]],
    dtype=np.float64,
)
# hueRotate basis: identity/cos/sin components (SVG spec feColorMatrix tables)
_HUE_BASIS = np.array(
    [
        [[0.213, 0.715, 0.072], [0.213, 0.715, 0.072], [0.213, 0.715, 0.072]],
        [[0.787, -0.715, -0.072], [-0.213, 0.285, -0.072], [-0.213, -0.715, 0.928]],
        [[-0.213, -0.715, 0.928], [0.143, 0.140, -0.283], [-0.787, 0.715, 0.072]],
    ],
    dtype=np.float64,
)


def color_matrix_hue_rotate(angle: float) -> np.ndarray:
    matrix = np.eye(4, 5)
    matrix[:3, :3] = np.dot(_HUE_BASIS.T, [1, math.cos(angle), math.sin(angle)]).T
    return matrix


def color_matrix_saturate(value: float) -> np.ndarray:
    matrix = np.eye(4, 5)
    matrix[:3, :3] = np.dot(_HUE_BASIS.T, [1, value, 0]).T
    return matrix


class Filter(NamedTuple):
    names: dict  # result name -> stack index
    filters: list  # [(kind, attrs, input indices)]

    @classmethod
    def empty(cls) -> "Filter":
        return cls({FE_SOURCE_ALPHA: 0, FE_SOURCE_GRAPHIC: 1}, [])

    def add_filter(self, kind, attrs, inputs, result) -> "Filter":
        names = self.names.copy()
        filters = self.filters.copy()
        args = []
        for name in inputs:
            if name is None:
                args.append(len(filters) + 1)  # previous result
            else:
                idx = self.names.get(name)
                if idx is None:
                    warnings.warn(f"unknown filter result name: {name}")
                    args.append(len(filters) + 1)
                else:
                    args.append(idx)
        if result is not None:
            names[result] = len(filters) + 2
        filters.append((kind, attrs, args))
        return Filter(names, filters)

    # builder helpers ------------------------------------------------------
    def offset(self, dx, dy, input=None, result=None):
        return self.add_filter(FE_OFFSET, (dx, dy), [input], result)

    def merge(self, inputs, result=None):
        return self.add_filter(FE_MERGE, tuple(), inputs, result)

    def blur(self, std_x, std_y=None, input=None, result=None):
        return self.add_filter(FE_GAUSSIAN_BLUR, (std_x, std_y), [input], result)

    def blend(self, in1, in2, mode=None, result=None):
        return self.add_filter(FE_BLEND, (mode,), [in1, in2], result)

    def composite(self, in1, in2, mode=None, result=None):
        return self.add_filter(FE_COMPOSITE, (mode,), [in1, in2], result)

    def color_matrix(self, input, matrix, result=None):
        return self.add_filter(FE_COLOR_MATRIX, (matrix,), [input], result)

    def morphology(self, rx, ry, method, input, result=None):
        return self.add_filter(FE_MORPHOLOGY, (rx, ry, method), [input], result)

    # interpreter ------------------------------------------------------------
    def __call__(self, transform: Transform, source: Layer) -> Layer:
        alpha = Layer(
            source.image[..., -1:] * jnp.asarray([0.0, 0.0, 0.0, 1.0], source.image.dtype),
            source.offset,
            pre_alpha=True,
            linear_rgb=True,
        )
        stack = [alpha, source.convert(pre_alpha=False, linear_rgb=True)]
        for kind, attrs, inputs in self.filters:
            args = [stack[i] for i in inputs]
            stack.append(_apply(kind, attrs, args, transform))
        return stack[-1]


def _apply(kind: int, attrs: tuple, inputs: list, transform: Transform) -> Layer:
    if kind == FE_OFFSET:
        dx, dy = attrs
        (layer,) = inputs
        x, y = layer.offset
        tx, ty = transform(transform.invert(np.array([x, y], dtype=np.float64)) + [dx, dy])
        return layer.translate(int(tx) - x, int(ty) - y)

    if kind == FE_MERGE:
        return Layer.compose(inputs, linear_rgb=True)

    if kind == FE_BLEND:
        from .ops.compose import BLEND_MODES

        (mode,) = attrs
        in1, in2 = inputs
        if mode is None or mode == "normal":
            return Layer.compose([in2, in1], linear_rgb=True)
        if mode in BLEND_MODES:
            return Layer.compose([in2, in1], mode, linear_rgb=True)
        warnings.warn(f"unsupported blend mode {mode!r}; using OVER")
        return Layer.compose([in2, in1], linear_rgb=True)

    if kind == FE_COMPOSITE:
        (mode,) = attrs
        in1, in2 = inputs
        return Layer.compose([in2, in1], mode, linear_rgb=True)

    if kind == FE_GAUSSIAN_BLUR:
        std_x, std_y = attrs
        std_y = std_x if std_y is None else std_y
        (layer,) = inputs
        kernel = blur_ops.gaussian_kernel(transform, (std_x, std_y))
        if kernel is None:
            return layer
        return layer.convolve(kernel)

    if kind == FE_COLOR_MATRIX:
        (matrix,) = attrs
        (layer,) = inputs
        if not isinstance(matrix, np.ndarray) or matrix.shape != (4, 5):
            warnings.warn(f"invalid color matrix: {matrix}")
            return layer
        return layer.color_matrix(matrix)

    if kind == FE_MORPHOLOGY:
        rx, ry, method = attrs
        (layer,) = inputs
        # user-space radii scaled into device pixels; rotation is ignored
        unit = transform.apply_vectors(np.array([[rx, 0.0], [0.0, ry]]))
        size0 = int(np.linalg.norm(unit[0]) * 2)
        size1 = int(np.linalg.norm(unit[1]) * 2)
        if size0 < 1 or size1 < 1:
            return layer
        return layer.morphology(size0, size1, method)

    raise ValueError(f"unsupported filter kind: {kind}")
