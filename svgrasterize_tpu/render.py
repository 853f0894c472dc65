"""Path rasterization: host lowering -> device coverage/paint kernels.

This is the L4->L2 bridge: a Path is flattened (host, Wang's formula),
bucketed to a bounded set of device shapes, rasterized by the dense coverage
kernel, painted (solid / gradient / pattern) and returned as a Layer.
Parity: Path.mask / Path.fill of the reference (svgrasterize.py:922-1103).
"""

from __future__ import annotations

import math
import warnings

import jax.numpy as jnp
import numpy as np

from .core import color as color_ops
from .core.layer import Layer, merge_at
from .core.transform import Transform
from .geom.hull import ConvexHull
from .ops import coverage, fill_rule as fill_rule_ops, gradient as gradient_ops
from .ops.compose import COMPOSE_IN, compose
from .paint import GradLinear, GradRadial, Pattern, stops_to_arrays
from .utils.buckets import bucket_dim
from .utils.constants import DEVICE_FLOAT, FLATNESS


def _mask_padded(path, transform: Transform, fill_rule: str | None, viewport):
    """Rasterize into a bucket-padded mask.

    Returns (mask (H, W, 1) device, offset, (h, w) valid extent, hull) or None.
    """
    lines = path.flatten(transform, FLATNESS)
    if lines.size == 0:
        return None
    pts = lines.reshape(-1, 2)
    min0, min1 = np.floor(pts.min(axis=0)).astype(int) - 1
    max0, max1 = np.ceil(pts.max(axis=0)).astype(int) + 1
    if viewport is not None:
        v0, v1, ve0, ve1 = viewport
        min0, min1 = max(v0, min0), max(v1, min1)
        max0, max1 = min(v0 + ve0, max0), min(v1 + ve1, max1)
    h, w = int(max0 - min0), int(max1 - min1)
    if h <= 0 or w <= 0:
        return None

    hp, wp = bucket_dim(h), bucket_dim(w)
    shifted = lines.reshape(-1, 4) - np.array([min0, min1, min0, min1])
    arr = coverage.pad_lines(shifted)
    # bucket the segment count to powers of two (bounded recompilation)
    target = coverage.CHUNK
    while target < arr.shape[0]:
        target *= 2
    arr = coverage.pad_lines(arr, target)

    wind = coverage.winding(jnp.asarray(arr), hp, wp)
    mask = fill_rule_ops.apply(wind, fill_rule)[..., None]
    return mask, (int(min0), int(min1)), (h, w), ConvexHull(lines)


def path_mask(path, transform: Transform, fill_rule: str | None = None, viewport=None):
    """Render a path as an alpha-only Layer. Returns (Layer, ConvexHull) or None."""
    result = _mask_padded(path, transform, fill_rule, viewport)
    if result is None:
        return None
    mask, offset, (h, w), hull = result
    return Layer(mask[:h, :w], offset, pre_alpha=True, linear_rgb=True), hull


def path_fill(
    path,
    transform: Transform,
    paint,
    fill_rule: str | None = None,
    viewport=None,
    linear_rgb: bool = True,
):
    """Fill a path with a paint server. Returns (Layer, ConvexHull) or None."""
    if paint is None:
        return None
    result = _mask_padded(path, transform, fill_rule, viewport)
    if result is None:
        return None
    mask, offset, (h, w), hull = result

    if isinstance(paint, np.ndarray) and paint.shape == (4,):
        color = paint
        if not linear_rgb:
            color = color_ops.pre_linear_to_pre_srgb(color)
        image = mask * jnp.asarray(color, DEVICE_FLOAT)
        return Layer(image[:h, :w], offset, pre_alpha=True, linear_rgb=linear_rgb), hull

    if isinstance(paint, (GradLinear, GradRadial)):
        if paint.linear_rgb is not None:
            linear_rgb = paint.linear_rgb
        if paint.bbox_units:
            user_tr = hull.bbox_transform(transform).invert
        else:
            user_tr = transform.invert
        # device pixel -> gradient space, as one affine
        to_grad = user_tr if paint.transform is None else paint.transform.invert @ user_tr
        affine = jnp.asarray(gradient_ops.affine_2x3(to_grad))
        stop_offsets, stop_colors = stops_to_arrays(paint.stops, linear_rgb)
        vp_off = jnp.asarray(np.array(offset, dtype=DEVICE_FLOAT))
        hp, wp = mask.shape[0], mask.shape[1]
        if isinstance(paint, GradLinear):
            grad = gradient_ops.linear_fill(
                height=hp, width=wp, viewport_offset=vp_off, affine=affine,
                p0=jnp.asarray(paint.p0, DEVICE_FLOAT), p1=jnp.asarray(paint.p1, DEVICE_FLOAT),
                stop_offsets=jnp.asarray(stop_offsets), stop_colors=jnp.asarray(stop_colors),
                spread_method=paint.spread,
            )
        else:
            has_focal = paint.fcenter is not None or paint.fradius is not None
            fcenter = paint.center if paint.fcenter is None else paint.fcenter
            fradius = paint.fradius or 0.0
            grad = gradient_ops.radial_fill(
                height=hp, width=wp, viewport_offset=vp_off, affine=affine,
                center=jnp.asarray(paint.center, DEVICE_FLOAT),
                radius=jnp.asarray(paint.radius, DEVICE_FLOAT),
                fcenter=jnp.asarray(fcenter, DEVICE_FLOAT),
                fradius=jnp.asarray(fradius, DEVICE_FLOAT),
                stop_offsets=jnp.asarray(stop_offsets), stop_colors=jnp.asarray(stop_colors),
                spread_method=paint.spread, has_focal=has_focal,
            )
        image = compose(COMPOSE_IN, mask, grad)
        return Layer(image[:h, :w], offset, pre_alpha=True, linear_rgb=linear_rgb), hull

    if isinstance(paint, Pattern):
        layer = _fill_pattern(paint, mask[:h, :w], offset, hull, transform, linear_rgb)
        if layer is None:
            return None
        return layer, hull

    warnings.warn(f"fill method is not implemented: {paint}")
    return None


def pattern_texture(paint: Pattern, hull, transform: Transform, linear_rgb: bool):
    """Render the pattern sub-scene once and set up the tiling frame.

    Parity: svgrasterize.py:1049-1094 (the per-draw part of pattern fill).
    Returns (pat (th+1, tw+1, 4) device image, repeat_tr, lo (2,) int,
    (tile_h, tile_w)) or None when the sub-scene renders empty.  `pat` keeps
    the sub-scene layer's (pre_alpha, linear_rgb) flags — callers convert.
    """
    from .frontend.svg import viewbox_transform

    pat_tr = transform if paint.anchored else transform.no_translate()
    if paint.scene_view_box:
        if paint.bbox_units:
            px, py, pw, ph = paint.bbox()
            _hx, _hy, hw, hh = hull.bbox(transform)
            bbox = (px * hw, py * hh, pw * hw, ph * hh)
        else:
            bbox = paint.bbox()
        pat_tr = pat_tr @ viewbox_transform(bbox, paint.scene_view_box)
    elif paint.scene_bbox_units:
        pat_tr = hull.bbox_transform(pat_tr)
    pat_tr = pat_tr @ paint.transform
    result = paint.scene.render(pat_tr, linear_rgb=linear_rgb)
    if result is None:
        return None
    pat_layer, _ = result

    repeat_tr = transform
    if paint.bbox_units:
        repeat_tr = hull.bbox_transform(repeat_tr)
    repeat_tr = repeat_tr @ paint.transform
    if not paint.anchored:
        repeat_tr = repeat_tr.no_translate()

    corners = repeat_tr(
        [[0, 0], [paint.width, 0], [0, paint.height], [paint.width, paint.height]]
    )
    hi = corners.max(axis=0).astype(int)
    lo = corners.min(axis=0).astype(int)
    tile_h, tile_w = hi[0] - lo[0], hi[1] - lo[1]

    pat = jnp.zeros((tile_h + 1, tile_w + 1, 4), dtype=DEVICE_FLOAT)
    pat = merge_at(pat, pat_layer.image, (pat_layer.x - lo[0], pat_layer.y - lo[1]))
    return pat, repeat_tr, lo, (tile_h, tile_w), pat_layer


def _fill_pattern(paint: Pattern, mask, offset, hull, transform: Transform, linear_rgb: bool):
    """Render the pattern sub-scene once, then tile it under the mask.

    Parity: svgrasterize.py:1049-1097.  The modular tiling index grid is
    computed on host (integer gather indices), the gather runs on device.
    """
    setup = pattern_texture(paint, hull, transform, linear_rgb)
    if setup is None:
        return None
    pat, repeat_tr, lo, (tile_h, tile_w), pat_layer = setup

    h, w = mask.shape[:2]
    r = np.arange(h, dtype=np.float64)[:, None] + offset[0] + 0.5
    c = np.arange(w, dtype=np.float64)[None, :] + offset[1] + 0.5
    pixels = np.stack(np.broadcast_arrays(r, c), axis=-1).reshape(-1, 2)
    offsets = repeat_tr.invert(pixels)
    offsets = repeat_tr(
        np.remainder(offsets - [paint.x, paint.y], [paint.width, paint.height])
    ).astype(int)
    offsets -= lo
    idx0 = jnp.asarray(np.clip(offsets[:, 0], 0, tile_h).reshape(h, w))
    idx1 = jnp.asarray(np.clip(offsets[:, 1], 0, tile_w).reshape(h, w))
    tiled = pat[idx0, idx1]
    image = compose(COMPOSE_IN, mask, tiled)
    return Layer(image, offset, pre_alpha=pat_layer.pre_alpha, linear_rgb=pat_layer.linear_rgb)
