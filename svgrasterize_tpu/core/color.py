"""Color management: sRGB <-> linear, premultiplied <-> straight alpha.

Works on both numpy arrays (host, e.g. parsed paint colors) and jax arrays
(device images) — all functions are pure and allocation-returning, unlike the
reference's in-place style (/root/reference/svgrasterize.py:471-503).  The
transfer curve is the exact piecewise sRGB 2.4-gamma.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _np_of(x: Any):
    """Pick the array namespace (numpy or jax.numpy) matching the input."""
    if isinstance(x, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def pre_to_straight_alpha(rgba):
    """Un-premultiply alpha: rgb / a where a > ~0, clipped to [0, 1]."""
    xp = _np_of(rgba)
    rgb = rgba[..., :-1]
    alpha = rgba[..., -1:]
    safe = xp.where(alpha > 0.0001, alpha, 1.0)
    rgb = xp.where(alpha > 0.0001, rgb / safe, rgb)
    return xp.clip(xp.concatenate([rgb, alpha], axis=-1), 0, 1)


def straight_to_pre_alpha(rgba):
    """Premultiply alpha."""
    xp = _np_of(rgba)
    return xp.concatenate([rgba[..., :-1] * rgba[..., -1:], rgba[..., -1:]], axis=-1)


def linear_to_srgb(rgba):
    """Linear RGB -> sRGB on the color channels; alpha untouched."""
    xp = _np_of(rgba)
    rgb = rgba[..., :-1]
    lo = rgb * 12.92
    # guard the power against negative inputs (clamped by the select anyway)
    hi = 1.055 * xp.power(xp.maximum(rgb, 1e-12), 1.0 / 2.4) - 0.055
    rgb = xp.where(rgb <= 0.0031308, lo, hi)
    return xp.concatenate([rgb, rgba[..., -1:]], axis=-1)


def srgb_to_linear(rgba):
    """sRGB -> linear RGB on the color channels; alpha untouched."""
    xp = _np_of(rgba)
    rgb = rgba[..., :-1]
    lo = rgb / 12.92
    hi = xp.power(xp.maximum((rgb + 0.055) / 1.055, 1e-12), 2.4)
    rgb = xp.where(rgb <= 0.04045, lo, hi)
    return xp.concatenate([rgb, rgba[..., -1:]], axis=-1)


def pre_linear_to_pre_srgb(rgba):
    """Premultiplied linear -> premultiplied sRGB (used for solid paints)."""
    return straight_to_pre_alpha(linear_to_srgb(pre_to_straight_alpha(rgba)))


# Rec.709-ish luminance weights used by SVG masks (svgrasterize.py:735).
MASK_LUMINANCE = np.array([0.2125, 0.7154, 0.072])
