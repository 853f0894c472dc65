"""Morphology (feMorphology erode/dilate) as XLA reduce_window pooling.

Replaces the reference's numpy stride-tricks pooling
(/root/reference/svgrasterize.py:419-468) with jax.lax.reduce_window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pooling(image, ksize: tuple[int, int], stride: tuple[int, int] | None = None, method: str = "max"):
    """Overlapping {min,max,mean} pooling over the leading two axes."""
    ky, kx = ksize
    if stride is None:
        stride = (ky, kx)
    sy, sx = stride

    window = (ky, kx) + (1,) * (image.ndim - 2)
    strides = (sy, sx) + (1,) * (image.ndim - 2)
    if method == "max":
        return jax.lax.reduce_window(image, -jnp.inf, jax.lax.max, window, strides, "VALID")
    if method == "min":
        return jax.lax.reduce_window(image, jnp.inf, jax.lax.min, window, strides, "VALID")
    if method == "mean":
        s = jax.lax.reduce_window(image, 0.0, jax.lax.add, window, strides, "VALID")
        return s / float(ky * kx)
    raise ValueError(f"invalid pooling method: {method}")
