"""Device mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def _factor2(n: int) -> tuple[int, int]:
    """Split n into the most square (a, b) with a * b == n."""
    best = (n, 1)
    for a in range(1, int(np.sqrt(n)) + 1):
        if n % a == 0:
            best = (n // a, a)
    return best


def make_mesh(devices=None, axis_names=("data", "seg")) -> Mesh:
    """2D mesh over the available devices: paths x segments.

    The "data" axis shards independent work items (paths, tiles, documents);
    the "seg" axis shards each item's segment list, reduced with psum.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    a, b = _factor2(n)
    return Mesh(np.asarray(devices).reshape(a, b), axis_names)
