"""Fill-rule mapping from winding fields to coverage masks (device).

Same formulas as the reference (svgrasterize.py:984-990): nonzero clamps the
absolute winding, evenodd folds it with a triangle wave; sub-1e-6 values are
rounded down to zero so fully-empty pixels stay exactly empty.
"""

from __future__ import annotations

import jax.numpy as jnp

NONZERO = "nonzero"
EVENODD = "evenodd"


def apply(winding, fill_rule: str | None = None):
    if fill_rule is None or fill_rule == NONZERO:
        mask = jnp.clip(jnp.abs(winding), 0.0, 1.0)
    elif fill_rule == EVENODD:
        mask = jnp.abs(jnp.remainder(winding + 1.0, 2.0) - 1.0)
    else:
        raise ValueError(f"invalid fill rule: {fill_rule}")
    return jnp.where(mask < 1e-6, 0.0, mask)
