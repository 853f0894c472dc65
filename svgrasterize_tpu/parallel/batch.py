"""Batched and mesh-sharded rasterization kernels.

`fill_batch` is the flagship single-chip program: one jitted call rasterizes
a whole batch of paths (padded segment lists) into AA-filled RGBA tiles —
the batched replacement for the reference's per-path Python loop
(/root/reference/svgrasterize.py:649-688 + 922-1019).

`sharded_fill_batch` runs the same computation over a 2D device Mesh:
the batch axis is sharded across "data" (data parallelism over paths/tiles)
and each segment list across "seg" (each device accumulates partial winding
for its segment slice, combined with a psum over ICI — the tensor-parallel
analogue).  `sharded_render_step` adds the cross-item composite: tiles are
all_gather'ed along "data" and folded with Porter-Duff OVER in paint order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.coverage import winding_impl
from ..ops import fill_rule as fill_rule_ops
from ..utils.constants import DEVICE_FLOAT


def _fill_one(lines, color, height: int, width: int, fill_rule: str | None):
    wind = winding_impl(lines, height, width)
    mask = fill_rule_ops.apply(wind, fill_rule)
    return mask[..., None] * color[None, None, :]


@partial(jax.jit, static_argnames=("height", "width", "fill_rule"))
def fill_batch(lines, colors, height: int, width: int, fill_rule: str | None = None):
    """Rasterize a batch of paths into premultiplied RGBA tiles.

    lines: (N, S, 4) padded per-path edge lists (tile-local coords);
    colors: (N, 4) premultiplied RGBA.  Returns (N, height, width, 4).
    """
    return jax.vmap(lambda l, c: _fill_one(l, c, height, width, fill_rule))(
        lines.astype(DEVICE_FLOAT), colors.astype(DEVICE_FLOAT)
    )


def sharded_fill_batch(mesh: Mesh, lines, colors, height: int, width: int, fill_rule=None):
    """fill_batch over a ("data", "seg") mesh.

    lines (N, S, 4) is sharded (data, seg); each device computes the partial
    winding of its segment shard and the shards are combined with a psum over
    "seg" (exact: winding is a sum over edges).  The output (N, H, W, 4)
    stays sharded along "data".
    """

    def local(lines_l, colors_l):
        def one(seg_shard, color):
            partial_wind = winding_impl(seg_shard, height, width)
            wind = jax.lax.psum(partial_wind, "seg")
            mask = fill_rule_ops.apply(wind, fill_rule)
            return mask[..., None] * color[None, None, :]

        return jax.vmap(one)(lines_l, colors_l)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("data", "seg", None), P("data", None)),
        out_specs=P("data", None, None, None),
    )(lines.astype(DEVICE_FLOAT), colors.astype(DEVICE_FLOAT))


def sharded_render_step(mesh: Mesh, lines, colors, height: int, width: int, fill_rule=None):
    """Full sharded step: rasterize the batch, then composite in paint order.

    Returns the (height, width, 4) canvas with every path OVER-composed in
    batch order.  The fold runs as an associative scan over the gathered
    batch (Porter-Duff OVER is associative), so the composite is log-depth
    on device rather than a host loop.
    """

    def local(lines_l, colors_l):
        def one(seg_shard, color):
            partial_wind = winding_impl(seg_shard, height, width)
            wind = jax.lax.psum(partial_wind, "seg")
            mask = fill_rule_ops.apply(wind, fill_rule)
            return mask[..., None] * color[None, None, :]

        tiles = jax.vmap(one)(lines_l, colors_l)  # (N/data, H, W, 4)
        tiles = jax.lax.all_gather(tiles, "data", tiled=True)  # (N, H, W, 4)

        def over_pair(a, b):
            # b OVER a, premultiplied alpha
            return b + a * (1.0 - b[..., -1:])

        composed = jax.lax.associative_scan(over_pair, tiles, axis=0)
        return composed[-1]

    # after the all_gather the canvas is replicated across "data"; the static
    # replication checker cannot see that through associative_scan, so it is
    # disabled for this shard_map (jax >= 0.5 names the flag check_vma)
    try:
        mapped = shard_map(
            local,
            mesh=mesh,
            in_specs=(P("data", "seg", None), P("data", None)),
            out_specs=P(None, None, None),
            check_vma=False,
        )
    except TypeError:
        mapped = shard_map(
            local,
            mesh=mesh,
            in_specs=(P("data", "seg", None), P("data", None)),
            out_specs=P(None, None, None),
            check_rep=False,
        )
    return mapped(lines.astype(DEVICE_FLOAT), colors.astype(DEVICE_FLOAT))
