"""Batch document rendering: many SVGs -> one sprite atlas, sharded by tiles.

The sprite/atlas workload (icon sets, font specimens) is the framework's
"batch" mode: every document is lowered into the SAME tiled plan with a
translate into its atlas slot, so the whole batch becomes one z-sorted item
stream executed in a single device program — or sharded across a mesh with
parallel/scene.py (documents land in disjoint tile ranges, so tile sharding
is also document sharding).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.layer import Layer
from ..core.transform import Transform
from ..ops import batch_exec
from ..render_plan import lower_scene
from ..scene import Scene
from ..utils.constants import DEVICE_FLOAT


def layout_grid(n: int, cell: int, cols: int | None = None, margin: int = 0):
    """Grid geometry for n cells: returns (cols, rows, width, height)."""
    cols = cols or max(1, round(math.sqrt(n)))
    rows = -(-n // cols) if n else 0
    step = cell + margin
    return cols, rows, cols * step + margin, rows * step + margin


def atlas_scene(scenes_sizes, cell: int, cols: int | None = None, margin: int = 0):
    """Compose documents into one scene laid out on a grid.

    scenes_sizes: [(scene, (width, height))]; each document is uniformly
    scaled into its cell.  Returns (combined_scene, (width, height)).
    """
    n = len(scenes_sizes)
    cols, _rows, width, height = layout_grid(n, cell, cols, margin)
    step = cell + margin
    placed = []
    for index, (scene, size) in enumerate(scenes_sizes):
        if scene is None:
            continue
        row, col = divmod(index, cols)
        w, h = size if size is not None else (cell, cell)
        scale = min(cell / w, cell / h)
        tr = (
            Transform()
            .translate(margin + col * step, margin + row * step)
            .scale(scale)
        )
        placed.append(scene.transform(tr))
    if not placed:
        return None, (width, height)
    return Scene.group(placed), (width, height)


def render_atlas(
    scenes_sizes,
    cell: int = 128,
    cols: int | None = None,
    margin: int = 0,
    mesh=None,
    linear_rgb: bool = False,
):
    """Render a batch of documents into one atlas Layer.

    With a mesh, canvas tiles (and therefore documents) are sharded across
    the mesh's "data" axis; otherwise one device executes the whole plan.
    Falls back to the interpreter per document if the batch does not lower.
    """
    import jax.numpy as jnp

    combined, (width, height) = atlas_scene(scenes_sizes, cell, cols, margin)
    if combined is None:
        return Layer(
            np.zeros((height, width, 4), DEVICE_FLOAT), (0, 0), True, linear_rgb
        )
    # documents are authored in x/y; the canvas is indexed (row, col)
    tr = Transform().matrix(0, 1, 0, 1, 0, 0)
    viewport = (0, 0, height, width)

    lowered = lower_scene(combined, tr, viewport, linear_rgb)
    if lowered is None:
        from ..core.layer import merge_at

        layer, _hull = combined.render(tr, viewport=viewport, linear_rgb=linear_rgb)
        layer = layer.convert(pre_alpha=True, linear_rgb=linear_rgb)
        canvas = jnp.zeros((height, width, 4), DEVICE_FLOAT)
        canvas = merge_at(canvas, layer.image, layer.offset)
        return Layer(canvas, (0, 0), pre_alpha=True, linear_rgb=linear_rgb)
    gh, gw = lowered.grid

    from ..render_plan import execute_lowered

    if mesh is None:
        tiles = execute_lowered(lowered, viewport[:2], linear_rgb)
    else:
        # every program in the plan (isolation-pass groups and the main
        # stream) shards its tiles over the mesh's "data" axis
        from .scene import sharded_exec_fn

        tiles = execute_lowered(
            lowered, viewport[:2], linear_rgb, exec_fn=sharded_exec_fn(mesh)
        )[: gh * gw]

    t = lowered.tile
    canvas = tiles.reshape(gh, gw, t, t, 4)
    canvas = canvas.transpose(0, 2, 1, 3, 4).reshape(gh * t, gw * t, 4)
    return Layer(canvas[:height, :width], (0, 0), pre_alpha=True, linear_rgb=linear_rgb)
