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


class AtlasServer:
    """Serving handle for a deduplicated sprite atlas (see compile_atlas)."""

    def __init__(self, serve_planar, size, tile, n_unique, n_docs,
                 linear_rgb=False):
        self._serve_planar = serve_planar
        self.size = size
        self.tile = tile
        self.n_unique = n_unique
        self.n_docs = n_docs
        self._linear_rgb = linear_rgb

    def render_tiles_planar(self):
        """(out_tiles, T, 4T) channel-planar canvas tiles."""
        return self._serve_planar()

    def render(self) -> Layer:
        import jax.numpy as jnp

        width, height = self.size
        t = self.tile
        gh, gw = -(-height // t), -(-width // t)
        tiles = self.render_tiles_planar()
        canvas = jnp.reshape(tiles, (gh, gw, t, 4, t))
        canvas = canvas.transpose(0, 2, 1, 4, 3).reshape(gh * t, gw * t, 4)
        return Layer(canvas[:height, :width], (0, 0), True, self._linear_rgb)


def compile_atlas(
    scenes_sizes, cell: int = 128, cols: int | None = None, margin: int = 0,
    linear_rgb: bool = False,
):
    """Compile a sprite atlas for serving, rendering each UNIQUE document
    once.

    Sprite atlases repeat documents (icon sets reuse glyphs/sprites); the
    framework's whole-plan serving cost is ~proportional to item count,
    so rasterizing identical cells repeatedly pays the kernel's per-item
    floor once per copy.  This deduplicates documents by object identity
    + size, compiles ONE whole-plan program over the unique-cell atlas,
    and serves the full atlas as a device row-gather of the unique
    canvas tiles (cells are tile-aligned, so a duplicate cell is exactly
    a run of duplicate tile rows).  Falls back to the plain combined
    plan when nothing repeats or the geometry is not tile-aligned.

    Returns an AtlasServer (render_tiles_planar()/render()) or None when
    the atlas cannot lower.
    """
    import jax
    import jax.numpy as jnp

    from ..render_plan import compile_scene

    n = len(scenes_sizes)
    cols_n, _rows_n, width, height = layout_grid(n, cell, cols, margin)
    tr = Transform().matrix(0, 1, 0, 1, 0, 0)

    uniq: list = []
    uniq_of: list = []
    index_of: dict = {}
    for s, size in scenes_sizes:
        if s is None:
            uniq_of.append(-1)
            continue
        key = (id(s), tuple(size) if size is not None else None)
        if key not in index_of:
            index_of[key] = len(uniq)
            uniq.append((s, size))
        uniq_of.append(index_of[key])

    def _plain():
        combined, (w, h) = atlas_scene(scenes_sizes, cell, cols, margin)
        if combined is None:
            return None
        compiled = compile_scene(combined, tr, (0, 0, h, w), linear_rgb)
        if compiled is None:
            return None
        return AtlasServer(
            compiled.render_tiles_planar, (w, h), compiled.tile, n, n,
            linear_rgb,
        )

    if len(uniq) == n or not uniq:
        return _plain()

    combined_u, (wu, hu) = atlas_scene(uniq, cell, None, margin)
    compiled = compile_scene(combined_u, tr, (0, 0, hu, wu), linear_rgb)
    if compiled is None:
        return None
    t = compiled.tile
    if cell % t or margin % t:
        return _plain()  # tiles would straddle cell boundaries
    step = cell + margin
    cols_u = layout_grid(len(uniq), cell, None, margin)[0]
    gw_u = -(-wu // t)
    gh, gw = -(-height // t), -(-width // t)
    u_tiles = (-(-hu // t)) * gw_u
    rows = np.full(gh * gw, u_tiles, np.int32)  # default: the zero tile
    for r in range(gh):
        qy = r * t - margin
        if qy < 0 or qy % step >= cell:
            continue
        cell_row, off_r = qy // step, (qy % step) // t
        for c in range(gw):
            qx = c * t - margin
            if qx < 0 or qx % step >= cell:
                continue
            cell_col, off_c = qx // step, (qx % step) // t
            idx = cell_row * cols_n + cell_col
            if idx >= n or uniq_of[idx] < 0:
                continue
            urow, ucol = divmod(uniq_of[idx], cols_u)
            rows[r * gw + c] = (
                ((margin + urow * step) // t + off_r) * gw_u
                + (margin + ucol * step) // t + off_c
            )
    rows_dev = jnp.asarray(rows)
    inner = compiled.render_tiles_planar

    @jax.jit
    def serve_planar():
        tiles = inner()  # inlined: one program renders unique cells
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((1, *tiles.shape[1:]), tiles.dtype)]
        )
        return tiles[rows_dev]

    return AtlasServer(
        serve_planar, (width, height), t, len(uniq), n, linear_rgb
    )
