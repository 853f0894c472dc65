"""Multi-chip scaling: device meshes, sharded rasterization, collectives.

The reference is strictly single-process/single-thread (SURVEY.md section 2);
this package provides the TPU-native parallelism it lacks: paths/tiles are
data-parallel across a mesh axis, segment lists are "tensor"-parallel across
a second axis (partial winding + psum), and composed canvases ride ICI
collectives instead of a host loop.
"""

from .mesh import make_mesh
from .batch import fill_batch, sharded_fill_batch, sharded_render_step
