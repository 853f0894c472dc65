"""Multi-chip scaling: device meshes, sharded rasterization, collectives.

The reference is strictly single-process/single-thread (SURVEY.md section 2);
this package provides the TPU-native parallelism it lacks: paths/tiles are
data-parallel across a mesh axis, segment lists are "tensor"-parallel across
a second axis (partial winding + psum), and composed canvases ride ICI
collectives instead of a host loop.

Multi-host: every entry point takes a jax.sharding.Mesh, so a multi-host
deployment only changes mesh construction — initialize jax.distributed,
build the mesh over jax.devices() spanning hosts, and keep the tile/"data"
axis within each host's ICI domain (documents/tile ranges then shard across
DCN, per-tile work across ICI).  The virtual-device test suite exercises
the same code paths via xla_force_host_platform_device_count.
"""

from .mesh import make_mesh
from .batch import fill_batch, sharded_fill_batch, sharded_render_step
