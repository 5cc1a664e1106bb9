"""Device mesh, sharding specs, and multi-host initialization."""

from .mesh import make_mesh, mesh_axis_sizes
from .sharding import shard_params, batch_sharding, param_shardings

__all__ = [
    "make_mesh",
    "mesh_axis_sizes",
    "shard_params",
    "batch_sharding",
    "param_shardings",
]
