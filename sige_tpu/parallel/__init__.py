"""Multi-chip execution: meshes, sharding helpers, request batching,
single-request spatial parallelism."""

from .mesh import make_mesh, replicate, shard_batch, shard_cache, shard_model
from .serving import PlanStack, SessionServer, TwinStepServer
from .spatial import (make_spatial_mesh, row_sharding, spatial_apply,
                      spatial_full_apply)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_cache",
    "shard_model",
    "PlanStack",
    "SessionServer",
    "TwinStepServer",
    "make_spatial_mesh",
    "row_sharding",
    "spatial_apply",
    "spatial_full_apply",
]
