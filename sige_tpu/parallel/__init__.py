"""Multi-chip execution: meshes, sharding helpers, request batching."""

from .mesh import make_mesh, replicate, shard_batch, shard_cache, shard_model
from .serving import TwinStepServer

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_cache",
    "shard_model",
    "TwinStepServer",
]
