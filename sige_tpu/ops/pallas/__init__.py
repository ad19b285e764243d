"""Pallas TPU kernels for the engine's hot ops (DMA-centric alternatives
to the XLA take-based formulations in sige_tpu.ops)."""

from .gather_kernel import gather_tiles_pallas, plan_gather_origins
from .scatter_kernel import plan_scatter_origins, scatter_tiles_pallas

__all__ = [
    "gather_tiles_pallas",
    "plan_gather_origins",
    "scatter_tiles_pallas",
    "plan_scatter_origins",
]
