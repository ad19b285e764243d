"""Jittable execution ops for tiling-based sparse convolution.

All ops take NHWC arrays, fixed-capacity padded index buffers, and static
:class:`~sige_tpu.core.geometry.BlockGeometry`, so they trace to static
shapes. The default implementations are pure-XLA gather compositions (which
XLA fuses aggressively); Pallas TPU kernels live in ``sige_tpu.ops.pallas``
and are selected via ``backend=`` where they win.
"""

from .conv import conv2d_nhwc, tile_conv2d
from .gather import apply_epilogue, gather_tiles
from .scatter import (
    calibrate_residual,
    materialize_tiles_box,
    scatter_gather_tiles,
    scatter_tiles,
    scatter_tiles_box,
    scatter_with_block_residual,
    scatter_with_block_residual_box,
)

__all__ = [
    "conv2d_nhwc",
    "tile_conv2d",
    "gather_tiles",
    "apply_epilogue",
    "scatter_tiles",
    "scatter_tiles_box",
    "scatter_gather_tiles",
    "scatter_with_block_residual",
    "scatter_with_block_residual_box",
    "materialize_tiles_box",
    "calibrate_residual",
]
