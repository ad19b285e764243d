"""Jittable execution ops for tiling-based sparse convolution.

All ops take NHWC arrays, fixed-capacity padded index buffers, and static
:class:`~sige_tpu.core.geometry.BlockGeometry`, so they trace to static
shapes. The implementations are pure-XLA gather/slice compositions (which
XLA fuses aggressively).

Why no Pallas tile kernels: DMA-per-tile gather/scatter kernels were
built and benched on a v5e chip. Mosaic requires every dynamic VMEM
slice to be aligned to the (8, 128) sublane/lane tiling along the
second-to-last dim — but SIGE tile origins along W are mask-dependent
and the conv-tile constraint (block stride = block - kernel + 1, e.g.
bw - 2 for a 3x3) makes "origin and width both multiples of 8"
mathematically unsatisfiable, so the kernels cannot lower
(``tpu.memref_slice ... must be aligned to tiling (8), but is 6``;
dynamic rotates on unaligned shapes are equally unsupported). The
host-planned source-map / bbox / window formulations in this package
ARE the TPU-native design: XLA lowers them to aligned copies and fused
selects, and they are the measured-fast path on chip.
"""

from .attention import enable_flash_attention, masked_mha, mha
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
    "enable_flash_attention",
    "mha",
    "masked_mha",
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
