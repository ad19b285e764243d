"""Core mask/geometry machinery: difference masks, mask pyramids, block
geometry, active-index reduction, and scatter ownership maps."""

from .geometry import BlockGeometry
from .masks import (
    compute_difference_mask,
    dilate_mask,
    downsample_mask,
    reduce_mask,
    reduce_mask_padded,
)
from .scatter_map import (build_owner_map, build_sg_sources, build_src_map,
                          gather_position_geom)

__all__ = [
    "BlockGeometry",
    "compute_difference_mask",
    "dilate_mask",
    "downsample_mask",
    "reduce_mask",
    "reduce_mask_padded",
    "build_owner_map",
    "build_src_map",
    "build_sg_sources",
    "gather_position_geom",
]
