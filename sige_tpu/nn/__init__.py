"""SIGE neural-net layer: flax.linen engine modules, norm folding,
host-side planning, and the stateful model wrapper."""

from .engine import SIGEModel
from .module import (
    FULL,
    SPARSE,
    Gather,
    Scatter,
    ScatterGather,
    ScatterWithBlockResidual,
    SIGEConv2d,
    SIGECtx,
    SIGEModule,
    WindowState,
)
from .norm import batch_norm_affine, group_norm_with_affine, instance_norm_with_affine
from .planner import build_plan, choose_layout, plan_stats

__all__ = [
    "SIGEModel",
    "SIGECtx",
    "SIGEModule",
    "WindowState",
    "FULL",
    "SPARSE",
    "Gather",
    "Scatter",
    "ScatterGather",
    "ScatterWithBlockResidual",
    "SIGEConv2d",
    "build_plan",
    "choose_layout",
    "plan_stats",
    "group_norm_with_affine",
    "instance_norm_with_affine",
    "batch_norm_affine",
]
