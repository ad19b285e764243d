"""Samplers: DDIM/DDPM (+ schedules), run as single fused lax.scan loops."""

from .diffusion import (
    DiffusionSchedule,
    get_beta_schedule,
    get_sampling_sequence,
)
from .ddim_ddpm import DDIMSampler, DDPMSampler
from .dpm_solver import DPMSolverSampler
from .pd import PDSampler, logsnr_schedule

__all__ = [
    "DiffusionSchedule",
    "get_beta_schedule",
    "get_sampling_sequence",
    "DDIMSampler",
    "DDPMSampler",
    "DPMSolverSampler",
    "PDSampler",
    "logsnr_schedule",
]
