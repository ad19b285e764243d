"""Diffusion (SDEdit) runner: preprocess -> generate / profile.

The reference flow (reference: diffusion/runner.py:149-246): compute the
difference mask from the original/edited pair, dilate, pre-run the model
in full mode to record shapes, build the mask pyramid down to the
bottleneck resolution, set masks, then for each denoising step run the
full pass on the original trajectory and the sparse pass on the edited
one. Here the denoising loop is one fused lax.scan
(:mod:`sige_tpu.samplers.ddim_ddpm`), and profiling uses forced-host-sync
timing (:func:`sige_tpu.utils.timed_loop`) plus the analytic MACs
collection.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import compute_difference_mask, dilate_mask, downsample_mask
from ..models.ddpm import DDPMUNetConfig, SIGEFusedUNet
from ..nn import SIGEModel
from ..nn.module import SIGECtx
from ..samplers import (
    DDIMSampler,
    DDPMSampler,
    DPMSolverSampler,
    DiffusionSchedule,
    get_sampling_sequence,
)
from .common import _hbm_entry


@dataclasses.dataclass(frozen=True)
class DiffusionRunConfig:
    """Sampling config (church256 defaults;
    reference: diffusion/configs/church_ddpm256-sige.yml sampling section)."""

    sampler_type: str = "ddpm"          # "ddpm" | "ddim"
    total_steps: int = 1000
    sample_steps: int = 500
    noise_level: int = 500
    beta_schedule: str = "linear"
    beta_start: float = 1e-4
    beta_end: float = 2e-2
    eta: float = 0.0                     # ddim
    skip_type: str = "uniform"
    eps: float = 1e-2                    # difference-mask threshold
    mask_dilate_radius: int = 5
    rescaled: bool = True                # data in [0,1] -> [-1,1]
    # dpm_solver knobs (reference: configs/church_dpmsolver256-sige.yml)
    algorithm_type: str = "dpmsolver++"
    order: int = 2
    solver_type: str = "dpmsolver"
    lower_order_final: bool = True


def data_transform(x: np.ndarray, rescaled: bool) -> np.ndarray:
    return 2.0 * x - 1.0 if rescaled else x


def inverse_data_transform(x: np.ndarray, rescaled: bool) -> np.ndarray:
    return np.clip((x + 1.0) / 2.0 if rescaled else x, 0.0, 1.0)


def _maybe_bf16_kernels(model: SIGEModel, flag) -> None:
    """Store conv kernels in bfloat16 on TPU (``flag=None`` = auto).

    Bit-identical there — the MXU rounds f32 conv operands to bf16 at
    JAX's default precision anyway — while halving weight HBM reads,
    which dominate the dense low-resolution high-channel U-Net levels
    (see :func:`sige_tpu.utils.bf16_conv_kernels`). Disabled off-TPU
    where convolutions are true-f32.
    """
    from ..utils import bf16_conv_kernels, on_tpu

    if flag is None:
        flag = on_tpu()
    if flag:
        model.params = bf16_conv_kernels(model.params)


class DiffusionRunner:
    """Drives a (SIGE) DDPM U-Net through SDEdit generation/profiling."""

    def __init__(self, model_cfg: DDPMUNetConfig = DDPMUNetConfig(),
                 run_cfg: DiffusionRunConfig = DiffusionRunConfig(),
                 params=None, seed: int = 0, bucket_min: int = 2,
                 layout: str = "auto", bf16_kernels=None):
        self.model_cfg = model_cfg
        self.run_cfg = run_cfg
        self.module = SIGEFusedUNet(cfg=model_cfg)
        self.model = SIGEModel(self.module, params, bucket_min=bucket_min,
                               layout=layout)
        if params is None:
            dummy = jnp.zeros(
                (1, model_cfg.resolution, model_cfg.resolution, model_cfg.in_ch),
                jnp.float32)
            self.model.init(jax.random.key(seed), dummy, jnp.zeros((1,), jnp.float32))
        _maybe_bf16_kernels(self.model, bf16_kernels)
        sched = DiffusionSchedule.create(
            run_cfg.beta_schedule, run_cfg.beta_start, run_cfg.beta_end,
            run_cfg.total_steps)
        if run_cfg.sampler_type == "ddim":
            self.sampler = DDIMSampler(schedule=sched, eta=run_cfg.eta)
        elif run_cfg.sampler_type == "ddpm":
            self.sampler = DDPMSampler(schedule=sched)
        elif run_cfg.sampler_type == "dpm_solver":
            self.sampler = DPMSolverSampler(
                schedule=sched, algorithm_type=run_cfg.algorithm_type,
                order=run_cfg.order, solver_type=run_cfg.solver_type,
                lower_order_final=run_cfg.lower_order_final)
        else:
            raise NotImplementedError(run_cfg.sampler_type)

    # ------------------------------------------------------------------
    def preprocess(self, original: np.ndarray, edited: np.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, np.ndarray]:
        """Difference mask -> dilation -> full-mode pre-run -> mask pyramid
        -> planning (reference: diffusion/runner.py:149-178).

        Inputs are [H, W, C] or [1, H, W, C] in [0, 1].
        Returns (x0 original [1,H,W,C], x0 edited [1,H,W,C], mask [H,W]).
        """
        cfg, rc = self.model_cfg, self.run_cfg
        o = np.asarray(original, np.float32).reshape(1, cfg.resolution, cfg.resolution, -1)
        e = np.asarray(edited, np.float32).reshape(1, cfg.resolution, cfg.resolution, -1)
        o = data_transform(o[..., : cfg.in_ch], rc.rescaled)
        e = data_transform(e[..., : cfg.in_ch], rc.rescaled)
        mask = compute_difference_mask(o, e, eps=rc.eps)
        mask = dilate_mask(mask, rc.mask_dilate_radius)

        x0 = jnp.asarray(o)
        x1 = jnp.asarray(e)
        t0 = jnp.zeros((1,), jnp.float32)
        self.model.full(x0, t0)  # records meta + fills caches
        min_res = cfg.resolution // (2 ** (len(cfg.ch_mult) - 1))
        masks = downsample_mask(mask, min_res=min_res)
        self.model.set_masks(masks)
        self.last_edit_ratio = float(np.mean(mask))
        return x0, x1, mask

    # ------------------------------------------------------------------
    def generate(self, original: np.ndarray, edited: np.ndarray,
                 seed: int = 0) -> np.ndarray:
        """SDEdit: noise both images to ``noise_level``, denoise with the
        twin full/sparse trajectory, return the edited result in [0, 1]."""
        rc = self.run_cfg
        x0, x1, mask = self.preprocess(original, edited)
        key = jax.random.key(seed)
        key, ke, ks = jax.random.split(key, 3)
        e = jax.random.normal(ke, x0.shape, x0.dtype)

        seq = get_sampling_sequence(rc.sample_steps, rc.noise_level, rc.skip_type)
        t_last = jnp.int32(seq[-1])
        x0s = jnp.concatenate([x0, x1], axis=0)
        es = jnp.concatenate([e, e], axis=0)
        xts = self.sampler.q_sample(x0s, t_last, es)

        if rc.sampler_type == "dpm_solver":
            out, cache = self.sampler.sample_sige(
                self.module, self.model.params, self.model.plan,
                self.model.cache, xts, tuple(int(s) for s in seq),
                jnp.asarray(mask), x0, e, ks)
        else:
            out, cache = self.sampler.sample_sige(
                self.module, self.model.params, self.model.plan,
                self.model.cache, xts, jnp.asarray(seq), jnp.asarray(mask),
                x0, e, ks)
        self.model.cache = cache
        return inverse_data_transform(np.asarray(out[-1]), rc.rescaled)

    # ------------------------------------------------------------------
    def profile(self, original: np.ndarray, edited: np.ndarray,
                warmup: int = 20, iters: int = 100,
                mode: str = "sparse") -> Dict[str, float]:
        """Latency + MACs of a single forward (the reference times the
        sparse forward alone; reference: diffusion/runner.py:214-246)."""
        x0, x1, mask = self.preprocess(original, edited)
        t0 = jnp.zeros((1,), jnp.float32)
        ctx = SIGECtx(mode=mode)
        variables = {"params": self.model.params, "cache": self.model.cache,
                     "sige": self.model.plan}

        # NOTE: variables must be jit *arguments* — closing over them bakes
        # hundreds of MB of params into the program as constants, which the
        # remote-compile service rejects (HTTP 413) or uploads glacially.
        def fwd(v, x):
            return self.module.apply(v, x, t0, ctx=ctx)

        # per-step device time inside a fused scan trajectory — the
        # generate path's execution model (see utils.scan_timed)
        from ..utils import scan_timed
        latency_ms = scan_timed(fwd, variables, x1,
                                warmup=max(warmup // 4, 2),
                                iters=max(iters // 8, 4))

        from ..utils import traced_macs
        macs = traced_macs(self.module, variables, x1, t0, ctx=ctx)
        out = {
            "latency_ms": latency_ms,
            "macs_g": macs / 1e9,
            "edit_ratio": float(np.mean(mask)),
        }
        out.update(_hbm_entry(fwd, variables, x1, mode=mode))
        return out
