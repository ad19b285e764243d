"""Progressive Distillation runner: SDEdit with the PD few-step sampler.

Reference flow: same preprocess -> twin-trajectory loop as the DDPM
runner but with the logsnr schedule and 6-channel (x0, eps) prediction
(reference: diffusion/runner.py PD branches +
diffusion/samplers/pd_sampler.py; configs church_pd{128,256}-*.yml).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import compute_difference_mask, dilate_mask, downsample_mask
from ..models.pd import PDUNetConfig, SIGEPDUNet
from ..nn import SIGEModel
from ..nn.module import SIGECtx
from ..samplers import PDSampler, get_sampling_sequence, logsnr_schedule
from .common import _hbm_entry
from .diffusion_runner import (_maybe_bf16_kernels, data_transform,
                               inverse_data_transform)


@dataclasses.dataclass(frozen=True)
class PDRunConfig:
    """Sampling config (reference: configs/church_pd256-sige.yml)."""

    total_steps: int = 8
    sample_steps: int = 5
    noise_level: int = 5
    skip_type: str = "uniform"
    eps: float = 2e-2
    mask_dilate_radius: int = 2
    rescaled: bool = True


class PDRunner:
    """Drives a (SIGE) PD U-Net through SDEdit generation/profiling."""

    def __init__(self, model_cfg: PDUNetConfig = PDUNetConfig(),
                 run_cfg: PDRunConfig = PDRunConfig(),
                 params=None, seed: int = 0, bucket_min: int = 2,
                 layout: str = "auto", bf16_kernels=None):
        self.model_cfg = model_cfg
        self.run_cfg = run_cfg
        self.module = SIGEPDUNet(cfg=model_cfg)
        self.model = SIGEModel(self.module, params, bucket_min=bucket_min,
                               layout=layout)
        if params is None:
            dummy = jnp.zeros(
                (1, model_cfg.resolution, model_cfg.resolution, model_cfg.in_ch),
                jnp.float32)
            self.model.init(jax.random.key(seed), dummy,
                            jnp.zeros((1,), jnp.float32))
        _maybe_bf16_kernels(self.model, bf16_kernels)
        self.sampler = PDSampler(total_steps=run_cfg.total_steps)

    # ------------------------------------------------------------------
    def preprocess(self, original: np.ndarray, edited: np.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, np.ndarray]:
        cfg, rc = self.model_cfg, self.run_cfg
        R = cfg.resolution
        o = np.asarray(original, np.float32).reshape(1, R, R, -1)
        e = np.asarray(edited, np.float32).reshape(1, R, R, -1)
        o = data_transform(o[..., : cfg.in_ch], rc.rescaled)
        e = data_transform(e[..., : cfg.in_ch], rc.rescaled)
        mask = compute_difference_mask(o, e, eps=rc.eps)
        mask = dilate_mask(mask, rc.mask_dilate_radius)

        x0, x1 = jnp.asarray(o), jnp.asarray(e)
        ls0 = logsnr_schedule(jnp.full((1,), rc.noise_level / rc.total_steps))
        self.model.full(x0, ls0)
        min_res = cfg.resolution // (2 ** (len(cfg.ch_mult) - 1))
        masks = downsample_mask(mask, min_res=min_res)
        self.model.set_masks(masks)
        self.last_edit_ratio = float(np.mean(mask))
        return x0, x1, mask

    # ------------------------------------------------------------------
    def generate(self, original: np.ndarray, edited: np.ndarray,
                 seed: int = 0) -> np.ndarray:
        rc = self.run_cfg
        x0, x1, mask = self.preprocess(original, edited)
        key = jax.random.key(seed)
        e = jax.random.normal(key, x0.shape, x0.dtype)

        seq = get_sampling_sequence(rc.sample_steps, rc.noise_level,
                                    rc.skip_type)
        x0s = jnp.concatenate([x0, x1], axis=0)
        es = jnp.concatenate([e, e], axis=0)
        xts = self.sampler.q_sample(x0s, jnp.int32(seq[-1]), es)
        out, cache = self.sampler.sample_sige(
            self.module, self.model.params, self.model.plan,
            self.model.cache, xts, jnp.asarray(seq), jnp.asarray(mask),
            x0, e)
        self.model.cache = cache
        return inverse_data_transform(np.asarray(out[-1]), rc.rescaled)

    # ------------------------------------------------------------------
    def profile(self, original: np.ndarray, edited: np.ndarray,
                warmup: int = 20, iters: int = 100,
                mode: str = "sparse") -> Dict[str, float]:
        x0, x1, mask = self.preprocess(original, edited)
        ls = logsnr_schedule(
            jnp.full((1,), self.run_cfg.noise_level / self.run_cfg.total_steps))
        ctx = SIGECtx(mode=mode)
        variables = {"params": self.model.params, "cache": self.model.cache,
                     "sige": self.model.plan}

        # variables as jit args (closure constants overflow remote compile)
        def fwd(v, x):
            return self.module.apply(v, x, ls, ctx=ctx)

        # per-step device time inside a fused scan trajectory — the
        # generate path's execution model (see utils.scan_timed)
        from ..utils import scan_timed
        latency_ms = scan_timed(fwd, variables, x1,
                                warmup=max(warmup // 4, 2),
                                iters=max(iters // 8, 4))

        from ..utils import traced_macs
        macs = traced_macs(self.module, variables, x1, ls, ctx=ctx)
        out = {"latency_ms": latency_ms, "macs_g": macs / 1e9,
               "edit_ratio": float(np.mean(mask))}
        out.update(_hbm_entry(fwd, variables, x1, mode=mode))
        return out
