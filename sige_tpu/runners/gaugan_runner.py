"""GauGAN runner: semantic-map editing with SPADE generators.

Reference flow (reference: gaugan/runner.py:79-195): assemble one-hot
label + instance-edge semantics, compute the difference mask between
original and edited semantics (eps=1e-3), run full mode on the original,
build the mask pyramid down to the latent (sh, sw), then run sparse mode
on the edited semantics. Single-shot (no denoising loop).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import compute_difference_mask, dilate_mask, downsample_mask
from ..models.gaugan import SIGEFusedSPADEGenerator, SPADEGenConfig
from ..nn import SIGEModel
from ..nn.module import SIGECtx
from .diffusion_runner import _maybe_bf16_kernels
from .common import _hbm_entry


@dataclasses.dataclass(frozen=True)
class GauGANRunConfig:
    input_nc: int = 35                 # label classes (one-hot)
    use_instance: bool = True
    mask_eps: float = 1e-3
    mask_dilate_radius: int = 1
    downsample_dilate_radius: int = 2


def get_edges(instance: np.ndarray) -> np.ndarray:
    """Instance boundary map [H, W] float (reference: gaugan/runner.py:79-85)."""
    t = np.asarray(instance)
    edge = np.zeros(t.shape, bool)
    edge[:, 1:] |= t[:, 1:] != t[:, :-1]
    edge[:, :-1] |= t[:, 1:] != t[:, :-1]
    edge[1:, :] |= t[1:, :] != t[:-1, :]
    edge[:-1, :] |= t[1:, :] != t[:-1, :]
    return edge.astype(np.float32)


class GauGANRunner:
    def __init__(self, model_cfg: SPADEGenConfig = SPADEGenConfig(),
                 run_cfg: GauGANRunConfig = GauGANRunConfig(),
                 params=None, seed: int = 0, bucket_min: int = 2,
                 module=None, layout: str = "auto", bf16_kernels=None):
        self.model_cfg = model_cfg
        self.run_cfg = run_cfg
        self.module = module or SIGEFusedSPADEGenerator(cfg=model_cfg)
        # chain_nesting follows the model's window_chain flag: the SPADE
        # blocks thread window chains across the bare 2x upsamples, which
        # needs the planner's cross-resolution containment growth
        nesting = (getattr(model_cfg, "window_chain", False)
                   and isinstance(self.module, SIGEFusedSPADEGenerator))
        self.model = SIGEModel(self.module, params, bucket_min=bucket_min,
                               layout=layout, chain_nesting=nesting)
        if params is None:
            h = round(model_cfg.crop_size / model_cfg.aspect_ratio)
            dummy = jnp.zeros((1, h, model_cfg.crop_size, model_cfg.semantic_nc),
                              jnp.float32)
            self.model.init(jax.random.key(seed), dummy)
        _maybe_bf16_kernels(self.model, bf16_kernels)

    def preprocess_input(self, label: np.ndarray,
                         instance: Optional[np.ndarray] = None) -> np.ndarray:
        """[H, W] integer label (+instance) maps -> [1, H, W, semantic_nc]
        one-hot + edge semantics (reference: gaugan/runner.py:87-106)."""
        rc = self.run_cfg
        label = np.asarray(label, np.int64)
        H, W = label.shape
        onehot = np.zeros((H, W, rc.input_nc), np.float32)
        np.put_along_axis(onehot, label[:, :, None], 1.0, axis=2)
        chans = [onehot]
        if rc.use_instance:
            if instance is None:
                instance = label
            chans.append(get_edges(instance)[:, :, None])
        return np.concatenate(chans, axis=-1)[None]

    def preprocess(self, original_sem: np.ndarray, edited_sem: np.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, np.ndarray]:
        """Plan sparse inference from a pair of semantics maps
        [1, H, W, semantic_nc]."""
        rc = self.run_cfg
        mask = compute_difference_mask(original_sem[0], edited_sem[0],
                                       eps=rc.mask_eps)
        mask = dilate_mask(mask, rc.mask_dilate_radius)
        x0 = jnp.asarray(original_sem)
        x1 = jnp.asarray(edited_sem)
        self.model.full(x0)
        masks = downsample_mask(
            mask, min_res=self.model_cfg.latent_hw,
            dilation=rc.downsample_dilate_radius)
        self.model.set_masks(masks)
        self.last_edit_ratio = float(np.mean(mask))
        return x0, x1, mask

    def generate(self, original_sem: np.ndarray, edited_sem: np.ndarray
                 ) -> np.ndarray:
        """Returns the generated edited image [H, W, 3] in [-1, 1]."""
        x0, x1, mask = self.preprocess(original_sem, edited_sem)
        out = self.model.sparse(x1)
        return np.asarray(out[0])

    def profile(self, original_sem: np.ndarray, edited_sem: np.ndarray,
                warmup: int = 20, iters: int = 100,
                mode: str = "sparse") -> Dict[str, float]:
        x0, x1, mask = self.preprocess(original_sem, edited_sem)
        ctx = SIGECtx(mode=mode)
        variables = {"params": self.model.params, "cache": self.model.cache,
                     "sige": self.model.plan}

        # variables as jit args (closure constants overflow remote compile)
        def fwd(v, x):
            return self.module.apply(v, x, ctx=ctx)

        # per-step device time inside a fused scan trajectory (GauGAN
        # has no denoising loop, but interactive editing replays the
        # generator per edit — same amortized-dispatch model;
        # see utils.scan_timed)
        from ..utils import scan_timed
        latency_ms = scan_timed(fwd, variables, x1,
                                warmup=max(warmup // 4, 2),
                                iters=max(iters // 8, 4))

        from ..utils import traced_macs
        macs = traced_macs(self.module, variables, x1, ctx=ctx)
        out = {"latency_ms": latency_ms, "macs_g": macs / 1e9,
               "edit_ratio": float(np.mean(mask))}
        out.update(_hbm_entry(fwd, variables, x1, mode=mode))
        return out
