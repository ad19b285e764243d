"""Stable Diffusion runner: inpainting and SDEdit (img2img) with SIGE.

Reference flows (reference: stable-diffusion/runners/inpainting_runner.py,
sdedit_runner.py, run.py):
  * inpainting: full-mode encode of the init image, UNet sparse per step
    with latent blend ``q_sample(x0)*keep + img*edit``, decoder primed by
    a full decode of the init latent then sparse decode of the samples;
  * sdedit (img2img): twin latents (init/edited) through the sparse
    encoder, DDIM stochastic encode at strength * steps, twin-trajectory
    decode, decoder masks re-dilated by 40 before the sparse decode.

Text conditioning is pluggable: pass precomputed (uc, c) embedding arrays
[B, seq, context_dim] (e.g. from any CLIP text encoder); the harness does
not ship CLIP weights.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import compute_difference_mask, dilate_mask, downsample_mask
from ..models.sd import (
    SDUNetConfig,
    SDVAEConfig,
    SIGEDecoder,
    SIGEEncoder,
    SIGESDUNet,
)
from ..nn import SIGEModel
from ..samplers.sd_ddim import SDDDIMSampler


@dataclasses.dataclass(frozen=True)
class SDRunConfig:
    ddim_steps: int = 50
    guidance_scale: float = 7.5
    eta: float = 0.0
    scale_factor: float = 0.18215
    strength: float = 0.8          # img2img noise strength
    mask_eps: float = 2e-2
    mask_dilate_radius: int = 5
    decoder_dilate_radius: int = 40  # reference: sdedit_runner.py:100
    #: deepest UNet mask-pyramid resolution (min dim). 8 == the real SD
    #: UNet's deepest latent level at 512 (64/2^3); dry-run tiny configs
    #: override it to match their shallower pyramids.
    mask_min_res: int = 8


class SDRunner:
    def __init__(self, unet_cfg: SDUNetConfig = SDUNetConfig(),
                 vae_cfg: SDVAEConfig = SDVAEConfig(),
                 run_cfg: SDRunConfig = SDRunConfig(),
                 params: Optional[Dict] = None, seed: int = 0,
                 width: Optional[int] = None):
        self.unet_cfg, self.vae_cfg, self.run_cfg = unet_cfg, vae_cfg, run_cfg
        # hybrid window layout everywhere: window-resident chains at the
        # fine levels (incl. masked stale-K/V transformers), tile
        # execution where the canonical window would degenerate to the
        # whole canvas (the planner's max_cover rule; SD UNet sparse
        # 6.4 -> 5.5 ms on v5e vs pure tiles)
        self.unet = SIGEModel(SIGESDUNet(cfg=unet_cfg), layout="window")
        self.encoder = SIGEModel(SIGEEncoder(cfg=vae_cfg), layout="window")
        self.decoder = SIGEModel(SIGEDecoder(cfg=vae_cfg), layout="window")
        self.sampler = SDDDIMSampler(
            num_steps=run_cfg.ddim_steps, eta=run_cfg.eta,
            guidance_scale=run_cfg.guidance_scale)
        # rectangular canvases supported (the reference inpainting example
        # runs 512x1024 — stable-diffusion/README.md:40-44): ``width``
        # defaults to the square vae resolution
        R = vae_cfg.resolution
        self.width = width or R
        f = 2 ** (len(vae_cfg.ch_mult) - 1)
        self.latent_hw = (R // f, self.width // f)
        #: optional AutoencoderKL post_quant_conv as a pointwise latent map
        #: (weight [z, z], bias [z]); the matching quant_conv is folded into
        #: encoder.conv_out at conversion time (see utils/convert_sd.py)
        self.post_quant = None
        if params is not None:
            self.unet.params = params.get("unet")
            self.encoder.params = params.get("encoder")
            self.decoder.params = params.get("decoder")
            self.post_quant = params.get("post_quant")
        else:
            img = jnp.zeros((1, R, self.width, vae_cfg.in_channels),
                            jnp.float32)
            z = jnp.zeros((1, *self.latent_hw, unet_cfg.in_channels),
                          jnp.float32)
            t = jnp.zeros((1,), jnp.float32)
            c = jnp.zeros((1, 77, unet_cfg.context_dim), jnp.float32)
            self.unet.init(jax.random.key(seed), z, t, c)
            self.encoder.init(jax.random.key(seed + 1), img)
            self.decoder.init(jax.random.key(seed + 2), z)

    # ------------------------------------------------------------------
    def encode(self, img: jnp.ndarray, mode: str = "full") -> jnp.ndarray:
        """Image [1, R, W, 3] in [-1, 1] -> scaled latent mode
        (deterministic: uses the posterior mean)."""
        if mode == "full":
            moments = self.encoder.full(img)
        else:
            moments = self.encoder.sparse(img)
        mean = moments[..., : self.vae_cfg.z_channels]
        return mean * self.run_cfg.scale_factor

    def _pre_decode(self, z_scaled: jnp.ndarray) -> jnp.ndarray:
        """Unscale + apply post_quant_conv (reference:
        ldm/models/autoencoder.py:77-81)."""
        z = z_scaled / self.run_cfg.scale_factor
        if self.post_quant is not None:
            w, b = self.post_quant
            z = jnp.einsum("bhwc,pc->bhwp", z, jnp.asarray(w)) + jnp.asarray(b)
        return z

    def _default_contexts(self, uc, c):
        if c is None:
            c = jnp.zeros((1, 77, self.unet_cfg.context_dim), jnp.float32)
        if uc is None and self.run_cfg.guidance_scale != 1.0:
            uc = jnp.zeros_like(c)
        return uc, c

    # ------------------------------------------------------------------
    def inpaint(self, init_img: np.ndarray, mask: np.ndarray,
                uc=None, c=None, seed: int = 0) -> np.ndarray:
        """Reference: inpainting_runner.py:27-77. ``mask`` is the edit
        region at image resolution; returns the image in [-1, 1]."""
        rc = self.run_cfg
        img = jnp.asarray(init_img, jnp.float32).reshape(
            1, self.vae_cfg.resolution, self.width, -1)
        init_latent = self.encode(img)
        uc, c = self._default_contexts(uc, c)

        masks = downsample_mask(np.asarray(mask, bool),
                                min_res=rc.mask_min_res, dilation=1)
        blend = 1.0 - jnp.asarray(
            masks[self.latent_hw], jnp.float32)[None, :, :, None]

        # prime UNet caches/meta + plan
        key = jax.random.key(seed)
        key, kx = jax.random.split(key)
        x_T = jax.random.normal(kx, init_latent.shape, init_latent.dtype)
        t0 = jnp.zeros((init_latent.shape[0] * (2 if uc is not None else 1),),
                       jnp.float32)
        full_in = jnp.concatenate([init_latent] * (2 if uc is not None else 1))
        ctx_in = jnp.concatenate([uc, c]) if uc is not None else c
        self.unet.full(full_in, t0, ctx_in)
        self.unet.set_masks(masks)

        samples, cache = self.sampler.inpaint_sige(
            self.unet.module, self.unet.params, self.unet.plan,
            self.unet.cache, x_T, init_latent, blend, uc, c, key,
            total_steps=rc.ddim_steps)
        self.unet.cache = cache

        # decode: prime with full decode of init latent, then sparse decode
        self.decoder.full(self._pre_decode(init_latent))
        self.decoder.set_masks(masks)
        out = self.decoder.sparse(self._pre_decode(samples))
        return np.asarray(out[0])

    # ------------------------------------------------------------------
    def sdedit(self, init_img: np.ndarray, edited_img: np.ndarray,
               uc=None, c=None, seed: int = 0) -> np.ndarray:
        """Reference: sdedit_runner.py + ddim.py:345-393."""
        rc = self.run_cfg
        R = self.vae_cfg.resolution
        x0 = jnp.asarray(init_img, jnp.float32).reshape(1, R, self.width, -1)
        x1 = jnp.asarray(edited_img, jnp.float32).reshape(1, R, self.width, -1)
        uc, c = self._default_contexts(uc, c)

        diff = compute_difference_mask(np.asarray(x0[0]), np.asarray(x1[0]),
                                       eps=rc.mask_eps)
        diff = dilate_mask(diff, rc.mask_dilate_radius)
        masks = downsample_mask(diff, min_res=rc.mask_min_res, dilation=1)

        # sparse encode of the edited image over init-image caches
        init_latent = self.encode(x0)
        self.encoder.set_masks(masks)
        edited_latent = self.encode(x1, mode="sparse")

        t_enc = int(rc.strength * rc.ddim_steps)
        key = jax.random.key(seed)
        noise = jax.random.normal(key, edited_latent.shape, edited_latent.dtype)
        z_init = self.sampler.stochastic_encode(init_latent, t_enc - 1, noise)
        z_edit = self.sampler.stochastic_encode(edited_latent, t_enc - 1, noise)

        # prime UNet with one full pass + plan at latent resolutions
        t0 = jnp.zeros((z_init.shape[0] * (2 if uc is not None else 1),), jnp.float32)
        full_in = jnp.concatenate([z_init] * (2 if uc is not None else 1))
        ctx_in = jnp.concatenate([uc, c]) if uc is not None else c
        self.unet.full(full_in, t0, ctx_in)
        self.unet.set_masks(masks)

        s_init, s_edit, cache = self.sampler.img2img_decode_sige(
            self.unet.module, self.unet.params, self.unet.plan,
            self.unet.cache, z_init, z_edit, uc, c, t_start=t_enc)
        self.unet.cache = cache

        # decoder: mask re-dilated by 40 at image res, pyramid to min 4
        dec_mask = dilate_mask(diff, rc.decoder_dilate_radius)
        dec_masks = downsample_mask(dec_mask, min_res=(4, 4), dilation=0)
        self.decoder.full(self._pre_decode(s_init))
        self.decoder.set_masks(dec_masks)
        out = self.decoder.sparse(self._pre_decode(s_edit))
        return np.asarray(out[0])
