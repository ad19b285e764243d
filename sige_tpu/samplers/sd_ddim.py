"""Stable Diffusion DDIM sampler: classifier-free guidance, latent-space
inpainting blend, and the twin-trajectory SIGE img2img decode.

Reference: stable-diffusion/ldm/models/diffusion/ddim.py +
ldm/modules/diffusionmodules/util.py:42-72. All per-index schedule
coefficients are precomputed host-side in float64; each flow is one
jitted lax.scan.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.module import SIGECtx


def sd_beta_schedule(linear_start=0.00085, linear_end=0.0120, n=1000):
    """ldm's "linear" schedule is sqrt-linear
    (reference: ldm/modules/diffusionmodules/util.py make_beta_schedule)."""
    return np.linspace(linear_start**0.5, linear_end**0.5, n, dtype=np.float64) ** 2


def make_ddim_timesteps(num_ddim_steps: int, num_ddpm_steps: int = 1000,
                        method: str = "uniform") -> np.ndarray:
    if method == "uniform":
        c = num_ddpm_steps // num_ddim_steps
        ts = np.arange(0, num_ddpm_steps, c)
    elif method == "quad":
        ts = (np.linspace(0, np.sqrt(num_ddpm_steps * 0.8), num_ddim_steps) ** 2).astype(int)
    else:
        raise NotImplementedError(method)
    return ts + 1  # reference: util.py:53


@dataclasses.dataclass(frozen=True, eq=False)
class SDDDIMSampler:
    """DDIM over the SD discrete schedule."""

    num_steps: int = 50
    eta: float = 0.0
    guidance_scale: float = 7.5
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    ddpm_steps: int = 1000

    def __post_init__(self):
        betas = sd_beta_schedule(self.linear_start, self.linear_end, self.ddpm_steps)
        acp = np.cumprod(1.0 - betas)
        ts = make_ddim_timesteps(self.num_steps, self.ddpm_steps)
        alphas = acp[ts]
        alphas_prev = np.concatenate([[acp[0]], acp[ts[:-1]]])
        sigmas = self.eta * np.sqrt(
            (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
        object.__setattr__(self, "timesteps", ts.astype(np.int32))
        object.__setattr__(self, "alphas_cumprod", jnp.asarray(acp, jnp.float32))
        object.__setattr__(self, "ddim_alphas", jnp.asarray(alphas, jnp.float32))
        object.__setattr__(self, "ddim_alphas_prev", jnp.asarray(alphas_prev, jnp.float32))
        object.__setattr__(self, "ddim_sigmas", jnp.asarray(sigmas, jnp.float32))

    # ------------------------------------------------------------------
    def q_sample(self, x0, t, noise):
        a = self.alphas_cumprod[t]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def stochastic_encode(self, x0, index, noise):
        """Noise x0 to ddim step ``index`` (reference: ddim.py:293-308)."""
        a = self.ddim_alphas[index]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    # ------------------------------------------------------------------
    def _apply_model(self, module, variables, x, t, uc, c, mode: str):
        """CFG double-batch apply (reference: ddim.py:252-259). x is
        [B, H, W, C]; contexts uc/c are [B, seq, d]."""
        if self.guidance_scale == 1.0 or uc is None:
            return module.apply(
                variables, x, t, c, ctx=SIGECtx(mode=mode))
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        c_in = jnp.concatenate([uc, c], axis=0)
        out = module.apply(variables, x_in, t_in, c_in, ctx=SIGECtx(mode=mode))
        e_uncond, e_cond = jnp.split(out, 2, axis=0)
        return e_uncond + self.guidance_scale * (e_cond - e_uncond)

    def _apply_model_full(self, module, params, cache, x, t, uc, c):
        """Full-mode apply that refreshes caches (batch-2 uncond+cond lives
        in the caches; reference: ddim.py:183-201 need_result=False)."""
        if self.guidance_scale == 1.0 or uc is None:
            x_in, t_in, c_in = x, t, c
        else:
            x_in = jnp.concatenate([x, x], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
            c_in = jnp.concatenate([uc, c], axis=0)
        out, mut = module.apply(
            {"params": params, "cache": cache}, x_in, t_in, c_in,
            ctx=SIGECtx(mode="full"), mutable=["cache"])
        if self.guidance_scale != 1.0 and uc is not None:
            e_uncond, e_cond = jnp.split(out, 2, axis=0)
            out = e_uncond + self.guidance_scale * (e_cond - e_uncond)
        return out, mut["cache"]

    def _step(self, x, e_t, index):
        a_t = self.ddim_alphas[index]
        a_prev = self.ddim_alphas_prev[index]
        sigma_t = self.ddim_sigmas[index]
        sqrt_1m_at = jnp.sqrt(1.0 - a_t)
        pred_x0 = (x - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1.0 - a_prev - sigma_t**2) * e_t
        return jnp.sqrt(a_prev) * pred_x0 + dir_xt  # eta=0: no noise term

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnames=("self", "module", "total_steps"))
    def inpaint_sige(self, module, params, plan, cache, img, x0, blend_mask,
                     uc, c, key, total_steps: int):
        """Latent inpainting (reference: ddim.py:160-230): per step blend
        ``img = q_sample(x0) * blend_mask + img * (1 - blend_mask)``
        (blend_mask = keep region; q_sample uses fresh noise each step like
        the reference), refresh caches with a full pass on the noised
        original, then sparse-step the image."""
        ts = jnp.asarray(self.timesteps[:total_steps], jnp.int32)
        idxs = jnp.arange(total_steps, dtype=jnp.int32)
        steps = jnp.stack([ts[::-1], idxs[::-1]], axis=1)

        def body(carry, step_ix):
            img, cache, key = carry
            step, index = step_ix[0], step_ix[1]
            t = jnp.full((img.shape[0],), step, jnp.int32)
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x0.shape, x0.dtype)
            img_orig = self.q_sample(x0, step, noise)
            img = img_orig * blend_mask + (1.0 - blend_mask) * img
            # full pass refreshes caches; its output is unused (the
            # reference's need_result=False) and XLA dead-code-eliminates it
            _, cache = self._apply_model_full(module, params, cache, img_orig, t, uc, c)
            variables = {"params": params, "cache": cache, "sige": plan}
            e_t = self._apply_model(module, variables, img, t, uc, c, "sparse")
            img = self._step(img, e_t, index)
            return (img, cache, key), None

        (img, cache, _), _ = jax.lax.scan(body, (img, cache, key), steps)
        return img, cache

    @partial(jax.jit, static_argnames=("self", "module", "t_start"))
    def img2img_decode_sige(self, module, params, plan, cache, x_init,
                            x_edited, uc, c, t_start: int):
        """Twin-trajectory SIGE img2img (reference: ddim.py:345-393)."""
        ts = jnp.asarray(self.timesteps[:t_start], jnp.int32)
        idxs = jnp.arange(t_start, dtype=jnp.int32)
        steps = jnp.stack([ts[::-1], idxs[::-1]], axis=1)

        def body(carry, step_ix):
            x_init, x_edited, cache = carry
            step, index = step_ix[0], step_ix[1]
            t = jnp.full((x_init.shape[0],), step, jnp.int32)
            e_init, cache = self._apply_model_full(module, params, cache, x_init, t, uc, c)
            x_init = self._step(x_init, e_init, index)
            variables = {"params": params, "cache": cache, "sige": plan}
            e_edit = self._apply_model(module, variables, x_edited, t, uc, c, "sparse")
            x_edited = self._step(x_edited, e_edit, index)
            return (x_init, x_edited, cache), None

        (x_init, x_edited, cache), _ = jax.lax.scan(
            body, (x_init, x_edited, cache), steps)
        return x_init, x_edited, cache

    @partial(jax.jit, static_argnames=("self", "module", "t_start"))
    def decode_dense(self, module, params, x, uc, c, t_start: int):
        """Dense img2img decode (reference: ddim.py:310-342)."""
        ts = jnp.asarray(self.timesteps[:t_start], jnp.int32)
        idxs = jnp.arange(t_start, dtype=jnp.int32)
        steps = jnp.stack([ts[::-1], idxs[::-1]], axis=1)

        def body(x, step_ix):
            step, index = step_ix[0], step_ix[1]
            t = jnp.full((x.shape[0],), step, jnp.int32)
            e_t = self._apply_model(module, {"params": params}, x, t, uc, c, "dense")
            return self._step(x, e_t, index), None

        x, _ = jax.lax.scan(body, x, steps)
        return x
