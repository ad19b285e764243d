"""Progressive Distillation sampler (v/x-eps hybrid prediction, logsnr
schedule). Reference: diffusion/samplers/pd_sampler.py.

The model emits 6 channels: an x0 prediction and an ε prediction, blended
by σ² weighting, clipped, then stepped deterministically (DDIM-style with
the logsnr parameterization). The few-step trajectory runs as one fused
lax.scan with the SDEdit outside-mask blending.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp

from ..nn.module import SIGECtx

LOGSNR_MIN, LOGSNR_MAX = -20.0, 20.0


def logsnr_schedule(t):
    """Cosine logsnr schedule over u in [0, 1]
    (reference: pd_sampler.py:11-14)."""
    b = math.atan(math.exp(-0.5 * LOGSNR_MAX))
    a = math.atan(math.exp(-0.5 * LOGSNR_MIN)) - b
    return -2.0 * jnp.log(jnp.tan(a * jnp.asarray(t, jnp.float32) + b))


@dataclasses.dataclass(frozen=True, eq=False)
class PDSampler:
    total_steps: int = 8

    def q_sample(self, x0, t, e):
        """z_t with logsnr((t+1)/total) (reference: pd_sampler.py:71-79)."""
        logsnr = logsnr_schedule((jnp.asarray(t, jnp.float32) + 1) / self.total_steps)
        alpha = jnp.sqrt(jax.nn.sigmoid(logsnr))
        std = jnp.sqrt(jax.nn.sigmoid(-logsnr))
        return x0 * alpha + e * std

    @staticmethod
    def _predict(z, model_output, logsnr):
        """Blend x0 / eps heads (reference: pd_sampler.py:27-64)."""
        _x, _eps = jnp.split(model_output, 2, axis=-1)
        x_from_eps = jnp.sqrt(1.0 + jnp.exp(-logsnr)) * (
            z - _eps / jnp.sqrt(1.0 + jnp.exp(logsnr)))
        wx = jax.nn.sigmoid(-logsnr)
        x = jnp.clip(wx * _x + (1.0 - wx) * x_from_eps, -1.0, 1.0)
        eps = jnp.sqrt(1.0 + jnp.exp(logsnr)) * (
            z - x / jnp.sqrt(1.0 + jnp.exp(-logsnr)))
        return x, eps

    def _post_process(self, x, t_next, mask, gt_x0, gt_e):
        gt_xt = self.q_sample(gt_x0, t_next, gt_e)
        m = mask[None, :, :, None].astype(x.dtype)
        blended = gt_xt[0] * (1 - m[0]) + x[-1] * m[0]
        if x.shape[0] == 2:
            return jnp.stack([gt_xt[0], blended], axis=0)
        return blended[None]

    @partial(jax.jit, static_argnames=("self", "module"))
    def sample_sige(self, module, params, plan, cache, xt, seq, mask,
                    gt_x0, gt_e, key=None):
        seq = jnp.asarray(seq, jnp.int32)
        seq_next = jnp.concatenate([jnp.array([-1], jnp.int32), seq[:-1]])
        steps = jnp.stack([seq[::-1], seq_next[::-1]], axis=1)

        def model_step(x, logsnr, cache):
            ls = jnp.full((1,), logsnr, jnp.float32)
            y0, mut = module.apply(
                {"params": params, "cache": cache},
                x[:1], ls, ctx=SIGECtx(mode="full"), mutable=["cache"])
            y1 = module.apply(
                {"params": params, "cache": mut["cache"], "sige": plan},
                x[1:], ls, ctx=SIGECtx(mode="sparse"))
            return jnp.concatenate([y0, y1], axis=0), mut["cache"]

        def body(carry, ij):
            x, cache = carry
            i, j = ij[0], ij[1]
            logsnr_t = logsnr_schedule((i.astype(jnp.float32) + 1) / self.total_steps)
            logsnr_s = logsnr_schedule((j.astype(jnp.float32) + 1) / self.total_steps)
            out, cache = model_step(x, logsnr_t, cache)
            x_pred, eps_pred = self._predict(x, out, logsnr_t)
            std_s = jnp.sqrt(jax.nn.sigmoid(-logsnr_s))
            alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))
            z_s = alpha_s * x_pred + std_s * eps_pred
            x = jnp.where(i == 0, x_pred, z_s)
            x = self._post_process(x, j, mask, gt_x0, gt_e)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(body, (xt, cache), steps)
        return x, cache

    @partial(jax.jit, static_argnames=("self", "module"))
    def sample_dense(self, module, params, xt, seq, mask, gt_x0, gt_e,
                     key=None):
        seq = jnp.asarray(seq, jnp.int32)
        seq_next = jnp.concatenate([jnp.array([-1], jnp.int32), seq[:-1]])
        steps = jnp.stack([seq[::-1], seq_next[::-1]], axis=1)

        def body(x, ij):
            i, j = ij[0], ij[1]
            logsnr_t = logsnr_schedule((i.astype(jnp.float32) + 1) / self.total_steps)
            logsnr_s = logsnr_schedule((j.astype(jnp.float32) + 1) / self.total_steps)
            ls = jnp.full((x.shape[0],), logsnr_t, jnp.float32)
            out = module.apply({"params": params}, x, ls, ctx=SIGECtx(mode="dense"))
            x_pred, eps_pred = self._predict(x, out, logsnr_t)
            std_s = jnp.sqrt(jax.nn.sigmoid(-logsnr_s))
            alpha_s = jnp.sqrt(jax.nn.sigmoid(logsnr_s))
            z_s = alpha_s * x_pred + std_s * eps_pred
            x = jnp.where(i == 0, x_pred, z_s)
            x = self._post_process(x, j, mask, gt_x0, gt_e)
            return x, None

        x, _ = jax.lax.scan(body, xt, steps)
        return x
