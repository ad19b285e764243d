"""DDIM / DDPM samplers as single fused lax.scan loops.

The reference drives each denoising step from Python, switching the model
between full and sparse mode per step
(reference: diffusion/samplers/ddim_ddpm_sampler.py:60-73,
base_sampler.py:14-49). Here the whole trajectory is ONE jitted
``lax.scan``: the carry holds (x, scatter-cache collection, rng key), the
body runs the full pass on the original-trajectory row (refreshing caches
and folded affines) then the sparse pass on the edited row, applies the
DDIM/DDPM update, and blends the outside-mask region back to the
ground-truth trajectory. One compile per (shape, plan-bucket); zero host
round-trips inside the loop.

SDEdit semantics per step (reference: base_sampler.py:36-49):
  row 0 (original trajectory) is *replaced* by the deterministic
  ground-truth xt; row 1 keeps generated content only inside the
  difference mask.
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp

from ..nn.module import SIGECtx
from .diffusion import DiffusionSchedule


@dataclasses.dataclass(frozen=True, eq=False)
class _BaseSampler:
    schedule: DiffusionSchedule
    eta: float = 0.0  # DDIM only

    # ---- the per-step x-update; implemented by DDIM / DDPM ---------------
    def update(self, x, et, at, atm1, t, noise):
        raise NotImplementedError

    def q_sample(self, x0, t, e):
        return self.schedule.q_sample(x0, t, e)

    def _model_step_sige(self, module, params, plan, cache, x, t):
        """Twin forward: full on row 0 (refresh caches), sparse on row 1
        (reference: ddim_ddpm_sampler.py:60-73)."""
        y0, mut = module.apply(
            {"params": params, "cache": cache},
            x[:1], t[:1], ctx=SIGECtx(mode="full"),
            mutable=["cache"],
        )
        cache = mut["cache"]
        y1 = module.apply(
            {"params": params, "cache": cache, "sige": plan},
            x[1:], t[1:], ctx=SIGECtx(mode="sparse"),
        )
        return jnp.concatenate([y0, y1], axis=0), cache

    def _post_process(self, x, t_next, mask, gt_x0, gt_e):
        gt_xt = self.q_sample(gt_x0, t_next, gt_e)  # [1, H, W, C]
        m = mask[None, :, :, None].astype(x.dtype)
        blended = gt_xt[0] * (1 - m[0]) + x[-1] * m[0]
        if x.shape[0] == 2:
            return jnp.stack([gt_xt[0], blended], axis=0)
        return blended[None]

    # ---- public entry points --------------------------------------------
    @partial(jax.jit, static_argnames=("self", "module"))
    def sample_sige(self, module, params, plan, cache, xt, seq, mask,
                    gt_x0, gt_e, key):
        """Run the full SDEdit trajectory for a SIGE model.

        Args:
          module: the SIGE-wired flax module (static).
          params/plan/cache: variable collections (cache pre-filled by one
            full pass — required for set_masks planning anyway).
          xt: [2, H, W, C] noised (original, edited) at seq[-1].
          seq: [S] int32 ascending timestep sequence.
          mask: [H, W] difference mask (bool).
          gt_x0 / gt_e: [1, H, W, C] ground-truth image / fixed noise.
          key: PRNG key for the sampler's stochastic terms.

        Returns: (x0 [2, H, W, C], final cache).
        """
        seq = jnp.asarray(seq, jnp.int32)
        seq_next = jnp.concatenate([jnp.array([-1], jnp.int32), seq[:-1]])
        steps = jnp.stack([seq[::-1], seq_next[::-1]], axis=1)  # [S, 2]

        def body(carry, ij):
            x, cache, key = carry
            i, j = ij[0], ij[1]
            t = jnp.full((x.shape[0],), i, jnp.float32)
            at = self.schedule.alpha(i)
            atm1 = self.schedule.alpha(j)
            et, cache = self._model_step_sige(module, params, plan, cache, x, t)
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, x.dtype)
            x = self.update(x, et, at, atm1, i, noise)
            x = self._post_process(x, j, mask, gt_x0, gt_e)
            return (x, cache, key), None

        (x, cache, _), _ = jax.lax.scan(body, (xt, cache, key), steps)
        return x, cache

    @partial(jax.jit, static_argnames=("self", "module"))
    def sample_dense(self, module, params, xt, seq, mask, gt_x0, gt_e, key):
        """Dense-baseline trajectory (edited image only, batch 1;
        reference runs vanilla models this way: runner.py:203-205)."""
        seq = jnp.asarray(seq, jnp.int32)
        seq_next = jnp.concatenate([jnp.array([-1], jnp.int32), seq[:-1]])
        steps = jnp.stack([seq[::-1], seq_next[::-1]], axis=1)

        def body(carry, ij):
            x, key = carry
            i, j = ij[0], ij[1]
            t = jnp.full((x.shape[0],), i, jnp.float32)
            at = self.schedule.alpha(i)
            atm1 = self.schedule.alpha(j)
            et = module.apply({"params": params}, x, t, ctx=SIGECtx(mode="dense"))
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, x.dtype)
            x = self.update(x, et, at, atm1, i, noise)
            x = self._post_process(x, j, mask, gt_x0, gt_e)
            return (x, key), None

        (x, _), _ = jax.lax.scan(body, (xt, key), steps)
        return x


class DDIMSampler(_BaseSampler):
    """Reference: diffusion/samplers/ddim_sampler.py:11-27."""

    def update(self, x, et, at, atm1, t, noise):
        x0_t = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        c1 = self.eta * jnp.sqrt((1 - at / atm1) * (1 - atm1) / (1 - at))
        c2 = jnp.sqrt((1 - atm1) - c1**2)
        return jnp.sqrt(atm1) * x0_t + c1 * noise + c2 * et


class DDPMSampler(_BaseSampler):
    """Reference: diffusion/samplers/ddpm_sampler.py:11-32."""

    def update(self, x, et, at, atm1, t, noise):
        beta_t = 1 - at / atm1
        x0 = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (
            jnp.sqrt(atm1) * beta_t * x0
            + jnp.sqrt(1 - beta_t) * (1 - atm1) * x
        ) / (1.0 - at)
        nz_mask = 1.0 - (jnp.asarray(t) == 0).astype(x.dtype)
        return mean + nz_mask * jnp.exp(0.5 * jnp.log(beta_t)) * noise
