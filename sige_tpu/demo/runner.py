"""Interactive demo runner: one-time full pre-compute, then sparse-only
edits with per-step cache slots.

The reference demo's key trick (reference: diffusion_demo/runner.py,
samplers/ddim_ddpm_sampler.py:60-66): unlike the benchmark runners there
is NO per-step full pass — a single full sampling run of the *base* image
fills one cache slot per denoising step (``set_cache_id(step)``), and each
edit then runs sparse-only steps reading its matching slot. "Apply" commits
an edit via ``sparse_update`` so caches advance without a full pass.

TPU-first: both trajectories are single fused lax.scan programs; the
per-step slot index is a traced scan counter (no recompile per step).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.masks import compute_difference_mask, dilate_mask, downsample_mask
from ..models.ddpm import DDPMUNetConfig, SIGEFusedUNet
from ..nn import SIGEModel
from ..nn.module import SIGECtx
from ..runners.diffusion_runner import data_transform, inverse_data_transform
from ..samplers import DDIMSampler, DiffusionSchedule, get_sampling_sequence
from ..samplers.dpm_solver import DPMSolverSampler


class DemoRunner:
    def __init__(self, model_cfg: Optional[DDPMUNetConfig] = None,
                 sample_steps: int = 25, noise_level: int = 400,
                 total_steps: int = 1000, mask_dilate_radius: int = 5,
                 params=None, seed: int = 0, bucket_min: int = 2,
                 sampler_type: str = "ddim"):
        """``sampler_type``: "ddim" or "dpm_solver" — the reference demo
        defaults to DPM-Solver (reference: diffusion_demo/configs)."""
        assert sampler_type in ("ddim", "dpm_solver"), sampler_type
        self.sampler_type = sampler_type
        self.sample_steps = sample_steps
        self.noise_level = noise_level
        self.mask_dilate_radius = mask_dilate_radius
        self.seq = get_sampling_sequence(sample_steps, noise_level)
        n_steps = len(self.seq)
        if model_cfg is None:
            model_cfg = DDPMUNetConfig()
        # one cache slot per denoising step
        self.model_cfg = dataclasses.replace(model_cfg, cache_slots=n_steps)
        self.module = SIGEFusedUNet(cfg=self.model_cfg)
        self.model = SIGEModel(self.module, params, bucket_min=bucket_min)
        if params is None:
            R = self.model_cfg.resolution
            self.model.init(jax.random.key(seed),
                            jnp.zeros((1, R, R, self.model_cfg.in_ch)),
                            jnp.zeros((1,), jnp.float32))
        schedule = DiffusionSchedule.create("linear", 1e-4, 2e-2, total_steps)
        if sampler_type == "dpm_solver":
            self.sampler = DPMSolverSampler(schedule=schedule)
        else:
            self.sampler = DDIMSampler(schedule=schedule)
        self.base_x0 = None        # [-1, 1] base image
        self.base_e = None         # persistent noise (reference: runner.py:112)
        self._steps = self._step_pairs()

    def _step_pairs(self):
        seq = jnp.asarray(self.seq, jnp.int32)
        seq_next = jnp.concatenate([jnp.array([-1], jnp.int32), seq[:-1]])
        return jnp.stack([seq[::-1], seq_next[::-1]], axis=1)

    # ------------------------------------------------------------------
    def reset_base_image(self, image: np.ndarray, seed: int = 0) -> np.ndarray:
        """One-time full sampling run of the base image, filling one cache
        slot per step (reference: diffusion_demo/ui/display_pad.py:48-55).
        Returns the base conversion result in [0, 1]."""
        R = self.model_cfg.resolution
        x0 = jnp.asarray(data_transform(
            np.asarray(image, np.float32).reshape(1, R, R, -1), True))
        key = jax.random.key(seed)
        self.base_e = jax.random.normal(key, x0.shape, x0.dtype)
        xt = self.sampler.q_sample(x0, jnp.int32(self.seq[-1]), self.base_e)

        # trace once (records meta for planning) then the fused full scan
        _, mut = self.module.apply(
            {"params": self.model.params, "cache": {}},
            x0, jnp.zeros((1,), jnp.float32),
            ctx=SIGECtx(mode="full"), mutable=["cache", "meta"])
        self.model.cache = mut["cache"]
        self.model.meta = mut["meta"]

        if self.sampler_type == "dpm_solver":
            out, cache = _dpm_demo_trajectory(
                self.module, self.sampler, self.model.params, {},
                self.model.cache, xt, tuple(int(s) for s in self.seq),
                mode="full", mask=None, gt_x0=x0, gt_e=self.base_e,
                sparse_update=False)
        else:
            out, cache = _full_trajectory(
                self.module, self.sampler, self.model.params,
                self.model.cache, xt, self._steps)
        self.model.cache = cache
        self.base_x0 = x0
        return inverse_data_transform(np.asarray(out[0]), True)

    # ------------------------------------------------------------------
    def generate(self, edited: np.ndarray, sparse_update: bool = False,
                 seed: int = 0) -> np.ndarray:
        """Sparse-only conversion of an edited image against the per-step
        base caches (reference: diffusion_demo/runner.py:112-167)."""
        assert self.base_x0 is not None, "call reset_base_image first"
        R = self.model_cfg.resolution
        x1 = jnp.asarray(data_transform(
            np.asarray(edited, np.float32).reshape(1, R, R, -1), True))
        mask = compute_difference_mask(np.asarray(self.base_x0),
                                       np.asarray(x1), eps=1e-2)
        if not mask.any():  # skip if mask empty (reference: runner.py:126)
            return inverse_data_transform(np.asarray(self.base_x0[0]), True)
        mask = dilate_mask(mask, self.mask_dilate_radius)
        min_res = R // (2 ** (len(self.model_cfg.ch_mult) - 1))
        self.model.set_masks(downsample_mask(mask, min_res=min_res))

        xt = self.sampler.q_sample(x1, jnp.int32(self.seq[-1]), self.base_e)
        if self.sampler_type == "dpm_solver":
            out, cache = _dpm_demo_trajectory(
                self.module, self.sampler, self.model.params,
                self.model.plan, self.model.cache, xt,
                tuple(int(s) for s in self.seq), mode="sparse",
                mask=jnp.asarray(mask), gt_x0=self.base_x0,
                gt_e=self.base_e, sparse_update=sparse_update)
        else:
            out, cache = _sparse_trajectory(
                self.module, self.sampler, self.model.params, self.model.plan,
                self.model.cache, xt, self._steps, jnp.asarray(mask),
                self.base_x0, self.base_e, sparse_update)
        if sparse_update:
            self.model.cache = cache
            self.base_x0 = x1
        return inverse_data_transform(np.asarray(out[0]), True)


class MultiSessionDemoRunner:
    """S concurrent editing sessions on one device mesh, each with its
    OWN base image, noise, per-step cache slots and edit plan.

    The reference demo serves one user per process (diffusion_demo/
    start.py); here sessions are a batch axis: per-session plans stack
    via :class:`sige_tpu.parallel.PlanStack`, the sparse trajectory is
    ONE vmapped scan program, and the session axis is dp-sharded over
    the mesh — on a pod slice each session's trajectory runs on its own
    chips, so one user's generate does not queue behind another's. On a
    single chip the batched step still amortizes dispatch across users.

    ``sparse_update`` commits ONLY the requesting session's caches: the
    vmapped program necessarily runs every session, so the other rows'
    mutated caches are discarded by an indexed select.
    """

    def __init__(self, num_sessions: int, model_cfg=None, mesh=None,
                 **kwargs):
        from ..parallel import PlanStack, make_mesh

        self.inner = DemoRunner(model_cfg, **kwargs)
        self.S = int(num_sessions)
        if mesh is None:
            # dp = as many devices as divide the session count evenly
            import math

            import jax as _jax

            mesh = make_mesh(math.gcd(self.S, len(_jax.devices())), tp=1)
        assert self.S % mesh.shape["dp"] == 0, (
            f"{self.S} sessions over dp={mesh.shape['dp']}")
        self.mesh = mesh
        self._PlanStack = PlanStack
        self.cache = None          # stacked [S, ...]
        self.base_x0 = None        # [S, 1, R, R, C]
        self.base_e = None
        self.last_x1 = None        # each session's latest edited input
        self.masks = None          # [S, R, R] bool
        self._stack = None
        self._plan_src = None
        self._plan_dev = None

        inner = self.inner
        if inner.sampler_type == "dpm_solver":
            def sparse_one(params, plan, cache, xt, mask, gt_x0, gt_e, upd):
                return _dpm_demo_trajectory(
                    inner.module, inner.sampler, params, plan, cache, xt,
                    tuple(int(s) for s in inner.seq), mode="sparse",
                    mask=mask, gt_x0=gt_x0, gt_e=gt_e, sparse_update=upd)
        else:
            def sparse_one(params, plan, cache, xt, mask, gt_x0, gt_e, upd):
                return _sparse_trajectory(
                    inner.module, inner.sampler, params, plan, cache, xt,
                    inner._steps, mask, gt_x0, gt_e, upd)
        # params/static broadcast; (plan, cache, xt, mask, gt_x0, gt_e)
        # carry the session axis
        self._vsparse = {
            upd: jax.jit(jax.vmap(
                lambda p, pl, c, x, m, g0, ge, _u=upd: sparse_one(
                    p, pl, c, x, m, g0, ge, _u),
                in_axes=(None, 0, 0, 0, 0, 0, 0)))
            for upd in (False, True)
        }

    def _shard(self, tree):
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.device_put(tree, NamedSharding(self.mesh, P("dp")))

    @property
    def _R(self):
        return self.inner.model_cfg.resolution

    def reset_base_image(self, i: int, image: np.ndarray,
                         seed: int = 0) -> np.ndarray:
        """Full sampling run of session ``i``'s base image (unvmapped —
        resets are rare and per-session), slotting its caches into the
        stacked state."""
        inner, R, S = self.inner, self._R, self.S
        out = inner.reset_base_image(image, seed=seed)
        if self._stack is None:
            meta_host = jax.device_get(
                jax.tree.map(np.asarray, inner.model.meta))
            self._stack = self._PlanStack(meta_host, S,
                                          inner.model.bucket_min)
            min_res = R // (2 ** (len(inner.model_cfg.ch_mult) - 1))
            empty = downsample_mask(np.zeros((R, R), bool), min_res=min_res)
            for j in range(S):
                self._stack.set(j, empty)
        if self.cache is None:
            # first reset seeds every session (blank sessions have empty
            # masks, so their rows are inert until their own reset)
            tile = lambda a: jnp.broadcast_to(a[None], (S,) + a.shape)
            self.cache = self._shard(jax.tree.map(tile, inner.model.cache))
            self.base_x0 = tile(inner.base_x0)
            self.base_e = tile(inner.base_e)
            self.last_x1 = self.base_x0
            self.masks = jnp.zeros((S, R, R), bool)
        else:
            upd = lambda st, new: st.at[i].set(new)
            self.cache = jax.tree.map(upd, self.cache, inner.model.cache)
            self.base_x0 = self.base_x0.at[i].set(inner.base_x0)
            self.base_e = self.base_e.at[i].set(inner.base_e)
            self.last_x1 = self.last_x1.at[i].set(inner.base_x0)
            self.masks = self.masks.at[i].set(False)
            min_res = R // (2 ** (len(inner.model_cfg.ch_mult) - 1))
            self._stack.set(i, downsample_mask(np.zeros((R, R), bool),
                                               min_res=min_res))
        return out

    def generate(self, i: int, edited: np.ndarray,
                 sparse_update: bool = False) -> np.ndarray:
        """Sparse-only conversion of session ``i``'s edit; every other
        session rides along at its last edit (their outputs and — under
        ``sparse_update`` — cache mutations are discarded)."""
        assert self.cache is not None, "reset_base_image first"
        inner, R = self.inner, self._R
        x1 = jnp.asarray(data_transform(
            np.asarray(edited, np.float32).reshape(1, R, R, -1), True))
        base_i = np.asarray(self.base_x0[i])
        mask = compute_difference_mask(base_i, np.asarray(x1), eps=1e-2)
        if not mask.any():
            return inverse_data_transform(base_i[0], True)
        mask = dilate_mask(mask, inner.mask_dilate_radius)
        min_res = R // (2 ** (len(inner.model_cfg.ch_mult) - 1))
        # unchanged edit region -> planning, restack and upload all skip
        self._stack.set_if_changed(i, downsample_mask(mask, min_res=min_res))
        self.last_x1 = self.last_x1.at[i].set(x1)
        self.masks = self.masks.at[i].set(jnp.asarray(mask))

        host = self._stack.stacked()
        if host is not self._plan_src:
            from ..parallel.serving import upload_reuse

            self._plan_dev = upload_reuse(self._shard, self._plan_src,
                                          self._plan_dev, host)
            self._plan_src = host
        xts = inner.sampler.q_sample(self.last_x1,
                                     jnp.int32(inner.seq[-1]), self.base_e)
        with self.mesh:
            out, cache = self._vsparse[sparse_update](
                inner.model.params, self._plan_dev, self.cache,
                self._shard(xts), self._shard(self.masks),
                self.base_x0, self.base_e)
        if sparse_update:
            # commit ONLY session i's caches; other rows ran with their
            # stale last edit and must keep their previous state
            sel = jnp.arange(self.S) == i

            def pick(old, new):
                s = sel.reshape((self.S,) + (1,) * (new.ndim - 1))
                return jnp.where(s, new, old)

            self.cache = jax.tree.map(pick, self.cache, cache)
            self.base_x0 = self.base_x0.at[i].set(x1)
        return inverse_data_transform(np.asarray(out[i, 0]), True)


@partial(jax.jit, static_argnames=("module", "sampler"))
def _full_trajectory(module, sampler, params, cache, xt, steps):
    """Full-mode DDIM trajectory, slot i <- step i's caches/affines."""

    def body(carry, inp):
        x, cache = carry
        i_slot, ij = inp
        t = jnp.full((1,), ij[0], jnp.float32)
        et, mut = module.apply(
            {"params": params, "cache": cache}, x, t,
            ctx=SIGECtx(mode="full", cache_id=i_slot), mutable=["cache"])
        cache = mut["cache"]
        at = sampler.schedule.alpha(ij[0])
        atm1 = sampler.schedule.alpha(ij[1])
        x = sampler.update(x, et, at, atm1, ij[0], jnp.zeros_like(x))
        return (x, cache), None

    slots = jnp.arange(steps.shape[0], dtype=jnp.int32)
    (x, cache), _ = jax.lax.scan(body, (xt, cache), (slots, steps))
    return x, cache


@partial(jax.jit,
         static_argnames=("module", "sampler", "seq", "mode", "sparse_update"))
def _dpm_demo_trajectory(module, sampler, params, plan, cache, xt, seq,
                         mode, mask, gt_x0, gt_e, sparse_update):
    """Multistep DPM-Solver(++) trajectory with per-step cache slots.

    Mirrors ``DPMSolverSampler._sample`` (host-precomputed coefficients,
    unrolled — DPM-Solver runs ~5-25 steps) but each of the ``len(seq)``
    model evaluations reads/writes cache slot ``step`` so edits can run
    sparse-only against the base trajectory (the reference demo's
    default sampler; diffusion_demo/runner.py + dpm_solver sampler)."""
    # model_step below converts the eps prediction to x0 (data
    # prediction), which matches _update's coefficients only for
    # dpmsolver++; a 'dpmsolver' (noise-prediction) sampler would
    # silently integrate the wrong quantity
    assert sampler.algorithm_type == "dpmsolver++", sampler.algorithm_type
    order = sampler.order
    steps = len(seq)
    rev = list(reversed([-1] + list(seq)))  # [t_S, ..., t_1, -1]

    def model_step(x, t_int, slot, cache):
        t = jnp.full((x.shape[0],), t_int, jnp.float32)
        ctx = SIGECtx(mode=mode, cache_id=slot, sparse_update=sparse_update)
        variables = {"params": params, "cache": cache}
        if mode == "sparse":
            variables["sige"] = plan
        if mode == "full" or sparse_update:
            et, mut = module.apply(variables, x, t, ctx=ctx,
                                   mutable=["cache"])
            cache = mut["cache"]
        else:
            et = module.apply(variables, x, t, ctx=ctx)
        at = sampler.schedule.alpha(t_int)
        x0 = (x - et * jnp.sqrt(1.0 - at)) / jnp.sqrt(at)
        return x0, cache

    x = xt
    t_prevs, model_prevs = [], []
    for step, t_int in enumerate(rev):
        t_c = sampler._t_cont(t_int)
        if step == 0:
            m, cache = model_step(x, t_int, 0, cache)
            t_prevs, model_prevs = [t_c], [m]
            continue
        if step < order:
            step_order = step
        elif sampler.lower_order_final and steps < 10:
            step_order = min(order, steps + 1 - step)
        else:
            step_order = order
        x = sampler._update(x, model_prevs, t_prevs, t_c, step_order)
        if mode == "sparse":
            # SDEdit blending: outside the mask follow the base trajectory
            gt_xt = sampler.q_sample(gt_x0, t_int, gt_e)
            mb = mask[None, :, :, None].astype(x.dtype)
            x = gt_xt * (1 - mb) + x * mb
        t_prevs.append(t_c)
        if len(t_prevs) > order:
            t_prevs.pop(0)
            model_prevs.pop(0)
        if step < steps:
            m, cache = model_step(x, t_int, step, cache)
            model_prevs.append(m)
    return x, cache


@partial(jax.jit, static_argnames=("module", "sampler", "sparse_update"))
def _sparse_trajectory(module, sampler, params, plan, cache, xt, steps,
                       mask, gt_x0, gt_e, sparse_update):
    """Sparse-only DDIM trajectory reading per-step cache slots."""

    def body(carry, inp):
        x, cache = carry
        i_slot, ij = inp
        t = jnp.full((1,), ij[0], jnp.float32)
        ctx = SIGECtx(mode="sparse", sparse_update=sparse_update,
                      cache_id=i_slot)
        variables = {"params": params, "cache": cache, "sige": plan}
        if sparse_update:
            et, mut = module.apply(variables, x, t, ctx=ctx, mutable=["cache"])
            cache = mut["cache"]
        else:
            et = module.apply(variables, x, t, ctx=ctx)
        at = sampler.schedule.alpha(ij[0])
        atm1 = sampler.schedule.alpha(ij[1])
        x = sampler.update(x, et, at, atm1, ij[0], jnp.zeros_like(x))
        # SDEdit blending: outside the mask follow the base trajectory
        gt_xt = sampler.q_sample(gt_x0, ij[1], gt_e)
        m = mask[None, :, :, None].astype(x.dtype)
        x = gt_xt * (1 - m) + x * m
        return (x, cache), None

    slots = jnp.arange(steps.shape[0], dtype=jnp.int32)
    (x, cache), _ = jax.lax.scan(body, (xt, cache), (slots, steps))
    return x, cache
