"""Multi-chip serving: batched twin-step execution.

Serves B independent edit requests per step over a (dp, tp) mesh: the
full pass on each request's original trajectory refreshes its cache shard,
the sparse pass runs the edits. One plan (mask) is shared per microbatch —
the identical-mask batching regime (e.g. inpainting with a fixed template,
or per-mask request queues).
"""

from __future__ import annotations

from functools import partial

import jax

from ..nn.module import SIGECtx
from .mesh import make_mesh, replicate, shard_batch, shard_cache


class TwinStepServer:
    """Holds sharded state for a batch of edit sessions and runs the
    denoising-step body (full on originals + sparse on edits) across the
    mesh."""

    def __init__(self, module, params, plan, mesh=None, tp: int = 1):
        self.module = module
        self.mesh = mesh if mesh is not None else make_mesh(tp=tp)
        self.params = replicate(self.mesh, params)
        self.plan = replicate(self.mesh, plan)
        self.cache = None

        @partial(jax.jit, static_argnames=())
        def twin_step(params, cache, plan, x_orig, x_edit, t):
            y0, mut = module.apply(
                {"params": params, "cache": cache},
                x_orig, t, ctx=SIGECtx(mode="full"), mutable=["cache"])
            y1 = module.apply(
                {"params": params, "cache": mut["cache"], "sige": plan},
                x_edit, t, ctx=SIGECtx(mode="sparse"))
            return y0, y1, mut["cache"]

        self._twin_step = twin_step

    def prime(self, x_batch, *model_args):
        """Fill batched caches with one full pass on the original batch."""
        B = x_batch.shape[0]
        xb = shard_batch(self.mesh, x_batch)
        _, mut = self.module.apply(
            {"params": self.params, "cache": {}},
            xb, *model_args, ctx=SIGECtx(mode="full"),
            mutable=["cache", "meta"])
        self.cache = shard_cache(self.mesh, mut["cache"], B)
        return mut["meta"]

    def step(self, x_orig, x_edit, t):
        B = x_orig.shape[0]
        with self.mesh:
            y0, y1, cache = self._twin_step(
                self.params, self.cache, self.plan,
                shard_batch(self.mesh, x_orig),
                shard_batch(self.mesh, x_edit), t)
        self.cache = cache
        return y0, y1
