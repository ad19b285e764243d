"""Stateful convenience wrapper around a SIGE-wired flax module.

Mirrors the reference's whole-model API — ``set_mode`` is implicit in
which method you call, plus ``set_masks`` / ``clear_cache`` /
``sparse_update`` (reference: sige/nn/base.py:95-129) — while keeping the
hot path purely functional: :meth:`full` and :meth:`sparse` are jitted
closures over ``module.apply``; samplers that want a fully-fused scan
can use the module + collections directly.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .module import SIGECtx
from .planner import build_plan, choose_layout, plan_stats


class SIGEModel:
    """Holds {params, cache, sige} collections and compiled apply fns.

    Typical flow (reference: example.py):
        model = SIGEModel(module, params)
        y0 = model.full(x_original)          # refresh caches, record meta
        model.set_masks(mask_pyramid)        # host planning
        y1 = model.sparse(x_edited)          # sparse tile inference
    """

    def __init__(self, module, params: Optional[Mapping] = None,
                 bucket_min: int = 2, layout: str = "tiles",
                 chain_nesting: bool = True, cache_dtype=None):
        # bucket_min=2: tight capacity buckets. Coarse pyramid levels have
        # single-digit tile counts, where a min-8 floor made "sparse"
        # compute exceed dense (SD UNet sparse: 228.9 -> 140.3 GMACs from
        # this alone). Interactive editing pins capacities across edits
        # instead (pin_capacities), which avoids recompiles entirely
        # rather than merely bucketing them.
        self.module = module
        self.params = params
        self.cache: Dict = {}
        self.meta: Optional[Mapping] = None
        self._meta_host = None
        self._input_sig = None
        self._plan_host = None
        self.plan: Dict = {}
        self.bucket_min = bucket_min
        #: "tiles" (fixed-capacity tile buffers — scattered multi-region
        #: edits), "window" (one contiguous bucketed crop window per
        #: resolution — compact edits; see ops/window.py), or "auto"
        #: (pick per edit from the mask's bbox-vs-coverage ratio)
        self.layout = layout
        self.active_layout = layout
        #: False when the model runs no window chains (skips the
        #: cross-resolution window containment growth; see planner)
        self.chain_nesting = chain_nesting
        #: narrow STORAGE dtype for scatter caches (e.g. ``jnp.bfloat16``
        #: for the fp32 families): halves the sparse-resident cache HBM
        #: and the cache-slice/update bytes on the hot path; reads cast
        #: back to the compute dtype (see SIGECtx.cache_dtype). None
        #: keeps caches at the compute dtype (exact).
        self.cache_dtype = cache_dtype
        self.capacities: Dict = {}

        def full_apply(params, cache, cache_id, args, kwargs):
            variables = {"params": params, "cache": cache}
            ctx = SIGECtx(mode="full", cache_id=cache_id,
                          cache_dtype=cache_dtype)
            return module.apply(
                variables, *args, ctx=ctx, mutable=["cache", "meta"], **kwargs
            )

        def sparse_apply(params, cache, plan, cache_id, args, kwargs):
            variables = {"params": params, "cache": cache, "sige": plan}
            ctx = SIGECtx(mode="sparse", cache_id=cache_id,
                          cache_dtype=cache_dtype)
            return module.apply(variables, *args, ctx=ctx, **kwargs)

        def sparse_update_apply(params, cache, plan, cache_id, args, kwargs):
            variables = {"params": params, "cache": cache, "sige": plan}
            ctx = SIGECtx(mode="sparse", sparse_update=True,
                          cache_id=cache_id, cache_dtype=cache_dtype)
            return module.apply(
                variables, *args, ctx=ctx, mutable=["cache"], **kwargs
            )

        self._full = jax.jit(full_apply)
        self._sparse = jax.jit(sparse_apply)
        self._sparse_update = jax.jit(sparse_update_apply)

    def init(self, key, *args, **kwargs):
        """Initialize parameters by tracing a full-mode pass.

        jitted: eager init executes thousands of tiny ops, which is
        pathological on remote-dispatch backends (the axon TPU tunnel)."""
        init_fn = jax.jit(
            lambda k, a, kw: self.module.init(
                k, *a, ctx=SIGECtx(mode="full"), **kw
            )
        )
        variables = init_fn(key, args, kwargs)
        self.params = variables["params"]
        return self.params

    def full(self, *args, cache_id: int = 0, **kwargs):
        """Dense pass on the original input: refreshes every scatter cache
        and the planning metadata.

        Metadata depends only on input shapes; re-using one model at a new
        input resolution refreshes it (and drops the now-stale plan) so
        ``set_masks`` never silently plans for the old resolution."""
        sig = jax.tree.map(lambda a: np.shape(a) if hasattr(a, "shape")
                           else a, (args, kwargs))
        if self.meta is None or sig != self._input_sig:
            if self._input_sig is not None and sig != self._input_sig:
                self.plan = {}   # stale plan: re-run set_masks
                self.cache = {}  # old-shape scatter caches / slot buffers
                self._plan_host = None
                self.capacities = {}  # pinned for the old resolution
            self._input_sig = sig
            self._meta_host = None
            self.meta = None
        y, mut = self._full(
            self.params, self.cache, jnp.int32(cache_id), args, kwargs
        )
        self.cache = mut["cache"]
        if self.meta is None:
            self.meta = mut["meta"]
        return y

    def adopt_full(self, cache, meta, *args, **kwargs):
        """Adopt caches + planning metadata produced by an EXTERNAL full
        pass — e.g. :func:`sige_tpu.parallel.spatial_full_apply`, the
        row-sharded cache-filling pass of the big-canvas composition
        (one chip cannot run the dense pass; n chips fill the caches,
        then sparse steps run here single-chip). ``args``/``kwargs`` are
        the example model inputs the external pass ran on (shapes only;
        used to key the planning metadata the same way :meth:`full`
        does)."""
        self._input_sig = jax.tree.map(
            lambda a: np.shape(a) if hasattr(a, "shape") else a,
            (args, kwargs))
        self.cache = cache
        self.meta = meta
        self._meta_host = None
        self.plan = {}
        self._plan_host = None
        self.capacities = {}

    def set_masks(self, masks: Mapping, capacities: Optional[Dict] = None):
        """Host-side planning: mask pyramid -> indices/owner maps."""
        if self.meta is None:
            raise RuntimeError("run a full() pass before set_masks()")
        if self._meta_host is None:  # one batched D2H; meta is static
            self._meta_host = jax.device_get(self.meta)
        layout = self.layout
        if layout == "auto":
            layout = choose_layout(masks)
        self.active_layout = layout
        plan = build_plan(
            self._meta_host, masks, self.bucket_min,
            capacities or self.capacities, layout=layout,
            chain_nesting=self.chain_nesting,
        )
        self.plan = self._upload_plan(plan)
        return self.plan

    def _upload_plan(self, plan):
        """Ship the host plan to the device, reusing device-resident
        arrays for leaves unchanged since the previous edit.

        With pinned capacities a small moved edit re-uploads only the
        leaves whose content moved (often just indices/counts/origins);
        a repeated identical mask uploads nothing. Everything that does
        change still travels in ONE batched device_put (per-leaf
        transfers are ~50ms each through a remote-dispatch tunnel)."""
        import jax.tree_util as jtu

        prev_host, prev_dev = self._plan_host, getattr(self, "plan", {})
        leaves, treedef = jtu.tree_flatten(plan)
        reuse = None
        if prev_host is not None and prev_dev:
            pl, ptd = jtu.tree_flatten(prev_host)
            if ptd == treedef:
                dl = jtu.tree_leaves(prev_dev)
                reuse = [
                    d if (np.shape(a) == np.shape(b)
                          and np.asarray(a).dtype == np.asarray(b).dtype
                          and np.array_equal(a, b)) else None
                    for a, b, d in zip(leaves, pl, dl)
                ]
        if reuse is None:
            reuse = [None] * len(leaves)
        fresh = [l for l, r in zip(leaves, reuse) if r is None]
        if fresh:
            fresh_dev = iter(jax.device_put(fresh))
            reuse = [r if r is not None else next(fresh_dev) for r in reuse]
        self._plan_host = plan
        return jtu.tree_unflatten(treedef, reuse)

    def pin_capacities(self) -> Dict:
        """Freeze every tile buffer's capacity AND bbox-cropped source-map
        shape at its current planned size so subsequent ``set_masks``
        calls with smaller edits reuse the compiled sparse program (and
        most device-resident plan arrays) instead of recompiling per
        bucket change. Returns the pin map; call after planning a
        representative (largest expected) edit. Tile layout only —
        window layouts bucket their own extents."""
        from .planner import plan_pins

        if self._plan_host is None:
            raise RuntimeError("call set_masks() before pin_capacities()")
        self.capacities.update(plan_pins(self._plan_host))
        return dict(self.capacities)

    def sparse(self, *args, cache_id: int = 0, sparse_update: bool = False,
               **kwargs):
        """Sparse tile inference on the edited input."""
        if not self.plan:
            raise RuntimeError("call set_masks() before sparse()")
        if sparse_update:
            y, mut = self._sparse_update(
                self.params, self.cache, self.plan, jnp.int32(cache_id),
                args, kwargs,
            )
            self.cache = mut["cache"]
            return y
        return self._sparse(
            self.params, self.cache, self.plan, jnp.int32(cache_id), args, kwargs
        )

    def clear_cache(self):
        self.cache = {}

    def stats(self) -> Dict[str, Any]:
        """Per-gather sparsity statistics for the current plan."""
        if self.meta is None or not self.plan:
            return {}
        return plan_stats(jax.tree.map(np.asarray, self.meta), self.plan)
