"""Multi-chip serving: batched twin-step execution and per-session plans.

``TwinStepServer`` serves B independent edit requests per step over a
(dp, tp) mesh: the full pass on each request's original trajectory
refreshes its cache shard, the sparse pass runs the edits. One plan
(mask) is shared per microbatch — the identical-mask batching regime
(e.g. inpainting with a fixed template, or per-mask request queues).

``SessionServer`` lifts that restriction: each session carries its OWN
mask/plan — the multi-user interactive-editing regime.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..nn.module import SIGECtx
from ..nn.planner import build_plan, merge_pins, plan_pins
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


class PlanStack:
    """Per-session host plans with shared shape pins, stacked on a
    leading session axis.

    Pinned tile capacities AND pinned box/window shapes
    (:func:`sige_tpu.nn.planner.plan_pins` + ``__winext__`` extent pins)
    keep every plan leaf's shape identical across sessions, so S
    independent edit plans stack into one batched pytree a vmapped
    sparse program consumes. A session whose edit outgrows the pins
    triggers a re-pin to the merged maximum and one rebuild of every
    plan (a single recompile, after which the larger pins fit everyone
    again).

    ``layout="window"`` stacks window-layout plans: window ORIGINS are
    per-session device data, only the bucketed EXTENTS are compile-time
    shapes — pinned to the across-session maximum per resolution, and
    the windowed resolution set to the across-session intersection (a
    session whose edit is too spread for a window at some resolution
    forces everyone to tiles there; the hybrid fallback keeps chains
    breaking cleanly at the seam). This keeps the per-session sparse
    step on the same window-resident chains the single-session engine
    measures — tile layout ran ~2.5x slower per session (round-3
    serving capture).

    ``stacked()`` returns the SAME object until a ``set()`` invalidates
    it, so callers can key device uploads on identity."""

    def __init__(self, meta_host, num_sessions: int, bucket_min: int = 2,
                 layout: str = "tiles", chain_nesting: bool = True):
        self.meta = meta_host
        self.bucket_min = bucket_min
        self.layout = layout
        self.chain_nesting = chain_nesting if layout == "window" else False
        self.masks = [None] * num_sessions
        self.plans = [None] * num_sessions
        self.windows = [None] * num_sessions  # {res: (r0,c0,WH,WW)} per session
        self.pins = {}
        self.win_pins = None  # {res: (WH, WW)} once first merged
        # optimistic fast-form window metas: every session's windows are
        # interior in the common case, so the stacked plan rides the same
        # plan-static 2-form fast path the solo engine measures (round-4
        # serving stacked the legacy 4-form for everyone: 1.91 vs 1.55 ms
        # per session). The first cross-session form mismatch (a border
        # edit meets an interior one) flips this off and rebuilds — one
        # recompile, after which all sessions share the 4-form again.
        self.meta_fast = True
        self._stacked = None

    def _caps(self):
        caps = dict(self.pins)
        if self.win_pins is not None:  # {} is meaningful: tiles everywhere
            caps[("__winext__",)] = dict(self.win_pins)
        caps[("__metafast__",)] = self.meta_fast
        return caps

    def _build(self, masks, i=None):
        wins = {}
        plan = build_plan(self.meta, masks, self.bucket_min, self._caps(),
                          layout=self.layout,
                          chain_nesting=self.chain_nesting,
                          out_windows=wins)
        if i is not None:
            self.windows[i] = wins
        return plan

    def _repin(self) -> None:
        """Merge pins across all sessions' built plans and re-enforce.

        Only sessions whose plan does NOT already conform to the merged
        pins are rebuilt — a pin drift from one session's larger edit
        costs one build for the sessions it actually outgrew, not S full
        build_plan passes per convergence round."""
        self.pins = merge_pins(*(plan_pins(p) for p in self.plans))
        if self.layout == "window":
            live = [w for w in self.windows if w is not None]
            common = set(live[0])
            for w in live[1:]:
                common &= set(w)
            self.win_pins = {
                res: (max(w[res][2] for w in live),
                      max(w[res][3] for w in live))
                for res in common}
        for i, m in enumerate(self.masks):
            if not self._conforms(i):
                self.plans[i] = self._build(m, i)

    def _conforms(self, i: int) -> bool:
        """True when session ``i``'s built plan already has exactly the
        merged pins' leaf shapes (and the pinned windowed-resolution
        set), so rebuilding it could not change any shape."""
        if plan_pins(self.plans[i]) != self.pins:
            return False
        if self.layout == "window" and self.win_pins is not None:
            w = self.windows[i]
            if set(w) != set(self.win_pins):
                return False
            return all((w[r][2], w[r][3]) == tuple(self.win_pins[r])
                       for r in w)
        return True

    def set(self, i: int, masks) -> None:
        self.masks[i] = masks
        self.plans[i] = self._build(masks, i)
        self._stacked = None

    def set_if_changed(self, i: int, masks) -> bool:
        """set(), skipped (returning False) when session ``i``'s mask
        pyramid is unchanged — planning and the restack are pure
        functions of the masks, so an identical edit region costs
        nothing."""
        old = self.masks[i]
        if (old is not None and set(old) == set(masks)
                and all(np.array_equal(old[k], masks[k]) for k in masks)):
            return False
        self.set(i, masks)
        return True

    def stacked(self):
        if self._stacked is not None:
            return self._stacked
        missing = [i for i, p in enumerate(self.plans) if p is None]
        if missing:
            raise RuntimeError(f"set_masks() missing for sessions {missing}")
        # pin -> rebuild iterates: enforcing a merged window extent can
        # re-grow a NESTED coarser window past ITS pin (border clamping
        # differs per session), re-drifting shapes. Extents only grow and
        # are canvas-capped, so this terminates — 2 rounds in practice.
        for _ in range(16):
            try:
                self._stacked = jax.tree.map(lambda *ls: np.stack(ls),
                                             *self.plans)
                return self._stacked
            except ValueError:
                if self.meta_fast and self._meta_form_mismatch():
                    # a border edit met interior ones: fall back to the
                    # uniform legacy 4-form for every session (one
                    # recompile; re-pinning cannot fix a form mismatch)
                    self.meta_fast = False
                    self.plans = [self._build(m, i)
                                  for i, m in enumerate(self.masks)]
                else:
                    self._repin()
        raise RuntimeError("plan stacking failed to converge on shared "
                           "shape pins (window nesting did not settle)")

    def _meta_form_mismatch(self) -> bool:
        """True when any window-meta leaf ships in the fast 2-form in one
        session and the 4-form in another (ops/window.py _fast) — the one
        leaf-shape drift a capacity/extent re-pin cannot reconcile."""
        forms = {}

        def walk(node, path):
            for k, v in node.items():
                if isinstance(v, dict):
                    walk(v, path + (k,))
                elif (k in ("win_in", "wdnp_in")
                      or k.startswith("wsg_in_")):
                    forms.setdefault(path + (k,), set()).add(
                        np.asarray(v).shape)

        for p in self.plans:
            walk(p, ())
        return any(len(s) > 1 for s in forms.values())


def upload_reuse(shard, prev_host, prev_dev, host):
    """Device upload of a host pytree, reusing device-resident leaves
    whose host content is unchanged since the previous upload; leaves
    that did change travel in ONE batched transfer
    (engine._upload_plan's strategy — per-leaf transfers cost ~50-100ms
    each through a remote-dispatch tunnel, and a small moved edit
    changes only a few leaves of a stacked multi-session plan)."""
    import jax.tree_util as jtu

    leaves, treedef = jtu.tree_flatten(host)
    reuse = [None] * len(leaves)
    if prev_host is not None and prev_dev is not None:
        pl, ptd = jtu.tree_flatten(prev_host)
        if ptd == treedef:
            dl = jtu.tree_leaves(prev_dev)
            reuse = [d if (np.shape(a) == np.shape(b)
                           and np.asarray(a).dtype == np.asarray(b).dtype
                           and np.array_equal(a, b)) else None
                     for a, b, d in zip(leaves, pl, dl)]
    fresh = [l for l, r in zip(leaves, reuse) if r is None]
    if fresh:
        it = iter(shard(fresh))
        reuse = [r if r is not None else next(it) for r in reuse]
    return jtu.tree_unflatten(treedef, reuse)


class SessionServer:
    """S concurrent editing sessions, each with its OWN mask — the
    multi-user regime (the reference demo is one user per process;
    ``TwinStepServer`` shares one mask per microbatch).

    TPU-native design: sessions are a batch axis. Per-session plan
    arrays stack on a leading session axis (:class:`PlanStack`) and the
    sparse step is ONE compiled program: params broadcast, (cache,
    plan, input) vmapped, the session axis dp-sharded over the mesh —
    on a pod slice each session's step runs on its own chips, so one
    user's request does not queue behind another's.

    ``layout="window"`` (default) rides the window-resident chains per
    session — extents pinned to the across-session max so plans stack
    (:class:`PlanStack`); pass ``layout="tiles"`` when sessions carry
    scattered multi-region edits a bounding window would mostly waste.
    """

    def __init__(self, module, params, mesh=None, bucket_min: int = 2,
                 layout: str = "window"):
        self.module = module
        self.mesh = mesh if mesh is not None else make_mesh(tp=1)
        self.params = replicate(self.mesh, params)
        self.bucket_min = bucket_min
        self.layout = layout
        self.cache = None
        self.num_sessions = None
        self._meta_host = None
        self._stack = None      # PlanStack (after prime)
        self._plan_src = None   # host tree the device plan was built from
        self._plan_dev = None

        def full_one(params, x, args):
            _, mut = module.apply(
                {"params": params, "cache": {}}, x, *args,
                ctx=SIGECtx(mode="full"), mutable=["cache", "meta"])
            return mut["cache"], mut["meta"]

        def sparse_one(params, cache, plan, x, args):
            return module.apply(
                {"params": params, "cache": cache, "sige": plan},
                x, *args, ctx=SIGECtx(mode="sparse"))

        def update_one(params, cache, plan, x, args):
            y, mut = module.apply(
                {"params": params, "cache": cache, "sige": plan},
                x, *args, ctx=SIGECtx(mode="sparse", sparse_update=True),
                mutable=["cache"])
            return y, mut["cache"]

        self._vfull = jax.jit(jax.vmap(full_one, in_axes=(None, 0, 0)))
        self._vsparse = jax.jit(
            jax.vmap(sparse_one, in_axes=(None, 0, 0, 0, 0)))
        self._vupdate = jax.jit(
            jax.vmap(update_one, in_axes=(None, 0, 0, 0, 0)))

    def _shard(self, tree):
        """Leading axis = session axis, sharded over dp."""
        return jax.device_put(tree, NamedSharding(self.mesh, P("dp")))

    def prime(self, x_sessions, *args):
        """One vmapped full pass on every session's original input
        ([S, B, ...]; extra model args lead with S too): fills the
        per-session caches and records the planning metadata."""
        S = int(x_sessions.shape[0])
        assert S % self.mesh.shape["dp"] == 0, (
            f"{S} sessions over dp={self.mesh.shape['dp']}")
        self.num_sessions = S
        with self.mesh:
            cache, meta = self._vfull(
                self.params, self._shard(x_sessions),
                tuple(self._shard(a) for a in args))
        self.cache = cache
        if self._meta_host is None:
            # metadata depends only on shapes — identical across sessions
            self._meta_host = jax.tree.map(
                lambda a: np.asarray(a)[0], jax.device_get(meta))
        self._stack = PlanStack(self._meta_host, S, self.bucket_min,
                                layout=self.layout)

    def set_masks(self, i: int, masks) -> None:
        """Host planning for session ``i``'s edit mask pyramid."""
        if self._stack is None:
            raise RuntimeError("prime() before set_masks()")
        self._stack.set(i, masks)

    def _stacked_plan(self):
        host = self._stack.stacked()
        if host is not self._plan_src:
            self._plan_dev = upload_reuse(self._shard, self._plan_src,
                                          self._plan_dev, host)
            self._plan_src = host
        return self._plan_dev

    def step(self, x_edit, *args, sparse_update: bool = False):
        """One sparse step for every session ([S, B, ...] in and out).
        ``sparse_update=True`` commits the edits into the caches (the
        demo's "apply")."""
        plan = self._stacked_plan()
        xs = self._shard(x_edit)
        argss = tuple(self._shard(a) for a in args)
        with self.mesh:
            if sparse_update:
                y, cache = self._vupdate(self.params, self.cache, plan,
                                         xs, argss)
                self.cache = cache
                return y
            return self._vsparse(self.params, self.cache, plan, xs, argss)
