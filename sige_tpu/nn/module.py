"""The SIGE module protocol as flax.linen layers.

The reference implements its engine as stateful torch modules with a
broadcast mode switch and hidden per-module caches
(reference: sige/nn/base.py, gather.py, scatter.py, scatter_gather.py).
Here the same protocol is functional:

  * **mode** ("full" | "sparse") is a static field of :class:`SIGECtx`
    threaded through ``__call__`` — two jitted programs, no flags at
    runtime;
  * **caches** (the full-mode activations of the original image) live in
    the mutable ``"cache"`` variable collection, with a static number of
    slots indexed by the traced ``ctx.cache_id`` (the reference's
    per-cache-id dicts; reference: sige/nn/scatter.py:40);
  * **planning products** (active tile indices, live counts, per-pixel
    source-index maps) live in the ``"sige"`` collection, produced host-side by
    :mod:`sige_tpu.nn.planner` from the ``"meta"`` collection the full
    pass records;
  * **pairing** (a Scatter must use its Gather's indices) is expressed by
    module sharing: the Gather instance is passed to the Scatter as an
    attribute, exactly mirroring the reference's constructor wiring
    (reference: sige/nn/scatter.py:10-12), and the Scatter reads the
    gather's variables through the shared reference.

``sparse_update`` (static field) makes sparse-mode scatters write their
result back into the cache so an applied edit becomes the new baseline
without a full pass (reference: sige/nn/scatter.py:59-60).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from ..core.geometry import BlockGeometry
from ..ops import (
    conv2d_nhwc,
    gather_tiles,
    scatter_gather_tiles,
    scatter_tiles_box,
    scatter_with_block_residual_box,
)
from ..ops.window import (
    window_gather,
    window_scatter,
    window_scatter_block_residual,
    window_scatter_gather_slot,
    window_state_materialize,
)

IntPair = Tuple[int, int]


@flax.struct.dataclass
class SIGECtx:
    """Per-call engine context. ``mode`` and ``sparse_update`` are static
    (pytree aux data — switching retraces); ``cache_id`` is traced so the
    demo's per-step cache slots don't recompile.

    Modes:
      * ``"dense"`` — plain inference, no caching (the baseline an
        un-instrumented model would run; the reference keeps a separate
        vanilla model class for this);
      * ``"full"`` — dense inference that also refreshes scatter caches,
        folded-norm affines, and planning metadata;
      * ``"sparse"`` — tile inference over the caches.
    """

    mode: str = flax.struct.field(pytree_node=False, default="full")
    sparse_update: bool = flax.struct.field(pytree_node=False, default=False)
    cache_id: jnp.ndarray = flax.struct.field(default_factory=lambda: jnp.int32(0))
    #: storage dtype for scatter caches (None = the compute dtype).
    #: ``jnp.bfloat16`` halves the sparse-resident HBM of fp32 families
    #: AND the cache-slice/update bytes on the sparse hot path; every
    #: read casts back to the compute dtype, so only cached (unedited)
    #: content sees the rounding — full/sparse parity degrades from
    #: ~1e-4 to bf16's ~4e-3 relative (tests/test_cache_dtype.py)
    cache_dtype: Any = flax.struct.field(pytree_node=False, default=None)


DENSE = SIGECtx(mode="dense")
FULL = SIGECtx(mode="full")
SPARSE = SIGECtx(mode="sparse")


def _pair(v) -> IntPair:
    if isinstance(v, int):
        return (v, v)
    return (int(v[0]), int(v[1]))


def sow_dense_macs(mod: nn.Module, x, features: int) -> None:
    """Record the MACs of a Dense/linear layer applied to ``x``
    (``prod(batch_dims) * in_features * out_features``) — the reference
    counts these via torchprofile's traced matmuls; every ``nn.Dense``
    call site must pair with this so the analytic totals stay comparable
    to torchprofile's (transformer q/k/v/out and the GEGLU FF are a large
    share of SD transformer compute)."""
    import math

    sow_macs(mod, math.prod(x.shape[:-1]) * x.shape[-1] * features)


def sow_macs(mod: nn.Module, n: int) -> None:
    """Record analytic MACs into the mutable "profile" collection.

    Replaces the reference's third inference mode + torchprofile tracing
    (reference: sige/nn/gather.py:59-70 dummy tensors): shapes are static
    under jit, so per-op MACs are exact compile-time constants; running any
    mode with ``mutable=["profile"]`` yields the mode's MACs breakdown.
    """
    if mod.is_mutable_collection("profile"):
        mod.sow("profile", "macs", jnp.float32(n))


class SIGEModule(nn.Module):
    """Marker base for engine layers (mode-aware)."""


class WindowState:
    """Carried state of a window-resident chain: the canonical window of
    the current layer's output plus the slotted cache variable that
    supplies the rest of the map. The pair is the exact full map (inside
    the window the carried values, outside the cache — they agree on the
    uncovered interior), so consumers rebuild any extraction window from
    a window-sized cache slice plus one overlay and full maps only
    materialize at chain breaks (see ops/window.py chain ops)."""

    def __init__(self, win, cache5, cache_id, org):
        self.win = win          # [B, WH, WW, C]
        self.cache5 = cache5    # [slots, B, H, W, C]
        self.cache_id = cache_id
        self.org = org          # [2] int32 canonical origin

    def to_map(self):
        return window_state_materialize(self.cache5, self.cache_id,
                                        self.win, self.org)


def chain_rel(gather: "Gather"):
    """Static carried-window offset inside ``gather``'s extraction window
    for :func:`~sige_tpu.ops.window.window_chain_extend`'s fused overlay:
    for a stride-1 consumer it is exactly the conv offset (rel = org -
    v_org = offset, edit-independent). Returns None for strided gathers,
    whose rel depends on the plan — the op then falls back to the
    dynamic-offset overlay."""
    g = gather.geom
    return g.offset if g.conv_stride == (1, 1) else None


class Gather(SIGEModule):
    """Records geometry/resolution in full mode; extracts the active tile
    batch (with optional fused norm epilogue) in sparse mode
    (reference: sige/nn/gather.py).

    Also the anchor for planning products: the planner writes
    ``indices``/``count``, per-resolution ``srcmap_{h}x{w}`` scatter source
    maps, and ``sgsrc/sgflat`` fused re-gather lookups into this module's
    ``"sige"`` collection; paired scatters read them through the shared
    module reference.
    """

    block_size: Union[int, IntPair] = 6
    kernel_size: Union[int, IntPair] = 3
    conv_stride: Union[int, IntPair] = 1
    conv_padding: Union[int, IntPair] = 0
    offset: Optional[Union[int, IntPair]] = None
    activation: str = "identity"
    activation_first: bool = False
    #: request pre-pool chain products (``wdnp_in``/``wdnp_edge``): the
    #: extraction window doubled to 2x input resolution, for consumers
    #: whose input is an avg-pool of a window-resident producer (PD's
    #: resample-in-resblock down path)
    prepool_chain: bool = False

    @property
    def geom(self) -> BlockGeometry:
        return BlockGeometry.create(
            self.block_size, self.kernel_size, self.conv_stride,
            self.conv_padding, self.offset,
        )

    @nn.compact
    def __call__(self, x, ctx: SIGECtx, scale=None, shift=None):
        if ctx.mode == "dense":
            return x
        if ctx.mode == "full":
            # Record planning metadata. Geometry is packed as an int array
            # so the planner can rebuild it from the collection alone.
            g = self.geom
            self.sow("meta", "input_res", jnp.array(x.shape[1:3], jnp.int32))
            self.sow("meta", "geom", jnp.array(
                [*g.block_size, *g.block_stride, *g.offset,
                 *g.kernel_size, *g.conv_stride], jnp.int32))
            if self.prepool_chain:
                self.sow("meta", "prepool", jnp.int32(1))
            assert scale is None and shift is None, (
                "full mode never fuses epilogues; apply the norm densely")
            return x
        if ctx.mode == "sparse":
            if self.planned_window():
                return window_gather(
                    x, self.get_variable("sige", "win_in"),
                    self.get_variable("sige", "win_edge"),
                    scale, shift, self.activation, self.activation_first,
                )
            idx = self.get_variable("sige", "indices")
            count = self.get_variable("sige", "count")
            return gather_tiles(
                x, idx, count, self.geom, scale, shift,
                self.activation, self.activation_first,
            )
        raise ValueError(f"unknown mode {ctx.mode}")

    # --- services for paired scatters (called via module sharing) --------
    def request_src_map(self, res: IntPair):
        self.sow("meta", "scatter_res", jnp.array(res, jnp.int32))

    def request_sg(self, res: IntPair):
        self.sow("meta", "sg_res", jnp.array(res, jnp.int32))

    def request_pixsrc(self, res: IntPair):
        self.sow("meta", "pixsrc_res", jnp.array(res, jnp.int32))

    def read_plan(self):
        return (
            self.get_variable("sige", "indices"),
            self.get_variable("sige", "count"),
        )

    def read_src_map(self, res: IntPair):
        """(box, origin) — bbox-cropped source map (see planner)."""
        return (
            self.get_variable("sige", f"srcbox_{res[0]}x{res[1]}"),
            self.get_variable("sige", f"srcorg_{res[0]}x{res[1]}"),
        )

    def read_sg(self, res: IntPair):
        return (
            self.get_variable("sige", f"sgsrc_{res[0]}x{res[1]}"),
            self.get_variable("sige", f"sgflat_{res[0]}x{res[1]}"),
        )

    def read_pixsrc(self, res: IntPair):
        """(box, origin) — bbox-cropped pixel-source map (see planner)."""
        return (
            self.get_variable("sige", f"pixbox_{res[0]}x{res[1]}"),
            self.get_variable("sige", f"pixorg_{res[0]}x{res[1]}"),
        )

    # --- window layout (ops/window.py; planner layout="window") ----------
    def planned_window(self) -> bool:
        return self.has_variable("sige", "win_in")

    def read_wsc(self, res: IntPair):
        return (
            self.get_variable("sige", f"wsc_org_{res[0]}x{res[1]}"),
            self.get_variable("sige", f"wsc_cov_{res[0]}x{res[1]}"),
        )

    def read_wsg(self, res: IntPair):
        return (
            self.get_variable("sige", f"wsg_in_{res[0]}x{res[1]}"),
            self.get_variable("sige", f"wsg_edge_{res[0]}x{res[1]}"),
            self.get_variable("sige", f"wsg_cov_{res[0]}x{res[1]}"),
        )


def _slotted_cache(mod: nn.Module, name: str, value: jnp.ndarray, slots: int,
                   cache_id, dtype=None) -> jnp.ndarray:
    """Write ``value`` into cache slot ``cache_id``; returns the variable's
    full [slots, ...] array. ``dtype`` (``SIGECtx.cache_dtype``) narrows
    the STORAGE dtype; readers cast back to the compute dtype."""
    dt = value.dtype if dtype is None else dtype
    v = mod.variable(
        "cache", name,
        lambda: jnp.zeros((slots, *value.shape), dt),
    )
    v.value = v.value.at[cache_id].set(value.astype(dt))
    return v.value


def _read_slot(cache: jnp.ndarray, cache_id, dtype=None):
    """cache[cache_id] with a static index when there is only one slot —
    a traced index forces a dynamic-slice copy of the whole map.
    ``dtype`` casts a narrow-storage cache back to the compute dtype
    (fused into the slice by XLA)."""
    out = cache[0] if cache.shape[0] == 1 else cache[cache_id]
    return out if dtype is None else out.astype(dtype)


class Scatter(SIGEModule):
    """Caches full-mode output; scatters fresh tiles over the cache in
    sparse mode (reference: sige/nn/scatter.py:9-63)."""

    gather: Gather
    cache_slots: int = 1

    @nn.compact
    def __call__(self, x, ctx: SIGECtx, residual=None):
        if ctx.mode == "dense":
            return x if residual is None else x + residual
        if ctx.mode == "full":
            out = x if residual is None else x + residual
            self.gather.request_src_map(out.shape[1:3])
            _slotted_cache(self, "original", out, self.cache_slots,
                           ctx.cache_id, ctx.cache_dtype)
            return out
        if ctx.mode == "sparse":
            cache = self.get_variable("cache", "original")
            y = _read_slot(cache, ctx.cache_id, x.dtype)
            if self.gather.planned_window():
                org, cov = self.gather.read_wsc(y.shape[1:3])
                out = window_scatter(x, y, org, cov, residual)
            else:
                box, org = self.gather.read_src_map(y.shape[1:3])
                out = scatter_tiles_box(x, y, box, org, self.gather.geom,
                                        residual)
            if ctx.sparse_update and self.is_mutable_collection("cache"):
                self.put_variable("cache", "original",
                                  cache.at[ctx.cache_id].set(
                                      out.astype(cache.dtype)))
            return out
        raise ValueError(f"unknown mode {ctx.mode}")


class ScatterGather(SIGEModule):
    """Fused scatter->re-gather between the two convs of a resblock, with
    the second norm folded into the epilogue
    (reference: sige/nn/scatter_gather.py)."""

    gather: Gather
    activation: str = "identity"
    activation_first: bool = False
    cache_slots: int = 1

    @nn.compact
    def __call__(self, x, ctx: SIGECtx, scale=None, shift=None):
        if ctx.mode == "dense":
            return x
        if ctx.mode == "full":
            self.gather.request_src_map(x.shape[1:3])
            self.gather.request_sg(x.shape[1:3])
            _slotted_cache(self, "original", x, self.cache_slots,
                           ctx.cache_id, ctx.cache_dtype)
            return x
        if ctx.mode == "sparse":
            cache = self.get_variable("cache", "original")
            geom = self.gather.geom
            res = cache.shape[2:4]
            if self.gather.planned_window():
                meta, edge, cov = self.gather.read_wsg(res)
                out = window_scatter_gather_slot(
                    x, cache, ctx.cache_id, meta, edge, cov, geom.offset,
                    scale, shift, self.activation, self.activation_first,
                )
                if ctx.sparse_update and self.is_mutable_collection("cache"):
                    y = _read_slot(cache, ctx.cache_id, x.dtype)
                    org, wcov = self.gather.read_wsc(res)
                    updated = window_scatter(x, y, org, wcov)
                    self.put_variable(
                        "cache", "original",
                        cache.at[ctx.cache_id].set(
                            updated.astype(cache.dtype)))
                return out
            y = _read_slot(cache, ctx.cache_id, x.dtype)
            sg_src, sg_flat = self.gather.read_sg(res)
            out = scatter_gather_tiles(
                x, y, sg_src, sg_flat, geom,
                scale, shift, self.activation, self.activation_first,
            )
            if ctx.sparse_update and self.is_mutable_collection("cache"):
                box, org = self.gather.read_src_map(res)
                updated = scatter_tiles_box(x, y, box, org, geom)
                self.put_variable("cache", "original",
                                  cache.at[ctx.cache_id].set(
                                      updated.astype(cache.dtype)))
            return out
        raise ValueError(f"unknown mode {ctx.mode}")


class ScatterWithBlockResidual(SIGEModule):
    """Residual join for main/shortcut paths gathered with different block
    sizes (reference: sige/nn/scatter.py:66-136)."""

    main_gather: Gather
    shortcut_gather: Gather
    cache_slots: int = 1

    @nn.compact
    def __call__(self, x, ctx: SIGECtx, residual=None):
        if ctx.mode == "dense":
            return x + residual
        if ctx.mode == "full":
            out = x + residual
            self.main_gather.request_src_map(out.shape[1:3])
            self.shortcut_gather.request_src_map(out.shape[1:3])
            _slotted_cache(self, "original", out, self.cache_slots,
                           ctx.cache_id, ctx.cache_dtype)
            _slotted_cache(self, "residual", residual, self.cache_slots,
                           ctx.cache_id, ctx.cache_dtype)
            return out
        if ctx.mode == "sparse":
            caches = self.get_variable("cache", "original")
            res_caches = self.get_variable("cache", "residual")
            y0 = _read_slot(caches, ctx.cache_id, x.dtype)
            y1 = _read_slot(res_caches, ctx.cache_id, x.dtype)
            res = y0.shape[1:3]
            if self.main_gather.planned_window():
                org, cov_m = self.main_gather.read_wsc(res)
                _, cov_s = self.shortcut_gather.read_wsc(res)
                out = window_scatter_block_residual(
                    x, y0, residual, y1, org, cov_m, cov_s)
                if ctx.sparse_update and self.is_mutable_collection("cache"):
                    self.put_variable(
                        "cache", "original",
                        caches.at[ctx.cache_id].set(out.astype(caches.dtype)))
                    new_res = window_scatter(residual, y1, org, cov_s)
                    self.put_variable(
                        "cache", "residual",
                        res_caches.at[ctx.cache_id].set(
                            new_res.astype(res_caches.dtype)))
                return out
            m_box, m_org = self.main_gather.read_src_map(res)
            s_box, s_org = self.shortcut_gather.read_src_map(res)
            out = scatter_with_block_residual_box(
                x, y0, residual, y1,
                m_box, m_org, self.main_gather.geom,
                s_box, s_org, self.shortcut_gather.geom,
            )
            if ctx.sparse_update and self.is_mutable_collection("cache"):
                self.put_variable("cache", "original",
                                  caches.at[ctx.cache_id].set(
                                      out.astype(caches.dtype)))
                new_res = scatter_tiles_box(
                    residual, y1, s_box, s_org, self.shortcut_gather.geom)
                self.put_variable("cache", "residual",
                                  res_caches.at[ctx.cache_id].set(
                                      new_res.astype(res_caches.dtype)))
            return out
        raise ValueError(f"unknown mode {ctx.mode}")


class SIGEConv2d(SIGEModule):
    """Conv that pads normally in full mode and runs VALID on gathered
    tiles in sparse mode (reference: sige/nn/base.py:80-92). Parameter
    names/layout match ``flax.linen.Conv`` (kernel HWIO, bias) so weight
    conversion is uniform.

    ``tile_input=False`` marks a conv that always sees full maps (e.g. the
    stem conv, or resblock convs at non-sparse levels — the reference uses
    plain ``nn.Conv2d`` there) so it keeps its padding in sparse mode.
    """

    features: int
    kernel_size: Union[int, IntPair] = 3
    stride: Union[int, IntPair] = 1
    padding: Any = 0
    use_bias: bool = True
    feature_group_count: int = 1
    tile_input: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, ctx: SIGECtx):
        kh, kw = _pair(self.kernel_size)
        cin = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cin, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias else None
        )
        if ctx.mode in ("full", "dense") or not self.tile_input:
            padding = self.padding
        else:
            padding = 0
        out = conv2d_nhwc(
            x, kernel, bias, stride=self.stride, padding=padding,
            feature_group_count=self.feature_group_count,
        )
        sow_macs(self, out.size * kh * kw * cin)
        return out
