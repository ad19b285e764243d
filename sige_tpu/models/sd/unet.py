"""Stable Diffusion U-Net (openaimodel architecture) with SIGE wiring.

Reference: stable-diffusion/ldm/modules/diffusionmodules/
sige_openaimodel.py + ldm/modules/sige_attention.py.

Highlights of the sparse design:
  * ResBlocks fold GroupNorm + SiLU into the gathers (hard-coded main
    block 6 / shortcut block 4; reference: sige_openaimodel.py:79-81) with
    the additive temb absorbed into the cached norm2 shift;
  * the SpatialTransformer keeps attention *global* while queries stay
    tile-local: proj_in tiles are scattered onto the cached full map to
    form the K/V token sequence, the Q sequence is the tile tokens, and
    the text cross-attention reuses K/V projections cached by the full
    pass (reference: sige_attention.py:30-42, 134-185);
  * the middle block runs dense (block_size None;
    reference: sige_openaimodel.py:370-396) but still uses cached folded
    norms and cached text K/V in sparse mode.

Window-resident chains (``window_chain``, layout="window"; no reference
counterpart — the TPU-native formulation): resblocks, skip
concatenations, resamples AND the transformers thread (window, cache)
state so full maps never materialize between blocks (profiled: the
full-map scatter joins were ~2.2 ms of the 6.4 ms sparse step at SD
scale). The transformer stays global without any join via *masked
stale-K/V attention*: the full pass caches each block's projected K/V
token maps; a sparse pass projects only the window tokens and attends
over [stale-full-map ++ fresh-window] with additive -inf biases that
keep exactly one token per spatial position (stale where unedited,
fresh where edited) — the exact token set of the scatter-updated map,
without building it.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...nn.module import (
    Gather,
    chain_rel,
    Scatter,
    ScatterGather,
    ScatterWithBlockResidual,
    SIGEConv2d,
    SIGECtx,
    SIGEModule,
    WindowState,
    _read_slot,
    _slotted_cache,
    sow_dense_macs,
    sow_macs,
)
from ..ddpm.unet import _FoldedGroupNorm, _swish
from ...nn.norm import group_norm_with_affine
from ...ops.window import (
    window_chain_extend,
    window_chain_extend_up2,
    window_epilogue,
    window_gather,
    window_slot_window,
)


def _to_map(x):
    """Materialize a chain state at a chain break."""
    return x.to_map() if isinstance(x, WindowState) else x


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    """SD v1 defaults (reference: stable-diffusion/configs/sige.yaml:50-66)."""

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)  # downsample factors
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    num_groups: int = 32
    main_block_size: Optional[int] = 6
    shortcut_block_size: Optional[int] = 4
    transformer_block_size: Optional[int] = 4
    #: latent resolution below which levels run dense (the reference wires
    #: SIGE at every level — reference: sige_openaimodel.py:316-326 — but on
    #: TPU the tile machinery is pure overhead once a level's tiles cover
    #: the whole map; 0 reproduces the reference wiring)
    sparse_resolution_threshold: int = 0
    #: token count at/above which the transformer's self-attn K/V come
    #: from a scatter-updated cache instead of reprojecting the full map
    #: each sparse call. MEASURED NEGATIVE on TPU v5e at SD scale and
    #: disabled by default: the two per-block K/V scatter-joins cost more
    #: wall than the projections they save at every level (64²: 25.0/7.57
    #: = 3.3x vs 25.0/6.55 = 3.8x with recompute — full-map joins run at
    #: gather throughput while 4096x320x320 projections ride the MXU).
    #: The mechanism stays (exact per-token algebra, oracle-tested in
    #: tests/test_reference_model_parity.py) for accelerators where
    #: scatter is cheap relative to matmul.
    kv_cache_min_tokens: int = 1 << 30
    #: window-layout chains: thread (window, cache) state through
    #: resblocks, skip concatenations, resamples and transformers (masked
    #: stale-K/V attention) so full maps only materialize at the dense
    #: middle block and the tail. Strictly fewer full-canvas copies;
    #: sparse == full on the original input is preserved.
    window_chain: bool = True
    cache_slots: int = 1


def sd_timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """openai-convention embedding: cat([cos, sin]), freqs over half
    (reference: ldm/modules/diffusionmodules/util.py timestep_embedding)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class SIGESDResBlock(SIGEModule):
    """Reference: sige_openaimodel.py:67-224 (use_scale_shift_norm=False
    in SD v1 -> additive temb folded as pre-shift)."""

    cfg: SDUNetConfig
    channels: int
    out_channels: int
    support_sparse: bool = True
    #: run dense with LIVE statistics in sparse mode. The reference's
    #: middle-block resblocks are plain torch ResBlocks — in sparse mode
    #: they recompute GroupNorm stats on the scatter-updated map and add
    #: live temb (reference: sige_openaimodel.py:370-396), unlike the
    #: sub-threshold SIGE blocks which replay folded affines. Verified
    #: against the built reference in tests/test_reference_model_parity.py.
    live_dense: bool = False

    def setup(self):
        cfg = self.cfg
        cin, cout = self.channels, self.out_channels
        self.main_sparse = self.support_sparse and cfg.main_block_size is not None
        self.shortcut_sparse = (
            self.main_sparse and cin != cout and cfg.shortcut_block_size is not None)
        self.norm1 = _FoldedGroupNorm(cin, cfg.num_groups, cfg.cache_slots)
        self.conv1 = SIGEConv2d(features=cout, kernel_size=3, padding=1,
                                tile_input=self.main_sparse)
        self.emb_proj = nn.Dense(cout)
        self.norm2 = _FoldedGroupNorm(cout, cfg.num_groups, cfg.cache_slots)
        self.conv2 = SIGEConv2d(features=cout, kernel_size=3, padding=1,
                                tile_input=self.main_sparse)
        if self.main_sparse:
            self.main_gather = Gather(block_size=cfg.main_block_size,
                                      kernel_size=3, conv_stride=1,
                                      conv_padding=1, activation="swish")
            self.sg = ScatterGather(gather=self.main_gather, activation="swish",
                                    cache_slots=cfg.cache_slots)
        if cin != cout:
            self.skip = SIGEConv2d(features=cout, kernel_size=1, padding=0,
                                   tile_input=self.shortcut_sparse)
            if self.shortcut_sparse:
                self.shortcut_gather = Gather(
                    block_size=cfg.shortcut_block_size, kernel_size=1,
                    conv_stride=1, conv_padding=0)
                self.join = ScatterWithBlockResidual(
                    main_gather=self.main_gather,
                    shortcut_gather=self.shortcut_gather,
                    cache_slots=cfg.cache_slots)
            elif self.main_sparse:
                self.join = Scatter(gather=self.main_gather,
                                    cache_slots=cfg.cache_slots)
        elif self.main_sparse:
            self.join = Scatter(gather=self.main_gather,
                                cache_slots=cfg.cache_slots)

    def __call__(self, x, emb, ctx: SIGECtx):
        """``x`` may be a tuple (h, skip) — the U-Net's skip
        concatenation: dense/full/tile modes concatenate the maps here;
        the window-chain sparse path extends each part's window
        separately and concatenates window-resident."""
        live = self.live_dense and ctx.mode == "sparse"
        if (ctx.mode == "sparse" and not live and self.main_sparse
                and self.cfg.window_chain and not ctx.sparse_update
                and self.main_gather.planned_window()):
            return self._chain_window(x, ctx)
        if isinstance(x, tuple):
            x = jnp.concatenate([_to_map(a) for a in x], axis=-1)
        else:
            x = _to_map(x)
        dctx = dataclasses.replace(ctx, mode="dense") if live else ctx
        h, xs = x, x
        if self.channels != self.out_channels:
            if self.shortcut_sparse:
                xs = self.shortcut_gather(xs, dctx)
            xs = self.skip(xs, dctx)

        if ctx.mode in ("dense", "full") or live:
            ctx = dctx
            if self.main_sparse:
                h = self.main_gather(h, ctx)
            h, _, _ = self.norm1(h, ctx)
            h = _swish(h)
            h = self.conv1(h, ctx)
            if self.main_sparse:
                h = self.sg(h, ctx)
            emb_out = self.emb_proj(_swish(emb))  # [B, cout]
            sow_dense_macs(self, emb, self.out_channels)
            h = h + emb_out[:, None, None, :]
            h, _, _ = self.norm2(h, ctx, pre_shift=emb_out)
            h = _swish(h)
            h = self.conv2(h, ctx)
        else:
            _, s1, b1 = self.norm1(h, ctx)
            if self.main_sparse:
                h = self.main_gather(h, ctx, scale=s1, shift=b1)
            else:
                h = _swish(h * s1[:, None, None, :] + b1[:, None, None, :])
            h = self.conv1(h, ctx)
            _, s2, b2 = self.norm2(h, ctx)
            if self.main_sparse:
                h = self.sg(h, ctx, scale=s2, shift=b2)
            else:
                h = _swish(h * s2[:, None, None, :] + b2[:, None, None, :])
            h = self.conv2(h, ctx)

        if self.main_sparse:
            return self.join(h, ctx, residual=xs)
        return h + xs

    # -- window-resident sparse path (mirrors ddpm/unet.py) --------------
    def _extend_part(self, p, meta, edge, rel=None):
        if isinstance(p, WindowState):
            return window_chain_extend(p.win, p.org, p.cache5, p.cache_id,
                                       meta, edge, rel=rel)
        return window_gather(p, meta, edge)

    def _part_window(self, p, org, shape):
        if isinstance(p, WindowState):
            return p.win
        zero = jnp.int32(0)
        return jax.lax.dynamic_slice(
            p, (zero, org[0], org[1], zero),
            (p.shape[0], shape[0], shape[1], p.shape[3]))

    def _chain_window(self, x, ctx: SIGECtx) -> "WindowState":
        g = self.main_gather
        meta = g.get_variable("sige", "win_in")
        edge = g.get_variable("sige", "win_edge")
        org = g.get_variable("sige", "win_org")
        parts = x if isinstance(x, tuple) else (x,)

        _, s1, b1 = self.norm1(None, ctx)
        rel = chain_rel(g)
        ext = jnp.concatenate(
            [self._extend_part(p, meta, edge, rel) for p in parts], axis=-1)
        ext = window_epilogue(ext, edge, s1, b1, "swish")
        h = self.conv1(ext, ctx)
        _, s2, b2 = self.norm2(h, ctx)  # cached affine includes temb shift
        h = self.sg(h, ctx, scale=s2, shift=b2)
        h = self.conv2(h, ctx)

        cache5 = self.join.get_variable("cache", "original")
        res = cache5.shape[2:4]
        _, cov = g.read_wsc(res)
        WH, WW = cov.shape
        xs = jnp.concatenate(
            [self._part_window(p, org, (WH, WW)) for p in parts], axis=-1)
        y0w = window_slot_window(cache5, ctx.cache_id, org, (WH, WW))
        m = cov[None, :, :, None]
        if self.channels != self.out_channels:
            xs = self.skip(xs, ctx)
            if self.shortcut_sparse:
                # exact two-mask block-residual join (matches
                # window_scatter_block_residual / the tile engine):
                # out = where(m, main + y1, y0) + where(s, short - y1, 0)
                _, cov_s = self.shortcut_gather.read_wsc(res)
                y1w = window_slot_window(
                    self.join.get_variable("cache", "residual"),
                    ctx.cache_id, org, (WH, WW))
                s = cov_s[None, :, :, None]
                out = (jnp.where(m, h + y1w, y0w)
                       + jnp.where(s, xs - y1w, jnp.zeros((), h.dtype)))
                return WindowState(out, cache5, ctx.cache_id, org)
        out = jnp.where(m, h + xs, y0w)
        return WindowState(out, cache5, ctx.cache_id, org)


class SIGECrossAttention(SIGEModule):
    """Cross-attention whose K/V (text projections) are cached by the full
    pass and reused sparsely (reference: sige_attention.py:12-63)."""

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    cache_slots: int = 1

    @nn.compact
    def __call__(self, x, ctx: SIGECtx, context=None):
        inner = self.heads * self.dim_head
        to_q = nn.Dense(inner, use_bias=False, name="to_q")
        to_k = nn.Dense(inner, use_bias=False, name="to_k")
        to_v = nn.Dense(inner, use_bias=False, name="to_v")
        to_out = nn.Dense(self.query_dim, name="to_out")

        q = to_q(x)
        sow_dense_macs(self, x, inner)
        src = x if context is None else context
        if ctx.mode in ("dense", "full"):
            k, v = to_k(src), to_v(src)
            sow_dense_macs(self, src, inner)
            sow_dense_macs(self, src, inner)
            if ctx.mode == "full":
                _slotted_cache(self, "k", k, self.cache_slots, ctx.cache_id)
                _slotted_cache(self, "v", v, self.cache_slots, ctx.cache_id)
        else:
            from ...nn.module import _read_slot
            k = _read_slot(self.get_variable("cache", "k"), ctx.cache_id)
            v = _read_slot(self.get_variable("cache", "v"), ctx.cache_id)

        from ...ops.attention import mha

        B, N, _ = q.shape
        M = k.shape[1]
        hd, nh = self.dim_head, self.heads
        out = mha(q, k, v, nh, hd)
        sow_macs(self, 2 * B * N * M * nh * hd)
        sow_dense_macs(self, out, self.query_dim)
        return to_out(out)


class _SelfAttention(nn.Module):
    """Self/contextual attention for attn1, split into ``kv`` and
    ``attend`` so the transformer can source K/V from a scatter-updated
    cache instead of recomputing the projections over the full token map
    every sparse call (reference: ldm/modules/attention.py CrossAttention
    recomputes; the SIGE reference too — caching is exact for per-token
    projections since unedited tokens' K/V never change)."""

    query_dim: int
    heads: int = 8
    dim_head: int = 64

    def setup(self):
        inner = self.heads * self.dim_head
        self.to_q = nn.Dense(inner, use_bias=False)
        self.to_k = nn.Dense(inner, use_bias=False)
        self.to_v = nn.Dense(inner, use_bias=False)
        self.to_out = nn.Dense(self.query_dim)

    def kv(self, src):
        """K/V projections of ``src`` tokens ([..., M, C] -> 2x [..., M, inner])."""
        inner = self.heads * self.dim_head
        sow_dense_macs(self, src, inner)
        sow_dense_macs(self, src, inner)
        return self.to_k(src), self.to_v(src)

    def attend(self, x, k, v):
        """Multi-head attention of ``x`` queries over (k, v) tokens."""
        from ...ops.attention import mha

        inner = self.heads * self.dim_head
        q = self.to_q(x)
        sow_dense_macs(self, x, inner)
        B, N, _ = q.shape
        M = k.shape[1]
        nh, hd = self.heads, self.dim_head
        out = mha(q, k, v, nh, hd)
        sow_macs(self, 2 * B * N * M * nh * hd)
        sow_dense_macs(self, out, self.query_dim)
        return self.to_out(out)

    def __call__(self, x, context=None):
        src = x if context is None else context
        k, v = self.kv(src)
        return self.attend(x, k, v)

    def attend_masked(self, x, ks, vs, kf, vf, bias_s, bias_f):
        """Attention over [stale-full-map ++ fresh-window] K/V with
        additive biases keeping exactly one token per spatial position
        (stale where unedited, fresh where edited) — the exact token set
        of a scatter-updated full map, without materializing it."""
        from ...ops.attention import masked_mha

        inner = self.heads * self.dim_head
        q = self.to_q(x)
        sow_dense_macs(self, x, inner)
        B, N, _ = q.shape
        Ms, Mf = ks.shape[1], kf.shape[1]
        nh, hd = self.heads, self.dim_head
        out = masked_mha(q, ks, vs, kf, vf, bias_s, bias_f, nh, hd)
        sow_macs(self, 2 * B * N * (Ms + Mf) * nh * hd)
        sow_dense_macs(self, out, self.query_dim)
        return self.to_out(out)


class _GEGLUFeedForward(nn.Module):
    """Gated-GELU feed-forward (reference: ldm/modules/attention.py
    FeedForward with glu=True)."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        proj = nn.Dense(inner * 2, name="proj")(x)
        sow_dense_macs(self, x, inner * 2)
        a, g = jnp.split(proj, 2, axis=-1)
        sow_dense_macs(self, a, self.dim)
        return nn.Dense(self.dim, name="out")(a * jax.nn.gelu(g))


class SIGEBasicTransformerBlock(SIGEModule):
    """Self-attn (Q tiles / K,V full map) -> text cross-attn (cached K/V)
    -> GEGLU FF (reference: sige_attention.py:66-88)."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    cache_slots: int = 1

    def setup(self):
        self.attn1 = _SelfAttention(query_dim=self.dim, heads=self.n_heads,
                                    dim_head=self.d_head)
        self.attn2 = SIGECrossAttention(
            query_dim=self.dim, context_dim=self.context_dim,
            heads=self.n_heads, dim_head=self.d_head,
            cache_slots=self.cache_slots)
        self.ff = _GEGLUFeedForward(dim=self.dim)
        self.norm1 = nn.LayerNorm()
        self.norm2 = nn.LayerNorm()
        self.norm3 = nn.LayerNorm()

    def __call__(self, x, ctx: SIGECtx, kv1=None, context=None):
        """``kv1``: precomputed (k, v) token maps for the self-attention
        (the transformer sources them from a scatter-updated cache in
        sparse mode); None -> classic self-contained self-attention."""
        if kv1 is None:
            x = self.attn1(self.norm1(x)) + x
        else:
            x = self.attn1.attend(self.norm1(x), *kv1) + x
        x = self.attn2(self.norm2(x), ctx, context=context) + x
        x = self.ff(self.norm3(x)) + x
        return x


class SIGESpatialTransformer(SIGEModule):
    """Reference: sige_attention.py:91-185."""

    cfg: SDUNetConfig
    channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    support_sparse: bool = True

    def setup(self):
        cfg = self.cfg
        self.sparse_ok = self.support_sparse and cfg.transformer_block_size is not None
        inner = self.n_heads * self.d_head
        self.inner = inner
        self.norm = _FoldedGroupNorm(self.channels, cfg.num_groups, cfg.cache_slots)
        self.proj_in = SIGEConv2d(features=inner, kernel_size=1, padding=0,
                                  tile_input=self.sparse_ok)
        self.blocks = [
            SIGEBasicTransformerBlock(
                dim=inner, n_heads=self.n_heads, d_head=self.d_head,
                context_dim=cfg.context_dim, cache_slots=cfg.cache_slots)
            for _ in range(self.depth)
        ]
        self.proj_out = SIGEConv2d(features=self.channels, kernel_size=1,
                                   padding=0, tile_input=self.sparse_ok)
        if self.sparse_ok:
            bs = cfg.transformer_block_size
            self.gather = Gather(block_size=bs, kernel_size=1, conv_stride=1,
                                 conv_padding=0)
            # per-block K/V caches for attn1: the full pass caches the
            # projected K/V maps; sparse passes scatter only the edited
            # tokens' projections over them (exact — projections and
            # LayerNorm are per-token), replacing both the full-map
            # K/V recompute AND the full-map feature materialization of
            # the reference design (sige_attention.py:30-42)
            self.kv_scatters = [
                (Scatter(gather=self.gather, cache_slots=cfg.cache_slots),
                 Scatter(gather=self.gather, cache_slots=cfg.cache_slots))
                for _ in range(self.depth)
            ]
            # small-map fallback (kv_cache_min_tokens): one scatter of the
            # features, K/V reprojected from the full map
            self.scatter1 = Scatter(gather=self.gather, cache_slots=cfg.cache_slots)
            self.scatter2 = Scatter(gather=self.gather, cache_slots=cfg.cache_slots)

    @nn.compact
    def __call__(self, x, ctx: SIGECtx, context=None):
        if (ctx.mode == "sparse" and self.sparse_ok
                and self.cfg.window_chain and not ctx.sparse_update
                and self.gather.planned_window()
                and self.has_variable("cache", "k1_0")):
            return self._chain_window(x, ctx, context)
        x = _to_map(x)
        B, H, W, C = x.shape
        x_in = x
        sparse = ctx.mode == "sparse"

        if not sparse:
            h = self.gather(x, ctx) if self.sparse_ok else x
            h, _, _ = self.norm(h, ctx)
        else:
            _, s, b = self.norm(x, ctx)
            if self.sparse_ok:
                h = self.gather(x, ctx, scale=s, shift=b)
            else:
                h = x * s[:, None, None, :] + b[:, None, None, :]
        h = self.proj_in(h, ctx)

        h_shape = h.shape
        if self.sparse_ok:
            if not sparse:
                tok = h.reshape(B, H * W, self.inner)
            else:
                # tile layout: [B*K, bs, bs, C]; window: [B, WH, WW, C]
                tok = h.reshape(B, -1, self.inner)
        else:
            tok = h.reshape(B, H * W, self.inner)

        kv_cached = (self.sparse_ok
                     and H * W >= self.cfg.kv_cache_min_tokens)
        full_tok = None
        if self.sparse_ok and not kv_cached and ctx.mode != "dense":
            # small maps: one feature scatter, K/V reprojected in-block
            full = self.scatter1(h, ctx)
            full_tok = full.reshape(B, H * W, self.inner)

        for i, (block, kv_sc) in enumerate(zip(
                self.blocks,
                self.kv_scatters if self.sparse_ok else [None] * self.depth)):
            if (self.sparse_ok and self.cfg.window_chain and not kv_cached
                    and ctx.mode == "full"):
                # cache this block's projected K/V token maps for the
                # chain path's masked stale-K/V attention (exact:
                # LayerNorm + projections are per-token)
                n1 = block.norm1(tok)
                kf, vf = block.attn1.kv(n1)
                _slotted_cache(self, f"k1_{i}", kf, self.cfg.cache_slots,
                               ctx.cache_id)
                _slotted_cache(self, f"v1_{i}", vf, self.cfg.cache_slots,
                               ctx.cache_id)
                kv1 = (kf, vf)
            elif kv_cached and ctx.mode != "dense":
                # K/V over the FULL token map, from cache: the full pass
                # projects all tokens and caches the maps; sparse passes
                # project only the tile tokens and scatter them over the
                # cache (exact: LayerNorm + projections are per-token).
                # For depth > 1 the deeper blocks' unedited-token K/V are
                # the full pass's (attention mixes globally; same
                # approximation as the reference's stale full map).
                kt, vt = block.attn1.kv(block.norm1(tok))
                sc_k, sc_v = kv_sc
                k_map = sc_k(kt.reshape(*h_shape[:-1], self.inner), ctx)
                v_map = sc_v(vt.reshape(*h_shape[:-1], self.inner), ctx)
                kv1 = (k_map.reshape(B, H * W, self.inner),
                       v_map.reshape(B, H * W, self.inner))
            elif full_tok is not None and ctx.mode == "sparse":
                kv1 = block.attn1.kv(block.norm1(full_tok))
            else:
                kv1 = None
            tok = block(tok, ctx, kv1=kv1, context=context)

        if self.sparse_ok and sparse:
            h = tok.reshape(h_shape)
        else:
            h = tok.reshape(B, H, W, self.inner)
        h = self.proj_out(h, ctx)
        if self.sparse_ok:
            return self.scatter2(h, ctx, residual=x_in)
        return h + x_in

    def _chain_window(self, x, ctx: SIGECtx, context) -> "WindowState":
        """Window-resident sparse path: per-token ops run on the carried
        canonical window (the transformer gather is kernel-1, so its
        extraction window IS the canonical window); self-attention stays
        global via masked stale-K/V (see module docstring). No full map
        is read or written."""
        g = self.gather
        cache5 = self.scatter2.get_variable("cache", "original")
        res = cache5.shape[2:4]
        org, cov = g.read_wsc(res)
        WH, WW = cov.shape
        if isinstance(x, WindowState):
            xw = x.win
        else:
            zero = jnp.int32(0)
            xw = jax.lax.dynamic_slice(
                x, (zero, org[0], org[1], zero),
                (x.shape[0], WH, WW, x.shape[3]))
        B = xw.shape[0]
        _, s, b = self.norm(None, ctx)
        h = xw * s[:, None, None, :] + b[:, None, None, :]
        h = self.proj_in(h, ctx)
        tok = h.reshape(B, WH * WW, self.inner)

        # additive biases selecting exactly one K/V token per position:
        # stale (cached full-map) tokens masked where covered (fresh),
        # fresh window tokens masked where uncovered
        neg = jnp.float32(-1e9)
        zero32 = jnp.float32(0.0)
        bias_f = jnp.where(cov.reshape(-1), zero32, neg)
        bias_s = jax.lax.dynamic_update_slice(
            jnp.zeros(tuple(res), jnp.float32),
            jnp.where(cov, neg, zero32), (org[0], org[1])).reshape(-1)

        for i, block in enumerate(self.blocks):
            n1 = block.norm1(tok)
            kf, vf = block.attn1.kv(n1)
            ks = _read_slot(self.get_variable("cache", f"k1_{i}"),
                            ctx.cache_id)
            vs = _read_slot(self.get_variable("cache", f"v1_{i}"),
                            ctx.cache_id)
            tok = block.attn1.attend_masked(
                n1, ks, vs, kf, vf, bias_s, bias_f) + tok
            tok = block.attn2(block.norm2(tok), ctx, context=context) + tok
            tok = block.ff(block.norm3(tok)) + tok

        h = tok.reshape(B, WH, WW, self.inner)
        h = self.proj_out(h, ctx)
        y0w = window_slot_window(cache5, ctx.cache_id, org, (WH, WW))
        out = jnp.where(cov[None, :, :, None], (h + xw).astype(y0w.dtype),
                        y0w)
        return WindowState(out, cache5, ctx.cache_id, org)


class SIGESDDownsample(SIGEModule):
    """Stride-2 conv, symmetric padding 1 (reference: sige_openaimodel.py:14-33)."""

    cfg: SDUNetConfig
    channels: int
    support_sparse: bool = True

    def setup(self):
        cfg = self.cfg
        self.sparse_ok = self.support_sparse and cfg.main_block_size is not None
        self.op = SIGEConv2d(features=self.channels, kernel_size=3, stride=2,
                             padding=1, tile_input=self.sparse_ok)
        if self.sparse_ok:
            self.g = Gather(block_size=cfg.main_block_size, kernel_size=3,
                            conv_stride=2, conv_padding=1)
            self.s = Scatter(gather=self.g, cache_slots=cfg.cache_slots)

    def __call__(self, x, ctx: SIGECtx):
        if (self.sparse_ok and ctx.mode == "sparse"
                and self.g.planned_window()
                and self.g.has_variable("sige", "wdn_ok")
                and not ctx.sparse_update):
            # window-resident across the downsample (see ddpm/unet.py):
            # the stride-2 extraction window spans ~2x the coarse
            # canonical window, which the planner's nesting (coarse
            # covers fine/2 + halo) guarantees covers the carried window
            meta = self.g.get_variable("sige", "win_in")
            edge = self.g.get_variable("sige", "win_edge")
            if isinstance(x, WindowState):
                ext = window_chain_extend(x.win, x.org, x.cache5,
                                          x.cache_id, meta, edge)
            else:
                ext = window_gather(x, meta, edge)
            h = self.op(ext, ctx)
            cache5 = self.s.get_variable("cache", "original")
            org, cov = self.g.read_wsc(cache5.shape[2:4])
            y0w = window_slot_window(cache5, ctx.cache_id, org, cov.shape)
            out = jnp.where(cov[None, :, :, None], h.astype(y0w.dtype), y0w)
            return WindowState(out, cache5, ctx.cache_id, org)
        x = _to_map(x)
        if self.sparse_ok:
            x = self.g(x, ctx)
        x = self.op(x, ctx)
        if self.sparse_ok:
            x = self.s(x, ctx)
        return x


class SIGESDUpsample(SIGEModule):
    """Nearest 2x + conv (reference: sige_openaimodel.py:36-64)."""

    cfg: SDUNetConfig
    channels: int
    support_sparse: bool = True

    def setup(self):
        cfg = self.cfg
        self.sparse_ok = self.support_sparse and cfg.main_block_size is not None
        self.conv = SIGEConv2d(features=self.channels, kernel_size=3,
                               padding=1, tile_input=self.sparse_ok)
        if self.sparse_ok:
            self.g = Gather(block_size=cfg.main_block_size, kernel_size=3,
                            conv_stride=1, conv_padding=1)
            self.s = Scatter(gather=self.g, cache_slots=cfg.cache_slots)

    def __call__(self, x, ctx: SIGECtx):
        if (isinstance(x, WindowState) and self.sparse_ok
                and self.g.planned_window()
                and self.g.has_variable("sige", "wup_ok")
                and not ctx.sparse_update):
            # window-resident across the resample (see ddpm/unet.py): the
            # doubled carried window covers the extraction window
            win2 = jnp.repeat(jnp.repeat(x.win, 2, axis=1), 2, axis=2)
            ext = window_chain_extend_up2(
                win2, x.org * 2,
                self.g.get_variable("sige", "win_in"),
                self.g.get_variable("sige", "win_edge"))
            h = self.conv(ext, ctx)
            cache5 = self.s.get_variable("cache", "original")
            org = self.g.get_variable("sige", "win_org")
            _, cov = self.g.read_wsc(cache5.shape[2:4])
            y0w = window_slot_window(cache5, ctx.cache_id, org, cov.shape)
            out = jnp.where(cov[None, :, :, None], h.astype(y0w.dtype), y0w)
            return WindowState(out, cache5, ctx.cache_id, org)
        x = _to_map(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.sparse_ok:
            x = self.g(x, ctx)
        x = self.conv(x, ctx)
        if self.sparse_ok:
            x = self.s(x, ctx)
        return x


class SIGESDUNet(SIGEModule):
    """Reference: sige_openaimodel.py:226-451 (structure mirrors
    openaimodel.UNetModel). ``__call__(x, t, context, ctx)`` with
    x [B, H, W, in_channels] latents and context [B, seq, context_dim]
    text embeddings."""

    cfg: SDUNetConfig = SDUNetConfig()

    def setup(self):
        cfg = self.cfg
        mc = cfg.model_channels
        ted = mc * 4
        self.time_dense0 = nn.Dense(ted)
        self.time_dense1 = nn.Dense(ted)
        self.conv_in = SIGEConv2d(features=mc, kernel_size=3, padding=1,
                                  tile_input=False)

        def make_transformer(ch, sparse=True):
            nh = cfg.num_heads
            return SIGESpatialTransformer(
                cfg=cfg, channels=ch, n_heads=nh, d_head=ch // nh,
                depth=cfg.transformer_depth, support_sparse=sparse)

        in_blocks, in_kinds = [], []   # parallel lists in traversal order
        input_chans = [mc]
        ch = mc
        ds = 1
        latent_res = 64  # canonical SD v1 latent; only the ds ratio matters
        def sparse_at(ds_):
            return (latent_res // ds_) >= cfg.sparse_resolution_threshold
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                mods = [SIGESDResBlock(cfg=cfg, channels=ch,
                                       out_channels=mult * mc,
                                       support_sparse=sparse_at(ds))]
                kinds = ["res"]
                ch = mult * mc
                if ds in cfg.attention_resolutions:
                    mods.append(make_transformer(ch, sparse_at(ds)))
                    kinds.append("attn")
                in_blocks.append(mods)
                in_kinds.append(kinds)
                input_chans.append(ch)
            if level != len(cfg.channel_mult) - 1:
                in_blocks.append([SIGESDDownsample(
                    cfg=cfg, channels=ch, support_sparse=sparse_at(ds))])
                in_kinds.append(["down"])
                input_chans.append(ch)
                ds *= 2
        self.in_blocks = in_blocks
        self.in_kinds = in_kinds
        self._input_chans = input_chans

        self.mid_block1 = SIGESDResBlock(
            cfg=cfg, channels=ch, out_channels=ch, support_sparse=False,
            live_dense=True)
        self.mid_attn = SIGESpatialTransformer(
            cfg=cfg, channels=ch, n_heads=cfg.num_heads,
            d_head=ch // cfg.num_heads, depth=cfg.transformer_depth,
            support_sparse=False)
        self.mid_block2 = SIGESDResBlock(
            cfg=cfg, channels=ch, out_channels=ch, support_sparse=False,
            live_dense=True)

        out_blocks, out_kinds = [], []
        chans = list(input_chans)
        for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
            for i in range(cfg.num_res_blocks + 1):
                ich = chans.pop()
                mods = [SIGESDResBlock(cfg=cfg, channels=ch + ich,
                                       out_channels=mult * mc,
                                       support_sparse=sparse_at(ds))]
                kinds = ["res"]
                ch = mult * mc
                if ds in cfg.attention_resolutions:
                    mods.append(make_transformer(ch, sparse_at(ds)))
                    kinds.append("attn")
                if level and i == cfg.num_res_blocks:
                    mods.append(SIGESDUpsample(
                        cfg=cfg, channels=ch, support_sparse=sparse_at(ds)))
                    kinds.append("up")
                    ds //= 2
                out_blocks.append(mods)
                out_kinds.append(kinds)
        self.out_blocks = out_blocks
        self.out_kinds = out_kinds

        self.out_norm_scale = self.param(
            "out_norm_scale", nn.initializers.ones_init(), (ch,))
        self.out_norm_bias = self.param(
            "out_norm_bias", nn.initializers.zeros_init(), (ch,))
        self.conv_out = SIGEConv2d(features=cfg.out_channels, kernel_size=3,
                                   padding=1, tile_input=False)

    def __call__(self, x, t, context, ctx: SIGECtx):
        cfg = self.cfg
        # emb is needed in every mode: the live_dense middle resblocks add
        # live temb in sparse mode too (the reference's UNetModel.forward
        # always computes it; reference: openaimodel.py:715-730)
        emb = sd_timestep_embedding(t, cfg.model_channels)
        sow_dense_macs(self, emb, 4 * cfg.model_channels)
        emb = self.time_dense0(emb)
        sow_dense_macs(self, emb, 4 * cfg.model_channels)
        emb = _swish(emb)
        emb = self.time_dense1(emb)
        emb = emb.astype(x.dtype)  # keep bf16 graphs bf16 (t is fp32)

        hs = [self.conv_in(x, ctx)]
        for mods, kinds in zip(self.in_blocks, self.in_kinds):
            h = hs[-1]
            for kind, mod in zip(kinds, mods):
                if kind == "res":
                    h = mod(h, emb, ctx)
                elif kind == "attn":
                    h = mod(h, ctx, context=context)
                else:
                    h = mod(h, ctx)
            hs.append(h)

        h = hs[-1]
        h = self.mid_block1(h, emb, ctx)
        h = self.mid_attn(h, ctx, context=context)
        h = self.mid_block2(h, emb, ctx)

        for mods, kinds in zip(self.out_blocks, self.out_kinds):
            # skip join passed as a tuple: the window-chain sparse path
            # extends both parts window-resident; other modes (and the
            # resblock's non-chain paths) concatenate the maps
            skip = hs.pop()
            for kind, mod in zip(kinds, mods):
                if kind == "res":
                    h = mod((h, skip), emb, ctx)
                elif kind == "attn":
                    h = mod(h, ctx, context=context)
                else:
                    h = mod(h, ctx)

        h = _to_map(h)
        h, _, _ = group_norm_with_affine(
            h, cfg.num_groups, self.out_norm_scale, self.out_norm_bias, eps=1e-6)
        h = _swish(h)
        return self.conv_out(h, ctx)
