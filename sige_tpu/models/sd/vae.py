"""Stable Diffusion VAE (AutoencoderKL) with SIGE wiring.

Reference: stable-diffusion/ldm/modules/diffusionmodules/sige_model.py,
model.py:180-264, ldm/models/sige_autoencoder.py.

The distinctive kernel here is the sparse-query global attention of the
mid block: Q comes from the active tiles only, while K/V are scattered
onto the cached full map — attention output is computed for edited
positions against global context (reference: model.py:180-253). SD v1's
VAE has no other attention (attn_resolutions = []).
"""

from __future__ import annotations

import dataclasses
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
    sow_macs,
)
from ...ops.scatter import materialize_tiles_box, scatter_gather_residual_tiles
from ...ops.window import (
    window_chain_extend,
    window_chain_extend_up2,
    window_gather,
    window_slot_window,
)
from ...nn.norm import group_norm_with_affine
from ..ddpm.unet import _FoldedGroupNorm, _FoldedNormAffine, _swish


class TileState:
    """Carried state of a tile-resident chain: raw block output evaluated
    at the shared gather positions, plus what a consumer needs to
    materialize the full map."""

    def __init__(self, tiles, y0, pix_box, pix_org, geom):
        self.tiles = tiles
        self.y0 = y0
        self.pix_box = pix_box
        self.pix_org = pix_org
        self.geom = geom

    def to_map(self):
        return materialize_tiles_box(self.tiles, self.y0, self.pix_box,
                                     self.pix_org, self.geom)


def _ensure_map(x):
    return x.to_map() if isinstance(x, (TileState, WindowState)) else x


@dataclasses.dataclass(frozen=True)
class SDVAEConfig:
    """SD v1 ddconfig (reference: stable-diffusion/configs/sige.yaml:13-27)."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 4
    double_z: bool = True
    resolution: int = 256
    num_groups: int = 32
    main_block_size: Optional[int] = 6
    shortcut_block_size: Optional[int] = 4
    attn_block_size: Optional[int] = 4
    #: keep identity-shortcut resblock chains tile-resident in sparse mode
    #: (the decoder's up path is a pure chain — full maps materialize only
    #: at attention/upsample/level boundaries). Opt-in TPU optimization; no
    #: reference counterpart.
    tile_chain: bool = False
    #: window-layout chains: thread (window, cache) state through
    #: resblocks AND upsamples so full maps only materialize at attention
    #: and the decoder tail. On by default — strictly fewer full-canvas
    #: copies; exactness (sparse == full on the original input) holds.
    window_chain: bool = True
    #: SIGE-ify the decoder tail (fold norm_out's affine from the full
    #: pass, window/tile the conv_out). The reference's SD decoder keeps
    #: a dense live-stat tail; freezing the original image's statistics
    #: matches its own DDPM/GauGAN norm-fold semantics and removes the
    #: last full-resolution dense compute from the sparse path. Default
    #: ON (the benched library configuration); parity suites pin False.
    sige_tail: bool = True
    cache_slots: int = 1


class SIGEVAEResnetBlock(SIGEModule):
    """Reference: sige_model.py:10-139 (temb_channels = 0 at inference)."""

    cfg: SDVAEConfig
    in_channels: int
    out_channels: int
    support_sparse: bool = True

    def setup(self):
        cfg = self.cfg
        cin, cout = self.in_channels, self.out_channels
        self.main_sparse = self.support_sparse and cfg.main_block_size is not None
        self.shortcut_sparse = (
            self.main_sparse and cin != cout and cfg.shortcut_block_size is not None)
        self.norm1 = _FoldedGroupNorm(cin, cfg.num_groups, cfg.cache_slots)
        self.conv1 = SIGEConv2d(features=cout, kernel_size=3, padding=1,
                                tile_input=self.main_sparse)
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
            self.nin_shortcut = SIGEConv2d(features=cout, kernel_size=1,
                                           padding=0,
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

    @property
    def _chainable(self) -> bool:
        return (self.cfg.tile_chain and self.main_sparse
                and self.in_channels == self.out_channels)

    @property
    def _window_chainable(self) -> bool:
        return self.cfg.window_chain and self.main_sparse

    def __call__(self, x, ctx: SIGECtx):
        if (ctx.mode == "sparse" and self.main_sparse
                and self.main_gather.planned_window()
                and self._window_chainable and not ctx.sparse_update):
            return self._chain_window(x, ctx)
        if (ctx.mode == "sparse" and self._chainable and not ctx.sparse_update
                and not self.main_gather.planned_window()):
            return self._chain_sparse(x, ctx)
        x = _ensure_map(x)
        h, xs = x, x
        if self.in_channels != self.out_channels:
            if self.shortcut_sparse:
                xs = self.shortcut_gather(xs, ctx)
            xs = self.nin_shortcut(xs, ctx)

        if ctx.mode in ("dense", "full"):
            if self.main_sparse:
                h = self.main_gather(h, ctx)
            h, _, _ = self.norm1(h, ctx)
            h = _swish(h)
            h = self.conv1(h, ctx)
            if self.main_sparse:
                h = self.sg(h, ctx)
            h, _, _ = self.norm2(h, ctx)
            h = _swish(h)
            h = self.conv2(h, ctx)
            if self._chainable and ctx.mode == "full":
                # plan products for the sparse tile-resident path
                self.main_gather.request_sg(h.shape[1:3])
                self.main_gather.request_pixsrc(h.shape[1:3])
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

    def _chain_window(self, x, ctx: SIGECtx) -> "WindowState":
        """Window-resident sparse path: the resblock consumes a carried
        window (or slices one from a materialized map at chain start) and
        emits the joined canonical window — no full map in between."""
        g = self.main_gather
        meta = g.get_variable("sige", "win_in")
        edge = g.get_variable("sige", "win_edge")
        org = g.get_variable("sige", "win_org")

        _, s1, b1 = self.norm1(None, ctx)
        if isinstance(x, WindowState):
            ext = window_chain_extend(x.win, x.org, x.cache5, x.cache_id,
                                      meta, edge, s1, b1, "swish",
                                      rel=chain_rel(g))
        else:
            ext = window_gather(x, meta, edge, s1, b1, "swish")
        h = self.conv1(ext, ctx)
        _, s2, b2 = self.norm2(h, ctx)
        h = self.sg(h, ctx, scale=s2, shift=b2)
        h = self.conv2(h, ctx)  # [B, WH, WW, cout]

        cache5 = self.join.get_variable("cache", "original")
        res = cache5.shape[2:4]
        _, cov = g.read_wsc(res)

        # shortcut over the canonical window (recomputed fresh — exact:
        # where the input equals the original it reproduces the cache)
        WH, WW = cov.shape
        if isinstance(x, WindowState):
            xs = x.win
        else:
            zero = jnp.int32(0)
            xs = jax.lax.dynamic_slice(
                x, (zero, org[0], org[1], zero),
                (x.shape[0], WH, WW, x.shape[3]))
        y0w = window_slot_window(cache5, ctx.cache_id, org, (WH, WW))
        m = cov[None, :, :, None]
        if self.in_channels != self.out_channels:
            xs = self.nin_shortcut(xs, ctx)
            if self.shortcut_sparse:
                # exact two-mask block-residual join (matches
                # window_scatter_block_residual / the tile engine)
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

    def _chain_sparse(self, x, ctx: SIGECtx) -> "TileState":
        """Tile-resident sparse path (identity shortcut): the chain state
        never materializes between consecutive blocks."""
        geom = self.main_gather.geom
        cache = self.join.get_variable("cache", "original")
        y0 = _read_slot(cache, ctx.cache_id)
        res = y0.shape[1:3]
        sg_src, sg_flat = self.main_gather.read_sg(res)
        pix_box, pix_org = self.main_gather.read_pixsrc(res)

        if isinstance(x, TileState):
            T = x.tiles
        else:
            # raw tiles at gather positions (bypass the module's fused
            # swish epilogue — the chain folds norms explicitly)
            from ...ops import gather_tiles
            idx, count = self.main_gather.read_plan()
            T = gather_tiles(x, idx, count, geom)
        B = y0.shape[0]
        K = T.shape[0] // B
        bh, bw = geom.block_size
        ok = (sg_src > -2).reshape(1, K, bh, bw, 1)

        _, s1, b1 = self.norm1(T, ctx)
        h = T.reshape(B, K, bh, bw, -1)
        h = _swish(h * s1[:, None, None, None, :] + b1[:, None, None, None, :])
        h = jnp.where(ok, h, jnp.zeros((), h.dtype)).reshape(B * K, bh, bw, -1)
        h = self.conv1(h, ctx)
        _, s2, b2 = self.norm2(h, ctx)
        h = self.sg(h, ctx, scale=s2, shift=b2)
        h = self.conv2(h, ctx)
        T2 = scatter_gather_residual_tiles(h, y0, T, sg_src, sg_flat, geom)
        return TileState(T2, y0, pix_box, pix_org, geom)


class SIGEVAEAttnBlock(SIGEModule):
    """Sparse-query / dense-K,V global attention
    (reference: model.py:180-253): Q from active tiles only, K/V scattered
    onto the cached full maps."""

    cfg: SDVAEConfig
    channels: int
    support_sparse: bool = True

    def setup(self):
        cfg = self.cfg
        self.sparse_ok = self.support_sparse and cfg.attn_block_size is not None
        self.norm = _FoldedGroupNorm(self.channels, cfg.num_groups, cfg.cache_slots)
        self.q = SIGEConv2d(features=self.channels, kernel_size=1, padding=0,
                            tile_input=self.sparse_ok)
        self.k = SIGEConv2d(features=self.channels, kernel_size=1, padding=0,
                            tile_input=self.sparse_ok)
        self.v = SIGEConv2d(features=self.channels, kernel_size=1, padding=0,
                            tile_input=self.sparse_ok)
        self.proj_out = SIGEConv2d(features=self.channels, kernel_size=1,
                                   padding=0, tile_input=self.sparse_ok)
        if self.sparse_ok:
            bs = cfg.attn_block_size
            self.gather = Gather(block_size=bs, kernel_size=1, conv_stride=1,
                                 conv_padding=0)
            self.k_scatter = Scatter(gather=self.gather, cache_slots=cfg.cache_slots)
            self.v_scatter = Scatter(gather=self.gather, cache_slots=cfg.cache_slots)
            self.out_scatter = Scatter(gather=self.gather, cache_slots=cfg.cache_slots)

    def __call__(self, x, ctx: SIGECtx):
        if (ctx.mode == "sparse" and self.sparse_ok
                and self.cfg.window_chain and not ctx.sparse_update
                and self.gather.planned_window()):
            return self._chain_window(x, ctx)
        x = _ensure_map(x)
        C = self.channels
        B = x.shape[0]
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

        q = self.q(h, ctx)
        k = self.k(h, ctx)
        v = self.v(h, ctx)
        if self.sparse_ok:
            k = self.k_scatter(k, ctx)  # full map (cache in full mode)
            v = self.v_scatter(v, ctx)

        from ...ops.attention import mha

        q_shape = q.shape
        if sparse and self.sparse_ok:
            # tile layout: [B*K, bs, bs, C]; window layout: [B, WH, WW, C]
            qt = q.reshape(B, -1, C)
        else:
            Hq, Wq = q.shape[1:3]
            qt = q.reshape(B, Hq * Wq, C)
        Hk, Wk = k.shape[1:3]
        kt = k.reshape(B, Hk * Wk, C)
        vt = v.reshape(B, Hk * Wk, C)

        out = mha(qt, kt, vt, 1, C)
        sow_macs(self, 2 * B * qt.shape[1] * kt.shape[1] * C)

        if sparse and self.sparse_ok:
            out = out.reshape(q_shape)
        else:
            out = out.reshape(B, Hk, Wk, C)
        out = self.proj_out(out, ctx)
        if self.sparse_ok:
            return self.out_scatter(out, ctx, residual=x)
        return out + x

    def _chain_window(self, x, ctx: SIGECtx) -> "WindowState":
        """Window-resident sparse path with masked stale-K/V attention
        (see sd/unet.py): Q/K/V project only the carried canonical
        window; the global K/V come from the k/v scatters' cached FULL
        maps plus the fresh window, with additive -inf biases keeping
        exactly one token per position. Replaces the k/v/out full-map
        joins — no full map is read or written."""
        g = self.gather
        C = self.channels
        cache5 = self.out_scatter.get_variable("cache", "original")
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
        q = self.q(h, ctx)
        kf = self.k(h, ctx).reshape(B, WH * WW, C)
        vf = self.v(h, ctx).reshape(B, WH * WW, C)
        ks = _read_slot(self.k_scatter.get_variable("cache", "original"),
                        ctx.cache_id).reshape(B, -1, C)
        vs = _read_slot(self.v_scatter.get_variable("cache", "original"),
                        ctx.cache_id).reshape(B, -1, C)

        from ...ops.attention import NEG_INF, masked_mha

        zero32 = jnp.float32(0.0)
        bias_f = jnp.where(cov.reshape(-1), zero32, NEG_INF)
        bias_s = jax.lax.dynamic_update_slice(
            jnp.zeros(tuple(res), jnp.float32),
            jnp.where(cov, NEG_INF, zero32), (org[0], org[1])).reshape(-1)

        qt = q.reshape(B, WH * WW, C)
        Ms = ks.shape[1]
        out = masked_mha(qt, ks, vs, kf, vf, bias_s, bias_f, 1, C)
        sow_macs(self, 2 * B * qt.shape[1] * (Ms + qt.shape[1]) * C)
        out = self.proj_out(out.reshape(B, WH, WW, C), ctx)
        y0w = window_slot_window(cache5, ctx.cache_id, org, (WH, WW))
        res_win = jnp.where(cov[None, :, :, None],
                            (out + xw).astype(y0w.dtype), y0w)
        return WindowState(res_win, cache5, ctx.cache_id, org)


class SIGEVAEDownsample(SIGEModule):
    """Asymmetric (0,1,0,1) pad stride-2 conv (reference: sige_model.py:140-157)."""

    cfg: SDVAEConfig
    channels: int
    support_sparse: bool = True

    def setup(self):
        cfg = self.cfg
        self.sparse_ok = self.support_sparse and cfg.main_block_size is not None
        self.conv = SIGEConv2d(features=self.channels, kernel_size=3, stride=2,
                               padding=((0, 1), (0, 1)), tile_input=self.sparse_ok)
        if self.sparse_ok:
            self.g = Gather(block_size=cfg.main_block_size, kernel_size=3,
                            conv_stride=2, conv_padding=0)
            self.s = Scatter(gather=self.g, cache_slots=cfg.cache_slots)

    def __call__(self, x, ctx: SIGECtx):
        if (self.sparse_ok and ctx.mode == "sparse"
                and self.g.planned_window()
                and self.g.has_variable("sige", "wdn_ok")
                and not ctx.sparse_update):
            # window-resident across the downsample: the stride-2
            # extraction window spans ~2x the coarse canonical window,
            # which the planner's nesting constraint guarantees covers
            # the carried fine window — rebuild it from a window-sized
            # fine-cache slice plus one overlay, never the full map
            meta = self.g.get_variable("sige", "win_in")
            edge = self.g.get_variable("sige", "win_edge")
            if isinstance(x, WindowState):
                ext = window_chain_extend(x.win, x.org, x.cache5,
                                          x.cache_id, meta, edge)
            else:
                ext = window_gather(x, meta, edge)
            h = self.conv(ext, ctx)  # VALID stride-2 on the halo window
            cache5 = self.s.get_variable("cache", "original")
            org, cov = self.g.read_wsc(cache5.shape[2:4])
            y0w = window_slot_window(cache5, ctx.cache_id, org, cov.shape)
            out = jnp.where(cov[None, :, :, None], h.astype(y0w.dtype), y0w)
            return WindowState(out, cache5, ctx.cache_id, org)
        x = _ensure_map(x)
        if self.sparse_ok:
            x = self.g(x, ctx)
        x = self.conv(x, ctx)
        if self.sparse_ok:
            x = self.s(x, ctx)
        return x


class SIGEVAEUpsample(SIGEModule):
    """Nearest 2x + conv (reference: sige_model.py:159-172)."""

    cfg: SDVAEConfig
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
            # window-resident across the resample: the doubled carried
            # window covers the extraction window (planner nesting), so
            # the step is repeat + slice — the full map is never touched
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
            out = jnp.where(cov[None, :, :, None], h, y0w)
            return WindowState(out, cache5, ctx.cache_id, org)
        x = _ensure_map(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.sparse_ok:
            x = self.g(x, ctx)
        x = self.conv(x, ctx)
        if self.sparse_ok:
            x = self.s(x, ctx)
        return x


class SIGEEncoder(SIGEModule):
    """Reference: sige_model.py:175-276."""

    cfg: SDVAEConfig = SDVAEConfig()

    def setup(self):
        cfg = self.cfg
        nres = len(cfg.ch_mult)
        self._head_sparse = (cfg.sige_tail
                             and cfg.main_block_size is not None)
        self.conv_in = SIGEConv2d(features=cfg.ch, kernel_size=3, padding=1,
                                  tile_input=self._head_sparse)
        if self._head_sparse:
            # param-free SIGE pair for the stem: the reference runs
            # conv_in dense at full image resolution even in sparse mode
            # (sige_model.py:232); here it windows like everything else
            self.in_gather = Gather(block_size=cfg.main_block_size,
                                    kernel_size=3, conv_stride=1,
                                    conv_padding=1)
            self.in_scatter = Scatter(gather=self.in_gather,
                                      cache_slots=cfg.cache_slots)
        in_mult = (1,) + tuple(cfg.ch_mult)
        blocks, attns, downs = [], [], []
        curr_res = cfg.resolution
        block_in = None
        for i in range(nres):
            lvl_blocks, lvl_attns = [], []
            block_in = cfg.ch * in_mult[i]
            block_out = cfg.ch * cfg.ch_mult[i]
            for _ in range(cfg.num_res_blocks):
                lvl_blocks.append(SIGEVAEResnetBlock(
                    cfg=cfg, in_channels=block_in, out_channels=block_out))
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    lvl_attns.append(SIGEVAEAttnBlock(cfg=cfg, channels=block_in))
            blocks.append(lvl_blocks)
            attns.append(lvl_attns)
            if i != nres - 1:
                downs.append(SIGEVAEDownsample(cfg=cfg, channels=block_in))
                curr_res //= 2
        self.down_blocks = blocks
        self.down_attns = attns
        self.downsamples = downs
        self.mid_block1 = SIGEVAEResnetBlock(
            cfg=cfg, in_channels=block_in, out_channels=block_in)
        self.mid_attn = SIGEVAEAttnBlock(cfg=cfg, channels=block_in)
        self.mid_block2 = SIGEVAEResnetBlock(
            cfg=cfg, in_channels=block_in, out_channels=block_in)
        self.norm_out_scale = self.param(
            "norm_out_scale", nn.initializers.ones_init(), (block_in,))
        self.norm_out_bias = self.param(
            "norm_out_bias", nn.initializers.zeros_init(), (block_in,))
        zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        self.conv_out = SIGEConv2d(features=zc, kernel_size=3, padding=1,
                                   tile_input=False)

    def __call__(self, x, ctx: SIGECtx):
        cfg = self.cfg
        if self._head_sparse and ctx.mode == "sparse":
            hin = self.in_gather(x, ctx)
            hwin = self.conv_in(hin, ctx)
            if (cfg.window_chain and self.in_gather.planned_window()
                    and not ctx.sparse_update):
                # start the window chain at the stem: the canonical-window
                # overlay state replaces a 512^2 full-canvas cache write
                cache5 = self.in_scatter.get_variable("cache", "original")
                org, cov = self.in_gather.read_wsc(cache5.shape[2:4])
                y0w = window_slot_window(cache5, ctx.cache_id, org, cov.shape)
                h = WindowState(
                    jnp.where(cov[None, :, :, None], hwin.astype(y0w.dtype),
                              y0w),
                    cache5, ctx.cache_id, org)
            else:
                h = self.in_scatter(hwin, ctx)
        elif self._head_sparse and ctx.mode == "full":
            self.in_gather(x, ctx)  # records meta
            h = self.conv_in(x, ctx)
            h = self.in_scatter(h, ctx)
        else:
            h = self.conv_in(x, ctx)
        for i in range(len(cfg.ch_mult)):
            for ib in range(cfg.num_res_blocks):
                h = self.down_blocks[i][ib](h, ctx)
                if self.down_attns[i]:
                    h = self.down_attns[i][ib](h, ctx)
            if i != len(cfg.ch_mult) - 1:
                h = self.downsamples[i](h, ctx)
        h = self.mid_block1(h, ctx)
        h = self.mid_attn(h, ctx)
        h = self.mid_block2(h, ctx)
        h = _ensure_map(h)
        h, _, _ = group_norm_with_affine(
            h, cfg.num_groups, self.norm_out_scale, self.norm_out_bias, eps=1e-6)
        h = _swish(h)
        return self.conv_out(h, ctx)


class SIGEDecoder(SIGEModule):
    """Reference: sige_model.py:279-392."""

    cfg: SDVAEConfig = SDVAEConfig()

    def setup(self):
        cfg = self.cfg
        nres = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        self.conv_in = SIGEConv2d(features=block_in, kernel_size=3, padding=1,
                                  tile_input=False)
        self.mid_block1 = SIGEVAEResnetBlock(
            cfg=cfg, in_channels=block_in, out_channels=block_in)
        self.mid_attn = SIGEVAEAttnBlock(cfg=cfg, channels=block_in)
        self.mid_block2 = SIGEVAEResnetBlock(
            cfg=cfg, in_channels=block_in, out_channels=block_in)
        curr_res = cfg.resolution // (2 ** (nres - 1))
        blocks, attns, ups = [], [], []
        for i in reversed(range(nres)):
            lvl_blocks, lvl_attns = [], []
            block_out = cfg.ch * cfg.ch_mult[i]
            for _ in range(cfg.num_res_blocks + 1):
                lvl_blocks.append(SIGEVAEResnetBlock(
                    cfg=cfg, in_channels=block_in, out_channels=block_out))
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    lvl_attns.append(SIGEVAEAttnBlock(cfg=cfg, channels=block_in))
            blocks.insert(0, lvl_blocks)
            attns.insert(0, lvl_attns)
            if i != 0:
                ups.insert(0, SIGEVAEUpsample(cfg=cfg, channels=block_in))
                curr_res *= 2
        self.up_blocks = blocks
        self.up_attns = attns
        self.upsamples = ups
        self.norm_out_scale = self.param(
            "norm_out_scale", nn.initializers.ones_init(), (block_in,))
        self.norm_out_bias = self.param(
            "norm_out_bias", nn.initializers.zeros_init(), (block_in,))
        self._tail_sparse = (cfg.sige_tail
                             and cfg.main_block_size is not None)
        self.conv_out = SIGEConv2d(features=cfg.out_ch, kernel_size=3,
                                   padding=1,
                                   tile_input=self._tail_sparse)
        if self._tail_sparse:
            # param-free SIGE pair for the tail: norm_out's affine is
            # folded from the full pass into the gather epilogue
            # (reference keeps this tail dense; its DDPM models fold
            # every norm this way — sige_fused_unet.py:66-98)
            self.norm_out_fold = _FoldedNormAffine(
                num_groups=cfg.num_groups, cache_slots=cfg.cache_slots)
            self.out_gather = Gather(block_size=cfg.main_block_size,
                                     kernel_size=3, conv_stride=1,
                                     conv_padding=1, activation="swish")
            self.out_scatter = Scatter(gather=self.out_gather,
                                       cache_slots=cfg.cache_slots)

    def _tail(self, h, ctx: SIGECtx):
        """norm_out -> swish -> conv_out. Dense mode is the reference's
        live-stat tail; full mode additionally caches the folded affine
        and output map; sparse replays them windowed/tiled (frozen
        original statistics — the reference's own norm-fold semantics)."""
        cfg = self.cfg
        if not self._tail_sparse or ctx.mode == "dense":
            h = _ensure_map(h)
            h, _, _ = group_norm_with_affine(
                h, cfg.num_groups, self.norm_out_scale, self.norm_out_bias,
                eps=1e-6)
            return self.conv_out(_swish(h), ctx)
        if ctx.mode == "full":
            h = _ensure_map(h)
            hn, _, _ = self.norm_out_fold(
                h, self.norm_out_scale, self.norm_out_bias, ctx)
            self.out_gather(h, ctx)  # records meta
            out = self.conv_out(_swish(hn), ctx)
            return self.out_scatter(out, ctx)
        # sparse
        _, sc, sh = self.norm_out_fold(
            None, self.norm_out_scale, self.norm_out_bias, ctx)
        if (isinstance(h, WindowState)
                and self.out_gather.planned_window()):
            ext = window_chain_extend(
                h.win, h.org, h.cache5, h.cache_id,
                self.out_gather.get_variable("sige", "win_in"),
                self.out_gather.get_variable("sige", "win_edge"),
                sc, sh, "swish", rel=chain_rel(self.out_gather))
        else:
            ext = self.out_gather(_ensure_map(h), ctx, scale=sc, shift=sh)
        out = self.conv_out(ext, ctx)
        return self.out_scatter(out, ctx)

    def __call__(self, z, ctx: SIGECtx):
        cfg = self.cfg
        h = self.conv_in(z, ctx)
        h = self.mid_block1(h, ctx)
        h = self.mid_attn(h, ctx)
        h = self.mid_block2(h, ctx)
        for i in reversed(range(len(cfg.ch_mult))):
            for ib in range(cfg.num_res_blocks + 1):
                h = self.up_blocks[i][ib](h, ctx)
                if self.up_attns[i]:
                    h = self.up_attns[i][ib](h, ctx)
            if i != 0:
                # the upsample consumes WindowState directly (window
                # chains cross the resample; it materializes otherwise)
                h = self.upsamples[i - 1](h, ctx)
        if self._tail_sparse:
            return self._tail(h, ctx)
        h = _ensure_map(h)
        h, _, _ = group_norm_with_affine(
            h, cfg.num_groups, self.norm_out_scale, self.norm_out_bias, eps=1e-6)
        h = _swish(h)
        return self.conv_out(h, ctx)
