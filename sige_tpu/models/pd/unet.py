"""Progressive Distillation U-Net with SIGE sparse wiring.

Architectural differences from the DDPM U-Net (reference:
diffusion/models/pd_arch/{unet,sige_unet}.py):
  * resampling happens *inside* resblocks (avg-pool down / nearest up on
    both the main and shortcut paths) instead of standalone layers;
  * temb conditioning is scale-shift: ``h = h * (1 + s) + b`` after norm2,
    folded as scale2 = (1 + s) * scale, shift2 = (1 + s) * shift + b
    (reference: sige_unet.py:113-120);
  * per-block temb projections (unfused — the pd checkpoints store them
    per block), temb from a logsnr embedding;
  * multi-head attention (head_dim 64) — never sparse in the shipped
    configs (attn at 8/16/32 < threshold 64) but wired for it;
  * resample blocks gather *after* resampling with an identity epilogue
    (the norm1 swish can't fuse across the resample;
    reference: sige_unet.py:144-152).
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
    Scatter,
    chain_rel,
    ScatterGather,
    ScatterWithBlockResidual,
    SIGEConv2d,
    SIGECtx,
    SIGEModule,
    WindowState,
    sow_dense_macs,
    sow_macs,
)
from ...nn.norm import group_norm_with_affine
from ...ops.window import (
    window_chain_extend,
    window_chain_extend_up2,
    window_epilogue,
    window_gather,
    window_slot_window,
)
from ..ddpm.unet import (_FoldedGroupNorm, _FoldedNormAffine, _swish,
                         _to_map, timestep_embedding)


@dataclasses.dataclass(frozen=True)
class PDUNetConfig:
    """church pd256 defaults (reference: diffusion/configs/church_pd256-sige.yml)."""

    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 1, 2, 4, 6, 8)
    num_res_blocks: int = 3
    attn_resolutions: Tuple[int, ...] = (8, 16, 32)
    in_ch: int = 3
    out_ch: int = 6
    resolution: int = 256
    temb_ch: int = 768
    head_dim: Optional[int] = 64
    num_heads: Optional[int] = None
    num_groups: int = 32
    logsnr_input_type: str = "inv_cos"
    block_size_normal: Optional[int] = 6
    block_size_instance: Optional[int] = 4
    sparse_resolution_threshold: int = 64
    #: window-layout chains (see ddpm unet) incl. across up-resblocks and
    #: down-resblocks (pre-pool doubled extraction windows, planner
    #: ``wdnp_in`` products).
    window_chain: bool = True
    #: fold norm_out + window conv_out (see ddpm unet sige_tail; default
    #: ON — the benched library configuration; parity suites pin False)
    sige_tail: bool = True
    cache_slots: int = 1


def avg_pool2(x):
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def up2x(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class SIGEPDResnetBlock(SIGEModule):
    """Reference: diffusion/models/pd_arch/sige_unet.py:12-175."""

    cfg: PDUNetConfig
    in_channels: int
    out_channels: int
    resample: Optional[str] = None  # None | "down" | "up"
    support_sparse: bool = False

    def setup(self):
        cfg = self.cfg
        cin, cout = self.in_channels, self.out_channels
        self.main_sparse = self.support_sparse and cfg.block_size_normal is not None
        self.shortcut_sparse = (
            self.main_sparse and cin != cout and cfg.block_size_instance is not None
        )
        self.norm1 = _FoldedGroupNorm(cin, cfg.num_groups, cfg.cache_slots)
        self.conv1 = SIGEConv2d(features=cout, kernel_size=3, padding=1,
                                tile_input=self.main_sparse)
        self.temb_proj = nn.Dense(2 * cout)
        self.norm2 = _FoldedGroupNorm(cout, cfg.num_groups, cfg.cache_slots)
        self.conv2 = SIGEConv2d(features=cout, kernel_size=3, padding=1,
                                tile_input=self.main_sparse)
        if self.main_sparse:
            self.main_gather = Gather(
                block_size=cfg.block_size_normal, kernel_size=3, conv_stride=1,
                conv_padding=1,
                activation="swish" if self.resample is None else "identity",
                prepool_chain=self.resample == "down")
            self.sg = ScatterGather(gather=self.main_gather, activation="swish",
                                    cache_slots=cfg.cache_slots)
        if cin != cout:
            self.nin_shortcut = SIGEConv2d(features=cout, kernel_size=1,
                                           padding=0,
                                           tile_input=self.shortcut_sparse)
            if self.shortcut_sparse:
                self.shortcut_gather = Gather(
                    block_size=cfg.block_size_instance, kernel_size=1,
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

    def _resample(self, x):
        if self.resample == "down":
            return avg_pool2(x)
        if self.resample == "up":
            return up2x(x)
        return x

    def __call__(self, x, temb, ctx: SIGECtx):
        """``x`` may be a tuple (h, skip): the U-Net's skip join (see
        ddpm unet — window chains extend each part separately)."""
        chain_ok = (
            ctx.mode == "sparse" and self.main_sparse
            and self.cfg.window_chain and not ctx.sparse_update
            and self.main_gather.planned_window()
            and (self.resample is None
                 or (self.resample == "up" and isinstance(x, WindowState)
                     and self.main_gather.has_variable("sige", "wup_ok"))
                 or (self.resample == "down"
                     and self.main_gather.has_variable("sige", "wdnp_in"))))
        if chain_ok:
            return self._chain_window(x, ctx)
        if isinstance(x, tuple):
            x = jnp.concatenate([_to_map(a) for a in x], axis=-1)
        else:
            x = _to_map(x)
        h, xs = x, self._resample(x)
        if self.in_channels != self.out_channels:
            if self.shortcut_sparse:
                xs = self.shortcut_gather(xs, ctx)  # raw tiles, no norm fold
            xs = self.nin_shortcut(xs, ctx)

        if ctx.mode in ("dense", "full"):
            emb = self.temb_proj(_swish(temb))
            sow_dense_macs(self, temb, 2 * self.out_channels)
            emb_scale, emb_shift = jnp.split(emb, 2, axis=-1)  # [B, cout] each
            h, _, _ = self.norm1(h, ctx)
            h = _swish(h)
            h = self._resample(h)
            if self.main_sparse:
                h = self.main_gather(h, ctx)
            h = self.conv1(h, ctx)
            if self.main_sparse:
                h = self.sg(h, ctx)  # caches conv1 output
            # scale-shift temb conditioning folded into norm2's affine
            h, _, _ = self.norm2(
                h, ctx, post_scale=1.0 + emb_scale, post_shift=emb_shift)
            h = h * (1.0 + emb_scale[:, None, None, :]) + emb_shift[:, None, None, :]
            h = _swish(h)
            h = self.conv2(h, ctx)
        else:  # sparse
            _, s1, b1 = self.norm1(h, ctx)
            if self.main_sparse and self.resample is None:
                h = self.main_gather(h, ctx, scale=s1, shift=b1)  # swish fused
            else:
                h = _swish(h * s1[:, None, None, :] + b1[:, None, None, :])
                h = self._resample(h)
                if self.main_sparse:
                    h = self.main_gather(h, ctx)
            h = self.conv1(h, ctx)
            _, s2, b2 = self.norm2(h, ctx)
            if self.main_sparse:
                h = self.sg(h, ctx, scale=s2, shift=b2)  # swish fused
            else:
                h = _swish(h * s2[:, None, None, :] + b2[:, None, None, :])
            h = self.conv2(h, ctx)

        if self.main_sparse:
            return self.join(h, ctx, residual=xs)
        return h + xs

    # -- window-resident sparse path (see ddpm unet _chain_window) -------
    def _chain_window(self, x, ctx: SIGECtx) -> "WindowState":
        g = self.main_gather
        meta = g.get_variable("sige", "win_in")
        edge = g.get_variable("sige", "win_edge")
        org = g.get_variable("sige", "win_org")
        parts = x if isinstance(x, tuple) else (x,)
        _, s1, b1 = self.norm1(None, ctx)

        if self.resample == "up":
            # norm1+swish happen BEFORE the nearest-2x resample; both are
            # pointwise, so apply them to the carried window and double
            # it — the planner's nesting makes the doubled window cover
            # the whole extraction window (no cache ring needed)
            st = parts[0]
            w = _swish(st.win * s1[:, None, None, :] + b1[:, None, None, :])
            win2 = jnp.repeat(jnp.repeat(w, 2, axis=1), 2, axis=2)
            ext = window_chain_extend_up2(win2, st.org * 2, meta, edge)
            xs2 = jnp.repeat(jnp.repeat(st.win, 2, axis=1), 2, axis=2)
        elif self.resample == "down":
            # norm1+swish happen BEFORE the avg-pool: extract the raw
            # extraction window DOUBLED to the producer's resolution from
            # its (cache, window) state, apply the folded affine + swish,
            # pool, and conv — the full fine map is never touched. The
            # raw doubled window also supplies the pooled shortcut below.
            meta2 = g.get_variable("sige", "wdnp_in")
            edge2 = g.get_variable("sige", "wdnp_edge")
            p = parts[0]
            if isinstance(p, WindowState):
                ext2 = window_chain_extend(p.win, p.org, p.cache5,
                                           p.cache_id, meta2, edge2)
            else:
                ext2 = window_gather(p, meta2, edge2)
            ext = avg_pool2(window_epilogue(ext2, edge2, s1, b1, "swish"))
        else:
            exts = []
            for p in parts:
                if isinstance(p, WindowState):
                    exts.append(window_chain_extend(
                        p.win, p.org, p.cache5, p.cache_id, meta, edge,
                        rel=chain_rel(g)))
                else:
                    exts.append(window_gather(p, meta, edge))
            ext = jnp.concatenate(exts, axis=-1)
            ext = window_epilogue(ext, edge, s1, b1, "swish")

        h = self.conv1(ext, ctx)
        _, s2, b2 = self.norm2(h, ctx)  # cached affine includes temb fold
        h = self.sg(h, ctx, scale=s2, shift=b2)
        h = self.conv2(h, ctx)

        cache5 = self.join.get_variable("cache", "original")
        res = cache5.shape[2:4]
        _, cov = g.read_wsc(res)
        WH, WW = cov.shape

        zero = jnp.int32(0)
        if self.resample == "up":
            # shortcut = nearest-2x of the input: slice the doubled
            # carried window at the output's canonical origin
            st = parts[0]
            xs = jax.lax.dynamic_slice(
                xs2, (zero, org[0] - 2 * st.org[0], org[1] - 2 * st.org[1],
                      zero), (xs2.shape[0], WH, WW, xs2.shape[3]))
        elif self.resample == "down":
            # shortcut = avg-pool of the raw input: the doubled window is
            # aligned to its virtual origin 2*(org - 1), so the output
            # window's pre-pool extent starts at static offset (2, 2)
            xs = avg_pool2(jax.lax.slice(
                ext2, (0, 2, 2, 0),
                (ext2.shape[0], 2 + 2 * WH, 2 + 2 * WW, ext2.shape[3])))
        else:
            wins = []
            for p in parts:
                if isinstance(p, WindowState):
                    wins.append(p.win)
                else:
                    wins.append(jax.lax.dynamic_slice(
                        p, (zero, org[0], org[1], zero),
                        (p.shape[0], WH, WW, p.shape[3])))
            xs = jnp.concatenate(wins, axis=-1)

        y0w = window_slot_window(cache5, ctx.cache_id, org, (WH, WW))
        m = cov[None, :, :, None]
        if self.in_channels != self.out_channels:
            xs = self.nin_shortcut(xs, ctx)
            if self.shortcut_sparse:
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


class SIGEPDAttnBlock(SIGEModule):
    """Multi-head global attention (reference: sige_unet.py:177-266)."""

    cfg: PDUNetConfig
    channels: int
    support_sparse: bool = False

    def setup(self):
        cfg = self.cfg
        if cfg.head_dim is not None:
            assert cfg.num_heads is None
            self.num_heads = self.channels // cfg.head_dim
            self.head_dim = cfg.head_dim
        else:
            self.num_heads = cfg.num_heads
            self.head_dim = self.channels // cfg.num_heads
        self.sparse_ok = self.support_sparse and cfg.block_size_instance is not None
        self.norm = _FoldedGroupNorm(self.channels, cfg.num_groups, cfg.cache_slots)
        self.qkv = SIGEConv2d(features=3 * self.num_heads * self.head_dim,
                              kernel_size=1, padding=0, tile_input=self.sparse_ok)
        self.proj_out = SIGEConv2d(features=self.channels, kernel_size=1,
                                   padding=0, tile_input=self.sparse_ok)
        if self.sparse_ok:
            bs = cfg.block_size_instance
            self.gather1 = Gather(block_size=bs, kernel_size=1, conv_stride=1, conv_padding=0)
            self.scatter1 = Scatter(gather=self.gather1, cache_slots=cfg.cache_slots)
            self.gather2 = Gather(block_size=bs, kernel_size=1, conv_stride=1, conv_padding=0)
            self.scatter2 = Scatter(gather=self.gather2, cache_slots=cfg.cache_slots)

    def _attend(self, qkv):
        from ...ops.attention import mha

        B, H, W, _ = qkv.shape
        nh, hd = self.num_heads, self.head_dim
        q, k, v = jnp.split(qkv.reshape(B, H * W, 3 * nh * hd), 3, axis=-1)
        out = mha(q, k, v, nh, hd)
        sow_macs(self, 2 * B * H * W * H * W * nh * hd)
        return out.reshape(B, H, W, nh * hd)

    def __call__(self, x, ctx: SIGECtx):
        x = _to_map(x)  # global attention needs the full map (chain break)
        if ctx.mode in ("dense", "full"):
            h = self.gather1(x, ctx) if self.sparse_ok else x
            h, _, _ = self.norm(h, ctx)
            qkv = self.qkv(h, ctx)
            if self.sparse_ok:
                qkv = self.scatter1(qkv, ctx)
            h = self._attend(qkv)
            if self.sparse_ok:
                h = self.gather2(h, ctx)
            h = self.proj_out(h, ctx)
            return self.scatter2(h, ctx, residual=x) if self.sparse_ok else h + x
        _, s, b = self.norm(x, ctx)
        if self.sparse_ok:
            h = self.gather1(x, ctx, scale=s, shift=b)
        else:
            h = x * s[:, None, None, :] + b[:, None, None, :]
        qkv = self.qkv(h, ctx)
        if self.sparse_ok:
            qkv = self.scatter1(qkv, ctx)
        h = self._attend(qkv)
        if self.sparse_ok:
            h = self.gather2(h, ctx)
        h = self.proj_out(h, ctx)
        return self.scatter2(h, ctx, residual=x) if self.sparse_ok else h + x


class SIGEPDUNet(SIGEModule):
    """Reference: sige_unet.py:269-474. ``__call__(x, logsnr, ctx)``."""

    cfg: PDUNetConfig = PDUNetConfig()

    def setup(self):
        cfg = self.cfg
        nres = len(cfg.ch_mult)
        self.temb_dense0 = nn.Dense(cfg.temb_ch)
        self.temb_dense1 = nn.Dense(cfg.temb_ch)
        self._head_sparse = (cfg.sige_tail
                             and cfg.block_size_normal is not None
                             and cfg.resolution
                             >= cfg.sparse_resolution_threshold)
        self.conv_in = SIGEConv2d(features=cfg.ch, kernel_size=3, padding=1,
                                  tile_input=self._head_sparse)
        if self._head_sparse:
            # param-free SIGE pair for the stem (see ddpm unet)
            self.in_gather = Gather(block_size=cfg.block_size_normal,
                                    kernel_size=3, conv_stride=1,
                                    conv_padding=1)
            self.in_scatter = Scatter(gather=self.in_gather,
                                      cache_slots=cfg.cache_slots)

        in_mult = (1,) + tuple(cfg.ch_mult)
        down_blocks, down_attns, downsamples = [], [], []
        curr_res = cfg.resolution
        block_in = None
        for i in range(nres):
            blocks, attns = [], []
            block_in = cfg.ch * in_mult[i]
            block_out = cfg.ch * cfg.ch_mult[i]
            sparse = curr_res >= cfg.sparse_resolution_threshold
            for _ in range(cfg.num_res_blocks):
                blocks.append(SIGEPDResnetBlock(
                    cfg=cfg, in_channels=block_in, out_channels=block_out,
                    support_sparse=sparse))
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    attns.append(SIGEPDAttnBlock(cfg=cfg, channels=block_in))
            down_blocks.append(blocks)
            down_attns.append(attns)
            if i != nres - 1:
                downsamples.append(SIGEPDResnetBlock(
                    cfg=cfg, in_channels=block_in, out_channels=block_in,
                    resample="down", support_sparse=sparse))
                curr_res //= 2
        self.down_blocks = down_blocks
        self.down_attns = down_attns
        self.downsamples = downsamples

        sparse_mid = curr_res >= cfg.sparse_resolution_threshold
        self.mid_block1 = SIGEPDResnetBlock(
            cfg=cfg, in_channels=block_in, out_channels=block_in,
            support_sparse=sparse_mid)
        self.mid_attn = SIGEPDAttnBlock(cfg=cfg, channels=block_in)
        self.mid_block2 = SIGEPDResnetBlock(
            cfg=cfg, in_channels=block_in, out_channels=block_in,
            support_sparse=sparse_mid)

        up_blocks, up_attns, upsamples = [], [], []
        for i in reversed(range(nres)):
            blocks, attns = [], []
            block_out = cfg.ch * cfg.ch_mult[i]
            skip_in = cfg.ch * cfg.ch_mult[i]
            sparse = curr_res >= cfg.sparse_resolution_threshold
            for ib in range(cfg.num_res_blocks + 1):
                if ib == cfg.num_res_blocks:
                    skip_in = cfg.ch * in_mult[i]
                blocks.append(SIGEPDResnetBlock(
                    cfg=cfg, in_channels=block_in + skip_in,
                    out_channels=block_out, support_sparse=sparse))
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    attns.append(SIGEPDAttnBlock(cfg=cfg, channels=block_in))
            up_blocks.insert(0, blocks)
            up_attns.insert(0, attns)
            if i != 0:
                upsamples.insert(0, SIGEPDResnetBlock(
                    cfg=cfg, in_channels=block_in, out_channels=block_out,
                    resample="up", support_sparse=sparse))
                curr_res *= 2
        self.up_blocks = up_blocks
        self.up_attns = up_attns
        self.upsamples = upsamples

        self.norm_out_scale = self.param(
            "norm_out_scale", nn.initializers.ones_init(), (block_in,))
        self.norm_out_bias = self.param(
            "norm_out_bias", nn.initializers.zeros_init(), (block_in,))
        self._tail_sparse = (cfg.sige_tail
                             and cfg.block_size_normal is not None)
        self.conv_out = SIGEConv2d(features=cfg.out_ch, kernel_size=3,
                                   padding=1, tile_input=self._tail_sparse)
        if self._tail_sparse:
            self.norm_out_fold = _FoldedNormAffine(
                num_groups=cfg.num_groups, cache_slots=cfg.cache_slots)
            self.out_gather = Gather(block_size=cfg.block_size_normal,
                                     kernel_size=3, conv_stride=1,
                                     conv_padding=1, activation="swish")
            self.out_scatter = Scatter(gather=self.out_gather,
                                       cache_slots=cfg.cache_slots)

    def _tail(self, h, ctx: SIGECtx):
        if ctx.mode == "full":
            h = _to_map(h)
            hn, _, _ = self.norm_out_fold(
                h, self.norm_out_scale, self.norm_out_bias, ctx)
            self.out_gather(h, ctx)  # records meta
            out = self.conv_out(_swish(hn), ctx)
            return self.out_scatter(out, ctx)
        _, sc, sh = self.norm_out_fold(
            None, self.norm_out_scale, self.norm_out_bias, ctx)
        if isinstance(h, WindowState) and self.out_gather.planned_window():
            ext = window_chain_extend(
                h.win, h.org, h.cache5, h.cache_id,
                self.out_gather.get_variable("sige", "win_in"),
                self.out_gather.get_variable("sige", "win_edge"),
                sc, sh, "swish", rel=chain_rel(self.out_gather))
        else:
            ext = self.out_gather(_to_map(h), ctx, scale=sc, shift=sh)
        out = self.conv_out(ext, ctx)
        return self.out_scatter(out, ctx)

    def _logsnr_input(self, logsnr):
        t = self.cfg.logsnr_input_type
        if t == "linear":
            raise NotImplementedError("linear logsnr input needs scale range")
        if t == "sigmoid":
            return jax.nn.sigmoid(logsnr)
        if t == "inv_cos":
            return jnp.arctan(jnp.exp(-0.5 * jnp.clip(logsnr, -20.0, 20.0))) / (
                0.5 * math.pi)
        raise NotImplementedError(t)

    def __call__(self, x, logsnr, ctx: SIGECtx):
        cfg = self.cfg
        nres = len(cfg.ch_mult)
        if ctx.mode in ("dense", "full"):
            temb = timestep_embedding(self._logsnr_input(logsnr) * 1000.0, cfg.ch)
            sow_dense_macs(self, temb, self.cfg.temb_ch)
            temb = self.temb_dense0(temb)
            temb = _swish(temb)
            sow_dense_macs(self, temb, self.cfg.temb_ch)
            temb = self.temb_dense1(temb)
        else:
            temb = None

        if self._head_sparse and ctx.mode == "sparse":
            hwin = self.conv_in(self.in_gather(x, ctx), ctx)
            if (cfg.window_chain and self.in_gather.planned_window()
                    and not ctx.sparse_update):
                # start the window chain at the stem (see ddpm unet)
                cache5 = self.in_scatter.get_variable("cache", "original")
                org, cov = self.in_gather.read_wsc(cache5.shape[2:4])
                y0w = window_slot_window(cache5, ctx.cache_id, org,
                                         cov.shape)
                hs = [WindowState(
                    jnp.where(cov[None, :, :, None],
                              hwin.astype(y0w.dtype), y0w),
                    cache5, ctx.cache_id, org)]
            else:
                hs = [self.in_scatter(hwin, ctx)]
        elif self._head_sparse and ctx.mode == "full":
            self.in_gather(x, ctx)  # records meta
            hs = [self.in_scatter(self.conv_in(x, ctx), ctx)]
        else:
            hs = [self.conv_in(x, ctx)]
        for i in range(nres):
            for ib in range(cfg.num_res_blocks):
                h = self.down_blocks[i][ib](hs[-1], temb, ctx)
                if self.down_attns[i]:
                    h = self.down_attns[i][ib](h, ctx)
                hs.append(h)
            if i != nres - 1:
                hs.append(self.downsamples[i](hs[-1], temb, ctx))

        h = hs[-1]
        h = self.mid_block1(h, temb, ctx)
        h = self.mid_attn(h, ctx)
        h = self.mid_block2(h, temb, ctx)

        for i in reversed(range(nres)):
            for ib in range(cfg.num_res_blocks + 1):
                # skip join as a tuple (window chains extend each part)
                h = self.up_blocks[i][ib]((h, hs.pop()), temb, ctx)
                if self.up_attns[i]:
                    h = self.up_attns[i][ib](h, ctx)
            if i != 0:
                h = self.upsamples[i - 1](h, temb, ctx)

        if self._tail_sparse and ctx.mode != "dense":
            return self._tail(h, ctx)
        h = _to_map(h)
        h, _, _ = group_norm_with_affine(
            h, cfg.num_groups, self.norm_out_scale, self.norm_out_bias, eps=1e-6)
        h = _swish(h)
        return self.conv_out(h, ctx)
