"""DDPM U-Net (Ho et al. architecture) with SIGE sparse wiring — the
flagship model of the engine.

One module class serves three execution modes through :class:`SIGECtx`:
``dense`` (the vanilla baseline — the reference keeps a separate
``FusedUNet`` class for this; reference:
diffusion/models/ddpm_arch/fused_unet.py), ``full`` (dense + cache/affine
refresh), and ``sparse`` (tile inference). The SIGE wiring mirrors the
reference's ``SIGEFusedUNet``
(reference: diffusion/models/ddpm_arch/sige_fused_unet.py):

  * resblocks: gather(+folded norm1, swish) -> conv1 -> fused
    scatter/re-gather(+folded norm2 with temb absorbed into the shift,
    swish) -> conv2 -> scatter(+shortcut); shortcut uses its own
    block-size-4 gather and the block-residual join when channels change;
  * attention stays *global*: qkv tiles are scattered back onto the cached
    full map before attention, and only proj_out runs on tiles;
  * levels are sparse only at resolution >= ``sparse_resolution_threshold``
    (64 for church256 — so attention at 16 runs dense with cached folded
    norms);
  * the per-block temb projections are fused into one matmul
    (reference: fused_unet.py:244-295), sliced per block in traversal
    order — on TPU one big MXU matmul beats 22 tiny ones;
  * Downsample pads (0,1,0,1) asymmetrically in full/dense mode only; the
    sparse path relies on gather offset 0
    (reference: sige_fused_unet.py:243-246).

Note: the reference's attention block stores its folded norm as a tensor
and then indexes it by cache id (sige_fused_unet.py:170-175), which
collapses the per-channel affine to channel ``cache_id``'s scalar; this
implementation stores the full per-channel affine per cache slot — the
clear intent.
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
    ScatterGather,
    ScatterWithBlockResidual,
    SIGEConv2d,
    SIGECtx,
    SIGEModule,
    WindowState,
    _slotted_cache,
    chain_rel,
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


def _to_map(x):
    """Materialize a chain state at a chain break."""
    return x.to_map() if isinstance(x, WindowState) else x


@dataclasses.dataclass(frozen=True)
class DDPMUNetConfig:
    """Architecture config (church256 defaults; reference:
    diffusion/configs/church_ddpm256-sige.yml)."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    in_ch: int = 3
    out_ch: int = 3
    resolution: int = 256
    resamp_with_conv: bool = True
    num_groups: int = 32
    block_size_normal: Optional[int] = 6
    block_size_instance: Optional[int] = 4
    sparse_resolution_threshold: int = 64
    #: window-layout chains: thread (window, cache) state through
    #: resblocks, skip concatenations and upsamples (full maps only at
    #: attention / downsamples / the tail). Strictly fewer full-canvas
    #: copies; sparse == full on the original input is preserved.
    window_chain: bool = True
    #: SIGE-ify the tail (fold norm_out's affine from the full pass,
    #: gather/scatter the conv_out). The reference keeps the tail dense
    #: with live statistics (sige_fused_unet.py:431-433); freezing the
    #: original image's statistics matches its norm-fold semantics
    #: everywhere else and removes the last full-res dense compute.
    #: Default ON (the benched library configuration — sparse == full on
    #: the original input is preserved exactly, and the edit-tracking
    #: approximation is equivalence-tested); the reference-oracle parity
    #: suites pin False to match the reference's live-stat dense tail.
    sige_tail: bool = True
    cache_slots: int = 1

    @property
    def temb_ch(self) -> int:
        return self.ch * 4


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal timestep embedding (transformer/fairseq convention;
    reference: diffusion/models/common.py:8-26)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - 1)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _swish(x):
    return x * jax.nn.sigmoid(x)


class _FoldedGroupNorm(nn.Module):
    """GroupNorm whose (scale, shift) affine is cached per slot in
    full mode and replayed in sparse mode."""

    channels: int
    num_groups: int
    cache_slots: int = 1

    @nn.compact
    def __call__(self, x, ctx: SIGECtx, pre_shift=None, post_scale=None,
                 post_shift=None):
        """In dense/full mode: normalize x (returning it *without* the
        post terms applied) and, in full mode, cache the composed affine:

          * ``pre_shift`` — a [B, C] offset already added to the *input*
            (DDPM's additive temb): shift += pre_shift * scale
            (reference: sige_fused_unet.py:87-89);
          * ``post_scale`` / ``post_shift`` — [B, C] terms the caller
            applies *after* the norm (PD's ``h*(1+s)+b``): scale, shift
            scale by post_scale, then shift += post_shift
            (reference: pd_arch/sige_unet.py:113-120).

        In sparse mode: return the cached (scale, shift) for the gather
        epilogues instead of touching x."""
        w = self.param("scale", nn.initializers.ones_init(), (self.channels,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.channels,))
        if ctx.mode in ("dense", "full"):
            xn, scale, shift = group_norm_with_affine(x, self.num_groups, w, b, eps=1e-6)
            if ctx.mode == "full":
                if pre_shift is not None:
                    shift = pre_shift * scale + shift
                if post_scale is not None:
                    scale = post_scale * scale
                    shift = post_scale * shift
                if post_shift is not None:
                    shift = shift + post_shift
                _slotted_cache(self, "scale", scale, self.cache_slots, ctx.cache_id)
                _slotted_cache(self, "shift", shift, self.cache_slots, ctx.cache_id)
            return xn, None, None
        if ctx.mode == "sparse":
            from ...nn.module import _read_slot
            scale = _read_slot(self.get_variable("cache", "scale"), ctx.cache_id)
            shift = _read_slot(self.get_variable("cache", "shift"), ctx.cache_id)
            return None, scale, shift
        raise ValueError(ctx.mode)


class _FoldedNormAffine(SIGEModule):
    """GroupNorm using externally-owned (w, b) params whose equivalent
    per-channel affine is cached per slot in full mode and replayed in
    sparse mode (the model-tail variant of _FoldedGroupNorm — the affine
    params stay where the checkpoint converters put them)."""

    num_groups: int
    cache_slots: int = 1

    @nn.compact
    def __call__(self, x, w, b, ctx: SIGECtx):
        from ...nn.module import _read_slot

        if ctx.mode == "dense":
            xn, _, _ = group_norm_with_affine(x, self.num_groups, w, b,
                                              eps=1e-6)
            return xn, None, None
        if ctx.mode == "full":
            xn, sc, sh = group_norm_with_affine(x, self.num_groups, w, b,
                                                eps=1e-6)
            _slotted_cache(self, "scale", sc, self.cache_slots, ctx.cache_id)
            _slotted_cache(self, "shift", sh, self.cache_slots, ctx.cache_id)
            return xn, None, None
        sc = _read_slot(self.get_variable("cache", "scale"), ctx.cache_id)
        sh = _read_slot(self.get_variable("cache", "shift"), ctx.cache_id)
        return None, sc, sh


class SIGEResnetBlock(SIGEModule):
    """Reference: diffusion/models/ddpm_arch/sige_fused_unet.py:10-131."""

    cfg: DDPMUNetConfig
    in_channels: int
    out_channels: int
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
        self.norm2 = _FoldedGroupNorm(cout, cfg.num_groups, cfg.cache_slots)
        self.conv2 = SIGEConv2d(features=cout, kernel_size=3, padding=1,
                                tile_input=self.main_sparse)
        if self.main_sparse:
            self.main_gather = Gather(
                block_size=cfg.block_size_normal, kernel_size=3, conv_stride=1,
                conv_padding=1, activation="swish",
            )
            self.sg = ScatterGather(
                gather=self.main_gather, activation="swish",
                cache_slots=cfg.cache_slots,
            )
        if cin != cout:
            self.nin_shortcut = SIGEConv2d(features=cout, kernel_size=1, padding=0,
                                           tile_input=self.shortcut_sparse)
            if self.shortcut_sparse:
                self.shortcut_gather = Gather(
                    block_size=cfg.block_size_instance, kernel_size=1,
                    conv_stride=1, conv_padding=0,
                )
                self.join = ScatterWithBlockResidual(
                    main_gather=self.main_gather,
                    shortcut_gather=self.shortcut_gather,
                    cache_slots=cfg.cache_slots,
                )
            elif self.main_sparse:
                self.join = Scatter(gather=self.main_gather, cache_slots=cfg.cache_slots)
        elif self.main_sparse:
            self.join = Scatter(gather=self.main_gather, cache_slots=cfg.cache_slots)

    def __call__(self, x, temb, ctx: SIGECtx):
        """``temb``: [B, out_channels] pre-sliced fused projection (full /
        dense modes; ignored in sparse — it lives in the cached shift).

        ``x`` may be a tuple (h, skip) — the U-Net's skip concatenation:
        dense/full/tile modes concatenate the maps here; the
        window-chain sparse path extends each part's window separately
        and concatenates window-resident."""
        if (ctx.mode == "sparse" and self.main_sparse
                and self.cfg.window_chain and not ctx.sparse_update
                and self.main_gather.planned_window()):
            return self._chain_window(x, ctx)
        if isinstance(x, tuple):
            x = jnp.concatenate([_to_map(a) for a in x], axis=-1)
        else:
            x = _to_map(x)
        h, xs = x, x
        if self.in_channels != self.out_channels:
            if self.shortcut_sparse:
                xs = self.shortcut_gather(xs, ctx)
            xs = self.nin_shortcut(xs, ctx)

        if ctx.mode in ("dense", "full"):
            if self.main_sparse:
                h = self.main_gather(h, ctx)  # records geometry/resolution
            h, _, _ = self.norm1(h, ctx)
            h = _swish(h)
            h = self.conv1(h, ctx)
            if self.main_sparse:
                h = self.sg(h, ctx)  # caches conv1 output (pre-temb)
            h = h + temb[:, None, None, :]
            h, _, _ = self.norm2(h, ctx, pre_shift=temb)
            h = _swish(h)
            h = self.conv2(h, ctx)
        else:  # sparse
            _, s1, b1 = self.norm1(h, ctx)
            if self.main_sparse:
                h = self.main_gather(h, ctx, scale=s1, shift=b1)  # swish fused
            else:
                h = _swish(h * s1[:, None, None, :] + b1[:, None, None, :])
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

    # -- window-resident sparse path (mirrors vae.py _chain_window) ------
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
        if self.in_channels != self.out_channels:
            xs = self.nin_shortcut(xs, ctx)
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


class SIGEAttnBlock(SIGEModule):
    """Global single-head attention; in sparse mode the qkv tiles are
    scattered onto the cached full qkv map so K/V stay global
    (reference: diffusion/models/ddpm_arch/sige_fused_unet.py:134-209)."""

    cfg: DDPMUNetConfig
    channels: int
    support_sparse: bool = False

    def setup(self):
        cfg = self.cfg
        self.sparse_ok = self.support_sparse and cfg.block_size_instance is not None
        self.norm = _FoldedGroupNorm(self.channels, cfg.num_groups, cfg.cache_slots)
        self.qkv = SIGEConv2d(features=3 * self.channels, kernel_size=1, padding=0,
                              tile_input=self.sparse_ok)
        self.proj_out = SIGEConv2d(features=self.channels, kernel_size=1, padding=0,
                                   tile_input=self.sparse_ok)
        if self.sparse_ok:
            bs = cfg.block_size_instance
            self.gather1 = Gather(block_size=bs, kernel_size=1, conv_stride=1, conv_padding=0)
            self.scatter1 = Scatter(gather=self.gather1, cache_slots=cfg.cache_slots)
            self.gather2 = Gather(block_size=bs, kernel_size=1, conv_stride=1, conv_padding=0)
            self.scatter2 = Scatter(gather=self.gather2, cache_slots=cfg.cache_slots)

    def _attend(self, qkv):
        from ...ops.attention import mha

        B, H, W, _ = qkv.shape
        C = self.channels
        q, k, v = jnp.split(qkv.reshape(B, H * W, 3 * C), 3, axis=-1)
        out = mha(q, k, v, 1, C)
        sow_macs(self, 2 * B * H * W * H * W * C)
        return out.reshape(B, H, W, C)

    def __call__(self, x, ctx: SIGECtx):
        x = _to_map(x)  # global attention needs the full map (chain break)
        if ctx.mode in ("dense", "full"):
            h = x
            if self.sparse_ok:
                h = self.gather1(h, ctx)
            h, _, _ = self.norm(h, ctx)
            qkv = self.qkv(h, ctx)
            if self.sparse_ok:
                qkv = self.scatter1(qkv, ctx)  # cache full qkv map
            h = self._attend(qkv)
            if self.sparse_ok:
                h = self.gather2(h, ctx)
            h = self.proj_out(h, ctx)
            if self.sparse_ok:
                return self.scatter2(h, ctx, residual=x)
            return h + x
        # sparse
        _, s, b = self.norm(x, ctx)
        if self.sparse_ok:
            h = self.gather1(x, ctx, scale=s, shift=b)
        else:
            h = x * s[:, None, None, :] + b[:, None, None, :]
        qkv = self.qkv(h, ctx)
        if self.sparse_ok:
            qkv = self.scatter1(qkv, ctx)  # full map: fresh tiles + cache
        h = self._attend(qkv)
        if self.sparse_ok:
            h = self.gather2(h, ctx)
        h = self.proj_out(h, ctx)
        if self.sparse_ok:
            return self.scatter2(h, ctx, residual=x)
        return h + x


class SIGEDownsample(SIGEModule):
    """Stride-2 conv with (0,1,0,1) asymmetric padding in dense/full mode;
    sparse tiles carry their own halo
    (reference: sige_fused_unet.py:229-248)."""

    cfg: DDPMUNetConfig
    channels: int
    support_sparse: bool = False

    def setup(self):
        cfg = self.cfg
        self.sparse_ok = self.support_sparse and cfg.block_size_normal is not None
        self.conv = SIGEConv2d(
            features=self.channels, kernel_size=3, stride=2,
            padding=((0, 1), (0, 1)), tile_input=self.sparse_ok,
        )
        if self.sparse_ok:
            self.g = Gather(
                block_size=cfg.block_size_normal, kernel_size=3, conv_stride=2,
                conv_padding=0,
            )
            self.s = Scatter(gather=self.g, cache_slots=cfg.cache_slots)

    def __call__(self, x, ctx: SIGECtx):
        if (self.sparse_ok and ctx.mode == "sparse"
                and self.g.planned_window()
                and self.g.has_variable("sige", "wdn_ok")
                and not ctx.sparse_update):
            # window-resident across the downsample (see vae.py): the
            # stride-2 extraction window spans ~2x the coarse canonical
            # window, which the planner's nesting (coarse covers fine/2 +
            # halo) guarantees covers the carried fine window
            meta = self.g.get_variable("sige", "win_in")
            edge = self.g.get_variable("sige", "win_edge")
            if isinstance(x, WindowState):
                ext = window_chain_extend(x.win, x.org, x.cache5,
                                          x.cache_id, meta, edge)
            else:
                ext = window_gather(x, meta, edge)
            h = self.conv(ext, ctx)
            cache5 = self.s.get_variable("cache", "original")
            org, cov = self.g.read_wsc(cache5.shape[2:4])
            y0w = window_slot_window(cache5, ctx.cache_id, org, cov.shape)
            out = jnp.where(cov[None, :, :, None], h.astype(y0w.dtype), y0w)
            return WindowState(out, cache5, ctx.cache_id, org)
        x = _to_map(x)
        if self.sparse_ok:
            x = self.g(x, ctx)
        x = self.conv(x, ctx)
        if self.sparse_ok:
            x = self.s(x, ctx)
        return x


class SIGEUpsample(SIGEModule):
    """Nearest 2x upsample + 3x3 conv (reference: sige_fused_unet.py:212-227)."""

    cfg: DDPMUNetConfig
    channels: int
    support_sparse: bool = False

    def setup(self):
        cfg = self.cfg
        self.sparse_ok = self.support_sparse and cfg.block_size_normal is not None
        self.conv = SIGEConv2d(features=self.channels, kernel_size=3, padding=1,
                               tile_input=self.sparse_ok)
        if self.sparse_ok:
            self.g = Gather(
                block_size=cfg.block_size_normal, kernel_size=3, conv_stride=1,
                conv_padding=1,
            )
            self.s = Scatter(gather=self.g, cache_slots=cfg.cache_slots)

    def __call__(self, x, ctx: SIGECtx):
        if (isinstance(x, WindowState) and self.sparse_ok
                and self.g.planned_window()
                and self.g.has_variable("sige", "wup_ok")
                and not ctx.sparse_update):
            # window-resident across the resample (see vae.py): the
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
            out = jnp.where(cov[None, :, :, None], h, y0w)
            return WindowState(out, cache5, ctx.cache_id, org)
        x = _to_map(x)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.sparse_ok:
            x = self.g(x, ctx)
        x = self.conv(x, ctx)
        if self.sparse_ok:
            x = self.s(x, ctx)
        return x


class SIGEFusedUNet(SIGEModule):
    """The full U-Net. ``__call__(x, t, ctx)`` with x [B, H, W, in_ch] and
    t [B] int timesteps."""

    cfg: DDPMUNetConfig = DDPMUNetConfig()

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
            # param-free SIGE pair for the stem (reference runs conv_in
            # dense at full resolution; sige_fused_unet.py forward)
            self.in_gather = Gather(block_size=cfg.block_size_normal,
                                    kernel_size=3, conv_stride=1,
                                    conv_padding=1)
            self.in_scatter = Scatter(gather=self.in_gather,
                                      cache_slots=cfg.cache_slots)

        in_mult = (1,) + tuple(cfg.ch_mult)
        down_blocks, down_attns, downsamples = [], [], []
        temb_slices = []  # (start, size) per resblock in traversal order
        temb_dim = 0
        curr_res = cfg.resolution
        block_in = None
        for i in range(nres):
            blocks, attns = [], []
            block_in = cfg.ch * in_mult[i]
            block_out = cfg.ch * cfg.ch_mult[i]
            sparse = curr_res >= cfg.sparse_resolution_threshold
            for _ in range(cfg.num_res_blocks):
                blocks.append(SIGEResnetBlock(
                    cfg=cfg, in_channels=block_in, out_channels=block_out,
                    support_sparse=sparse))
                temb_slices.append((temb_dim, block_out))
                temb_dim += block_out
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    attns.append(SIGEAttnBlock(
                        cfg=cfg, channels=block_in, support_sparse=sparse))
            down_blocks.append(blocks)
            down_attns.append(attns)
            if i != nres - 1:
                downsamples.append(SIGEDownsample(
                    cfg=cfg, channels=block_in, support_sparse=sparse))
                curr_res //= 2
        self.down_blocks = down_blocks
        self.down_attns = down_attns
        self.downsamples = downsamples

        self.mid_block1 = SIGEResnetBlock(
            cfg=cfg, in_channels=block_in, out_channels=block_in)
        temb_slices.append((temb_dim, block_in)); temb_dim += block_in
        self.mid_attn = SIGEAttnBlock(cfg=cfg, channels=block_in)
        self.mid_block2 = SIGEResnetBlock(
            cfg=cfg, in_channels=block_in, out_channels=block_in)
        temb_slices.append((temb_dim, block_in)); temb_dim += block_in

        up_blocks, up_attns, upsamples = [], [], []
        up_slices = []
        for i in reversed(range(nres)):
            blocks, attns = [], []
            block_out = cfg.ch * cfg.ch_mult[i]
            skip_in = cfg.ch * cfg.ch_mult[i]
            sparse = curr_res >= cfg.sparse_resolution_threshold
            for ib in range(cfg.num_res_blocks + 1):
                if ib == cfg.num_res_blocks:
                    skip_in = cfg.ch * in_mult[i]
                blocks.append(SIGEResnetBlock(
                    cfg=cfg, in_channels=block_in + skip_in,
                    out_channels=block_out, support_sparse=sparse))
                up_slices.append((temb_dim, block_out))
                temb_dim += block_out
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    attns.append(SIGEAttnBlock(
                        cfg=cfg, channels=block_in, support_sparse=sparse))
            up_blocks.insert(0, blocks)
            up_attns.insert(0, attns)
            if i != 0:
                upsamples.insert(0, SIGEUpsample(
                    cfg=cfg, channels=block_in, support_sparse=True))
                curr_res *= 2
        self.up_blocks = up_blocks
        self.up_attns = up_attns
        self.upsamples = upsamples
        self._temb_slices = temb_slices + up_slices
        self.temb_proj_dim = temb_dim
        # Fused per-block temb projection (reference: fused_unet.py:244-260).
        self.temb_proj = nn.Dense(temb_dim)

        self.norm_out_scale = self.param(
            "norm_out_scale", nn.initializers.ones_init(), (block_in,))
        self.norm_out_bias = self.param(
            "norm_out_bias", nn.initializers.zeros_init(), (block_in,))
        self._tail_sparse = (cfg.sige_tail
                             and cfg.block_size_normal is not None)
        self.conv_out = SIGEConv2d(features=cfg.out_ch, kernel_size=3, padding=1,
                                   tile_input=self._tail_sparse)
        if self._tail_sparse:
            # param-free SIGE pair for the tail: norm_out's affine is
            # folded from the full pass into the gather epilogue (the
            # reference keeps this tail dense; sige_fused_unet.py:431-433)
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
        # sparse
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

    def __call__(self, x, t, ctx: SIGECtx):
        cfg = self.cfg
        nres = len(cfg.ch_mult)

        if ctx.mode in ("dense", "full"):
            temb = timestep_embedding(t, cfg.ch)
            sow_dense_macs(self, temb, self.cfg.temb_ch)
            temb = self.temb_dense0(temb)
            temb = _swish(temb)
            sow_dense_macs(self, temb, self.cfg.temb_ch)
            temb = self.temb_dense1(temb)
            temb = _swish(temb)
            sow_dense_macs(self, temb, self.temb_proj_dim)
            temb = self.temb_proj(temb)
        else:
            temb = None

        slices = iter(self._temb_slices)

        def tslice(_unused=None):
            start, size = next(slices)
            return None if temb is None else jax.lax.dynamic_slice_in_dim(
                temb, start, size, axis=1)

        if self._head_sparse and ctx.mode == "sparse":
            hwin = self.conv_in(self.in_gather(x, ctx), ctx)
            if (cfg.window_chain and self.in_gather.planned_window()
                    and not ctx.sparse_update):
                # start the window chain at the stem (skips a full-canvas
                # cache write; the stem state also rides the final skip)
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
                h = self.down_blocks[i][ib](hs[-1], tslice(), ctx)
                if self.down_attns[i]:
                    h = self.down_attns[i][ib](h, ctx)
                hs.append(h)
            if i != nres - 1:
                hs.append(self.downsamples[i](hs[-1], ctx))

        h = hs[-1]
        h = self.mid_block1(h, tslice(), ctx)
        h = self.mid_attn(h, ctx)
        h = self.mid_block2(h, tslice(), ctx)

        for i in reversed(range(nres)):
            for ib in range(cfg.num_res_blocks + 1):
                # pass the skip join as a tuple: window-chain sparse
                # extends both parts window-resident; other modes (and
                # the resblock's non-chain paths) concatenate the maps
                h = self.up_blocks[i][ib]((h, hs.pop()), tslice(), ctx)
                if self.up_attns[i]:
                    h = self.up_attns[i][ib](h, ctx)
            if i != 0:
                h = self.upsamples[i - 1](h, ctx)

        if self._tail_sparse and ctx.mode != "dense":
            return self._tail(h, ctx)
        h = _to_map(h)
        h, _, _ = group_norm_with_affine(
            h, cfg.num_groups, self.norm_out_scale, self.norm_out_bias, eps=1e-6)
        h = _swish(h)
        return self.conv_out(h, ctx)
