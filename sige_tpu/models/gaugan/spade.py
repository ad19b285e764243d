"""SPADE (GauGAN) generator with SIGE sparse wiring.

Mirrors the reference's fused-SPADE design (reference:
gaugan/models/spade_generators/sige_fused_spade_generator.py,
gaugan/models/sige_normalization.py):

  * each resblock computes ALL its SPADE γ/β branches from one shared
    segmap conv (``mlp_shared`` emitting 2-3 x nhidden channels at once);
  * the segmap branch runs sparsely through its own gather ->
    fused scatter/re-gather; per-norm ``mlp_gamma_beta`` convs emit
    (γ, β) fused as 2C channels;
  * the param-free SyncBatchNorm uses running statistics at inference, so
    its (scale, shift) fold is data-independent — computed directly from
    the stats parameters, no per-slot caching
    (reference: sige_normalization.py:61-88);
  * the shortcut norm's γ/β tiles are scattered to the cached full map
    and re-gathered with the shortcut block geometry
    (reference: sige_normalization.py:52-57, 76-85);
  * sparsity is gated per layer counting from the output end via
    ``num_sparse_layers`` (reference: sige_fused_spade_generator.py:192-209).

Nearest-neighbor resizes replicate torch's ``F.interpolate`` indexing
(src = floor(dst * in / out)), which differs from jax.image.resize's
half-pixel convention.
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
)
from ...ops.window import (
    _fast,
    window_chain_extend,
    window_chain_extend_up2,
    window_gather,
    window_slot_window,
)


@dataclasses.dataclass(frozen=True)
class SPADEGenConfig:
    """Cityscapes defaults (reference: gaugan/test.py:11-58)."""

    ngf: int = 64
    semantic_nc: int = 36            # 35 labels + instance edge map
    crop_size: int = 512
    aspect_ratio: float = 2.0
    num_upsampling_layers: str = "more"   # "normal" | "more" | "most"
    main_block_size: Optional[int] = 6
    shortcut_block_size: Optional[int] = 4
    num_sparse_layers: int = 5
    bn_eps: float = 1e-5
    #: window-layout chains: thread (window, cache) state through the
    #: SPADE blocks AND the bare 2x upsamples between them so full maps
    #: only materialize once, before conv_img (same design as the DDPM /
    #: VAE chains; no reference counterpart — the reference pays a
    #: full-canvas join per block, sige_fused_spade_generator.py:146-176)
    window_chain: bool = True
    #: sparse tail: run conv_img on the gathered window and scatter the
    #: 3-channel result over the cached output instead of materializing
    #: the full final feature map (the reference keeps this tail dense,
    #: sige_fused_spade_generator.py:210). Profiled on TPU v5e: the dense
    #: tail (full-canvas leaky+conv_img at 256x512 plus its layout
    #: transposes and the chain materialize) was ~0.4 ms of a 1.8 ms
    #: sparse step. Default ON (the benched library configuration,
    #: equivalence-tested against the dense tail); reference-parity
    #: suites pin False (same convention as the DDPM/PD/VAE sige_tail).
    sige_tail: bool = True

    @property
    def latent_hw(self) -> Tuple[int, int]:
        ups = {"normal": 5, "more": 6, "most": 7}[self.num_upsampling_layers]
        sw = self.crop_size // (2 ** ups)
        sh = round(sw / self.aspect_ratio)
        return sh, sw


def nearest_resize(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Torch-convention nearest resize: src = floor(dst * in / out)."""
    H, W = x.shape[1:3]
    oh, ow = out_hw
    rows = (jnp.arange(oh) * H) // oh
    cols = (jnp.arange(ow) * W) // ow
    return x[:, rows][:, :, cols]


def up2x(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class _Up2State:
    """A window chain carried across a bare nearest-2x upsample: the
    DOUBLED window of the previous block's output. The planner's nesting
    constraint (planner.py _plan_canonical_windows) makes it cover the
    next block's whole extraction window, so the consumer slices straight
    out of it (ops/window.py window_chain_extend_up2) — the upsample
    itself never touches the full canvas."""

    def __init__(self, win2, org2, parent: WindowState):
        self.win2 = win2      # [B, 2*WH, 2*WW, C]
        self.org2 = org2      # [2] int32 (parent origin doubled)
        self.parent = parent  # for the materialize fallback

    def to_map(self):
        return up2x(self.parent.to_map())


def _chain_up2(x):
    """Chain-aware nearest-2x upsample between SPADE blocks."""
    if isinstance(x, WindowState):
        return _Up2State(up2x(x.win), x.org * 2, x)
    return up2x(x)


def _to_map(x):
    """Materialize a chain state at a chain break."""
    return x.to_map() if isinstance(x, (WindowState, _Up2State)) else x


def _seg_window(seg: jnp.ndarray, out_res: Tuple[int, int],
                meta: jnp.ndarray, edge: jnp.ndarray) -> jnp.ndarray:
    """Window of ``nearest_resize(seg, out_res)`` at a gather's planned
    (possibly virtual / out-of-bounds) origin, WITHOUT materializing the
    resized full map: for integer-stride downsamples (every SPADE level —
    seg is at the output resolution, blocks run at power-of-2 fractions)
    the resize indexing ``src = dst * stride`` turns the window into one
    strided dynamic_slice of ``seg`` itself. Same clamp+roll+edge-mask
    recipe as ops/window.py _extract_window."""
    B, Hs, Ws, C = seg.shape
    oh, ow = out_res
    EH, EW = edge.shape
    if Hs % oh or Ws % ow:
        return window_gather(nearest_resize(seg, (oh, ow)), meta, edge)
    sr, sc = Hs // oh, Ws // ow
    zero = jnp.int32(0)
    if _fast(meta):  # plan-static in-image form (one shared definition)
        w = jax.lax.dynamic_slice(
            seg, (zero, meta[0] * sr, meta[1] * sc, zero),
            (B, EH * sr, EW * sc, C))
        return w[:, ::sr, ::sc]
    sh, sw = min(EH, oh), min(EW, ow)
    w = jax.lax.dynamic_slice(
        seg, (zero, meta[0] * sr, meta[1] * sc, zero),
        (B, sh * sr, sw * sc, C))
    w = w[:, ::sr, ::sc]
    if sh < EH or sw < EW:
        w = jnp.pad(w, ((0, 0), (0, EH - sh), (0, EW - sw), (0, 0)))
    w = jnp.roll(w, (meta[2], meta[3]), axis=(1, 2))
    return jnp.where(edge[None, :, :, None], w, jnp.zeros((), w.dtype))


def _leaky(x):
    return jax.nn.leaky_relu(x, 0.2)


class FusedSPADENorm(SIGEModule):
    """One SPADE normalization: param-free BN (running stats) modulated by
    conv-generated (γ, β) from the shared segmap activations.

    ``pairing``:
      * "dense"    — full-map math in every mode;
      * "main"     — γβ tiles re-gathered via the shared seg gather's fused
        scatter/re-gather (main-path geometry);
      * "shortcut" — γβ tiles scattered onto a cached full map then
        re-gathered with the shortcut block geometry.

    In sparse mode the caller has already normalized ``x`` (the BN fold
    rides the main/shortcut gather epilogue), matching the reference's
    ``normalized = x`` branch (reference: sige_normalization.py:70-72).
    """

    norm_nc: int
    nhidden: int
    pairing: str = "dense"
    seg_gather: Optional[Gather] = None
    shortcut_geom_gather: Optional[Gather] = None
    bn_eps: float = 1e-5
    cache_slots: int = 1

    def setup(self):
        self.running_mean = self.param(
            "running_mean", nn.initializers.zeros_init(), (self.norm_nc,))
        self.running_var = self.param(
            "running_var", nn.initializers.ones_init(), (self.norm_nc,))
        tile_in = self.pairing != "dense"
        self.mlp_gamma_beta = SIGEConv2d(
            features=2 * self.norm_nc, kernel_size=3, padding=1,
            tile_input=tile_in)
        if self.pairing == "main":
            self.sg = ScatterGather(gather=self.seg_gather,
                                    cache_slots=self.cache_slots)
        elif self.pairing == "shortcut":
            self.scatter = Scatter(gather=self.seg_gather,
                                   cache_slots=self.cache_slots)
            self.regather = self.shortcut_geom_gather

    def affine(self):
        """Data-independent BN fold (scale, shift) from running stats."""
        scale = 1.0 / jnp.sqrt(self.running_var + self.bn_eps)
        shift = -self.running_mean * scale
        return scale, shift

    def __call__(self, x, actv, ctx: SIGECtx):
        if ctx.mode in ("dense", "full"):
            scale, shift = self.affine()
            normalized = x * scale + shift
        else:
            normalized = x  # already normalized via the gather epilogue

        gamma_beta = self.mlp_gamma_beta(actv, ctx)
        if self.pairing == "main":
            gamma_beta = self.sg(gamma_beta, ctx)
        elif self.pairing == "shortcut":
            if (ctx.mode == "sparse" and not ctx.sparse_update
                    and self.seg_gather.planned_window()):
                # window layout: every gather at a resolution shares THE
                # canonical window, so the tile-geometry re-pairing the
                # scatter->regather performs is an exact identity here —
                # γβ are already full-map-exact across the window (the
                # conv mixed fresh interior with the cached seg ring).
                # Skipping it removes a full-canvas write per shortcut.
                pass
            else:
                gamma_beta = self.scatter(gamma_beta, ctx)
                gamma_beta = self.regather(gamma_beta, ctx)
        gamma, beta = jnp.split(gamma_beta, 2, axis=-1)
        return normalized * (1 + gamma) + beta


class SIGEFusedSPADEResnetBlock(SIGEModule):
    """Reference: sige_fused_spade_generator.py:9-176."""

    cfg: SPADEGenConfig
    fin: int
    fout: int
    support_sparse: bool = False

    def setup(self):
        cfg = self.cfg
        fin, fout = self.fin, self.fout
        fmiddle = min(fin, fout)
        self.fmiddle = fmiddle
        self.nhidden = 2 * cfg.ngf
        self.learned_shortcut = fin != fout
        self.main_sparse = self.support_sparse and cfg.main_block_size is not None
        self.shortcut_sparse = (
            self.main_sparse and self.learned_shortcut
            and cfg.shortcut_block_size is not None
        )
        n_branches = 3 if self.learned_shortcut else 2
        self.mlp_shared = SIGEConv2d(
            features=self.nhidden * n_branches, kernel_size=3, padding=1,
            tile_input=self.main_sparse)
        self.conv_0 = SIGEConv2d(features=fmiddle, kernel_size=3, padding=1,
                                 tile_input=self.main_sparse)
        self.conv_1 = SIGEConv2d(features=fout, kernel_size=3, padding=1,
                                 tile_input=self.main_sparse)

        seg_gather = None
        if self.main_sparse:
            self.seg_gather = Gather(block_size=cfg.main_block_size,
                                     kernel_size=3, conv_stride=1, conv_padding=1)
            self.seg_sg = ScatterGather(gather=self.seg_gather)
            self.main_gather = Gather(block_size=cfg.main_block_size,
                                      kernel_size=3, conv_stride=1, conv_padding=1)
            self.main_sg = ScatterGather(gather=self.main_gather)
            seg_gather = self.seg_gather

        shortcut_geom = None
        if self.learned_shortcut:
            self.conv_s = SIGEConv2d(features=fout, kernel_size=1, padding=0,
                                     use_bias=False,
                                     tile_input=self.shortcut_sparse)
            if self.shortcut_sparse:
                self.shortcut_gather = Gather(
                    block_size=cfg.shortcut_block_size, kernel_size=1,
                    conv_stride=1, conv_padding=0)
                # γβ re-gather for the shortcut norm shares the shortcut
                # block geometry (its own planned indices at the same res).
                self.norm_s_regather = Gather(
                    block_size=cfg.shortcut_block_size, kernel_size=1,
                    conv_stride=1, conv_padding=0)
                shortcut_geom = self.norm_s_regather
                self.join = ScatterWithBlockResidual(
                    main_gather=self.main_gather,
                    shortcut_gather=self.shortcut_gather)
            elif self.main_sparse:
                self.join = Scatter(gather=self.main_gather)
        elif self.main_sparse:
            self.join = Scatter(gather=self.main_gather)

        pairing = "main" if self.main_sparse else "dense"
        self.norm_0 = FusedSPADENorm(
            norm_nc=fin, nhidden=self.nhidden, pairing=pairing,
            seg_gather=seg_gather, bn_eps=cfg.bn_eps)
        self.norm_1 = FusedSPADENorm(
            norm_nc=fmiddle, nhidden=self.nhidden, pairing=pairing,
            seg_gather=seg_gather, bn_eps=cfg.bn_eps)
        if self.learned_shortcut:
            s_pairing = "shortcut" if self.shortcut_sparse else "dense"
            self.norm_s = FusedSPADENorm(
                norm_nc=fin, nhidden=self.nhidden, pairing=s_pairing,
                seg_gather=seg_gather, shortcut_geom_gather=shortcut_geom,
                bn_eps=cfg.bn_eps)

    # -- window-resident sparse path (mirrors ddpm/unet.py _chain_window) --
    def _extend(self, x, g: Gather, scale=None, shift=None):
        """Rebuild gather ``g``'s extraction window (+fused BN fold) from
        a carried chain state or a full map."""
        meta = g.get_variable("sige", "win_in")
        edge = g.get_variable("sige", "win_edge")
        if isinstance(x, _Up2State):
            return window_chain_extend_up2(x.win2, x.org2, meta, edge,
                                           scale, shift)
        if isinstance(x, WindowState):
            return window_chain_extend(x.win, x.org, x.cache5, x.cache_id,
                                       meta, edge, scale, shift,
                                       rel=chain_rel(g))
        return window_gather(x, meta, edge, scale, shift)

    def _input_window(self, x, org, shape):
        """Canonical window of the block INPUT (the residual)."""
        zero = jnp.int32(0)
        if isinstance(x, _Up2State):
            # nesting guarantees the doubled carried window covers the
            # canonical window (it covers the whole extraction window)
            return jax.lax.dynamic_slice(
                x.win2, (zero, org[0] - x.org2[0], org[1] - x.org2[1], zero),
                (x.win2.shape[0], shape[0], shape[1], x.win2.shape[3]))
        if isinstance(x, WindowState):
            return x.win  # same canonical window at the same resolution
        return jax.lax.dynamic_slice(
            x, (zero, org[0], org[1], zero),
            (x.shape[0], shape[0], shape[1], x.shape[3]))

    def _chain_window(self, x, seg, ctx: SIGECtx) -> WindowState:
        g = self.main_gather
        org = g.get_variable("sige", "win_org")
        cache5 = self.join.get_variable("cache", "original")
        res = cache5.shape[2:4]
        _, cov = g.read_wsc(res)
        WH, WW = cov.shape

        # seg-modulation branch, window-resident: the seg window comes
        # straight off the full-res seg map (strided slice), the ring off
        # the cached actv map — no per-block full resize or canvas join
        seg_win = _seg_window(
            seg, res, self.seg_gather.get_variable("sige", "win_in"),
            self.seg_gather.get_variable("sige", "win_edge"))
        actvs = jax.nn.relu(self.mlp_shared(seg_win, ctx))
        actvs = self.seg_sg(actvs, ctx)
        if self.learned_shortcut:
            actv_0, actv_1, actv_s = jnp.split(actvs, 3, axis=-1)
        else:
            actv_0, actv_1 = jnp.split(actvs, 2, axis=-1)

        # main path
        s1, b1 = self.norm_0.affine()
        dx = self._extend(x, g, s1, b1)
        dx = self.conv_0(_leaky(self.norm_0(dx, actv_0, ctx)), ctx)
        s2, b2 = self.norm_1.affine()
        dx = self.main_sg(dx, ctx, scale=s2, shift=b2)
        dx = self.conv_1(_leaky(self.norm_1(dx, actv_1, ctx)), ctx)

        # shortcut path + window-resident residual join
        y0w = window_slot_window(cache5, ctx.cache_id, org, (WH, WW))
        m = cov[None, :, :, None]
        if self.learned_shortcut:
            ss, sb = self.norm_s.affine()
            x_s = self._extend(x, self.shortcut_gather, ss, sb)
            x_s = self.conv_s(self.norm_s(x_s, actv_s, ctx), ctx)
            _, cov_s = self.shortcut_gather.read_wsc(res)
            y1w = window_slot_window(
                self.join.get_variable("cache", "residual"),
                ctx.cache_id, org, (WH, WW))
            s = cov_s[None, :, :, None]
            out = (jnp.where(m, dx + y1w, y0w)
                   + jnp.where(s, x_s - y1w, jnp.zeros((), dx.dtype)))
        else:
            xs = self._input_window(x, org, (WH, WW))
            out = jnp.where(m, dx + xs, y0w)
        return WindowState(out, cache5, ctx.cache_id, org)

    def __call__(self, x, seg, ctx: SIGECtx):
        if (ctx.mode == "sparse" and self.main_sparse
                and self.cfg.window_chain and not ctx.sparse_update
                and self.main_gather.planned_window()
                and (not self.learned_shortcut or self.shortcut_sparse)
                and (not isinstance(x, _Up2State)
                     or self.main_gather.has_variable("sige", "wup_ok"))):
            return self._chain_window(x, seg, ctx)
        x = _to_map(x)
        sparse = ctx.mode == "sparse"
        seg_r = nearest_resize(seg, x.shape[1:3])
        if self.main_sparse:
            seg_r = self.seg_gather(seg_r, ctx)  # tiles in sparse mode
        actvs = jax.nn.relu(self.mlp_shared(seg_r, ctx))
        if self.main_sparse:
            actvs = self.seg_sg(actvs, ctx)
        if self.learned_shortcut:
            actv_0, actv_1, actv_s = jnp.split(actvs, 3, axis=-1)
        else:
            actv_0, actv_1 = jnp.split(actvs, 2, axis=-1)

        # ---- shortcut path ------------------------------------------------
        if self.learned_shortcut:
            x_s = x
            if self.shortcut_sparse:
                if sparse:
                    s, b = self.norm_s.affine()
                    x_s = self.shortcut_gather(x_s, ctx, scale=s, shift=b)
                else:
                    x_s = self.shortcut_gather(x_s, ctx)
            elif sparse:
                s, b = self.norm_s.affine()
                x_s = x_s * s + b
            x_s = self.conv_s(self.norm_s(x_s, actv_s, ctx), ctx)
        else:
            x_s = x

        # ---- main path ----------------------------------------------------
        dx = x
        if self.main_sparse:
            if sparse:
                s, b = self.norm_0.affine()
                dx = self.main_gather(dx, ctx, scale=s, shift=b)
            else:
                dx = self.main_gather(dx, ctx)
        elif sparse:
            s, b = self.norm_0.affine()
            dx = dx * s + b
        dx = self.conv_0(_leaky(self.norm_0(dx, actv_0, ctx)), ctx)
        if self.main_sparse:
            if sparse:
                s, b = self.norm_1.affine()
                dx = self.main_sg(dx, ctx, scale=s, shift=b)
            else:
                dx = self.main_sg(dx, ctx)
        elif sparse:
            s, b = self.norm_1.affine()
            dx = dx * s + b
        dx = self.conv_1(_leaky(self.norm_1(dx, actv_1, ctx)), ctx)

        if self.main_sparse:
            return self.join(dx, ctx, residual=x_s)
        return x_s + dx


class SIGEFusedSPADEGenerator(SIGEModule):
    """Reference: sige_fused_spade_generator.py:184-276. ``__call__(seg,
    ctx)`` with seg [B, H, W, semantic_nc] one-hot(+edge) maps."""

    cfg: SPADEGenConfig = SPADEGenConfig()

    def setup(self):
        cfg = self.cfg
        nf = cfg.ngf
        is_most = 1 if cfg.num_upsampling_layers == "most" else 0
        nsl = cfg.num_sparse_layers

        self.fc = SIGEConv2d(features=16 * nf, kernel_size=3, padding=1,
                             tile_input=False)
        mk = lambda fin, fout, k: SIGEFusedSPADEResnetBlock(
            cfg=cfg, fin=fin, fout=fout, support_sparse=nsl >= k + is_most)
        self.head_0 = mk(16 * nf, 16 * nf, 7)
        self.G_middle_0 = mk(16 * nf, 16 * nf, 6)
        self.G_middle_1 = mk(16 * nf, 16 * nf, 5)
        self.up_0 = mk(16 * nf, 8 * nf, 4)
        self.up_1 = mk(8 * nf, 4 * nf, 3)
        self.up_2 = mk(4 * nf, 2 * nf, 2)
        self.up_3 = mk(2 * nf, 1 * nf, 1)
        final_nc = nf
        if cfg.num_upsampling_layers == "most":
            self.up_4 = mk(1 * nf, nf // 2, 0)
            final_nc = nf // 2
        self._tail_sparse = (cfg.sige_tail
                             and cfg.main_block_size is not None)
        self.conv_img = SIGEConv2d(features=3, kernel_size=3, padding=1,
                                   tile_input=self._tail_sparse)
        if self._tail_sparse:
            self.out_gather = Gather(block_size=cfg.main_block_size,
                                     kernel_size=3, conv_stride=1,
                                     conv_padding=1)
            self.out_scatter = Scatter(gather=self.out_gather)

    def __call__(self, seg, ctx: SIGECtx):
        cfg = self.cfg
        x = nearest_resize(seg, cfg.latent_hw)
        x = self.fc(x, ctx)
        x = self.head_0(x, seg, ctx)
        x = _chain_up2(x)
        x = self.G_middle_0(x, seg, ctx)
        if cfg.num_upsampling_layers in ("more", "most"):
            x = _chain_up2(x)
        x = self.G_middle_1(x, seg, ctx)
        x = _chain_up2(x)
        x = self.up_0(x, seg, ctx)
        x = _chain_up2(x)
        x = self.up_1(x, seg, ctx)
        x = _chain_up2(x)
        x = self.up_2(x, seg, ctx)
        x = _chain_up2(x)
        x = self.up_3(x, seg, ctx)
        if cfg.num_upsampling_layers == "most":
            x = _chain_up2(x)
            x = self.up_4(x, seg, ctx)
        if self._tail_sparse and ctx.mode != "dense":
            return self._tail(x, ctx)
        x = _to_map(x)  # the chain's single materialize, before conv_img
        x = self.conv_img(_leaky(x), ctx)
        return jnp.tanh(x)

    def _tail(self, x, ctx: SIGECtx):
        """Sparse conv_img: gather the final window (leaky fused into the
        extraction epilogue), conv VALID, scatter the 3-channel result
        over the cached pre-tanh output (see SPADEGenConfig.sige_tail)."""
        if ctx.mode == "full":
            x = _to_map(x)
            self.out_gather(x, ctx)  # records meta
            out = self.conv_img(_leaky(x), ctx)
            return jnp.tanh(self.out_scatter(out, ctx))
        # sparse: extend a window-resident chain straight into the conv
        # input window; otherwise gather from the materialized map
        if isinstance(x, WindowState) and self.out_gather.planned_window():
            ext = window_chain_extend(
                x.win, x.org, x.cache5, x.cache_id,
                self.out_gather.get_variable("sige", "win_in"),
                self.out_gather.get_variable("sige", "win_edge"),
                None, None, "leaky", rel=chain_rel(self.out_gather))
        else:
            ext = self.out_gather(_leaky(_to_map(x)), ctx)
        out = self.conv_img(ext, ctx)
        return jnp.tanh(self.out_scatter(out, ctx))
