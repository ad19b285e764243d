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
    Scatter,
    ScatterGather,
    ScatterWithBlockResidual,
    SIGEConv2d,
    SIGECtx,
    SIGEModule,
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

    def __call__(self, x, seg, ctx: SIGECtx):
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
        self.conv_img = SIGEConv2d(features=3, kernel_size=3, padding=1,
                                   tile_input=False)

    def __call__(self, seg, ctx: SIGECtx):
        cfg = self.cfg
        x = nearest_resize(seg, cfg.latent_hw)
        x = self.fc(x, ctx)
        x = self.head_0(x, seg, ctx)
        x = up2x(x)
        x = self.G_middle_0(x, seg, ctx)
        if cfg.num_upsampling_layers in ("more", "most"):
            x = up2x(x)
        x = self.G_middle_1(x, seg, ctx)
        x = up2x(x)
        x = self.up_0(x, seg, ctx)
        x = up2x(x)
        x = self.up_1(x, seg, ctx)
        x = up2x(x)
        x = self.up_2(x, seg, ctx)
        x = up2x(x)
        x = self.up_3(x, seg, ctx)
        if cfg.num_upsampling_layers == "most":
            x = up2x(x)
            x = self.up_4(x, seg, ctx)
        x = self.conv_img(_leaky(x), ctx)
        return jnp.tanh(x)
