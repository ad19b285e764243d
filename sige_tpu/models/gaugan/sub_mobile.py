"""GAN-Compression sub-mobile SPADE generator with SIGE wiring.

The compressed GauGAN family: per-layer channel counts decoded from a
``config_str`` (e.g. "32_32_32_48_32_24_24_32"), SPADE γ/β produced by
*separable* convs whose internal InstanceNorm is folded between the
depthwise and pointwise stages (reference:
gaugan/models/sub_mobile_spade_generators/
sige_fused_sub_mobile_spade_generator.py, gaugan/models/mobile_modules.py,
gaugan/models/sige_normalization.py:92-176).

InstanceNorm statistics are data-dependent, so — unlike the BatchNorm
folds of the full-size SPADE — the separable convs' affines are cached per
slot in full mode and replayed in sparse mode
(reference: mobile_modules.py:104-119).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

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
    _slotted_cache,
)
from ...nn.norm import instance_norm_with_affine
from .spade import SPADEGenConfig, _leaky, nearest_resize, up2x


def decode_config(config_str: str) -> List[int]:
    """Reference: gaugan/utils.py:14-17."""
    return [int(c) for c in config_str.split("_")]


class SIGESeparableConv2d(SIGEModule):
    """Depthwise conv -> folded InstanceNorm -> pointwise conv
    (reference: gaugan/models/mobile_modules.py:65-119)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    support_sparse: bool = False
    use_bias: bool = True
    cache_slots: int = 1

    @nn.compact
    def __call__(self, x, ctx: SIGECtx):
        cin = x.shape[-1]
        dw = SIGEConv2d(
            features=cin, kernel_size=self.kernel_size, padding=self.padding,
            feature_group_count=cin, use_bias=self.use_bias,
            tile_input=self.support_sparse, name="dw")
        pw = SIGEConv2d(
            features=self.features, kernel_size=1, padding=0,
            use_bias=self.use_bias, tile_input=self.support_sparse, name="pw")
        h = dw(x, ctx)
        if ctx.mode in ("dense", "full"):
            h, scale, shift = instance_norm_with_affine(h, eps=1e-5)
            if ctx.mode == "full":
                _slotted_cache(self, "in_scale", scale, self.cache_slots, ctx.cache_id)
                _slotted_cache(self, "in_shift", shift, self.cache_slots, ctx.cache_id)
        else:
            from ...nn.module import _read_slot
            scale = _read_slot(self.get_variable("cache", "in_scale"), ctx.cache_id)
            shift = _read_slot(self.get_variable("cache", "in_shift"), ctx.cache_id)
            h = h * scale[:, None, None, :] + shift[:, None, None, :]
        return pw(h, ctx)


class FusedSubMobileSPADENorm(SIGEModule):
    """SPADE norm with separable γ/β convs over ``oc`` channels
    (reference: sige_normalization.py:92-176). Param-free SyncBatchNorm
    uses running stats (data-independent fold)."""

    oc: int
    nhidden: int
    pairing: str = "dense"  # "dense" | "main" | "shortcut"
    seg_gather: Optional[Gather] = None
    shortcut_geom_gather_gamma: Optional[Gather] = None
    shortcut_geom_gather_beta: Optional[Gather] = None
    bn_eps: float = 1e-5
    cache_slots: int = 1

    def setup(self):
        self.running_mean = self.param(
            "running_mean", nn.initializers.zeros_init(), (self.oc,))
        self.running_var = self.param(
            "running_var", nn.initializers.ones_init(), (self.oc,))
        sparse = self.pairing != "dense"
        self.mlp_gamma = SIGESeparableConv2d(
            features=self.oc, support_sparse=sparse,
            cache_slots=self.cache_slots)
        self.mlp_beta = SIGESeparableConv2d(
            features=self.oc, support_sparse=sparse,
            cache_slots=self.cache_slots)
        if self.pairing == "main":
            self.sg_gamma = ScatterGather(gather=self.seg_gather,
                                          cache_slots=self.cache_slots)
            self.sg_beta = ScatterGather(gather=self.seg_gather,
                                         cache_slots=self.cache_slots)
        elif self.pairing == "shortcut":
            self.scatter_gamma = Scatter(gather=self.seg_gather,
                                         cache_slots=self.cache_slots)
            self.scatter_beta = Scatter(gather=self.seg_gather,
                                        cache_slots=self.cache_slots)

    def affine(self):
        scale = 1.0 / jnp.sqrt(self.running_var + self.bn_eps)
        shift = -self.running_mean * scale
        return scale, shift

    def __call__(self, x, actv, ctx: SIGECtx):
        if ctx.mode in ("dense", "full"):
            scale, shift = self.affine()
            normalized = x * scale + shift
        else:
            normalized = x
        gamma = self.mlp_gamma(actv, ctx)
        beta = self.mlp_beta(actv, ctx)
        if self.pairing == "main":
            gamma = self.sg_gamma(gamma, ctx)
            beta = self.sg_beta(beta, ctx)
        elif self.pairing == "shortcut":
            gamma = self.shortcut_geom_gather_gamma(self.scatter_gamma(gamma, ctx), ctx)
            beta = self.shortcut_geom_gather_beta(self.scatter_beta(beta, ctx), ctx)
        return normalized * (1 + gamma) + beta


class SIGESubMobileSPADEResnetBlock(SIGEModule):
    """Reference: sige_fused_sub_mobile_spade_generator.py:9-190."""

    cfg: SPADEGenConfig
    fin: int          # nominal channels (decides learned_shortcut)
    fout: int
    ic: int           # actual input channels
    channel: int      # actual middle channels
    hidden: int
    support_sparse: bool = False

    def setup(self):
        cfg = self.cfg
        self.learned_shortcut = self.fin != self.fout
        self.main_sparse = self.support_sparse and cfg.main_block_size is not None
        self.shortcut_sparse = (
            self.main_sparse and self.learned_shortcut
            and cfg.shortcut_block_size is not None)
        n_branches = 3 if self.learned_shortcut else 2
        self.mlp_shared = SIGEConv2d(
            features=self.hidden * n_branches, kernel_size=3, padding=1,
            tile_input=self.main_sparse)
        self.conv_0 = SIGEConv2d(features=self.channel, kernel_size=3,
                                 padding=1, tile_input=self.main_sparse)
        out1 = self.channel if self.learned_shortcut else self.ic
        self.conv_1 = SIGEConv2d(features=out1, kernel_size=3, padding=1,
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

        sg_gamma = sg_beta = None
        if self.learned_shortcut:
            self.conv_s = SIGEConv2d(features=self.channel, kernel_size=1,
                                     padding=0, use_bias=False,
                                     tile_input=self.shortcut_sparse)
            if self.shortcut_sparse:
                self.shortcut_gather = Gather(
                    block_size=cfg.shortcut_block_size, kernel_size=1,
                    conv_stride=1, conv_padding=0)
                self.norm_s_regather_gamma = Gather(
                    block_size=cfg.shortcut_block_size, kernel_size=1,
                    conv_stride=1, conv_padding=0)
                self.norm_s_regather_beta = Gather(
                    block_size=cfg.shortcut_block_size, kernel_size=1,
                    conv_stride=1, conv_padding=0)
                sg_gamma = self.norm_s_regather_gamma
                sg_beta = self.norm_s_regather_beta
                self.join = ScatterWithBlockResidual(
                    main_gather=self.main_gather,
                    shortcut_gather=self.shortcut_gather)
            elif self.main_sparse:
                self.join = Scatter(gather=self.main_gather)
        elif self.main_sparse:
            self.join = Scatter(gather=self.main_gather)

        pairing = "main" if self.main_sparse else "dense"
        self.norm_0 = FusedSubMobileSPADENorm(
            oc=self.ic, nhidden=self.hidden, pairing=pairing,
            seg_gather=seg_gather, bn_eps=cfg.bn_eps)
        self.norm_1 = FusedSubMobileSPADENorm(
            oc=self.channel, nhidden=self.hidden, pairing=pairing,
            seg_gather=seg_gather, bn_eps=cfg.bn_eps)
        if self.learned_shortcut:
            s_pairing = "shortcut" if self.shortcut_sparse else "dense"
            self.norm_s = FusedSubMobileSPADENorm(
                oc=self.ic, nhidden=self.hidden, pairing=s_pairing,
                seg_gather=seg_gather,
                shortcut_geom_gather_gamma=sg_gamma,
                shortcut_geom_gather_beta=sg_beta, bn_eps=cfg.bn_eps)

    def __call__(self, x, seg, ctx: SIGECtx):
        sparse = ctx.mode == "sparse"
        seg_r = nearest_resize(seg, x.shape[1:3])
        if self.main_sparse:
            seg_r = self.seg_gather(seg_r, ctx)
        actvs = jax.nn.relu(self.mlp_shared(seg_r, ctx))
        if self.main_sparse:
            actvs = self.seg_sg(actvs, ctx)
        if self.learned_shortcut:
            actv_0, actv_1, actv_s = jnp.split(actvs, 3, axis=-1)
        else:
            actv_0, actv_1 = jnp.split(actvs, 2, axis=-1)

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


class SIGESubMobileSPADEGenerator(SIGEModule):
    """Reference: sige_fused_sub_mobile_spade_generator.py:196-340.
    Layer channels come from ``channels`` (decoded config_str)."""

    cfg: SPADEGenConfig = SPADEGenConfig()
    channels: Tuple[int, ...] = (32, 32, 32, 48, 32, 24, 24, 32)

    def setup(self):
        cfg = self.cfg
        nf = cfg.ngf
        ch = self.channels
        is_most = 1 if cfg.num_upsampling_layers == "most" else 0
        if cfg.num_upsampling_layers == "most":
            raise NotImplementedError("'most' is unsupported for sub-mobile")
        nsl = cfg.num_sparse_layers

        self.fc = SIGEConv2d(features=16 * ch[0], kernel_size=3, padding=1,
                             tile_input=False)

        def mk(fin, fout, ic, channel, hidden, k):
            return SIGESubMobileSPADEResnetBlock(
                cfg=cfg, fin=fin, fout=fout, ic=ic, channel=channel,
                hidden=hidden, support_sparse=nsl >= k + is_most)

        ic = ch[0] * 16
        self.head_0 = mk(16 * nf, 16 * nf, ic, ch[1] * 16, ch[1] * 2, 7)
        self.G_middle_0 = mk(16 * nf, 16 * nf, ic, ch[2] * 16, ch[2] * 2, 6)
        self.G_middle_1 = mk(16 * nf, 16 * nf, ic, ch[3] * 16, ch[3] * 2, 5)
        self.up_0 = mk(16 * nf, 8 * nf, ic, ch[4] * 8, ch[4] * 2, 4)
        ic = ch[4] * 8
        self.up_1 = mk(8 * nf, 4 * nf, ic, ch[5] * 4, ch[5] * 2, 3)
        ic = ch[5] * 4
        self.up_2 = mk(4 * nf, 2 * nf, ic, ch[6] * 2, ch[6] * 2, 2)
        ic = ch[6] * 2
        self.up_3 = mk(2 * nf, 1 * nf, ic, ch[7], ch[7] * 2, 1)
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
        x = self.conv_img(_leaky(x), ctx)
        return jnp.tanh(x)
