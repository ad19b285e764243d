"""Vanilla (unfused) SPADE generator — the original GauGAN baseline.

The reference keeps the original SPADE arch as a separate class where
each SPADE norm owns its own ``mlp_shared``/``mlp_gamma``/``mlp_beta``
convs (reference: gaugan/models/spade_generators/spade_generator.py:66,
gaugan/models/normalization.py:92-131); the fused arch is derived by
concatenating those convs (fused_spade_generator.py:72-160). This class
computes the same function as
:class:`~sige_tpu.models.gaugan.SIGEFusedSPADEGenerator` in ``dense``
mode given ``fuse=True``-converted weights, which
``tests/test_gaugan_vanilla.py`` asserts.

Dense-only by design: the SIGE engine always runs the fused arch.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .spade import SPADEGenConfig, _leaky, nearest_resize, up2x


class VanillaSPADENorm(nn.Module):
    """Param-free SyncBatchNorm (inference = running stats) + per-norm
    γ/β convs (reference: gaugan/models/normalization.py:92-131)."""

    norm_nc: int
    nhidden: int
    bn_eps: float = 1e-5

    def setup(self):
        self.running_mean = self.param(
            "running_mean", nn.initializers.zeros_init(), (self.norm_nc,))
        self.running_var = self.param(
            "running_var", nn.initializers.ones_init(), (self.norm_nc,))
        self.mlp_shared = nn.Conv(self.nhidden, (3, 3), padding=1)
        self.mlp_gamma = nn.Conv(self.norm_nc, (3, 3), padding=1)
        self.mlp_beta = nn.Conv(self.norm_nc, (3, 3), padding=1)

    def __call__(self, x, seg_r):
        scale = 1.0 / jnp.sqrt(self.running_var + self.bn_eps)
        normalized = (x - self.running_mean) * scale
        actv = nn.relu(self.mlp_shared(seg_r))
        gamma = self.mlp_gamma(actv)
        beta = self.mlp_beta(actv)
        return normalized * (1 + gamma) + beta


class VanillaSPADEResnetBlock(nn.Module):
    """Reference: gaugan/models/spade_generators/spade_generator.py:9-64."""

    cfg: SPADEGenConfig
    fin: int
    fout: int

    def setup(self):
        cfg = self.cfg
        fmiddle = min(self.fin, self.fout)
        nhidden = 2 * cfg.ngf
        self.learned_shortcut = self.fin != self.fout
        self.conv_0 = nn.Conv(fmiddle, (3, 3), padding=1)
        self.conv_1 = nn.Conv(self.fout, (3, 3), padding=1)
        self.norm_0 = VanillaSPADENorm(norm_nc=self.fin, nhidden=nhidden,
                                       bn_eps=cfg.bn_eps)
        self.norm_1 = VanillaSPADENorm(norm_nc=fmiddle, nhidden=nhidden,
                                       bn_eps=cfg.bn_eps)
        if self.learned_shortcut:
            self.conv_s = nn.Conv(self.fout, (1, 1), use_bias=False)
            self.norm_s = VanillaSPADENorm(norm_nc=self.fin, nhidden=nhidden,
                                           bn_eps=cfg.bn_eps)

    def __call__(self, x, seg):
        seg_r = nearest_resize(seg, x.shape[1:3])
        if self.learned_shortcut:
            x_s = self.conv_s(self.norm_s(x, seg_r))
        else:
            x_s = x
        dx = self.conv_0(_leaky(self.norm_0(x, seg_r)))
        dx = self.conv_1(_leaky(self.norm_1(dx, seg_r)))
        return x_s + dx


class VanillaSPADEGenerator(nn.Module):
    """``__call__(seg)`` with seg [B, H, W, semantic_nc] one-hot(+edge).

    Reference: gaugan/models/spade_generators/spade_generator.py:66-140.
    """

    cfg: SPADEGenConfig = SPADEGenConfig()

    def setup(self):
        cfg = self.cfg
        nf = cfg.ngf
        self.fc = nn.Conv(16 * nf, (3, 3), padding=1)
        mk = lambda fin, fout: VanillaSPADEResnetBlock(
            cfg=cfg, fin=fin, fout=fout)
        self.head_0 = mk(16 * nf, 16 * nf)
        self.G_middle_0 = mk(16 * nf, 16 * nf)
        self.G_middle_1 = mk(16 * nf, 16 * nf)
        self.up_0 = mk(16 * nf, 8 * nf)
        self.up_1 = mk(8 * nf, 4 * nf)
        self.up_2 = mk(4 * nf, 2 * nf)
        self.up_3 = mk(2 * nf, 1 * nf)
        final_nc = nf
        if cfg.num_upsampling_layers == "most":
            self.up_4 = mk(1 * nf, nf // 2)
            final_nc = nf // 2
        self.conv_img = nn.Conv(3, (3, 3), padding=1)

    def __call__(self, seg):
        cfg = self.cfg
        x = nearest_resize(seg, cfg.latent_hw)
        x = self.fc(x)
        x = self.head_0(x, seg)
        x = up2x(x)
        x = self.G_middle_0(x, seg)
        if cfg.num_upsampling_layers in ("more", "most"):
            x = up2x(x)
        x = self.G_middle_1(x, seg)
        x = up2x(x)
        x = self.up_0(x, seg)
        x = up2x(x)
        x = self.up_1(x, seg)
        x = up2x(x)
        x = self.up_2(x, seg)
        x = up2x(x)
        x = self.up_3(x, seg)
        if cfg.num_upsampling_layers == "most":
            x = up2x(x)
            x = self.up_4(x, seg)
        return jnp.tanh(self.conv_img(_leaky(x)))
