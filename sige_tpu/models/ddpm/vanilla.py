"""Vanilla (unfused) DDPM U-Net — the *original-model* baseline arch.

The reference keeps the original Ho et al. U-Net as a separate class with
per-resblock temb projections and separate q/k/v attention convs
(reference: diffusion/models/ddpm_arch/unet.py:44-238); its "original"
configs benchmark this arch with the ``church256-ddpm-unet.pth``
checkpoint. Mathematically it computes the same function as
:class:`~sige_tpu.models.ddpm.SIGEFusedUNet` in ``dense`` mode (the fused
arch just concatenates the temb/qkv matmuls; reference:
fused_unet.py:306-355), which ``tests/test_vanilla_ddpm.py`` asserts.

Dense-only by design: the SIGE engine always runs the fused arch (one
MXU matmul beats 22 tiny ones on TPU); this class exists for checkpoint
parity and as the reference-faithful baseline.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .unet import DDPMUNetConfig, _swish, timestep_embedding


class VanillaResnetBlock(nn.Module):
    """Reference: diffusion/models/ddpm_arch/unet.py:44-90."""

    cfg: DDPMUNetConfig
    in_channels: int
    out_channels: int
    use_conv_shortcut: bool = False

    def setup(self):
        g = self.cfg.num_groups
        self.norm1 = nn.GroupNorm(num_groups=g, epsilon=1e-6)
        self.conv1 = nn.Conv(self.out_channels, (3, 3), padding=1)
        self.temb_proj = nn.Dense(self.out_channels)
        self.norm2 = nn.GroupNorm(num_groups=g, epsilon=1e-6)
        self.conv2 = nn.Conv(self.out_channels, (3, 3), padding=1)
        if self.in_channels != self.out_channels:
            if self.use_conv_shortcut:
                self.conv_shortcut = nn.Conv(self.out_channels, (3, 3), padding=1)
            else:
                self.nin_shortcut = nn.Conv(self.out_channels, (1, 1), padding=0)

    def __call__(self, x, temb):
        h = self.conv1(_swish(self.norm1(x)))
        h = h + self.temb_proj(_swish(temb))[:, None, None, :]
        h = self.conv2(_swish(self.norm2(h)))
        if self.in_channels != self.out_channels:
            x = (self.conv_shortcut(x) if self.use_conv_shortcut
                 else self.nin_shortcut(x))
        return x + h


class VanillaAttnBlock(nn.Module):
    """Global single-head attention with separate q/k/v 1x1 convs
    (reference: diffusion/models/ddpm_arch/unet.py:93-137)."""

    cfg: DDPMUNetConfig
    channels: int

    def setup(self):
        g = self.cfg.num_groups
        self.norm = nn.GroupNorm(num_groups=g, epsilon=1e-6)
        self.q = nn.Conv(self.channels, (1, 1))
        self.k = nn.Conv(self.channels, (1, 1))
        self.v = nn.Conv(self.channels, (1, 1))
        self.proj_out = nn.Conv(self.channels, (1, 1))

    def __call__(self, x):
        B, H, W, C = x.shape
        h = self.norm(x)
        q = self.q(h).reshape(B, H * W, C)
        k = self.k(h).reshape(B, H * W, C)
        v = self.v(h).reshape(B, H * W, C)
        logits = jnp.einsum("bqc,bkc->bqk", q, k) * (C ** -0.5)
        w = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", w, v).reshape(B, H, W, C)
        return x + self.proj_out(out)


class VanillaDownsample(nn.Module):
    """Stride-2 conv with asymmetric (0,1,0,1) padding
    (reference: diffusion/models/ddpm_arch/unet.py:24-41)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=2,
                       padding=((0, 1), (0, 1)), name="conv")(x)


class VanillaUpsample(nn.Module):
    """Nearest 2x + 3x3 conv (reference: unet.py:8-21)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding=1, name="conv")(x)


class VanillaDDPMUNet(nn.Module):
    """``__call__(x, t)`` with x [B, H, W, in_ch], t [B] timesteps.

    Reference: diffusion/models/ddpm_arch/unet.py:140-238 (same level /
    block traversal as the fused arch so converters share the walk).
    """

    cfg: DDPMUNetConfig = DDPMUNetConfig()

    def setup(self):
        cfg = self.cfg
        nres = len(cfg.ch_mult)
        self.temb_dense0 = nn.Dense(cfg.temb_ch)
        self.temb_dense1 = nn.Dense(cfg.temb_ch)
        self.conv_in = nn.Conv(cfg.ch, (3, 3), padding=1)

        in_mult = (1,) + tuple(cfg.ch_mult)
        down_blocks, down_attns, downsamples = [], [], []
        curr_res = cfg.resolution
        block_in = None
        for i in range(nres):
            blocks, attns = [], []
            block_in = cfg.ch * in_mult[i]
            block_out = cfg.ch * cfg.ch_mult[i]
            for _ in range(cfg.num_res_blocks):
                blocks.append(VanillaResnetBlock(
                    cfg=cfg, in_channels=block_in, out_channels=block_out))
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    attns.append(VanillaAttnBlock(cfg=cfg, channels=block_in))
            down_blocks.append(blocks)
            down_attns.append(attns)
            if i != nres - 1:
                downsamples.append(VanillaDownsample(channels=block_in))
                curr_res //= 2
        self.down_blocks = down_blocks
        self.down_attns = down_attns
        self.downsamples = downsamples

        self.mid_block1 = VanillaResnetBlock(
            cfg=cfg, in_channels=block_in, out_channels=block_in)
        self.mid_attn = VanillaAttnBlock(cfg=cfg, channels=block_in)
        self.mid_block2 = VanillaResnetBlock(
            cfg=cfg, in_channels=block_in, out_channels=block_in)

        up_blocks, up_attns, upsamples = [], [], []
        for i in reversed(range(nres)):
            blocks, attns = [], []
            block_out = cfg.ch * cfg.ch_mult[i]
            skip_in = cfg.ch * cfg.ch_mult[i]
            for ib in range(cfg.num_res_blocks + 1):
                if ib == cfg.num_res_blocks:
                    skip_in = cfg.ch * in_mult[i]
                blocks.append(VanillaResnetBlock(
                    cfg=cfg, in_channels=block_in + skip_in,
                    out_channels=block_out))
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    attns.append(VanillaAttnBlock(cfg=cfg, channels=block_in))
            up_blocks.insert(0, blocks)
            up_attns.insert(0, attns)
            if i != 0:
                upsamples.insert(0, VanillaUpsample(channels=block_in))
                curr_res *= 2
        self.up_blocks = up_blocks
        self.up_attns = up_attns
        self.upsamples = upsamples

        self.norm_out = nn.GroupNorm(num_groups=cfg.num_groups, epsilon=1e-6)
        self.conv_out = nn.Conv(cfg.out_ch, (3, 3), padding=1)

    def __call__(self, x, t):
        cfg = self.cfg
        nres = len(cfg.ch_mult)
        temb = timestep_embedding(t, cfg.ch)
        temb = self.temb_dense0(temb)
        temb = _swish(temb)
        temb = self.temb_dense1(temb)

        hs = [self.conv_in(x)]
        for i in range(nres):
            for ib in range(cfg.num_res_blocks):
                h = self.down_blocks[i][ib](hs[-1], temb)
                if self.down_attns[i]:
                    h = self.down_attns[i][ib](h)
                hs.append(h)
            if i != nres - 1:
                hs.append(self.downsamples[i](hs[-1]))

        h = hs[-1]
        h = self.mid_block1(h, temb)
        h = self.mid_attn(h)
        h = self.mid_block2(h, temb)

        for i in reversed(range(nres)):
            for ib in range(cfg.num_res_blocks + 1):
                h = self.up_blocks[i][ib](
                    jnp.concatenate([h, hs.pop()], axis=-1), temb)
                if self.up_attns[i]:
                    h = self.up_attns[i][ib](h)
            if i != 0:
                h = self.upsamples[i - 1](h)

        return self.conv_out(_swish(self.norm_out(h)))
