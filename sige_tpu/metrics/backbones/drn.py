"""DRN-D-105 dilated ResNet + segmentation head for Cityscapes mIoU
(Flax).

The reference scores GauGAN edits with a DRN-D-105 DRNSeg at 19 classes
(reference: gaugan/metrics/drn.py:394-398, miou_score.py DRNSeg) loaded
from ``drn-d-105_ms_cityscapes.pth``. Arch: arch-"D" DRN with Bottleneck
blocks, layers [1,1,3,4,23,3,1,1], channels (16,32,64,128,256,512,512,
512); the head is a 1x1 conv to 19 classes + a frozen depthwise
bilinear-kernel 8x transposed-conv upsample (drn_seg fill_up_weights).
All BatchNorms run on their stored statistics (inference only).
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class _BN(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        mean = self.param("running_mean", nn.initializers.zeros_init(),
                          (self.features,))
        var = self.param("running_var", nn.initializers.ones_init(),
                         (self.features,))
        scale = self.param("scale", nn.initializers.ones_init(),
                           (self.features,))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias


class Bottleneck(nn.Module):
    """Reference: gaugan/metrics/drn.py:61-99."""

    planes: int
    stride: int = 1
    dilation: Tuple[int, int] = (1, 1)
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x):
        p = self.planes
        d = self.dilation[1]
        h = nn.Conv(p, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.relu(_BN(p, name="bn1")(h))
        h = nn.Conv(p, (3, 3), strides=self.stride, padding=d,
                    kernel_dilation=(d, d), use_bias=False, name="conv2")(h)
        h = nn.relu(_BN(p, name="bn2")(h))
        h = nn.Conv(4 * p, (1, 1), use_bias=False, name="conv3")(h)
        h = _BN(4 * p, name="bn3")(h)
        res = x
        if self.has_downsample:
            res = nn.Conv(4 * p, (1, 1), strides=self.stride, use_bias=False,
                          name="downsample_conv")(x)
            res = _BN(4 * p, name="downsample_bn")(res)
        return nn.relu(h + res)


class _ConvLayer(nn.Module):
    """conv3x3 + BN + ReLU run (arch-"D" plain layers;
    reference: drn.py:197-215)."""

    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        x = nn.Conv(self.features, (3, 3), strides=self.stride, padding=d,
                    kernel_dilation=(d, d), use_bias=False, name="conv")(x)
        return nn.relu(_BN(self.features, name="bn")(x))


class DRND105(nn.Module):
    """Feature trunk (through layer8): [B, H, W, 3] -> [B, H/8, W/8, 512].

    Reference: gaugan/metrics/drn.py:101-254 (arch "D", Bottleneck,
    layers [1,1,3,4,23,3,1,1])."""

    layers: Sequence[int] = (1, 1, 3, 4, 23, 3, 1, 1)
    channels: Sequence[int] = (16, 32, 64, 128, 256, 512, 512, 512)

    @nn.compact
    def __call__(self, x):
        ch, ly = self.channels, self.layers
        x = nn.Conv(ch[0], (7, 7), padding=3, use_bias=False,
                    name="layer0_conv")(x)
        x = nn.relu(_BN(ch[0], name="layer0_bn")(x))
        for i in range(ly[0]):
            x = _ConvLayer(ch[0], name=f"layer1_{i}")(x)
        for i in range(ly[1]):
            x = _ConvLayer(ch[1], stride=2 if i == 0 else 1,
                           name=f"layer2_{i}")(x)

        inplanes = ch[1]
        def bottleneck_run(x, planes, blocks, stride, dil, name):
            nonlocal inplanes
            first_dil = dil  # new_level=False everywhere dilation > 1
            for i in range(blocks):
                has_ds = i == 0 and (stride != 1 or inplanes != planes * 4)
                x = Bottleneck(
                    planes=planes, stride=stride if i == 0 else 1,
                    dilation=(first_dil, dil) if i == 0 else (dil, dil),
                    has_downsample=has_ds, name=f"{name}_{i}")(x)
                inplanes = planes * 4
            return x

        x = bottleneck_run(x, ch[2], ly[2], 2, 1, "layer3")
        x = bottleneck_run(x, ch[3], ly[3], 2, 1, "layer4")
        x = bottleneck_run(x, ch[4], ly[4], 1, 2, "layer5")
        x = bottleneck_run(x, ch[5], ly[5], 1, 4, "layer6")
        for i in range(ly[6]):
            x = _ConvLayer(ch[6], dilation=2, name=f"layer7_{i}")(x)
        for i in range(ly[7]):
            x = _ConvLayer(ch[7], dilation=1, name=f"layer8_{i}")(x)
        return x


def _bilinear_up_kernel(k: int = 16) -> np.ndarray:
    """fill_up_weights kernel (reference: miou_score.py:120-128)."""
    f = int(np.ceil(k / 2.0))
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    i = np.arange(k)
    w1 = 1 - np.abs(i / f - c)
    return (w1[:, None] * w1[None, :]).astype(np.float32)


class DRNSeg(nn.Module):
    """DRN-D-105 trunk + 1x1 seg head + frozen 8x bilinear-kernel
    upsample; returns per-class logit maps at input resolution."""

    classes: int = 19

    @nn.compact
    def __call__(self, x):
        feats = DRND105(name="base")(x)
        logits = nn.Conv(self.classes, (1, 1), name="seg")(feats)
        # depthwise ConvTranspose2d(16, stride 8, pad 4) == dilated conv
        # with lhs_dilation 8 and padding k-1-4 = 11
        kern = jnp.asarray(_bilinear_up_kernel(16))[:, :, None, None]
        kern = jnp.tile(kern, (1, 1, 1, self.classes))
        up = jax.lax.conv_general_dilated(
            logits, kern, window_strides=(1, 1), padding=((11, 11), (11, 11)),
            lhs_dilation=(8, 8), feature_group_count=self.classes,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return up


def convert_drn_seg(sd: Mapping[str, np.ndarray], classes: int = 19) -> Dict:
    """``drn-d-105_ms_cityscapes.pth`` DRNSeg state dict ->
    :class:`DRNSeg` params. Torch keys come through nn.DataParallel
    (``module.`` prefix) with ``base.<seq index>`` numbering of the DRN's
    children [layer0, layer1, ..., layer8]."""
    import flax

    sd = {k[len("module."):] if k.startswith("module.") else k: np.asarray(v)
          for k, v in sd.items()}
    flat = {}

    def conv(src, dst):
        flat[dst + ("kernel",)] = np.transpose(sd[f"{src}.weight"], (2, 3, 1, 0))
        if f"{src}.bias" in sd:
            flat[dst + ("bias",)] = sd[f"{src}.bias"]

    def bn(src, dst):
        flat[dst + ("scale",)] = sd[f"{src}.weight"]
        flat[dst + ("bias",)] = sd[f"{src}.bias"]
        flat[dst + ("running_mean",)] = sd[f"{src}.running_mean"]
        flat[dst + ("running_var",)] = sd[f"{src}.running_var"]

    # base children order: layer0..layer8 -> sequential indices 0..8
    layers = (1, 1, 3, 4, 23, 3, 1, 1)
    conv("base.0.0", ("base", "layer0_conv"))
    bn("base.0.1", ("base", "layer0_bn"))
    for li, n in ((1, layers[0]), (2, layers[1])):
        for i in range(n):
            conv(f"base.{li}.{3 * i}", ("base", f"layer{li}_{i}", "conv"))
            bn(f"base.{li}.{3 * i + 1}", ("base", f"layer{li}_{i}", "bn"))
    for li, n in ((3, layers[2]), (4, layers[3]), (5, layers[4]),
                  (6, layers[5])):
        for i in range(n):
            src = f"base.{li}.{i}"
            dst = ("base", f"layer{li}_{i}")
            for j in (1, 2, 3):
                conv(f"{src}.conv{j}", dst + (f"conv{j}",))
                bn(f"{src}.bn{j}", dst + (f"bn{j}",))
            if f"{src}.downsample.0.weight" in sd:
                conv(f"{src}.downsample.0", dst + ("downsample_conv",))
                bn(f"{src}.downsample.1", dst + ("downsample_bn",))
    for li, n in ((7, layers[6]), (8, layers[7])):
        for i in range(n):
            conv(f"base.{li}.{3 * i}", ("base", f"layer{li}_{i}", "conv"))
            bn(f"base.{li}.{3 * i + 1}", ("base", f"layer{li}_{i}", "bn"))
    conv("seg", ("seg",))
    return flax.traverse_util.unflatten_dict(flat)


class CityscapesSegmenter:
    """images [H, W, 3] in [0, 1] -> [H, W] trainId predictions."""

    #: Cityscapes normalization used by the reference's SegList loader
    MEAN = np.array([0.29010095242892997, 0.32808144844279574,
                     0.28696394422942517], np.float32)
    STD = np.array([0.1829540508368939, 0.18656561047509476,
                    0.18447508988480435], np.float32)

    def __init__(self, sd: Optional[Mapping[str, np.ndarray]],
                 classes: int = 19):
        self.module = DRNSeg(classes=classes)
        if sd is None:
            # UNTRAINED segmenter: pipeline dry-runs only
            self.params = self.module.init(
                jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
        else:
            self.params = convert_drn_seg(sd, classes)
        self._fwd = jax.jit(lambda p, x: self.module.apply({"params": p}, x))

    def __call__(self, img: np.ndarray) -> np.ndarray:
        x = (np.asarray(img, np.float32) - self.MEAN) / self.STD
        if x.ndim == 3:
            x = x[None]
        logits = self._fwd(self.params, jnp.asarray(x))
        return np.asarray(jnp.argmax(logits, axis=-1))[0]
