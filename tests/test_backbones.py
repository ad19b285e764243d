"""Metric backbone structure/converter tests (no pretrained weights:
synthetic state dicts via independently-written inverse key mappings).
Numeric parity against the public checkpoints requires local weight
files and is exercised by cli.get_metric when they exist."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.metrics.backbones import (AlexNetFeatures, DRNSeg,
                                        InceptionV3Features, LPIPSAlex,
                                        convert_alexnet, convert_drn_seg,
                                        convert_inception_v3)
from sige_tpu.utils.convert import assert_params_match


def _t(arr):
    return (np.transpose(arr, (3, 2, 0, 1)) if np.asarray(arr).ndim == 4
            else np.asarray(arr))


def test_alexnet_converter_and_lpips():
    mod = AlexNetFeatures()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    target = mod.init(jax.random.key(0), x)["params"]
    sd = {}
    for i, idx in enumerate((0, 3, 6, 8, 10)):
        sd[f"features.{idx}.weight"] = _t(target[f"conv{i}"]["kernel"])
        sd[f"features.{idx}.bias"] = np.asarray(target[f"conv{i}"]["bias"])
    conv = convert_alexnet(sd)
    assert_params_match(conv, target)

    rng = np.random.default_rng(0)
    lins = {f"lin{i}.model.1.weight":
            np.abs(rng.normal(size=(1, c, 1, 1))).astype(np.float32)
            for i, c in enumerate((64, 192, 384, 256, 256))}
    lp = LPIPSAlex(sd, lins)
    a = rng.random((64, 64, 3)).astype(np.float32) * 2 - 1
    b = a.copy()
    b[20:30, 20:30] = -b[20:30, 20:30]
    assert lp(a, a) == pytest.approx(0.0, abs=1e-6)
    d = lp(a, b)
    assert d > 0
    mask = np.zeros((64, 64), bool)
    mask[20:30, 20:30] = True
    assert lp(a, b, mask=mask) > 0
    # untouched region scores ~0 under the mask restriction
    far = np.zeros((64, 64), bool)
    far[0:4, 0:4] = True
    assert lp(a, b, mask=far) < lp(a, b, mask=mask)


def _inception_sd(params):
    sd = {}
    for path, leaf in flax.traverse_util.flatten_dict(params).items():
        arr = np.asarray(leaf)
        mod = list(path[:-1])
        leafname = path[-1]
        if leafname == "kernel":          # (..., "conv", "kernel")
            key = ".".join(mod) + ".weight"
            arr = _t(arr)
        elif leafname == "scale":
            key = ".".join(mod) + ".bn.weight"
        elif leafname == "bias":
            key = ".".join(mod) + ".bn.bias"
        else:                              # running_mean / running_var
            key = ".".join(mod) + f".bn.{leafname}"
        sd[key] = arr
    return sd


def test_inception_converter_bijection():
    mod = InceptionV3Features()
    x = jnp.zeros((1, 107, 107, 3), jnp.float32)
    target = mod.init(jax.random.key(0), x)["params"]
    sd = _inception_sd(target)
    # noise keys the converter must ignore
    sd["fc.weight"] = np.zeros((10, 2048), np.float32)
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    conv = convert_inception_v3(sd)
    assert_params_match(conv, target)
    feats = mod.apply({"params": conv}, jnp.zeros((2, 107, 107, 3)))
    assert feats.shape == (2, 2048)
    assert np.isfinite(np.asarray(feats)).all()


def _drn_sd(params):
    sd = {}
    flat = flax.traverse_util.flatten_dict(params)
    for path, leaf in flat.items():
        arr = np.asarray(leaf)
        if path[0] == "seg":
            key = "seg.weight" if path[1] == "kernel" else "seg.bias"
            sd["module." + key] = _t(arr) if path[1] == "kernel" else arr
            continue
        name = path[1]                     # e.g. layer3_2 / layer0_conv
        if name == "layer0_conv":
            prefix, leafmod = "base.0.0", None
        elif name == "layer0_bn":
            prefix, leafmod = "base.0.1", "bn"
        else:
            li, i = name.split("_")[0][5:], int(name.split("_")[1])
            li = int(li)
            if li in (1, 2, 7, 8):         # conv/bn/relu triplets
                sub = path[2]              # "conv" | "bn"
                idx = 3 * i + (0 if sub == "conv" else 1)
                prefix = f"base.{li}.{idx}"
                leafmod = None if sub == "conv" else "bn"
            else:                          # bottleneck
                sub = path[2]
                sub = {"downsample_conv": "downsample.0",
                       "downsample_bn": "downsample.1"}.get(sub, sub)
                prefix = f"base.{li}.{i}.{sub}"
                leafmod = "bn" if ("bn" in path[2] or path[2] == "downsample_bn") else None
        leafname = path[-1]
        if leafname == "kernel":
            sd[f"module.{prefix}.weight"] = _t(arr)
        elif leafname == "scale":
            sd[f"module.{prefix}.weight"] = arr
        else:
            sd[f"module.{prefix}.{leafname}"] = arr
    return sd


def test_drn_seg_converter_bijection():
    mod = DRNSeg(classes=19)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    target = mod.init(jax.random.key(0), x)["params"]
    sd = _drn_sd(target)
    conv = convert_drn_seg(sd)
    assert_params_match(conv, target)
    y = mod.apply({"params": conv}, x)
    assert y.shape == (1, 64, 64, 19)
