"""Vanilla SPADE arch + GauGAN converter equivalence/truncation tests.

Mirrors the reference's weight surgeries: SPADE -> FusedSPADE concat
(reference: gaugan/models/spade_generators/fused_spade_generator.py:
72-160) and the sub-mobile ``param_free_norm`` running-stat truncation
(reference: gaugan/utils.py:20-33).
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.models.gaugan import (SIGEFusedSPADEGenerator,
                                    SIGESubMobileSPADEGenerator,
                                    SPADEGenConfig, VanillaSPADEGenerator)
from sige_tpu.nn.module import SIGECtx
from sige_tpu.utils.convert import (assert_params_match,
                                    convert_gaugan_spade,
                                    convert_gaugan_sub_mobile_spade)

CFG = SPADEGenConfig(
    ngf=4, semantic_nc=6, crop_size=64, aspect_ratio=2.0,
    num_upsampling_layers="normal",  # 5 ups: crop 64 -> latent (1, 2)
    main_block_size=None, shortcut_block_size=None, num_sparse_layers=0)


def _vanilla_sd(params):
    """Invert the converter naming: vanilla flax params -> torch keys."""
    sd = {}
    for path, leaf in flax.traverse_util.flatten_dict(params).items():
        arr = np.asarray(leaf)
        parts = list(path)
        if parts[-1] == "kernel":
            arr = arr.transpose(3, 2, 0, 1)
            parts[-1] = "weight"
        if "running" in parts[-1]:
            parts.insert(-1, "param_free_norm")
        if len(parts) >= 2 and parts[-2] == "mlp_shared":
            parts.insert(-1, "0")
        sd[".".join(parts)] = arr
    return sd


@pytest.fixture(scope="module")
def spade_stack():
    vanilla = VanillaSPADEGenerator(cfg=CFG)
    rng = np.random.default_rng(0)
    h, w = 32, 64
    seg = jnp.asarray(rng.random((1, h, w, CFG.semantic_nc)).astype(np.float32))
    vparams = vanilla.init(jax.random.key(0), seg)["params"]
    # randomize running stats away from (0, 1) defaults
    def scramble(p):
        flat = flax.traverse_util.flatten_dict(p)
        for k, v in flat.items():
            if k[-1] == "running_mean":
                flat[k] = jnp.asarray(rng.normal(size=v.shape), jnp.float32)
            if k[-1] == "running_var":
                flat[k] = jnp.asarray(
                    rng.random(v.shape) + 0.5, jnp.float32)
        return flax.traverse_util.unflatten_dict(flat)
    vparams = scramble(vparams)
    return vanilla, vparams, _vanilla_sd(vparams), seg


def test_vanilla_spade_roundtrip(spade_stack):
    vanilla, vparams, sd, seg = spade_stack
    conv = convert_gaugan_spade(sd, CFG.num_upsampling_layers, fuse=False)
    assert_params_match(conv, vparams)
    y0 = vanilla.apply({"params": vparams}, seg)
    y1 = vanilla.apply({"params": conv}, seg)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=0)


def test_fused_spade_matches_vanilla(spade_stack):
    vanilla, vparams, sd, seg = spade_stack
    fused_mod = SIGEFusedSPADEGenerator(cfg=CFG)
    target = fused_mod.init(jax.random.key(1), seg,
                            ctx=SIGECtx(mode="dense"))["params"]
    fused = convert_gaugan_spade(sd, CFG.num_upsampling_layers, fuse=True)
    assert_params_match(fused, target)
    y_vanilla = vanilla.apply({"params": vparams}, seg)
    y_fused = fused_mod.apply({"params": fused}, seg,
                              ctx=SIGECtx(mode="dense"))
    np.testing.assert_allclose(
        np.asarray(y_vanilla), np.asarray(y_fused), atol=1e-5)


def _sub_mobile_sd(params, pad_stats: int):
    """Invert the sub-mobile converter naming, padding running stats to a
    longer 'nominal' width (exercises the truncation rule)."""
    rng = np.random.default_rng(7)
    sd = {}
    for path, leaf in flax.traverse_util.flatten_dict(params).items():
        arr = np.asarray(leaf)
        parts = list(path)
        if parts[-1] == "kernel":
            arr = arr.transpose(3, 2, 0, 1)
            parts[-1] = "weight"
        if "running" in parts[-1]:
            arr = np.concatenate(
                [arr, rng.normal(size=pad_stats).astype(np.float32)])
            parts.insert(-1, "param_free_norm")
        if len(parts) >= 2 and parts[-2] in ("dw", "pw"):
            idx = "0" if parts[-2] == "dw" else "2"
            parts = parts[:-2] + ["conv", idx, parts[-1]]
        if len(parts) >= 2 and parts[-2] == "mlp_shared":
            parts.insert(-1, "0")
        sd[".".join(parts)] = arr
    return sd


def test_sub_mobile_converter_truncates_stats():
    channels = (2, 2, 2, 3, 2, 2, 2, 2)
    mod = SIGESubMobileSPADEGenerator(cfg=CFG, channels=channels)
    seg = jnp.zeros((1, 32, 64, CFG.semantic_nc), jnp.float32)
    target = mod.init(jax.random.key(0), seg,
                      ctx=SIGECtx(mode="dense"))["params"]
    sd = _sub_mobile_sd(target, pad_stats=17)
    conv = convert_gaugan_sub_mobile_spade(
        sd, channels=channels, ngf=CFG.ngf, fused_ckpt=True)
    assert_params_match(conv, target)
    # truncation kept the leading entries
    got = flax.traverse_util.flatten_dict(conv)
    want = flax.traverse_util.flatten_dict(target)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
    y = mod.apply({"params": conv}, seg, ctx=SIGECtx(mode="dense"))
    assert np.isfinite(np.asarray(y)).all()


def test_sub_mobile_unfused_ckpt_surgery():
    """The unfused checkpoint stores per-norm mlp_shared convs; the
    converter must concatenate them in (norm_0, norm_1[, norm_s]) order
    (reference: fused_sub_mobile_spade_generator.py:77-133)."""
    channels = (2, 2, 2, 3, 2, 2, 2, 2)
    mod = SIGESubMobileSPADEGenerator(cfg=CFG, channels=channels)
    seg = jnp.zeros((1, 32, 64, CFG.semantic_nc), jnp.float32)
    target = mod.init(jax.random.key(0), seg,
                      ctx=SIGECtx(mode="dense"))["params"]
    sd = _sub_mobile_sd(target, pad_stats=3)
    # split each block's fused mlp_shared into per-norm chunks
    from sige_tpu.utils.convert import sub_mobile_block_dims

    for name, (_ic, _chan, hidden, sc) in sub_mobile_block_dims(
            channels, CFG.ngf).items():
        w = sd.pop(f"{name}.mlp_shared.0.weight")
        b = sd.pop(f"{name}.mlp_shared.0.bias")
        branches = ["norm_0", "norm_1"] + (["norm_s"] if sc else [])
        for j, br in enumerate(branches):
            sd[f"{name}.{br}.mlp_shared.0.weight"] = w[j * hidden:(j + 1) * hidden]
            sd[f"{name}.{br}.mlp_shared.0.bias"] = b[j * hidden:(j + 1) * hidden]
    conv = convert_gaugan_sub_mobile_spade(
        sd, channels=channels, ngf=CFG.ngf, fused_ckpt=False)
    assert_params_match(conv, target)
    got = flax.traverse_util.flatten_dict(conv)
    want = flax.traverse_util.flatten_dict(target)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
