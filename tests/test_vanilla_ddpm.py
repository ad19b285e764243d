"""Vanilla (unfused) DDPM UNet arch + converter equivalence.

The reference keeps the original UNet arch and derives the fused one by
weight surgery (reference: diffusion/models/ddpm_arch/fused_unet.py:
306-355). Here we assert the converse contract on random weights: a
vanilla-format torch state dict converted with ``fuse=True`` makes
SIGEFusedUNet (dense mode) reproduce VanillaDDPMUNet exactly — which
pins down the temb concatenation order and the qkv fusion.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.models.ddpm import (DDPMUNetConfig, SIGEFusedUNet,
                                  VanillaDDPMUNet)
from sige_tpu.nn.module import SIGECtx
from sige_tpu.utils.convert import (assert_params_match,
                                    convert_ddpm_unet_to_fused,
                                    convert_ddpm_vanilla_unet)

CFG = DDPMUNetConfig(
    ch=8, ch_mult=(1, 2), num_res_blocks=2, attn_resolutions=(8,),
    in_ch=3, out_ch=3, resolution=16, num_groups=4,
    block_size_normal=None, block_size_instance=None,
    sparse_resolution_threshold=10_000)


def _flax_path_to_torch_key(path):
    """Invert the converter's naming for the vanilla arch."""
    name = "/".join(path)
    name = re.sub(r"down_blocks_(\d+)_(\d+)", r"down.\1.block.\2", name)
    name = re.sub(r"down_attns_(\d+)_(\d+)", r"down.\1.attn.\2", name)
    name = re.sub(r"up_blocks_(\d+)_(\d+)", r"up.\1.block.\2", name)
    name = re.sub(r"up_attns_(\d+)_(\d+)", r"up.\1.attn.\2", name)
    name = re.sub(r"downsamples_(\d+)", r"down.\1.downsample", name)
    name = re.sub(r"upsamples_(\d+)",
                  lambda m: f"up.{int(m.group(1)) + 1}.upsample", name)
    name = name.replace("mid_block1", "mid.block_1")
    name = name.replace("mid_block2", "mid.block_2")
    name = name.replace("mid_attn", "mid.attn_1")
    name = name.replace("temb_dense0", "temb.dense.0")
    name = name.replace("temb_dense1", "temb.dense.1")
    name = name.replace("/kernel", ".weight").replace("/bias", ".bias")
    name = name.replace("/scale", ".weight")
    return name.replace("/", ".")


def _params_to_torch_sd(params):
    import flax

    sd = {}
    for path, leaf in flax.traverse_util.flatten_dict(params).items():
        arr = np.asarray(leaf)
        if path[-1] == "kernel":
            # conv HWIO -> OIHW; linear IO -> OI
            arr = (arr.transpose(3, 2, 0, 1) if arr.ndim == 4
                   else arr.transpose(1, 0))
        sd[_flax_path_to_torch_key(path)] = arr
    return sd


@pytest.fixture(scope="module")
def stack():
    vanilla = VanillaDDPMUNet(cfg=CFG)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, CFG.resolution, CFG.resolution, 3)).astype(np.float32))
    t = jnp.asarray([37.0], jnp.float32)
    vparams = vanilla.init(jax.random.key(0), x, t)["params"]
    sd = _params_to_torch_sd(vparams)
    return vanilla, vparams, sd, x, t


def test_vanilla_converter_roundtrip(stack):
    vanilla, vparams, sd, x, t = stack
    conv = convert_ddpm_vanilla_unet(
        sd, ch_mult=CFG.ch_mult, num_res_blocks=CFG.num_res_blocks,
        attn_resolutions=CFG.attn_resolutions, resolution=CFG.resolution)
    assert_params_match(conv, vparams)
    y0 = vanilla.apply({"params": vparams}, x, t)
    y1 = vanilla.apply({"params": conv}, x, t)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=0)


def test_fused_matches_vanilla(stack):
    vanilla, vparams, sd, x, t = stack
    fused_mod = SIGEFusedUNet(cfg=CFG)
    target = fused_mod.init(
        jax.random.key(1), x, t, ctx=SIGECtx(mode="dense"))["params"]
    fused = convert_ddpm_unet_to_fused(
        sd, ch_mult=CFG.ch_mult, num_res_blocks=CFG.num_res_blocks,
        attn_resolutions=CFG.attn_resolutions, resolution=CFG.resolution)
    assert_params_match(fused, target)
    y_vanilla = vanilla.apply({"params": vparams}, x, t)
    y_fused = fused_mod.apply({"params": fused}, x, t,
                              ctx=SIGECtx(mode="dense"))
    np.testing.assert_allclose(
        np.asarray(y_vanilla), np.asarray(y_fused), atol=1e-5)
