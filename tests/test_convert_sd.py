"""SD (LDM) checkpoint converter tests: structure bijection via an
independently-written inverse key mapping, plus numeric validation of the
quant_conv / post_quant_conv folds
(reference: ldm/models/autoencoder.py:27-28,74-79).
"""

import re

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.models.sd import (SDUNetConfig, SDVAEConfig, SIGEDecoder,
                                SIGEEncoder, SIGESDUNet)
from sige_tpu.nn.module import SIGECtx
from sige_tpu.utils.convert import assert_params_match
from sige_tpu.utils.convert_sd import (convert_sd_decoder,
                                       convert_sd_encoder, convert_sd_unet)

UNET_CFG = SDUNetConfig(
    in_channels=4, model_channels=8, out_channels=4, num_res_blocks=2,
    attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
    transformer_depth=1, context_dim=16, num_groups=4,
    main_block_size=None, shortcut_block_size=None,
    transformer_block_size=None)

VAE_CFG = SDVAEConfig(
    ch=8, ch_mult=(1, 2), num_res_blocks=2, attn_resolutions=(),
    in_channels=3, out_ch=3, z_channels=4, resolution=16, num_groups=4,
    main_block_size=None, shortcut_block_size=None, attn_block_size=None)


def _leaf_to_torch(path, arr):
    """kernel/scale renaming + layout transpose for one leaf."""
    arr = np.asarray(arr)
    suffix = path[-1]
    if suffix == "kernel":
        arr = (arr.transpose(3, 2, 0, 1) if arr.ndim == 4
               else arr.transpose(1, 0))
        suffix = "weight"
    elif suffix == "scale":
        suffix = "weight"
    return suffix, arr


def _unet_torch_key(path):
    """Independent inverse of convert_sd_unet's naming."""
    name = "/".join(path[:-1])
    name = re.sub(r"in_blocks_(\d+)_(\d+)",
                  lambda m: f"input_blocks.{int(m.group(1)) + 1}.{m.group(2)}",
                  name)
    name = re.sub(r"out_blocks_(\d+)_(\d+)", r"output_blocks.\1.\2", name)
    name = name.replace("mid_block1", "middle_block.0")
    name = name.replace("mid_attn", "middle_block.1")
    name = name.replace("mid_block2", "middle_block.2")
    name = re.sub(r"blocks_(\d+)", r"transformer_blocks.\1", name)
    if "transformer_blocks" in name:
        name = name.replace("/to_out", "/to_out.0")
        name = name.replace("/ff/proj", "/ff.net.0.proj")
        name = name.replace("/ff/out", "/ff.net.2")
    else:
        name = re.sub(r"/norm1$", "/in_layers.0", name)
        name = re.sub(r"/conv1$", "/in_layers.2", name)
        name = re.sub(r"/emb_proj$", "/emb_layers.1", name)
        name = re.sub(r"/norm2$", "/out_layers.0", name)
        name = re.sub(r"/conv2$", "/out_layers.3", name)
        name = re.sub(r"/skip$", "/skip_connection", name)
    name = name.replace("time_dense0", "time_embed.0")
    name = name.replace("time_dense1", "time_embed.2")
    if name == "conv_in":
        name = "input_blocks.0.0"
    if name == "conv_out":
        name = "out.2"
    return name.replace("/", ".")


def test_sd_unet_converter_bijection():
    mod = SIGESDUNet(cfg=UNET_CFG)
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    c = jnp.zeros((1, 7, UNET_CFG.context_dim), jnp.float32)
    target = mod.init(jax.random.key(0), x, t, c,
                      ctx=SIGECtx(mode="dense"))["params"]
    sd = {}
    for path, leaf in flax.traverse_util.flatten_dict(target).items():
        if path[-1] in ("out_norm_scale", "out_norm_bias"):
            key = "out.0." + ("weight" if path[-1].endswith("scale") else "bias")
            sd[key] = np.asarray(leaf)
            continue
        suffix, arr = _leaf_to_torch(path, leaf)
        sd[f"{_unet_torch_key(path)}.{suffix}"] = arr
    conv = convert_sd_unet(
        sd, channel_mult=UNET_CFG.channel_mult,
        num_res_blocks=UNET_CFG.num_res_blocks,
        attention_resolutions=UNET_CFG.attention_resolutions,
        transformer_depth=UNET_CFG.transformer_depth)
    assert_params_match(conv, target)
    got = flax.traverse_util.flatten_dict(conv)
    want = flax.traverse_util.flatten_dict(target)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def _vae_sd(params, topkey):
    sd = {}
    for path, leaf in flax.traverse_util.flatten_dict(params).items():
        if path[-1] in ("norm_out_scale", "norm_out_bias"):
            key = "norm_out." + ("weight" if path[-1].endswith("scale") else "bias")
            sd[key] = np.asarray(leaf)
            continue
        name = "/".join(path[:-1])
        name = re.sub(r"down_blocks_(\d+)_(\d+)", r"down.\1.block.\2", name)
        name = re.sub(r"up_blocks_(\d+)_(\d+)", r"up.\1.block.\2", name)
        name = re.sub(r"down_attns_(\d+)_(\d+)", r"down.\1.attn.\2", name)
        name = re.sub(r"up_attns_(\d+)_(\d+)", r"up.\1.attn.\2", name)
        name = re.sub(r"downsamples_(\d+)", r"down.\1.downsample", name)
        name = re.sub(r"upsamples_(\d+)",
                      lambda m: f"up.{int(m.group(1)) + 1}.upsample", name)
        name = name.replace("mid_block1", "mid.block_1")
        name = name.replace("mid_attn", "mid.attn_1")
        name = name.replace("mid_block2", "mid.block_2")
        suffix, arr = _leaf_to_torch(path, leaf)
        sd[f"{name}.{suffix}".replace("/", ".")] = arr
    return sd


@pytest.fixture(scope="module")
def vae_stack():
    rng = np.random.default_rng(0)
    enc = SIGEEncoder(cfg=VAE_CFG)
    dec = SIGEDecoder(cfg=VAE_CFG)
    img = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    z = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    enc_p = enc.init(jax.random.key(0), img, ctx=SIGECtx(mode="dense"))["params"]
    dec_p = dec.init(jax.random.key(1), z, ctx=SIGECtx(mode="dense"))["params"]
    return enc, dec, enc_p, dec_p, img, z


def test_sd_vae_converter_bijection(vae_stack):
    enc, dec, enc_p, dec_p, img, z = vae_stack
    enc_conv = convert_sd_encoder(
        _vae_sd(enc_p, "encoder"), ch_mult=VAE_CFG.ch_mult,
        num_res_blocks=VAE_CFG.num_res_blocks,
        attn_resolutions=VAE_CFG.attn_resolutions,
        resolution=VAE_CFG.resolution)
    assert_params_match(enc_conv, enc_p)
    dec_conv = convert_sd_decoder(
        _vae_sd(dec_p, "decoder"), ch_mult=VAE_CFG.ch_mult,
        num_res_blocks=VAE_CFG.num_res_blocks,
        attn_resolutions=VAE_CFG.attn_resolutions,
        resolution=VAE_CFG.resolution)
    assert_params_match(dec_conv, dec_p)


def test_quant_conv_folds_numerically(vae_stack):
    """enc(folded) == quant_conv(enc(raw)). (post_quant_conv is NOT
    foldable into the zero-padded decoder conv_in — the runner applies it
    pointwise via SDRunner._pre_decode instead.)"""
    enc, dec, enc_p, dec_p, img, z = vae_stack
    rng = np.random.default_rng(3)
    zc = 2 * VAE_CFG.z_channels
    qw = rng.normal(size=(zc, zc, 1, 1)).astype(np.float32)
    qb = rng.normal(size=(zc,)).astype(np.float32)

    enc_folded = convert_sd_encoder(
        _vae_sd(enc_p, "encoder"), ch_mult=VAE_CFG.ch_mult,
        num_res_blocks=VAE_CFG.num_res_blocks,
        attn_resolutions=VAE_CFG.attn_resolutions,
        resolution=VAE_CFG.resolution, quant_conv=(qw, qb))
    y_raw = enc.apply({"params": enc_p}, img, ctx=SIGECtx(mode="dense"))
    y_folded = enc.apply({"params": enc_folded}, img, ctx=SIGECtx(mode="dense"))
    y_quant = jnp.einsum("bhwc,pc->bhwp", y_raw,
                         qw.reshape(zc, zc)) + qb
    np.testing.assert_allclose(np.asarray(y_folded), np.asarray(y_quant),
                               rtol=1e-4, atol=1e-4)
