"""Checkpoint-conversion tests.

Without network access the real reference checkpoints are unavailable, so
we verify (a) the name/shape mapping is a bijection onto our param tree
for the full church256 architecture, and (b) the layout transposes are
numerically correct against torch ops.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet
from sige_tpu.nn.module import SIGECtx
from sige_tpu.ops import conv2d_nhwc
from sige_tpu.utils.convert import (
    assert_params_match,
    convert_ddpm_fused_unet,
    _conv,
    _linear,
)


def _torch_style_state_dict(params):
    """Invert our param tree into a reference-style torch state dict
    (test-only inverse of the converter)."""
    sd = {}
    flat = flax.traverse_util.flatten_dict(params)
    for key, arr in flat.items():
        path = "/".join(key)
        a = np.asarray(arr)
        name = None
        if path == "norm_out_scale":
            sd["norm_out.weight"] = a
            continue
        if path == "norm_out_bias":
            sd["norm_out.bias"] = a
            continue
        mod, leaf = "/".join(key[:-1]), key[-1]
        # our flax name -> reference module path
        m = mod
        m = m.replace("temb_dense0", "temb.dense.0")
        m = m.replace("temb_dense1", "temb.dense.1")
        m = m.replace("temb_proj", "temb.dense.2")
        for prefix, ref in (
            ("down_blocks_", "down.{}.block.{}"),
            ("down_attns_", "down.{}.attn.{}"),
            ("up_blocks_", "up.{}.block.{}"),
            ("up_attns_", "up.{}.attn.{}"),
        ):
            if m.startswith(prefix):
                rest = m[len(prefix):]
                nums, _, sub = rest.partition("/")
                i, b = nums.split("_")
                m = ref.format(i, b) + ("." + sub.replace("/", ".") if sub else "")
        if m.startswith("downsamples_"):
            i = m.split("_")[1].split("/")[0]
            m = f"down.{i}.downsample.conv"
        if m.startswith("upsamples_"):
            i = int(m.split("_")[1].split("/")[0])
            m = f"up.{i + 1}.upsample.conv"
        m = m.replace("mid_block1", "mid.block_1").replace(
            "mid_block2", "mid.block_2").replace("mid_attn", "mid.attn_1")
        m = m.replace("/", ".")
        if leaf == "kernel":
            if a.ndim == 4:
                sd[f"{m}.weight"] = np.transpose(a, (3, 2, 0, 1))  # HWIO->OIHW
            else:
                sd[f"{m}.weight"] = np.transpose(a, (1, 0))
        elif leaf == "scale":
            sd[f"{m}.weight"] = a
        else:
            sd[f"{m}.bias"] = a
    return sd


def test_converter_bijection_on_church256():
    cfg = DDPMUNetConfig()  # full church256 architecture
    net = SIGEFusedUNet(cfg=cfg)
    variables = jax.eval_shape(
        lambda: net.init(
            jax.random.key(0),
            jnp.zeros((1, 256, 256, 3)), jnp.zeros((1,)),
            ctx=SIGECtx(mode="dense"),
        )
    )
    params_shapes = variables["params"]
    params_np = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), params_shapes)
    sd = _torch_style_state_dict(params_np)
    converted = convert_ddpm_fused_unet(
        sd, cfg.ch_mult, cfg.num_res_blocks, cfg.attn_resolutions, cfg.resolution)
    assert_params_match(converted, params_np)


def test_converter_roundtrip_values():
    cfg = DDPMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=32)
    net = SIGEFusedUNet(cfg=cfg)
    v = net.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)),
                 jnp.zeros((1,)), ctx=SIGECtx(mode="dense"))
    params = jax.tree.map(np.asarray, v["params"])
    sd = _torch_style_state_dict(params)
    converted = convert_ddpm_fused_unet(
        sd, cfg.ch_mult, cfg.num_res_blocks, cfg.attn_resolutions, cfg.resolution)
    fa = flax.traverse_util.flatten_dict(params)
    fb = flax.traverse_util.flatten_dict(converted)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg="/".join(k))


def test_conv_layout_matches_torch(rng):
    """OIHW->HWIO transpose must make our NHWC conv equal torch's NCHW."""
    w_oihw = rng.standard_normal((8, 5, 3, 3)).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    x = rng.standard_normal((2, 9, 9, 5)).astype(np.float32)
    ours = conv2d_nhwc(jnp.asarray(x), jnp.asarray(_conv(w_oihw)),
                       jnp.asarray(b), stride=1, padding=1)
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w_oihw), torch.from_numpy(b), padding=1)
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_linear_layout_matches_torch(rng):
    w = rng.standard_normal((7, 4)).astype(np.float32)
    b = rng.standard_normal(7).astype(np.float32)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    ours = jnp.asarray(x) @ jnp.asarray(_linear(w)) + b
    ref = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_gaugan_converter_bijection():
    from sige_tpu.models.gaugan import SPADEGenConfig, SIGEFusedSPADEGenerator
    from sige_tpu.nn.module import SIGECtx
    from sige_tpu.utils.convert import convert_gaugan_fused_spade

    cfg = SPADEGenConfig(ngf=8, semantic_nc=6, crop_size=128,
                         num_upsampling_layers="more", num_sparse_layers=5)
    net = SIGEFusedSPADEGenerator(cfg=cfg)
    variables = jax.eval_shape(
        lambda: net.init(jax.random.key(0),
                         jnp.zeros((1, 64, 128, 6)), ctx=SIGECtx(mode="dense")))
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                          variables["params"])
    # build a torch-style dict from the flax tree (norm fields map specially)
    flat = flax.traverse_util.flatten_dict(params)
    sd = {}
    for key, a in flat.items():
        path = list(key)
        name = path[-1]
        mod = ".".join(path[:-1])
        mod = mod.replace("mlp_shared", "mlp_shared.0")
        if "norm_" in mod and name in ("running_mean", "running_var"):
            sd[f"{mod}.param_free_norm.{name}"] = a
        elif name == "kernel":
            sd[f"{mod}.weight"] = (np.transpose(a, (3, 2, 0, 1)) if a.ndim == 4
                                   else np.transpose(a, (1, 0)))
        else:
            sd[f"{mod}.{name}"] = a
    converted = convert_gaugan_fused_spade(sd, cfg.num_upsampling_layers)
    from sige_tpu.utils.convert import assert_params_match
    assert_params_match(converted, params)


def test_pd_converter_bijection():
    from sige_tpu.models.pd import PDUNetConfig, SIGEPDUNet
    from sige_tpu.nn.module import SIGECtx
    from sige_tpu.utils.convert import convert_pd_unet

    cfg = PDUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=2,
                       attn_resolutions=(16,), resolution=32, temb_ch=64,
                       head_dim=16)
    net = SIGEPDUNet(cfg=cfg)
    variables = jax.eval_shape(
        lambda: net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                         jnp.zeros((1,)), ctx=SIGECtx(mode="dense")))
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                          variables["params"])
    flat = flax.traverse_util.flatten_dict(params)
    sd = {}
    import re as _re
    for key, a in flat.items():
        path = "/".join(key)
        m = path
        m = m.replace("temb_dense0", "temb.dense.0")
        m = m.replace("temb_dense1", "temb.dense.1")
        for pref, ref in (("down_blocks_", "down.{}.block.{}"),
                          ("down_attns_", "down.{}.attn.{}"),
                          ("up_blocks_", "up.{}.block.{}"),
                          ("up_attns_", "up.{}.attn.{}")):
            if m.startswith(pref):
                rest = m[len(pref):]
                nums, _, sub = rest.partition("/")
                i, b = nums.split("_")
                m = ref.format(i, b) + ("." + sub.replace("/", ".") if sub else "")
        if m.startswith("downsamples_"):
            i = m.split("_")[1].split("/")[0]
            m = f"down.{i}.downsample." + m.split("/", 1)[1].replace("/", ".")
        if m.startswith("upsamples_"):
            i = int(m.split("_")[1].split("/")[0])
            m = f"up.{i + 1}.upsample." + m.split("/", 1)[1].replace("/", ".")
        m = m.replace("mid_block1", "mid.block_1").replace(
            "mid_block2", "mid.block_2").replace("mid_attn", "mid.attn_1")
        m = m.replace("/", ".")
        if m == "norm_out_scale":
            sd["norm_out.weight"] = a
        elif m == "norm_out_bias":
            sd["norm_out.bias"] = a
        elif m.endswith(".kernel"):
            base = m[: -len(".kernel")]
            sd[base + ".weight"] = (np.transpose(a, (3, 2, 0, 1)) if a.ndim == 4
                                    else np.transpose(a, (1, 0)))
        elif m.endswith(".scale"):
            sd[m[: -len(".scale")] + ".weight"] = a
        else:
            sd[m] = a
    converted = convert_pd_unet(sd, cfg.ch_mult, cfg.num_res_blocks,
                                cfg.attn_resolutions, cfg.resolution)
    from sige_tpu.utils.convert import assert_params_match
    assert_params_match(converted, params)


def test_load_torch_state_dict_ema_container(tmp_path):
    """Training-state checkpoints {"model", "ema"} load with the EMA
    shadow overlaid (reference: diffusion/runner.py:74-86 +
    config.model.ema inference)."""
    from sige_tpu.utils.convert import load_torch_state_dict

    model = {"module.w": torch.full((2,), 1.0), "b": torch.full((2,), 2.0)}
    ema = {"module.w": torch.full((2,), 9.0)}
    path = tmp_path / "states.pth"
    torch.save({"model": model, "ema": ema, "step": 3}, path)

    sd = load_torch_state_dict(str(path))
    np.testing.assert_allclose(sd["w"], 9.0)  # ema wins, module. stripped
    np.testing.assert_allclose(sd["b"], 2.0)

    sd = load_torch_state_dict(str(path), prefer_ema=False)
    np.testing.assert_allclose(sd["w"], 1.0)
