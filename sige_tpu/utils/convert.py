"""Checkpoint conversion: reference torch state dicts -> flax params.

The reference ships torch checkpoints (``church256-ddpm-fused_unet.pth``
etc.; reference: diffusion/download_helper.py:8-20) in NCHW/OIHW layout
with the FusedUNet naming scheme (reference:
diffusion/models/ddpm_arch/fused_unet.py). This module maps them onto the
NHWC/HWIO flax tree of :class:`sige_tpu.models.ddpm.SIGEFusedUNet`.

Layout rules:
  * conv weight  [O, I, kh, kw]  ->  kernel [kh, kw, I, O]
  * linear weight [O, I]         ->  kernel [I, O]
  * norms: weight/bias -> scale/bias

Also provides md5-verified checkpoint loading (the reference re-downloads
on checksum mismatch; reference: diffusion/download_helper.py:28-47 — we
only verify, no network egress here).
"""

from __future__ import annotations

import hashlib
from typing import Dict, Mapping, Tuple

import numpy as np

try:  # torch is available (CPU) in this environment; used only for .pth IO
    import torch
except ImportError:  # pragma: no cover
    torch = None


def md5_file(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def load_torch_state_dict(path: str, md5: str | None = None,
                          prefer_ema: bool = True) -> Dict[str, np.ndarray]:
    """Read a reference .pth into {name: np.ndarray}.

    Handles the reference's container formats: lightning ``state_dict``
    wrappers, and diffusion training states ``{"model": ..., "ema": ...}``
    (reference: diffusion/runner.py:74-86) — with ``prefer_ema`` the EMA
    shadow params overlay the live ones, matching ``config.model.ema``
    inference.
    """
    if torch is None:
        raise RuntimeError("torch unavailable; cannot read .pth checkpoints")
    if md5 is not None:
        got = md5_file(path)
        if got != md5:
            raise ValueError(f"checkpoint md5 mismatch: {got} != {md5}")
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if (isinstance(sd, dict) and isinstance(sd.get("model"), dict)
            and not hasattr(sd["model"], "numpy")):
        base = dict(sd["model"])
        if prefer_ema and isinstance(sd.get("ema"), dict):
            base.update(sd["ema"])
        sd = base
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k.removeprefix("module.")] = v.detach().cpu().numpy()
    return out


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))  # OI -> IO


def convert_ddpm_fused_unet(
    sd: Mapping[str, np.ndarray],
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4),
    num_res_blocks: int = 2,
    attn_resolutions: Tuple[int, ...] = (16,),
    resolution: int = 256,
) -> Dict:
    """Map a reference FusedUNet/SIGEFusedUNet state dict onto our param
    tree (nested dict ready for ``flax.traverse_util.unflatten_dict``
    consumers).

    The reference's fused temb projection (``temb.dense.2``) maps directly
    onto our fused ``temb_proj`` — slice order (down, mid, up traversal)
    matches (reference: fused_unet.py:262-295).
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path: str, arr: np.ndarray):
        flat[tuple(path.split("/"))] = arr

    def conv_pair(src: str, dst: str):
        put(f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def norm_pair(src: str, dst: str):
        put(f"{dst}/scale", sd[f"{src}.weight"])
        put(f"{dst}/bias", sd[f"{src}.bias"])

    def linear_pair(src: str, dst: str):
        put(f"{dst}/kernel", _linear(sd[f"{src}.weight"]))
        put(f"{dst}/bias", sd[f"{src}.bias"])

    def resblock(src: str, dst: str):
        norm_pair(f"{src}.norm1", f"{dst}/norm1")
        conv_pair(f"{src}.conv1", f"{dst}/conv1")
        norm_pair(f"{src}.norm2", f"{dst}/norm2")
        conv_pair(f"{src}.conv2", f"{dst}/conv2")
        if f"{src}.nin_shortcut.weight" in sd:
            conv_pair(f"{src}.nin_shortcut", f"{dst}/nin_shortcut")
        if f"{src}.conv_shortcut.weight" in sd:
            conv_pair(f"{src}.conv_shortcut", f"{dst}/conv_shortcut")

    def attnblock(src: str, dst: str):
        norm_pair(f"{src}.norm", f"{dst}/norm")
        conv_pair(f"{src}.qkv", f"{dst}/qkv")
        conv_pair(f"{src}.proj_out", f"{dst}/proj_out")

    linear_pair("temb.dense.0", "temb_dense0")
    linear_pair("temb.dense.1", "temb_dense1")
    linear_pair("temb.dense.2", "temb_proj")
    conv_pair("conv_in", "conv_in")

    nres = len(ch_mult)
    curr_res = resolution
    for i in range(nres):
        for b in range(num_res_blocks):
            resblock(f"down.{i}.block.{b}", f"down_blocks_{i}_{b}")
            if curr_res in attn_resolutions:
                attnblock(f"down.{i}.attn.{b}", f"down_attns_{i}_{b}")
        if i != nres - 1:
            # vanilla Downsample keeps conv at .downsample.conv; the SIGE
            # variant too — both map to our downsamples_{i}/conv
            key = f"down.{i}.downsample.conv"
            conv_pair(key, f"downsamples_{i}/conv")
            curr_res //= 2

    resblock("mid.block_1", "mid_block1")
    attnblock("mid.attn_1", "mid_attn")
    resblock("mid.block_2", "mid_block2")

    for i in reversed(range(nres)):
        for b in range(num_res_blocks + 1):
            resblock(f"up.{i}.block.{b}", f"up_blocks_{i}_{b}")
            if curr_res in attn_resolutions:
                attnblock(f"up.{i}.attn.{b}", f"up_attns_{i}_{b}")
        if i != 0:
            conv_pair(f"up.{i}.upsample.conv", f"upsamples_{i - 1}/conv")
            curr_res *= 2

    put("norm_out_scale", sd["norm_out.weight"])
    put("norm_out_bias", sd["norm_out.bias"])
    conv_pair("conv_out", "conv_out")

    import flax

    return flax.traverse_util.unflatten_dict(flat)


def convert_ddpm_vanilla_unet(
    sd: Mapping[str, np.ndarray],
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4),
    num_res_blocks: int = 2,
    attn_resolutions: Tuple[int, ...] = (16,),
    resolution: int = 256,
    fuse: bool = False,
) -> Dict:
    """Map a *vanilla* UNet state dict (``church256-ddpm-unet.pth``;
    reference: diffusion/models/ddpm_arch/unet.py:140-238 — per-resblock
    ``temb_proj`` linears, separate q/k/v attention convs) onto either

      * ``fuse=False``: the :class:`~sige_tpu.models.ddpm.VanillaDDPMUNet`
        param tree, or
      * ``fuse=True``: the :class:`~sige_tpu.models.ddpm.SIGEFusedUNet`
        tree, concatenating the per-block temb projections into one fused
        ``temb_proj`` (traversal order down -> mid -> up) and q/k/v into
        ``qkv`` — the reference's ``FusedUNet.from_unet`` weight surgery
        (reference: fused_unet.py:306-355,125-138).
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path: str, arr: np.ndarray):
        flat[tuple(path.split("/"))] = arr

    def conv_pair(src: str, dst: str):
        put(f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def norm_pair(src: str, dst: str):
        put(f"{dst}/scale", sd[f"{src}.weight"])
        put(f"{dst}/bias", sd[f"{src}.bias"])

    def linear_pair(src: str, dst: str):
        put(f"{dst}/kernel", _linear(sd[f"{src}.weight"]))
        put(f"{dst}/bias", sd[f"{src}.bias"])

    temb_w, temb_b = [], []  # fused temb_proj accumulators (OI chunks)

    def resblock(src: str, dst: str):
        norm_pair(f"{src}.norm1", f"{dst}/norm1")
        conv_pair(f"{src}.conv1", f"{dst}/conv1")
        if fuse:
            temb_w.append(sd[f"{src}.temb_proj.weight"])
            temb_b.append(sd[f"{src}.temb_proj.bias"])
        else:
            linear_pair(f"{src}.temb_proj", f"{dst}/temb_proj")
        norm_pair(f"{src}.norm2", f"{dst}/norm2")
        conv_pair(f"{src}.conv2", f"{dst}/conv2")
        if f"{src}.nin_shortcut.weight" in sd:
            conv_pair(f"{src}.nin_shortcut", f"{dst}/nin_shortcut")
        if f"{src}.conv_shortcut.weight" in sd:
            conv_pair(f"{src}.conv_shortcut", f"{dst}/conv_shortcut")

    def attnblock(src: str, dst: str):
        norm_pair(f"{src}.norm", f"{dst}/norm")
        if fuse:
            put(f"{dst}/qkv/kernel", _conv(np.concatenate(
                [sd[f"{src}.q.weight"], sd[f"{src}.k.weight"],
                 sd[f"{src}.v.weight"]], axis=0)))
            put(f"{dst}/qkv/bias", np.concatenate(
                [sd[f"{src}.q.bias"], sd[f"{src}.k.bias"],
                 sd[f"{src}.v.bias"]], axis=0))
        else:
            for p in ("q", "k", "v"):
                conv_pair(f"{src}.{p}", f"{dst}/{p}")
        conv_pair(f"{src}.proj_out", f"{dst}/proj_out")

    linear_pair("temb.dense.0", "temb_dense0")
    linear_pair("temb.dense.1", "temb_dense1")
    conv_pair("conv_in", "conv_in")

    nres = len(ch_mult)
    curr_res = resolution
    for i in range(nres):
        for b in range(num_res_blocks):
            resblock(f"down.{i}.block.{b}", f"down_blocks_{i}_{b}")
            if curr_res in attn_resolutions:
                attnblock(f"down.{i}.attn.{b}", f"down_attns_{i}_{b}")
        if i != nres - 1:
            conv_pair(f"down.{i}.downsample.conv", f"downsamples_{i}/conv")
            curr_res //= 2

    resblock("mid.block_1", "mid_block1")
    attnblock("mid.attn_1", "mid_attn")
    resblock("mid.block_2", "mid_block2")

    for i in reversed(range(nres)):
        for b in range(num_res_blocks + 1):
            resblock(f"up.{i}.block.{b}", f"up_blocks_{i}_{b}")
            if curr_res in attn_resolutions:
                attnblock(f"up.{i}.attn.{b}", f"up_attns_{i}_{b}")
        if i != 0:
            conv_pair(f"up.{i}.upsample.conv", f"upsamples_{i - 1}/conv")
            curr_res *= 2

    if fuse:
        put("temb_proj/kernel", _linear(np.concatenate(temb_w, axis=0)))
        put("temb_proj/bias", np.concatenate(temb_b, axis=0))
        put("norm_out_scale", sd["norm_out.weight"])
        put("norm_out_bias", sd["norm_out.bias"])
    else:
        norm_pair("norm_out", "norm_out")
    conv_pair("conv_out", "conv_out")

    import flax

    return flax.traverse_util.unflatten_dict(flat)


def convert_ddpm_unet_to_fused(sd, **kw) -> Dict:
    """Vanilla UNet state dict -> :class:`SIGEFusedUNet` params
    (reference ``FusedUNet.from_unet``; fused_unet.py:306-355)."""
    return convert_ddpm_vanilla_unet(sd, fuse=True, **kw)


def assert_params_match(converted: Mapping, target: Mapping) -> None:
    """Verify the converted tree has exactly the target tree's structure
    and shapes (catches naming drift early)."""
    import flax

    a = flax.traverse_util.flatten_dict(dict(converted))
    b = flax.traverse_util.flatten_dict(dict(target))
    missing = set(b) - set(a)
    extra = set(a) - set(b)
    if missing or extra:
        raise ValueError(
            f"param mismatch: missing={sorted('/'.join(k) for k in missing)[:8]} "
            f"extra={sorted('/'.join(k) for k in extra)[:8]}"
        )
    for k in b:
        if tuple(np.shape(a[k])) != tuple(np.shape(b[k])):
            raise ValueError(
                f"shape mismatch at {'/'.join(k)}: "
                f"{np.shape(a[k])} vs {np.shape(b[k])}"
            )


def convert_gaugan_fused_spade(
    sd: Mapping[str, np.ndarray],
    num_upsampling_layers: str = "more",
) -> Dict:
    """Map a reference FusedSPADE/SIGEFusedSPADE generator state dict
    (``fused_spade.pth``) onto the
    :class:`sige_tpu.models.gaugan.SIGEFusedSPADEGenerator` param tree
    (reference: gaugan/models/spade_generators/fused_spade_generator.py —
    the SIGE checkpoint format).
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path: str, arr: np.ndarray):
        flat[tuple(path.split("/"))] = arr

    def conv_pair(src: str, dst: str):
        put(f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def norm(src: str, dst: str):
        put(f"{dst}/running_mean", sd[f"{src}.param_free_norm.running_mean"])
        put(f"{dst}/running_var", sd[f"{src}.param_free_norm.running_var"])
        conv_pair(f"{src}.mlp_gamma_beta", f"{dst}/mlp_gamma_beta")

    def block(src: str, dst: str, learned_shortcut: bool):
        conv_pair(f"{src}.mlp_shared.0", f"{dst}/mlp_shared")
        conv_pair(f"{src}.conv_0", f"{dst}/conv_0")
        conv_pair(f"{src}.conv_1", f"{dst}/conv_1")
        norm(f"{src}.norm_0", f"{dst}/norm_0")
        norm(f"{src}.norm_1", f"{dst}/norm_1")
        if learned_shortcut:
            conv_pair(f"{src}.conv_s", f"{dst}/conv_s")
            norm(f"{src}.norm_s", f"{dst}/norm_s")

    conv_pair("fc", "fc")
    names = ["head_0", "G_middle_0", "G_middle_1",
             "up_0", "up_1", "up_2", "up_3"]
    shortcut = [False, False, False, True, True, True, True]
    if num_upsampling_layers == "most":
        names.append("up_4")
        shortcut.append(True)
    for name, sc in zip(names, shortcut):
        block(name, name, sc)
    conv_pair("conv_img", "conv_img")

    import flax

    return flax.traverse_util.unflatten_dict(flat)


def _spade_block_names(num_upsampling_layers: str):
    names = ["head_0", "G_middle_0", "G_middle_1",
             "up_0", "up_1", "up_2", "up_3"]
    shortcut = [False, False, False, True, True, True, True]
    if num_upsampling_layers == "most":
        names.append("up_4")
        shortcut.append(True)
    return names, shortcut


def convert_gaugan_spade(
    sd: Mapping[str, np.ndarray],
    num_upsampling_layers: str = "more",
    fuse: bool = False,
) -> Dict:
    """Map a *vanilla* SPADE generator state dict (``spade.pth``;
    reference: gaugan/models/spade_generators/spade_generator.py:66,
    normalization.py:92-131 — per-norm mlp_shared/mlp_gamma/mlp_beta)
    onto either

      * ``fuse=False``: the :class:`VanillaSPADEGenerator` param tree, or
      * ``fuse=True``: the :class:`SIGEFusedSPADEGenerator` tree,
        concatenating the per-norm ``mlp_shared`` convs across branches
        and γ/β into ``mlp_gamma_beta`` — the reference's
        ``FusedSPADEResnetBlock.from_SPADEResnetBlock`` weight surgery
        (reference: fused_spade_generator.py:72-160).
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path: str, arr: np.ndarray):
        flat[tuple(path.split("/"))] = arr

    def conv_pair(src: str, dst: str):
        put(f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def norm(src: str, dst: str):
        put(f"{dst}/running_mean", sd[f"{src}.param_free_norm.running_mean"])
        put(f"{dst}/running_var", sd[f"{src}.param_free_norm.running_var"])
        if fuse:
            put(f"{dst}/mlp_gamma_beta/kernel", _conv(np.concatenate(
                [sd[f"{src}.mlp_gamma.weight"],
                 sd[f"{src}.mlp_beta.weight"]], axis=0)))
            put(f"{dst}/mlp_gamma_beta/bias", np.concatenate(
                [sd[f"{src}.mlp_gamma.bias"], sd[f"{src}.mlp_beta.bias"]]))
        else:
            conv_pair(f"{src}.mlp_shared.0", f"{dst}/mlp_shared")
            conv_pair(f"{src}.mlp_gamma", f"{dst}/mlp_gamma")
            conv_pair(f"{src}.mlp_beta", f"{dst}/mlp_beta")

    def block(src: str, dst: str, learned_shortcut: bool):
        branches = ["norm_0", "norm_1"] + (["norm_s"] if learned_shortcut else [])
        if fuse:
            put(f"{dst}/mlp_shared/kernel", _conv(np.concatenate(
                [sd[f"{src}.{b}.mlp_shared.0.weight"] for b in branches], axis=0)))
            put(f"{dst}/mlp_shared/bias", np.concatenate(
                [sd[f"{src}.{b}.mlp_shared.0.bias"] for b in branches]))
        conv_pair(f"{src}.conv_0", f"{dst}/conv_0")
        conv_pair(f"{src}.conv_1", f"{dst}/conv_1")
        norm(f"{src}.norm_0", f"{dst}/norm_0")
        norm(f"{src}.norm_1", f"{dst}/norm_1")
        if learned_shortcut:
            conv_pair(f"{src}.conv_s", f"{dst}/conv_s")
            norm(f"{src}.norm_s", f"{dst}/norm_s")

    conv_pair("fc", "fc")
    names, shortcut = _spade_block_names(num_upsampling_layers)
    for name, sc in zip(names, shortcut):
        block(name, name, sc)
    conv_pair("conv_img", "conv_img")

    import flax

    return flax.traverse_util.unflatten_dict(flat)


def sub_mobile_block_dims(channels, ngf: int = 64):
    """Per-block (ic, channel, hidden, learned_shortcut) for a decoded
    sub-mobile ``config_str`` (reference:
    sub_mobile_spade_generator.py:64-120 channel threading)."""
    ch = list(channels)
    dims = {
        "head_0": (ch[0] * 16, ch[1] * 16, ch[1] * 2, False),
        "G_middle_0": (ch[0] * 16, ch[2] * 16, ch[2] * 2, False),
        "G_middle_1": (ch[0] * 16, ch[3] * 16, ch[3] * 2, False),
        "up_0": (ch[0] * 16, ch[4] * 8, ch[4] * 2, True),
        "up_1": (ch[4] * 8, ch[5] * 4, ch[5] * 2, True),
        "up_2": (ch[5] * 4, ch[6] * 2, ch[6] * 2, True),
        "up_3": (ch[6] * 2, ch[7], ch[7] * 2, True),
    }
    return dims


def convert_gaugan_sub_mobile_spade(
    sd: Mapping[str, np.ndarray],
    channels=(32, 32, 32, 48, 32, 24, 24, 32),
    ngf: int = 64,
    fused_ckpt: bool = True,
) -> Dict:
    """Map a GAN-Compression sub-mobile SPADE state dict onto the
    :class:`SIGESubMobileSPADEGenerator` param tree.

    ``fused_ckpt=True`` reads ``fused_sub_mobile_spade-*.pth`` (per-block
    ``mlp_shared``; reference: fused_sub_mobile_spade_generator.py:37);
    ``fused_ckpt=False`` reads the unfused ``sub_mobile_spade-*.pth`` and
    performs the mlp_shared concatenation surgery (reference:
    fused_sub_mobile_spade_generator.py:77-133).

    The checkpoints store ``param_free_norm`` running stats at the
    *nominal* (uncompressed) width; they are truncated to the compressed
    channel count exactly like the reference's ``load_network``
    (reference: gaugan/utils.py:20-33).
    """
    flat: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path: str, arr: np.ndarray):
        flat[tuple(path.split("/"))] = arr

    def conv_pair(src: str, dst: str):
        put(f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def separable(src: str, dst: str):
        # SeparableConv2d = Sequential(dw conv, InstanceNorm(no params), pw)
        # (reference: gaugan/models/mobile_modules.py:28-63)
        conv_pair(f"{src}.conv.0", f"{dst}/dw")
        conv_pair(f"{src}.conv.2", f"{dst}/pw")

    def norm(src: str, dst: str, oc: int):
        put(f"{dst}/running_mean",
            sd[f"{src}.param_free_norm.running_mean"][:oc])
        put(f"{dst}/running_var",
            sd[f"{src}.param_free_norm.running_var"][:oc])
        separable(f"{src}.mlp_gamma", f"{dst}/mlp_gamma")
        separable(f"{src}.mlp_beta", f"{dst}/mlp_beta")

    def block(src: str, dst: str, ic: int, channel: int, learned_shortcut: bool):
        branches = ["norm_0", "norm_1"] + (["norm_s"] if learned_shortcut else [])
        if fused_ckpt:
            conv_pair(f"{src}.mlp_shared.0", f"{dst}/mlp_shared")
        else:
            put(f"{dst}/mlp_shared/kernel", _conv(np.concatenate(
                [sd[f"{src}.{b}.mlp_shared.0.weight"] for b in branches], axis=0)))
            put(f"{dst}/mlp_shared/bias", np.concatenate(
                [sd[f"{src}.{b}.mlp_shared.0.bias"] for b in branches]))
        conv_pair(f"{src}.conv_0", f"{dst}/conv_0")
        conv_pair(f"{src}.conv_1", f"{dst}/conv_1")
        norm(f"{src}.norm_0", f"{dst}/norm_0", ic)
        norm(f"{src}.norm_1", f"{dst}/norm_1", channel)
        if learned_shortcut:
            conv_pair(f"{src}.conv_s", f"{dst}/conv_s")
            norm(f"{src}.norm_s", f"{dst}/norm_s", ic)

    conv_pair("fc", "fc")
    for name, (ic, channel, _hidden, sc) in sub_mobile_block_dims(
            channels, ngf).items():
        block(name, name, ic, channel, sc)
    conv_pair("conv_img", "conv_img")

    import flax

    return flax.traverse_util.unflatten_dict(flat)


def convert_pd_unet(
    sd: Mapping[str, np.ndarray],
    ch_mult: Tuple[int, ...] = (1, 1, 2, 4, 6, 8),
    num_res_blocks: int = 3,
    attn_resolutions: Tuple[int, ...] = (8, 16, 32),
    resolution: int = 256,
) -> Dict:
    """Map a reference PD UNet state dict (``church128-pd-unet.pth`` style;
    reference: diffusion/models/pd_arch/unet.py) onto
    :class:`sige_tpu.models.pd.SIGEPDUNet`."""
    flat: Dict[Tuple[str, ...], np.ndarray] = {}

    def put(path: str, arr: np.ndarray):
        flat[tuple(path.split("/"))] = arr

    def conv_pair(src: str, dst: str):
        put(f"{dst}/kernel", _conv(sd[f"{src}.weight"]))
        if f"{src}.bias" in sd:
            put(f"{dst}/bias", sd[f"{src}.bias"])

    def norm_pair(src: str, dst: str):
        put(f"{dst}/scale", sd[f"{src}.weight"])
        put(f"{dst}/bias", sd[f"{src}.bias"])

    def linear_pair(src: str, dst: str):
        put(f"{dst}/kernel", _linear(sd[f"{src}.weight"]))
        put(f"{dst}/bias", sd[f"{src}.bias"])

    def resblock(src: str, dst: str):
        norm_pair(f"{src}.norm1", f"{dst}/norm1")
        conv_pair(f"{src}.conv1", f"{dst}/conv1")
        linear_pair(f"{src}.temb_proj", f"{dst}/temb_proj")
        norm_pair(f"{src}.norm2", f"{dst}/norm2")
        conv_pair(f"{src}.conv2", f"{dst}/conv2")
        if f"{src}.nin_shortcut.weight" in sd:
            conv_pair(f"{src}.nin_shortcut", f"{dst}/nin_shortcut")

    def attnblock(src: str, dst: str):
        norm_pair(f"{src}.norm", f"{dst}/norm")
        conv_pair(f"{src}.qkv", f"{dst}/qkv")
        conv_pair(f"{src}.proj_out", f"{dst}/proj_out")

    linear_pair("temb.dense.0", "temb_dense0")
    linear_pair("temb.dense.1", "temb_dense1")
    conv_pair("conv_in", "conv_in")

    nres = len(ch_mult)
    curr_res = resolution
    for i in range(nres):
        for b in range(num_res_blocks):
            resblock(f"down.{i}.block.{b}", f"down_blocks_{i}_{b}")
            if curr_res in attn_resolutions:
                attnblock(f"down.{i}.attn.{b}", f"down_attns_{i}_{b}")
        if i != nres - 1:
            resblock(f"down.{i}.downsample", f"downsamples_{i}")
            curr_res //= 2

    resblock("mid.block_1", "mid_block1")
    attnblock("mid.attn_1", "mid_attn")
    resblock("mid.block_2", "mid_block2")

    for i in reversed(range(nres)):
        for b in range(num_res_blocks + 1):
            resblock(f"up.{i}.block.{b}", f"up_blocks_{i}_{b}")
            if curr_res in attn_resolutions:
                attnblock(f"up.{i}.attn.{b}", f"up_attns_{i}_{b}")
        if i != 0:
            resblock(f"up.{i}.upsample", f"upsamples_{i - 1}")
            curr_res *= 2

    put("norm_out_scale", sd["norm_out.weight"])
    put("norm_out_bias", sd["norm_out.bias"])
    conv_pair("conv_out", "conv_out")

    import flax

    return flax.traverse_util.unflatten_dict(flat)
