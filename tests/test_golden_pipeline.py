"""Dry-run of the golden real-weights pipeline (VERDICT r3 item 5).

End-to-end: a synthetic reference checkpoint served over a file://
mirror -> registry fetch (md5-verified) -> converter -> generation over
the reference SDEdit dataset layout -> PSNR scoring — the exact command
a user runs the day the real .pth files land, validated here with
synthetic weights and a 2-image synthetic dataset.
"""

import hashlib
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_oracle import import_suite_module, install_reference
from sige_tpu.utils.config import AttrDict

TINY_HPARAMS = (
    "model.ch=32 model.ch_mult=1,2 model.num_res_blocks=1 "
    "model.attn_resolutions=8 model.sparse_resolution_threshold=16 "
    "data.image_size=32 "
    "sampling.sample_steps=2 sampling.noise_level=100"
)

TINY_REF_CFG = {
    "data": {"image_size": 32},
    "model": {
        "ch": 32, "ch_mult": [1, 2], "num_res_blocks": 1,
        "attn_resolutions": [8], "in_ch": 3, "out_ch": 3,
        "resamp_with_conv": True,
        "sige_block_size": {"normal": 6, "instance": 4},
        "sparse_resolution_threshold": 16,
    },
}


def _write_dataset(root):
    """Reference SDEdit layout: original/ edited/ gt/ with matching names."""
    from sige_tpu.data import save_image

    rng = np.random.default_rng(7)
    for sub in ("original", "edited", "gt"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    for name in ("000", "001"):
        x0 = rng.random((32, 32, 3)).astype(np.float32)
        x1 = x0.copy()
        x1[8:16, 10:20] = rng.random((8, 10, 3))
        save_image(os.path.join(root, "original", name + ".png"), x0)
        save_image(os.path.join(root, "edited", name + ".png"), x1)
        save_image(os.path.join(root, "gt", name + ".png"), x1)


TINY_SD_UNET_HP = ("unet.model_channels=8 unet.num_res_blocks=1 "
                   "unet.attention_resolutions=2 unet.channel_mult=1,2 "
                   "unet.num_heads=2 unet.transformer_depth=1 "
                   "unet.context_dim=16 unet.num_groups=4 "
                   "unet.main_block_size=2 unet.shortcut_block_size=2 "
                   "unet.transformer_block_size=2 "
                   "vae.ch=8 vae.ch_mult=1,2 vae.num_res_blocks=1 "
                   "vae.num_groups=4 run.mask_min_res=4")


def _tiny_sd_ckpt(path):
    """Synthesize a tiny sd-v1-4-style lightning checkpoint whose shapes
    match TINY_SD_UNET_HP, via the independent inverse key mappings in
    test_convert_sd (the same bijection the converter tests pin)."""
    import flax
    import jax
    import jax.numpy as jnp

    from test_convert_sd import _leaf_to_torch, _unet_torch_key, _vae_sd

    from sige_tpu.models.sd import (SDUNetConfig, SDVAEConfig, SIGEDecoder,
                                    SIGEEncoder, SIGESDUNet)
    from sige_tpu.nn.module import SIGECtx

    unet_cfg = SDUNetConfig(
        in_channels=4, model_channels=8, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2), num_heads=2,
        transformer_depth=1, context_dim=16, num_groups=4,
        main_block_size=2, shortcut_block_size=2, transformer_block_size=2)
    vae_cfg = SDVAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                          attn_resolutions=(), z_channels=4, resolution=16,
                          num_groups=4)

    sd = {}
    unet = SIGESDUNet(cfg=unet_cfg)
    x = jnp.zeros((1, 8, 16, 4), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    c = jnp.zeros((1, 7, unet_cfg.context_dim), jnp.float32)
    up = unet.init(jax.random.key(0), x, t, c,
                   ctx=SIGECtx(mode="dense"))["params"]
    for p, leaf in flax.traverse_util.flatten_dict(up).items():
        if p[-1] in ("out_norm_scale", "out_norm_bias"):
            key = "out.0." + ("weight" if p[-1].endswith("scale") else "bias")
            sd["model.diffusion_model." + key] = np.asarray(leaf)
            continue
        suffix, arr = _leaf_to_torch(p, leaf)
        sd[f"model.diffusion_model.{_unet_torch_key(p)}.{suffix}"] = arr

    enc = SIGEEncoder(cfg=vae_cfg)
    dec = SIGEDecoder(cfg=vae_cfg)
    img = jnp.zeros((1, 16, 32, 3), jnp.float32)
    z = jnp.zeros((1, 8, 16, 4), jnp.float32)
    enc_p = enc.init(jax.random.key(1), img, ctx=SIGECtx(mode="dense"))["params"]
    dec_p = dec.init(jax.random.key(2), z, ctx=SIGECtx(mode="dense"))["params"]
    for top, params in (("encoder", enc_p), ("decoder", dec_p)):
        for k, v in _vae_sd(params, top).items():
            sd[f"first_stage_model.{top}.{k}"] = v

    rng = np.random.default_rng(9)
    zc = vae_cfg.z_channels
    sd["first_stage_model.quant_conv.weight"] = (
        0.1 * rng.standard_normal((2 * zc, 2 * zc, 1, 1)).astype(np.float32))
    sd["first_stage_model.quant_conv.bias"] = np.zeros(2 * zc, np.float32)
    sd["first_stage_model.post_quant_conv.weight"] = (
        0.1 * rng.standard_normal((zc, zc, 1, 1)).astype(np.float32))
    sd["first_stage_model.post_quant_conv.bias"] = np.zeros(zc, np.float32)

    torch.save({"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                               for k, v in sd.items()}}, str(path))


def test_golden_pipeline_sd_dry_run(tmp_path, monkeypatch, capsys):
    """The reference's SD protocol (stable-diffusion/README.md:40-54,
    121-151: one 512x1024 inpainting + two img2img examples) end to end at
    a tiny config: ckpt fetch -> convert_sd -> three named examples
    (rectangular inpainting incl.) -> PSNR vs gt."""
    H, W = 16, 32
    ckpt_path = tmp_path / "mirror" / "sd-v1-4.ckpt"
    os.makedirs(ckpt_path.parent, exist_ok=True)
    _tiny_sd_ckpt(ckpt_path)

    # reference asset layout: inpainting/{original,masks}, img2img/{original,edited}
    from sige_tpu.data import save_image

    rng = np.random.default_rng(3)
    data_root = tmp_path / "assets"
    for sub in ("inpainting/original", "inpainting/masks", "img2img/original",
                "img2img/edited", "embeddings", "gt"):
        os.makedirs(data_root / sub, exist_ok=True)
    x0 = rng.random((H, W, 3)).astype(np.float32)
    save_image(str(data_root / "inpainting/original/0.png"), x0)
    mask = np.zeros((H, W), bool)
    mask[4:10, 10:20] = True
    np.save(str(data_root / "inpainting/masks/0.npy"), mask)
    for i in range(2):
        a = rng.random((H, W, 3)).astype(np.float32)
        b = a.copy()
        b[5:11, 8:18] = rng.random((6, 10, 3))
        save_image(str(data_root / f"img2img/original/{i}.png"), a)
        save_image(str(data_root / f"img2img/edited/{i}.png"), b)
    for name in ("inpainting_0", "img2img_0", "img2img_1"):
        emb = 0.02 * rng.standard_normal((2, 77, 16)).astype(np.float32)
        np.savez(str(data_root / "embeddings" / (name + ".npz")),
                 uc=emb[:1], c=emb[1:])
        save_image(str(data_root / "gt" / (name + ".png")),
                   rng.random((H, W, 3)).astype(np.float32))

    from sige_tpu.cli.golden import main as golden_main

    monkeypatch.chdir("/root/repo")
    save_dir = tmp_path / "results"
    golden_main([
        "--family", "sd",
        "--data_root", str(data_root),
        "--save_dir", str(save_dir),
        "--checkpoint", str(ckpt_path),
        "--metrics", "psnr",
        "--",
        "--hparams", TINY_SD_UNET_HP,
        "--H", str(H), "--W", str(W),
        "--ddim_steps", "2", "--no_watermark",
    ])

    out = capsys.readouterr().out
    assert sorted(os.listdir(save_dir)) == [
        "img2img_0.png", "img2img_1.png", "inpainting_0.png"]
    assert "PSNR:" in out and "over 3 images" in out
    assert "[golden] scored: ['psnr']" in out


def test_golden_pipeline_dry_run(tmp_path, monkeypatch, capsys):
    try:
        install_reference("diffusion")
    except Exception as e:  # pragma: no cover - environment dependent
        pytest.skip(f"reference unavailable: {e}")
    RefUNet = import_suite_module(
        "diffusion", "models.ddpm_arch.sige_fused_unet").SIGEFusedUNet

    # 1. a synthetic "published checkpoint" on a file:// mirror
    torch.manual_seed(5)
    ref = RefUNet(None, AttrDict.convert(TINY_REF_CFG))
    ckpt_path = tmp_path / "mirror" / "church256-ddpm-fused_unet.pth"
    os.makedirs(ckpt_path.parent, exist_ok=True)
    torch.save(ref.state_dict(), str(ckpt_path))
    md5 = hashlib.md5(ckpt_path.read_bytes()).hexdigest()

    from sige_tpu.utils import registry as reg

    spec = reg.REGISTRY["church256-ddpm-fused_unet.pth"]
    monkeypatch.setitem(
        reg.REGISTRY, "church256-ddpm-fused_unet.pth",
        reg.CheckpointSpec(spec.name, md5, ckpt_path.as_uri(),
                           spec.converter))
    monkeypatch.setenv("SIGE_TPU_ALLOW_DOWNLOAD", "1")

    # 2. the reference dataset layout
    data_root = tmp_path / "database"
    _write_dataset(str(data_root))

    # 3. the single golden invocation: fetch -> convert -> generate -> score
    from sige_tpu.cli.golden import main as golden_main

    monkeypatch.chdir("/root/repo")  # config paths are repo-relative
    save_dir = tmp_path / "results"
    golden_main([
        "--family", "ddpm",
        "--data_root", str(data_root),
        "--save_dir", str(save_dir),
        "--pretrained_root", str(tmp_path / "pretrained"),
        "--mirror", ckpt_path.as_uri(),
        "--metrics", "psnr",
        "--",
        "--hparams", TINY_HPARAMS,
    ])

    out = capsys.readouterr().out
    # fetched through the md5-verified registry path
    assert (tmp_path / "pretrained" / "church256-ddpm-fused_unet.pth").exists()
    # generated over the dataset
    assert sorted(os.listdir(save_dir))[:2] == ["000.png", "001.png"]
    # scored against gt
    assert "PSNR:" in out and "over 2 images" in out
    assert "[golden] scored: ['psnr']" in out
