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
