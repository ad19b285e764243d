"""Config / EMA / registry / data utilities."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.utils.config import AttrDict, instantiate, load_config, override_config, parse_value
from sige_tpu.utils.ema import ema_init, ema_update
from sige_tpu.utils.html import write_gallery
from sige_tpu.utils.registry import REGISTRY, fetch


def test_load_and_override(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("model:\n  ch: 128\n  mult: [1, 2]\nsampling:\n  eps: 0.01\n")
    cfg = load_config(str(p))
    assert cfg.model.ch == 128
    override_config(cfg, "model.ch=64 sampling.eps=0.02 model.mult=4,8 new.flag=true")
    assert cfg.model.ch == 64
    assert cfg.sampling.eps == 0.02
    assert cfg.model.mult == [4, 8]
    assert cfg.new.flag is True


def test_parse_value_semantics():
    assert parse_value("none") is None
    assert parse_value("3") == 3
    assert parse_value("3.5") == 3.5
    assert parse_value("a,b") == ["a", "b"]
    # scalar into a list-typed original becomes a singleton list
    assert parse_value("7", original=[1, 2]) == [7]


def test_instantiate():
    geom = instantiate("sige_tpu.core.geometry.BlockGeometry",
                       block_size=(6, 6), block_stride=(4, 4), offset=(1, 1),
                       kernel_size=(3, 3), conv_stride=(1, 1))
    assert geom.out_tile_size == (4, 4)


def test_ema():
    p = {"w": jnp.ones(3)}
    s = ema_init(p)
    p2 = {"w": jnp.zeros(3)}
    s = ema_update(s, p2, rate=0.9)
    np.testing.assert_allclose(np.asarray(s["w"]), 0.9)


def test_registry_errors(tmp_path):
    with pytest.raises(FileNotFoundError) as e:
        fetch("church256-ddpm-fused_unet.pth", root=str(tmp_path))
    assert "cs.cmu.edu" in str(e.value)
    # bad checksum detected
    path = tmp_path / "church256-ddpm-fused_unet.pth"
    path.write_bytes(b"not a checkpoint")
    with pytest.raises(ValueError):
        fetch("church256-ddpm-fused_unet.pth", root=str(tmp_path))
    assert len(REGISTRY) >= 7


def test_html_gallery(tmp_path):
    from sige_tpu.data import save_image
    img = np.zeros((4, 4, 3), np.float32)
    p1 = str(tmp_path / "imgs" / "a.png")
    save_image(p1, img)
    out = str(tmp_path / "index.html")
    write_gallery(out, [{"name": "a", "generated": p1}])
    text = open(out).read()
    assert "<img" in text and "a.png" in text


def test_image_roundtrip(tmp_path):
    from sige_tpu.data import load_image, save_image
    rng = np.random.default_rng(0)
    img = rng.random((8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_image(p, img)
    back = load_image(p)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


def test_datasets(tmp_path):
    from sige_tpu.data import CityscapesEditDataset, SDEditDataset, save_image
    # SDEdit layout
    rng = np.random.default_rng(0)
    for d in ("original", "edited"):
        save_image(str(tmp_path / d / "img1.png"), rng.random((8, 8, 3)))
    ds = SDEditDataset(str(tmp_path))
    assert len(ds) == 1 and ds[0]["original"].shape == (8, 8, 3)
    # cityscapes-edit layout
    np.save(tmp_path / "g_l.npy", np.zeros((4, 8), np.int64))
    np.save(tmp_path / "g_i.npy", np.zeros((4, 8), np.int64))
    np.save(tmp_path / "s_l.npy", np.ones((4, 8), np.int64))
    np.save(tmp_path / "s_i.npy", np.ones((4, 8), np.int64))
    (tmp_path / "meta.csv").write_text(
        "id,gt_label,gt_instance,synthetic_label,synthetic_instance\n"
        "1,g_l.npy,g_i.npy,s_l.npy,s_i.npy\n")
    cds = CityscapesEditDataset(str(tmp_path))
    assert len(cds) == 2  # symmetric editing doubles
    assert cds[0]["original_label"].sum() == 0
    assert cds[1]["original_label"].sum() == 32  # swapped


def test_native_checkpoint_roundtrip(tmp_path):
    """Converted params save/load through orbax (SURVEY section 5:
    the TPU-native replacement for torch.load-only checkpointing)."""
    import jax.numpy as jnp

    from sige_tpu.utils.checkpoint import (load_params, maybe_load_native,
                                           save_params)

    params = {"block": {"w": jnp.arange(12.0).reshape(3, 4),
                        "b": jnp.zeros((4,))},
              "scale": jnp.float32(2.5)}
    path = save_params(str(tmp_path / "ckpt"), params)
    got = load_params(path)
    np.testing.assert_allclose(np.asarray(got["block"]["w"]),
                               np.asarray(params["block"]["w"]))
    np.testing.assert_allclose(float(got["scale"]), 2.5)

    # the CLI dispatcher: directory -> native load, file/None -> None
    assert maybe_load_native(path) is not None
    assert maybe_load_native(None) is None
    assert maybe_load_native(str(tmp_path / "missing.pth")) is None


def test_registry_download_file_mirror(tmp_path, monkeypatch):
    """The download+resume+md5-retry path, exercised against a local
    file:// mirror (reference: diffusion/download_helper.py:28-47)."""
    import hashlib

    from sige_tpu.utils import registry as reg

    payload = b"sige-tpu checkpoint payload" * 100
    mirror = tmp_path / "mirror.pth"
    mirror.write_bytes(payload)
    md5 = hashlib.md5(payload).hexdigest()
    spec = reg.CheckpointSpec("mirror.pth", md5, mirror.as_uri(), "x")
    monkeypatch.setitem(reg.REGISTRY, "mirror.pth", spec)
    root = tmp_path / "pretrained"

    # gated off by default
    with pytest.raises(RuntimeError):
        reg.download("mirror.pth", root=str(root))
    with pytest.raises(FileNotFoundError):
        reg.fetch("mirror.pth", root=str(root))

    monkeypatch.setenv("SIGE_TPU_ALLOW_DOWNLOAD", "1")
    path = reg.fetch("mirror.pth", root=str(root))
    assert open(path, "rb").read() == payload

    # corrupt local file -> re-downloaded on fetch
    with open(path, "wb") as f:
        f.write(b"corrupted")
    path2 = reg.fetch("mirror.pth", root=str(root))
    assert open(path2, "rb").read() == payload

    # mirror serving wrong bytes -> md5-retry loop raises after N tries
    mirror.write_bytes(b"wrong content")
    (root / "mirror.pth").unlink()
    with pytest.raises(ValueError, match="md5 mismatch"):
        reg.download("mirror.pth", root=str(root), tries=2)
    assert not (root / "mirror.pth").exists()

    # a stale .part file does not break a fresh download
    mirror.write_bytes(payload)
    (root / "mirror.pth.part").write_bytes(b"partial")
    path3 = reg.fetch("mirror.pth", root=str(root))
    assert open(path3, "rb").read() == payload
