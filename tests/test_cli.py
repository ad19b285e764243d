"""Smoke tests for the suite CLIs (reference: diffusion/test.py,
gaugan/test.py): argument parsing, --hparams dot-overrides, synthetic
profile/generate flows, and the per-image log-line format — with tiny
model shapes via overrides so the whole CLI path runs in seconds."""

import sys

import pytest

DDPM_TINY_HPARAMS = (
    "model.ch=16 model.ch_mult=1,2 model.num_res_blocks=1 "
    "model.attn_resolutions=16 model.sparse_resolution_threshold=32 "
    "model.num_groups=8 data.image_size=32 "
    "sampling.sample_steps=2 sampling.noise_level=100"
)


def _run_cli(monkeypatch, main, argv):
    monkeypatch.setattr(sys, "argv", ["cli", *argv])
    main()


def test_diffusion_cli_profile_synthetic(monkeypatch, capsys):
    from sige_tpu.cli import diffusion

    _run_cli(monkeypatch, diffusion.main, [
        "--config_path", "configs/church_ddpm256-sige.yml",
        "--mode", "profile", "--synthetic",
        "--hparams", DDPM_TINY_HPARAMS,
        "--warmup_times", "1", "--test_times", "2"])
    out = capsys.readouterr().out
    assert "Sparsity" in out and "MACs" in out and "Avg Time" in out


def test_diffusion_cli_generate_synthetic_saves(monkeypatch, capsys,
                                                tmp_path):
    from sige_tpu.cli import diffusion

    _run_cli(monkeypatch, diffusion.main, [
        "--config_path", "configs/church_ddpm256-sige.yml",
        "--mode", "generate", "--synthetic",
        "--hparams", DDPM_TINY_HPARAMS,
        "--save_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "Edit Ratio" in out
    assert list(tmp_path.glob("**/*.png")), "generate must save an image"


def test_gaugan_cli_profile_synthetic(monkeypatch, capsys):
    from sige_tpu.cli import gaugan

    _run_cli(monkeypatch, gaugan.main, [
        "--netG", "sige_fused_spade", "--mode", "profile", "--synthetic",
        "--ngf", "16", "--crop_size", "128", "--num_sparse_layers", "2",
        "--warmup_times", "1", "--test_times", "2"])
    out = capsys.readouterr().out
    assert "MACs" in out and "Avg Time" in out


def test_diffusion_cli_hparams_override_applied(monkeypatch):
    """The dot-override parser must actually reshape the model (a wrong
    silent no-op would make every tiny smoke above meaningless)."""
    from sige_tpu.utils.config import load_config, override_config

    config = load_config("configs/church_ddpm256-sige.yml")
    override_config(config, DDPM_TINY_HPARAMS)
    assert config.model.ch == 16
    assert list(config.model.ch_mult) == [1, 2]
    assert list(config.model.attn_resolutions) == [16]
    assert config.data.image_size == 32
    assert config.sampling.sample_steps == 2
