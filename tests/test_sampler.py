"""Sampler + runner tests on a tiny model / short schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.models.ddpm import DDPMUNetConfig
from sige_tpu.runners import DiffusionRunConfig, DiffusionRunner
from sige_tpu.samplers import DiffusionSchedule, get_sampling_sequence

TINY_MODEL = DDPMUNetConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
    resolution=32, sparse_resolution_threshold=32,
)
TINY_RUN = DiffusionRunConfig(
    sampler_type="ddim", total_steps=100, sample_steps=8, noise_level=40,
    mask_dilate_radius=2,
)


def test_schedule_matches_reference_semantics():
    s = DiffusionSchedule.create("linear", 1e-4, 2e-2, 100)
    # alpha(-1) == 1 (the reference pads beta with a leading zero)
    assert float(s.alpha(-1)) == 1.0
    a0 = float(s.alpha(0))
    np.testing.assert_allclose(a0, 1 - 1e-4, rtol=1e-6)
    seq = get_sampling_sequence(8, 40)
    assert seq.tolist() == list(range(0, 40, 5))
    quad = get_sampling_sequence(8, 40, "quad")
    assert quad[-1] == 40 and len(quad) == 8


@pytest.mark.parametrize("sampler_type", ["ddim", "ddpm"])
def test_generate_end_to_end(sampler_type):
    rng = np.random.default_rng(0)
    run_cfg = DiffusionRunConfig(
        sampler_type=sampler_type, total_steps=100, sample_steps=6,
        noise_level=30, mask_dilate_radius=2)
    runner = DiffusionRunner(TINY_MODEL, run_cfg, seed=0)

    original = rng.random((32, 32, 3)).astype(np.float32)
    edited = original.copy()
    edited[10:18, 12:20] = rng.random((8, 8, 3)).astype(np.float32)

    out = runner.generate(original, edited, seed=1)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()
    # Outside the (dilated) mask, SDEdit blending pins the result to the
    # ground-truth trajectory, which at t=-1 is exactly the original image
    # (reference: base_sampler.py:36-49 + alpha(-1)=1).
    from sige_tpu.core.masks import compute_difference_mask, dilate_mask
    mask = dilate_mask(
        compute_difference_mask(2 * original - 1, 2 * edited - 1, eps=1e-2), 2)
    outside = ~mask
    np.testing.assert_allclose(
        out[outside], np.clip(original, 0, 1)[outside], atol=1e-5)
    # Inside the mask something was generated (not just the edit passthrough)
    assert np.abs(out[mask] - edited[mask]).mean() > 1e-3


def test_profile_reports(capsys):
    rng = np.random.default_rng(0)
    runner = DiffusionRunner(TINY_MODEL, TINY_RUN, seed=0)
    original = rng.random((32, 32, 3)).astype(np.float32)
    edited = original.copy()
    edited[12:16, 12:16] = 0.0
    stats_sparse = runner.profile(original, edited, warmup=2, iters=5)
    stats_dense = runner.profile(original, edited, warmup=2, iters=5, mode="dense")
    assert stats_sparse["macs_g"] < stats_dense["macs_g"]
    assert stats_sparse["latency_ms"] > 0
    assert 0 < stats_sparse["edit_ratio"] < 0.2


def test_dpm_solver_generate():
    """DPM-Solver++ order-2 with 5 steps (the reference's dpmsolver256
    config uses exactly this; reference: configs/church_dpmsolver256-sige.yml)."""
    rng = np.random.default_rng(2)
    run_cfg = DiffusionRunConfig(
        sampler_type="dpm_solver", total_steps=1000, sample_steps=5,
        noise_level=500, mask_dilate_radius=2)
    runner = DiffusionRunner(TINY_MODEL, run_cfg, seed=0)
    original = rng.random((32, 32, 3)).astype(np.float32)
    edited = original.copy()
    edited[10:18, 12:20] = rng.random((8, 8, 3)).astype(np.float32)
    out = runner.generate(original, edited, seed=3)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()
    from sige_tpu.core.masks import compute_difference_mask, dilate_mask
    mask = dilate_mask(
        compute_difference_mask(2 * original - 1, 2 * edited - 1, eps=1e-2), 2)
    np.testing.assert_allclose(
        out[~mask], np.clip(original, 0, 1)[~mask], atol=1e-5)


def test_dpm_solver_matches_reference_coefficient_semantics():
    """The discrete VP schedule's lambda/alpha/sigma at integer timesteps
    must match a direct float64 computation from the betas."""
    from sige_tpu.samplers.dpm_solver import _DiscreteVPSchedule
    from sige_tpu.samplers import get_beta_schedule
    betas = get_beta_schedule("linear", 1e-4, 2e-2, 1000)
    ns = _DiscreteVPSchedule(betas)
    # at the exact grid point t_array[i], log_alpha == 0.5*cumsum(log(1-b))[i]
    la = 0.5 * np.cumsum(np.log(1 - betas))
    for i in [0, 10, 499, 999]:
        if i < ns.total_N:
            t = ns.t_array[i]
            np.testing.assert_allclose(ns.log_alpha(t), la[i], rtol=1e-10)
    # t -> continuous mapping
    s = _DiscreteVPSchedule(betas)
    assert abs((0 + 1) / 1000 + 1 / s.total_N - s.t_array[0] - 1 / 1000) < 1e-12
