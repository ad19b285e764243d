"""Progressive Distillation suite tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from sige_tpu.core.masks import compute_difference_mask, dilate_mask, downsample_mask
from sige_tpu.models.pd import PDUNetConfig, SIGEPDUNet
from sige_tpu.nn import SIGEModel
from sige_tpu.samplers import PDSampler, logsnr_schedule

TINY = PDUNetConfig(
    ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
    resolution=32, temb_ch=64, head_dim=16,
    sparse_resolution_threshold=16,
)


def test_logsnr_schedule_endpoints():
    # at u in (0, 1): monotonically decreasing from ~+20 to ~-20
    u = np.linspace(1e-4, 1 - 1e-4, 16)
    vals = np.asarray(logsnr_schedule(u))
    assert (np.diff(vals) < 0).all()
    assert vals[0] < 20.5 and vals[-1] > -20.5


def test_pd_sparse_on_original_is_exact():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    logsnr = jnp.array([1.3], jnp.float32)
    mask = np.zeros((32, 32), bool)
    mask[8:16, 10:20] = True

    model = SIGEModel(SIGEPDUNet(cfg=TINY), bucket_min=1)
    model.init(jax.random.key(0), x0, logsnr)
    y_full = model.full(x0, logsnr)
    model.set_masks(downsample_mask(dilate_mask(mask, 2), min_res=4))
    y_sparse = model.sparse(x0, logsnr)
    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_full), atol=1e-4)
    # resample-block gathers planned at the resampled resolutions
    stats = model.stats()
    assert any("downsamples" in k for k in stats), stats.keys()


def test_pd_sampler_end_to_end():
    rng = np.random.default_rng(1)
    model = SIGEModel(SIGEPDUNet(cfg=TINY), bucket_min=1)
    x0 = rng.random((1, 32, 32, 3)).astype(np.float32) * 2 - 1
    mask = np.zeros((32, 32), bool)
    mask[10:18, 12:20] = True
    x1 = x0 + rng.standard_normal((1, 32, 32, 3)).astype(np.float32) * 0.5 * mask[None, :, :, None]
    x0j, x1j = jnp.asarray(x0), jnp.asarray(x1)

    logsnr0 = jnp.array([0.0], jnp.float32)
    model.init(jax.random.key(0), x0j, logsnr0)
    model.full(x0j, logsnr0)
    model.set_masks(downsample_mask(dilate_mask(mask, 2), min_res=4))

    sampler = PDSampler(total_steps=8)
    seq = np.arange(5, dtype=np.int32)  # noise_level 5, sample_steps 5
    e = jax.random.normal(jax.random.key(2), x0j.shape)
    xts = sampler.q_sample(jnp.concatenate([x0j, x1j]), jnp.int32(seq[-1]),
                           jnp.concatenate([e, e]))
    out, cache = sampler.sample_sige(
        model.module, model.params, model.plan, model.cache, xts,
        jnp.asarray(seq), jnp.asarray(mask), x0j, e)
    out = np.asarray(out)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()
    # outside the mask the edited row is pinned to the gt trajectory at
    # t=-1: q_sample(x0, -1) = logsnr(0) ~ +20 -> alpha ~ 1 -> x0 itself
    np.testing.assert_allclose(out[1][~mask], x0[0][~mask], atol=1e-3)
