"""Interactive demo runner: per-step cache slots, sparse-only edits,
apply (sparse_update) advancing the baseline."""

import numpy as np
import pytest

from sige_tpu.demo import DemoRunner
from sige_tpu.models.ddpm import DDPMUNetConfig

TINY = DDPMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      attn_resolutions=(8,), resolution=32,
                      sparse_resolution_threshold=32)


@pytest.fixture(scope="module")
def demo():
    runner = DemoRunner(TINY, sample_steps=4, noise_level=40,
                        total_steps=100, mask_dilate_radius=2, bucket_min=1)
    rng = np.random.default_rng(0)
    base = rng.random((32, 32, 3)).astype(np.float32)
    out = runner.reset_base_image(base)
    return runner, base, out


def test_reset_fills_per_step_slots(demo):
    runner, base, out = demo
    assert out.shape == (32, 32, 3) and np.isfinite(out).all()
    # cache slots = number of steps, each filled with distinct activations
    any_cache = next(iter(
        v for sub in runner.model.cache.values()
        for v in (sub.values() if isinstance(sub, dict) else [sub])))
    import jax
    leaves = jax.tree.leaves(runner.model.cache)
    slotted = [l for l in leaves if l.ndim >= 1 and l.shape[0] == 4]
    assert slotted, "expected per-step cache slots"
    l = np.asarray(slotted[0])
    assert not np.allclose(l[0], l[1])  # different steps, different caches


def test_sparse_edit_and_empty_mask(demo):
    runner, base, _ = demo
    edited = base.copy()
    edited[10:18, 12:20] = 0.9
    out = runner.generate(edited)
    assert np.isfinite(out).all()
    # empty edit short-circuits to the base image
    out2 = runner.generate(base)
    np.testing.assert_allclose(out2, np.clip(base, 0, 1), atol=1e-5)


def test_apply_advances_baseline(demo):
    runner, base, _ = demo
    edited = base.copy()
    edited[20:26, 4:12] = 0.1
    _ = runner.generate(edited, sparse_update=True)
    # baseline is now the edited image: re-generating it is a no-op edit
    out = runner.generate(edited)
    np.testing.assert_allclose(out, np.clip(edited, 0, 1), atol=1e-5)
