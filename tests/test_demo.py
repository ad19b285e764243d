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


def test_multi_session_matches_independent_runners():
    """Two sessions with different base images and different edits must
    each reproduce an independent single-session DemoRunner (same seeds,
    same params) — including after one session commits via apply while
    the other's state stays untouched."""
    import jax

    from sige_tpu.demo.runner import MultiSessionDemoRunner

    kw = dict(sample_steps=4, noise_level=40, total_steps=100,
              mask_dilate_radius=2, bucket_min=1)
    rng = np.random.default_rng(7)
    bases = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(2)]
    edits = []
    for i, b in enumerate(bases):
        e = b.copy()
        if i == 0:
            e[4:12, 6:14] = 0.9
        else:
            e[18:30, 2:26] = 0.05  # bigger edit: different plan shapes
        edits.append(e)

    multi = MultiSessionDemoRunner(2, TINY, **kw)
    # independent single-session references share the multi runner's
    # params (same init seed -> same params anyway, but be explicit)
    singles = []
    for i in range(2):
        r = DemoRunner(TINY, params=multi.inner.model.params, **kw)
        singles.append(r)

    for i in range(2):
        out_m = multi.reset_base_image(i, bases[i])
        out_s = singles[i].reset_base_image(bases[i])
        np.testing.assert_allclose(out_m, out_s, atol=1e-5)

    for i in range(2):
        got = multi.generate(i, edits[i])
        want = singles[i].generate(edits[i])
        np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"s{i}")

    # session 0 commits; session 1 then generates — its state must be
    # unaffected by session 0's apply
    got0 = multi.generate(0, edits[0], sparse_update=True)
    want0 = singles[0].generate(edits[0], sparse_update=True)
    np.testing.assert_allclose(got0, want0, atol=1e-4)
    got1 = multi.generate(1, edits[1])
    want1 = singles[1].generate(edits[1])
    np.testing.assert_allclose(got1, want1, atol=1e-4)
