"""Attention execution paths: the Pallas flash path (run in TPU
interpret mode on CPU) must match the naive einsum+softmax path, for
both the all-pairs and the masked stale-K/V forms, including non-lane
head dims (zero-padded inside the flash wrapper)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.ops.attention import NEG_INF, masked_mha, mha


def _rand(key, *shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize("nh,hd", [(2, 64), (2, 40)])
def test_flash_mha_matches_naive(nh, hd):
    B, N, M = 2, 128, 256
    q = _rand(0, B, N, nh * hd)
    k = _rand(1, B, M, nh * hd)
    v = _rand(2, B, M, nh * hd)
    want = mha(q, k, v, nh, hd)
    got = mha(q, k, v, nh, hd, _interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_falls_back_on_odd_lengths():
    # N=100 does not tile; both calls must take the naive path and agree
    B, nh, hd = 1, 1, 32
    q = _rand(3, B, 100, nh * hd)
    k = _rand(4, B, 100, nh * hd)
    v = _rand(5, B, 100, nh * hd)
    np.testing.assert_array_equal(
        np.asarray(mha(q, k, v, nh, hd, _interpret=True)),
        np.asarray(mha(q, k, v, nh, hd)))


def test_flash_ragged_kv_pads_with_dead_segments():
    """The SD text cross-attention has M=77 KV tokens; the flash path
    pads KV to a lane multiple with dead-segmented tokens and must
    match the naive unpadded computation."""
    B, N, M, nh, hd = 2, 128, 77, 2, 40
    q = _rand(20, B, N, nh * hd)
    k = _rand(21, B, M, nh * hd)
    v = _rand(22, B, M, nh * hd)
    want = mha(q, k, v, nh, hd)
    got = mha(q, k, v, nh, hd, _interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("nh,hd", [(1, 64), (2, 40)])
def test_flash_masked_mha_matches_naive(nh, hd):
    """Masked stale-K/V: flash rides segment ids, naive rides additive
    biases — same live-token set, same answer."""
    B, N, Ms, Mf = 1, 128, 256, 128
    rng = np.random.default_rng(0)
    q = _rand(6, B, N, nh * hd)
    ks = _rand(7, B, Ms, nh * hd)
    vs = _rand(8, B, Ms, nh * hd)
    kf = _rand(9, B, Mf, nh * hd)
    vf = _rand(10, B, Mf, nh * hd)
    # fresh window is live; the window's footprint in the stale map dead
    live_f = np.ones(Mf, bool)
    dead_s = np.zeros(Ms, bool)
    dead_s[rng.choice(Ms, Mf, replace=False)] = True
    bias_s = jnp.where(jnp.asarray(dead_s), NEG_INF, 0.0)
    bias_f = jnp.where(jnp.asarray(live_f), 0.0, NEG_INF)
    want = masked_mha(q, ks, vs, kf, vf, bias_s, bias_f, nh, hd)
    got = masked_mha(q, ks, vs, kf, vf, bias_s, bias_f, nh, hd,
                     _interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_model_level_flash_matches_naive():
    """Whole-model check: a VAE decoder (mid attention at 16x16 = 256
    tokens, a lane multiple) run with the flash path globally enabled
    (interpret mode) must reproduce the naive run — full AND sparse
    chain (masked stale-K/V via segment ids)."""
    import dataclasses

    from sige_tpu.core.masks import dilate_mask, downsample_mask
    from sige_tpu.models.sd import SDVAEConfig, SIGEDecoder
    from sige_tpu.nn import SIGEModel
    from sige_tpu.ops.attention import enable_flash_attention

    cfg = SDVAEConfig(ch=16, ch_mult=(1, 2, 4), num_res_blocks=1,
                      attn_resolutions=(), z_channels=4, resolution=64,
                      num_groups=8, window_chain=True)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    mask = np.zeros((64, 64), bool)
    mask[20:32, 24:40] = True
    pyramid = downsample_mask(dilate_mask(mask, 4), min_res=4)

    outs = {}
    for flash in (False, True):
        enable_flash_attention(flash, interpret=flash)
        try:
            model = SIGEModel(SIGEDecoder(cfg=cfg), layout="window",
                              bucket_min=1)
            model.init(jax.random.key(0), z)
            full = model.full(z)
            model.set_masks(pyramid)
            sp = model.sparse(z)
        finally:
            enable_flash_attention(False)
        outs[flash] = (np.asarray(full), np.asarray(sp))
        # sparse-on-original stays exact within each path
        np.testing.assert_allclose(outs[flash][1], outs[flash][0],
                                   atol=2e-4)
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=1e-4)
    np.testing.assert_allclose(outs[True][1], outs[False][1], atol=1e-4)


def test_masked_mha_ignores_dead_tokens_entirely():
    """Dead stale values must not leak: replacing them with garbage
    cannot change the output (softmax mass is exactly zero there)."""
    nh, hd = 1, 32
    B, N, Ms, Mf = 1, 128, 128, 128
    q = _rand(11, B, N, nh * hd)
    ks = _rand(12, B, Ms, nh * hd)
    vs = _rand(13, B, Ms, nh * hd)
    kf = _rand(14, B, Mf, nh * hd)
    vf = _rand(15, B, Mf, nh * hd)
    dead = np.zeros(Ms, bool)
    dead[10:40] = True
    bias_s = jnp.where(jnp.asarray(dead), NEG_INF, 0.0)
    bias_f = jnp.zeros(Mf)
    a = masked_mha(q, ks, vs, kf, vf, bias_s, bias_f, nh, hd,
                   _interpret=True)
    vs2 = vs.at[:, 10:40].set(1e4)
    b = masked_mha(q, ks, vs2, kf, vf, bias_s, bias_f, nh, hd,
                   _interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# ---------------------------------------------------------------------------
# bespoke unpadded-head-dim kernel (ops/flash.py)


def _with_bespoke(fn):
    from sige_tpu.ops.attention import enable_flash_attention

    enable_flash_attention(True, interpret=True, bespoke=True)
    try:
        return fn()
    finally:
        enable_flash_attention(False)


@pytest.mark.parametrize("nh,hd", [(2, 64), (2, 40), (1, 80)])
def test_bespoke_flash_mha_matches_naive(nh, hd):
    B, N, M = 2, 128, 256
    q = _rand(30, B, N, nh * hd)
    k = _rand(31, B, M, nh * hd)
    v = _rand(32, B, M, nh * hd)
    want = mha(q, k, v, nh, hd)
    got = _with_bespoke(lambda: mha(q, k, v, nh, hd))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_bespoke_flash_ragged_kv():
    """M=77 text KV pads to 128 with -inf bias on the padded tail."""
    B, N, M, nh, hd = 2, 128, 77, 2, 40
    q = _rand(33, B, N, nh * hd)
    k = _rand(34, B, M, nh * hd)
    v = _rand(35, B, M, nh * hd)
    want = mha(q, k, v, nh, hd)
    got = _with_bespoke(lambda: mha(q, k, v, nh, hd))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("nh,hd", [(1, 64), (2, 40)])
def test_bespoke_flash_masked_mha_matches_naive(nh, hd):
    B, N, Ms, Mf = 1, 128, 256, 128
    rng = np.random.default_rng(1)
    q = _rand(36, B, N, nh * hd)
    ks = _rand(37, B, Ms, nh * hd)
    vs = _rand(38, B, Ms, nh * hd)
    kf = _rand(39, B, Mf, nh * hd)
    vf = _rand(40, B, Mf, nh * hd)
    dead_s = np.zeros(Ms, bool)
    dead_s[rng.choice(Ms, Mf, replace=False)] = True
    bias_s = jnp.where(jnp.asarray(dead_s), NEG_INF, 0.0)
    bias_f = jnp.zeros(Mf)
    want = masked_mha(q, ks, vs, kf, vf, bias_s, bias_f, nh, hd)
    got = _with_bespoke(
        lambda: masked_mha(q, ks, vs, kf, vf, bias_s, bias_f, nh, hd))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_bespoke_flash_masked_mha_ragged_shapes():
    """The sparse chain's real shapes are ragged (N = WH*WW window
    tokens, M = full map + window): the dispatch pads q rows (sliced
    off) and kv tokens (dead-biased) up to the kernel lattice."""
    nh, hd = 2, 40
    B, N, Ms, Mf = 1, 300, 1300, 300
    rng = np.random.default_rng(2)
    q = _rand(44, B, N, nh * hd)
    ks = _rand(45, B, Ms, nh * hd)
    vs = _rand(46, B, Ms, nh * hd)
    kf = _rand(47, B, Mf, nh * hd)
    vf = _rand(48, B, Mf, nh * hd)
    dead_s = np.zeros(Ms, bool)
    dead_s[rng.choice(Ms, Mf, replace=False)] = True
    bias_s = jnp.where(jnp.asarray(dead_s), NEG_INF, 0.0)
    bias_f = jnp.zeros(Mf)
    want = masked_mha(q, ks, vs, kf, vf, bias_s, bias_f, nh, hd)
    got = _with_bespoke(
        lambda: masked_mha(q, ks, vs, kf, vf, bias_s, bias_f, nh, hd))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_bespoke_flash_falls_back_on_odd_lengths():
    B, nh, hd = 1, 1, 32
    q = _rand(41, B, 100, nh * hd)
    k = _rand(42, B, 100, nh * hd)
    v = _rand(43, B, 100, nh * hd)
    np.testing.assert_array_equal(
        np.asarray(_with_bespoke(lambda: mha(q, k, v, nh, hd))),
        np.asarray(mha(q, k, v, nh, hd)))
