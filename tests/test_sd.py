"""Stable Diffusion suite tests (tiny configs): UNet with SIGE spatial
transformer, VAE with sparse-query attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.core.masks import dilate_mask, downsample_mask
from sige_tpu.models.sd import (
    SDUNetConfig,
    SDVAEConfig,
    SIGEDecoder,
    SIGEEncoder,
    SIGESDUNet,
)
from sige_tpu.nn import SIGEModel

TINY_UNET = SDUNetConfig(
    in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
    attention_resolutions=(1, 2), channel_mult=(1, 2), num_heads=4,
    context_dim=16, num_groups=8,
)
TINY_VAE = SDVAEConfig(
    ch=16, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
    z_channels=4, resolution=32, num_groups=8,
)


def make_mask(H, W):
    m = np.zeros((H, W), bool)
    m[H // 4 : H // 4 + 5, W // 3 : W // 3 + 6] = True
    return m


def test_sd_unet_sparse_on_original_exact():
    rng = np.random.default_rng(0)
    H = W = 16
    x = jnp.asarray(rng.standard_normal((2, H, W, 4)).astype(np.float32))
    t = jnp.array([3.0, 3.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((2, 7, 16)).astype(np.float32))
    mask = make_mask(H, W)

    model = SIGEModel(SIGESDUNet(cfg=TINY_UNET), bucket_min=1)
    model.init(jax.random.key(0), x, t, context)
    y_full = model.full(x, t, context)
    model.set_masks(downsample_mask(dilate_mask(mask, 1), min_res=4))
    y_sparse = model.sparse(x, t, context)
    np.testing.assert_allclose(
        np.asarray(y_sparse), np.asarray(y_full), atol=2e-4)
    # transformer gathers planned (block size 4)
    stats = model.stats()
    assert any(info["block_size"] == (4, 4) for info in stats.values())


def test_sd_unet_cfg_batch2():
    """Classifier-free guidance doubles the batch; caches hold batch-2
    uncond+cond (reference: ldm/models/diffusion/ddim.py:252-259)."""
    rng = np.random.default_rng(1)
    H = W = 16
    x0 = jnp.asarray(rng.standard_normal((2, H, W, 4)).astype(np.float32))
    noise = rng.standard_normal((2, H, W, 4)).astype(np.float32)
    mask = make_mask(H, W)
    x1 = x0 + jnp.asarray(noise * mask[None, :, :, None])
    t = jnp.array([3.0, 3.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((2, 7, 16)).astype(np.float32))

    model = SIGEModel(SIGESDUNet(cfg=TINY_UNET), bucket_min=1)
    model.init(jax.random.key(0), x0, t, context)
    _ = model.full(x0, t, context)
    model.set_masks(downsample_mask(dilate_mask(mask, 2), min_res=4))
    y = model.sparse(x1, t, context)
    assert y.shape == (2, H, W, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_sd_vae_encoder_decoder_sparse_on_original_exact():
    rng = np.random.default_rng(2)
    R = TINY_VAE.resolution
    img = jnp.asarray(rng.standard_normal((1, R, R, 3)).astype(np.float32))
    mask = make_mask(R, R)

    enc = SIGEModel(SIGEEncoder(cfg=TINY_VAE), bucket_min=1)
    enc.init(jax.random.key(0), img)
    z_full = enc.full(img)
    enc.set_masks(downsample_mask(dilate_mask(mask, 1), min_res=4))
    z_sparse = enc.sparse(img)
    np.testing.assert_allclose(
        np.asarray(z_sparse), np.asarray(z_full), atol=2e-4)
    assert z_full.shape == (1, R // 2, R // 2, 2 * TINY_VAE.z_channels)

    z = z_full[..., : TINY_VAE.z_channels]  # mode of the posterior
    dec = SIGEModel(SIGEDecoder(cfg=TINY_VAE), bucket_min=1)
    dec.init(jax.random.key(1), z)
    img_full = dec.full(z)
    # the decoder spans latent -> image resolutions; the pyramid comes from
    # the image-res mask (reference: sdedit_runner.py:98-106)
    dec.set_masks(downsample_mask(dilate_mask(mask, 1), min_res=4))
    img_sparse = dec.sparse(z)
    np.testing.assert_allclose(
        np.asarray(img_sparse), np.asarray(img_full), atol=2e-4)
    assert img_full.shape == (1, R, R, 3)


def test_sd_vae_mid_attention_is_sparse_query():
    """The mid attn block must plan a block-4 gather (sparse-Q/dense-KV)."""
    rng = np.random.default_rng(3)
    R = TINY_VAE.resolution
    img = jnp.asarray(rng.standard_normal((1, R, R, 3)).astype(np.float32))
    enc = SIGEModel(SIGEEncoder(cfg=TINY_VAE), bucket_min=1)
    enc.init(jax.random.key(0), img)
    enc.full(img)
    enc.set_masks(downsample_mask(np.ones((R, R), bool), min_res=4))
    stats = enc.stats()
    assert any("mid_attn" in k for k in stats), stats.keys()


def test_sd_runner_inpaint_and_sdedit():
    """End-to-end SD flows on tiny configs: both must produce finite
    images of the right shape through the fused scan loops."""
    from sige_tpu.runners.sd_runner import SDRunConfig, SDRunner

    rng = np.random.default_rng(4)
    R = TINY_VAE.resolution
    run_cfg = SDRunConfig(ddim_steps=4, guidance_scale=2.0, strength=0.75,
                          mask_dilate_radius=2, decoder_dilate_radius=4)
    unet_cfg = SDUNetConfig(
        in_channels=TINY_VAE.z_channels, model_channels=32, out_channels=TINY_VAE.z_channels,
        num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_heads=4, context_dim=16, num_groups=8)
    runner = SDRunner(unet_cfg, TINY_VAE, run_cfg, seed=0)
    # tiny plans need tiny buckets
    for m in (runner.unet, runner.encoder, runner.decoder):
        m.bucket_min = 1

    init = rng.standard_normal((R, R, 3)).astype(np.float32) * 0.1
    mask = make_mask(R, R)
    c = jnp.asarray(rng.standard_normal((1, 5, 16)).astype(np.float32))
    uc = jnp.zeros_like(c)

    out = runner.inpaint(init, mask, uc=uc, c=c, seed=1)
    assert out.shape == (R, R, 3)
    assert np.isfinite(out).all()

    edited = init.copy()
    edited[8:16, 10:20] += 0.8
    out2 = runner.sdedit(init, edited, uc=uc, c=c, seed=2)
    assert out2.shape == (R, R, 3)
    assert np.isfinite(out2).all()


def test_vae_tile_chain_matches_unchained():
    """The opt-in tile-resident chain must reproduce the standard sparse
    path exactly (same caches, same plan)."""
    import dataclasses as dc
    rng = np.random.default_rng(7)
    R = TINY_VAE.resolution
    cfg_chain = dc.replace(TINY_VAE, tile_chain=True)
    z = jnp.asarray(rng.standard_normal((1, R // 2, R // 2, 4)).astype(np.float32))
    mask = make_mask(R, R)

    def run(cfg):
        dec = SIGEModel(SIGEDecoder(cfg=cfg), bucket_min=1)
        dec.init(jax.random.key(3), z)
        y_full = dec.full(z)
        dec.set_masks(downsample_mask(dilate_mask(mask, 1), min_res=4))
        y_sparse = dec.sparse(z)
        return np.asarray(y_full), np.asarray(y_sparse), dec

    yf0, ys0, dec0 = run(TINY_VAE)
    yf1, ys1, dec1 = run(cfg_chain)
    np.testing.assert_allclose(yf0, yf1, atol=1e-5)      # full unchanged
    np.testing.assert_allclose(ys1, yf1, atol=2e-4)      # chain exact on orig
    np.testing.assert_allclose(ys0, ys1, atol=2e-4)      # chain == unchained


def test_sd_unet_sparse_on_edit_tracks_dense():
    """Sparse-on-EDITED input must track the dense forward of the edited
    input (CFG batch-2) — a wrong transformer K/V path fails this
    (reference contract: example.py:94-95; mirrors
    test_ddpm_unet.test_sparse_on_edit_tracks_dense)."""
    from sige_tpu.core.masks import compute_difference_mask

    rng = np.random.default_rng(11)
    H = W = 24
    x0 = jnp.asarray(rng.standard_normal((2, H, W, 4)).astype(np.float32))
    noise = rng.standard_normal((2, H, W, 4)).astype(np.float32)
    mask = np.zeros((H, W), bool)
    mask[6:11, 8:13] = True  # ~4% edit (realistic SDEdit scale)
    x1 = x0 + jnp.asarray(0.6 * noise * mask[None, :, :, None])
    t = jnp.array([3.0, 3.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((2, 7, 16)).astype(np.float32))

    model = SIGEModel(SIGESDUNet(cfg=TINY_UNET), bucket_min=1)
    model.init(jax.random.key(0), x0, t, context)
    y_edit_dense = model.full(x1, t, context)  # dense ref on edited input
    _ = model.full(x0, t, context)             # restore original caches
    dmask = compute_difference_mask(np.asarray(x0[:1, :, :, :3]),
                                    np.asarray(x1[:1, :, :, :3]))
    model.set_masks(downsample_mask(dilate_mask(dmask, 5), min_res=4))
    y_sparse = model.sparse(x1, t, context)
    err = np.abs(np.asarray(y_sparse) - np.asarray(y_edit_dense))
    assert err.max() < 0.15, err.max()
    assert np.percentile(err, 99) < 0.1


def test_sd_decoder_sparse_on_edit_tracks_dense_tile_chain():
    """Decoder sparse-on-edited (with the tile-resident chain enabled)
    tracks the dense decode of the edited latent."""
    import dataclasses as dc

    rng = np.random.default_rng(12)
    R = TINY_VAE.resolution
    L = R // 2
    # sige_tail=False: this test isolates the tile-resident chain; the
    # folded tail freezes norm_out on the original image's statistics
    # (by design) which alone shifts p99 just past this tolerance
    cfg = dc.replace(TINY_VAE, tile_chain=True, sige_tail=False)
    z0 = jnp.asarray(rng.standard_normal((1, L, L, 4)).astype(np.float32))
    lmask = np.zeros((L, L), bool)
    lmask[L // 4 : L // 4 + 4, L // 3 : L // 3 + 4] = True
    # moderate edit: at full-std latent noise the *global* mid attention
    # shifts dense(z1) everywhere and the stale-outside-mask SIGE
    # semantics dominate the comparison
    z1 = z0 + jnp.asarray(
        0.3 * rng.standard_normal((1, L, L, 4)).astype(np.float32)
        * lmask[None, :, :, None])

    dec = SIGEModel(SIGEDecoder(cfg=cfg), bucket_min=1)
    dec.init(jax.random.key(5), z0)
    y_edit_dense = dec.full(z1)
    _ = dec.full(z0)
    imask = np.repeat(np.repeat(lmask, 2, 0), 2, 1)  # latent -> image res
    dec.set_masks(downsample_mask(dilate_mask(imask, 6), min_res=4))
    y_sparse = dec.sparse(z1)
    err = np.abs(np.asarray(y_sparse) - np.asarray(y_edit_dense))
    assert err.max() < 0.1, err.max()
    assert np.percentile(err, 99) < 0.05


def test_sd_unet_bf16_sparse_tracks_fp32():
    """bf16 inference (the headline-bench dtype) must track fp32 for the
    SD UNet's sparse path."""
    from sige_tpu.nn.module import SIGECtx

    rng = np.random.default_rng(13)
    H = W = 16
    x = jnp.asarray(rng.standard_normal((2, H, W, 4)).astype(np.float32))
    t = jnp.array([3.0, 3.0], jnp.float32)
    context = jnp.asarray(rng.standard_normal((2, 7, 16)).astype(np.float32))
    mask = make_mask(H, W)

    model = SIGEModel(SIGESDUNet(cfg=TINY_UNET), bucket_min=1)
    model.init(jax.random.key(0), x, t, context)
    model.full(x, t, context)
    model.set_masks(downsample_mask(dilate_mask(mask, 2), min_res=4))
    y32 = np.asarray(model.sparse(x, t, context))

    bf = jnp.bfloat16
    cast = lambda tr: jax.tree.map(
        lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, tr)
    yb = model.module.apply(
        {"params": cast(model.params), "cache": cast(model.cache),
         "sige": model.plan},
        x.astype(bf), t, context.astype(bf), ctx=SIGECtx(mode="sparse"))
    err = np.abs(y32 - np.asarray(yb, np.float32))
    assert err.max() < 0.1, err.max()
    assert err.mean() < 0.01
