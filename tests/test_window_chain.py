"""Window-resident chains (ops/window.py chain ops; vae.py WindowState):
resblocks and upsamples thread (window, cache) state without
materializing full maps; exactness must match the plain window layout."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.core.masks import (compute_difference_mask, dilate_mask,
                                 downsample_mask)
from sige_tpu.models.sd import SDVAEConfig, SIGEDecoder, SIGEEncoder
from sige_tpu.nn import SIGEModel
from sige_tpu.nn.module import SIGECtx

CFG3 = SDVAEConfig(ch=16, ch_mult=(1, 2, 4), num_res_blocks=1,
                   attn_resolutions=(), z_channels=4, resolution=64,
                   num_groups=8)


def _decoder(chain: bool, bucket_min=1):
    cfg = dataclasses.replace(CFG3, window_chain=chain)
    model = SIGEModel(SIGEDecoder(cfg=cfg), layout="window",
                      bucket_min=bucket_min)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    model.init(jax.random.key(0), z)
    return model, z


def _mask64():
    mask = np.zeros((64, 64), bool)
    mask[20:32, 24:40] = True
    return dilate_mask(mask, 4)


@pytest.mark.parametrize("chain", [False, True])
def test_decoder_two_upsample_sparse_on_original_exact(chain):
    model, z = _decoder(chain)
    full = model.full(z)
    model.set_masks(downsample_mask(_mask64(), min_res=4))
    sp = model.sparse(z)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(full), atol=2e-4)


def test_decoder_chain_edit_changes_inside_window_only():
    """On an edited input the chain recomputes (at most) the canonical
    windows: outside every window the output equals the cached full-pass
    result, inside the edit region it must actually change. (Sparse does
    not track dense-on-edited bit-for-bit by design: the folded norms
    replay the ORIGINAL image's statistics, the reference's semantics.)"""
    model, z = _decoder(True)
    full = np.asarray(model.full(z))
    model.set_masks(downsample_mask(_mask64(), min_res=4))
    ze = z.at[:, 6:8, 7:10].add(0.5)
    sp = np.asarray(model.sparse(ze))
    assert np.isfinite(sp).all()
    # the edit region (latent 6:8,7:10 -> image 24:32,28:40) changed
    assert np.abs(sp - full)[0, 24:32, 28:40].max() > 1e-3
    # the far corner only moves by the dense tail's global live-stat
    # shift (the reference's SD decoder tail also renormalizes live) —
    # an order of magnitude less than the in-window change
    out_shift = np.abs(sp - full)[0, :8, :8].max()
    in_shift = np.abs(sp - full)[0, 24:32, 28:40].max()
    assert out_shift < 0.25 * in_shift, (out_shift, in_shift)


def test_decoder_chain_matches_nonchain_on_edit():
    """Chain and plain window layouts freshen the same window; on an
    edited input they must agree wherever both recompute (everywhere in
    the window's covered region) and trivially elsewhere."""
    outs = []
    for chain in (False, True):
        model, z = _decoder(chain)
        model.full(z)
        model.set_masks(downsample_mask(_mask64(), min_res=4))
        ze = z.at[:, 6:8, 7:10].add(0.5)
        outs.append(np.asarray(model.sparse(ze)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)


def test_encoder_chain_sparse_on_original_exact():
    cfg = dataclasses.replace(CFG3, window_chain=True)
    model = SIGEModel(SIGEEncoder(cfg=cfg), layout="window", bucket_min=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    model.init(jax.random.key(0), x)
    full = model.full(x)
    model.set_masks(downsample_mask(_mask64(), min_res=4))
    sp = model.sparse(x)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(full), atol=2e-4)


def test_encoder_chain_matches_nonchain_on_edit():
    """Down-chains (stem start + stride-2 window_chain_extend across the
    downsamples) must agree with the plain window layout on an edited
    input — both freshen the same canonical windows."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    xe = x.at[:, 24:36, 28:40].add(0.5)
    outs = []
    for chain in (False, True):
        cfg = dataclasses.replace(CFG3, window_chain=chain, sige_tail=True)
        model = SIGEModel(SIGEEncoder(cfg=cfg), layout="window",
                          bucket_min=1)
        model.init(jax.random.key(0), x)
        model.full(x)
        model.set_masks(downsample_mask(_mask64(), min_res=4))
        outs.append(np.asarray(model.sparse(xe)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)


def test_decoder_mid_attn_takes_chain_path(monkeypatch):
    """The VAE mid attention must run its window-resident masked
    stale-K/V form under window chains (no full-map k/v/out joins) —
    and stay exact on the original input. Guards against the chain
    gate silently failing closed (which would still be numerically
    correct but reintroduce the scatter joins)."""
    import sige_tpu.models.sd.vae as vae_mod

    calls = []
    orig = vae_mod.SIGEVAEAttnBlock._chain_window

    def spy(self, x, ctx):
        calls.append(type(x).__name__)
        return orig(self, x, ctx)

    monkeypatch.setattr(vae_mod.SIGEVAEAttnBlock, "_chain_window", spy)
    model, z = _decoder(True)
    full = model.full(z)
    model.set_masks(downsample_mask(_mask64(), min_res=4))
    sp = model.sparse(z)
    assert calls and all(c == "WindowState" for c in calls), calls
    np.testing.assert_allclose(np.asarray(sp), np.asarray(full), atol=2e-4)


DDPM_TINY = None  # built lazily to avoid import cost at collection


def _ddpm(chain: bool):
    from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet

    cfg = DDPMUNetConfig(ch=32, ch_mult=(1, 2, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=32,
                         sparse_resolution_threshold=16,
                         window_chain=chain)
    model = SIGEModel(SIGEFusedUNet(cfg=cfg), layout="window", bucket_min=1)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    t = jnp.zeros((1,), jnp.float32)
    model.init(jax.random.key(0), x, t)
    return model, x, t


def _mask32():
    mask = np.zeros((32, 32), bool)
    mask[10:18, 12:22] = True
    return dilate_mask(mask, 2)


@pytest.mark.parametrize("chain", [False, True])
def test_ddpm_unet_chain_sparse_on_original_exact(chain):
    """U-Net chains thread skip concatenations and upsamples; sparse on
    the original input must reproduce the full pass."""
    model, x, t = _ddpm(chain)
    full = model.full(x, t)
    model.set_masks(downsample_mask(_mask32(), min_res=8))
    sp = model.sparse(x, t)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(full), atol=2e-4)


def test_ddpm_unet_chain_matches_nonchain_on_edit():
    outs = []
    for chain in (False, True):
        model, x, t = _ddpm(chain)
        model.full(x, t)
        model.set_masks(downsample_mask(_mask32(), min_res=8))
        xe = x.at[:, 12:16, 14:20].add(0.5)
        outs.append(np.asarray(model.sparse(xe, t)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)


def _pd(chain: bool):
    from sige_tpu.models.pd import PDUNetConfig, SIGEPDUNet

    cfg = PDUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                       attn_resolutions=(8,), resolution=32,
                       sparse_resolution_threshold=16,
                       window_chain=chain)
    model = SIGEModel(SIGEPDUNet(cfg=cfg), layout="window", bucket_min=1)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    t = jnp.zeros((1,), jnp.float32)
    model.init(jax.random.key(0), x, t)
    return model, x, t


@pytest.mark.parametrize("chain", [False, True])
def test_pd_unet_chain_sparse_on_original_exact(chain):
    """PD chains cross the in-block up-resamples (pointwise norm+swish
    commute with nearest-2x); sparse-on-original stays exact."""
    model, x, t = _pd(chain)
    full = model.full(x, t)
    model.set_masks(downsample_mask(_mask32(), min_res=8))
    sp = model.sparse(x, t)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(full), atol=2e-4)


def test_pd_unet_chain_matches_nonchain_on_edit():
    outs = []
    for chain in (False, True):
        model, x, t = _pd(chain)
        model.full(x, t)
        model.set_masks(downsample_mask(_mask32(), min_res=8))
        xe = x.at[:, 12:16, 14:20].add(0.5)
        outs.append(np.asarray(model.sparse(xe, t)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)


def test_chain_with_cache_slots_traced_id():
    """Chains read slotted caches with a TRACED cache_id (the demo's
    per-step slot pattern): each slot replays its own step's caches."""
    import dataclasses as dc

    from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet
    from sige_tpu.nn.module import SIGECtx

    cfg = DDPMUNetConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=32,
                         sparse_resolution_threshold=16, cache_slots=2)
    model = SIGEModel(SIGEFusedUNet(cfg=cfg), layout="window", bucket_min=1)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    t0 = jnp.zeros((1,), jnp.float32)
    t1 = jnp.full((1,), 100.0, jnp.float32)
    model.init(jax.random.key(0), x, t0)
    full0 = model.full(x, t0, cache_id=0)
    full1 = model.full(x, t1, cache_id=1)
    model.set_masks(downsample_mask(_mask32(), min_res=8))

    def sparse_at(slot):
        return model.module.apply(
            {"params": model.params, "cache": model.cache,
             "sige": model.plan},
            x, t0 if slot == 0 else t1,
            ctx=SIGECtx(mode="sparse", cache_id=jnp.int32(slot)))

    np.testing.assert_allclose(np.asarray(sparse_at(0)), np.asarray(full0),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(sparse_at(1)), np.asarray(full1),
                               atol=2e-4)
    # the two slots hold different trajectories
    assert np.abs(np.asarray(full0) - np.asarray(full1)).max() > 1e-3


def test_chain_without_nesting_stays_exact():
    """A chaining model built with chain_nesting=False must fall back to
    materializing at upsamples (no wup_ok marker) instead of silently
    clamping the carried-window slice."""
    from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet

    cfg = DDPMUNetConfig(ch=32, ch_mult=(1, 2, 2), num_res_blocks=1,
                         attn_resolutions=(8,), resolution=32,
                         sparse_resolution_threshold=16)
    model = SIGEModel(SIGEFusedUNet(cfg=cfg), layout="window",
                      bucket_min=1, chain_nesting=False)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)).astype(np.float32))
    t = jnp.zeros((1,), jnp.float32)
    model.init(jax.random.key(0), x, t)
    full = model.full(x, t)
    model.set_masks(downsample_mask(_mask32(), min_res=8))
    import flax.traverse_util as tu

    flat = tu.flatten_dict(model.plan)
    assert not any(k[-1] == "wup_ok" for k in flat), "wup_ok without nesting"
    sp = model.sparse(x, t)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(full), atol=2e-4)


def _sd_unet(chain: bool):
    from sige_tpu.models.sd import SDUNetConfig, SIGESDUNet

    cfg = SDUNetConfig(in_channels=4, model_channels=32, out_channels=4,
                       num_res_blocks=1, attention_resolutions=(1, 2),
                       channel_mult=(1, 2), num_heads=4, context_dim=16,
                       num_groups=8, window_chain=chain)
    model = SIGEModel(SIGESDUNet(cfg=cfg), layout="window", bucket_min=1)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4)).astype(np.float32))
    t = jnp.full((2,), 5.0, jnp.float32)
    c = jnp.asarray(rng.standard_normal((2, 7, 16)).astype(np.float32))
    model.init(jax.random.key(0), x, t, c)
    return model, x, t, c


@pytest.mark.parametrize("chain", [False, True])
def test_sd_unet_chain_sparse_on_original_exact(chain):
    """SD U-Net chains thread skips, resamples AND the transformers
    (masked stale-K/V attention); sparse on the original input must
    reproduce the full pass."""
    model, x, t, c = _sd_unet(chain)
    full = model.full(x, t, c)
    model.set_masks(downsample_mask(_mask32(), min_res=8))
    sp = model.sparse(x, t, c)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(full), atol=2e-4)


def test_sd_unet_chain_matches_nonchain_on_edit():
    """Masked stale-K/V attention selects the exact token set of the
    non-chain path's scatter-updated map: chain and non-chain window
    layouts must agree on an edited input, not just the original."""
    outs = []
    for chain in (False, True):
        model, x, t, c = _sd_unet(chain)
        model.full(x, t, c)
        model.set_masks(downsample_mask(_mask32(), min_res=8))
        xe = x.at[:, 12:16, 14:20].add(0.5)
        outs.append(np.asarray(model.sparse(xe, t, c)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4)


def _plan_leaf_shapes(plan, key, out=None, path=()):
    out = {} if out is None else out
    for k, v in plan.items():
        if isinstance(v, dict):
            _plan_leaf_shapes(v, key, out, path + (k,))
        elif k == key:
            out[path] = tuple(np.asarray(v).shape)
    return out


def test_fast_meta_form_engages_interior_and_border_still_exact():
    """Interior edits must plan 2-form (fast, rollless) window metas —
    guarding against the static-fast path silently failing closed — and
    a border-touching edit must fall back to the 4-form clamp/roll path
    with unchanged exactness on the original input."""
    # interior edit: every win_in should be the fast int32[2] form
    model, z = _decoder(True)
    full = model.full(z)
    model.set_masks(downsample_mask(_mask64(), min_res=4))
    shapes = _plan_leaf_shapes(model._plan_host, "win_in")
    assert shapes and all(s == (2,) for s in shapes.values()), shapes
    sp = model.sparse(z)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(full), atol=2e-4)

    # corner edit: the halo pokes out of the canvas somewhere -> at least
    # one legacy 4-form meta; exactness unchanged
    model2, z2 = _decoder(True)
    full2 = model2.full(z2)
    corner = np.zeros((64, 64), bool)
    corner[0:10, 0:12] = True
    model2.set_masks(downsample_mask(dilate_mask(corner, 4), min_res=4))
    shapes2 = _plan_leaf_shapes(model2._plan_host, "win_in")
    assert any(s == (4,) for s in shapes2.values()), shapes2
    sp2 = model2.sparse(z2)
    np.testing.assert_allclose(np.asarray(sp2), np.asarray(full2), atol=2e-4)
