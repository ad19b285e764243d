"""GauGAN SPADE generator tests on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.models.gaugan import SPADEGenConfig, SIGEFusedSPADEGenerator
from sige_tpu.nn import SIGEModel
from sige_tpu.nn.module import SIGECtx
from sige_tpu.runners.gaugan_runner import GauGANRunConfig, GauGANRunner

TINY = SPADEGenConfig(
    ngf=8, semantic_nc=6, crop_size=64, aspect_ratio=2.0,
    num_upsampling_layers="normal",  # 5 ups: latent 2x... crop 64 -> sw 2
    num_sparse_layers=5,
)


def make_sems(rng, H, W, n_labels):
    label0 = rng.integers(0, n_labels - 1, (H, W))
    label1 = label0.copy()
    label1[H // 4 : H // 4 + 6, W // 4 : W // 4 + 10] = n_labels - 2
    return label0, label1


@pytest.fixture(scope="module")
def runner():
    cfg = GauGANRunConfig(input_nc=TINY.semantic_nc - 1, use_instance=True,
                          mask_dilate_radius=1, downsample_dilate_radius=1)
    # bucket_min=1: at toy resolutions the default 8-slot index buffers
    # would pad away all sparsity
    return GauGANRunner(TINY, cfg, seed=0, bucket_min=1)


def test_latent_hw():
    assert TINY.latent_hw == (1, 2)
    assert SPADEGenConfig().latent_hw == (4, 8)


def test_spade_sparse_on_original_is_exact(runner):
    """Sparse on the original semantics must reproduce the full output to
    1e-4 (BN folds are data-independent, so this is near-exact)."""
    rng = np.random.default_rng(0)
    H, W = 32, 64
    l0, l1 = make_sems(rng, H, W, TINY.semantic_nc - 1)
    s0 = runner.preprocess_input(l0)
    s1 = runner.preprocess_input(l1)
    x0, x1, mask = runner.preprocess(s0, s1)
    y_full = runner.model.full(x0)
    runner.model.set_masks(  # replan after cache refresh (same masks)
        __import__("sige_tpu").core.masks.downsample_mask(
            mask, min_res=TINY.latent_hw, dilation=1))
    y_sparse = runner.model.sparse(x0)
    np.testing.assert_allclose(
        np.asarray(y_sparse), np.asarray(y_full), atol=1e-4)


def test_spade_generate_tracks_dense(runner):
    """Sparse on the edited semantics approximates the dense forward of the
    edited semantics (exact where BN stats are running stats — everything —
    modulo boundary tiles; should be tight)."""
    rng = np.random.default_rng(1)
    H, W = 32, 64
    l0, l1 = make_sems(rng, H, W, TINY.semantic_nc - 1)
    s0 = runner.preprocess_input(l0)
    s1 = runner.preprocess_input(l1)
    out = runner.generate(s0, s1)
    assert out.shape == (H, W, 3)
    assert np.isfinite(out).all()
    y_dense = runner.module.apply(
        {"params": runner.model.params}, jnp.asarray(s1),
        ctx=SIGECtx(mode="dense"))
    err = np.abs(out - np.asarray(y_dense[0]))
    # SIGE is approximate outside the masked tiles: with 20+ stacked 3x3
    # convs the receptive-field ring spans most of this toy image, so only
    # a coarse agreement bound is meaningful here (tanh range [-1, 1]; the
    # at-scale quality contract is covered by metrics harnesses).
    assert np.median(err) < 0.02
    assert err.mean() < 0.06


def test_spade_profile_macs(runner):
    rng = np.random.default_rng(2)
    H, W = 32, 64
    l0 = rng.integers(0, TINY.semantic_nc - 2, (H, W))
    l1 = l0.copy()
    l1[8:10, 16:18] = TINY.semantic_nc - 2  # tiny 2x2 edit
    s0 = runner.preprocess_input(l0)
    s1 = runner.preprocess_input(l1)
    sp = runner.profile(s0, s1, warmup=1, iters=3)
    de = runner.profile(s0, s1, warmup=1, iters=3, mode="dense")
    assert sp["macs_g"] < de["macs_g"]
    assert sp["edit_ratio"] > 0


def test_sub_mobile_sparse_on_original_is_exact():
    """GAN-Compression variant: separable convs with folded InstanceNorm
    (data-dependent, cached per slot) must still reproduce full exactly on
    the original input."""
    from sige_tpu.models.gaugan import SIGESubMobileSPADEGenerator
    from sige_tpu.core.masks import downsample_mask

    cfg = TINY
    channels = (4, 4, 4, 6, 4, 3, 3, 4)
    module = SIGESubMobileSPADEGenerator(cfg=cfg, channels=channels)
    model = SIGEModel(module, bucket_min=1)
    rng = np.random.default_rng(5)
    H, W = 32, 64
    l0, l1 = make_sems(rng, H, W, TINY.semantic_nc - 1)
    r = GauGANRunner.__new__(GauGANRunner)  # reuse preprocess_input only
    r.run_cfg = GauGANRunConfig(input_nc=TINY.semantic_nc - 1)
    s0 = jnp.asarray(r.preprocess_input(l0))
    s1 = jnp.asarray(r.preprocess_input(l1))
    model.init(jax.random.key(0), s0)
    y_full = model.full(s0)
    from sige_tpu.core.masks import compute_difference_mask, dilate_mask
    mask = dilate_mask(compute_difference_mask(np.asarray(s0[0]), np.asarray(s1[0]), eps=1e-3), 1)
    model.set_masks(downsample_mask(mask, min_res=cfg.latent_hw, dilation=1))
    y_sparse = model.sparse(s0)
    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_full), atol=1e-4)
    # and the edited pass runs finite
    y_edit = model.sparse(s1)
    assert np.isfinite(np.asarray(y_edit)).all()


def test_decode_config():
    from sige_tpu.models.gaugan import decode_config
    assert decode_config("32_32_32_48_32_24_24_32") == [32, 32, 32, 48, 32, 24, 24, 32]


def test_spade_sige_tail_matches_dense_tail():
    """sige_tail=True (sparse conv_img over the gathered window scattered
    onto the cached output) must reproduce the dense-tail generator's full
    output exactly, be exact in sparse mode on the original semantics, and
    on an edit agree with the dense tail everywhere except the usual SIGE
    receptive-field ring outside the scatter coverage (the same
    approximation contract as every internal Scatter)."""
    import dataclasses

    rng = np.random.default_rng(3)
    H, W = 32, 64
    l0, l1 = make_sems(rng, H, W, TINY.semantic_nc - 1)
    cfgR = GauGANRunConfig(input_nc=TINY.semantic_nc - 1, use_instance=True,
                           mask_dilate_radius=1, downsample_dilate_radius=1)
    outs = {}
    for tail in (False, True):
        r = GauGANRunner(dataclasses.replace(TINY, sige_tail=tail), cfgR,
                         seed=0, bucket_min=1)
        s0 = r.preprocess_input(l0)
        s1 = r.preprocess_input(l1)
        x0, x1, mask = r.preprocess(s0, s1)
        y_full = r.model.full(x0)
        y_sparse = r.model.sparse(x1)
        if tail:  # exactness on the original input (scatter over cache)
            r.model.full(x0)
            y_same = r.model.sparse(x0)
            np.testing.assert_allclose(np.asarray(y_same),
                                       np.asarray(y_full), atol=1e-4)
        outs[tail] = (np.asarray(y_full), np.asarray(y_sparse),
                      np.asarray(mask))
    np.testing.assert_allclose(outs[True][0], outs[False][0], atol=1e-5)
    d = np.abs(outs[True][1] - outs[False][1]).max(axis=-1)[0]
    mask = outs[True][2]
    # exact on edited (mask-true) pixels; ring-bounded elsewhere
    assert d[mask].max() < 1e-4, d[mask].max()
    assert (d > 0.01).mean() < 0.05
    assert d.mean() < 5e-3
