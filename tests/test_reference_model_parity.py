"""Model-level cross-implementation parity: sige_tpu models vs the ACTUAL
reference models (torch CPU), with RANDOM weights.

For each family the reference model is instantiated on a tiny config,
its random state dict is exported through our converters, and both
implementations run the reference's 3-phase protocol (full on original ->
set_masks -> sparse on edited; reference: example.py:55-95). Outputs must
match to ~1e-4 in BOTH modes — this anchors architecture fidelity (temb
fold layout, norm folding algebra, attention plumbing, asymmetric
downsample padding) to measured numbers instead of code reading.

Skipped when the reference CPU extension cannot build.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ref_oracle import install_reference
from sige_tpu.core.masks import dilate_mask, downsample_mask
from sige_tpu.nn import SIGEModel
from sige_tpu.utils.config import AttrDict
from sige_tpu.utils.convert import assert_params_match


def nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def nhwc(x):
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def ref_diffusion():
    try:
        sige = install_reference("diffusion")
    except Exception as e:  # pragma: no cover - environment dependent
        pytest.skip(f"reference unavailable: {e}")
    return sige


def _edit_pair(rng, res, ch=3):
    x0 = rng.standard_normal((1, res, res, ch)).astype(np.float32)
    mask = np.zeros((res, res), bool)
    mask[res // 4 : res // 2, res // 3 : res // 3 + res // 3] = True
    x1 = x0 + 0.5 * rng.standard_normal(x0.shape).astype(np.float32) * mask[
        None, :, :, None
    ]
    return x0, x1, mask


def _torch_masks(sige, mask, dilation, min_res=4):
    m = sige.utils.dilate_mask(torch.from_numpy(mask), dilation)
    return sige.utils.downsample_mask(m, min_res=min_res, dilation=1)


def _my_masks(mask, dilation, min_res=4):
    return downsample_mask(dilate_mask(mask, dilation), min_res=min_res, dilation=1)


def _fix_reference_attn_norm_stash(model):
    """Repair a GENUINE BUG in the reference before using it as an oracle.

    ``SIGEFusedAttnBlock.forward`` in full mode stores
    ``self.scales, self.shifts = scale, shift`` — raw ``[C]`` tensors —
    but the sparse path reads ``self.scales[cache_id]`` (reference:
    diffusion/models/ddpm_arch/sige_fused_unet.py:169-177), which indexes
    CHANNEL ``cache_id``'s scalar and broadcasts it over all channels, so
    every reference attention block applies channel-0's folded norm to
    every channel in sparse mode (~0.3 output error on a random UNet,
    found by this parity suite; the resblock class uses the intended
    ``self.scale1s[cache_id] = scale`` dict pattern). sige_tpu implements
    the correct per-channel algebra, so the oracle gets the intended dict
    stash restored here.
    """
    for m in model.modules():
        if type(m).__name__ == "SIGEFusedAttnBlock" and isinstance(
            getattr(m, "scales", None), torch.Tensor
        ):
            m.scales = {m.cache_id: m.scales}
            m.shifts = {m.cache_id: m.shifts}


# ---------------------------------------------------------------------------
# DDPM SIGEFusedUNet
# ---------------------------------------------------------------------------

DDPM_REF_CFG = {
    "data": {"image_size": 32},
    "model": {
        "ch": 32,
        "ch_mult": [1, 2],
        "num_res_blocks": 1,
        "attn_resolutions": [16],
        "in_ch": 3,
        "out_ch": 3,
        "resamp_with_conv": True,
        "sige_block_size": {"normal": 6, "instance": 4},
        # both levels sparse: exercises SIGEFusedAttnBlock, SIGEDownsample
        # (asymmetric pad), SIGEUpsample, and the skip-concat resblocks
        "sparse_resolution_threshold": 16,
    },
}


def test_ddpm_sige_fused_unet_parity(ref_diffusion, rng):
    from models.ddpm_arch.sige_fused_unet import SIGEFusedUNet as RefUNet

    from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet
    from sige_tpu.utils.convert import convert_ddpm_fused_unet

    torch.manual_seed(0)
    ref = RefUNet(None, AttrDict.convert(DDPM_REF_CFG)).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    x0, x1, mask = _edit_pair(rng, 32)
    tt = torch.full((1,), 17, dtype=torch.long)

    with torch.no_grad():
        ref.set_mode("full")
        y_full_ref = ref(nchw(x0), tt)
        _fix_reference_attn_norm_stash(ref)
        ref.set_masks(_torch_masks(ref_diffusion, mask, 2))
        ref.set_mode("sparse")
        y_sparse_ref = ref(nchw(x1), tt)

    cfg = DDPMUNetConfig(
        ch=32,
        ch_mult=(1, 2),
        num_res_blocks=1,
        attn_resolutions=(16,),
        resolution=32,
        sparse_resolution_threshold=16,
        # the reference keeps head/tail dense with live statistics
        sige_tail=False,
    )
    params = convert_ddpm_fused_unet(
        sd, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
        resolution=32,
    )
    model = SIGEModel(SIGEFusedUNet(cfg=cfg))
    x0j = jnp.asarray(x0)
    tj = jnp.array([17], jnp.int32)
    model.init(jax.random.key(0), x0j, tj)
    assert_params_match(params, model.params)
    model.params = params

    y_full = np.asarray(model.full(x0j, tj))
    np.testing.assert_allclose(
        y_full, nhwc(y_full_ref), atol=1e-4,
        err_msg="full-mode outputs diverge from the reference",
    )

    model.set_masks(_my_masks(mask, 2))
    y_sparse = np.asarray(model.sparse(jnp.asarray(x1), tj))
    np.testing.assert_allclose(
        y_sparse, nhwc(y_sparse_ref), atol=2e-4,
        err_msg="sparse-mode outputs diverge from the reference",
    )
    # and the sparse paths actually diverge from full (the edit did land)
    assert np.abs(y_sparse - y_full).max() > 1e-3
