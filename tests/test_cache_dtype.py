"""Narrow-storage scatter caches (SIGECtx.cache_dtype).

``SIGEModel(cache_dtype=jnp.bfloat16)`` stores every scatter cache in
bf16 while computing in the model dtype: halves the sparse-resident
cache HBM for the fp32 families (DDPM / PD / GauGAN) and the
cache-slice/update bytes on the sparse hot path. Reads cast back to the
compute dtype, so only cached (unedited) content sees bf16 rounding —
the SIGE contract degrades from exact (~1e-4) to bf16-approximate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sige_tpu.core.masks import dilate_mask, downsample_mask
from sige_tpu.models.ddpm import DDPMUNetConfig, SIGEFusedUNet
from sige_tpu.nn import SIGEModel

DDPM_TINY = DDPMUNetConfig(
    ch=16, ch_mult=(1, 2), num_res_blocks=2, attn_resolutions=(16,),
    resolution=32, num_groups=8, sparse_resolution_threshold=16)


def _edit(rng, shape, box):
    x0 = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    mask = np.zeros(shape[1:3], bool)
    mask[box[0]:box[1], box[2]:box[3]] = True
    return x0, mask


def _run(layout, cache_dtype, sparse_update=False):
    rng = np.random.default_rng(0)
    x0, mask = _edit(rng, (1, 32, 32, 3), (8, 16, 10, 20))
    t = jnp.array([3.0], jnp.float32)
    model = SIGEModel(SIGEFusedUNet(cfg=DDPM_TINY), layout=layout,
                      cache_dtype=cache_dtype)
    model.init(jax.random.key(0), x0, t)
    y_full = model.full(x0, t)
    model.set_masks(downsample_mask(dilate_mask(mask, 2), min_res=4))
    y_sparse = model.sparse(x0, t, sparse_update=sparse_update)
    return model, np.asarray(y_full), np.asarray(y_sparse)


def _cache_leaves(cache):
    return jax.tree_util.tree_leaves(cache)


def test_bf16_caches_window_layout():
    model, y_full, y_sparse = _run("window", jnp.bfloat16)
    # the big activation caches are stored bf16 (norm-affine slots,
    # which skip the narrowing, stay fp32)
    dts = {l.dtype for l in _cache_leaves(model.cache) if l.ndim >= 5}
    assert dts == {jnp.bfloat16.dtype}, dts
    # compute dtype is unchanged
    assert y_sparse.dtype == np.float32
    # sparse-on-original tracks full within bf16 rounding of the caches
    assert np.abs(y_sparse - y_full).max() < 0.05


def test_bf16_caches_tiles_layout():
    _, y_full, y_sparse = _run("tiles", jnp.bfloat16)
    assert np.abs(y_sparse - y_full).max() < 0.05


def test_bf16_caches_sparse_update_keeps_storage_dtype():
    model, y_full, y_sparse = _run("window", jnp.bfloat16,
                                   sparse_update=True)
    dts = {l.dtype for l in _cache_leaves(model.cache) if l.ndim >= 5}
    assert dts == {jnp.bfloat16.dtype}, dts
    assert np.abs(y_sparse - y_full).max() < 0.05


def test_default_cache_dtype_stays_exact():
    _, y_full, y_sparse = _run("window", None)
    np.testing.assert_allclose(y_sparse, y_full, atol=1e-4)


def test_bf16_cache_footprint_halves():
    m16, _, _ = _run("window", jnp.bfloat16)
    m32, _, _ = _run("window", None)

    def nbytes(cache, nd):
        return sum(l.size * l.dtype.itemsize
                   for l in _cache_leaves(cache) if l.ndim >= nd)

    assert nbytes(m16.cache, 5) * 2 == nbytes(m32.cache, 5)
