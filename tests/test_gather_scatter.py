"""Equivalence tests for the sparse tile ops against dense references.

The contract under test is the reference's golden assertion
(reference: example.py:94-95): running gather -> VALID conv -> scatter over
the active tiles of the *edited* input, on top of caches from the
*original* input, must equal the dense conv of the edited input to 1e-4.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sige_tpu.core import BlockGeometry, build_sg_sources, build_src_map, reduce_mask_padded
from sige_tpu.core.masks import dilate_mask
from sige_tpu.ops import (
    calibrate_residual,
    conv2d_nhwc,
    gather_tiles,
    scatter_gather_tiles,
    scatter_tiles,
    scatter_with_block_residual,
    tile_conv2d,
)


def make_pair(rng, H=32, W=32, C=8, B=1, frac=0.06):
    """Original/edited inputs differing inside a random mask."""
    x0 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    mask = rng.random((H, W)) < frac
    noise = rng.standard_normal((B, H, W, C)).astype(np.float32)
    x1 = x0 + noise * mask[None, :, :, None]
    return jnp.asarray(x0), jnp.asarray(x1), mask


def naive_gather(x, indices, count, bh, bw):
    """Loop oracle for gather semantics (OOB and dead tiles -> exact 0)."""
    B, H, W, C = x.shape
    K = indices.shape[0]
    out = np.zeros((B, K, bh, bw, C), np.float32)
    for k in range(count):
        ih, iw = int(indices[k, 0]), int(indices[k, 1])
        for r in range(bh):
            for s in range(bw):
                h, w = ih + r, iw + s
                if 0 <= h < H and 0 <= w < W:
                    out[:, k, r, s] = np.asarray(x)[:, h, w]
    return out.reshape(B * K, bh, bw, C)


def test_gather_matches_naive(rng):
    x0, x1, mask = make_pair(rng)
    geom = BlockGeometry.create(6, 3, 1, 1)
    idx, count = reduce_mask_padded(mask, geom)
    got = gather_tiles(x1, jnp.asarray(idx), jnp.int32(count), geom)
    want = naive_gather(x1, idx, count, *geom.block_size)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_gather_epilogue_not_applied_to_oob(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    geom = BlockGeometry.create(6, 3, 1, 1)
    # A tile at (-1, -1) has an out-of-bounds first row/col.
    idx = jnp.asarray(np.array([[-1, -1]], np.int32))
    shift = jnp.ones((4,), jnp.float32) * 5.0
    out = gather_tiles(x, idx, jnp.int32(1), geom, shift=shift)
    out = np.asarray(out)
    assert (out[0, 0, :, :] == 0).all() and (out[0, :, 0, :] == 0).all()
    np.testing.assert_allclose(
        out[0, 1:, 1:], np.asarray(x)[0, :5, :5] + 5.0, atol=1e-6
    )


@pytest.mark.parametrize("block,kernel,stride,pad", [(6, 3, 1, 1), (4, 3, 1, 1), (6, 3, 2, 1), (6, 1, 1, 0)])
@pytest.mark.parametrize("B", [1, 2])
def test_gather_conv_scatter_equals_dense(rng, block, kernel, stride, pad, B):
    """The example.py golden contract, across conv shapes and batch."""
    x0, x1, mask = make_pair(rng, B=B)
    Cout = 16
    w = rng.standard_normal((kernel, kernel, 8, Cout)).astype(np.float32) * 0.2
    b = rng.standard_normal((Cout,)).astype(np.float32)
    w, b = jnp.asarray(w), jnp.asarray(b)

    dense = lambda x: conv2d_nhwc(x, w, b, stride=stride, padding=pad)
    y_full = dense(x1)
    y_cache = dense(x0)

    geom = BlockGeometry.create(block, kernel, stride, pad)
    idx, count = reduce_mask_padded(mask, geom)
    src = build_src_map(idx, count, geom, y_cache.shape[1:3])

    tiles = gather_tiles(x1, jnp.asarray(idx), jnp.int32(count), geom)
    out_tiles = tile_conv2d(tiles, w, b, stride=stride)
    assert out_tiles.shape[1:3] == geom.out_tile_size
    y_sparse = scatter_tiles(out_tiles, y_cache, jnp.asarray(src), geom)
    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_full), atol=1e-4)


def test_scatter_gather_resblock_equals_dense(rng):
    """conv1 -> fused scatter/re-gather (+epilogue) -> conv2 -> scatter."""
    x0, x1, mask = make_pair(rng)
    C, Cmid, Cout = 8, 12, 8
    w1 = jnp.asarray(rng.standard_normal((3, 3, C, Cmid)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.standard_normal((3, 3, Cmid, Cout)).astype(np.float32) * 0.2)
    scale = jnp.asarray(rng.standard_normal((Cmid,)).astype(np.float32))
    shift = jnp.asarray(rng.standard_normal((Cmid,)).astype(np.float32))

    def dense_swish(x):
        h = conv2d_nhwc(x, w1, padding=1)
        h = h * scale + shift
        h = h * (1 / (1 + jnp.exp(-h)))  # swish
        h = conv2d_nhwc(h, w2, padding=1)
        return h

    y_full = dense_swish(x1)
    # caches from original input
    h0 = conv2d_nhwc(x0, w1, padding=1)
    y0 = dense_swish(x0)

    geom = BlockGeometry.create(6, 3, 1, 1)
    # Two chained 3x3 convs widen the affected region by 2 pixels; the
    # planning mask must be dilated accordingly for exact equality — this is
    # why the reference runners dilate the difference mask
    # (reference: diffusion/runner.py mask_dilate_radius).
    idx, count = reduce_mask_padded(dilate_mask(mask, 2), geom)
    idx_j, count_j = jnp.asarray(idx), jnp.int32(count)
    src = jnp.asarray(build_src_map(idx, count, geom, h0.shape[1:3]))
    sg_src, sg_flat = map(
        jnp.asarray, build_sg_sources(idx, count, geom, h0.shape[1:3]))

    t = gather_tiles(x1, idx_j, count_j, geom)
    t = tile_conv2d(t, w1)
    t = scatter_gather_tiles(
        t, h0, sg_src, sg_flat, geom,
        scale=scale, shift=shift, activation="swish",
    )
    t = tile_conv2d(t, w2)
    y_sparse = scatter_tiles(t, y0, src, geom)
    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_full), atol=1e-4)


def test_scatter_with_block_residual_equals_dense(rng):
    """Main path block 6 (3x3 conv), shortcut block 4 (1x1 conv), joined by
    the block-residual scatter — the SPADE/resblock join pattern."""
    x0, x1, mask = make_pair(rng)
    C, Cout = 8, 16
    wm = jnp.asarray(rng.standard_normal((3, 3, C, Cout)).astype(np.float32) * 0.2)
    ws = jnp.asarray(rng.standard_normal((1, 1, C, Cout)).astype(np.float32) * 0.2)

    dense = lambda x: conv2d_nhwc(x, wm, padding=1) + conv2d_nhwc(x, ws, padding=0)
    y_full = dense(x1)
    y1_cache = conv2d_nhwc(x0, ws, padding=0)   # shortcut cache
    y_cache = conv2d_nhwc(x0, wm, padding=1) + y1_cache  # joined cache

    gm = BlockGeometry.create(6, 3, 1, 1)
    gs = BlockGeometry.create(4, 1, 1, 0)
    im, cm = reduce_mask_padded(mask, gm)
    is_, cs = reduce_mask_padded(mask, gs)
    om = jnp.asarray(build_src_map(im, cm, gm, y_cache.shape[1:3]))
    os_ = jnp.asarray(build_src_map(is_, cs, gs, y_cache.shape[1:3]))

    tm = tile_conv2d(gather_tiles(x1, jnp.asarray(im), jnp.int32(cm), gm), wm)
    ts = tile_conv2d(gather_tiles(x1, jnp.asarray(is_), jnp.int32(cs), gs), ws)
    y_sparse = scatter_with_block_residual(
        tm, y_cache, ts, y1_cache, om, gm, os_, gs,
    )
    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_full), atol=1e-4)


def test_scatter_residual_full_map(rng):
    """Plain scatter with a same-shape residual (reference Scatter.forward
    residual path)."""
    x0, x1, mask = make_pair(rng)
    C = 8
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.2)
    res1 = jnp.asarray(rng.standard_normal((1, 32, 32, C)).astype(np.float32))

    dense = lambda x, r: conv2d_nhwc(x, w, padding=1) + r
    y_full = dense(x1, res1)
    y_cache = dense(x0, res1)

    geom = BlockGeometry.create(6, 3, 1, 1)
    idx, count = reduce_mask_padded(mask, geom)
    src = jnp.asarray(build_src_map(idx, count, geom, (32, 32)))
    t = tile_conv2d(gather_tiles(x1, jnp.asarray(idx), jnp.int32(count), geom), w)
    y_sparse = scatter_tiles(t, y_cache, src, geom, residual=res1)
    np.testing.assert_allclose(np.asarray(y_sparse), np.asarray(y_full), atol=1e-4)


def test_empty_mask_returns_cache(rng):
    x0 = jnp.asarray(rng.standard_normal((1, 16, 16, 4)).astype(np.float32))
    geom = BlockGeometry.create(6, 3, 1, 1)
    idx, count = reduce_mask_padded(np.zeros((16, 16), bool), geom)
    src = jnp.asarray(build_src_map(idx, count, geom, (16, 16)))
    tiles = gather_tiles(x0, jnp.asarray(idx), jnp.int32(count), geom)
    assert (np.asarray(tiles) == 0).all()
    # fabricate conv-output tiles of the right shape
    out_tiles = jnp.zeros((idx.shape[0], *geom.out_tile_size, 4), jnp.float32)
    y = scatter_tiles(out_tiles, x0, src, geom)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x0))
