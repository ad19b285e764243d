"""Mask pipeline parity tests against the reference semantics.

The torch CPU implementations here are *independent re-derivations* of the
reference's documented behavior (sige/utils.py) used purely as test
oracles — torch is available in the image, so we can check our numpy
planner reproduces max-pool / bilinear-interpolate semantics exactly.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sige_tpu.core import (
    BlockGeometry,
    compute_difference_mask,
    dilate_mask,
    downsample_mask,
    reduce_mask,
    reduce_mask_padded,
)
from sige_tpu.core.masks import SENTINEL, round_to_bucket


def torch_reduce_mask(mask, block_size, stride, padding):
    """Oracle: pad + max-pool + nonzero, per reference sige/utils.py:8-37."""
    H, W = mask.shape
    m = torch.from_numpy(mask.astype(np.float32)).view(1, 1, H, W)
    m = F.pad(m, (padding[1], block_size[1], padding[0], block_size[0]))
    pooled = F.max_pool2d(m, block_size, stride)[0, 0] > 0.5
    idx = torch.nonzero(pooled)
    idx[:, 0] = stride[0] * idx[:, 0] - padding[0]
    idx[:, 1] = stride[1] * idx[:, 1] - padding[1]
    return idx.numpy().astype(np.int32)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "block,kernel,stride,pad",
    [(6, 3, 1, 1), (4, 3, 1, 1), (6, 3, 2, 1), (7, 1, 1, 0), (5, 4, 2, 1)],
)
def test_reduce_mask_matches_reference_semantics(seed, block, kernel, stride, pad):
    rng = np.random.default_rng(seed)
    H = W = 37
    mask = rng.random((H, W)) < 0.05
    geom = BlockGeometry.create(block, kernel, stride, pad)
    got = reduce_mask(mask, geom)
    want = torch_reduce_mask(mask, geom.block_size, geom.block_stride, geom.offset)
    np.testing.assert_array_equal(got, want)


def test_geometry_legalization():
    # 3x3 stride-1 conv, requested block 6 -> legal block 6, stride 4 (overlap 2)
    g = BlockGeometry.create(6, 3, 1, 1)
    assert g.block_size == (6, 6)
    assert g.block_stride == (4, 4)
    assert g.out_tile_size == (4, 4)
    # requested block 7 is illegal for 3x3 s1 -> rounds to 7? n=(7-3)//1=4 -> 7 legal
    g = BlockGeometry.create(7, 3, 1, 1)
    assert g.block_size == (7, 7)
    # 3x3 stride-2: block 6 -> n=(6-3)//2=1 -> legal 5, stride 4
    g = BlockGeometry.create(6, 3, 2, 1)
    assert g.block_size == (5, 5)
    assert g.block_stride == (4, 4)
    assert g.out_tile_size == (2, 2)


def test_dilate_mask_matches_shift_or():
    rng = np.random.default_rng(0)
    mask = rng.random((16, 16)) < 0.1
    got = dilate_mask(mask, 2)
    # oracle: the reference's cross-shaped dilation (union of vertical and
    # horizontal shifts of the ORIGINAL mask; reference: sige/utils.py:40-71,
    # cross-validated against the built extension in test_reference_parity.py)
    want = mask.copy()
    for i in range(1, 3):
        want[:-i] |= mask[i:]
        want[i:] |= mask[:-i]
        want[:, :-i] |= mask[:, i:]
        want[:, i:] |= mask[:, :-i]
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(dilate_mask(mask, 0), mask)


def test_difference_mask_shapes():
    a = np.zeros((1, 8, 8, 3), np.float32)
    b = a.copy()
    b[0, 2:4, 3:5, 1] = 1.0
    m = compute_difference_mask(a, b)
    assert m.shape == (8, 8)
    assert m.sum() == 4
    assert m[2, 3] and m[3, 4]


def test_downsample_mask_pyramid_keys_and_oracle():
    rng = np.random.default_rng(3)
    mask = rng.random((64, 64)) < 0.04
    masks = downsample_mask(mask, min_res=8, dilation=1)
    assert set(masks.keys()) == {(64, 64), (32, 32), (16, 16), (8, 8)}

    # oracle: reference algorithm re-implemented with torch interpolate
    interp = torch.from_numpy(mask.astype(np.float32)).view(1, 1, 64, 64)
    h = w = 64
    while True:
        t = min(0.3, interp.max().item() - 1e-3)
        level = (interp[0, 0] > t).numpy()
        level = dilate_mask(level, 1)
        np.testing.assert_array_equal(masks[(h, w)], level, err_msg=f"res {h}")
        h //= 2
        w //= 2
        if h < 8 and w < 8:
            break
        interp = F.interpolate(interp, (h, w), mode="bilinear", align_corners=False)


def test_reduce_mask_padded_and_buckets():
    rng = np.random.default_rng(1)
    mask = rng.random((32, 32)) < 0.05
    geom = BlockGeometry.create(6, 3, 1, 1)
    dense = reduce_mask(mask, geom)
    idx, count = reduce_mask_padded(mask, geom)
    assert count == dense.shape[0]
    assert idx.shape[0] == round_to_bucket(count)
    np.testing.assert_array_equal(idx[:count], dense)
    assert (idx[count:] == SENTINEL).all()
    # explicit capacity
    idx2, c2 = reduce_mask_padded(mask, geom, capacity=count + 3)
    assert idx2.shape[0] == count + 3 and c2 == count
    with pytest.raises(ValueError):
        reduce_mask_padded(mask, geom, capacity=max(count - 1, 0))


def test_empty_mask():
    geom = BlockGeometry.create(6, 3, 1, 1)
    idx, count = reduce_mask_padded(np.zeros((32, 32), bool), geom)
    assert count == 0 and (idx == SENTINEL).all()


@pytest.mark.parametrize("seed", range(6))
def test_bbox_of_map_pinned_size_fuzz(seed):
    """Pinned-size bbox crops: same covered content as the unpinned
    crop, shape exactly the pin (canvas-clamped), extra area all -1,
    and ValueError when the extent outgrows the pin."""
    from sige_tpu.core.scatter_map import bbox_of_map

    rng = np.random.default_rng(seed)
    H, W = int(rng.integers(8, 90)), int(rng.integers(8, 90))
    m = np.full((H, W), -1, np.int32)
    n = int(rng.integers(0, 5))
    for _ in range(n):
        r, c = rng.integers(0, H), rng.integers(0, W)
        h = int(rng.integers(1, H - r + 1))
        w = int(rng.integers(1, W - c + 1))
        m[r:r + h, c:c + w] = rng.integers(0, 1000)

    org0, box0 = bbox_of_map(m)
    pin = (min(box0.shape[0] + 32, H), min(box0.shape[1] + 32, W))
    org, box = bbox_of_map(m, size=pin)
    assert box.shape == pin
    # reconstruct full maps: both crops must describe the same coverage
    full0 = np.full((H, W), -1, np.int32)
    full0[org0[0]:org0[0] + box0.shape[0],
          org0[1]:org0[1] + box0.shape[1]] = box0
    full = np.full((H, W), -1, np.int32)
    full[org[0]:org[0] + box.shape[0],
         org[1]:org[1] + box.shape[1]] = box
    np.testing.assert_array_equal(full, full0)
    np.testing.assert_array_equal(full, m * (m >= 0) + -1 * (m < 0))

    rows = np.nonzero((m >= 0).any(axis=1))[0]
    if rows.size and rows[-1] - rows[0] + 1 > 1:
        # a pin smaller than the covered row extent must refuse
        with pytest.raises(ValueError):
            bbox_of_map(m, size=(int(rows[-1] - rows[0]), W))
