"""Native C++ planner vs numpy-reference parity (both paths must agree
exactly — the planner's products parameterize jitted programs)."""

import numpy as np
import pytest

from sige_tpu import native
from sige_tpu.core import masks as m
from sige_tpu.core import scatter_map as sm
from sige_tpu.core.geometry import BlockGeometry


@pytest.fixture(scope="module")
def nat():
    if not native.available():
        pytest.skip("native planner unavailable (no g++)")
    return native


@pytest.fixture
def no_native(monkeypatch):
    """Force the numpy fallback paths inside core functions."""
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("geom_args", [(6, 3, 1, 1), (4, 1, 1, 0), (6, 3, 2, 1)])
def test_native_matches_numpy(nat, seed, geom_args, monkeypatch):
    rng = np.random.default_rng(seed)
    H, W = 37, 41
    mask = rng.random((H, W)) < 0.07
    geom = BlockGeometry.create(*geom_args)

    # native products first
    got_dil = nat.dilate_mask(mask, 2)
    n_live = nat.count_tiles(mask, geom)
    cap = m.round_to_bucket(n_live, 8)
    idx_c, n_c = nat.reduce_mask_padded(mask, geom, cap, m.SENTINEL)
    src_c = nat.build_src_map(idx_c, n_c, geom, (H, W))
    sg_src_c, sg_flat_c = nat.build_sg_sources(idx_c, n_c, geom, (H, W))

    # numpy oracles with native disabled
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    want_dil = m.dilate_mask(mask, 2)
    idx_np, n_np = m.reduce_mask_padded(mask, geom, capacity=cap)
    src_np = sm.build_src_map(idx_np, n_np, geom, (H, W))
    sg_src_np, sg_flat_np = sm.build_sg_sources(idx_np, n_np, geom, (H, W))

    np.testing.assert_array_equal(got_dil, want_dil)
    assert n_c == n_np == n_live
    np.testing.assert_array_equal(idx_c, idx_np)
    np.testing.assert_array_equal(src_c, src_np)
    np.testing.assert_array_equal(sg_src_c, sg_src_np)
    np.testing.assert_array_equal(sg_flat_c, sg_flat_np)


def test_native_empty_and_full(nat):
    geom = BlockGeometry.create(6, 3, 1, 1)
    empty = np.zeros((16, 16), bool)
    assert nat.count_tiles(empty, geom) == 0
    idx, n = nat.reduce_mask_padded(empty, geom, 4, m.SENTINEL)
    assert n == 0 and (idx == m.SENTINEL).all()
    src = nat.build_src_map(idx, n, geom, (16, 16))
    assert (src == -1).all()
    full = np.ones((16, 16), bool)
    n_full = nat.count_tiles(full, geom)
    assert n_full == 25  # ceil((16+1+6-6)/4+1)^2 pooled grid of 5x5
