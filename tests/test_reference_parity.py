"""Cross-implementation parity: sige_tpu ops vs the ACTUAL reference engine.

Builds the reference's CPU extension (/root/reference/sige/cpu, torch
cpp_extension + OpenMP) as a torch oracle and compares every core op —
gather / scatter / scatter_with_block_residual / scatter_gather /
get_scatter_map — plus the mask-utility pipeline, on random masks and
inputs, to 1e-5.  This converts the repo's self-consistency tests
(sparse == own dense) into true cross-implementation validation
(reference: example.py:94-95 contract).

Conventions bridged here:
  * reference is NCHW; sige_tpu is NHWC (TPU-native) — transposed at the
    boundary;
  * reference scatter kernels race benignly on tile overlap (identical
    values assumed; sige/cuda/scatter_kernel.cu:37-43) — tests therefore
    build *value-consistent* tiles (sliced from one full map) so overlap
    order cannot matter;
  * sige_tpu index buffers may be SENTINEL-padded; the reference's are
    exact — tests check both the exact and the padded form.

Skipped (not failed) when the extension cannot build in this image.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sige_tpu.core.geometry import BlockGeometry
from sige_tpu.core.masks import (
    SENTINEL,
    compute_difference_mask,
    dilate_mask,
    downsample_mask,
    reduce_mask,
    reduce_mask_padded,
)
from sige_tpu.core.scatter_map import build_sg_sources, build_src_map
from sige_tpu.ops.gather import gather_tiles
from sige_tpu.ops.scatter import (
    scatter_gather_tiles,
    scatter_tiles,
    scatter_with_block_residual,
)

from ref_oracle import REF_ROOT, install_reference, load_ref_cpu


@pytest.fixture(scope="session")
def ref_cpu():
    """The reference sige.cpu extension, built once (ninja-cached)."""
    if not os.path.isdir(os.path.join(REF_ROOT, "sige", "cpu")):
        pytest.skip("reference tree not present")
    try:
        return load_ref_cpu()
    except Exception as e:  # pragma: no cover - environment dependent
        pytest.skip(f"reference CPU extension unavailable: {e}")


@pytest.fixture(scope="session")
def sige_ref(ref_cpu):
    """The reference Python package with its cpu backend registered."""
    return install_reference()


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2))))


def nhwc(x_nchw: torch.Tensor) -> np.ndarray:
    return np.transpose(x_nchw.detach().numpy(), (0, 2, 3, 1))


def blob_mask(rng, hw, n_blobs=3, max_side=9) -> np.ndarray:
    H, W = hw
    m = np.zeros((H, W), dtype=bool)
    for _ in range(n_blobs):
        h = int(rng.integers(1, max_side))
        w = int(rng.integers(1, max_side))
        r = int(rng.integers(0, max(H - h, 1)))
        c = int(rng.integers(0, max(W - w, 1)))
        m[r : r + h, c : c + w] = True
    return m


def consistent_tiles(rng, indices, geom, B, C, out_hw):
    """Conv-output tiles sliced from ONE random full map, so overlapping
    tiles carry identical values (the reference's benign-race contract)."""
    H, W = out_hw
    R, S = geom.out_tile_size
    full = rng.standard_normal((B, H, W, C)).astype(np.float32)
    n = indices.shape[0]
    tiles = np.zeros((B, n, R, S, C), dtype=np.float32)
    for i in range(n):
        oh, ow = geom.out_tile_origin(int(indices[i, 0]), int(indices[i, 1]))
        for r in range(R):
            for s in range(S):
                h, w = oh + r, ow + s
                if 0 <= h < H and 0 <= w < W:
                    tiles[:, i, r, s] = full[:, h, w]
                else:
                    tiles[:, i, r, s] = rng.standard_normal((B, C))
    return tiles.reshape(B * n, R, S, C)


GEOMS = [
    # (requested block, kernel, stride, padding) — the reference's block-6
    # 3x3 resblock conv, block-4 1x1 shortcut, and a strided downsample.
    BlockGeometry.create(6, 3, 1, 1),
    BlockGeometry.create(4, 1, 1, 0),
    BlockGeometry.create(6, 3, 2, 1),
]


def geom_indices(rng, geom, hw):
    mask = blob_mask(rng, hw)
    idx = reduce_mask(mask, geom)
    assert idx.shape[0] > 0
    return mask, idx


# ---------------------------------------------------------------------------
# mask utilities vs reference sige.utils (pure torch)
# ---------------------------------------------------------------------------

class TestMaskUtils:
    def test_reduce_mask(self, sige_ref, rng):
        for geom in GEOMS:
            for hw in [(32, 32), (64, 64), (31, 47)]:
                mask, mine = geom_indices(rng, geom, hw)
                ref = sige_ref.utils.reduce_mask(
                    torch.from_numpy(mask),
                    geom.block_size,
                    geom.block_stride,
                    geom.offset,
                )
                np.testing.assert_array_equal(mine, ref.numpy())

    def test_reduce_mask_padded_prefix(self, sige_ref, rng):
        geom = GEOMS[0]
        mask, _ = geom_indices(rng, geom, (64, 64))
        ref = sige_ref.utils.reduce_mask(
            torch.from_numpy(mask), geom.block_size, geom.block_stride, geom.offset
        ).numpy()
        idx, n = reduce_mask_padded(mask, geom)
        assert n == ref.shape[0]
        np.testing.assert_array_equal(idx[:n], ref)
        assert (idx[n:] == SENTINEL).all()

    def test_dilate_mask(self, sige_ref, rng):
        for dilation in [0, 1, 2, (1, 2), (3, 0)]:
            mask = blob_mask(rng, (40, 56))
            ref = sige_ref.utils.dilate_mask(torch.from_numpy(mask), dilation)
            np.testing.assert_array_equal(dilate_mask(mask, dilation), ref.numpy())

    def test_difference_mask(self, sige_ref, rng):
        a = rng.standard_normal((1, 24, 24, 3)).astype(np.float32)
        b = a.copy()
        b[0, 4:9, 6:14] += rng.standard_normal((5, 8, 3)).astype(np.float32)
        ref = sige_ref.utils.compute_difference_mask(nchw(a), nchw(b), eps=2e-2)
        np.testing.assert_array_equal(
            compute_difference_mask(a, b, eps=2e-2), ref.numpy()
        )

    def test_downsample_mask(self, sige_ref, rng):
        mask = blob_mask(rng, (64, 64))
        ref = sige_ref.utils.downsample_mask(
            torch.from_numpy(mask), min_res=4, dilation=1
        )
        mine = downsample_mask(mask, min_res=4, dilation=1)
        assert set(mine.keys()) == set(ref.keys())
        for k in ref:
            np.testing.assert_array_equal(
                mine[k], ref[k].numpy(), err_msg=f"pyramid level {k}"
            )


# ---------------------------------------------------------------------------
# gather
# ---------------------------------------------------------------------------

EPILOGUES = [
    # (scale shape, shift shape, activation, activation_first)
    (None, None, "identity", False),
    ("C", "C", "identity", False),
    ("C", "C", "swish", False),
    ("C", None, "swish", True),
    ("BC", "BC", "identity", False),
]


def make_param(rng, spec, B, C, H, W):
    """Returns (mine, ref) forms of an epilogue param."""
    if spec is None:
        return None, None
    if spec == "C":
        p = rng.standard_normal((C,)).astype(np.float32)
        return p, torch.from_numpy(p.reshape(1, C, 1, 1))
    if spec == "BC":
        p = rng.standard_normal((B, C)).astype(np.float32)
        return p, torch.from_numpy(p.reshape(B, C, 1, 1))
    if spec == "BCHW":
        p = rng.standard_normal((B, H, W, C)).astype(np.float32)
        return p, nchw(p)
    raise ValueError(spec)


class TestGatherParity:
    @pytest.mark.parametrize("geom", GEOMS)
    @pytest.mark.parametrize("spec", EPILOGUES)
    def test_gather(self, ref_cpu, rng, geom, spec):
        B, C, H, W = 2, 5, 32, 32
        scale_spec, shift_spec, act, act_first = spec
        mask, idx = geom_indices(rng, geom, (H, W))
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        scale, scale_t = make_param(rng, scale_spec, B, C, H, W)
        shift, shift_t = make_param(rng, shift_spec, B, C, H, W)

        ref = ref_cpu.gather(
            nchw(x),
            geom.block_size[0],
            geom.block_size[1],
            torch.from_numpy(idx),
            scale_t,
            shift_t,
            act,
            act_first,
        )
        mine = gather_tiles(
            x,
            idx,
            np.int32(idx.shape[0]),
            geom,
            scale=None if scale is None else np.asarray(scale),
            shift=None if shift is None else np.asarray(shift),
            activation=act,
            activation_first=act_first,
        )
        np.testing.assert_allclose(
            np.asarray(mine), nhwc(ref), rtol=1e-5, atol=1e-5
        )

    def test_gather_spatial_param(self, ref_cpu, rng):
        """Spatially-varying scale/shift (the SPADE gamma/beta case)."""
        geom = GEOMS[0]
        B, C, H, W = 1, 4, 32, 32
        _, idx = geom_indices(rng, geom, (H, W))
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        scale, scale_t = make_param(rng, "BCHW", B, C, H, W)
        shift, shift_t = make_param(rng, "BCHW", B, C, H, W)
        ref = ref_cpu.gather(
            nchw(x), geom.block_size[0], geom.block_size[1],
            torch.from_numpy(idx), scale_t, shift_t, "swish", False,
        )
        mine = gather_tiles(
            x, idx, np.int32(idx.shape[0]), geom,
            scale=scale, shift=shift, activation="swish",
        )
        np.testing.assert_allclose(np.asarray(mine), nhwc(ref), rtol=1e-5, atol=1e-5)

    def test_gather_padded_buffer(self, ref_cpu, rng):
        """SENTINEL-padded buffers: live rows match the reference, padded
        rows are exactly zero."""
        geom = GEOMS[0]
        B, C, H, W = 1, 3, 32, 32
        mask, _ = geom_indices(rng, geom, (H, W))
        idx, n = reduce_mask_padded(mask, geom, capacity=64)
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        ref = ref_cpu.gather(
            nchw(x), geom.block_size[0], geom.block_size[1],
            torch.from_numpy(idx[:n]), None, None, "identity", False,
        )
        mine = np.asarray(gather_tiles(x, idx, np.int32(n), geom))
        bh, bw = geom.block_size
        mine = mine.reshape(B, 64, bh, bw, C)
        np.testing.assert_allclose(
            mine[:, :n].reshape(B * n, bh, bw, C), nhwc(ref), rtol=1e-5, atol=1e-5
        )
        assert (mine[:, n:] == 0).all()


# ---------------------------------------------------------------------------
# scatter / scatter_with_block_residual
# ---------------------------------------------------------------------------

class TestScatterParity:
    @pytest.mark.parametrize("geom", GEOMS)
    @pytest.mark.parametrize("residual_spec", [None, "C", "BCHW"])
    def test_scatter(self, ref_cpu, rng, geom, residual_spec):
        B, C, H, W = 2, 5, 32, 32
        sh, sw = geom.conv_stride
        out_hw = (H // sh, W // sw)
        _, idx = geom_indices(rng, geom, (H, W))
        tiles = consistent_tiles(rng, idx, geom, B, C, out_hw)
        cache = rng.standard_normal((B, *out_hw, C)).astype(np.float32)
        residual, residual_t = make_param(rng, residual_spec, B, C, *out_hw)

        ref = ref_cpu.scatter(
            nchw(tiles),
            nchw(cache),
            geom.offset[0], geom.offset[1],
            sh, sw,
            torch.from_numpy(idx),
            residual_t,
        )
        src_map = build_src_map(idx, None, geom, out_hw)
        mine = scatter_tiles(
            tiles, cache, src_map, geom,
            residual=None if residual is None else np.asarray(residual),
        )
        np.testing.assert_allclose(np.asarray(mine), nhwc(ref), rtol=1e-5, atol=1e-5)

    def test_scatter_with_block_residual(self, ref_cpu, rng):
        main = GEOMS[0]      # block 6, 3x3
        shortcut = GEOMS[1]  # block 4, 1x1
        B, C, H, W = 2, 4, 32, 32
        out_hw = (H, W)
        mask = blob_mask(rng, (H, W))
        idx_m = reduce_mask(mask, main)
        idx_s = reduce_mask(mask, shortcut)
        tiles_m = consistent_tiles(rng, idx_m, main, B, C, out_hw)
        tiles_s = consistent_tiles(rng, idx_s, shortcut, B, C, out_hw)
        y0 = rng.standard_normal((B, H, W, C)).astype(np.float32)
        y1 = rng.standard_normal((B, H, W, C)).astype(np.float32)

        ref = ref_cpu.scatter_with_block_residual(
            nchw(tiles_m), nchw(y0), nchw(tiles_s), nchw(y1),
            main.offset[0], main.offset[1],
            main.conv_stride[0], main.conv_stride[1],
            torch.from_numpy(idx_m), torch.from_numpy(idx_s),
        )
        mine = scatter_with_block_residual(
            tiles_m, y0, tiles_s, y1,
            build_src_map(idx_m, None, main, out_hw), main,
            build_src_map(idx_s, None, shortcut, out_hw), shortcut,
        )
        np.testing.assert_allclose(np.asarray(mine), nhwc(ref), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# scatter_gather + get_scatter_map
# ---------------------------------------------------------------------------

class TestScatterGatherParity:
    @pytest.mark.parametrize("geom", GEOMS[:2])
    @pytest.mark.parametrize("spec", EPILOGUES)
    def test_scatter_gather(self, ref_cpu, rng, geom, spec):
        B, C, H, W = 2, 4, 32, 32
        scale_spec, shift_spec, act, act_first = spec
        _, idx = geom_indices(rng, geom, (H, W))
        # conv1-output tiles over the same index buffer (shared Gather;
        # reference: sige/nn/scatter_gather.py)
        tiles = consistent_tiles(rng, idx, geom, B, C, (H, W))
        cache = rng.standard_normal((B, H, W, C)).astype(np.float32)
        scale, scale_t = make_param(rng, scale_spec, B, C, H, W)
        shift, shift_t = make_param(rng, shift_spec, B, C, H, W)

        smap = ref_cpu.get_scatter_map(
            H, W,
            geom.block_size[0], geom.block_size[1],
            geom.kernel_size[0], geom.kernel_size[1],
            geom.offset[0], geom.offset[1],
            geom.conv_stride[0], geom.conv_stride[1],
            torch.from_numpy(idx),
        )
        ref = ref_cpu.scatter_gather(
            nchw(tiles), nchw(cache),
            geom.block_size[0], geom.block_size[1],
            torch.from_numpy(idx), smap,
            scale_t, shift_t, act, act_first,
        )
        sg_src, sg_flat = build_sg_sources(idx, None, geom, (H, W))
        mine = scatter_gather_tiles(
            tiles, cache, sg_src, sg_flat, geom,
            scale=None if scale is None else np.asarray(scale),
            shift=None if shift is None else np.asarray(shift),
            activation=act, activation_first=act_first,
        )
        np.testing.assert_allclose(np.asarray(mine), nhwc(ref), rtol=1e-5, atol=1e-5)

    def test_scatter_map_coverage(self, ref_cpu, rng):
        """My src_map covers exactly the pixels the reference's scatter map
        covers (ownership may differ on overlaps; coverage may not)."""
        for geom in GEOMS:
            H = W = 32
            sh, sw = geom.conv_stride
            oh_, ow_ = H // sh, W // sw
            _, idx = geom_indices(rng, geom, (H, W))
            smap = ref_cpu.get_scatter_map(
                oh_, ow_,
                geom.block_size[0], geom.block_size[1],
                geom.kernel_size[0], geom.kernel_size[1],
                geom.offset[0], geom.offset[1],
                sh, sw,
                torch.from_numpy(idx),
            ).numpy()
            mine = build_src_map(idx, None, geom, (oh_, ow_))
            np.testing.assert_array_equal(mine >= 0, smap[:, :, 0] >= 0)


# ---------------------------------------------------------------------------
# golden mask asset (reference: assets/mask.npy — the exact published mask
# example.py:57-95 runs its equivalence contract on)
# ---------------------------------------------------------------------------

GOLDEN_MASK = os.path.join(REF_ROOT, "assets", "mask.npy")


@pytest.fixture(scope="session")
def golden_mask():
    if not os.path.isfile(GOLDEN_MASK):
        pytest.skip("reference assets/mask.npy not present")
    return np.load(GOLDEN_MASK)


class TestGoldenMask:
    """The reference's published-mask contract, not just random masks."""

    def test_three_phase_equivalence(self, golden_mask, rng):
        """example.py's exact protocol on the exact mask: full on edited,
        full on original (cache), sparse on edited — allclose to 1e-4.
        (reference: example.py:68-95)"""
        import jax
        import jax.numpy as jnp

        from sige_tpu.ops import conv2d_nhwc, tile_conv2d

        H, W = golden_mask.shape
        Cin, Cout = 16, 32
        x0 = rng.standard_normal((1, H, W, Cin)).astype(np.float32)
        x1 = x0 + (rng.standard_normal((1, H, W, Cin)).astype(np.float32)
                   * golden_mask[None, :, :, None])
        w = rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32) * 0.1
        b = rng.standard_normal((Cout,)).astype(np.float32)

        dense = jax.jit(lambda x: conv2d_nhwc(jnp.asarray(x), w, b, padding=1))
        y_full = np.asarray(dense(x1))
        y_cache = dense(x0)

        geom = BlockGeometry.create(6, 3, 1, 1)
        idx, count = reduce_mask_padded(golden_mask, geom)
        src_map = build_src_map(idx, count, geom, (H, W))

        tiles = gather_tiles(jnp.asarray(x1), jnp.asarray(idx),
                             jnp.int32(count), geom)
        tiles = tile_conv2d(tiles, w, b)
        y_sparse = np.asarray(
            scatter_tiles(tiles, y_cache, jnp.asarray(src_map), geom))
        np.testing.assert_allclose(y_sparse, y_full, atol=1e-4, rtol=0)

    def test_op_parity_on_golden_mask(self, ref_cpu, golden_mask, rng):
        """Op-level oracle parity on the exact published mask."""
        geom = BlockGeometry.create(6, 3, 1, 1)
        H, W = golden_mask.shape
        idx = reduce_mask(golden_mask, geom)
        assert idx.shape[0] > 0
        B, C = 1, 8
        x = rng.standard_normal((B, H, W, C)).astype(np.float32)
        ref = ref_cpu.gather(
            nchw(x), geom.block_size[0], geom.block_size[1],
            torch.from_numpy(idx), None, None, "swish", False)
        mine = gather_tiles(x, idx, np.int32(idx.shape[0]), geom,
                            activation="swish")
        np.testing.assert_allclose(np.asarray(mine), nhwc(ref),
                                   rtol=1e-5, atol=1e-5)

        tiles = consistent_tiles(rng, idx, geom, B, C, (H, W))
        cache = rng.standard_normal((B, H, W, C)).astype(np.float32)
        ref_s = ref_cpu.scatter(
            nchw(tiles), nchw(cache), geom.offset[0], geom.offset[1],
            1, 1, torch.from_numpy(idx), None)
        mine_s = scatter_tiles(tiles, cache,
                               build_src_map(idx, None, geom, (H, W)), geom)
        np.testing.assert_allclose(np.asarray(mine_s), nhwc(ref_s),
                                   rtol=1e-5, atol=1e-5)

    def test_reduce_mask_parity_on_golden_mask(self, sige_ref, golden_mask):
        for geom in GEOMS:
            mine = reduce_mask(golden_mask, geom)
            ref = sige_ref.utils.reduce_mask(
                torch.from_numpy(golden_mask), geom.block_size,
                geom.block_stride, geom.offset)
            np.testing.assert_array_equal(mine, ref.numpy())
