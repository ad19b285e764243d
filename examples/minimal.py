"""Minimal end-to-end example: one Gather -> 3x3 conv -> Scatter.

The TPU-native equivalent of the reference's canonical demo
(reference: example.py): edit a small region of a random input, run the
dense conv once to cache the original activations, then run the sparse
tile pipeline on the edited input and check it reproduces the dense result
to 1e-4 — while doing a fraction of the MACs.

Run: python examples/minimal.py  (uses the default JAX platform — the TPU
chip if present, CPU otherwise).

When the reference checkout is present, the edit region is the reference's
published golden mask (reference: assets/mask.npy, the exact mask
example.py:68-71 runs its equivalence contract on); otherwise a synthetic
~2% square.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sige_tpu.core import BlockGeometry, build_src_map, reduce_mask_padded
from sige_tpu.core.masks import compute_difference_mask, dilate_mask
from sige_tpu.ops import conv2d_nhwc, gather_tiles, scatter_tiles, tile_conv2d

GOLDEN_MASK = os.environ.get("SIGE_REFERENCE_MASK",
                             "/root/reference/assets/mask.npy")


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    H = W = 256
    Cin, Cout = 16, 32

    # Original input and an edit confined to a small region — the
    # reference's golden mask when available.
    if os.path.isfile(GOLDEN_MASK):
        edit_region = np.load(GOLDEN_MASK)
        H, W = edit_region.shape
        print(f"edit region: golden mask {GOLDEN_MASK} "
              f"({100 * edit_region.mean():.2f}% of {H}x{W})")
    else:
        edit_region = np.zeros((H, W), bool)
        edit_region[96:128, 120:160] = True  # ~2% of the image
    x0 = rng.standard_normal((1, H, W, Cin)).astype(np.float32)
    x1 = x0 + rng.standard_normal((1, H, W, Cin)).astype(np.float32) * edit_region[None, :, :, None]
    x0, x1 = jnp.asarray(x0), jnp.asarray(x1)

    w = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal((Cout,)).astype(np.float32))

    # --- full (dense) path -------------------------------------------------
    dense = jax.jit(lambda x: conv2d_nhwc(x, w, b, padding=1))
    y_full = dense(x1)       # dense reference on the edited input
    y_cache = dense(x0)      # pre-computed cache of the original input

    # --- planning (host, once per edit) ------------------------------------
    mask = compute_difference_mask(np.asarray(x0), np.asarray(x1))
    mask = dilate_mask(mask, 1)
    geom = BlockGeometry.create(block_size=6, kernel_size=3, conv_stride=1, padding=1)
    indices, count = reduce_mask_padded(mask, geom)
    src_map = build_src_map(indices, count, geom, (H, W))
    idx_j, src_j = jnp.asarray(indices), jnp.asarray(src_map)

    # --- sparse path --------------------------------------------------------
    @jax.jit
    def sparse(x, cache, idx, src):
        tiles = gather_tiles(x, idx, jnp.int32(count), geom)
        tiles = tile_conv2d(tiles, w, b)
        return scatter_tiles(tiles, cache, src, geom)

    y_sparse = sparse(x1, y_cache, idx_j, src_j)

    err = float(jnp.abs(y_full - y_sparse).max())
    print(f"Max Error: {err:.6f}")
    assert err < 1e-4, "sparse output diverged from dense reference"

    edit_pct = 100.0 * edit_region.mean()
    full_macs = H * W * Cout * Cin * 9
    bh, bw = geom.block_size
    sparse_macs = count * (bh - 2) * (bw - 2) * Cout * Cin * 9
    print(f"Masked Region: {edit_pct:.2f}%")
    print(f"Active tiles: {count} (buffer capacity {indices.shape[0]})")
    print(f"Full MACs: {full_macs / 1e6:.2f}M")
    print(f"SIGE MACs: {sparse_macs / 1e6:.2f}M ({full_macs / sparse_macs:.1f}x reduction)")

    # --- timing -------------------------------------------------------------
    def timeit(f, *args, iters=50):
        f(*args).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        out.block_until_ready()
        return (time.perf_counter() - t0) / iters * 1e3

    t_dense = timeit(dense, x1)
    t_sparse = timeit(sparse, x1, y_cache, idx_j, src_j)
    print(f"Dense:  {t_dense:.3f} ms")
    print(f"Sparse: {t_sparse:.3f} ms ({t_dense / t_sparse:.2f}x speedup)")


if __name__ == "__main__":
    main()
