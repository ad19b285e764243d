"""Scatter ops, reformulated as deterministic gathers through ownership maps.

The reference engine writes conv-output tiles into a clone of the cached
full-resolution activation, racing benignly on tile overlap
(reference: sige/cpu/scatter.cpp, sige/cuda/scatter_kernel.cu). On TPU we
precompute — once per mask, host-side — an int32 ``owner[H, W]`` map
(:func:`sige_tpu.core.scatter_map.build_owner_map`) and every scatter
becomes "each output pixel reads from its owning tile, else the cache":
a single parallel gather, deterministic, and fusable by XLA.

Ops:
  * :func:`scatter_tiles` — plain scatter into a cached map, optional
    broadcast residual added at covered pixels only
    (reference: sige/cpu/scatter.cpp:4-41).
  * :func:`calibrate_residual` — ``out += x_tile - cached`` over a second
    (shortcut) tile set (reference: sige/cpu/scatter.cpp:43-76).
  * :func:`scatter_with_block_residual` — the two combined, for resblocks
    whose main/shortcut paths use different block sizes
    (reference: sige/cpu/scatter.cpp:115-135).
  * :func:`scatter_gather_tiles` — fused scatter->re-gather between the two
    convs of a resblock, never materializing the full map
    (reference: sige/cpu/scatter_gather.cpp:5-57).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.geometry import BlockGeometry
from .gather import _broadcast_param, _tile_coords, apply_epilogue


def _owner_tile_coords(
    owner: jnp.ndarray,
    indices: jnp.ndarray,
    geom: BlockGeometry,
):
    """For each output pixel, its owning tile id (clamped) plus intra-tile
    coordinates, and the coverage mask. Shapes: owner [..., ], returns
    (oc, ih, iw, covered) with owner's shape."""
    R, S = geom.out_tile_size
    sh, sw = geom.conv_stride
    oh, ow = geom.offset

    covered = owner >= 0
    oc = jnp.maximum(owner, 0)
    # Tile origin in conv-output coordinates (reference: sige/cpu/scatter.cpp:20-21).
    bi_h = (oh + indices[oc, 0].astype(jnp.int32)) // sh
    bi_w = (ow + indices[oc, 1].astype(jnp.int32)) // sw
    if owner.ndim == 2:
        H, W = owner.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    else:
        raise ValueError("owner map must be 2-D")
    ih = jnp.clip(row - bi_h, 0, R - 1)
    iw = jnp.clip(col - bi_w, 0, S - 1)
    return oc, ih, iw, covered


@partial(jax.jit, static_argnames=("geom",))
def scatter_tiles(
    tiles: jnp.ndarray,
    cache: jnp.ndarray,
    owner: jnp.ndarray,
    indices: jnp.ndarray,
    geom: BlockGeometry,
    residual: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scatter conv-output tiles over a cached full map.

    Args:
      tiles: [B * K, R, S, C] conv-output tile batch.
      cache: [B, H, W, C] cached full-map activation (original image).
      owner: [H, W] int32 ownership map for these indices/geometry.
      indices: [K, 2] int32 padded tile top-lefts (input coordinates).
      geom: the paired gather's geometry.
      residual: optional [B, H, W, C]-broadcastable residual, added at
        covered pixels only (uncovered pixels keep the cache value, which
        already includes the original residual).

    Returns: [B, H, W, C] updated full map.
    """
    B, H, W, C = cache.shape
    K = indices.shape[0]
    R, S = geom.out_tile_size
    t = tiles.reshape(B, K, R, S, C)

    oc, ih, iw, covered = _owner_tile_coords(owner, indices, geom)
    fresh = t[:, oc, ih, iw, :]  # [B, H, W, C]
    if residual is not None:
        fresh = fresh + _broadcast_param(residual, cache)
    return jnp.where(covered[None, :, :, None], fresh, cache)


@partial(jax.jit, static_argnames=("geom",))
def calibrate_residual(
    out: jnp.ndarray,
    tiles: jnp.ndarray,
    cached: jnp.ndarray,
    owner: jnp.ndarray,
    indices: jnp.ndarray,
    geom: BlockGeometry,
) -> jnp.ndarray:
    """``out += tile_value - cached`` over the covered pixels of a second
    tile set (reference: sige/cpu/scatter.cpp:43-76)."""
    B, H, W, C = out.shape
    K = indices.shape[0]
    R, S = geom.out_tile_size
    t = tiles.reshape(B, K, R, S, C)
    oc, ih, iw, covered = _owner_tile_coords(owner, indices, geom)
    fresh = t[:, oc, ih, iw, :]
    delta = jnp.where(covered[None, :, :, None], fresh - cached, jnp.zeros((), out.dtype))
    return out + delta


@partial(jax.jit, static_argnames=("main_geom", "shortcut_geom"))
def scatter_with_block_residual(
    main_tiles: jnp.ndarray,
    cache_out: jnp.ndarray,
    shortcut_tiles: jnp.ndarray,
    cache_residual: jnp.ndarray,
    main_owner: jnp.ndarray,
    main_indices: jnp.ndarray,
    main_geom: BlockGeometry,
    shortcut_owner: jnp.ndarray,
    shortcut_indices: jnp.ndarray,
    shortcut_geom: BlockGeometry,
) -> jnp.ndarray:
    """Residual join when main and shortcut paths were gathered with
    different block sizes (reference: sige/cpu/scatter.cpp:115-135).

    ``cache_out`` caches the full-mode sum (main + shortcut);
    ``cache_residual`` caches the full-mode shortcut alone. Main-covered
    pixels get fresh-main + cached-shortcut; shortcut-covered pixels are
    then corrected by (fresh-shortcut - cached-shortcut).
    """
    out = scatter_tiles(
        main_tiles, cache_out, main_owner, main_indices, main_geom,
        residual=cache_residual,
    )
    return calibrate_residual(
        out, shortcut_tiles, cache_residual, shortcut_owner, shortcut_indices,
        shortcut_geom,
    )


@partial(
    jax.jit,
    static_argnames=("geom", "activation", "activation_first"),
)
def scatter_gather_tiles(
    tiles: jnp.ndarray,
    cache: jnp.ndarray,
    owner: jnp.ndarray,
    indices: jnp.ndarray,
    count: jnp.ndarray,
    geom: BlockGeometry,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    activation: str = "identity",
    activation_first: bool = False,
) -> jnp.ndarray:
    """Fused scatter->re-gather between the two convs of a resblock.

    Both convs share one Gather (reference wires ScatterGather to the same
    Gather instance; sige/nn/scatter_gather.py), so ``tiles`` (conv1
    outputs) and the re-gathered output blocks use the *same* index buffer.
    Each re-gathered pixel reads from its owning fresh tile if covered,
    else from the cached full map, then the folded-norm epilogue applies
    (reference: sige/cpu/scatter_gather.cpp:5-57).

    Returns: [B * K, bh, bw, C] tile batch feeding conv2.
    """
    B, H, W, C = cache.shape
    K = indices.shape[0]
    R, S = geom.out_tile_size
    bh, bw = geom.block_size
    t = tiles.reshape(B, K, R, S, C)

    # Re-gather coordinate grids over the *output* map — identical to the
    # input-space tile coords because this op only exists between stride-1
    # convs whose output aligns with the padded input
    # (reference: sige/cpu/scatter_gather.cpp:24-27 uses raw indices).
    rows, cols = _tile_coords(indices, bh, bw)  # [K, bh, 1], [K, 1, bw]
    inb = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)
    live = jnp.arange(K, dtype=jnp.int32) < count
    inb = inb & live[:, None, None]  # [K, bh, bw]
    rc = jnp.clip(rows, 0, H - 1)
    cc = jnp.clip(cols, 0, W - 1)

    o = owner[rc, cc]  # [K, bh, bw]
    oc, covered = jnp.maximum(o, 0), o >= 0
    sh, sw = geom.conv_stride
    oh, ow = geom.offset
    bi_h = (oh + indices[oc, 0].astype(jnp.int32)) // sh
    bi_w = (ow + indices[oc, 1].astype(jnp.int32)) // sw
    ih = jnp.clip(rc - bi_h, 0, R - 1)
    iw = jnp.clip(cc - bi_w, 0, S - 1)

    fresh = t[:, oc, ih, iw, :]        # [B, K, bh, bw, C]
    cached = cache[:, rc, cc, :]       # [B, K, bh, bw, C]
    z = jnp.where(covered[None, :, :, :, None], fresh, cached)

    scale = _broadcast_param(scale, cache)
    shift = _broadcast_param(shift, cache)

    def gather_param(p):
        if p is None:
            return None
        if p.shape[1] == 1 and p.shape[2] == 1:
            return p[:, None]
        return p[:, rc, cc, :]

    z = apply_epilogue(z, gather_param(scale), gather_param(shift), activation, activation_first)
    z = jnp.where(inb[None, :, :, :, None], z, jnp.zeros((), z.dtype))
    return z.reshape(B * K, bh, bw, C)
