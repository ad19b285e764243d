"""Scatter ops, reformulated as deterministic gathers through host-planned
source-index maps.

The reference engine writes conv-output tiles into a clone of the cached
full-resolution activation, racing benignly on tile overlap
(reference: sige/cpu/scatter.cpp, sige/cuda/scatter_kernel.cu). On TPU we
precompute — once per mask, host-side — a per-pixel flat source index into
the tile-pixel axis (:func:`sige_tpu.core.scatter_map.build_src_map`), and
every scatter becomes "each output pixel reads from its source tile pixel,
else the cache": ONE large-table ``jnp.take`` plus a select, fully
deterministic (source = highest covering tile, the reference's sequential
last-writer-wins).

Performance note: all device-side index *computation* is eliminated —
earlier formulations computed per-pixel tile origins with tiny-table
gathers (``take(indices[:, 0], owner)``), which XLA TPU lowers to ~0.6 ms
scalar loops per scatter at 256^2.

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
from .gather import _broadcast_param, apply_epilogue


@partial(jax.jit, static_argnames=("geom",))
def scatter_tiles(
    tiles: jnp.ndarray,
    cache: jnp.ndarray,
    src_map: jnp.ndarray,
    geom: BlockGeometry,
    residual: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scatter conv-output tiles over a cached full map.

    Args:
      tiles: [B * K, R, S, C] conv-output tile batch.
      cache: [B, H, W, C] cached full-map activation (original image).
      src_map: [H, W] int32 flat tile-pixel source index (-1 = keep cache),
        from :func:`~sige_tpu.core.scatter_map.build_src_map`.
      geom: the paired gather's geometry (tile extent R, S).
      residual: optional [B, H, W, C]-broadcastable residual, added at
        covered pixels only (uncovered pixels keep the cache value, which
        already includes the original residual).

    Returns: [B, H, W, C] updated full map.
    """
    B, H, W, C = cache.shape
    R, S = geom.out_tile_size
    K = tiles.shape[0] // B
    t = tiles.reshape(B, K * R * S, C)

    src = src_map.reshape(-1)
    fresh = jnp.take(t, jnp.maximum(src, 0), axis=1).reshape(B, H, W, C)
    if residual is not None:
        fresh = fresh + _broadcast_param(residual, cache)
    covered = (src_map >= 0)[None, :, :, None]
    return jnp.where(covered, fresh, cache)


def _slice_box(full, origin, BH, BW):
    """Dynamic [B, BH, BW, C] window of a full map at ``origin`` (r0, c0)."""
    B, _, _, C = full.shape
    zero = jnp.int32(0)
    return jax.lax.dynamic_slice(
        full, (zero, origin[0], origin[1], zero), (B, BH, BW, C))


@partial(jax.jit, static_argnames=("geom",))
def scatter_tiles_box(
    tiles: jnp.ndarray,
    cache: jnp.ndarray,
    src_box: jnp.ndarray,
    origin: jnp.ndarray,
    geom: BlockGeometry,
    residual: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Bounding-box form of :func:`scatter_tiles` — the TPU-native join.

    A full-map gather producing H*W rows from a small tile table runs at
    gather throughput over the WHOLE map (~100us at 256^2x128 on v5e)
    even though only the covered ~1-3% changes. The planner therefore
    crops the source map to the bounding box of the covered pixels
    (``src_box`` [BH, BW], ``origin`` = (r0, c0) int32[2], dims bucketed
    so the program is reused across edits): the join becomes a tiny
    gather + select over the box and ONE ``dynamic_update_slice`` into
    the cache. Cost scales with the edit's bbox, not the canvas; with
    box == whole map it degenerates to :func:`scatter_tiles`.
    """
    B, H, W, C = cache.shape
    R, S = geom.out_tile_size
    K = tiles.shape[0] // B
    t = tiles.reshape(B, K * R * S, C)
    BH, BW = src_box.shape
    fresh = jnp.take(t, jnp.maximum(src_box.reshape(-1), 0),
                     axis=1).reshape(B, BH, BW, C)
    sl = _slice_box(cache, origin, BH, BW)
    if residual is not None:
        r = _broadcast_param(residual, cache)
        if r.shape[1] == H and r.shape[2] == W:
            r = _slice_box(r, origin, BH, BW)
        fresh = fresh + r
    upd = jnp.where((src_box >= 0)[None, :, :, None], fresh, sl)
    zero = jnp.int32(0)
    return jax.lax.dynamic_update_slice(
        cache, upd, (zero, origin[0], origin[1], zero))


@partial(jax.jit, static_argnames=("main_geom", "shortcut_geom"))
def scatter_with_block_residual_box(
    main_tiles: jnp.ndarray,
    cache_out: jnp.ndarray,
    shortcut_tiles: jnp.ndarray,
    cache_residual: jnp.ndarray,
    main_src_box: jnp.ndarray,
    main_origin: jnp.ndarray,
    main_geom: BlockGeometry,
    shortcut_src_box: jnp.ndarray,
    shortcut_origin: jnp.ndarray,
    shortcut_geom: BlockGeometry,
) -> jnp.ndarray:
    """Bounding-box form of :func:`scatter_with_block_residual`: two
    staged box updates (main join, then the shortcut delta correction),
    each touching only its own bbox."""
    B, H, W, C = cache_out.shape
    Rm, Sm = main_geom.out_tile_size
    Rs, Ss = shortcut_geom.out_tile_size
    Km = main_tiles.shape[0] // B
    Ks = shortcut_tiles.shape[0] // B
    tm = main_tiles.reshape(B, Km * Rm * Sm, C)
    ts = shortcut_tiles.reshape(B, Ks * Rs * Ss, C)
    zero = jnp.int32(0)

    MH, MW = main_src_box.shape
    fresh_m = jnp.take(tm, jnp.maximum(main_src_box.reshape(-1), 0),
                       axis=1).reshape(B, MH, MW, C)
    y1_m = _slice_box(cache_residual, main_origin, MH, MW)
    y0_m = _slice_box(cache_out, main_origin, MH, MW)
    box_m = jnp.where((main_src_box >= 0)[None, :, :, None],
                      fresh_m + y1_m, y0_m)
    out = jax.lax.dynamic_update_slice(
        cache_out, box_m, (zero, main_origin[0], main_origin[1], zero))

    SH, SW = shortcut_src_box.shape
    fresh_s = jnp.take(ts, jnp.maximum(shortcut_src_box.reshape(-1), 0),
                       axis=1).reshape(B, SH, SW, C)
    y1_s = _slice_box(cache_residual, shortcut_origin, SH, SW)
    base = _slice_box(out, shortcut_origin, SH, SW)
    delta = jnp.where((shortcut_src_box >= 0)[None, :, :, None],
                      fresh_s - y1_s, jnp.zeros((), base.dtype))
    return jax.lax.dynamic_update_slice(
        out, base + delta, (zero, shortcut_origin[0], shortcut_origin[1], zero))


@partial(jax.jit, static_argnames=("geom",))
def materialize_tiles_box(
    tile_state: jnp.ndarray,
    cache: jnp.ndarray,
    pix_box: jnp.ndarray,
    origin: jnp.ndarray,
    geom: BlockGeometry,
) -> jnp.ndarray:
    """Bounding-box form of :func:`materialize_tiles`."""
    B, H, W, C = cache.shape
    bh, bw = geom.block_size
    K = tile_state.shape[0] // B
    t = tile_state.reshape(B, K * bh * bw, C)
    BH, BW = pix_box.shape
    fresh = jnp.take(t, jnp.maximum(pix_box.reshape(-1), 0),
                     axis=1).reshape(B, BH, BW, C)
    sl = _slice_box(cache, origin, BH, BW)
    upd = jnp.where((pix_box >= 0)[None, :, :, None], fresh, sl)
    zero = jnp.int32(0)
    return jax.lax.dynamic_update_slice(
        cache, upd, (zero, origin[0], origin[1], zero))


@partial(jax.jit, static_argnames=("geom",))
def calibrate_residual(
    out: jnp.ndarray,
    tiles: jnp.ndarray,
    cached: jnp.ndarray,
    src_map: jnp.ndarray,
    geom: BlockGeometry,
) -> jnp.ndarray:
    """``out += tile_value - cached`` over the covered pixels of a second
    tile set (reference: sige/cpu/scatter.cpp:43-76)."""
    B, H, W, C = out.shape
    R, S = geom.out_tile_size
    K = tiles.shape[0] // B
    t = tiles.reshape(B, K * R * S, C)
    src = src_map.reshape(-1)
    fresh = jnp.take(t, jnp.maximum(src, 0), axis=1).reshape(B, H, W, C)
    covered = (src_map >= 0)[None, :, :, None]
    delta = jnp.where(covered, fresh - cached, jnp.zeros((), out.dtype))
    return out + delta


@partial(jax.jit, static_argnames=("main_geom", "shortcut_geom"))
def scatter_with_block_residual(
    main_tiles: jnp.ndarray,
    cache_out: jnp.ndarray,
    shortcut_tiles: jnp.ndarray,
    cache_residual: jnp.ndarray,
    main_src_map: jnp.ndarray,
    main_geom: BlockGeometry,
    shortcut_src_map: jnp.ndarray,
    shortcut_geom: BlockGeometry,
) -> jnp.ndarray:
    """Residual join when main and shortcut paths were gathered with
    different block sizes (reference: sige/cpu/scatter.cpp:115-135).

    ``cache_out`` caches the full-mode sum (main + shortcut);
    ``cache_residual`` caches the full-mode shortcut alone. Main-covered
    pixels get fresh-main + cached-shortcut; shortcut-covered pixels are
    then corrected by (fresh-shortcut - cached-shortcut).
    """
    # Single fused full-map pass (a scatter_tiles + calibrate_residual
    # composition would stream the 4 full maps twice):
    #   out = main_cov ? fresh_main + y1 : y0
    #       + (short_cov ? fresh_short - y1 : 0)
    B, H, W, C = cache_out.shape
    Rm, Sm = main_geom.out_tile_size
    Rs, Ss = shortcut_geom.out_tile_size
    Km = main_tiles.shape[0] // B
    Ks = shortcut_tiles.shape[0] // B
    tm = main_tiles.reshape(B, Km * Rm * Sm, C)
    ts = shortcut_tiles.reshape(B, Ks * Rs * Ss, C)
    m_src = main_src_map.reshape(-1)
    s_src = shortcut_src_map.reshape(-1)
    fresh_m = jnp.take(tm, jnp.maximum(m_src, 0), axis=1).reshape(B, H, W, C)
    fresh_s = jnp.take(ts, jnp.maximum(s_src, 0), axis=1).reshape(B, H, W, C)
    m_cov = (main_src_map >= 0)[None, :, :, None]
    s_cov = (shortcut_src_map >= 0)[None, :, :, None]
    out = jnp.where(m_cov, fresh_m + cache_residual, cache_out)
    delta = jnp.where(s_cov, fresh_s - cache_residual,
                      jnp.zeros((), out.dtype))
    return out + delta


@partial(
    jax.jit,
    static_argnames=("geom", "activation", "activation_first"),
)
def scatter_gather_tiles(
    tiles: jnp.ndarray,
    cache: jnp.ndarray,
    sg_src: jnp.ndarray,
    sg_flat: jnp.ndarray,
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
    Each re-gathered pixel reads from its source fresh tile pixel
    (``sg_src >= 0``), from the cached full map (``sg_src == -1``), or is
    exact zero (``sg_src == -2``: out of bounds / dead tile), then the
    folded-norm epilogue applies (reference: sige/cpu/scatter_gather.cpp).

    Args:
      tiles: [B * K, R, S, C] conv1-output tile batch.
      cache: [B, H, W, C] cached conv1 full map.
      sg_src / sg_flat: [K * bh * bw] int32 host-planned lookups
        (:func:`~sige_tpu.core.scatter_map.build_sg_sources`).

    Returns: [B * K, bh, bw, C] tile batch feeding conv2.
    """
    B, H, W, C = cache.shape
    R, S = geom.out_tile_size
    bh, bw = geom.block_size
    K = tiles.shape[0] // B
    t = tiles.reshape(B, K * R * S, C)

    fresh = jnp.take(t, jnp.maximum(sg_src, 0), axis=1)          # [B, N, C]
    cached = jnp.take(cache.reshape(B, H * W, C), sg_flat, axis=1)
    z = jnp.where((sg_src >= 0)[None, :, None], fresh, cached)

    scale = _broadcast_param(scale, cache)
    shift = _broadcast_param(shift, cache)

    def gather_param(p):
        if p is None:
            return None
        if p.shape[1] == 1 and p.shape[2] == 1:
            return p.reshape(p.shape[0], 1, p.shape[3])
        return jnp.take(p.reshape(p.shape[0], -1, p.shape[3]), sg_flat, axis=1)

    z = apply_epilogue(z, gather_param(scale), gather_param(shift),
                       activation, activation_first)
    z = jnp.where((sg_src >= -1)[None, :, None], z, jnp.zeros((), z.dtype))
    return z.reshape(B, K, bh, bw, C).reshape(B * K, bh, bw, C)


@partial(
    jax.jit,
    static_argnames=("geom", "activation", "activation_first"),
)
def scatter_gather_residual_tiles(
    tiles: jnp.ndarray,
    cache: jnp.ndarray,
    res_tiles: jnp.ndarray,
    sg_src: jnp.ndarray,
    sg_flat: jnp.ndarray,
    geom: BlockGeometry,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    activation: str = "identity",
    activation_first: bool = False,
) -> jnp.ndarray:
    """Fused residual join evaluated at gather positions (tile-resident
    chains): for each gather-position pixel,

        z = covered ? conv2_tile_px + residual_tile_px : cached_px

    This is a resblock join (reference: sige/nn/scatter.py residual path)
    that never materializes the full map — the residual arrives as tiles at
    the SAME gather positions (the chain's carried state). OOB pixels are
    exact zero."""
    B, H, W, C = cache.shape
    R, S = geom.out_tile_size
    bh, bw = geom.block_size
    K = tiles.shape[0] // B
    t = tiles.reshape(B, K * R * S, C)
    r = res_tiles.reshape(B, K * bh * bw, C)

    fresh = jnp.take(t, jnp.maximum(sg_src, 0), axis=1) + r
    cached = jnp.take(cache.reshape(B, H * W, C), sg_flat, axis=1)
    z = jnp.where((sg_src >= 0)[None, :, None], fresh, cached)
    scale = _broadcast_param(scale, cache)
    shift = _broadcast_param(shift, cache)
    sc = scale.reshape(scale.shape[0], 1, scale.shape[3]) if scale is not None else None
    sh = shift.reshape(shift.shape[0], 1, shift.shape[3]) if shift is not None else None
    z = apply_epilogue(z, sc, sh, activation, activation_first)
    z = jnp.where((sg_src >= -1)[None, :, None], z, jnp.zeros((), z.dtype))
    return z.reshape(B, K, bh, bw, C).reshape(B * K, bh, bw, C)


@partial(jax.jit, static_argnames=("geom",))
def materialize_tiles(
    tile_state: jnp.ndarray,
    cache: jnp.ndarray,
    pix_src: jnp.ndarray,
    geom: BlockGeometry,
) -> jnp.ndarray:
    """Turn a tile-resident chain state back into a full map.

    Gather positions cover every pixel the chain could have changed;
    uncovered pixels keep the last join's cached value. ``pix_src`` maps
    each output pixel to a covering gather-position pixel (-1 uncovered),
    planned host-side with the gather-block pseudo-geometry."""
    B, H, W, C = cache.shape
    bh, bw = geom.block_size
    K = tile_state.shape[0] // B
    t = tile_state.reshape(B, K * bh * bw, C)
    src = pix_src.reshape(-1)
    fresh = jnp.take(t, jnp.maximum(src, 0), axis=1).reshape(B, H, W, C)
    covered = (pix_src >= 0)[None, :, :, None]
    return jnp.where(covered, fresh, cache)
