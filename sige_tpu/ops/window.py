"""Window-mode execution ops: contiguous crop windows instead of tiles.

For a compact edit region, the active tiles form a (nearly) dense
sub-grid, and the whole per-pixel tile machinery — row gathers that run
at a fraction of streaming bandwidth on TPU — can be replaced by ONE
axis-aligned window per layer: ``dynamic_slice`` the conv input window
(plus kernel halo), run the dense conv on it, and ``dynamic_update_slice``
the result back over the cache. Everything is contiguous, so it runs at
streaming/MXU speed; coverage masks (planned host-side) preserve the
tile engine's fresh-vs-cached semantics bit-for-bit on original inputs.

The window's SHAPE is bucketed at plan time (compile-time static); its
ORIGIN ships as a device scalar, so moving an edit never retraces. Image
borders are handled clamp+roll+mask style: the slice start is clamped
into bounds, the window is rolled back into alignment, and a planned
edge mask zeroes the ring that lies outside the image (== conv zero
padding). Scattered multi-region edits should use the tile layout
(``layout="tiles"``), which this module complements.

No reference counterpart: the reference's tile engine
(sige/cpu/scatter_gather.cpp) targets GPU/CPU gather throughput; windows
are the TPU-native formulation of the same SIGE contract.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .gather import _broadcast_param, apply_epilogue


def _extract_window(x: jnp.ndarray, meta: jnp.ndarray,
                    edge: jnp.ndarray) -> jnp.ndarray:
    """[B, EH, EW, C] window of ``x`` at the planned (possibly virtual /
    out-of-bounds) origin. ``meta`` int32[4] = (clamped_r, clamped_c,
    roll_r, roll_c); ``edge`` bool[EH, EW] marks in-image pixels."""
    B, H, W, C = x.shape
    EH, EW = edge.shape
    sh, sw = min(EH, H), min(EW, W)
    zero = jnp.int32(0)
    w = jax.lax.dynamic_slice(x, (zero, meta[0], meta[1], zero),
                              (B, sh, sw, C))
    if sh < EH or sw < EW:
        w = jnp.pad(w, ((0, 0), (0, EH - sh), (0, EW - sw), (0, 0)))
    w = jnp.roll(w, (meta[2], meta[3]), axis=(1, 2))
    return jnp.where(edge[None, :, :, None], w, jnp.zeros((), w.dtype))


def _epilogue(z, edge, scale, shift, activation, activation_first):
    scale = _broadcast_param(scale, z)
    shift = _broadcast_param(shift, z)
    z = apply_epilogue(z, scale, shift, activation, activation_first)
    return jnp.where(edge[None, :, :, None], z, jnp.zeros((), z.dtype))


@partial(jax.jit, static_argnames=("activation", "activation_first"))
def window_gather(
    x: jnp.ndarray,
    meta: jnp.ndarray,
    edge: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    activation: str = "identity",
    activation_first: bool = False,
) -> jnp.ndarray:
    """Window analogue of :func:`~sige_tpu.ops.gather.gather_tiles`:
    extract the conv input window (with halo), fuse the folded-norm
    epilogue, zero the out-of-image ring."""
    w = _extract_window(x, meta, edge)
    return _epilogue(w, edge, scale, shift, activation, activation_first)


@partial(jax.jit, static_argnames=("pad", "activation", "activation_first"))
def window_scatter_gather(
    h_win: jnp.ndarray,
    cache: jnp.ndarray,
    meta: jnp.ndarray,
    edge: jnp.ndarray,
    cov: jnp.ndarray,
    pad,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    activation: str = "identity",
    activation_first: bool = False,
) -> jnp.ndarray:
    """Window analogue of the fused scatter->re-gather between a
    resblock's two convs: the cached conv1 map supplies the halo ring and
    the uncovered pixels, the fresh conv1 window the covered interior.

    ``pad`` (static (pr, pc)) is the conv's padding — the fresh window
    sits at that static offset inside the ring window.
    """
    base = _extract_window(cache, meta, edge)
    pr, pc = pad
    WH, WW = cov.shape
    inter = jax.lax.slice(
        base, (0, pr, pc, 0),
        (base.shape[0], pr + WH, pc + WW, base.shape[3]))
    mixed = jnp.where(cov[None, :, :, None], h_win, inter)
    z = jax.lax.dynamic_update_slice(
        base, mixed, (jnp.int32(0), jnp.int32(pr), jnp.int32(pc),
                      jnp.int32(0)))
    return _epilogue(z, edge, scale, shift, activation, activation_first)


@partial(jax.jit, static_argnames=())
def window_scatter(
    h_win: jnp.ndarray,
    cache: jnp.ndarray,
    org: jnp.ndarray,
    cov: jnp.ndarray,
    residual: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Window analogue of :func:`scatter_tiles_box`: overlay the fresh
    window over the cache at the planned origin (covered pixels only).
    ``residual`` may be a full map (sliced), a window aligned with
    ``h_win``, or [B, C]-broadcastable."""
    B, H, W, C = cache.shape
    WH, WW = cov.shape
    zero = jnp.int32(0)
    sl = jax.lax.dynamic_slice(cache, (zero, org[0], org[1], zero),
                               (B, WH, WW, C))
    fresh = h_win
    if residual is not None:
        if residual.ndim == 4 and residual.shape[1:3] == (WH, WW) and \
                (H, W) != (WH, WW):
            r = residual  # already a window
        else:
            r = _broadcast_param(residual, cache)
            if r.shape[1] == H and r.shape[2] == W:
                r = jax.lax.dynamic_slice(
                    r, (zero, org[0], org[1], zero), (B, WH, WW, C))
        fresh = fresh + r
    upd = jnp.where(cov[None, :, :, None], fresh, sl)
    return jax.lax.dynamic_update_slice(cache, upd, (zero, org[0], org[1], zero))


@partial(jax.jit, static_argnames=())
def window_scatter_block_residual(
    main_win: jnp.ndarray,
    cache_out: jnp.ndarray,
    shortcut_win: jnp.ndarray,
    cache_residual: jnp.ndarray,
    org: jnp.ndarray,
    cov_main: jnp.ndarray,
    cov_shortcut: jnp.ndarray,
) -> jnp.ndarray:
    """Window analogue of :func:`scatter_with_block_residual_box`; both
    paths share the canonical window so the join is pure elementwise:

        out = where(m, fresh_m + y1, y0) + where(s, fresh_s - y1, 0)
    """
    B, H, W, C = cache_out.shape
    WH, WW = cov_main.shape
    zero = jnp.int32(0)
    sl0 = jax.lax.dynamic_slice(cache_out, (zero, org[0], org[1], zero),
                                (B, WH, WW, C))
    sl1 = jax.lax.dynamic_slice(cache_residual, (zero, org[0], org[1], zero),
                                (B, WH, WW, C))
    upd = jnp.where(cov_main[None, :, :, None], main_win + sl1, sl0)
    upd = upd + jnp.where(cov_shortcut[None, :, :, None],
                          shortcut_win - sl1, jnp.zeros((), upd.dtype))
    return jax.lax.dynamic_update_slice(cache_out, upd,
                                        (zero, org[0], org[1], zero))
