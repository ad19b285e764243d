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


def _fast(meta: jnp.ndarray) -> bool:
    """Plan-static fast-form dispatch: the planner ships ``int32[2]``
    metas (a plain in-image window start) when the window never clamps
    at the canvas border — the overwhelmingly common case — and the full
    ``int32[4]`` clamp/roll form otherwise. Shape is trace-time static,
    so one leaf encodes the branch with zero device-side scalar math
    (profiled on TPU v5e: the clamp/roll/edge machinery was ~1000 tiny
    scalar+roll ops per sparse step; see STATUS perf notes)."""
    return meta.shape[0] == 2


def _extract_window(x: jnp.ndarray, meta: jnp.ndarray,
                    edge: jnp.ndarray) -> jnp.ndarray:
    """[B, EH, EW, C] window of ``x`` at the planned (possibly virtual /
    out-of-bounds) origin. ``meta`` int32[4] = (clamped_r, clamped_c,
    roll_r, roll_c) — or the fast int32[2] in-image form (see
    :func:`_fast`); ``edge`` bool[EH, EW] marks in-image pixels."""
    B, H, W, C = x.shape
    EH, EW = edge.shape
    zero = jnp.int32(0)
    if _fast(meta):
        return jax.lax.dynamic_slice(x, (zero, meta[0], meta[1], zero),
                                     (B, EH, EW, C))
    sh, sw = min(EH, H), min(EW, W)
    w = jax.lax.dynamic_slice(x, (zero, meta[0], meta[1], zero),
                              (B, sh, sw, C))
    if sh < EH or sw < EW:
        w = jnp.pad(w, ((0, 0), (0, EH - sh), (0, EW - sw), (0, 0)))
    w = jnp.roll(w, (meta[2], meta[3]), axis=(1, 2))
    return jnp.where(edge[None, :, :, None], w, jnp.zeros((), w.dtype))


def _epilogue(z, edge, scale, shift, activation, activation_first):
    """Fused scale/shift/activation; ``edge=None`` skips the out-of-image
    re-zeroing (fast windows are fully in-image)."""
    scale = _broadcast_param(scale, z)
    shift = _broadcast_param(shift, z)
    z = apply_epilogue(z, scale, shift, activation, activation_first)
    if edge is None:
        return z
    return jnp.where(edge[None, :, :, None], z, jnp.zeros((), z.dtype))


def window_epilogue(z, edge, scale=None, shift=None,
                    activation: str = "identity",
                    activation_first: bool = False):
    """Public epilogue for callers that extend multiple windows and
    concatenate before the fused norm (e.g. U-Net skip joins): applies
    ``scale*x+shift`` + activation and re-zeroes the out-of-image ring,
    exactly like the gather-fused epilogue."""
    return _epilogue(z, edge, scale, shift, activation, activation_first)


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
    return _epilogue(w, None if _fast(meta) else edge, scale, shift,
                     activation, activation_first)


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
    base = _extract_window(cache, meta, edge).astype(h_win.dtype)
    return _wsg_tail(base, h_win, cov, pad,
                     None if _fast(meta) else edge, scale, shift,
                     activation, activation_first)


def _wsg_tail(base, h_win, cov, pad, edge, scale, shift, activation,
              activation_first):
    # static-position compose: pad the fresh window and its coverage mask
    # to the ring-window extent and select — one fused elementwise pass
    # over [EH, EW] instead of a slice + materialize + update-copy (the
    # DUS-rooted fusions this replaces measured 76-163us each at 146^2
    # on TPU v5e)
    pr, pc = pad
    WH, WW = cov.shape
    B, EH, EW, C = base.shape
    covp = jnp.pad(cov, ((pr, EH - WH - pr), (pc, EW - WW - pc)))
    hp = jnp.pad(h_win.astype(base.dtype),
                 ((0, 0), (pr, EH - WH - pr), (pc, EW - WW - pc), (0, 0)))
    z = jnp.where(covp[None, :, :, None], hp, base)
    return _epilogue(z, edge, scale, shift, activation, activation_first)


@partial(jax.jit, static_argnames=("pad", "activation", "activation_first"))
def window_scatter_gather_slot(
    h_win: jnp.ndarray,
    cache5: jnp.ndarray,
    cache_id,
    meta: jnp.ndarray,
    edge: jnp.ndarray,
    cov: jnp.ndarray,
    pad,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    activation: str = "identity",
    activation_first: bool = False,
) -> jnp.ndarray:
    """:func:`window_scatter_gather` reading the ring straight from the
    slotted cache variable (avoids the full-canvas slot-squeeze copy).
    Narrow-storage caches (SIGECtx.cache_dtype) cast back to the fresh
    window's compute dtype here, fused into the slice."""
    base = _extract_window_slot(cache5, cache_id, meta, edge)
    base = base.astype(h_win.dtype)
    return _wsg_tail(base, h_win, cov, pad,
                     None if _fast(meta) else edge, scale, shift,
                     activation, activation_first)


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


# ---------------------------------------------------------------------
# window-resident chains: consecutive windowed ops thread (window, cache)
# pairs and never materialize full maps between them. A carried window
# plus the producing layer's cache IS the exact full map (inside the
# window the carried values, outside the cache — they agree on the
# uncovered interior), so any later extraction window can be rebuilt
# from a window-sized cache slice plus one window overlay. The planner
# guarantees (cross-resolution nested canonical windows) that the
# carried window always fits inside the consumer's extraction window, so
# the dynamic_update_slice below never clamps.
# ---------------------------------------------------------------------


def _extract_window_slot(cache5: jnp.ndarray, cache_id, meta: jnp.ndarray,
                         edge: jnp.ndarray) -> jnp.ndarray:
    """[slots, B, H, W, C] slot ``cache_id`` -> [B, EH, EW, C] window per
    (meta, edge) — one 5-D dynamic_slice, no full-map slot squeeze (a
    squeezed slot feeding a window op costs a full-canvas layout copy)."""
    S, B, H, W, C = cache5.shape
    EH, EW = edge.shape
    zero = jnp.int32(0)
    if _fast(meta):
        return jax.lax.dynamic_slice(
            cache5, (jnp.int32(cache_id), zero, meta[0], meta[1], zero),
            (1, B, EH, EW, C))[0]
    sh, sw = min(EH, H), min(EW, W)
    w = jax.lax.dynamic_slice(
        cache5, (jnp.int32(cache_id), zero, meta[0], meta[1], zero),
        (1, B, sh, sw, C))[0]
    if sh < EH or sw < EW:
        w = jnp.pad(w, ((0, 0), (0, EH - sh), (0, EW - sw), (0, 0)))
    w = jnp.roll(w, (meta[2], meta[3]), axis=(1, 2))
    return jnp.where(edge[None, :, :, None], w, jnp.zeros((), w.dtype))


def window_slot_window(cache5: jnp.ndarray, cache_id, org: jnp.ndarray,
                       shape, dtype=None) -> jnp.ndarray:
    """[B, WH, WW, C] in-bounds window of slot ``cache_id`` at ``org``
    (canonical windows are always in-image; no clamp/roll needed).
    ``dtype`` casts a narrow-storage cache back to the compute dtype."""
    S, B, H, W, C = cache5.shape
    WH, WW = shape
    zero = jnp.int32(0)
    out = jax.lax.dynamic_slice(
        cache5, (jnp.int32(cache_id), zero, org[0], org[1], zero),
        (1, B, WH, WW, C))[0]
    return out if dtype is None else out.astype(dtype)


@partial(jax.jit, static_argnames=("activation", "activation_first", "rel"))
def window_chain_extend(
    win: jnp.ndarray,
    org: jnp.ndarray,
    cache5: jnp.ndarray,
    cache_id,
    meta: jnp.ndarray,
    edge: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    activation: str = "identity",
    activation_first: bool = False,
    rel: Optional[tuple] = None,
) -> jnp.ndarray:
    """Chain analogue of :func:`window_gather`: rebuild the extraction
    window of the virtual map (``cache5`` slot overlaid by the carried
    ``win`` at canonical origin ``org``) and fuse the norm epilogue.

    ``rel`` (static (pr, pc)) is the carried window's offset inside the
    extraction window when the caller knows it at trace time — for a
    stride-1 consumer it is exactly the conv offset, independent of the
    edit (rel = org - v_org = oh since v_org = org - oh). With a fast
    2-form ``meta`` the overlay then becomes a statically-padded select
    that fuses into the epilogue instead of an update-copy."""
    ext = _extract_window_slot(cache5, cache_id, meta, edge)
    ext = ext.astype(win.dtype)  # narrow-storage cache -> compute dtype
    if _fast(meta) and rel is not None:
        B, EH, EW, C = ext.shape
        WH, WW = win.shape[1:3]
        pr, pc = rel
        assert 0 <= pr and pr + WH <= EH and 0 <= pc and pc + WW <= EW, (
            (rel, win.shape, ext.shape))
        covp = jnp.zeros((EH, EW), bool).at[pr:pr + WH, pc:pc + WW].set(True)
        wp = jnp.pad(win.astype(ext.dtype),
                     ((0, 0), (pr, EH - WH - pr), (pc, EW - WW - pc), (0, 0)))
        ext = jnp.where(covp[None, :, :, None], wp, ext)
        return _epilogue(ext, None, scale, shift, activation,
                         activation_first)
    if _fast(meta):
        rel_r = org[0] - meta[0]
        rel_c = org[1] - meta[1]
    else:
        rel_r = org[0] - (meta[0] - meta[2])
        rel_c = org[1] - (meta[1] - meta[3])
    ext = jax.lax.dynamic_update_slice(
        ext, win.astype(ext.dtype), (jnp.int32(0), rel_r, rel_c, jnp.int32(0)))
    return _epilogue(ext, None if _fast(meta) else edge, scale, shift,
                     activation, activation_first)


@partial(jax.jit, static_argnames=("activation", "activation_first"))
def window_chain_extend_up2(
    win2: jnp.ndarray,
    org2: jnp.ndarray,
    meta: jnp.ndarray,
    edge: jnp.ndarray,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    activation: str = "identity",
    activation_first: bool = False,
) -> jnp.ndarray:
    """Chain step across a nearest-2x upsample: the planner's nesting
    constraint makes the DOUBLED carried window (``win2`` at ``org2``,
    both already x2) cover the whole extraction window, so the step is a
    single slice of the carried window — no cache read, no full map.

    The extraction window may poke past the image border (conv halo):
    the slice start is clamped into the carried window, rolled back into
    alignment, and the planned ``edge`` mask zeroes the OOB ring (the
    same clamp+roll+mask recipe as :func:`_extract_window`)."""
    B, WH2, WW2, C = win2.shape
    EH, EW = edge.shape
    if WH2 < EH or WW2 < EW:
        # the extraction halo pokes past a whole-canvas carried window;
        # every cell outside the carried window is out-of-image, so
        # zero-padding is exact (the edge mask re-zeroes them anyway)
        win2 = jnp.pad(win2, ((0, 0), (0, max(EH - WH2, 0)),
                              (0, max(EW - WW2, 0)), (0, 0)))
        WH2, WW2 = max(WH2, EH), max(WW2, EW)
    if _fast(meta):
        # in-image extraction window + the planner's containment
        # guarantee (wup_ok) make the raw offset valid as-is: one slice,
        # no clamp/roll/edge machinery
        ext = jax.lax.dynamic_slice(
            win2, (jnp.int32(0), meta[0] - org2[0], meta[1] - org2[1],
                   jnp.int32(0)), (B, EH, EW, C))
        return _epilogue(ext, None, scale, shift, activation,
                         activation_first)
    v_r = meta[0] - meta[2]  # extraction window's virtual origin
    v_c = meta[1] - meta[3]
    raw_r = v_r - org2[0]
    raw_c = v_c - org2[1]
    cl_r = jnp.clip(raw_r, 0, WH2 - EH)
    cl_c = jnp.clip(raw_c, 0, WW2 - EW)
    ext = jax.lax.dynamic_slice(
        win2, (jnp.int32(0), cl_r, cl_c, jnp.int32(0)), (B, EH, EW, C))
    ext = jnp.roll(ext, (cl_r - raw_r, cl_c - raw_c), axis=(1, 2))
    ext = jnp.where(edge[None, :, :, None], ext, jnp.zeros((), ext.dtype))
    return _epilogue(ext, edge, scale, shift, activation, activation_first)


@partial(jax.jit, static_argnames=())
def window_state_materialize(cache5: jnp.ndarray, cache_id,
                             win: jnp.ndarray, org: jnp.ndarray) -> jnp.ndarray:
    """Chain break: overlay the carried window over the full cached map
    (the one full-canvas copy a chain pays, at its very end). The
    materialized map is in the CARRIED window's compute dtype (a
    narrow-storage cache upcasts, fused into the slice)."""
    S = cache5.shape[0]
    base = jax.lax.dynamic_slice(
        cache5, (jnp.int32(cache_id),) + (jnp.int32(0),) * 4,
        (1,) + cache5.shape[1:])[0].astype(win.dtype)
    zero = jnp.int32(0)
    return jax.lax.dynamic_update_slice(base, win,
                                        (zero, org[0], org[1], zero))


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
