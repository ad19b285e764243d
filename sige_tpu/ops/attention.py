"""Attention execution paths (naive XLA vs Pallas TPU flash).

Every attention in the engine is GLOBAL spatial-token attention even
under sparsity (the reference's invariant — reference:
diffusion/models/ddpm_arch/sige_fused_unet.py:179-199 scatters tiles
back before attending; stable-diffusion sige_attention.py:152-167
keeps full-map K/V; the VAE runs sparse-Q/dense-KV,
ldm/modules/diffusionmodules/sige_model.py AttnBlock).
Two shapes recur:

* ``mha(q, k, v)`` — all-pairs multi-head attention;
* ``masked_mha(q, ks, vs, kf, vf, bias_s, bias_f)`` — queries attend
  over [stale K/V map ++ fresh window] with additive 0/-1e9 biases
  keeping exactly one live token per spatial position (the masked
  stale-K/V chain form, models/sd/unet.py).

Execution:

* **naive** (default): einsum + softmax, byte-identical to the
  historical inline implementations — XLA materializes the [Sq, Skv]
  logits in HBM. At SD's 64x64 latent level that is 2x8x4096x4096 per
  self-attention (~0.5 GB bf16), making the dense baseline HBM-bound
  there.
* **flash**: the stock Pallas TPU kernel
  (jax.experimental.pallas.ops.tpu.flash_attention) streams
  online-softmax blocks through VMEM — logits never touch HBM. The
  masked form rides SEGMENT IDS (two [B, S] integer streams), not an
  additive-bias tensor: a full [Sq, Skv] ``ab`` input would
  re-materialize exactly the traffic flash exists to avoid. Head dims
  are zero-padded to a lane multiple (padding K columns adds nothing
  to QK^T; padded V columns are sliced off the output).

**Measured on chip (v5 lite, 2026-08-19, scripts/measure_tpu.py,
iters=50): the STOCK kernel loses across the board.**

=================  ==============  ==============
benchmark          naive           stock flash
=================  ==============  ==============
SD UNet dense      24.68 ms        28.85 ms
SD UNet sparse      5.19 ms         7.30 ms
VAE decoder dense  19.22 ms        21.35 ms
VAE decoder sparse  4.12 ms         4.60 ms
VAE encoder dense   8.17 ms         8.04 ms
VAE encoder sparse  1.44 ms         2.77 ms
=================  ==============  ==============

Why: SD head dims are 40/80/160 — the stock kernel needs 128-lane
multiples, so padding to 128/128/256 wastes 1.6-3.2x of the QK^T/PV
MXU work, which swamps the HBM saving. The stock kernel stays opt-in
(SIGE_FLASH_ATTN=1) for future chips.

The BESPOKE unpadded-head-dim kernel (ops/flash.py) was then measured
per shape (v5 lite, 2026-08-20, scripts/microflash.py, iters=50):

====================================  ========  ========  ======
shape                                 naive     bespoke   ratio
====================================  ========  ========  ======
mha    B2 N4096 H8 D40 M4096          2.88 ms   1.90 ms   1.5x
mha    B2 N1024 H8 D80 M1024          0.74 ms   0.98 ms   0.75x
mha    B2 N256  H8 D160 M256          0.66 ms   1.09 ms   0.61x
mha    B1 N4096 H1 D512 M4096         0.61 ms   0.80 ms   0.76x
masked B2 N1024 D40 Ms4096 Mf1024     1.94 ms   1.17 ms   1.66x
masked B2 N2048 D40 Ms4096 Mf2048     4.42 ms   1.86 ms   2.38x
masked B2 N512  D80 Ms1024 Mf512      0.71 ms   0.61 ms   1.17x
masked B2 N4096 D40 Ms4096 Mf4096     14.2 ms   4.10 ms   3.46x
====================================  ========  ========  ======

The pattern: the bespoke kernel wins exactly where naive's [Sq, Skv]
logits dominate HBM traffic (large N*M at narrow D — the 64x64 SD
level, and every masked stale-K/V chain join); it loses where the
logits are small and its MXU lane waste (D<128 output columns) is the
binding cost. The DEFAULT policy below dispatches bespoke only inside
the measured-win region; everything else stays naive. Overrides:
SIGE_FLASH_ATTN=0 forces naive, =1 the stock kernel, =sige the bespoke
kernel everywhere viable. Calls silently fall back to naive when the
platform is not TPU or sequence lengths don't tile.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e9)

_FLASH_ENABLED = os.environ.get("SIGE_FLASH_ATTN", "0") in ("1", "interpret")
_INTERPRET = os.environ.get("SIGE_FLASH_ATTN") == "interpret"
# bespoke unpadded-head-dim kernel (ops/flash.py) — force-everywhere
_BESPOKE = os.environ.get("SIGE_FLASH_ATTN") == "sige"
# measured per-shape policy (module docstring) — the default; =0 kills it
_AUTO = os.environ.get("SIGE_FLASH_ATTN", "auto") in ("auto", "sige")


def enable_flash_attention(on: bool = True, interpret: bool = False,
                           bespoke: bool = False) -> None:
    """Toggle the Pallas flash path globally (also: SIGE_FLASH_ATTN=1,
    or =sige for the bespoke unpadded-head-dim kernel in ops/flash.py).
    ``enable_flash_attention(False)`` restores the measured per-shape
    AUTO policy (the default); set SIGE_FLASH_ATTN=0 to force naive
    everywhere. ``interpret=True`` additionally runs the kernel in TPU
    interpret mode so the flash path can be validated off-chip (slow;
    tests only). Takes effect at trace time; jitted programs compiled
    earlier keep the path they were traced with."""
    global _FLASH_ENABLED, _INTERPRET, _BESPOKE
    _FLASH_ENABLED = bool(on) and not bespoke
    _BESPOKE = bool(on) and bespoke
    _INTERPRET = bool(interpret)


def _on_tpu() -> bool:
    """True on any TPU-ish backend (incl. the axon remote-dispatch
    platform, whose backend name is not "tpu") or in interpret mode;
    matches utils.platform.on_tpu's platform-not-cpu convention."""
    if _INTERPRET:
        return True
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except RuntimeError:
        return False


def _bespoke_viable(n: int, m: int) -> bool:
    if not _BESPOKE:
        return False
    if not _on_tpu():
        return False
    return n % 128 == 0 and m % 128 == 0


def _auto_mha(n: int, m: int, d: int) -> bool:
    """Measured-win region for the plain all-pairs form: naive's
    [n, m] logits must be the dominant HBM term (big n*m) AND the
    bespoke kernel's lane waste small enough (d <= 64). m % 512 keeps
    the kv block >= 512 (bk=128 grids measured 3-5x slower)."""
    if not (_AUTO and not _FLASH_ENABLED and not _BESPOKE and _on_tpu()):
        return False
    return (d <= 64 and n >= 2048 and m >= 2048
            and n % 128 == 0 and m % 512 == 0)


def _auto_masked(n: int, m: int, d: int) -> bool:
    """Measured-win region for the masked stale-K/V chain form: the
    stale map makes m large, so the logits term dominates much earlier
    (wins from m ~1.5k at d<=128). Ragged n/m are fine — the dispatch
    pads q rows (sliced off the output) and kv tokens (dead-biased)."""
    if not (_AUTO and not _FLASH_ENABLED and not _BESPOKE and _on_tpu()):
        return False
    return d <= 128 and m >= 1536 and n >= 256


def flash_attention_enabled() -> bool:
    return _FLASH_ENABLED


def _flash_viable(n: int, m: int, interpret: bool) -> bool:
    if not (interpret or (_FLASH_ENABLED and _on_tpu())):
        return False
    # explicit 128-blocks are passed to the kernel (_block_sizes), so
    # lane-multiple sequence lengths always tile regardless of the JAX
    # release's get_default choices; odd lengths fall back to naive
    return n % 128 == 0 and m % 128 == 0


def _block_sizes(n: int, m: int):
    """Explicit forward-pass tiles: q 512|n, kv 128 (the gate above
    guarantees 128 | n, m — do NOT rely on BlockSizes.get_default,
    whose values vary across JAX releases)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    bq = 512 if n % 512 == 0 else 128
    return fa.BlockSizes(block_q=bq, block_k_major=128, block_k=128,
                         block_b=1)


def _pad_heads(t, hd_pad: int):
    """[B, S, H, D] -> [B, H, S, D_pad] (flash kernel layout)."""
    t = jnp.swapaxes(t, 1, 2)
    d = t.shape[-1]
    if d != hd_pad:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, hd_pad - d)))
    return t


def _flash(qh, kh, vh, scale: float, kv_seg=None, interpret: bool = False):
    """qh/kh/vh: [B, S, H, D]. kv_seg: optional [B, M] int32 segment ids
    (queries are segment 0; kv positions with seg != 0 are masked out).
    Returns [B, N, H, D]."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    B, N, H, D = qh.shape
    M = kh.shape[1]
    hd_pad = -(-D // 128) * 128
    q = _pad_heads(qh, hd_pad)
    k = _pad_heads(kh, hd_pad)
    v = _pad_heads(vh, hd_pad)
    seg = None
    if kv_seg is not None:
        seg = fa.SegmentIds(q=jnp.zeros((B, N), jnp.int32),
                            kv=kv_seg.astype(jnp.int32))

    def run():
        return fa.flash_attention(q, k, v, segment_ids=seg, causal=False,
                                  sm_scale=float(scale),
                                  block_sizes=_block_sizes(N, M))

    if interpret or _INTERPRET:
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            out = run()
    else:
        out = run()
    return jnp.swapaxes(out, 1, 2)[..., :D]


def mha(q, k, v, heads: int, dim_head: int, *,
        _interpret: bool = False):
    """Multi-head attention.

    q: [B, N, heads*dim_head]; k/v: [B, M, heads*dim_head], same dtype
    as q (callers cast cached K/V first). Returns
    [B, N, heads*dim_head]. Naive path reproduces the historical
    einsum+softmax bit-for-bit."""
    B, N, _ = q.shape
    M = k.shape[1]
    nh, hd = heads, dim_head
    qh = q.reshape(B, N, nh, hd)
    kh = k.reshape(B, M, nh, hd)
    vh = v.reshape(B, M, nh, hd)
    scale = hd ** -0.5
    mp = -(-M // 128) * 128  # ragged KV (e.g. 77 text tokens) pads to a
    if (_bespoke_viable(N, mp)  # unpadded-head-dim kernel (ops/flash.py)
            or _auto_mha(N, mp, hd)):
        from .flash import flash_mha

        bias = None
        if mp != M:
            pad = ((0, 0), (0, mp - M), (0, 0), (0, 0))
            kh = jnp.pad(kh, pad)
            vh = jnp.pad(vh, pad)
            bias = jnp.where(jnp.arange(mp) >= M, NEG_INF, 0.0)
        out = flash_mha(qh, kh, vh, scale, bias=bias, interpret=_INTERPRET)
        return out.reshape(B, N, nh * hd)
    if _flash_viable(N, mp, _interpret):  # lane multiple, dead-segmented
        kv_seg = None
        if mp != M:
            pad = ((0, 0), (0, mp - M), (0, 0), (0, 0))
            kh = jnp.pad(kh, pad)
            vh = jnp.pad(vh, pad)
            kv_seg = jnp.broadcast_to(
                (jnp.arange(mp) >= M).astype(jnp.int32)[None], (B, mp))
        out = _flash(qh, kh, vh, scale, kv_seg=kv_seg, interpret=_interpret)
        return out.reshape(B, N, nh * hd)
    sim = jnp.einsum("bnhd,bmhd->bhnm", qh, kh) * scale
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(B, N, nh * hd)


def masked_mha(q, ks, vs, kf, vf, bias_s, bias_f, heads: int,
               dim_head: int, *, _interpret: bool = False):
    """Attention over [stale ++ fresh] K/V with per-position additive
    biases in {0, -1e9} (exactly one of the stale/fresh copies of every
    spatial position is live).

    q: [B, N, inner]; ks/vs: [B, Ms, inner] (stale maps — any cached
    dtype); kf/vf: [B, Mf, inner]; bias_s/bias_f: [Ms]/[Mf] float32.
    Naive path keeps the historical split-einsum op order (bitwise
    compatibility with the chain exactness tests); flash concatenates
    K/V and turns the biases into kv segment ids."""
    B, N, _ = q.shape
    Ms, Mf = ks.shape[1], kf.shape[1]
    nh, hd = heads, dim_head
    qh = q.reshape(B, N, nh, hd)
    scale = hd ** -0.5
    if (_BESPOKE and _on_tpu()) or _auto_masked(N, Ms + Mf, hd):
        from .flash import flash_mha

        kh = jnp.concatenate(
            [ks.reshape(B, Ms, nh, hd).astype(qh.dtype),
             kf.reshape(B, Mf, nh, hd).astype(qh.dtype)], axis=1)
        vh = jnp.concatenate(
            [vs.reshape(B, Ms, nh, hd).astype(qh.dtype),
             vf.reshape(B, Mf, nh, hd).astype(qh.dtype)], axis=1)
        bias = jnp.concatenate([bias_s, bias_f])
        # ragged shapes tile by padding: dead-biased kv tokens up to a
        # 512-multiple (big kv blocks — bk=128 grids measured 3-5x
        # slower) and zero q rows up to a 128-multiple, sliced off the
        # output (they attend over live tokens; no NaN)
        Mt, Np = Ms + Mf, -(-N // 128) * 128
        Mp = -(-Mt // 512) * 512
        if Mp != Mt:
            pad = ((0, 0), (0, Mp - Mt), (0, 0), (0, 0))
            kh, vh = jnp.pad(kh, pad), jnp.pad(vh, pad)
            bias = jnp.concatenate(
                [bias, jnp.full((Mp - Mt,), -1e9, jnp.float32)])
        qp = (qh if Np == N
              else jnp.pad(qh, ((0, 0), (0, Np - N), (0, 0), (0, 0))))
        out = flash_mha(qp, kh, vh, scale, bias=bias,
                        interpret=_INTERPRET)
        if Np != N:
            out = out[:, :N]
        return out.reshape(B, N, nh * hd)
    if _flash_viable(N, Ms + Mf, _interpret):
        kh = jnp.concatenate(
            [ks.reshape(B, Ms, nh, hd).astype(qh.dtype),
             kf.reshape(B, Mf, nh, hd).astype(qh.dtype)], axis=1)
        vh = jnp.concatenate(
            [vs.reshape(B, Ms, nh, hd).astype(qh.dtype),
             vf.reshape(B, Mf, nh, hd).astype(qh.dtype)], axis=1)
        # live (bias 0) -> segment 0 == queries; dead (bias -inf) -> 1
        live = jnp.concatenate([bias_s, bias_f]) >= -0.5
        kv_seg = jnp.broadcast_to((~live).astype(jnp.int32)[None], (B, Ms + Mf))
        out = _flash(qh, kh, vh, scale, kv_seg=kv_seg, interpret=_interpret)
        return out.reshape(B, N, nh * hd)
    sim_s = jnp.einsum("bnhd,bmhd->bhnm", qh,
                       ks.reshape(B, Ms, nh, hd).astype(qh.dtype))
    sim_f = jnp.einsum("bnhd,bmhd->bhnm", qh,
                       kf.reshape(B, Mf, nh, hd))
    sim = jnp.concatenate([sim_s, sim_f], axis=-1) * scale
    bias = jnp.concatenate([bias_s, bias_f])[None, None, None, :]
    attn = jax.nn.softmax(sim + bias.astype(sim.dtype), axis=-1)
    out = (jnp.einsum("bhnm,bmhd->bnhd", attn[..., :Ms],
                      vs.reshape(B, Ms, nh, hd).astype(attn.dtype))
           + jnp.einsum("bhnm,bmhd->bnhd", attn[..., Ms:],
                        vf.reshape(B, Mf, nh, hd)))
    return out.reshape(B, N, nh * hd)
