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
iters=50): flash LOSES across the board — naive stays the default.**

=================  ==============  ==============
benchmark          naive           flash
=================  ==============  ==============
SD UNet dense      24.68 ms        28.85 ms
SD UNet sparse      5.19 ms         7.30 ms
VAE decoder dense  19.22 ms        21.35 ms
VAE decoder sparse  4.12 ms         4.60 ms
VAE encoder dense   8.17 ms         8.04 ms
VAE encoder sparse  1.44 ms         2.77 ms
=================  ==============  ==============

Why: SD head dims are 40/80/160 — the kernel needs 128-lane multiples,
so padding to 128/128/256 wastes 1.6-3.2x of the QK^T/PV MXU work,
which swamps the HBM saving (flash did cut the dense U-Net step's peak
HBM 2288 -> 1869 MB; the only marginal wall win was encoder-dense,
whose single 4096-token attention has head dim 512 -> no padding).
A bespoke Pallas kernel tiled for d=40/80 could revisit this; the
stock kernel is a measured negative result, kept opt-in
(:func:`enable_flash_attention` / SIGE_FLASH_ATTN=1) for future chips.
Calls silently fall back to naive when the toggle is off, the platform
is not TPU, or sequence lengths don't tile (128-lane multiples).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e9)

_FLASH_ENABLED = os.environ.get("SIGE_FLASH_ATTN", "0") in ("1", "interpret")
_INTERPRET = os.environ.get("SIGE_FLASH_ATTN") == "interpret"
# bespoke unpadded-head-dim kernel (ops/flash.py) — a separate toggle
# from the stock kernel so each is measured on its own
_BESPOKE = os.environ.get("SIGE_FLASH_ATTN") == "sige"


def enable_flash_attention(on: bool = True, interpret: bool = False,
                           bespoke: bool = False) -> None:
    """Toggle the Pallas flash path globally (also: SIGE_FLASH_ATTN=1,
    or =sige for the bespoke unpadded-head-dim kernel in ops/flash.py).
    ``interpret=True`` additionally runs the kernel in TPU interpret
    mode so the flash path can be validated off-chip (slow; tests
    only). Takes effect at trace time; jitted programs compiled earlier
    keep the path they were traced with."""
    global _FLASH_ENABLED, _INTERPRET, _BESPOKE
    _FLASH_ENABLED = bool(on) and not bespoke
    _BESPOKE = bool(on) and bespoke
    _INTERPRET = bool(interpret)


def _bespoke_viable(n: int, m: int) -> bool:
    if not _BESPOKE:
        return False
    if not (_INTERPRET or jax.default_backend() == "tpu"):
        return False
    return n % 128 == 0 and m % 128 == 0


def flash_attention_enabled() -> bool:
    return _FLASH_ENABLED


def _flash_viable(n: int, m: int, interpret: bool) -> bool:
    if not (interpret or (_FLASH_ENABLED
                          and (_INTERPRET
                               or jax.default_backend() == "tpu"))):
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
    if _bespoke_viable(N, mp):  # unpadded-head-dim kernel (ops/flash.py)
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
    if _bespoke_viable(N, Ms + Mf):
        from .flash import flash_mha

        kh = jnp.concatenate(
            [ks.reshape(B, Ms, nh, hd).astype(qh.dtype),
             kf.reshape(B, Mf, nh, hd).astype(qh.dtype)], axis=1)
        vh = jnp.concatenate(
            [vs.reshape(B, Ms, nh, hd).astype(qh.dtype),
             vf.reshape(B, Mf, nh, hd).astype(qh.dtype)], axis=1)
        out = flash_mha(qh, kh, vh, scale,
                        bias=jnp.concatenate([bias_s, bias_f]),
                        interpret=_INTERPRET)
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
