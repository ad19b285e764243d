"""Bespoke TPU flash attention for SD's narrow head dims (40/80/160).

Why not the stock Pallas kernel
(jax.experimental.pallas.ops.tpu.flash_attention): it requires head
dims padded to 128-lane multiples, which physically streams 128
contraction elements through the MXU per output tile — 3.2x the cycles
the d=40 math needs. The naive einsum path lets XLA contract K=40 at
its natural streaming rate, which is why stock flash measured SLOWER
than naive everywhere on SD shapes (ops/attention.py's recorded table).

This kernel keeps the head dim UNPADDED: q/k/v blocks are [bq, D] /
[bk, D] with D = 40/80/160 as-is, so the QK^T contraction streams only
D (sublane-padded to the 8/16 tile, e.g. 40 -> 48 for bf16: 1.2x, not
3.2x) while the [Sq, Skv] logits never leave VMEM — the HBM win flash
exists for, without the stock kernel's MXU tax.

Shape contract (callers: ops/attention.py):
  q [B, N, H, D], k/v [B, M, H, D] — folded to [B*H, S, D] outside;
  bias: optional [M] float32 additive logit bias (0 / -1e9 — the
  masked stale-K/V form) shared across batch and heads.
  N % 128 == 0 and M % 128 == 0 (gate in attention.py; odd shapes fall
  back to naive).

Numerics: online softmax in float32 (running max/sum per q row), PV in
the value dtype with float32 accumulation — same structure as the
published flash-attention recurrence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pick_block(s: int, want: int) -> int:
    for b in (want, 1024, 512, 256, 128):
        if b <= want and s % b == 0:
            return b
    return 128


def _fwd_kernel(bias_ref, q_ref, k_ref, v_ref, o_ref,
                acc_ref, m_ref, l_ref, *, scale: float, nk: int):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                         # [bq, D]
    k = k_ref[0]                         # [bk, D]
    v = v_ref[0]                         # [bk, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [bq, bk]
    s = s + bias_ref[:]                  # [1, bk] broadcasts over rows

    m_prev = m_ref[:, :1]                # [bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)      # [bq, 1]
    p = jnp.exp(s - m_new)               # [bq, bk] f32
    l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:, :1] = m_new

    @pl.when(k_idx == nk - 1)
    def _done():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "interpret", "block_q",
                                    "block_k"))
def flash_mha_bhsd(q, k, v, bias, *, scale: float, interpret: bool = False,
                   block_q: int = 0, block_k: int = 0):
    """q [G, N, D], k/v [G, M, D] (G = B*H folded), bias [1, M] float32.
    Returns [G, N, D] in q's dtype. N, M must be 128-multiples.
    block_q/block_k override the default tile picks (tuning)."""
    G, N, D = q.shape
    M = k.shape[1]
    # measured on v5e (scripts/microflash.py): 1024/1024 beats 512/512
    # at every win-region shape (D40 N4096: 1.90 vs 2.63 ms)
    bq = block_q or _pick_block(N, 1024)
    bk = block_k or _pick_block(M, 1024)
    nk = M // bk
    grid = (G, N // bq, nk)
    kernel = functools.partial(_fwd_kernel, scale=float(scale), nk=nk)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bk), lambda b, i, j: (0, j)),       # bias
            pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),  # q
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),  # k
            pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0)),  # v
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, N, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, D), jnp.float32),    # acc
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (col 0)
            pltpu.VMEM((bq, 128), jnp.float32),  # running sum (col 0)
        ],
        interpret=interpret,
    )(bias, q, k, v)


def flash_mha(qh, kh, vh, scale: float, bias=None, interpret: bool = False):
    """qh [B, N, H, D], kh/vh [B, M, H, D], bias optional [M] f32.
    Returns [B, N, H, D]."""
    B, N, H, D = qh.shape
    M = kh.shape[1]

    def fold(t):
        return jnp.swapaxes(t, 1, 2).reshape(B * H, t.shape[1], D)

    if bias is None:
        bias2 = jnp.zeros((1, M), jnp.float32)
    else:
        bias2 = jnp.asarray(bias, jnp.float32).reshape(1, M)
    out = flash_mha_bhsd(fold(qh), fold(kh).astype(qh.dtype),
                         fold(vh).astype(qh.dtype), bias2,
                         scale=float(scale), interpret=interpret)
    return jnp.swapaxes(out.reshape(B, H, N, D), 1, 2)
