"""NHWC convolution helpers.

Weights use HWIO layout (flax default). Tile convs run with VALID padding —
gathered blocks carry their own halo, which is why the reference forces
padding to zero in sparse mode (reference: sige/nn/base.py:80-92).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

IntPair = Tuple[int, int]


def _pair(v) -> IntPair:
    if isinstance(v, int):
        return (v, v)
    return (int(v[0]), int(v[1]))


#: Output-position threshold below which stride-1 convs lower to an
#: explicit im2col matmul instead of lax.conv. XLA's TPU conv lowering
#: runs well off the weight-bandwidth floor at small spatial extents —
#: measured on chip (v5e, scan-timed, bf16, 2026-08-20):
#:
#:   N2 10x10 C2560->1280 (200 pos):  conv 173.5 us  im2col 108.3  (1.60x)
#:   N2 16x16 C1280->1280 (512 pos):  conv 128.9 us  im2col  87.8  (1.47x)
#:   N2 32x32 C640 -> 640 (2048 pos): conv 113.6 us  im2col  94.4  (1.20x)
#:   N2 64x64 C320 -> 320 (8192 pos): conv 139.0 us  im2col 277.5  (0.50x)
#:
#: (weight-BW floors: 72/36/18 us — im2col sits ~1.5x off it, conv
#: 2.4-3.6x). The crossover is between 2k and 8k output positions;
#: 2048 keeps every measured win and none of the losses. These shapes
#: are the SD U-Net's dense-middle 8^2/10^2/16^2 1280-ch levels and the
#: DDPM/PD sub-threshold coarse levels — the weight-heaviest part of
#: every sparse step. Override via SIGE_IM2COL_MAX_POS (0 disables).
#:
#: Gathered TILE batches (leading dim = #tiles, tiny per-tile extents)
#: are excluded: XLA's conv lowering batches them onto the MXU at
#: near-peak MFU already (round-5 trace: the DDPM [32,8,5,256] tile
#: convs run at ~94% MFU), and the batched im2col re-slicing costs more
#: than it saves — measured whole-family: DDPM sparse 1.02 -> 1.16 ms
#: with tile batches included, recovered on N<=2 only. N<=2 keeps the
#: CFG pair (SD) and every N=1 coarse level.
_IM2COL_MAX_POS = int(os.environ.get("SIGE_IM2COL_MAX_POS", "2048"))
_IM2COL_MAX_BATCH = 2


def _im2col_conv(x: jnp.ndarray, w: jnp.ndarray, pad, precision):
    """Stride-1 conv as one [N*OH*OW, KH*KW*C] x [KH*KW*C, O] matmul.

    The kh*kw shifted views concatenate along channels in (kh, kw)
    row-major order, matching HWIO's ``w.reshape(kh*kw*C, O)`` flat
    order, so the dot is exactly the conv's contraction."""
    if pad != ((0, 0), (0, 0)):
        x = jnp.pad(x, ((0, 0), pad[0], pad[1], (0, 0)))
    N, H, W, C = x.shape
    kh, kw, _, O = w.shape
    oh, ow = H - kh + 1, W - kw + 1
    cols = [x[:, r:r + oh, c:c + ow, :]
            for r in range(kh) for c in range(kw)]
    xc = jnp.concatenate(cols, axis=-1).reshape(N * oh * ow, kh * kw * C)
    y = jax.lax.dot_general(
        xc, w.astype(x.dtype).reshape(kh * kw * C, O),
        (((1,), (0,)), ((), ())),
        precision=precision, preferred_element_type=x.dtype)
    return y.reshape(N, oh, ow, O)


def conv2d_nhwc(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: Union[int, IntPair] = 1,
    padding: Union[str, int, IntPair, Tuple[IntPair, IntPair]] = 0,
    feature_group_count: int = 1,
    precision=None,
) -> jnp.ndarray:
    """Dense NHWC conv. ``padding`` is symmetric int(s), explicit
    ((top, bottom), (left, right)) pairs, or an XLA padding string."""
    stride = _pair(stride)
    if isinstance(padding, str):
        pad = ((0, 0), (0, 0)) if padding == "VALID" else padding
    elif isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    elif len(padding) == 2 and isinstance(padding[0], (tuple, list)):
        pad = tuple((int(p[0]), int(p[1])) for p in padding)
    else:
        ph, pw = _pair(padding)
        pad = ((ph, ph), (pw, pw))
    if (not isinstance(pad, str) and stride == (1, 1)
            and feature_group_count == 1 and w.shape[0] * w.shape[1] > 1):
        N, H, W, _ = x.shape
        oh = H + pad[0][0] + pad[0][1] - w.shape[0] + 1
        ow = W + pad[1][0] + pad[1][1] - w.shape[1] + 1
        if N <= _IM2COL_MAX_BATCH and 0 < N * oh * ow <= _IM2COL_MAX_POS:
            out = _im2col_conv(x, w, pad, precision)
            return out if b is None else out + b.astype(out.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        precision=precision,
        preferred_element_type=x.dtype,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def tile_conv2d(
    tiles: jnp.ndarray,
    w: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    stride: Union[int, IntPair] = 1,
    feature_group_count: int = 1,
    precision=None,
) -> jnp.ndarray:
    """VALID conv over a gathered tile batch [B*K, bh, bw, C_in] ->
    [B*K, R, S, C_out]. The tile batch rides the MXU as one batched matmul."""
    return conv2d_nhwc(
        tiles, w, b, stride=stride, padding="VALID",
        feature_group_count=feature_group_count, precision=precision,
    )
