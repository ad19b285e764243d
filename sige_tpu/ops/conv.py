"""NHWC convolution helpers.

Weights use HWIO layout (flax default). Tile convs run with VALID padding —
gathered blocks carry their own halo, which is why the reference forces
padding to zero in sparse mode (reference: sige/nn/base.py:80-92).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

IntPair = Tuple[int, int]


def _pair(v) -> IntPair:
    if isinstance(v, int):
        return (v, v)
    return (int(v[0]), int(v[1]))


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
        pad = padding
    elif isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    elif len(padding) == 2 and isinstance(padding[0], (tuple, list)):
        pad = tuple((int(p[0]), int(p[1])) for p in padding)
    else:
        ph, pw = _pair(padding)
        pad = ((ph, ph), (pw, pw))
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
