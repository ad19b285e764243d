"""Tile gather with fused normalization epilogue.

``gather_tiles`` extracts the active activation tiles covering the edited
region into a dense tile batch ``[B * K, bh, bw, C]`` — the shape the MXU
conv consumes — with an optional fused ``scale * x + shift`` + activation
epilogue (the folded GroupNorm/BatchNorm the reference fuses into its
gather kernels; reference: sige/cpu/gather.cpp:4-114).

Semantics (matching the reference kernel):
  * tile top-lefts live in padded input coordinates and may be negative;
  * out-of-bounds pixels are exactly zero — the epilogue is *not* applied
    to them (the reference writes 0 and continues);
  * padded index-buffer slots (>= ``count``) produce all-zero tiles.

Implementation: one advanced-indexing gather with clamped coordinates plus
a validity select. XLA lowers this to a single gather HLO and fuses the
epilogue into it.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.geometry import BlockGeometry

_ACTIVATIONS = {
    "identity": lambda x: x,
    "swish": lambda x: x * jax.nn.sigmoid(x),
    "relu": jax.nn.relu,
    "leaky": lambda x: jax.nn.leaky_relu(x, 0.2),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def apply_epilogue(
    x: jnp.ndarray,
    scale: Optional[jnp.ndarray],
    shift: Optional[jnp.ndarray],
    activation: str = "identity",
    activation_first: bool = False,
) -> jnp.ndarray:
    """Fused ``scale * x + shift`` and activation, in either order
    (reference: sige/cpu/gather.cpp:37-53)."""
    act = _ACTIVATIONS[activation]
    if activation_first:
        x = act(x)
        if scale is not None:
            x = x * scale
        if shift is not None:
            x = x + shift
    else:
        if scale is not None:
            x = x * scale
        if shift is not None:
            x = x + shift
        x = act(x)
    return x


def _tile_coords(indices: jnp.ndarray, bh: int, bw: int):
    """Per-tile pixel coordinate grids [K, bh, 1] x [K, 1, bw] from [K, 2]
    top-left indices."""
    rows = indices[:, 0:1].astype(jnp.int32) + jnp.arange(bh, dtype=jnp.int32)[None, :]
    cols = indices[:, 1:2].astype(jnp.int32) + jnp.arange(bw, dtype=jnp.int32)[None, :]
    return rows[:, :, None], cols[:, None, :]  # [K, bh, 1], [K, 1, bw]


def _broadcast_param(p: Optional[jnp.ndarray], x: jnp.ndarray) -> Optional[jnp.ndarray]:
    """Normalize an epilogue param to rank-4 NHWC broadcastable with x."""
    if p is None:
        return None
    if p.ndim == 1:  # [C]
        return p.reshape(1, 1, 1, -1)
    if p.ndim == 2:  # [B, C]
        return p.reshape(p.shape[0], 1, 1, p.shape[1])
    if p.ndim == 4:
        return p
    raise ValueError(f"epilogue param rank {p.ndim} unsupported")


@partial(
    jax.jit,
    static_argnames=("geom", "activation", "activation_first"),
)
def gather_tiles(
    x: jnp.ndarray,
    indices: jnp.ndarray,
    count: jnp.ndarray,
    geom: BlockGeometry,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    activation: str = "identity",
    activation_first: bool = False,
) -> jnp.ndarray:
    """Gather active tiles from a feature map.

    Args:
      x: [B, H, W, C] feature map.
      indices: [K, 2] int32 padded tile top-lefts (input coordinates).
      count: scalar int32 — number of live tiles.
      geom: static block geometry.
      scale / shift: folded-norm epilogue params, [C], [B, C] or NHWC
        broadcastable. Spatially-varying params are gathered alongside x.
      activation / activation_first: epilogue activation and its order.

    Returns:
      [B * K, bh, bw, C] tile batch; dead pixels/tiles are exactly zero.
    """
    B, H, W, C = x.shape
    K = indices.shape[0]
    bh, bw = geom.block_size

    rows, cols = _tile_coords(indices, bh, bw)  # [K, bh, 1], [K, 1, bw]
    valid = (rows >= 0) & (rows < H) & (cols >= 0) & (cols < W)  # [K, bh, bw]
    live = jnp.arange(K, dtype=jnp.int32) < count
    valid = valid & live[:, None, None]

    rc = jnp.clip(rows, 0, H - 1)
    cc = jnp.clip(cols, 0, W - 1)
    # Single-axis flat take: XLA TPU lowers one-dimensional gathers far
    # better than multi-index advanced indexing.
    flat = (rc * W + cc).reshape(-1)  # [K*bh*bw]
    tiles = jnp.take(x.reshape(B, H * W, C), flat, axis=1)
    tiles = tiles.reshape(B, K, bh, bw, C)

    scale = _broadcast_param(scale, x)
    shift = _broadcast_param(shift, x)

    def gather_param(p):
        if p is None:
            return None
        if p.shape[1] == 1 and p.shape[2] == 1:
            return p[:, None]  # [B', 1, 1, 1, C'] broadcasts over tiles
        return jnp.take(
            p.reshape(p.shape[0], -1, p.shape[3]), flat, axis=1
        ).reshape(p.shape[0], K, bh, bw, p.shape[3])

    tiles = apply_epilogue(
        tiles, gather_param(scale), gather_param(shift), activation, activation_first
    )
    tiles = jnp.where(valid[None, :, :, :, None], tiles, jnp.zeros((), tiles.dtype))
    return tiles.reshape(B * K, bh, bw, C)
