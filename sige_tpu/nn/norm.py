"""Normalization folding.

The reference fuses normalizations into the gather/scatter epilogues by
rewriting each norm as a per-channel affine ``scale * x + shift`` computed
from the *full-mode* pass statistics (reference: diffusion/models/common.py
``my_group_norm``; gaugan/models/.../sige_normalization.py BatchNorm fold;
mobile_modules.py ``my_instance_norm``). Sparse tiles then apply the affine
without ever seeing the full map.

All functions are NHWC and jittable.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def group_norm_with_affine(
    x: jnp.ndarray,
    num_groups: int,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GroupNorm over NHWC returning (normalized x, scale[B, C], shift[B, C])
    such that ``scale * raw_x + shift == normalized x``
    (reference: diffusion/models/common.py:37-57, which is batch-1; this
    version keeps the batch dim like stable-diffusion's variant,
    reference: stable-diffusion/ldm/modules/diffusionmodules/model.py:12-33).
    """
    B, H, W, C = x.shape
    gs = C // num_groups
    in_dtype = x.dtype
    # statistics always in fp32 (bf16 activations would lose the mean)
    xg = x.astype(jnp.float32).reshape(B, H, W, num_groups, gs)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)          # [B,1,1,G,1]
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    std = jnp.sqrt(var + eps)
    xn = ((xg - mean) / std).reshape(B, H, W, C).astype(in_dtype)
    scale = (1.0 / std)[:, 0, 0, :, 0]                          # [B, G]
    shift = (-mean / std)[:, 0, 0, :, 0]
    scale = jnp.repeat(scale, gs, axis=-1)                      # [B, C]
    shift = jnp.repeat(shift, gs, axis=-1)
    if weight is not None:
        xn = xn * weight
        scale = scale * weight
        shift = shift * weight
    if bias is not None:
        xn = xn + bias
        shift = shift + bias
    return xn, scale, shift


def instance_norm_with_affine(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """InstanceNorm fold — per (batch, channel) statistics
    (reference: gaugan/models/sub_mobile_spade_generators/mobile_modules.py
    ``my_instance_norm``)."""
    return group_norm_with_affine(x, x.shape[-1], weight, bias, eps)


def batch_norm_affine(
    running_mean: jnp.ndarray,
    running_var: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference BatchNorm is data-independent: return (scale[C], shift[C])
    from running stats (reference: gaugan/models/spade_generators/
    sige_normalization.py:61-88)."""
    inv = 1.0 / jnp.sqrt(running_var + eps)
    scale = inv if weight is None else inv * weight
    shift = -running_mean * scale
    if bias is not None:
        shift = shift + bias
    return scale, shift
