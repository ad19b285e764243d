"""Pallas TPU tile-gather kernel.

A DMA-centric alternative to the XLA take-based gather
(:func:`sige_tpu.ops.gather.gather_tiles`): grid over tiles, each step
async-copies its (clamped) source rectangle HBM->VMEM, realigns it, and
applies the fused scale/shift/activation epilogue on the VPU. Matches the
engine semantics (OOB and dead tiles exactly zero, epilogue not applied
to OOB; reference: sige/cpu/gather.cpp).

Tile origins are data-dependent, so the source stays in ANY/HBM memory and
the kernel issues explicit ``make_async_copy`` with scalar-prefetched
origins. Origins can be negative / past the edge (conv-padding halo); the
DMA start is clamped on host and the copied block is rolled back into
tile alignment, with the OOB ring masked to exact zero.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.geometry import BlockGeometry
from ..gather import _ACTIVATIONS


def plan_gather_origins(indices: np.ndarray, count: int, geom: BlockGeometry,
                        in_hw) -> np.ndarray:
    """[K, 5] int32 rows: (clamped_r, clamped_c, raw_r, raw_c, live)."""
    H, W = in_hw
    bh, bw = geom.block_size
    idx = np.asarray(indices, np.int64)
    K = idx.shape[0]
    out = np.zeros((K, 5), np.int32)
    out[:, 0] = np.clip(idx[:, 0], 0, max(H - bh, 0))
    out[:, 1] = np.clip(idx[:, 1], 0, max(W - bw, 0))
    out[:, 2] = idx[:, 0]
    out[:, 3] = idx[:, 1]
    out[:, 4] = (np.arange(K) < count).astype(np.int32)
    return out


def _gather_kernel(origin_ref, x_hbm, scale_ref, shift_ref, out_ref,
                   scratch, sem, *, bh, bw, C, H, W, activation,
                   activation_first, has_scale, has_shift):
    k = pl.program_id(0)
    cr, cc = origin_ref[k, 0], origin_ref[k, 1]
    rr, rc = origin_ref[k, 2], origin_ref[k, 3]
    dma = pltpu.make_async_copy(
        x_hbm.at[0, pl.ds(cr, bh), pl.ds(cc, bw), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    # realign: tile[r] = scratch[r + (raw - clamped)] = roll by (clamped - raw)
    z = pltpu.roll(scratch[:], cr - rr, axis=0)
    z = pltpu.roll(z, cc - rc, axis=1)

    act = _ACTIVATIONS[activation]
    if activation_first:
        z = act(z)
        if has_scale:
            z = z * scale_ref[:]
        if has_shift:
            z = z + shift_ref[:]
    else:
        if has_scale:
            z = z * scale_ref[:]
        if has_shift:
            z = z + shift_ref[:]
        z = act(z)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0) + rr
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1) + rc
    valid = ((row_ids >= 0) & (row_ids < H) & (col_ids >= 0) & (col_ids < W)
             & (origin_ref[k, 4] > 0))
    out_ref[0, 0] = jnp.where(valid[:, :, None], z, jnp.zeros((), z.dtype))


@partial(
    jax.jit,
    static_argnames=("geom", "activation", "activation_first", "interpret"),
)
def gather_tiles_pallas(
    x: jnp.ndarray,
    origins: jnp.ndarray,
    geom: BlockGeometry,
    scale: Optional[jnp.ndarray] = None,
    shift: Optional[jnp.ndarray] = None,
    activation: str = "identity",
    activation_first: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather active tiles via per-tile DMA.

    Args:
      x: [1, H, W, C] feature map (batch-1 kernel; vmap for batches).
      origins: [K, 5] int32 from :func:`plan_gather_origins`.
      scale/shift: optional [C] epilogue params.

    Returns [K, bh, bw, C] tiles.
    """
    B, H, W, C = x.shape
    assert B == 1, "pallas gather kernel is batch-1; vmap over batch"
    K = origins.shape[0]
    bh, bw = geom.block_size
    dummy = jnp.zeros((C,), x.dtype)
    scale_in = scale.astype(x.dtype) if scale is not None else dummy
    shift_in = shift.astype(x.dtype) if shift is not None else dummy

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),      # x stays off-chip
            pl.BlockSpec(memory_space=pltpu.VMEM),     # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),     # shift
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bh, bw, C), lambda k, origin_ref: (k, 0, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bh, bw, C), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = partial(
        _gather_kernel, bh=bh, bw=bw, C=C, H=H, W=W,
        activation=activation, activation_first=activation_first,
        has_scale=scale is not None, has_shift=shift is not None,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((K, 1, bh, bw, C), x.dtype),
        interpret=interpret,
    )(origins, x, scale_in, shift_in)
    return out.reshape(K, bh, bw, C)
