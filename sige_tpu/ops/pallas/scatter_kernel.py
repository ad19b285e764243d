"""Pallas TPU tile-scatter kernel.

Writes conv-output tiles into a copy of the cached full map by direct DMA
instead of the XLA take+select full-map rewrite: one grid step per tile,
each DMAing its [R', S', C] (edge-clipped) rectangle into the output at a
scalar-prefetched origin. The output buffer starts as a copy of the cache
(aliased input, donated) so uncovered pixels keep their cached values —
the reference's clone-then-write semantics
(reference: sige/cpu/scatter.cpp:76-117) with the TPU's sequential grid
giving deterministic last-writer-wins tile overlap.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.geometry import BlockGeometry


def plan_scatter_origins(indices: np.ndarray, count: int,
                         geom: BlockGeometry, out_hw) -> np.ndarray:
    """[K, 3] int32 rows: (clamped_out_r, clamped_out_c, live).

    The conv-output tile origin is (offset + idx) // stride
    (reference: sige/cpu/scatter.cpp:20-21); edge tiles are clamped so the
    fixed-size DMA stays in bounds — the overlap this introduces rewrites
    neighbouring pixels with identical values (tiles overlap by
    construction), matching the reference's benign overlap.
    """
    H, W = out_hw
    R, S = geom.out_tile_size
    sh, sw = geom.conv_stride
    oh, ow = geom.offset
    idx = np.asarray(indices, np.int64)
    K = idx.shape[0]
    out = np.zeros((K, 3), np.int32)
    r = (oh + idx[:, 0]) // sh
    c = (ow + idx[:, 1]) // sw
    out[:, 0] = np.clip(r, 0, max(H - R, 0))
    out[:, 1] = np.clip(c, 0, max(W - S, 0))
    out[:, 2] = (np.arange(K) < count).astype(np.int32)
    return out


def _scatter_kernel(origin_ref, tiles_hbm, out_init_hbm, out_hbm, scratch,
                    sem, *, R, S, C):
    del out_init_hbm  # aliased with out_hbm
    k = pl.program_id(0)
    r0, c0 = origin_ref[k, 0], origin_ref[k, 1]

    @pl.when(origin_ref[k, 2] > 0)
    def _():
        load = pltpu.make_async_copy(tiles_hbm.at[k], scratch, sem)
        load.start()
        load.wait()
        store = pltpu.make_async_copy(
            scratch,
            out_hbm.at[0, pl.ds(r0, R), pl.ds(c0, S), :],
            sem,
        )
        store.start()
        store.wait()


@partial(jax.jit, static_argnames=("geom", "interpret"), donate_argnums=(1,))
def scatter_tiles_pallas(
    tiles: jnp.ndarray,
    out_init: jnp.ndarray,
    origins: jnp.ndarray,
    geom: BlockGeometry,
    interpret: bool = False,
) -> jnp.ndarray:
    """Write tiles into ``out_init`` (a copy of the cache; donated).

    NOTE: clamped edge tiles rewrite a few neighbour pixels with values
    from the overlapping tile — identical by construction when the edit
    mask is block-consistent. For exact-edge semantics use the XLA
    :func:`sige_tpu.ops.scatter.scatter_tiles`.

    Args:
      tiles: [K, R, S, C] conv-output tiles (batch-1; vmap for batches).
      out_init: [1, H, W, C] buffer initialized with the cache contents.
      origins: [K, 3] from :func:`plan_scatter_origins`.
    """
    K = tiles.shape[0]
    R, S = geom.out_tile_size
    C = tiles.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # tiles
            pl.BlockSpec(memory_space=pltpu.ANY),   # out_init (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),  # full map in HBM
        scratch_shapes=[
            pltpu.VMEM((R, S, C), tiles.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        partial(_scatter_kernel, R=R, S=S, C=C),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_init.shape, out_init.dtype),
        input_output_aliases={2: 0},  # out_init (incl. scalar-prefetch arg) -> out
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(origins, tiles, out_init)
