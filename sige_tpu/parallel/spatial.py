"""Spatial parallelism (sp): shard the image rows of one big request.

The reference is single-device (SURVEY section 2.7); dp/tp in
:mod:`sige_tpu.parallel.mesh` scale request *batches*. This module scales
a SINGLE large request — the regime where one image's activations
dominate HBM (the SD VAE at >=1024^2 per-level activations) — by
sharding the H axis of every NHWC activation across the mesh and letting
XLA's SPMD partitioner insert the halo exchanges each 3x3 conv needs at
shard boundaries (and the cross-shard reductions GroupNorm/attention
need). That is the whole implementation: one sharding constraint at the
jit boundary; no per-device code, no manual collectives — the
collectives ride ICI.

Dense mode only: the sparse tile/window engine is a batch-1 latency
optimization whose index buffers are host-planned per edit; sharding
*rows* of a sparse plan would split tiles across chips. For sharded
serving of many edits, use dp x tp (:class:`TwinStepServer`). sp is the
axis for "the input is too big for one chip".
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..nn.module import SIGECtx


def make_spatial_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D ("sp",) mesh over rows."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[: n_devices]
    return Mesh(np.array(devices), axis_names=("sp",))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC activations: rows over sp, everything else replicated."""
    return NamedSharding(mesh, P(None, "sp", None, None))


@partial(jax.jit, static_argnames=("module",))
def _dense_apply(module, params, x, *extra):
    return module.apply({"params": params}, x, *extra,
                        ctx=SIGECtx(mode="dense"))


def spatial_apply(mesh: Mesh, module, params, x, *extra):
    """Run ``module`` (dense mode) with H sharded over the sp axis.

    ``x`` is [B, H, W, C] with H divisible by the mesh size; ``extra``
    positional inputs (e.g. a timestep vector) are replicated. Returns
    the output (it keeps the row sharding; ``np.asarray`` gathers).
    XLA SPMD propagates the row sharding through every conv (inserting
    halo exchanges), norm (cross-shard mean/var psums) and attention
    (all-gather of K/V rows) in the module.
    """
    H = x.shape[1]
    n = mesh.shape["sp"]
    if H % n != 0:
        raise ValueError(f"H={H} not divisible by sp={n}")
    xs = jax.device_put(x, row_sharding(mesh))
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    extra = tuple(jax.device_put(e, rep) for e in extra)
    return _dense_apply(module, params, xs, *extra)
