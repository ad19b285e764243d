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

**The big-canvas sparse composition.** The sparse tile/window engine is
a batch-1 latency optimization whose index buffers are host-planned per
edit; sharding *rows* of a sparse plan would split tiles across chips.
The supported multi-chip story for a giant canvas (>=1024^2, where one
chip's HBM cannot hold the DENSE activations) is therefore a
composition, not a sharded sparse step:

  1. the one-time full pass — the HBM-bound step — runs sp-sharded
     (:func:`spatial_full_apply`): every activation map, and every cache
     map it leaves behind, lives row-sharded across the mesh; XLA SPMD
     inserts the conv halo exchanges and norm/attention reductions;
  2. the per-edit sparse steps run on ONE chip: the sparse program's
     HBM high-water is caches + gathered windows — a fraction of the
     dense program's (no full-map temporaries at the high-water mark;
     the compiled memory analysis in the multichip dryrun is the
     evidence) — so the canvas that needs n chips dense fits one chip
     sparse. Caches transfer once per session (device-to-device over
     ICI), then every interactive edit pays single-chip sparse latency
     with zero collectives on the step's critical path.

For sharded serving of many edits, use dp x tp (:class:`TwinStepServer`).
sp is the axis for "the input is too big for one chip".
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


@partial(jax.jit, static_argnames=("module",))
def _full_apply(module, params, x, *extra):
    y, mut = module.apply({"params": params, "cache": {}}, x, *extra,
                          ctx=SIGECtx(mode="full"),
                          mutable=["cache", "meta"])
    return y, mut["cache"], mut["meta"]


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


def spatial_full_apply(mesh: Mesh, module, params, x, *extra):
    """FULL-mode pass with H sharded over sp: fills the engine caches.

    Step 1 of the big-canvas composition (module docstring): the one-time
    cache-filling pass at a resolution whose dense activations exceed one
    chip's HBM. Returns ``(y, cache, meta)``; the row sharding propagates
    from the input through every cached map, so each chip holds only its
    row slice of every cache (fetch with one ``jax.device_get``, or
    re-place on a single chip for the sparse steps).
    """
    H = x.shape[1]
    n = mesh.shape["sp"]
    if H % n != 0:
        raise ValueError(f"H={H} not divisible by sp={n}")
    xs = jax.device_put(x, row_sharding(mesh))
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    extra = tuple(jax.device_put(e, rep) for e in extra)
    return _full_apply(module, params, xs, *extra)
