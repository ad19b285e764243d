"""Device meshes and sharding layouts.

The reference is strictly single-device (reference: SURVEY section 2.7 —
no torch.distributed anywhere); on TPU pods the natural scaling axes for a
latency engine are:

  * **dp** — independent edit requests (each with its own caches) batched
    over chips; one plan shared per microbatch (identical-mask batching) so
    the tile index buffers stay uniform;
  * **tp** — activation channels. Conv weights stay replicated; activations
    carry a channel sharding constraint at block boundaries and XLA inserts
    the all-gathers over ICI.

Shardings are expressed purely with ``jax.sharding`` named shardings; no
per-device code.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """(dp, tp) mesh over the first n devices (CPU fallback when the
    default backend exposes fewer devices than requested)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            devices = jax.devices("cpu")
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices % tp == 0
    arr = np.array(devices[:n_devices]).reshape(n_devices // tp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(mesh: Mesh, x, tp_channels: bool = True):
    """Shard [B, H, W, C] activations: batch over dp, channels over tp
    where divisible."""
    tp = mesh.shape["tp"]
    spec = P("dp", None, None, "tp") if (
        tp_channels and x.ndim == 4 and x.shape[-1] % tp == 0) else P("dp")
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_cache(mesh: Mesh, cache, batch: int):
    """Scatter caches are [slots, B, H, W, C]: shard the request batch over
    dp, replicate everything else (plans, affines)."""

    def place(a):
        if a.ndim >= 2 and a.shape[1] == batch:
            return jax.device_put(a, NamedSharding(mesh, P(None, "dp")))
        return jax.device_put(a, NamedSharding(mesh, P()))

    return jax.tree.map(place, cache)


def shard_model(mesh: Mesh, params):
    """Replicate parameters (SIGE models are small relative to HBM; tp
    sharding of conv kernels is expressed through activation constraints)."""
    return replicate(mesh, params)
