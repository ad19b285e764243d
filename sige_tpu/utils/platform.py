"""Platform helpers.

TPU compiles through the axon tunnel are expensive (minutes for a fresh
program); the persistent compilation cache makes every repeated
benchmark/example run fast. Call :func:`enable_compilation_cache` before
any jit executes (it is idempotent).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compilation_cache(path: str | None = None) -> str:
    path = path or os.environ.get("SIGE_TPU_JAX_CACHE", _DEFAULT_CACHE_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


def device_sync(x) -> float:
    """Force completion of all device work feeding ``x`` by fetching a
    scalar reduction to the host.

    On remote-dispatch backends ``block_until_ready`` can return before
    execution finishes (readiness is tracked host-side); only a host read
    actually drains the queue. The reduction keeps the transfer tiny."""
    import jax.numpy as jnp

    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timed_loop(fn, args, warmup: int = 5, iters: int = 50,
               batches: int = 3) -> float:
    """min-of-batches wall time per call, in ms.

    Measures via :func:`device_sync` (NOT ``block_until_ready``) and
    subtracts the measured host<->device round-trip floor once per batch.
    """
    import time

    y = None
    for _ in range(max(warmup, 1)):
        y = fn(*args)
    device_sync(y)
    # round-trip floor (one tiny sync)
    t0 = time.perf_counter()
    device_sync(y)
    rt = (time.perf_counter() - t0) * 1e3
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        device_sync(y)
        best = min(best, ((time.perf_counter() - t0) * 1e3 - rt) / iters)
    return max(best, 0.0)
