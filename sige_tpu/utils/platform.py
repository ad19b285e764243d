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
