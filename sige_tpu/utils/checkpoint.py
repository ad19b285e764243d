"""Native checkpoint save/load for converted weights.

The reference only ever torch.load()s .pth files (SURVEY section 5:
checkpoint/resume is load-only). Here the torch converters
(:mod:`sige_tpu.utils.convert`, ``convert_sd``) run ONCE, and the
resulting param pytrees are stored in a TPU-native format so inference
hosts never need torch: orbax's StandardCheckpointer (the standard JAX
checkpoint layout, mmap-able, works for any pytree of arrays).
"""

from __future__ import annotations

import os
from typing import Any


def save_params(path: str, params: Any) -> str:
    """Write a param pytree to ``path`` (a directory) via orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    return path


def load_params(path: str) -> Any:
    """Read a param pytree written by :func:`save_params`.

    Arrays come back as host numpy — restoring by the *saved* shardings
    would break across topologies (save on a TPU host, load on the CPU
    mesh, or vice versa); the engine device_puts params itself."""
    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(path).item_metadata.tree

    def to_args(node):
        if isinstance(node, dict):
            return {k: to_args(v) for k, v in node.items()}
        return ocp.RestoreArgs(restore_type=np.ndarray)

    return ckptr.restore(path, restore_args=to_args(tree))


def maybe_load_native(path: str | None) -> Any | None:
    """Load ``path`` if it is a native checkpoint directory, else None
    (the CLIs accept either a reference .pth to convert or a directory
    previously written by ``--save_converted``)."""
    if path and os.path.isdir(path):
        return load_params(path)
    return None
