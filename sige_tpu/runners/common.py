"""Shared profile-harness helpers for the per-suite runners."""

from __future__ import annotations

from typing import Dict


def _hbm_entry(fwd, variables, *args, mode: str) -> Dict:
    """Peak-HBM breakdown of the profiled step for a runner ``profile()``
    dict. ``args`` (resident inputs) is split host-side into params /
    cache / plan; dense mode re-lowers with params only, so the sparse
    caches a runner happens to hold don't inflate the dense figure.
    Returns {} when memory analysis is unavailable (never fails a
    profile run over a metadata counter)."""
    from ..utils import compiled_hbm_breakdown, tree_mb

    v = variables if mode != "dense" else {"params": variables["params"]}
    hbm = compiled_hbm_breakdown(fwd, v, *args)
    if hbm is None:
        return {}
    hbm["params_mb"] = tree_mb(variables["params"])
    if mode != "dense":
        hbm["cache_mb"] = tree_mb(variables.get("cache", ()))
        hbm["plan_mb"] = tree_mb(variables.get("sige", ()))
    return {"hbm": hbm}
