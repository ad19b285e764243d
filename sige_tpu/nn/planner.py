"""Host-side mask planning: meta collection + mask pyramid -> "sige"
collection.

The reference's ``SIGEModel.set_masks`` walks the module tree broadcasting
masks, each Gather reducing its resolution's mask to active indices with a
per-call memo cache (reference: sige/nn/base.py:102-108,
sige/nn/gather.py:94-108). Functionally, the same walk happens over the
``"meta"`` variable collection recorded by a full-mode pass: every Gather
leaves its packed geometry, input resolution, and the output resolutions
its paired scatters need ownership maps for. :func:`build_plan` mirrors
that tree into a ``"sige"`` collection of device-ready planning arrays.

All work here is numpy on host — it runs once per edit, off the hot loop.
Capacities are bucketed (next power of two) and can be pinned via
``capacities`` so repeated edits reuse compiled sparse programs.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple

import numpy as np

from ..core.geometry import BlockGeometry
from ..core.masks import reduce_mask_padded
from ..core.scatter_map import (bbox_of_map, build_sg_sources, build_src_map,
                                gather_position_geom)

IntPair = Tuple[int, int]


def _unpack_geom(arr) -> BlockGeometry:
    v = [int(i) for i in np.asarray(arr).reshape(-1)]
    return BlockGeometry(
        block_size=(v[0], v[1]),
        block_stride=(v[2], v[3]),
        offset=(v[4], v[5]),
        kernel_size=(v[6], v[7]),
        conv_stride=(v[8], v[9]),
    )


def _first(sown):
    """Sown values accumulate as tuples; planning metadata is identical
    across records, so take the first."""
    if isinstance(sown, tuple):
        return sown[0]
    return sown


def _is_gather_record(node: Mapping) -> bool:
    return isinstance(node, Mapping) and "geom" in node and "input_res" in node


def build_plan(
    meta: Mapping,
    masks: Mapping[IntPair, np.ndarray],
    bucket_min: int = 8,
    capacities: Optional[Dict[Tuple, int]] = None,
    _path: Tuple = (),
    _memo: Optional[Dict] = None,
) -> Dict:
    """Build the "sige" variable collection from recorded metadata.

    Args:
      meta: the ``"meta"`` collection from a full-mode apply.
      masks: per-resolution boolean mask pyramid keyed (h, w)
        (from :func:`sige_tpu.core.masks.downsample_mask`).
      bucket_min: smallest index-buffer capacity bucket.
      capacities: optional {path: capacity} pinning buffer sizes (e.g. to
        reuse a compiled program across edits of different sizes).

    Returns a nested dict mirroring the module tree with, at each Gather:
      ``indices`` [K, 2] int32, ``count`` int32 scalar, one
      ``srcmap_{h}x{w}`` int32 map per scatter output resolution, and
      ``sgsrc_/sgflat_{h}x{w}`` lookups per fused re-gather resolution.
    """
    if _memo is None:
        _memo = {}
    plan: Dict = {}
    for name, node in meta.items():
        if _is_gather_record(node):
            path = _path + (name,)
            geom = _unpack_geom(_first(node["geom"]))
            res = tuple(int(i) for i in np.asarray(_first(node["input_res"])))
            if res not in masks:
                raise KeyError(
                    f"no mask for resolution {res} at {'/'.join(path)}; "
                    f"available: {sorted(masks.keys())}"
                )
            cap = (capacities or {}).get(path)
            memo_key = ("idx", res, geom, cap)
            if memo_key not in _memo:
                _memo[memo_key] = reduce_mask_padded(
                    masks[res], geom, capacity=cap, bucket_min=bucket_min
                )
            indices, count = _memo[memo_key]
            # numpy leaves: the engine device_puts the WHOLE plan in one
            # batched transfer (per-leaf transfers cost ~50ms each through
            # a remote-dispatch tunnel)
            entry = {
                "indices": np.asarray(indices, np.int32),
                "count": np.int32(count),
            }
            def _reses(key):
                return sorted({tuple(int(i) for i in np.asarray(a))
                               for a in node.get(key, ())})
            # Scatter source maps ship bbox-cropped: a full-map take at
            # gather throughput costs ~a dense conv at 256^2 (see
            # ops/scatter.py scatter_tiles_box); box shape is bucketed so
            # similar edits reuse compiled programs.
            for ores in _reses("scatter_res"):
                okey = ("srcmap", res, geom, cap, ores)
                if okey not in _memo:
                    _memo[okey] = bbox_of_map(
                        build_src_map(indices, count, geom, ores))
                org, box = _memo[okey]
                entry[f"srcbox_{ores[0]}x{ores[1]}"] = box
                entry[f"srcorg_{ores[0]}x{ores[1]}"] = org
            for ores in _reses("sg_res"):
                okey = ("sg", res, geom, cap, ores)
                if okey not in _memo:
                    _memo[okey] = build_sg_sources(indices, count, geom, ores)
                entry[f"sgsrc_{ores[0]}x{ores[1]}"] = _memo[okey][0]
                entry[f"sgflat_{ores[0]}x{ores[1]}"] = _memo[okey][1]
            for ores in _reses("pixsrc_res"):
                okey = ("pixsrc", res, geom, cap, ores)
                if okey not in _memo:
                    _memo[okey] = bbox_of_map(build_src_map(
                        indices, count, gather_position_geom(geom), ores))
                org, box = _memo[okey]
                entry[f"pixbox_{ores[0]}x{ores[1]}"] = box
                entry[f"pixorg_{ores[0]}x{ores[1]}"] = org
            plan[name] = entry
        elif isinstance(node, Mapping):
            sub = build_plan(node, masks, bucket_min, capacities,
                             _path + (name,), _memo)
            if sub:
                plan[name] = sub
    return plan


def plan_stats(meta: Mapping, plan: Mapping, _path: Tuple = ()) -> Dict[str, Dict]:
    """Per-gather sparsity statistics for logging/profiling: live tiles,
    buffer capacity, and input resolution (the reference prints block
    sparsity per gather when verbose; reference: sige/utils.py:33-36)."""
    stats: Dict[str, Dict] = {}
    for name, node in meta.items():
        if _is_gather_record(node):
            p = plan[name]
            res = tuple(int(i) for i in np.asarray(_first(node["input_res"])))
            geom = _unpack_geom(_first(node["geom"]))
            count = int(np.asarray(p["count"]))
            stats["/".join(_path + (name,))] = {
                "resolution": res,
                "block_size": geom.block_size,
                "tiles": count,
                "capacity": int(p["indices"].shape[0]),
            }
        elif isinstance(node, Mapping):
            stats.update(plan_stats(node, plan.get(name, {}), _path + (name,)))
    return stats
