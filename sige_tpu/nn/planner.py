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


def _fit_window(lo: int, hi: int, limit: int, mult: int) -> Tuple[int, int]:
    size = min(-(-(hi - lo) // mult) * mult, limit)
    return max(min(int(lo), limit - size), 0), size


def _canonical_window(mask: np.ndarray, mult: int = 16
                      ) -> Tuple[int, int, int, int]:
    """(r0, c0, WH, WW): bucketed bounding box of the mask — THE window
    every gather/scatter at this resolution shares (alignment lets
    window-mode joins stay pure elementwise)."""
    H, W = mask.shape
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    if rows.size == 0:
        return 0, 0, min(mult, H), min(mult, W)
    r0, wh = _fit_window(rows[0], rows[-1] + 1, H, mult)
    c0, ww = _fit_window(cols[0], cols[-1] + 1, W, mult)
    return r0, c0, wh, ww


def _window_meta(idx0: IntPair, ext: IntPair, limit: IntPair):
    """Clamp/roll metadata + in-image edge mask for a (possibly virtual)
    window origin (see ops/window.py _extract_window)."""
    cl = [max(min(idx0[a], limit[a] - ext[a]), 0) for a in (0, 1)]
    meta = np.array([cl[0], cl[1], cl[0] - idx0[0], cl[1] - idx0[1]], np.int32)
    er = (np.arange(ext[0]) + idx0[0] >= 0) & (np.arange(ext[0]) + idx0[0] < limit[0])
    ec = (np.arange(ext[1]) + idx0[1] >= 0) & (np.arange(ext[1]) + idx0[1] < limit[1])
    return meta, er[:, None] & ec[None, :]


def build_plan(
    meta: Mapping,
    masks: Mapping[IntPair, np.ndarray],
    bucket_min: int = 8,
    capacities: Optional[Dict[Tuple, int]] = None,
    layout: str = "tiles",
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
            if layout == "window":
                _window_entry(entry, node, geom, res, masks, indices, count,
                              _reses, _memo)
                plan[name] = entry
                continue
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
            sub = build_plan(node, masks, bucket_min, capacities, layout,
                             _path + (name,), _memo)
            if sub:
                plan[name] = sub
    return plan


def _window_entry(entry, node, geom: BlockGeometry, in_res, masks,
                  indices, count, _reses, _memo, mult: int = 16) -> None:
    """Window-layout planning products for one gather (see ops/window.py).

    All gathers/scatters at an output resolution share one canonical
    bucketed window (bbox of the mask), so window joins and norm
    modulations stay elementwise-aligned across module pairings.
    """
    kh, kw = geom.kernel_size
    sh, sw = geom.conv_stride
    oh, ow = geom.offset
    out_reses = sorted(set(_reses("scatter_res")) | set(_reses("sg_res")))
    if not out_reses:
        # pure re-gather (e.g. the SPADE shortcut-geometry regathers):
        # conv output resolution follows from the geometry alone
        out_reses = [(
            (in_res[0] + 2 * oh - kh) // sh + 1,
            (in_res[1] + 2 * ow - kw) // sw + 1,
        )]
    assert len(out_reses) == 1, (
        f"window layout expects one conv output resolution per gather, "
        f"got {out_reses}")
    ores = out_reses[0]
    wkey = ("window", ores)
    if wkey not in _memo:
        if ores not in masks:
            raise KeyError(f"no mask for window resolution {ores}")
        _memo[wkey] = _canonical_window(np.asarray(masks[ores], bool), mult)
    r0, c0, WH, WW = _memo[wkey]

    # gather input window (conv input extent incl. halo)
    ext = ((WH - 1) * sh + kh, (WW - 1) * sw + kw)
    meta, edge = _window_meta((r0 * sh - oh, c0 * sw - ow), ext, in_res)
    entry["win_in"] = meta
    entry["win_edge"] = edge

    skey = ("srcmap", in_res, geom, None, ores, "w")
    if skey not in _memo:
        _memo[skey] = build_src_map(indices, count, geom, ores)
    cov = _memo[skey][r0:r0 + WH, c0:c0 + WW] >= 0

    for sres in _reses("scatter_res"):
        entry[f"wsc_org_{sres[0]}x{sres[1]}"] = np.array([r0, c0], np.int32)
        entry[f"wsc_cov_{sres[0]}x{sres[1]}"] = cov
    for gres in _reses("sg_res"):
        assert (sh, sw) == (1, 1), "fused re-gather requires stride 1"
        ext2 = (WH + kh - 1, WW + kw - 1)
        meta2, edge2 = _window_meta((r0 - oh, c0 - ow), ext2, gres)
        entry[f"wsg_in_{gres[0]}x{gres[1]}"] = meta2
        entry[f"wsg_edge_{gres[0]}x{gres[1]}"] = edge2
        entry[f"wsg_cov_{gres[0]}x{gres[1]}"] = cov


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
