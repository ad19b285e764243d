"""ctypes bindings for the native host-planning kernels.

Builds ``planner.cpp`` with g++ on first use (cached next to the source);
every entry point has a numpy fallback in :mod:`sige_tpu.core`, so the
engine works without a toolchain. Enabled by default when the build
succeeds; set ``SIGE_TPU_NO_NATIVE=1`` to force the numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "planner.cpp")
_LIB_PATH = os.path.join(_DIR, "_planner.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and (
        os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC)
    ):
        return _LIB_PATH
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("SIGE_TPU_NO_NATIVE"):
        return None
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i64, i32p, u8p = ctypes.c_int64, \
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"), \
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.dilate_mask.argtypes = [u8p, u8p, i64, i64, i64, i64]
    lib.reduce_mask.restype = i64
    lib.reduce_mask.argtypes = [u8p, i64, i64, i64, i64, i64, i64, i64, i64,
                                i32p, i64, ctypes.c_int32]
    lib.build_src_map.argtypes = [i32p, i64, i64, i64, i64, i64, i64, i64,
                                  i64, i64, i32p]
    lib.build_sg_sources.argtypes = [i32p, i64, i64, i32p, i64, i64, i64,
                                     i64, i32p, i32p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


# ---- numpy-signature wrappers -------------------------------------------

def dilate_mask(mask: np.ndarray, dilation) -> np.ndarray:
    lib = get_lib()
    dh, dw = (dilation, dilation) if isinstance(dilation, (int, np.integer)) \
        else (int(dilation[0]), int(dilation[1]))
    m = np.ascontiguousarray(mask, np.uint8)
    out = np.empty_like(m)
    lib.dilate_mask(m, out, m.shape[0], m.shape[1], dh, dw)
    return out.astype(bool)


def reduce_mask_padded(mask: np.ndarray, geom, capacity: int,
                       sentinel: int) -> Tuple[np.ndarray, int]:
    lib = get_lib()
    m = np.ascontiguousarray(mask, np.uint8)
    indices = np.empty((capacity, 2), np.int32)
    n = lib.reduce_mask(
        m, m.shape[0], m.shape[1],
        geom.block_size[0], geom.block_size[1],
        geom.block_stride[0], geom.block_stride[1],
        geom.offset[0], geom.offset[1],
        indices, capacity, np.int32(sentinel))
    return indices, int(n)


def count_tiles(mask: np.ndarray, geom) -> int:
    """Live-count only (capacity 0 probe)."""
    lib = get_lib()
    m = np.ascontiguousarray(mask, np.uint8)
    dummy = np.empty((0, 2), np.int32)
    return int(lib.reduce_mask(
        m, m.shape[0], m.shape[1],
        geom.block_size[0], geom.block_size[1],
        geom.block_stride[0], geom.block_stride[1],
        geom.offset[0], geom.offset[1], dummy, 0, 0))


def build_src_map(indices: np.ndarray, count: int, geom,
                  out_hw) -> np.ndarray:
    lib = get_lib()
    H, W = out_hw
    idx = np.ascontiguousarray(indices, np.int32)
    src = np.empty((H, W), np.int32)
    R, S = geom.out_tile_size
    lib.build_src_map(idx, count, R, S,
                      geom.conv_stride[0], geom.conv_stride[1],
                      geom.offset[0], geom.offset[1], H, W,
                      src.reshape(-1))
    return src


def build_sg_sources(indices: np.ndarray, count: int, geom,
                     out_hw) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    H, W = out_hw
    idx = np.ascontiguousarray(indices, np.int32)
    src = build_src_map(idx, count, geom, out_hw)
    K = idx.shape[0]
    bh, bw = geom.block_size
    sg_src = np.empty(K * bh * bw, np.int32)
    sg_flat = np.empty(K * bh * bw, np.int32)
    lib.build_sg_sources(idx, K, count, src.reshape(-1), H, W, bh, bw,
                         sg_src, sg_flat)
    return sg_src, sg_flat
