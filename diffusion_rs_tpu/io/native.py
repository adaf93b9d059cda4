"""ctypes bindings for the native IO/repack engine (native/drs_io.cpp).

Auto-builds the shared library on first use (g++, no deps) and caches it
under native/build/. Every entry point has a numpy fallback so the package
works without a toolchain; the native paths parallelize the host-side work
that dominates checkpoint load (transpose to K-major, bnb nibble repack,
positioned span reads).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger("diffusion_rs_tpu")

_REPO_NATIVE = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _REPO_NATIVE / "build" / "libdrs_io.so"
# Wheel installs carry the lib as package data (built by setup.py build_py).
_WHEEL_LIB = Path(__file__).resolve().parents[1] / "_native" / "libdrs_io.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_REPO_NATIVE, check=True,
            capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as e:  # pragma: no cover
        log.debug("native build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("DIFFUSION_RS_TPU_NO_NATIVE"):
            return None
        if _WHEEL_LIB.exists():
            lib_path = _WHEEL_LIB
        elif _LIB_PATH.exists() or _build():
            lib_path = _LIB_PATH
        else:
            return None
        try:
            lib = ctypes.CDLL(str(lib_path))
            lib.drs_transpose_2d.restype = ctypes.c_int
            lib.drs_bnb_repack4.restype = ctypes.c_int
            lib.drs_file_read_spans.restype = ctypes.c_int
            if lib.drs_version() != 1:
                return None
            _lib = lib
        except OSError as e:  # pragma: no cover
            log.debug("native load failed: %s", e)
        return _lib


def transpose_2d(src: np.ndarray) -> np.ndarray:
    """Parallel [rows, cols] -> [cols, rows] (torch layout -> K-major)."""
    lib = get_lib()
    if lib is None or src.dtype.itemsize not in (1, 2, 4, 8):
        return np.ascontiguousarray(src.T)
    src = np.ascontiguousarray(src)
    rows, cols = src.shape
    dst = np.empty((cols, rows), src.dtype)
    rc = lib.drs_transpose_2d(
        src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(rows),
        ctypes.c_int64(cols),
        ctypes.c_int(src.dtype.itemsize),
    )
    if rc != 0:  # pragma: no cover
        return np.ascontiguousarray(src.T)
    return dst


def bnb_repack4(weight_bytes: np.ndarray, n_out: int, n_in: int, split: int) -> Optional[np.ndarray]:
    """bnb flat nibble stream -> canonical split-block packed [K/2, N].
    Returns None when the native path is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(weight_bytes.reshape(-1).view(np.uint8))
    if src.size != n_out * n_in // 2:
        return None
    dst = np.empty((n_in // 2, n_out), np.uint8)
    rc = lib.drs_bnb_repack4(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n_out),
        ctypes.c_int64(n_in),
        ctypes.c_int64(split),
    )
    return dst if rc == 0 else None


def read_spans(path: str, offsets, sizes, threads: int = 0) -> Optional[list]:
    """Parallel positioned reads; returns list of bytes-backed arrays."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(offsets)
    bufs = [np.empty(int(s), np.uint8) for s in sizes]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for b in bufs]
    )
    off = np.asarray(offsets, np.int64)
    siz = np.asarray(sizes, np.int64)
    rc = lib.drs_file_read_spans(
        path.encode(), ctypes.c_int64(n),
        off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        siz.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ptrs, ctypes.c_int(threads),
    )
    return bufs if rc == 0 else None
