"""Native (C++) eval-decode kernels, loaded via ctypes.

Compiled on first use with the baked-in g++ toolchain; all callers fall
back to the NumPy reference implementations when compilation or loading
fails, so the native layer is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "decode.cpp"
_LIB_PATH = _HERE / "libttgdecode.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first call (None if the
    toolchain is unavailable)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() or \
            _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.decode_multi_threshold.restype = ctypes.c_int
    lib.decode_multi_threshold.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.file_count_curves.restype = ctypes.c_int
    lib.file_count_curves.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.file_count_curves_ct.restype = ctypes.c_int
    lib.file_count_curves_ct.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.pack_rows.restype = ctypes.c_int
    lib.pack_rows.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def decode_multi_threshold_native(scores: np.ndarray,
                                  thresholds: np.ndarray,
                                  window_size: int, connect_n: int,
                                  time_resolution: float
                                  ) -> Optional[list]:
    """Native multi-threshold decode; None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    scores = np.ascontiguousarray(scores, np.float32)
    thresholds = np.ascontiguousarray(thresholds, np.float32)
    t, k = len(scores), len(thresholds)
    cap = k * (t // 2 + 2)
    seg_buffer = np.empty(2 * cap, np.float64)
    seg_counts = np.empty(k, np.int32)
    total = lib.decode_multi_threshold(
        _ptr(scores, ctypes.c_float), t,
        _ptr(thresholds, ctypes.c_float), k,
        int(window_size), int(connect_n), float(time_resolution),
        _ptr(seg_buffer, ctypes.c_double), cap,
        _ptr(seg_counts, ctypes.c_int))
    if total < 0:
        return None
    pairs = seg_buffer[:2 * total].reshape(-1, 2)
    out, offset = [], 0
    for count in seg_counts:
        out.append(pairs[offset:offset + count].copy())
        offset += count
    return out


def file_count_curves_native(score: np.ndarray, timestamps: np.ndarray,
                             gt_events: list, dtc: float, gtc: float
                             ) -> Optional[tuple]:
    """Native exact-PSD-ROC per-file sweep; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    score = np.ascontiguousarray(score, np.float32)
    timestamps = np.ascontiguousarray(timestamps, np.float64)
    gts = np.ascontiguousarray(
        np.asarray(gt_events, np.float64).reshape(-1, 2))
    t = len(score)
    uniques = np.empty(t, np.float32)
    tps = np.empty(t, np.int64)
    fps = np.empty(t, np.int64)
    nu = lib.file_count_curves(
        _ptr(score, ctypes.c_float), t,
        _ptr(timestamps, ctypes.c_double),
        _ptr(gts, ctypes.c_double), len(gts),
        float(dtc), float(gtc),
        _ptr(uniques, ctypes.c_float),
        _ptr(tps, ctypes.c_int64), _ptr(fps, ctypes.c_int64))
    if nu <= 0:
        return None
    return uniques[:nu].copy(), tps[:nu].copy(), fps[:nu].copy()


def file_count_curves_ct_native(score: np.ndarray, timestamps: np.ndarray,
                                gt_events: list, gt_other: dict,
                                dtc: float, gtc: float, cttc: float
                                ) -> Optional[tuple]:
    """Native CTTC-aware exact-PSD-ROC sweep (the DESED PSDS2 path);
    None if unavailable.  Returns (uniques_desc, tps, fps, {cls: cts})."""
    lib = get_lib()
    if lib is None:
        return None
    score = np.ascontiguousarray(score, np.float32)
    timestamps = np.ascontiguousarray(timestamps, np.float64)
    gts = np.ascontiguousarray(
        np.asarray(gt_events, np.float64).reshape(-1, 2))
    classes = list(gt_other)
    offsets = np.zeros(len(classes) + 1, np.int32)
    flat = []
    for i, c in enumerate(classes):
        arr = np.asarray(gt_other[c], np.float64).reshape(-1, 2)
        flat.append(arr)
        offsets[i + 1] = offsets[i] + len(arr)
    others = (np.concatenate(flat) if flat
              else np.zeros((0, 2), np.float64))
    others = np.ascontiguousarray(others)
    t = len(score)
    uniques = np.empty(t, np.float32)
    tps = np.empty(t, np.int64)
    fps = np.empty(t, np.int64)
    cts = np.empty((max(len(classes), 1), t), np.int64)
    nu = lib.file_count_curves_ct(
        _ptr(score, ctypes.c_float), t,
        _ptr(timestamps, ctypes.c_double),
        _ptr(gts, ctypes.c_double), len(gts),
        _ptr(others, ctypes.c_double),
        _ptr(offsets, ctypes.c_int), len(classes),
        float(dtc), float(gtc), float(cttc),
        _ptr(uniques, ctypes.c_float),
        _ptr(tps, ctypes.c_int64), _ptr(fps, ctypes.c_int64),
        _ptr(cts, ctypes.c_int64))
    if nu <= 0:
        return None
    return (uniques[:nu].copy(), tps[:nu].copy(), fps[:nu].copy(),
            {c: cts[i, :nu].copy() for i, c in enumerate(classes)})


def pack_rows_native(out: np.ndarray, arrs: list) -> bool:
    """Pack row arrays into ``out[i]`` (zero-filled tails) with the GIL
    released, so data-loader worker threads pad batches concurrently.

    ``out`` must be C-contiguous ``[B, ...]``; each ``arrs[i]`` a
    C-contiguous array of the same dtype whose flattened size is at most
    a row.  Returns False (caller falls back to NumPy) if the library is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    n = len(arrs)
    srcs = (ctypes.c_void_p * n)(*[a.ctypes.data for a in arrs])
    nbytes = np.array([a.nbytes for a in arrs], np.int64)
    row_stride = out.strides[0]
    lib.pack_rows(out.ctypes.data, srcs,
                  _ptr(nbytes, ctypes.c_int64), n, row_stride)
    return True
