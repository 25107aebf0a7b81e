"""ctypes bindings for the C++ host-side kernels (native/).

Primary NMS implementations run on-device (i2rnet_tpu.ops.nms); these native
paths serve host-resident evaluation data. The library is built on demand
with the repo Makefile; all entry points degrade gracefully to the JAX
implementations when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SO = _REPO / "native" / "build" / "libi2rnms.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists():
        try:
            subprocess.run(["make", "-C", str(_REPO / "native")], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.i2r_box_nms.restype = ctypes.c_int
        lib.i2r_box_nms.argtypes = [f32p, ctypes.c_int, ctypes.c_float, i32p]
        lib.i2r_oks_nms.restype = ctypes.c_int
        lib.i2r_oks_nms.argtypes = [f32p, f32p, f32p, ctypes.c_int,
                                    ctypes.c_int, f32p, ctypes.c_float, i32p]
        lib.i2r_soft_oks_nms.restype = ctypes.c_int
        lib.i2r_soft_oks_nms.argtypes = [f32p, f32p, f32p, ctypes.c_int,
                                         ctypes.c_int, f32p, ctypes.c_float,
                                         ctypes.c_int, i32p]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def box_nms(dets: np.ndarray, thresh: float):
    """Native greedy box NMS; returns kept indices in score order, or None."""
    lib = _load()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, np.float32)
    keep = np.zeros(len(dets), np.int32)
    n = lib.i2r_box_nms(_fp(dets), len(dets), thresh,
                        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n].tolist()


def oks_nms(kpts: np.ndarray, areas: np.ndarray, scores: np.ndarray,
            sigmas: np.ndarray, thresh: float):
    lib = _load()
    if lib is None:
        return None
    kpts = np.ascontiguousarray(kpts, np.float32)
    areas = np.ascontiguousarray(areas, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    sigmas = np.ascontiguousarray(sigmas, np.float32)
    keep = np.zeros(len(scores), np.int32)
    n = lib.i2r_oks_nms(_fp(kpts), _fp(areas), _fp(scores), len(scores),
                        kpts.shape[1], _fp(sigmas), thresh,
                        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n].tolist()


def soft_oks_nms(kpts: np.ndarray, areas: np.ndarray, scores: np.ndarray,
                 sigmas: np.ndarray, thresh: float, max_dets: int = 20):
    lib = _load()
    if lib is None:
        return None
    kpts = np.ascontiguousarray(kpts, np.float32)
    areas = np.ascontiguousarray(areas, np.float32)
    scores = np.ascontiguousarray(scores, np.float32).copy()
    sigmas = np.ascontiguousarray(sigmas, np.float32)
    keep = np.zeros(len(scores), np.int32)
    n = lib.i2r_soft_oks_nms(_fp(kpts), _fp(areas), _fp(scores), len(scores),
                             kpts.shape[1], _fp(sigmas), thresh, max_dets,
                             keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n].tolist()
