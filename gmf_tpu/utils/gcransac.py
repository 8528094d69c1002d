"""GC-RANSAC rigid registration via the native C++ library (ctypes shim).

Parity: the reference's GC-RANSAC baseline shells out to the external
pygcransac wheel (GMF_PointDSC/baseline_scripts/baseline_3DMatch.py:
101-125, ``pygcransac.findRigidTransform``). This shim exposes the same
capability from a first-party C++ implementation of Graph-Cut RANSAC
(cpp/gcransac/gcransac_rigid.cpp), built from source on first use like
cpp/pmc. Host-side baseline code — not on the accelerator path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np
from numpy.ctypeslib import ndpointer

_LIB: Optional[ctypes.CDLL] = None


def _repo_root() -> str:
    return os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".."))


def _build_and_load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src_dir = os.path.join(_repo_root(), "cpp", "gcransac")
    so_path = os.path.join(src_dir, "libgmfgcransac.so")
    src_path = os.path.join(src_dir, "gcransac_rigid.cpp")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(src_path)):
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True)
    lib = ctypes.cdll.LoadLibrary(so_path)
    lib.gcransac_rigid.restype = ctypes.c_int32
    lib.gcransac_rigid.argtypes = [
        ndpointer(ctypes.c_double, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_double, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int32, ctypes.c_double, ctypes.c_uint32,
        ndpointer(ctypes.c_double, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_uint8, flags="C_CONTIGUOUS"),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    """True when the native solver is built or buildable here."""
    try:
        _build_and_load()
        return True
    except Exception:
        return False


def gcransac_rigid(src: np.ndarray, tgt: np.ndarray, threshold: float,
                   conf: float = 0.99999999,
                   spatial_coherence_weight: float = 0.1,
                   max_iters: int = 5000,
                   neighborhood_radius: Optional[float] = None,
                   seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Graph-Cut RANSAC on putative correspondences src[i] <-> tgt[i].

    Returns (pose [4,4] float32 with tgt ~= R@src + t, mask [N] float32).
    Defaults mirror the reference's pygcransac call (conf 0.99999999,
    spatial_coherence_weight 0.1).
    """
    src = np.ascontiguousarray(src, np.float64)
    tgt = np.ascontiguousarray(tgt, np.float64)
    n = len(src)
    pose = np.eye(4, dtype=np.float64).reshape(-1).copy()
    mask = np.zeros(max(n, 1), np.uint8)
    if n >= 3:
        if neighborhood_radius is None:
            neighborhood_radius = 4.0 * threshold
        lib = _build_and_load()
        lib.gcransac_rigid(
            src.reshape(-1), tgt.reshape(-1), n,
            float(threshold), float(conf),
            float(spatial_coherence_weight), int(max_iters),
            float(neighborhood_radius), np.uint32(seed),
            pose, mask)
    return (pose.reshape(4, 4).astype(np.float32),
            mask[:n].astype(np.float32))
