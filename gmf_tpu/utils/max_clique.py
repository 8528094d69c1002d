"""Maximum-clique via the native C++ library (ctypes shim).

Parity: GMF_PointDSC/utils/max_clique.py:14-40 — same ctypes ABI as the
reference's prebuilt libpmc.so, but we build the solver from source
(cpp/pmc/max_clique.cpp) on first use. Used by the PMC baseline
(baseline_scripts/baseline_3DMatch.py:56-78).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np
from numpy.ctypeslib import ndpointer

_LIB: Optional[ctypes.CDLL] = None


def _repo_root() -> str:
    return os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _build_and_load() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    src_dir = os.path.join(_repo_root(), "cpp", "pmc")
    so_path = os.path.join(src_dir, "libgmfpmc.so")
    src_path = os.path.join(src_dir, "max_clique.cpp")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(src_path)):
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True)
    lib = ctypes.cdll.LoadLibrary(so_path)
    lib.max_clique.restype = ctypes.c_int32
    lib.max_clique.argtypes = [
        ctypes.c_int32,
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32, ctypes.c_int32,
        ndpointer(ctypes.c_int32, flags="C_CONTIGUOUS"),
    ]
    _LIB = lib
    return lib


def pmc(ei, ej, nnodes: int, nnedges: int) -> np.ndarray:
    """Maximum clique of the undirected graph given as an edge list.

    Same calling convention as the reference shim (index base 0; returns
    the member vertex indices).
    """
    ei = np.ascontiguousarray(ei, dtype=np.int32)
    ej = np.ascontiguousarray(ej, dtype=np.int32)
    if len(ei) == 0:
        return np.zeros(0, np.int32)
    lib = _build_and_load()
    outsize = max(int(nnodes), 1)
    output = np.zeros(outsize, dtype=np.int32)
    size = lib.max_clique(len(ei), ei, ej, 0, outsize, output)
    return output[:size].copy()


def max_clique_python(adj: np.ndarray) -> np.ndarray:
    """Small pure-NumPy fallback (greedy + single improvement pass); used
    only when no compiler is available. Not exact for adversarial graphs."""
    n = adj.shape[0]
    deg = adj.sum(1)
    order = np.argsort(-deg)
    best = []
    for start in order[: min(n, 64)]:
        clique = [start]
        cand = np.where(adj[start])[0]
        for v in cand[np.argsort(-deg[cand])]:
            if all(adj[v, u] for u in clique):
                clique.append(v)
        if len(clique) > len(best):
            best = clique
    return np.asarray(sorted(best), np.int32)
