"""Classical outlier-rejection baselines under the same eval harness.

Parity: GMF_PointDSC/baseline_scripts/baseline_3DMatch.py /
baseline_KITTI.py — SM (spectral matching :19-54), PMC (max-clique
:56-78), RANSAC (:80-100), GC-RANSAC (:101-125 — pygcransac when the
wheel is installed, else the first-party native solver in cpp/gcransac).

All JAX except PMC's clique search (native C++, cpp/pmc), GC-RANSAC's
native solver (cpp/gcransac), and the edge-list construction.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gmf_tpu.geometry.kabsch import rigid_transform_3d
from gmf_tpu.geometry.ransac import ransac_registration
from gmf_tpu.geometry.spectral import leading_eigenvector_fixed

_PREC = jax.lax.Precision.HIGHEST


class BaselineUnavailable(RuntimeError):
    """A baseline's external dependency is missing (e.g. pygcransac)."""


def _pygcransac_available() -> bool:
    try:
        import pygcransac  # noqa: F401
        return True
    except ImportError:
        return False


def gcransac_available() -> bool:
    """GC-RANSAC runs through the external pygcransac wheel when present
    (exact reference parity) or the first-party native solver
    (cpp/gcransac, built from source on first use)."""
    if _pygcransac_available():
        return True
    from gmf_tpu.utils.gcransac import native_available

    return native_available()


def gcransac_register(src_keypts, tgt_keypts, inlier_threshold: float,
                      max_iteration: int = 5000
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """GC-RANSAC baseline (ref baseline_3DMatch.py:101-125).

    Uses pygcransac when the wheel is installed (the reference's exact
    dependency); otherwise the native reimplementation
    (gmf_tpu/utils/gcransac.py -> cpp/gcransac/gcransac_rigid.cpp) with
    the same call parameters (conf 0.99999999, spatial coherence 0.1).
    """
    src = np.asarray(src_keypts, np.float64)
    tgt = np.asarray(tgt_keypts, np.float64)
    if _pygcransac_available():
        import pygcransac

        pose, mask = pygcransac.findRigidTransform(
            src, tgt, threshold=inlier_threshold, conf=0.99999999,
            spatial_coherence_weight=0.1, max_iters=max_iteration,
            use_sprt=True, min_inlier_ratio_for_sprt=0.1)
        if mask.sum() == 0:
            pose = np.eye(4)
        return pose.T.astype(np.float32), np.asarray(mask, np.float32)

    from gmf_tpu.utils.gcransac import gcransac_rigid

    pose, mask = gcransac_rigid(
        src, tgt, threshold=inlier_threshold,
        spatial_coherence_weight=0.1, max_iters=max_iteration)
    if mask.sum() == 0:
        pose = np.eye(4, dtype=np.float32)
    return pose, mask


def sm_register(corr_pos, src_keypts, tgt_keypts, inlier_threshold: float,
                top_ratio: float = 0.1) -> Tuple[np.ndarray, np.ndarray]:
    """Spectral matching baseline (ref :19-54): polynomial compatibility
    max(0, 4.5 - d^2 / (2 sigma^2)) with sigma = tau/3, 10 power-iteration
    steps, top-10% of the eigenvector as inliers, eig-weighted Kabsch."""
    corr = jnp.asarray(corr_pos)
    diff = corr[:, None, :] - corr[None, :, :]
    M = (jnp.linalg.norm(diff[:, :, 0:3], axis=-1)
         - jnp.linalg.norm(diff[:, :, 3:6], axis=-1))
    sigma = inlier_threshold / 3.0
    M = jnp.maximum(0.0, 4.5 - M ** 2 / (2 * sigma ** 2))
    M = M * (1.0 - jnp.eye(M.shape[0], dtype=M.dtype))

    eig = leading_eigenvector_fixed(M[None], num_iters=10)[0]
    k = max(int(len(eig) * top_ratio), 1)
    top = jnp.argsort(-eig)[:k]
    labels = jnp.zeros_like(eig).at[top].set(1.0)
    trans = rigid_transform_3d(
        jnp.asarray(src_keypts)[None], jnp.asarray(tgt_keypts)[None],
        (eig * labels)[None])[0]
    return np.asarray(trans), np.asarray(labels)


def pmc_register(corr_pos, src_keypts, tgt_keypts,
                 inlier_threshold: float) -> Tuple[np.ndarray, np.ndarray]:
    """Max-clique baseline (ref :56-78): consistency graph with edges where
    |len_src - len_tgt| difference of squared sums < tau, maximum clique
    via the native solver, uniform-weight Kabsch on the clique."""
    from gmf_tpu.utils.max_clique import pmc

    corr = np.asarray(corr_pos)
    n = len(corr)
    # |d_src^2 - d_tgt^2| consistency (the reference compares squared sums)
    s = corr[:, 0:3]
    t = corr[:, 3:6]
    ds = ((s[:, None] - s[None]) ** 2).sum(-1)
    dt = ((t[:, None] - t[None]) ** 2).sum(-1)
    ok = np.abs(ds - dt) < inlier_threshold
    np.fill_diagonal(ok, False)
    ei, ej = np.where(np.triu(ok, 1))
    clique = pmc(ei.astype(np.int32), ej.astype(np.int32), n, len(ei))
    labels = np.zeros(n, np.float32)
    labels[clique] = 1.0
    trans = rigid_transform_3d(
        jnp.asarray(src_keypts)[None], jnp.asarray(tgt_keypts)[None],
        jnp.asarray(labels)[None])[0]
    return np.asarray(trans), labels


def ransac_register(src_keypts, tgt_keypts, inlier_threshold: float,
                    max_iteration: int = 5000, seed: int = 0
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """RANSAC-on-correspondences baseline (ref :80-100)."""
    T, inliers, _ = ransac_registration(
        jax.random.PRNGKey(seed), jnp.asarray(src_keypts),
        jnp.asarray(tgt_keypts), inlier_threshold=inlier_threshold,
        num_iters=max_iteration)
    return np.asarray(T), np.asarray(inliers).astype(np.float32)


BASELINE_METHODS = ("SM", "PMC", "RANSAC", "GCRANSAC")


def make_baseline_register_fn(method: str, inlier_threshold: float = 0.10,
                              max_iteration: int = 5000):
    """Harness-compatible register_fn for a named baseline.

    Raises ``BaselineUnavailable`` at CONSTRUCTION time when the method's
    external dependency is missing, so eval CLIs can log a skip instead of
    crashing mid-run.
    """
    method = method.upper()
    if method not in BASELINE_METHODS:
        raise ValueError(f"unknown baseline {method!r}")
    if method == "GCRANSAC" and not gcransac_available():
        raise BaselineUnavailable(
            "GC-RANSAC needs either the pygcransac wheel or a C++ "
            "toolchain to build the native solver (cpp/gcransac)")

    def register(pair: Dict[str, np.ndarray]):
        if method == "SM":
            return sm_register(pair["corr_pos"], pair["src_keypts"],
                               pair["tgt_keypts"], inlier_threshold)
        if method == "PMC":
            return pmc_register(pair["corr_pos"], pair["src_keypts"],
                                pair["tgt_keypts"], inlier_threshold)
        if method == "RANSAC":
            return ransac_register(pair["src_keypts"], pair["tgt_keypts"],
                                   inlier_threshold, max_iteration)
        return gcransac_register(pair["src_keypts"], pair["tgt_keypts"],
                                 inlier_threshold, max_iteration)

    return register
