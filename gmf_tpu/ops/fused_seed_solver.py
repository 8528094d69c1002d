"""Pallas kernel: fused seed-local spectral matching (compat + power iter).

PointDSC turns every seed's k-NN neighborhood into a rigid-transform
hypothesis (reference GMF_PointDSC/models/PointDSC.py:337-427):

    feat_M[i,j]    = clip(1 - (1 - <f_i, f_j>) / sigma^2)        [k, k]
    spatial_M[i,j] = clip(1 - (|si-sj| - |ti-tj|)^2 / sigma_d^2) [k, k]
    M = feat_M * spatial_M * (1 - I)
    w = leading eigenvector of M       (10 power iterations)
    T = weighted_Kabsch(src_knn, tgt_knn, w / sum(w))

The XLA path materializes five [B*S, k, k] matrices in HBM and runs the
power iteration as 10 batched matvec dispatches over them — ~15-20 ms of
pure HBM round-trips at the b=64 eval shape even after the r4 gather
lift (scripts/profile_spectral_kabsch.py). This kernel consumes the
gathered [S*k, C] features and [S*k, 8] packed coordinates tile by tile
(ts seeds per tile, R = ts*k rows) and produces the per-seed eigenvector
weights with no [*, k, k] HBM tensors:

  - feature Gram: ONE [R, C] x [C, R] MXU matmul per tile; the per-seed
    k x k diagonal blocks are then repacked into a 2-D "rows-compact"
    [R, k] layout (row r holds row (r mod k) of seed (r // k)'s block),
  - pairwise distances by per-coordinate broadcasted differences — the
    dense path's exact math, no |x|^2 Gram cancellation,
  - power iteration entirely in the rows-compact layout: the per-seed
    vector V [ts, k] is broadcast to rows with a [R, ts] x [ts, k]
    segment matmul, the matvec is a lane reduction, and V is rebuilt
    with a [ts, R] x [R, k] segment matmul — every array rank-2, every
    contraction on the MXU (Mosaic's layout inference rejects the naive
    [ts, k, k] batched form).

The weighted Kabsch stays in XLA (geometry/kabsch.py): after the r4
repeated-squaring eigensolver it is a handful of batched ops on
[B*S, k, 3] / [B*S, 4, 4] tensors.

MEASURED OUTCOME (r4, b=64 N=5000 default bench): bit-accurate vs the
XLA chain (~1e-7 rotations) but SLOWER in-model — 117-155 vs 222
pairs/s. At the reference's k=40 the per-seed arithmetic is too small to
amortize the per-tile segment matmuls and grid overhead that the
rows-compact layout needs, while XLA's fused batched ops pay neither.
PointDSC.seed_solver="auto" therefore resolves to "xla"; this kernel is
a validated opt-in ("fused") kept for future tuning — the fusion
STRUCTURE (everything in VMEM, band-collapse by matmul) is right, the
constant factors are not yet.

Numerics: all accumulation f32 (the bf16-model dense path computes
feat_M in bf16 — the kernel is closer to the reference's f32 torch
math). The power iteration is the fixed-count variant
(geometry/spectral.py::leading_eigenvector_fixed); the test-mode
while_loop early-exit is a convergence check, identical at convergence.

Gradients: eval-only fast path — the caller keeps the XLA graph for
training (reverse-mode through the kernel is not implemented) and wraps
this in stop_gradient, mirroring ops/fused_scoring.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-6


def _kernel(feats_ref, coords_ref, sigma_ref, out_ref, *,
            ts: int, k: int, num_iters: int, sigma_spat_sq: float):
    R = ts * k
    f32 = jnp.float32

    # ---- feature-similarity blocks: one MXU Gram over the whole tile --
    X = feats_ref[:].astype(f32)                      # [R, C]
    F = jax.lax.dot_general(X, X, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
    sig = sigma_ref[0, 0]
    feat_m = jnp.maximum(1.0 - (1.0 - F) / (sig * sig), 0.0)

    # ---- rows-compact layout ------------------------------------------
    # All per-seed math runs on [R, k] arrays (row r = neighbor r%k of
    # seed r//k, lane j = that seed's j-th neighbor) — 1/ts of the naive
    # [R, R] tile's VPU work. Mosaic cannot concatenate the k x k
    # diagonal blocks out of the Gram (misaligned lane offsets), but a
    # band-collapse MATMUL relocates them exactly: with F masked to its
    # block-diagonal band, (F_masked @ Pj)[r, j] = F[r, seed(r)*k + j]
    # because Pj[c, j] = (c % k == j) hits exactly one band column.
    # Membership matrices are built from their own final-shape iotas
    # (slicing a larger iota crashes Mosaic's layout engine), and segT
    # is materialized transposed so every contraction below is the
    # standard last-dim form (a lhs-first-dim contraction won't lower).
    rid = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
    cid = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    band = (rid // k) == (cid // k)                   # [R, R]
    Pj = (jax.lax.broadcasted_iota(jnp.int32, (R, k), 0) % k
          == jax.lax.broadcasted_iota(jnp.int32, (R, k), 1)
          ).astype(f32)                               # [R, k] c%k == j
    J = (jax.lax.broadcasted_iota(jnp.int32, (R, k), 0) % k
         == jax.lax.broadcasted_iota(jnp.int32, (R, k), 1)).astype(f32)
    seg = (jax.lax.broadcasted_iota(jnp.int32, (R, ts), 0) // k
           == jax.lax.broadcasted_iota(jnp.int32, (R, ts), 1)
           ).astype(f32)                              # [R, ts]
    segT = (jax.lax.broadcasted_iota(jnp.int32, (ts, R), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (ts, R), 1) // k
            ).astype(f32)                             # [ts, R]

    feat_rows = jax.lax.dot_general(
        jnp.where(band, feat_m, 0.0), Pj, (((1,), (0,)), ((), ())),
        preferred_element_type=f32)                   # [R, k]

    # spatial consistency, rows-compact: neighbor coordinates relocated
    # to lanes with the same two segment matmuls (all 6 coords at once)
    P = coords_ref[:]                                 # [R, 8] f32
    pj6 = jnp.concatenate([P[:, c:c + 1] * J for c in range(6)],
                          axis=1)                     # [R, 6k]
    cseed = jax.lax.dot_general(segT, pj6, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)  # [ts, 6k]
    crows = jax.lax.dot_general(seg, cseed, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)  # [R, 6k]
    d2s = jnp.zeros((R, k), f32)
    d2t = jnp.zeros((R, k), f32)
    for c in range(3):
        ds = P[:, c:c + 1] - crows[:, c * k:(c + 1) * k]
        dt = P[:, c + 3:c + 4] - crows[:, (c + 3) * k:(c + 4) * k]
        d2s = d2s + ds * ds
        d2t = d2t + dt * dt
    dd = jnp.sqrt(d2s) - jnp.sqrt(d2t)
    spatial_rows = jnp.maximum(1.0 - dd * dd / sigma_spat_sq, 0.0)

    M_rows = feat_rows * spatial_rows * (1.0 - J)     # self-compat off

    # ---- power iteration (fixed count, spectral.py parity) ------------
    # Matvec = one lane reduction; the result column u [R, 1] is
    # relocated back to lanes via segT @ (u * J) and re-broadcast to
    # rows via seg @ V. Per-iteration normalization only rescales
    # (direction is unchanged: v/(|v|+eps) is parallel to v), so the
    # in-loop step is a scalar max-rescale against f32 overflow; the
    # reference's +1e-6 epsilons only bite in the FINAL normalization,
    # applied per seed below.
    V = jnp.ones((ts, k), f32)
    for _ in range(num_iters):
        vb = jax.lax.dot_general(seg, V, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)  # [R, k]
        u = jnp.sum(M_rows * vb, axis=1, keepdims=True)       # [R, 1]
        V = jax.lax.dot_general(segT, u * J, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)   # [ts, k]
        V = V / jnp.maximum(jnp.max(V), 1e-30)

    nrm = jnp.sqrt(jnp.sum(V * V, axis=1, keepdims=True) + 1e-24)
    unit = V / (nrm + _EPS)
    # hypothesis weights (ref :365: w / (sum + 1e-6))
    out_ref[:] = unit / (jnp.sum(unit, axis=1, keepdims=True) + _EPS)


@functools.partial(
    jax.jit,
    static_argnames=("ts", "k", "num_iters", "sigma_spat_sq", "interpret"))
def _weights_jit(feats, coords, sigma, ts: int, k: int, num_iters: int,
                 sigma_spat_sq: float, interpret: bool):
    R = ts * k
    Sk, C = feats.shape
    out = pl.pallas_call(
        functools.partial(_kernel, ts=ts, k=k, num_iters=num_iters,
                          sigma_spat_sq=sigma_spat_sq),
        out_shape=jax.ShapeDtypeStruct((Sk // k, k), jnp.float32),
        grid=(Sk // R,),
        in_specs=[
            pl.BlockSpec((R, C), lambda i: (i, 0)),
            pl.BlockSpec((R, 8), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ts, k), lambda i: (i, 0)),
        interpret=interpret,
    )(feats, coords, sigma)
    return out


def fused_seed_weights(knn_features, src_knn, tgt_knn, sigma,
                       sigma_d: float, num_iters: int = 10,
                       ts: int = 8, interpret: bool = False):
    """Per-seed spectral-matching weights, fused on TPU.

    Equivalent to the XLA chain feat_M -> spatial_M -> power iteration ->
    sum-normalize (reference PointDSC.py:337-365 + :429-448) without any
    [S, k, k] HBM tensors.

    Args:
      knn_features: [S, k, C] gathered (normalized) features.
      src_knn, tgt_knn: [S, k, 3] gathered keypoints.
      sigma: scalar (or [1]) learned feature-sigma.
      sigma_d: static spatial sigma.
      num_iters: power-iteration count (reference: 10).
      ts: seeds per kernel tile.

    Returns [S, k] f32 weights (sum-normalized per seed).
    """
    S, k, C = knn_features.shape
    Sp = S + (-S) % ts
    feats = knn_features.reshape(S * k, C)
    coords = jnp.concatenate(
        [src_knn.astype(jnp.float32), tgt_knn.astype(jnp.float32),
         jnp.zeros((S, k, 2), jnp.float32)], axis=-1).reshape(S * k, 8)
    if Sp != S:
        feats = jnp.pad(feats, ((0, (Sp - S) * k), (0, 0)))
        coords = jnp.pad(coords, ((0, (Sp - S) * k), (0, 0)))
    sig = jnp.asarray(sigma, jnp.float32).reshape(1, 1)
    out = _weights_jit(
        jax.lax.stop_gradient(feats), jax.lax.stop_gradient(coords),
        jax.lax.stop_gradient(sig),
        ts, k, num_iters, float(sigma_d) ** 2, interpret)
    return out[:S]


def fused_seed_transforms(knn_features, src_knn, tgt_knn, sigma,
                          sigma_d: float, num_iters: int = 10,
                          ts: int = 8, interpret: bool = False,
                          kabsch_method: str = "quat"):
    """Seed transforms from gathered k-NN neighborhoods.

    ``fused_seed_weights`` (Pallas) + weighted Kabsch (XLA batched Horn
    quaternions). Returns [S, 4, 4] f32 transforms.
    """
    from gmf_tpu.geometry.kabsch import rigid_transform_3d

    w = fused_seed_weights(knn_features, src_knn, tgt_knn, sigma, sigma_d,
                           num_iters=num_iters, ts=ts, interpret=interpret)
    return rigid_transform_3d(
        jax.lax.stop_gradient(src_knn.astype(jnp.float32)),
        jax.lax.stop_gradient(tgt_knn.astype(jnp.float32)),
        w, method=kabsch_method)
