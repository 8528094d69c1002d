"""Pallas kernel: fused seed-kNN (feature matmul + streaming exact top-k).

The PointDSC seed kNN (models/pointdsc.py _cal_seed_trans, reference
GMF_PointDSC/models/PointDSC.py:327-335) ranks every correspondence
against each seed by feature distance ``dist = 2 - 2 <f_s, f_n>`` and
keeps the k+1 nearest. The XLA path materializes the [S, N] distance
matrix in HBM and runs the sort-based TopK over it — at the b=64 eval
shape ([64, 500, 5000], k=41) that pair costs ~105 ms/batch, the #2
component of the whole eval forward (scripts/profile_pointdsc_breakdown).

This kernel streams key tiles instead: each grid step computes one
[BS, BN] score tile on the MXU (f32 accumulation — *more* precise than
the bf16 dist the XLA path ranks) and folds it into a running top-k
carried in VMEM, via k rounds of (max, smallest-index-tie-break,
retire). No [S, N] HBM round-trip, no sort.

Selection semantics match ``jax.lax.top_k`` exactly: descending score
(= ascending distance), ties broken toward the smaller index (top_k is
a stable sort). Masked and padded keys rank below everything (-inf)
and, like top_k on -inf rows, fill exhausted rows in ascending index
order (clamped in-range).

The kernel is wrapped in stop_gradient: its only consumed output is the
integer neighbor indices, which are non-differentiable in the reference
too (torch.topk indices).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2 ** 30  # > any valid column index; marks retired/absent entries
_KP = 128      # top-k lane width (one vreg lane row); k must fit


def _kernel(seed_ref, feats_ref, mask_ref, idx_ref, val_ref, vals_c,
            idxs_c, *, k: int, bn: int, n_tiles: int, n_total: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        vals_c[:] = jnp.full_like(vals_c, -jnp.inf)
        idxs_c[:] = jnp.full_like(idxs_c, _BIG)

    # [BS, BN] score tile on the MXU, f32 accumulation. bf16 inputs are
    # exact in one pass; f32 inputs need HIGHEST or Mosaic ranks a
    # single truncated-bf16 pass (~1e-3 relative — enough to reorder
    # near-ties vs the XLA einsum the exact path ranks).
    prec = (jax.lax.Precision.HIGHEST
            if seed_ref.dtype == jnp.float32 else None)
    sc = jax.lax.dot_general(seed_ref[:], feats_ref[:],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=prec)
    col = jax.lax.broadcasted_iota(jnp.int32, sc.shape, 1) + j * bn
    valid = (mask_ref[:] > 0.0) & (col < n_total)
    sc = jnp.where(valid, sc, -jnp.inf)

    # Merge carry and tile: k rounds of select-and-retire over the
    # combined [BS, KP + BN] candidates. Entry identity is its global
    # column index (unique per row), so exactly one entry retires per
    # round; retired entries sit at (-inf, _BIG) and can never win the
    # min-index tie-break again (real columns are < _BIG).
    cv = jnp.concatenate([vals_c[:], sc], axis=1)
    ci = jnp.concatenate([idxs_c[:], col], axis=1)
    bs = sc.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bs, _KP), 1)
    nv = jnp.full((bs, _KP), -jnp.inf, jnp.float32)
    ni = jnp.full((bs, _KP), _BIG, jnp.int32)
    for t in range(k):
        m = jnp.max(cv, axis=1, keepdims=True)
        sel = jnp.min(jnp.where(cv == m, ci, _BIG), axis=1, keepdims=True)
        nv = jnp.where(lane == t, m, nv)
        ni = jnp.where(lane == t, sel, ni)
        hit = ci == sel
        cv = jnp.where(hit, -jnp.inf, cv)
        ci = jnp.where(hit, _BIG, ci)
    vals_c[:] = nv
    idxs_c[:] = ni

    @pl.when(j == n_tiles - 1)
    def _store():
        # Exhausted rows (fewer than k unmasked keys) carry _BIG tails;
        # clamp in-range like lax.top_k (whose -inf fills are in-range).
        idx_ref[:] = jnp.minimum(ni, n_total - 1)
        val_ref[:] = nv


@functools.partial(
    jax.jit, static_argnames=("k", "block_s", "block_n", "interpret"))
def _seed_knn_topk_jit(seed_feats, feats, mask, k: int, block_s: int,
                       block_n: int, interpret: bool):
    S, C = seed_feats.shape
    N = feats.shape[0]
    bs, bn = block_s, block_n
    Sp = S + (-S) % bs
    Np = N + (-N) % bn
    Cp = C + (-C) % 128
    sf = jnp.pad(seed_feats, ((0, Sp - S), (0, Cp - C)))
    fp = jnp.pad(feats.astype(seed_feats.dtype), ((0, Np - N), (0, Cp - C)))
    mp = jnp.pad(mask.astype(jnp.float32), (0, Np - N)).reshape(1, Np)

    idx, val = pl.pallas_call(
        functools.partial(_kernel, k=k, bn=bn, n_tiles=Np // bn,
                          n_total=N),
        out_shape=(
            jax.ShapeDtypeStruct((Sp, _KP), jnp.int32),
            jax.ShapeDtypeStruct((Sp, _KP), jnp.float32),
        ),
        grid=(Sp // bs, Np // bn),
        in_specs=[
            pl.BlockSpec((bs, Cp), lambda i, j: (i, 0)),   # seed feats
            pl.BlockSpec((bn, Cp), lambda i, j: (j, 0)),   # key feats
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),    # key mask
        ],
        out_specs=(
            pl.BlockSpec((bs, _KP), lambda i, j: (i, 0)),
            pl.BlockSpec((bs, _KP), lambda i, j: (i, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bs, _KP), jnp.float32),
            pltpu.VMEM((bs, _KP), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(sf, fp, mp)
    return idx[:S, :k], val[:S, :k]


def seed_knn_topk(seed_feats, feats, k: int, mask=None, block_s: int = None,
                  block_n: int = None, interpret: bool = False):
    """Top-k feature-space neighbors of each seed row, fused on TPU.

    Equivalent to ranking ``-dist`` (dist = 2 - 2 seed_feats @ feats.T,
    unit-norm features) with ``jax.lax.top_k`` — without materializing
    the [S, N] matrix. Scores accumulate in f32 on the MXU regardless of
    the input dtype, so under bf16 models the ranking is strictly closer
    to the reference's f32 kNN than the XLA path's bf16 dist.

    Args:
      seed_feats: [S, C] query rows (the gathered seed features).
      feats: [N, C] keys.
      k: neighbors to keep (includes self when the seed is among the
        keys; the caller drops it, models/pointdsc.py:470).
      mask: optional [N] key validity; invalid keys rank last.

    Returns:
      (idx [S, k] int32, score [S, k] f32) — score is the inner product
      (monotone in -dist), descending.
    """
    if k > _KP:
        raise ValueError(f"k={k} exceeds the kernel's top-k width {_KP}")
    N = feats.shape[0]
    if k > N:
        raise ValueError(f"k={k} > N={N}")
    import os

    # interpret (CPU) blocks are env-overridable for large-N CPU parity
    # runs (the N=12000 KITTI-scale pin): the (8, 128) defaults keep
    # small-N test grids tight but trace ~14k steps at S=1200/N=12000
    bs = block_s or (int(os.environ.get("GMF_FUSED_INTERPRET_BLOCK_S", 8))
                     if interpret else 256)
    bn = block_n or (int(os.environ.get("GMF_FUSED_INTERPRET_BLOCK_N",
                                        128)) if interpret else 1024)
    m = (jnp.ones((N,), jnp.float32) if mask is None
         else mask.astype(jnp.float32))
    # Ranking indices are non-differentiable (torch.topk indices in the
    # reference); cut the graph so autodiff never traverses the kernel.
    return _seed_knn_topk_jit(
        jax.lax.stop_gradient(seed_feats), jax.lax.stop_gradient(feats),
        jax.lax.stop_gradient(m), k, bs, bn, interpret)
