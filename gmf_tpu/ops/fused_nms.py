"""Pallas kernel: blockwise score-NMS suppression mask.

The eval-time seed NMS (PointDSC.py:268-301 / geometry/nms.py) needs, for
every correspondence i, whether ANY point j within radius R of it scores
strictly higher. The XLA path materializes the [N, N] distance + relation
matrices (~60 ms at N=5000 b4, pure HBM traffic). This kernel streams key
blocks, rebuilding distances from the (lane-padded) keypoints — O(N)
memory, one pass.

    suppressed[i] = OR_j ( d(i, j) < R  AND  s_j > s_i )
    is_local_max  = NOT suppressed

Fully equivalent to the dense path (geometry.nms.pick_seeds_nms keeps the
reference's >=/ties semantics: j with s_j == s_i never suppresses i).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(sq_ref, skT_ref, scq_ref, sck_ref, out_ref, acc_ref, *,
            radius_sq: float, nk_blocks: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # diff-form distances on the VPU: the kernel has no other MXU work
    # to overlap with, and the f32 [BQ,128]x[128,BK] distance matmul
    # (125 dead lanes, ~6x bf16 pass cost) was the tile's dominant cost
    # (r5 A/B: 12.0 -> measured faster; also the exact dense-path form —
    # sum of squared coordinate diffs, no norm-identity cancellation)
    d2 = None
    for d in range(3):
        sd = sq_ref[:, d:d + 1] - skT_ref[d:d + 1, :]   # [BQ, BK]
        d2 = sd * sd if d2 is None else d2 + sd * sd
    higher = sck_ref[:] > scq_ref[:]    # [1,BK] > [BQ,1] -> [BQ, BK]
    suppressed = jnp.any((d2 < radius_sq) & higher, axis=1, keepdims=True)
    acc_ref[:] = jnp.maximum(acc_ref[:], suppressed.astype(jnp.float32))

    @pl.when(j == nk_blocks - 1)
    def _store():
        out_ref[:] = 1.0 - acc_ref[:]   # is_local_max


@functools.partial(
    jax.jit, static_argnames=("radius", "block_q", "block_k", "interpret"))
def nms_local_max(src_keypts, scores, radius: float, block_q: int = 512,
                  block_k: int = 1024, interpret: bool = False):
    """is_local_max [N] float for one pair ([N,3] keypts, [N] scores)."""
    N = src_keypts.shape[0]
    bq, bk = min(block_q, N), min(block_k, N)
    Np = N + ((-N) % max(bq, bk))
    # everything f32 in-kernel (Mosaic can't lower bf16 compares) and pad
    # keypoints far away / scores at -inf so padded entries are inert
    sp = jnp.pad(src_keypts.astype(jnp.float32), ((0, Np - N), (0, 125)))
    sp = sp.at[N:, 0].set(1e6)
    spT = jnp.transpose(sp[:, :8])      # [8, Np] keys, coord in sublanes
    sc = jnp.pad(scores.astype(jnp.float32), (0, Np - N),
                 constant_values=-jnp.inf)

    out = pl.pallas_call(
        functools.partial(_kernel, radius_sq=float(radius) ** 2,
                          nk_blocks=Np // bk),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        grid=(Np // bq, Np // bk),
        in_specs=[
            pl.BlockSpec((bq, 128), lambda i, j: (i, 0)),  # keypts q
            pl.BlockSpec((8, bk), lambda i, j: (0, j)),    # keypts k^T
            pl.BlockSpec((bq, 1), lambda i, j: (i, 0)),    # scores q
            pl.BlockSpec((1, bk), lambda i, j: (0, j)),    # scores k
        ],
        out_specs=pl.BlockSpec((bq, 1), lambda i, j: (i, 0)),
        scratch_shapes=[pltpu.VMEM((bq, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(sp, spT, sc.reshape(Np, 1), sc.reshape(1, Np))
    return out[:N, 0]


def pick_seeds_nms_fused(src_keypts, scores, radius: float, max_num: int,
                         mask=None, interpret: bool = False):
    """Drop-in for geometry.nms.pick_seeds_nms WITHOUT materializing the
    [B, N, N] distance matrix. src_keypts [B,N,3], scores [B,N]."""
    def one(s, sc):
        return nms_local_max(s, sc, radius, interpret=interpret)

    is_max = jax.vmap(one)(src_keypts, scores)
    ranked = scores * is_max
    if mask is not None:
        ranked = jnp.where(mask > 0, ranked, -jnp.inf)
    _, idx = jax.lax.top_k(ranked, max_num)
    return idx.astype(jnp.int32)
