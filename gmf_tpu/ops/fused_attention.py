"""Pallas TPU kernel: compatibility-modulated flash attention.

The hottest op in PointDSC (SURVEY.md §3.1): 12 layers of single-head
self-attention whose logits are ELEMENTWISE MULTIPLIED by the spatial-
consistency matrix before softmax (PointDSC.py:60-64):

    compat[i,j] = max(0, 1 - (|s_i - s_j| - |t_i - t_j|)^2 / sigma^2)
    weight      = softmax(compat * (q_i . k_j) / sqrt(d))

The XLA path materializes the [N, N] compat + logits tensors (576 MB each
at KITTI's N=12000). This kernel streams K/V blocks flash-attention style
and rebuilds compat on the fly from the keypoint coordinates — O(N) HBM
instead of O(N^2), with all matmuls on the MXU.

Trick: keypoints are zero-padded to 128 lanes so the [BQ,3]x[3,BK]
distance dot-products become full MXU tiles at zero extra cost (the MXU
pads the contraction dim to 128 regardless).

Used in the no-grad eval path; training at N=1000 stays on XLA (the
fused backward is not implemented — the reference trains at N=1000 where
XLA is compute-bound anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, sq_ref, sk_ref, tq_ref, tk_ref, mask_ref,
            o_ref, m_scr, l_scr, acc_scr, *, sigma_sq: float, scale: float,
            nk_blocks: int, mm_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # QK^T in bf16 with f32 accumulation on TPU — matches the dense XLA
    # path's default-precision matmuls there; f32 in interpret/CPU mode
    # (distances below always stay f32).
    q = q_ref[:].astype(mm_dtype)      # [BQ, D]
    k = k_ref[:].astype(mm_dtype)      # [BK, D]
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                          # [BQ, BK]

    # spatial consistency, rebuilt blockwise from (zero-padded) keypoints
    sq = sq_ref[:]                     # [BQ, 128] (xyz in lanes 0..2)
    sk = sk_ref[:]
    tq = tq_ref[:]
    tk = tk_ref[:]
    dot_s = jax.lax.dot_general(sq, sk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dot_t = jax.lax.dot_general(tq, tk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    ns_q = jnp.sum(sq * sq, axis=1)[:, None]
    ns_k = jnp.sum(sk * sk, axis=1)[None, :]
    nt_q = jnp.sum(tq * tq, axis=1)[:, None]
    nt_k = jnp.sum(tk * tk, axis=1)[None, :]
    ds = jnp.sqrt(jnp.maximum(ns_q + ns_k - 2.0 * dot_s, 0.0))
    dt = jnp.sqrt(jnp.maximum(nt_q + nt_k - 2.0 * dot_t, 0.0))
    compat = jnp.maximum(1.0 - (ds - dt) ** 2 / sigma_sq, 0.0)

    s = compat * qk
    s = jnp.where(mask_ref[:] > 0, s, NEG_INF)  # mask: [1, BK] broadcasts

    # online softmax
    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # [BQ, 1]
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = m_next
    l_scr[:] = l_next

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
        p.astype(mm_dtype), v_ref[:].astype(mm_dtype),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk_blocks - 1)
    def _store():
        o_ref[:] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sigma_d", "block_q", "block_k", "interpret"),
)
def compat_flash_attention(q, k, v, src_keypts, tgt_keypts, mask=None,
                           sigma_d: float = 0.10, block_q: int = 256,
                           block_k: int = 512, interpret: bool = False):
    """Single-head compat-modulated attention, one pair.

    Args:
      q, k, v: [N, D] (D multiple of 128 preferred).
      src_keypts, tgt_keypts: [N, 3].
      mask: optional [N] key validity.
      sigma_d: spatial-consistency sigma (static).

    Returns [N, D] = softmax(compat * qk / sqrt(D)) @ v.
    """
    N, D = q.shape
    bq = min(block_q, N)
    bk = min(block_k, N)
    # one padded size (lcm-ish: max block) keeps all arrays aligned
    Np = N + ((-N) % max(bq, bk))

    def padN(x):
        return jnp.pad(x, ((0, Np - N),) + ((0, 0),) * (x.ndim - 1))

    qp, kp, vp = padN(q), padN(k), padN(v)
    sp = jnp.pad(src_keypts, ((0, Np - N), (0, 125)))  # 3 -> 128 lanes
    tp = jnp.pad(tgt_keypts, ((0, Np - N), (0, 125)))
    # mask stays f32 regardless of activation dtype (Mosaic cannot lower
    # bf16 comparisons against literals on all generations)
    m = (jnp.ones((N,), jnp.float32) if mask is None
         else mask.astype(jnp.float32))
    mp = jnp.pad(m, (0, Np - N)).reshape(1, Np)

    nq_blocks = Np // bq
    nk_blocks = Np // bk

    kernel = functools.partial(
        _kernel, sigma_sq=float(sigma_d) ** 2, scale=1.0 / (D ** 0.5),
        nk_blocks=nk_blocks,
        mm_dtype=jnp.float32 if interpret else jnp.bfloat16)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, D), q.dtype),
        grid=(nq_blocks, nk_blocks),
        in_specs=[
            pl.BlockSpec((bq, D), lambda i, j: (i, 0)),    # q
            pl.BlockSpec((bk, D), lambda i, j: (j, 0)),    # k
            pl.BlockSpec((bk, D), lambda i, j: (j, 0)),    # v
            pl.BlockSpec((bq, 128), lambda i, j: (i, 0)),  # src_q
            pl.BlockSpec((bk, 128), lambda i, j: (j, 0)),  # src_k
            pl.BlockSpec((bq, 128), lambda i, j: (i, 0)),  # tgt_q
            pl.BlockSpec((bk, 128), lambda i, j: (j, 0)),  # tgt_k
            pl.BlockSpec((1, bk), lambda i, j: (0, j)),    # mask
        ],
        out_specs=pl.BlockSpec((bq, D), lambda i, j: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),   # m
            pltpu.VMEM((bq, 1), jnp.float32),   # l
            pltpu.VMEM((bq, D), jnp.float32),   # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, sp, sp, tp, tp, mp)

    return out[:N]


def compat_attention_reference(q, k, v, src_keypts, tgt_keypts, mask=None,
                               sigma_d: float = 0.10):
    """XLA reference (materializes N^2) for testing the kernel."""
    D = q.shape[-1]
    qk = (q @ k.T) / (D ** 0.5)
    ds = jnp.linalg.norm(src_keypts[:, None] - src_keypts[None], axis=-1)
    dt = jnp.linalg.norm(tgt_keypts[:, None] - tgt_keypts[None], axis=-1)
    compat = jnp.maximum(1.0 - (ds - dt) ** 2 / sigma_d ** 2, 0.0)
    s = compat * qk
    if mask is not None:
        s = jnp.where(mask[None, :] > 0, s, NEG_INF)
    return jax.nn.softmax(s, axis=-1) @ v
