"""Pallas TPU kernel: compatibility-modulated flash attention (fwd + bwd).

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

Differentiation: a jax.custom_vjp with a flash backward. The forward
additionally emits the per-row logsumexp; the backward recomputes
compat/p blockwise in two passes (dK/dV with the key block resident,
dQ with the query block resident). Both backward kernels keep the QUERY
index in the lane dimension ([BK, BQ] tiles) so the [1, BQ] lse/delta
rows broadcast without any in-kernel transpose. Gradients flow to
q/k/v only; the keypoints and mask get symbolic zeros (they are data
inputs in the reference — PointDSC.py:216-221 builds compat from the
non-learnable correspondence coordinates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_LSE_PAD = 1e9  # lse of padded/invalid query rows in bwd => p == 0


def _compat_block(sa, sb, ta, tb, sigma_sq):
    """Spatial-consistency tile with rows = a, cols = b.

    sa/ta: [BA, 128] zero-padded keypoints; sb/tb: [BB, 128].
    """
    dot_s = jax.lax.dot_general(sa, sb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dot_t = jax.lax.dot_general(ta, tb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    ns_a = jnp.sum(sa * sa, axis=1)[:, None]
    ns_b = jnp.sum(sb * sb, axis=1)[None, :]
    nt_a = jnp.sum(ta * ta, axis=1)[:, None]
    nt_b = jnp.sum(tb * tb, axis=1)[None, :]
    ds = jnp.sqrt(jnp.maximum(ns_a + ns_b - 2.0 * dot_s, 0.0))
    dt = jnp.sqrt(jnp.maximum(nt_a + nt_b - 2.0 * dot_t, 0.0))
    return jnp.maximum(1.0 - (ds - dt) ** 2 / sigma_sq, 0.0)


def _fwd_kernel(q_ref, k_ref, v_ref, sq_ref, sk_ref, tq_ref, tk_ref,
                mask_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
                sigma_sq: float, scale: float, nk_blocks: int, mm_dtype):
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

    compat = _compat_block(sq_ref[:], sk_ref[:], tq_ref[:], tk_ref[:],
                           sigma_sq)
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
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[:] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse = m_scr[:] + jnp.log(l)              # [BQ, 1]
        lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


def _bwd_tile(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, sq_ref,
              sk_ref, tq_ref, tk_ref, maskc_ref, sigma_sq, scale, mm_dtype):
    """Shared backward tile math, key index in rows / query in lanes.

    Returns (p_T [BK, BQ] f32, dlogits_T [BK, BQ] f32).
    """
    q = q_ref[:].astype(mm_dtype)
    k = k_ref[:].astype(mm_dtype)
    qk_t = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                    # [BK, BQ]
    compat_t = _compat_block(sk_ref[:], sq_ref[:], tk_ref[:], tq_ref[:],
                             sigma_sq)
    s_t = compat_t * qk_t
    mk = jnp.max(maskc_ref[:], axis=1, keepdims=True)   # [BK, 1]
    s_t = jnp.where(mk > 0, s_t, NEG_INF)
    p_t = jnp.exp(s_t - lse_ref[:])              # lse [1, BQ] broadcasts
    dp_t = jax.lax.dot_general(
        v_ref[:].astype(mm_dtype), do_ref[:].astype(mm_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dlogits_t = p_t * (dp_t - delta_ref[:]) * compat_t * scale
    return p_t, dlogits_t


def _bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                    sq_ref, sk_ref, tq_ref, tk_ref, maskc_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *, sigma_sq: float,
                    scale: float, nq_blocks: int, mm_dtype):
    i = pl.program_id(1)  # query block (inner)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    p_t, dlogits_t = _bwd_tile(
        q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, sq_ref, sk_ref,
        tq_ref, tk_ref, maskc_ref, sigma_sq, scale, mm_dtype)
    dv_scr[:] = dv_scr[:] + jax.lax.dot(
        p_t.astype(mm_dtype), do_ref[:].astype(mm_dtype),
        preferred_element_type=jnp.float32)
    dk_scr[:] = dk_scr[:] + jax.lax.dot(
        dlogits_t.astype(mm_dtype), q_ref[:].astype(mm_dtype),
        preferred_element_type=jnp.float32)

    @pl.when(i == nq_blocks - 1)
    def _store():
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                   sq_ref, sk_ref, tq_ref, tk_ref, maskc_ref,
                   dq_ref, dq_scr, *, sigma_sq: float, scale: float,
                   nk_blocks: int, mm_dtype):
    j = pl.program_id(1)  # key block (inner)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    _, dlogits_t = _bwd_tile(
        q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, sq_ref, sk_ref,
        tq_ref, tk_ref, maskc_ref, sigma_sq, scale, mm_dtype)
    dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
        dlogits_t.astype(mm_dtype), k_ref[:].astype(mm_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(j == nk_blocks - 1)
    def _store():
        dq_ref[:] = dq_scr[:].astype(dq_ref.dtype)


def _forward_call(qp, kp, vp, sp, tp, mp, sigma_sq, scale, bq, bk,
                  interpret):
    """Padded-shape pallas forward. Returns (out [Np, D], lse [Np, 128])."""
    Np, D = qp.shape
    nq_blocks = Np // bq
    nk_blocks = Np // bk
    kernel = functools.partial(
        _fwd_kernel, sigma_sq=sigma_sq, scale=scale, nk_blocks=nk_blocks,
        mm_dtype=jnp.float32 if interpret else jnp.bfloat16)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Np, D), qp.dtype),
                   jax.ShapeDtypeStruct((Np, 128), jnp.float32)),
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
        out_specs=(pl.BlockSpec((bq, D), lambda i, j: (i, 0)),
                   pl.BlockSpec((bq, 128), lambda i, j: (i, 0))),
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _flash(qp, kp, vp, sp, tp, mp, sigma_sq, scale, bq, bk, interpret):
    out, _ = _forward_call(qp, kp, vp, sp, tp, mp, sigma_sq, scale, bq, bk,
                           interpret)
    return out


def _flash_fwd(qp, kp, vp, sp, tp, mp, sigma_sq, scale, bq, bk, interpret):
    out, lse = _forward_call(qp, kp, vp, sp, tp, mp, sigma_sq, scale, bq,
                             bk, interpret)
    return out, (qp, kp, vp, sp, tp, mp, out, lse)


def _flash_bwd(sigma_sq, scale, bq, bk, interpret, res, do):
    qp, kp, vp, sp, tp, mp, out, lse = res
    Np, D = qp.shape
    # The backward keeps more tiles live than the forward; (256, 512) is
    # its known VMEM-safe configuration, and Np (a multiple of the
    # forward blocks) stays divisible by these smaller powers of two.
    if (bq & (bq - 1)) == 0 and (bk & (bk - 1)) == 0:
        bq = min(bq, 256)
        bk = min(bk, 512)
    nq_blocks = Np // bq
    nk_blocks = Np // bk
    mm_dtype = jnp.float32 if interpret else jnp.bfloat16

    # padded/invalid query rows: p must be exactly 0 in the recompute
    # (their forward lse ~ NEG_INF would otherwise make exp() explode;
    # their do is already zero, but 0 * inf = nan).
    valid = mp[0] > 0                                     # [Np]
    lse_row = jnp.where(valid, lse[:, 0], _LSE_PAD).reshape(1, Np)
    delta_row = jnp.sum(do * out, axis=-1).reshape(1, Np)  # [1, Np]
    maskc = jnp.broadcast_to(mp.reshape(Np, 1), (Np, 128))

    qspec = pl.BlockSpec((bq, D), lambda a, b: (b, 0))
    kspec = pl.BlockSpec((bk, D), lambda a, b: (a, 0))
    rowq = pl.BlockSpec((1, bq), lambda a, b: (0, b))
    sqspec = pl.BlockSpec((bq, 128), lambda a, b: (b, 0))
    skspec = pl.BlockSpec((bk, 128), lambda a, b: (a, 0))

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, sigma_sq=sigma_sq, scale=scale,
                          nq_blocks=nq_blocks, mm_dtype=mm_dtype),
        out_shape=(jax.ShapeDtypeStruct((Np, D), kp.dtype),
                   jax.ShapeDtypeStruct((Np, D), vp.dtype)),
        grid=(nk_blocks, nq_blocks),
        in_specs=[qspec, qspec, rowq, rowq, kspec, kspec,
                  sqspec, skspec, sqspec, skspec, skspec],
        out_specs=(pl.BlockSpec((bk, D), lambda a, b: (a, 0)),
                   pl.BlockSpec((bk, D), lambda a, b: (a, 0))),
        scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32),
                        pltpu.VMEM((bk, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, do, lse_row, delta_row, kp, vp, sp, sp, tp, tp, maskc)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sigma_sq=sigma_sq, scale=scale,
                          nk_blocks=nk_blocks, mm_dtype=mm_dtype),
        out_shape=jax.ShapeDtypeStruct((Np, D), qp.dtype),
        grid=(nq_blocks, nk_blocks),
        in_specs=[
            pl.BlockSpec((bq, D), lambda a, b: (a, 0)),      # q
            pl.BlockSpec((bq, D), lambda a, b: (a, 0)),      # do
            pl.BlockSpec((1, bq), lambda a, b: (0, a)),      # lse
            pl.BlockSpec((1, bq), lambda a, b: (0, a)),      # delta
            pl.BlockSpec((bk, D), lambda a, b: (b, 0)),      # k
            pl.BlockSpec((bk, D), lambda a, b: (b, 0)),      # v
            pl.BlockSpec((bq, 128), lambda a, b: (a, 0)),    # src_q
            pl.BlockSpec((bk, 128), lambda a, b: (b, 0)),    # src_k
            pl.BlockSpec((bq, 128), lambda a, b: (a, 0)),    # tgt_q
            pl.BlockSpec((bk, 128), lambda a, b: (b, 0)),    # tgt_k
            pl.BlockSpec((bk, 128), lambda a, b: (b, 0)),    # mask col
        ],
        out_specs=pl.BlockSpec((bq, D), lambda a, b: (a, 0)),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, do, lse_row, delta_row, kp, vp, sp, sp, tp, tp, maskc)

    zero_s = jnp.zeros_like(sp)
    zero_t = jnp.zeros_like(tp)
    zero_m = jnp.zeros_like(mp)
    return dq, dk, dv, zero_s, zero_t, zero_m


_flash.defvjp(_flash_fwd, _flash_bwd)


def _default_blocks():
    """Block sizes, overridable for tuning (GMF_FLASH_BLOCK_Q/K).

    (512, 1024) is the VMEM-feasible optimum on v5e: the r2 sweep at
    N=5000 b=64 measured 104 -> 118.8 pairs/s over (256, 512), and both
    (512, 1280) and (640/1024) exceed the 16 MB scoped-vmem limit.

    NOTE: the backward pass clamps power-of-two blocks to (256, 512)
    (its VMEM-safe config); non-power-of-two overrides bypass that clamp
    and can OOM VMEM in the backward — they are rejected here.
    """
    import os

    bq = int(os.environ.get("GMF_FLASH_BLOCK_Q", 512))
    bk = int(os.environ.get("GMF_FLASH_BLOCK_K", 1024))
    for name, b in (("GMF_FLASH_BLOCK_Q", bq), ("GMF_FLASH_BLOCK_K", bk)):
        if b <= 0 or b & (b - 1):
            raise ValueError(
                f"{name}={b} must be a positive power of two (the "
                "backward-pass VMEM clamp only applies to power-of-two "
                "blocks)")
    return bq, bk


def compat_flash_attention(q, k, v, src_keypts, tgt_keypts, mask=None,
                           sigma_d: float = 0.10, block_q: int = None,
                           block_k: int = None, interpret: bool = False):
    """Single-head compat-modulated attention, one pair. Differentiable
    w.r.t. q/k/v (flash backward; keypoints/mask receive zero grads).

    Args:
      q, k, v: [N, D] (D multiple of 128 preferred).
      src_keypts, tgt_keypts: [N, 3].
      mask: optional [N] key validity.
      sigma_d: spatial-consistency sigma (static).

    Returns [N, D] = softmax(compat * qk / sqrt(D)) @ v.

    Block sizes (incl. the GMF_FLASH_BLOCK_Q/K env defaults) are resolved
    here, OUTSIDE the jit, so they are real static args — changing the env
    vars between calls retriggers compilation instead of being silently
    ignored by a stale jit cache.
    """
    if interpret:
        # no hardware tiling in interpret mode: small blocks keep the
        # padded size near N (CPU tests) while still exercising the
        # multi-block online-softmax path
        dbq, dbk = 64, 128
    else:
        dbq, dbk = _default_blocks()
    bq = block_q or dbq
    bk = block_k or dbk
    return _compat_flash_attention_jit(q, k, v, src_keypts, tgt_keypts,
                                       mask, sigma_d=sigma_d, block_q=bq,
                                       block_k=bk, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("sigma_d", "block_q", "block_k", "interpret"),
)
def _compat_flash_attention_jit(q, k, v, src_keypts, tgt_keypts, mask=None,
                                sigma_d: float = 0.10, block_q: int = 512,
                                block_k: int = 1024,
                                interpret: bool = False):
    N, D = q.shape
    bq, bk = block_q, block_k
    # Pad N up to a multiple of BOTH block sizes. Blocks are deliberately
    # NOT clamped to N: a block clamped to a non-power-of-two N stops
    # dividing the padded size and the grid silently drops query rows
    # (regression: NaN output at N=300 with 256/512 blocks). For
    # power-of-two blocks the max covers both; lcm otherwise.
    if (bq & (bq - 1)) == 0 and (bk & (bk - 1)) == 0:
        align = max(bq, bk)
    else:
        import math

        align = math.lcm(bq, bk)
    Np = N + ((-N) % align)

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

    out = _flash(qp, kp, vp, sp, tp, mp, float(sigma_d) ** 2,
                 1.0 / (D ** 0.5), bq, bk, interpret)
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
