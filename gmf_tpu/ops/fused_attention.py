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

Cached-compat mode (the r3 perf lever): compat depends only on the
keypoints, which are IDENTICAL across PointDSC's 12 layers — yet the
streaming kernel above re-derives it per layer, and the compat tile math
is VPU-bound (measured N=5000 b=64 fwd: 251.5 ms with compat vs 93.6 ms
with compat stubbed; moving the distance dots between MXU and VPU makes
no difference). `build_compat_cache` precomputes compat ONCE into an
[Np, Np] bf16/f32 array (42 ms, HBM-write-bound) and the `compat=`
kernels stream its tiles instead of rebuilding: 91.2 ms — the
no-compat ceiling, the tile loads hide completely behind compute
(scripts/bench_flash_variants.py). The cache uses the diff-form distance
(sum of squared coordinate differences, like the dense reference's
jnp.linalg.norm) rather than the norm identity, so it is numerically
CLOSER to the dense path than the streaming kernel's matmul form.
With the cache resident there is no in-kernel distance math, so the
cached backward keeps queries in SUBLANES everywhere (no transposes:
dv = pᵀ@do and dk = dlogitsᵀ@q are contractions over the query axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_LSE_PAD = 1e9  # lse of padded/invalid query rows in bwd => p == 0
_LOG2E = 1.4426950408889634  # log2(e)

# exp2 softmax economy (r5): the kernels fold `scale * log2(e)` into the
# [BQ, D] q tile (cost N^2 * D / BK — negligible next to the [BQ, BK]
# elementwise stream) so the per-element `qk * scale` multiply vanishes
# and every exp() becomes a native exp2() with no log2(e) pre-multiply.
# softmax is invariant under the base change (max/sum/div all happen in
# base-2 space); the stored lse is base-2 (lse2 = m2 + log2(l)) and the
# backward recomputes p = exp2(s2 - lse2). Gradients w.r.t. the
# ORIGINAL q/k keep the plain `* scale` factor (d s2/d q = compat kᵀ ·
# scale·log2e and the ln2 from d exp2 cancel — see _bwd_tile*).

# int8 compat-cache quantization: compat in [0, 1] maps affinely onto
# [-127, 127] (q = round(254*c - 127)), max abs dequant error 1/508 —
# the same worst case as bf16's ulp/2 near 1.0, but half the HBM bytes.
_COMPAT_I8_SCALE = 254.0
_COMPAT_I8_BIAS = 127.0


def _load_compat(c_ref):
    """Read a compat tile as f32, dequantizing int8 caches in-register.

    The affine dequant is written in fma form: c/254 + 0.5 is EXACTLY
    (c + 127)/254 (127/254 == 0.5 in binary), one fused op instead of
    add-then-mul on the [BQ, BK] stream."""
    if c_ref.dtype == jnp.int8:
        return c_ref[:].astype(jnp.float32) * (1.0 / _COMPAT_I8_SCALE) + 0.5
    return c_ref[:].astype(jnp.float32)


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
    # (distances below always stay f32). scale*log2e folds into the
    # small [BQ, D] q tile so the [BQ, BK] stream runs base-2 softmax
    # with no per-element scale multiply (module-constant note).
    q = (q_ref[:].astype(jnp.float32) * (scale * _LOG2E)).astype(mm_dtype)
    k = k_ref[:].astype(mm_dtype)      # [BK, D]
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                  # [BQ, BK] = log2e * scale * q.k

    compat = _compat_block(sq_ref[:], sk_ref[:], tq_ref[:], tk_ref[:],
                           sigma_sq)
    s = compat * qk
    s = jnp.where(mask_ref[:] > 0, s, NEG_INF)  # mask: [1, BK] broadcasts

    # online softmax (base 2)
    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # [BQ, 1]
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next)
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
        lse = m_scr[:] + jnp.log2(l)             # [BQ, 1] (base-2 lse)
        lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


def _bwd_tile(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref, sq_ref,
              sk_ref, tq_ref, tk_ref, maskc_ref, sigma_sq, scale, mm_dtype):
    """Shared backward tile math, key index in rows / query in lanes.

    Returns (p_T [BK, BQ] f32, dlogits_T [BK, BQ] f32).
    """
    # recompute in base-2 space (s2 = log2e*scale*compat*qk, lse is
    # base-2); the gradient w.r.t. the ORIGINAL q/k keeps the plain
    # `* scale` factor — ln2 from d/dx exp2 cancels the folded log2e
    qs = (q_ref[:].astype(jnp.float32) * (scale * _LOG2E)).astype(mm_dtype)
    k = k_ref[:].astype(mm_dtype)
    qk_t = jax.lax.dot_general(
        k, qs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                            # [BK, BQ]
    compat_t = _compat_block(sk_ref[:], sq_ref[:], tk_ref[:], tq_ref[:],
                             sigma_sq)
    s_t = compat_t * qk_t
    mk = jnp.max(maskc_ref[:], axis=1, keepdims=True)   # [BK, 1]
    s_t = jnp.where(mk > 0, s_t, NEG_INF)
    p_t = jnp.exp2(s_t - lse_ref[:])             # lse [1, BQ] broadcasts
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


def _interpret_blocks():
    """Interpret-mode (CPU) block sizes. The (64, 128) default keeps the
    padded size near N for small-N tests; large-N CPU parity runs (e.g.
    the N=12000 KITTI-scale production-stack pin) override via
    GMF_FLASH_INTERPRET_BLOCK_Q/K — at N=12000 the default grid is
    ~18k steps/layer, infeasible to trace, while (512, 1024) is ~288."""
    import os

    return (int(os.environ.get("GMF_FLASH_INTERPRET_BLOCK_Q", 64)),
            int(os.environ.get("GMF_FLASH_INTERPRET_BLOCK_K", 128)))


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
    allow_np2 = os.environ.get("GMF_FLASH_ALLOW_NP2") == "1"
    for name, b in (("GMF_FLASH_BLOCK_Q", bq), ("GMF_FLASH_BLOCK_K", bk)):
        if b <= 0 or (b & (b - 1) and not allow_np2):
            raise ValueError(
                f"{name}={b} must be a positive power of two (the "
                "backward-pass VMEM clamp only applies to power-of-two "
                "blocks); set GMF_FLASH_ALLOW_NP2=1 for eval-only "
                "experiments with multiples like 1280 (lcm padding "
                "still applies — lcm(512,1280)=2560 keeps Np=5120)")
    return bq, bk


def _aligned_len(N: int, bq: int, bk: int) -> int:
    """Pad N up to the block alignment: max(bq, bk) for power-of-two
    blocks, lcm otherwise. The SINGLE source of truth for the padded
    size — the cache builder and the cached kernel must agree exactly
    or the cached call dies on a shape mismatch."""
    if (bq & (bq - 1)) == 0 and (bk & (bk - 1)) == 0:
        align = max(bq, bk)
    else:
        import math

        align = math.lcm(bq, bk)
    return N + ((-N) % align)


def padded_len(N: int, block_q: int = None, block_k: int = None,
               interpret: bool = False) -> int:
    """The padded sequence length Np the flash kernels use for N — the
    compat cache is [Np, Np]. Mirrors the block resolution of
    compat_flash_attention/build_compat_cache."""
    if interpret:
        dbq, dbk = _interpret_blocks()
    else:
        dbq, dbk = _default_blocks()
    bq = block_q or dbq
    bk = block_k or dbk
    return _aligned_len(N, bq, bk)


def compat_flash_attention(q, k, v, src_keypts, tgt_keypts, mask=None,
                           sigma_d: float = 0.10, block_q: int = None,
                           block_k: int = None, interpret: bool = False,
                           compat=None):
    """Single-head compat-modulated attention, one pair. Differentiable
    w.r.t. q/k/v (flash backward; keypoints/mask receive zero grads).

    Args:
      q, k, v: [N, D] (D multiple of 128 preferred).
      src_keypts, tgt_keypts: [N, 3].
      mask: optional [N] key validity.
      sigma_d: spatial-consistency sigma (static).
      compat: optional [Np, Np] cache from `build_compat_cache` (built
        with the SAME block sizes). When given, the kernel streams its
        tiles instead of re-deriving compat from the keypoints —
        ~1.9x on the 12-layer stack (compat recompute is VPU-bound;
        see module docstring). src/tgt_keypts may then be None.

    Returns [N, D] = softmax(compat * qk / sqrt(D)) @ v.

    Block sizes (incl. the GMF_FLASH_BLOCK_Q/K env defaults) are resolved
    here, OUTSIDE the jit, so they are real static args — changing the env
    vars between calls retriggers compilation instead of being silently
    ignored by a stale jit cache.
    """
    if interpret:
        # no hardware tiling in interpret mode: small blocks keep the
        # padded size near N (CPU tests) while still exercising the
        # multi-block online-softmax path (env-overridable for large-N
        # CPU parity runs — _interpret_blocks)
        dbq, dbk = _interpret_blocks()
    else:
        dbq, dbk = _default_blocks()
    bq = block_q or dbq
    bk = block_k or dbk
    if compat is not None:
        return _compat_flash_attention_cached_jit(
            q, k, v, compat, mask, block_q=bq, block_k=bk,
            interpret=interpret)
    return _compat_flash_attention_jit(q, k, v, src_keypts, tgt_keypts,
                                       mask, sigma_d=sigma_d, block_q=bq,
                                       block_k=bk, interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret"),
)
def _compat_flash_attention_cached_jit(q, k, v, compat, mask=None,
                                       block_q: int = 512,
                                       block_k: int = 1024,
                                       interpret: bool = False):
    N, D = q.shape
    bq, bk = block_q, block_k
    Np = _aligned_len(N, bq, bk)
    if compat.shape != (Np, Np):
        raise ValueError(
            f"compat cache shape {compat.shape} does not match the padded "
            f"size {(Np, Np)} for N={N} blocks=({bq},{bk}); build it with "
            "build_compat_cache using the same block sizes")

    def padN(x):
        return jnp.pad(x, ((0, Np - N),) + ((0, 0),) * (x.ndim - 1))

    qp, kp, vp = padN(q), padN(k), padN(v)
    m = (jnp.ones((N,), jnp.float32) if mask is None
         else mask.astype(jnp.float32))
    mp = jnp.pad(m, (0, Np - N)).reshape(1, Np)
    out = _flash_cached(qp, kp, vp, compat, mp, 1.0 / (D ** 0.5), bq, bk,
                        interpret)
    return out[:N]


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


# --------------------------------------------------------------------------
# Cached-compat mode
# --------------------------------------------------------------------------


def _compat_pre_kernel(sq_ref, skT_ref, tq_ref, tkT_ref, o_ref, *,
                       sigma_sq: float):
    """One compat tile from diff-form distances (dense-reference formula).

    sq/tq: [BQ, 128] zero-padded keypoint rows; skT/tkT: [8, BK]
    transposed keypoints (coordinate index in sublanes).
    """
    ds2 = dt2 = None
    for d in range(3):
        sd = sq_ref[:, d:d + 1] - skT_ref[d:d + 1, :]
        td = tq_ref[:, d:d + 1] - tkT_ref[d:d + 1, :]
        ds2 = sd * sd if ds2 is None else ds2 + sd * sd
        dt2 = td * td if dt2 is None else dt2 + td * td
    if o_ref.dtype == jnp.int8:
        # one-sqrt identity: (√a - √b)² = a + b - 2√(ab). The build is
        # VPU-sqrt-bound; this halves the sqrts. The cancellation error
        # near ds≈dt (~1e-5·(ds²+dt²) in f32) sits well below the int8
        # quantization step 1/254 — int8-safe ONLY, the f32/bf16 cache
        # keeps the two-sqrt diff form the dense reference uses.
        dd2 = jnp.maximum(ds2 + dt2 - 2.0 * jnp.sqrt(ds2 * dt2), 0.0)
        c = jnp.maximum(1.0 - dd2 / sigma_sq, 0.0)
        o_ref[:] = jnp.round(
            c * _COMPAT_I8_SCALE - _COMPAT_I8_BIAS).astype(jnp.int8)
    else:
        dd = jnp.sqrt(ds2) - jnp.sqrt(dt2)
        c = jnp.maximum(1.0 - dd * dd / sigma_sq, 0.0)
        o_ref[:] = c.astype(o_ref.dtype)


def build_compat_cache(src_keypts, tgt_keypts, sigma_d: float = 0.10,
                       dtype=jnp.bfloat16, block_q: int = None,
                       block_k: int = None, interpret: bool = False):
    """Precompute the [Np, Np] spatial-consistency matrix, padded so its
    tiles align with `compat_flash_attention(..., compat=...)`'s blocks.

    One pair; vmap over the batch. ~42 ms at N=5000 b=64 (HBM-write-bound:
    one bf16 [Np, Np] store). Rows = query index, cols = key index; the
    pad region holds arbitrary values — the flash mask keeps padded KEYS
    out of every softmax and padded QUERY rows are sliced off.

    dtype=jnp.int8 stores the offset-quantized cache (q = round(254*c -
    127), dequantized in-kernel): half the HBM bytes of bf16, measured
    equal streamed-tile time over the 12-layer stack at b=64 N=5120
    (the kernels are compute-bound at these tile costs), with the same
    worst-case error as bf16 near compat=1.0 (max abs 1/508).
    """
    if interpret:
        dbq, dbk = _interpret_blocks()
    else:
        dbq, dbk = _default_blocks()
    bq = block_q or dbq
    bk = block_k or dbk
    return _build_compat_cache_jit(src_keypts, tgt_keypts,
                                   sigma_d=float(sigma_d), dtype=dtype,
                                   block_q=bq, block_k=bk,
                                   interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("sigma_d", "dtype", "block_q", "block_k", "interpret"),
)
def _build_compat_cache_jit(src_keypts, tgt_keypts, *, sigma_d, dtype,
                            block_q, block_k, interpret):
    N = src_keypts.shape[0]
    Np = _aligned_len(N, block_q, block_k)
    # the build grid is independent of the flash blocks — the cache is
    # a plain [Np, Np] HBM array and only Np must agree. Cap the build
    # tiles at (512, 1024): larger flash blocks (e.g. 1024x1024) OOM
    # scoped VMEM in THIS kernel (f32 distance temporaries), while the
    # flash kernel itself still streams them fine.
    bq = min(block_q, 512) if (block_q & (block_q - 1)) == 0 else block_q
    bk = min(block_k, 1024) if (block_k & (block_k - 1)) == 0 else block_k
    sp = jnp.pad(src_keypts.astype(jnp.float32), ((0, Np - N), (0, 125)))
    tp = jnp.pad(tgt_keypts.astype(jnp.float32), ((0, Np - N), (0, 125)))
    spT = jnp.transpose(sp[:, :8])  # [8, Np]
    tpT = jnp.transpose(tp[:, :8])
    nq, nk = Np // bq, Np // bk
    return pl.pallas_call(
        functools.partial(_compat_pre_kernel, sigma_sq=float(sigma_d) ** 2),
        out_shape=jax.ShapeDtypeStruct((Np, Np), dtype),
        grid=(nq, nk),
        in_specs=[
            pl.BlockSpec((bq, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((8, bk), lambda i, j: (0, j)),
            pl.BlockSpec((bq, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((8, bk), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bq, bk), lambda i, j: (i, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(sp, spT, tp, tpT)


def _fwd_kernel_build(q_ref, k_ref, v_ref, sq_ref, skT_ref, tq_ref,
                      tkT_ref, mask_ref, o_ref, lse_ref, c_ref, m_scr,
                      l_scr, acc_scr, *, sigma_sq: float, scale: float,
                      nk_blocks: int, mm_dtype):
    """Layer-1 fused build+attend: computes the int8 compat tile with
    the EXACT _compat_pre_kernel int8 formula (diff-form + one-sqrt +
    offset quantization), writes it to the cache output, then runs the
    cached-kernel attention math on the DEQUANTIZED tile — so both the
    emitted cache and this layer's output are bitwise what
    build_compat_cache + the cached kernel would produce, without the
    standalone build's extra pass over the [Np, Np] stream."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    ds2 = dt2 = None
    for d in range(3):
        sd = sq_ref[:, d:d + 1] - skT_ref[d:d + 1, :]
        td = tq_ref[:, d:d + 1] - tkT_ref[d:d + 1, :]
        ds2 = sd * sd if ds2 is None else ds2 + sd * sd
        dt2 = td * td if dt2 is None else dt2 + td * td
    dd2 = jnp.maximum(ds2 + dt2 - 2.0 * jnp.sqrt(ds2 * dt2), 0.0)
    c = jnp.maximum(1.0 - dd2 / sigma_sq, 0.0)
    cq = jnp.round(c * _COMPAT_I8_SCALE - _COMPAT_I8_BIAS).astype(jnp.int8)
    c_ref[:] = cq
    c_use = cq.astype(jnp.float32) * (1.0 / _COMPAT_I8_SCALE) + 0.5

    q = (q_ref[:].astype(jnp.float32) * (scale * _LOG2E)).astype(mm_dtype)
    k = k_ref[:].astype(mm_dtype)
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = c_use * qk
    s = jnp.where(mask_ref[:] > 0, s, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next)
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
        lse_ref[:] = jnp.broadcast_to(m_scr[:] + jnp.log2(l),
                                      lse_ref.shape)


def compat_flash_attention_build(q, k, v, src_keypts, tgt_keypts,
                                 mask=None, sigma_d: float = 0.10,
                                 block_q: int = None, block_k: int = None,
                                 interpret: bool = False):
    """First-layer fused attention that ALSO emits the int8 compat cache
    for the remaining layers.

    Returns ``(out [N, D], cache [Np, Np] int8)`` where out equals
    ``compat_flash_attention(..., compat=cache)`` and cache equals
    ``build_compat_cache(..., dtype=int8)`` bitwise — the standalone
    build's separate [Np, Np] pass (~21 ms/batch at the b=64 eval
    shape) folds into work layer 1 was doing anyway. EVAL-ONLY: no
    custom_vjp (the caller gates on ``testing``); inputs are
    stop_gradient'ed defensively.
    """
    if interpret:
        dbq, dbk = _interpret_blocks()
    else:
        dbq, dbk = _default_blocks()
    bq = block_q or dbq
    bk = block_k or dbk
    return _compat_flash_attention_build_jit(
        jax.lax.stop_gradient(q), jax.lax.stop_gradient(k),
        jax.lax.stop_gradient(v), jax.lax.stop_gradient(src_keypts),
        jax.lax.stop_gradient(tgt_keypts),
        None if mask is None else jax.lax.stop_gradient(mask),
        sigma_d=float(sigma_d), block_q=bq, block_k=bk,
        interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("sigma_d", "block_q", "block_k", "interpret"),
)
def _compat_flash_attention_build_jit(q, k, v, src_keypts, tgt_keypts,
                                      mask=None, *, sigma_d: float,
                                      block_q: int, block_k: int,
                                      interpret: bool):
    N, D = q.shape
    Np = _aligned_len(N, block_q, block_k)
    # the BUILD grid tiles are capped like _build_compat_cache_jit's
    # (the f32 distance temporaries next to the attention tiles exceed
    # scoped VMEM at larger blocks); the emitted [Np, Np] cache array is
    # tiling-independent, so the cached layers can keep bigger blocks
    bq = min(block_q, 512) if (block_q & (block_q - 1)) == 0 else block_q
    bk = min(block_k, 1024) if (block_k & (block_k - 1)) == 0 else block_k

    def padN(x):
        return jnp.pad(x, ((0, Np - N),) + ((0, 0),) * (x.ndim - 1))

    qp, kp, vp = padN(q), padN(k), padN(v)
    sp = jnp.pad(src_keypts.astype(jnp.float32), ((0, Np - N), (0, 125)))
    tp = jnp.pad(tgt_keypts.astype(jnp.float32), ((0, Np - N), (0, 125)))
    spT = jnp.transpose(sp[:, :8])
    tpT = jnp.transpose(tp[:, :8])
    m = (jnp.ones((N,), jnp.float32) if mask is None
         else mask.astype(jnp.float32))
    mp = jnp.pad(m, (0, Np - N)).reshape(1, Np)

    nq_blocks, nk_blocks = Np // bq, Np // bk
    kernel = functools.partial(
        _fwd_kernel_build, sigma_sq=float(sigma_d) ** 2,
        scale=1.0 / (D ** 0.5), nk_blocks=nk_blocks,
        mm_dtype=jnp.float32 if interpret else jnp.bfloat16)
    out, _, cache = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((Np, D), qp.dtype),
                   jax.ShapeDtypeStruct((Np, 128), jnp.float32),
                   jax.ShapeDtypeStruct((Np, Np), jnp.int8)),
        grid=(nq_blocks, nk_blocks),
        in_specs=[
            pl.BlockSpec((bq, D), lambda i, j: (i, 0)),    # q
            pl.BlockSpec((bk, D), lambda i, j: (j, 0)),    # k
            pl.BlockSpec((bk, D), lambda i, j: (j, 0)),    # v
            pl.BlockSpec((bq, 128), lambda i, j: (i, 0)),  # src_q
            pl.BlockSpec((8, bk), lambda i, j: (0, j)),    # src_k^T
            pl.BlockSpec((bq, 128), lambda i, j: (i, 0)),  # tgt_q
            pl.BlockSpec((8, bk), lambda i, j: (0, j)),    # tgt_k^T
            pl.BlockSpec((1, bk), lambda i, j: (0, j)),    # mask
        ],
        out_specs=(pl.BlockSpec((bq, D), lambda i, j: (i, 0)),
                   pl.BlockSpec((bq, 128), lambda i, j: (i, 0)),
                   pl.BlockSpec((bq, bk), lambda i, j: (i, j))),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, sp, spT, tp, tpT, mp)
    return out[:N], cache


def _fwd_kernel_cached(q_ref, k_ref, v_ref, c_ref, mask_ref, o_ref, lse_ref,
                       m_scr, l_scr, acc_scr, *, scale: float,
                       nk_blocks: int, mm_dtype):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # base-2 online softmax with scale*log2e folded into the [BQ, D] q
    # tile — no per-element scale multiply on the [BQ, BK] stream
    q = (q_ref[:].astype(jnp.float32) * (scale * _LOG2E)).astype(mm_dtype)
    k = k_ref[:].astype(mm_dtype)
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = _load_compat(c_ref) * qk
    s = jnp.where(mask_ref[:] > 0, s, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(s - m_next)
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
        lse = m_scr[:] + jnp.log2(l)             # base-2 lse
        lse_ref[:] = jnp.broadcast_to(lse, lse_ref.shape)


def _forward_call_cached(qp, kp, vp, cp, mp, scale, bq, bk, interpret):
    Np, D = qp.shape
    nq_blocks = Np // bq
    nk_blocks = Np // bk
    kernel = functools.partial(
        _fwd_kernel_cached, scale=scale, nk_blocks=nk_blocks,
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
            pl.BlockSpec((bq, bk), lambda i, j: (i, j)),   # compat tile
            pl.BlockSpec((1, bk), lambda i, j: (0, j)),    # mask
        ],
        out_specs=(pl.BlockSpec((bq, D), lambda i, j: (i, 0)),
                   pl.BlockSpec((bq, 128), lambda i, j: (i, 0))),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, cp, mp)


def _bwd_tile_cached(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                     c_ref, mask_ref, scale, mm_dtype):
    """Backward tile, query in SUBLANES (no transposes needed with the
    compat tile resident). Returns (p [BQ, BK], dlogits [BQ, BK])."""
    # base-2 recompute (module-constant note): s2 from a scaled q copy,
    # gradients keep plain `* scale` w.r.t. the original q/k
    qs = (q_ref[:].astype(jnp.float32) * (scale * _LOG2E)).astype(mm_dtype)
    k = k_ref[:].astype(mm_dtype)
    qk = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    c = _load_compat(c_ref)
    s = c * qk
    s = jnp.where(mask_ref[:] > 0, s, NEG_INF)       # [1, BK] broadcasts
    p = jnp.exp2(s - lse_ref[:, 0:1])                # lse col [BQ, 1]
    dp = jax.lax.dot_general(
        do_ref[:].astype(mm_dtype), v_ref[:].astype(mm_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dlogits = p * (dp - delta_ref[:, 0:1]) * c * scale
    return p, dlogits


def _bwd_dkv_kernel_cached(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                           c_ref, mask_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                           *, scale: float, nq_blocks: int, mm_dtype):
    i = pl.program_id(1)  # query block (inner)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    p, dlogits = _bwd_tile_cached(q_ref, do_ref, lse_ref, delta_ref, k_ref,
                                  v_ref, c_ref, mask_ref, scale, mm_dtype)
    # contractions over the query axis — no transposes
    dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
        p.astype(mm_dtype), do_ref[:].astype(mm_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
        dlogits.astype(mm_dtype), q_ref[:].astype(mm_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(i == nq_blocks - 1)
    def _store():
        dk_ref[:] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel_cached(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                          c_ref, mask_ref, dq_ref, dq_scr, *, scale: float,
                          nk_blocks: int, mm_dtype):
    j = pl.program_id(1)  # key block (inner)

    @pl.when(j == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    _, dlogits = _bwd_tile_cached(q_ref, do_ref, lse_ref, delta_ref, k_ref,
                                  v_ref, c_ref, mask_ref, scale, mm_dtype)
    dq_scr[:] = dq_scr[:] + jax.lax.dot(
        dlogits.astype(mm_dtype), k_ref[:].astype(mm_dtype),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk_blocks - 1)
    def _store():
        dq_ref[:] = dq_scr[:].astype(dq_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_cached(qp, kp, vp, cp, mp, scale, bq, bk, interpret):
    out, _ = _forward_call_cached(qp, kp, vp, cp, mp, scale, bq, bk,
                                  interpret)
    return out


def _flash_cached_fwd(qp, kp, vp, cp, mp, scale, bq, bk, interpret):
    out, lse = _forward_call_cached(qp, kp, vp, cp, mp, scale, bq, bk,
                                    interpret)
    return out, (qp, kp, vp, cp, mp, out, lse)


def _flash_cached_bwd(scale, bq, bk, interpret, res, do):
    qp, kp, vp, cp, mp, out, lse = res
    Np, D = qp.shape
    # same VMEM-safe backward clamp as the streaming kernel; the cache's
    # (bq, bk) tiling stays aligned because these divide the fwd blocks
    if (bq & (bq - 1)) == 0 and (bk & (bk - 1)) == 0:
        bq = min(bq, 256)
        bk = min(bk, 512)
    nq_blocks = Np // bq
    nk_blocks = Np // bk
    mm_dtype = jnp.float32 if interpret else jnp.bfloat16

    valid = mp[0] > 0
    lse_col = jnp.where(valid, lse[:, 0], _LSE_PAD)
    lse_col = jnp.broadcast_to(lse_col[:, None], (Np, 128))
    delta_col = jnp.broadcast_to(
        jnp.sum(do * out, axis=-1)[:, None], (Np, 128))

    dkv_specs = [
        pl.BlockSpec((bq, D), lambda a, b: (b, 0)),      # q
        pl.BlockSpec((bq, D), lambda a, b: (b, 0)),      # do
        pl.BlockSpec((bq, 128), lambda a, b: (b, 0)),    # lse col
        pl.BlockSpec((bq, 128), lambda a, b: (b, 0)),    # delta col
        pl.BlockSpec((bk, D), lambda a, b: (a, 0)),      # k
        pl.BlockSpec((bk, D), lambda a, b: (a, 0)),      # v
        pl.BlockSpec((bq, bk), lambda a, b: (b, a)),     # compat tile
        pl.BlockSpec((1, bk), lambda a, b: (0, a)),      # mask
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_cached, scale=scale,
                          nq_blocks=nq_blocks, mm_dtype=mm_dtype),
        out_shape=(jax.ShapeDtypeStruct((Np, D), kp.dtype),
                   jax.ShapeDtypeStruct((Np, D), vp.dtype)),
        grid=(nk_blocks, nq_blocks),
        in_specs=dkv_specs,
        out_specs=(pl.BlockSpec((bk, D), lambda a, b: (a, 0)),
                   pl.BlockSpec((bk, D), lambda a, b: (a, 0))),
        scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32),
                        pltpu.VMEM((bk, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, do, lse_col, delta_col, kp, vp, cp, mp)

    dq_specs = [
        pl.BlockSpec((bq, D), lambda a, b: (a, 0)),      # q
        pl.BlockSpec((bq, D), lambda a, b: (a, 0)),      # do
        pl.BlockSpec((bq, 128), lambda a, b: (a, 0)),    # lse col
        pl.BlockSpec((bq, 128), lambda a, b: (a, 0)),    # delta col
        pl.BlockSpec((bk, D), lambda a, b: (b, 0)),      # k
        pl.BlockSpec((bk, D), lambda a, b: (b, 0)),      # v
        pl.BlockSpec((bq, bk), lambda a, b: (a, b)),     # compat tile
        pl.BlockSpec((1, bk), lambda a, b: (0, b)),      # mask
    ]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_cached, scale=scale,
                          nk_blocks=nk_blocks, mm_dtype=mm_dtype),
        out_shape=jax.ShapeDtypeStruct((Np, D), qp.dtype),
        grid=(nq_blocks, nk_blocks),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((bq, D), lambda a, b: (a, 0)),
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, do, lse_col, delta_col, kp, vp, cp, mp)

    return dq, dk, dv, _zero_cotangent(cp), _zero_cotangent(mp)


def _zero_cotangent(x):
    """Zero cotangent matching JAX's tangent-type rules (integer inputs —
    e.g. an int8 compat cache — take float0, not a same-dtype zero)."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        return jnp.zeros_like(x)
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)


_flash_cached.defvjp(_flash_cached_fwd, _flash_cached_bwd)


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
