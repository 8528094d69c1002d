"""Forward-only microbench of compat-flash kernel variants on TPU.

The r3 component breakdown (profile_pointdsc_breakdown.py) put the 12x
flash stack at 51% of the PointDSC b=64 eval forward. Inside the kernel,
the compat tile costs two f32 128-deep MXU matmuls (~6 bf16-equivalent
passes vs the 2 passes of qk+pv) plus two sqrts per element, every layer.
This bench isolates that cost:

  v0  current kernel (f32 distance matmuls)
  v1  compat stubbed to 1.0            -- the plain-flash ceiling
  v2  VPU broadcast diff-form distances (no distance matmuls; also the
      numerically-faithful form: sum of squared coordinate diffs, like
      the dense reference's jnp.linalg.norm)
  v3  v2 + single-sqrt trick ((ds-dt)^2 = ds2 + dt2 - 2*sqrt(ds2*dt2))
  v6  f32 matmul distances + single sqrt (compat VPU work pushed to MXU)
  v4  compat PRECOMPUTED once into an [N,N] bf16 cache, tiles streamed
      from HBM every layer (compat is keypoint-only, shared by all 12
      layers; 2B/elem * 12 reloads trades ~160 ms of VPU recompute for
      ~47 ms of HBM reads at N=5000 b=64)
  v5  v4 with an f32 cache (double the HBM traffic, exact compat)

r3 measurements (N=5000 b=64, 12 layers, fwd only):
  v0 251.5 ms | v1 93.6 | v2 252.3 | v3 225.7 -- VPU-bound, not MXU

Each variant runs 12 sequential layers over a vmapped batch, timed with
one host-fetch sync (the tunnel's block_until_ready is unreliable).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NEG_INF = -1e9


def _compat_matmul(sa, sb, ta, tb, sigma_sq):
    """v0's tile: f32 MXU dots + norm identity (fused_attention.py:43)."""
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


def _dist2_bcast(a_rows, bT):
    """Squared distances via 3 coordinate broadcasts: [BQ,BK]."""
    d2 = None
    for d in range(3):
        diff = a_rows[:, d:d + 1] - bT[d:d + 1, :]
        sq = diff * diff
        d2 = sq if d2 is None else d2 + sq
    return d2


def _compat_bcast(sq_rows, skT, tq_rows, tkT, sigma_sq, single_sqrt):
    ds2 = _dist2_bcast(sq_rows, skT)
    dt2 = _dist2_bcast(tq_rows, tkT)
    if single_sqrt:
        dd2 = jnp.maximum(ds2 + dt2
                          - 2.0 * jnp.sqrt(ds2 * dt2), 0.0)
    else:
        dd = jnp.sqrt(ds2) - jnp.sqrt(dt2)
        dd2 = dd * dd
    return jnp.maximum(1.0 - dd2 / sigma_sq, 0.0)


def _compat_matmul_1sqrt(sa, sb, ta, tb, sigma_sq):
    """v6: MXU distance dots + single sqrt."""
    dot_s = jax.lax.dot_general(sa, sb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dot_t = jax.lax.dot_general(ta, tb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    ns_a = jnp.sum(sa * sa, axis=1)[:, None]
    ns_b = jnp.sum(sb * sb, axis=1)[None, :]
    nt_a = jnp.sum(ta * ta, axis=1)[:, None]
    nt_b = jnp.sum(tb * tb, axis=1)[None, :]
    ds2 = jnp.maximum(ns_a + ns_b - 2.0 * dot_s, 0.0)
    dt2 = jnp.maximum(nt_a + nt_b - 2.0 * dot_t, 0.0)
    dd2 = jnp.maximum(ds2 + dt2 - 2.0 * jnp.sqrt(ds2 * dt2), 0.0)
    return jnp.maximum(1.0 - dd2 / sigma_sq, 0.0)


def _fwd_kernel(q_ref, k_ref, v_ref, sq_ref, skT_ref, tq_ref, tkT_ref,
                mask_ref, o_ref, m_scr, l_scr, acc_scr, *,
                sigma_sq, scale, nk_blocks, mode):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:].astype(jnp.bfloat16)
    k = k_ref[:].astype(jnp.bfloat16)
    qk = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    if mode == "v0":
        compat = _compat_matmul(sq_ref[:], skT_ref[:], tq_ref[:], tkT_ref[:],
                                sigma_sq)
        s = compat * qk
    elif mode == "v1":
        s = qk
    elif mode == "v6":
        compat = _compat_matmul_1sqrt(sq_ref[:], skT_ref[:], tq_ref[:],
                                      tkT_ref[:], sigma_sq)
        s = compat * qk
    elif mode in ("v4", "v5"):
        # sq_ref is repurposed as the cached compat tile [BQ, BK]
        s = sq_ref[:].astype(jnp.float32) * qk
    else:
        compat = _compat_bcast(sq_ref[:], skT_ref[:], tq_ref[:], tkT_ref[:],
                               sigma_sq, single_sqrt=(mode == "v3"))
        s = compat * qk
    s = jnp.where(mask_ref[:] > 0, s, NEG_INF)

    m_prev = m_scr[:]
    l_prev = l_scr[:]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = m_next
    l_scr[:] = l_next
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot(
        p.astype(jnp.bfloat16), v_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32)

    @pl.when(j == nk_blocks - 1)
    def _store():
        o_ref[:] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(
            o_ref.dtype)


def make_variant(mode, bq, bk, Np, D, sigma_sq, scale):
    nq, nk = Np // bq, Np // bk
    kernel = functools.partial(_fwd_kernel, sigma_sq=sigma_sq, scale=scale,
                               nk_blocks=nk, mode=mode)
    if mode in ("v0", "v1", "v6"):
        # keypoints as [Np, 128] rows on both sides (v1 ignores them)
        sq_spec = pl.BlockSpec((bq, 128), lambda i, j: (i, 0))
        sk_spec = pl.BlockSpec((bk, 128), lambda i, j: (j, 0))
        tq_spec = pl.BlockSpec((bq, 128), lambda i, j: (i, 0))
        tk_spec = pl.BlockSpec((bk, 128), lambda i, j: (j, 0))
    elif mode in ("v4", "v5"):
        # sq carries the cached compat tile; the rest are tiny dummies
        sq_spec = pl.BlockSpec((bq, bk), lambda i, j: (i, j))
        sk_spec = pl.BlockSpec((8, 128), lambda i, j: (0, 0))
        tq_spec = pl.BlockSpec((8, 128), lambda i, j: (0, 0))
        tk_spec = pl.BlockSpec((8, 128), lambda i, j: (0, 0))
    else:
        # k-side transposed [8, Np]
        sq_spec = pl.BlockSpec((bq, 128), lambda i, j: (i, 0))
        sk_spec = pl.BlockSpec((8, bk), lambda i, j: (0, j))
        tq_spec = pl.BlockSpec((bq, 128), lambda i, j: (i, 0))
        tk_spec = pl.BlockSpec((8, bk), lambda i, j: (0, j))

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, D), jnp.bfloat16),
        grid=(nq, nk),
        in_specs=[
            pl.BlockSpec((bq, D), lambda i, j: (i, 0)),
            pl.BlockSpec((bk, D), lambda i, j: (j, 0)),
            pl.BlockSpec((bk, D), lambda i, j: (j, 0)),
            sq_spec,
            sk_spec,
            tq_spec,
            tk_spec,
            pl.BlockSpec((1, bk), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bq, D), lambda i, j: (i, 0)),
        scratch_shapes=[pltpu.VMEM((bq, 1), jnp.float32),
                        pltpu.VMEM((bq, 1), jnp.float32),
                        pltpu.VMEM((bq, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )
    return call


def _compat_pre_kernel(sq_ref, skT_ref, tq_ref, tkT_ref, o_ref, *, sigma_sq):
    o_ref[:] = _compat_bcast(sq_ref[:], skT_ref[:], tq_ref[:], tkT_ref[:],
                             sigma_sq, single_sqrt=False).astype(o_ref.dtype)


def make_precompute(bq, bk, Np, sigma_sq, out_dtype):
    nq, nk = Np // bq, Np // bk
    return pl.pallas_call(
        functools.partial(_compat_pre_kernel, sigma_sq=sigma_sq),
        out_shape=jax.ShapeDtypeStruct((Np, Np), out_dtype),
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
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-corr", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--layers", type=int, default=12)
    args = ap.parse_args()

    B, N, D = args.batch, args.num_corr, 128
    sigma_sq, scale = 0.10 ** 2, 1.0 / (D ** 0.5)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, D), jnp.bfloat16)
    src = jnp.asarray(rng.rand(B, N, 3) * 3.0, jnp.float32)
    tgt = jnp.asarray(rng.rand(B, N, 3) * 3.0, jnp.float32)

    configs = [("v0", 512, 1024), ("v1", 512, 1024), ("v3", 512, 1024),
               ("v6", 512, 1024), ("v4", 512, 1024), ("v5", 512, 1024),
               ("v4", 512, 2048), ("v4", 256, 1024), ("v6", 512, 2048)]
    ref_out = None
    a_sq = a_sk = a_tq = a_tk = cache = out = qp = None
    for mode, bq, bk in configs:
        # free the previous round's device arrays (an f32 compat cache is
        # 6.7 GB at b=64 — two rounds' worth exhausts HBM)
        del a_sq, a_sk, a_tq, a_tk, cache, out, qp
        a_sq = a_sk = a_tq = a_tk = cache = out = qp = None
        import gc

        gc.collect()
        align = max(bq, bk)
        Np = N + ((-N) % align)
        padN = lambda x: jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
        qp = padN(q)
        sp = jnp.pad(src, ((0, 0), (0, Np - N), (0, 125)))
        tp = jnp.pad(tgt, ((0, 0), (0, Np - N), (0, 125)))
        mp = jnp.pad(jnp.ones((B, N), jnp.float32),
                     ((0, 0), (0, Np - N)))[:, None, :]
        pre_note = ""
        try:
            if mode in ("v0", "v1", "v6"):
                a_sq, a_sk, a_tq, a_tk = sp, sp, tp, tp
            elif mode in ("v4", "v5"):
                spT = jnp.transpose(sp[..., :8], (0, 2, 1))
                tpT = jnp.transpose(tp[..., :8], (0, 2, 1))
                cdt = jnp.float32 if mode == "v5" else jnp.bfloat16
                pre = make_precompute(bq, bk, Np, sigma_sq, cdt)
                prefn = jax.jit(jax.vmap(pre))
                cache = prefn(sp, spT, tp, tpT)
                np.asarray(cache[0, 0, :8])
                t0 = time.perf_counter()
                cache = prefn(sp, spT, tp, tpT)
                np.asarray(cache[0, 0, :8])
                pre_note = (f"  (+precompute "
                            f"{(time.perf_counter()-t0)*1e3:.1f} ms)")
                dummy = jnp.zeros((B, 8, 128), jnp.float32)
                a_sq, a_sk, a_tq, a_tk = cache, dummy, dummy, dummy
            else:
                spT = jnp.transpose(sp[..., :8], (0, 2, 1))
                tpT = jnp.transpose(tp[..., :8], (0, 2, 1))
                a_sq, a_sk, a_tq, a_tk = sp, spT, tp, tpT

            call = make_variant(mode, bq, bk, Np, D, sigma_sq, scale)

            @jax.jit
            def stack(qp, a, b, c, d, mp):
                x = qp
                for _ in range(args.layers):
                    x = jax.vmap(call)(x, x, x, a, b, c, d, mp)
                return x

            out = stack(qp, a_sq, a_sk, a_tq, a_tk, mp)
            np.asarray(out[0, 0])  # sync + compile
        except Exception as e:  # noqa: BLE001 - OOM/lowering probes
            print(f"{mode} bq={bq:5d} bk={bk:5d}: FAILED "
                  f"({type(e).__name__}: {str(e)[:90]})")
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = stack(qp, a_sq, a_sk, a_tq, a_tk, mp)
        np.asarray(out[0, 0])
        dt = (time.perf_counter() - t0) / args.iters
        drift = ""
        if mode != "v1":
            o = np.asarray(out[:, :N].astype(jnp.float32))
            if ref_out is None and mode == "v0":
                ref_out = o
            elif ref_out is not None:
                drift = f"  max|Δ| vs v0 = {np.abs(o - ref_out).max():.2e}"
        print(f"{mode} bq={bq:5d} bk={bk:5d}: {dt*1e3:8.1f} ms/batch "
              f"({B/dt:7.1f} pairs/s fwd-only){drift}{pre_note}")


if __name__ == "__main__":
    main()
