"""Microbench: match_descriptors_device cost inside a batched dispatch.

The warm eval-CLI sweep (outputs/r3_tpu_sweep2) shows --device-match
adding ~45 ms/pair to the b=64 model dispatch — far above the op's
roofline (one [N,32]@[32,N] matmul + two argmins over [N,N] is <1 ms of
HBM traffic per pair). This isolates the matching stage at eval shapes
to find where the time goes.

Usage: python scripts/bench_device_match.py [--batch 64 --points 5120]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--points", type=int, default=5120)
    ap.add_argument("--feat-dim", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--precision", default="highest",
                    choices=["highest", "default"])
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gmf_tpu.data.correspondence import match_descriptors_device

    b, n, d = args.batch, args.points, args.feat_dim
    rng = np.random.RandomState(0)
    feat = rng.randn(b, n, d).astype(np.float32)
    feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
    src_k = rng.rand(b, n, 3).astype(np.float32)
    tgt_k = rng.rand(b, n, 3).astype(np.float32)
    gt = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    mask = np.ones((b, n), np.float32)

    @jax.jit
    def run(sk, tk, sd, td, g, ms, mt):
        m = jax.vmap(
            lambda a, bb, c, dd, gg, m1, m2: match_descriptors_device(
                a, bb, c, dd, gg, 0.10, m1, m2, use_mutual=True,
                in_dim=6))(sk, tk, sd, td, g, ms, mt)
        return m["corr_pos"], m["labels"], m["corr_mask"]

    argv = [jnp.asarray(x) for x in
            (src_k, tgt_k, feat, feat, gt, mask, mask)]
    print(f"backend: {jax.default_backend()}  b={b} n={n} d={d}")
    out = run(*argv)
    np.asarray(out[0][:1, :1])  # honest host-fetch sync
    if args.trace:
        with jax.profiler.trace(args.trace):
            out = run(*argv)
            np.asarray(out[0][:1, :1])
    t0 = time.perf_counter()
    for _ in range(args.reps):
        out = run(*argv)
        np.asarray(out[0][:1, :1])
    dt = (time.perf_counter() - t0) / args.reps
    print(f"match dispatch: {dt * 1e3:8.1f} ms/batch = "
          f"{dt / b * 1e3:6.2f} ms/pair")


if __name__ == "__main__":
    main()
