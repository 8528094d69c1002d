"""Phase profile of the batched raw-descriptor eval dispatch.

The warm eval CLI measures ~67 ms/pair steady-state model time at b=64
(outputs/r3_tpu_sweep3) while the synthetic bench forward is 8.4 ms/pair
and the device-match stage microbenches at 1.2 ms/pair — this script
splits the REAL registrar dispatch on the REAL fixture samples into
assembly / dispatch+compute / fetch to find the difference.

Usage (after scripts/bench_eval_cli.py --keep-fixture /tmp/eval_cli_fixture):
  python scripts/profile_eval_dispatch.py --fixture /tmp/eval_cli_fixture \
      [--batch 64] [--reps 3]
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
    ap.add_argument("--fixture", default="/tmp/eval_cli_fixture")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--no-fused", dest="fused", action="store_false")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    import jax.numpy as jnp

    from gmf_tpu.data.threedmatch import ThreeDMatchTest
    from gmf_tpu.eval.registration import (
        DeviceFragmentCache, PointDSCRegistrar,
    )
    from gmf_tpu.utils.model_io import load_pointdsc

    ckpt = os.path.join(args.fixture, "ckpt")
    model, variables = load_pointdsc(ckpt, inlier_threshold=0.10)
    if args.fused and not args.cpu:
        model = model.clone(fused_attention=True)
    if args.bf16 and not args.cpu:
        model = model.clone(dtype=jnp.bfloat16)

    ds = ThreeDMatchTest(root=args.fixture, descriptor="fcgf",
                         inlier_threshold=0.10, num_node="all",
                         use_mutual=True,
                         select_scene="7-scenes-redkitchen",
                         device_match=True)
    b = args.batch
    samples = [ds[i] for i in range(min(b, len(ds)))]
    while len(samples) < b:
        samples.append(dict(samples[len(samples) % len(ds)]))
    print(f"backend: {jax.default_backend()}  b={b} "
          f"n_src={samples[0]['src_keypts'].shape[0]}")

    cache = DeviceFragmentCache(4 << 30)
    reg = PointDSCRegistrar(model, variables, match_inlier_threshold=0.10,
                            match_mutual=True, frag_cache=cache)

    def sync(x):
        np.asarray(x)

    # warm: compile + populate the fragment cache
    t0 = time.perf_counter()
    handle = reg.dispatch_batch(samples)
    reg.fetch_batch(handle)
    print(f"cold dispatch+fetch: {time.perf_counter() - t0:.1f} s "
          f"(cache {len(cache)} entries)")
    # ThreeDMatchTest device_match samples are rebuilt per __getitem__;
    # re-pull so fetch_batch's in-place compaction doesn't skew reps
    samples = [ds[i % len(ds)] for i in range(b)]

    for rep in range(args.reps):
        # rep k profiles batch k of the eval set (distinct pairs, the
        # fragment-cache hit pattern of the real loop)
        lo = (rep + 1) * b
        samples_r = [ds[(lo + i) % len(ds)] for i in range(b)]
        # (a) assembly alone: cache-hit side entries + fused stack
        t0 = time.perf_counter()
        h = reg.dispatch_batch(samples_r)
        t_disp = time.perf_counter() - t0   # host-side dispatch (async)
        # (b) first-output sync = compute wall (trans is tiny: D2H ~0)
        t0 = time.perf_counter()
        sync(h[2][0])
        t_compute = time.perf_counter() - t0
        # (c) full fetch of the remaining outputs (labels, masks, keypts)
        t0 = time.perf_counter()
        reg.fetch_batch(h)
        t_fetch = time.perf_counter() - t0
        tot = t_disp + t_compute + t_fetch
        print(f"rep{rep}: dispatch {t_disp * 1e3:7.1f} ms | "
              f"compute-sync {t_compute * 1e3:7.1f} ms | "
              f"fetch {t_fetch * 1e3:7.1f} ms | "
              f"total {tot * 1e3:7.1f} ms = {tot / b * 1e3:6.2f} ms/pair")


if __name__ == "__main__":
    main()
