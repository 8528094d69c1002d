"""Benchmark: PointDSC+GMF test-mode registration throughput on TPU.

Prints ONE JSON line:
  {"metric": "registration_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": R}

Baseline: the reference's 3DMatch eval model time of 0.14 s/pair
(GMF_PointDSC/evaluation/test_3DMatch.py:200-205, single CUDA GPU) =
7.143 pairs/s. We run the full test-mode pipeline (12-layer fused encoder,
NMS seeds, seed-local spectral matching, batched Kabsch, post-refinement)
at N=5000 correspondences — the scale of the reference's num_node='all'
3DMatch evaluation — with pair batching (the TPU path compiles once per
bucket, so batching pairs is free throughput the reference cannot get).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 1.0 / 0.14  # reference model time 0.14 s/pair
# KITTI preset: the reference's 0.37 s/pair model time at num_node=12000
# (GMF_PointDSC/evaluation/test_KITTI.py:170-176).
KITTI_BASELINE_PAIRS_PER_SEC = 1.0 / 0.37


def _wait_for_tpu(max_wait: float = None) -> bool:
    """Probe TPU reachability in a SUBPROCESS before importing jax here.

    This machine's TPU tunnel flaps; jax.devices() on a dead tunnel
    hangs for minutes with no in-process timeout. Probe in a killable
    child, retrying up to GMF_BENCH_TPU_WAIT seconds (default 600), so
    a driver-run bench fails loudly instead of hanging forever.
    """
    import os
    import subprocess
    import sys

    if max_wait is None:
        max_wait = float(os.environ.get("GMF_BENCH_TPU_WAIT", "600"))
    deadline = time.time() + max_wait
    while True:
        # each probe is bounded by the remaining budget, so a small
        # GMF_BENCH_TPU_WAIT is honored (the child hangs in jax.devices()
        # on a dead tunnel and only dies by this timeout)
        probe_timeout = max(10.0, min(240.0, deadline - time.time()))
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('TPU_OK')"],
                capture_output=True, text=True, timeout=probe_timeout)
            if "TPU_OK" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print("bench.py: TPU unreachable after "
                  f"{max_wait:.0f}s of probing — no measurement "
                  "(rerun when the tunnel is back, or pass --cpu)",
                  file=sys.stderr)
            return False
        time.sleep(30)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-corr", type=int, default=5000)
    # batch 64: best honest config of the r2 sweep (outputs/
    # bench_sweep_r2.txt; 128 exhausts HBM) — batching pairs amortizes
    # this machine's ~50 ms relay floor legitimately (every call still
    # host-syncs on the fetched transforms).
    ap.add_argument("--batch", type=int, default=None,
                    help="pair batch size (default 64; KITTI preset 8, "
                         "LoMatch preset 2 — an explicit value always "
                         "wins over the preset)")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--cpu", action="store_true", help="force CPU")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CI smoke)")
    ap.add_argument("--fused", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="Pallas compat-flash attention + NMS path "
                         "(default: on for TPU, off for CPU where the "
                         "kernels run interpreted; --no-fused forces the "
                         "dense XLA path)")
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="bf16 module compute, f32 geometry (halves HBM "
                         "traffic; registration output verified exact — "
                         "default: on for TPU eval, off for CPU/train)")
    ap.add_argument("--approx-knn", action="store_true",
                    help="opt-in approximate seed-kNN (approx_max_k "
                         "recall_target=0.95, measured neighbor recall "
                         "0.99): +27%% pairs/s at the default preset; "
                         "off by default to keep the exact reference "
                         "semantics")
    ap.add_argument("--knn-topk", default=None,
                    choices=("auto", "exact", "values", "approx"),
                    help="seed-kNN top-k backend override (see "
                         "PointDSC.knn_topk); overrides --approx-knn")
    ap.add_argument("--hypo-scoring", default="auto",
                    choices=("auto", "dense", "fused"),
                    help="hypothesis-scoring backend override (see "
                         "PointDSC.hypo_scoring; auto = fused on TPU)")
    ap.add_argument("--seed-solver", default="auto",
                    choices=("auto", "xla", "fused"),
                    help="seed spectral-solver backend override (see "
                         "PointDSC.seed_solver; auto = xla — the fused "
                         "kernel measured slower in-model, opt-in only)")
    ap.add_argument("--compat-cache", default="auto",
                    choices=("auto", "off", "f32", "bf16", "int8"),
                    help="compat-cache mode override (see "
                         "PointDSC.compat_cache; auto gates on HBM "
                         "footprint)")
    ap.add_argument("--train", action="store_true",
                    help="measure training steps/sec instead of inference")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="capture one warm jax.profiler trace of the "
                         "registration dispatch into DIR (XProf/"
                         "TensorBoard Profile tab) before timing")
    ap.add_argument("--pipelined", type=int, default=0, metavar="K",
                    help="keep K calls in flight (serving throughput; "
                         "hides this machine's ~50 ms relay latency)")
    ap.add_argument("--mesh", type=int, default=0, metavar="N",
                    help="shard the pair batch over an N-device 'data' "
                         "mesh (data-parallel inference; params "
                         "replicated, batch split over ICI). N must "
                         "divide the available device count and the "
                         "batch size.")
    ap.add_argument("--kitti", action="store_true",
                    help="KITTI eval preset: N=12000 correspondences "
                         "(evaluation/test_KITTI.py:137 num_node=12000), "
                         "fused flash path + bf16 (the O(N^2)-free "
                         "config that makes this scale tractable)")
    ap.add_argument("--lomatch", action="store_true",
                    help="3DLoMatch num_node='all' megapair preset: "
                         "N=30000 correspondences, fused flash + bf16 "
                         "(evaluation/test_3DLoMatch.py:240 feeds whole "
                         "fragments; dense attention would need a 3.6 GB "
                         "[N,N] matrix per head)")
    args = ap.parse_args()
    if args.lomatch:
        args.num_corr = 30000
        if args.batch is None:
            args.batch = 2
        if args.bf16 is None:
            args.bf16 = True
        if args.fused is None and not args.cpu:
            args.fused = True
    if args.kitti:
        args.num_corr = 12000
        # b=8: where N=12000 throughput flattened pre-fused-scoring
        # (18.0 / 21.1 / 22.7 pairs/s at b = 2 / 4 / 8, r2 sweep)
        if args.batch is None:
            args.batch = 8
        if args.bf16 is None:
            args.bf16 = True
        if args.fused is None and not args.cpu:
            args.fused = True
    baseline = (KITTI_BASELINE_PAIRS_PER_SEC if args.kitti
                else BASELINE_PAIRS_PER_SEC)
    if args.batch is None:
        args.batch = 64
    else:
        # Explicit --batch always wins, but warn when it exceeds the
        # preset's measured HBM ceiling (r2/r3 sweeps): the run will
        # likely OOM on a 16 GB v5e chip.
        ceiling = 2 if args.lomatch else 8 if args.kitti else 64
        if args.batch > ceiling and not args.cpu:
            print(f"warning: --batch {args.batch} exceeds the known-good "
                  f"ceiling {ceiling} for this preset on a 16 GB v5e; "
                  "expect an HBM OOM (override kept).", file=sys.stderr)

    if not args.cpu and not _wait_for_tpu():
        raise SystemExit(2)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() != "cpu"
    if args.fused is None:
        # eval: fused on TPU. train: dense is faster at the reference's
        # N=1000 scale (pass --fused explicitly for O(N)-memory large-N
        # training via the flash custom_vjp backward).
        args.fused = on_tpu and not args.train
    if args.bf16 is None:
        args.bf16 = on_tpu and not args.train
    import jax.numpy as jnp

    from gmf_tpu.data import make_correspondence_problem
    from gmf_tpu.models import PointDSC

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    knn_topk = args.knn_topk or ("approx" if args.approx_knn else "auto")
    if args.tiny:
        model = PointDSC(num_layers=2, num_channels=32, k=10,
                         fused_attention=args.fused, dtype=dtype,
                         knn_topk=knn_topk, hypo_scoring=args.hypo_scoring,
                         seed_solver=args.seed_solver,
                         compat_cache=args.compat_cache)
        image_hw = (24, 32)
    else:
        model = PointDSC(fused_attention=args.fused, dtype=dtype,
                         knn_topk=knn_topk, hypo_scoring=args.hypo_scoring,
                         seed_solver=args.seed_solver,
                         compat_cache=args.compat_cache)
        image_hw = (120, 160)

    rng = np.random.RandomState(0)
    batch = make_correspondence_problem(
        rng, num_corr=args.num_corr, batch=args.batch, image_hw=image_hw,
        inlier_ratio=0.4,
    )
    arrs = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init(
        jax.random.PRNGKey(0), arrs["corr_pos"], arrs["src_keypts"],
        arrs["tgt_keypts"], arrs["p_image"], arrs["q_image"],
    )

    if args.train:
        from gmf_tpu.train.trainer import (
            TrainConfig, make_optimizer, make_train_step,
        )

        cfg = TrainConfig()
        opt = make_optimizer(cfg, 100)
        opt_state = opt.init(variables["params"])
        step = jax.jit(make_train_step(model, opt, cfg))
        params, bstats = variables["params"], variables["batch_stats"]
        for _ in range(args.warmup):
            params, bstats, opt_state, m = step(params, bstats, opt_state,
                                                arrs, jnp.asarray(1))
            np.asarray(m["loss"])  # host fetch = the only reliable sync here
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, bstats, opt_state, m = step(params, bstats, opt_state,
                                                arrs, jnp.asarray(1))
            np.asarray(m["loss"])
        dt = time.perf_counter() - t0
        pairs_per_sec = args.batch * args.iters / dt
        print(json.dumps({
            "metric": "training_pairs_per_sec",
            "value": round(pairs_per_sec, 3),
            "unit": "pairs/s",
            "vs_baseline": round(pairs_per_sec / baseline, 3),
        }))
        return

    def build_register(model):
        def _register(variables, corr_pos, src, tgt, p_img, q_img):
            out = model.apply(variables, corr_pos, src, tgt, p_img, q_img,
                              testing=True)
            return out["final_trans"], out["final_labels"]

        if not args.mesh:
            return jax.jit(_register)
        # data-parallel inference: batch sharded on the 'data' axis,
        # params replicated — the measured multi-chip pairs/sec path
        # (same sharding as eval/registration.PointDSCRegistrar).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from gmf_tpu.parallel.mesh import make_mesh

        if args.batch % args.mesh:
            raise SystemExit(f"--batch {args.batch} must be divisible "
                             f"by --mesh {args.mesh}")
        mesh = make_mesh(n_data=args.mesh)
        repl = NamedSharding(mesh, P())
        bat = NamedSharding(mesh, P("data"))
        return jax.jit(_register,
                       in_shardings=(repl, bat, bat, bat, bat, bat),
                       out_shardings=(bat, bat))

    register = build_register(model)

    fargs = (variables, arrs["corr_pos"], arrs["src_keypts"],
             arrs["tgt_keypts"], arrs["p_image"], arrs["q_image"])

    if args.fused:
        # safety: if the Pallas path fails on this hardware, fall back to
        # the dense XLA path rather than recording nothing
        try:
            T, labels = register(*fargs)
            np.asarray(T)
        except Exception as e:  # pragma: no cover
            import traceback
            traceback.print_exc()
            print(f"fused path failed ({type(e).__name__}); "
                  "falling back to dense", file=sys.stderr)
            model = model.clone(fused_attention=False)
            register = build_register(model)

    # NOTE: jax.block_until_ready is unreliable on the tunneled axon
    # platform (returns before execution completes); a host fetch is the
    # only trustworthy sync, so pairs/sec below is honest end-to-end
    # latency including device->host readback of the 4x4 transform.
    for _ in range(args.warmup):
        T, labels = register(*fargs)
        np.asarray(T)

    if args.trace:
        from gmf_tpu.utils.profiling import trace as profiler_trace

        with profiler_trace(args.trace, annotate="bench_register"):
            T, labels = register(*fargs)
            np.asarray(T)
        print(f"trace written to {args.trace} "
              "(tensorboard --logdir, Profile tab)", file=sys.stderr)

    t0 = time.perf_counter()
    if args.pipelined > 1:
        for _ in range(args.iters):
            outs = [register(*fargs)[0] for _ in range(args.pipelined)]
            np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / args.pipelined
    else:
        for _ in range(args.iters):
            T, labels = register(*fargs)
            np.asarray(T)
        dt = time.perf_counter() - t0

    pairs_per_sec = args.batch * args.iters / dt
    print(json.dumps({
        "metric": "registration_pairs_per_sec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / baseline, 3),
        "config": f"N={args.num_corr} b={args.batch}"
                  f"{f' mesh={args.mesh}' if args.mesh else ''}"
                  f"{' fused' if args.fused else ' dense'}"
                  f"{' bf16' if args.bf16 else ' f32'}"
                  f" host-fetch-synced",
    }))


if __name__ == "__main__":
    main()
