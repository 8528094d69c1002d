"""3DLoMatch (low-overlap) evaluation CLI.

Parity: GMF_PointDSC/evaluation/test_3DLoMatch.py — pair list from
misc/3DLoMatch.pkl, num_node=5000 default. Reference expected output:
RR 33.69% (RE 3.64 deg, TE 11.12 cm) for released FCGF weights
(test_3DMatch.py docstring :206-211).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--pair-file", required=True, help="3DLoMatch.pkl")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--descriptor", default="fcgf")
    ap.add_argument("--num-node", default="5000")
    ap.add_argument("--re-thre", type=float, default=15.0)
    ap.add_argument("--te-thre", type=float, default=30.0)
    ap.add_argument("--out", default="eval_3dlomatch")
    ap.add_argument("--fused", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="Pallas flash attention + NMS (default: on for "
                         "TPU; the O(N)-memory path that makes "
                         "num_node='all' megapairs tractable, ref "
                         "evaluation/test_3DLoMatch.py:240)")
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="bf16 module compute, f32 geometry (registration "
                         "output verified exact; default: on for TPU)")
    ap.add_argument("--compat-cache", default="auto",
                    choices=("auto", "off", "bf16", "f32", "int8"),
                    help="spatial-consistency cache mode (see test_3dmatch)")
    ap.add_argument("--approx-knn", action="store_true",
                    help="opt-in approximate seed-kNN (recall 0.99)")
    ap.add_argument("--batch", type=int, default=1,
                    help="pairs per batched dispatch")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard batches over an N-device 'data' mesh")
    ap.add_argument("--inflight", type=int, default=1,
                    help="batched dispatches kept in flight (>1 hides the "
                         "per-batch fetch/relay stall; every result is "
                         "still fetched and scored)")
    ap.add_argument("--workers", type=int, default=0,
                    help="prefetch pairs with N threads (overlaps host "
                         "data prep with device dispatch; the reference "
                         "uses a 16-worker DataLoader)")
    ap.add_argument("--ring", type=int, default=0, metavar="N",
                    help="run every NonLocal layer as RING attention "
                         "over an N-device 'data' mesh (SP/CP megapair "
                         "path, SURVEY §2.6): correspondence tokens are "
                         "sharded over the mesh and K/V/keypoint shards "
                         "rotate with ppermute, so a num_node='all' "
                         "pair whose [N, N] attention exceeds one "
                         "chip's HBM spreads across the slice. Buckets "
                         "are restricted to multiples of N (and "
                         "extended past 12000 for num_node='all'). "
                         "Mutually exclusive with --mesh.")
    ap.add_argument("--device-match", action="store_true",
                    help="build correspondences on device inside the "
                         "registration dispatch")
    ap.add_argument("--frag-cache-mb", type=int, default=4096,
                    help="device fragment-cache budget for --device-match "
                         "(MB); 0 disables")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    log = logging.getLogger("lomatch")

    from gmf_tpu.data.threedmatch import ThreeDLoMatchTest
    from gmf_tpu.eval.harness import (
        aggregate_scenes, evaluate_pairs, format_report,
    )
    from gmf_tpu.eval.registration import PointDSCRegistrar
    from gmf_tpu.utils.model_io import load_pointdsc

    import jax

    if args.fused is None:
        args.fused = jax.default_backend() != "cpu"
    if args.bf16 is None:
        args.bf16 = jax.default_backend() != "cpu"
    model, variables = load_pointdsc(args.checkpoint)
    if args.fused:
        model = model.clone(fused_attention=True)
    if args.bf16:
        import jax.numpy as jnp

        model = model.clone(dtype=jnp.bfloat16)
    if args.compat_cache != "auto":
        model = model.clone(compat_cache=args.compat_cache)
    if args.approx_knn:
        model = model.clone(knn_topk="approx")
    mesh = None
    if args.mesh:
        from gmf_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.mesh)
    num_node = args.num_node if args.num_node == "all" else int(args.num_node)
    buckets = None
    if args.ring:
        if args.mesh:
            raise SystemExit("--ring (SP over tokens) and --mesh (DP over "
                             "pairs) are mutually exclusive")
        from jax.sharding import Mesh

        devs = jax.devices()
        if len(devs) < args.ring:
            raise SystemExit(f"--ring {args.ring} needs {args.ring} "
                             f"devices, have {len(devs)}")
        ring_mesh = Mesh(np.array(devs[: args.ring]), ("data",))
        model = model.clone(ring_mesh=ring_mesh)
        # ring shards the token axis: buckets must divide by the ring
        # size, and the megapair config gets buckets past 12000 so
        # num_node='all' pairs are not subsampled away
        from gmf_tpu.data.collate import BUCKETS

        buckets = [b for b in BUCKETS if b % args.ring == 0]
        if num_node == "all":
            buckets += [b for b in (16384, 32768, 65536, 131072)
                        if b % args.ring == 0]
        buckets = tuple(sorted(buckets))
    frag_cache = None
    if args.device_match and args.frag_cache_mb:
        from gmf_tpu.eval.registration import DeviceFragmentCache

        frag_cache = DeviceFragmentCache(args.frag_cache_mb << 20)
    reg_kw = {} if buckets is None else {"buckets": buckets}
    registrar = PointDSCRegistrar(model, variables, mesh=mesh,
                                  frag_cache=frag_cache, **reg_kw)
    from gmf_tpu.eval.solvers import make_register_fn

    register_fn = make_register_fn(registrar)
    ds = ThreeDLoMatchTest(root=args.root, pair_file=args.pair_file,
                           num_node=num_node, descriptor=args.descriptor,
                           device_match=args.device_match)
    stats = evaluate_pairs(register_fn, ds,
                           re_thresh=args.re_thre, te_thresh_cm=args.te_thre,
                           batch_size=args.batch, workers=args.workers,
                           inflight=args.inflight)
    agg = aggregate_scenes({"3dlomatch": stats})
    log.info(format_report(agg))
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "all_stats.npy"), agg["all_stats"])


if __name__ == "__main__":
    main()
