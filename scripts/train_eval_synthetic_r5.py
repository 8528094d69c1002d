"""r5 DGR discriminating train->eval closure (VERDICT r4 item 3).

The r4 study (outputs/dgr_hard_fixture_r4.txt) left the closure open:
zero-mean random wrong matches cancel out of the Procrustes
cross-covariance (untrained succeeds at moderate hit ratios), while the
constant-offset biased fixture is locally rigid-consistent and thus
invisible to the inlier conv (unlearnable — recorded negative result).

The r5 fixture threads that needle with BIASED-BUT-SCATTERED outliers
(make_dgr_pair outlier_scatter): partner-less points displace by a
constant mean offset PLUS large per-point Gaussian scatter, so

- the non-zero mean biases the untrained engine's uniform-weight
  Procrustes translation (untrained FAILS at a hit ratio where the
  classes are balanced enough to learn), and
- the scatter keeps the outlier cluster locally incoherent — exactly
  the signal the 6-D inlier conv is built for (ref
  GMF_DGR_fcgf/core/trainer.py:159-358 trains it on real data's
  equally-incoherent wrong matches).

Phases (each its own process — the CPU JIT code-memory caveat in
CLAUDE.md; run `--phase all` to orchestrate):

  fixture   write a 3DMatch-layout fixture tree of held-out pairs +
            untrained tiny checkpoints
  train     train the tiny inlier net on same-distribution pairs
            (WeightedProcrustesTrainer, FPFH descriptor), save ckpt
  eval      run the REAL eval/test_dgr.py CLI (--descriptor fpfh
            --tiny) with the untrained and trained checkpoints and
            print both success rates

The committed run log lives at outputs/train_eval_synthetic_r5.txt;
tests/test_train_eval_loop.py::test_dgr_discriminating_closure asserts
the same gap under `pytest -m slow`.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

FIXTURE_KW = dict(n_points=1200, voxel_size=0.05, surface=True,
                  overlap=0.5, outlier_bias=0.9, outlier_scatter=0.4)
N_HELD = 12
N_POOL = 24
ROUNDS = 8


def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _tiny_ckpts(workdir):
    from test_dgr_trainer import tiny_nets

    from gmf_tpu.utils.checkpoint import save_checkpoint

    fcgf, fv, inlier, iv = tiny_nets()
    save_checkpoint(os.path.join(workdir, "fcgf_ckpt"), dict(fv))
    save_checkpoint(os.path.join(workdir, "inlier_untrained"), dict(iv))
    return fcgf, fv, inlier, iv


def phase_fixture(workdir):
    """Held-out pairs as a 3DMatch-layout tree the test_dgr CLI reads."""
    jax = _cpu()  # noqa: F841
    import matplotlib.image as mpimg

    from gmf_tpu.data.dgr_loader import make_dgr_pair
    from gmf_tpu.data.ply import write_ply

    os.makedirs(workdir, exist_ok=True)
    _tiny_ckpts(workdir)
    scenes = []
    for i in range(N_HELD):
        pair = make_dgr_pair(np.random.RandomState(2000 + i), **FIXTURE_KW)
        scene = f"synthetic-closure-{i:02d}"
        seq = os.path.join(workdir, scene, "seq-01")
        os.makedirs(seq, exist_ok=True)
        write_ply(os.path.join(seq, "cloud_bin_0.ply"), pair["pcd0"])
        write_ply(os.path.join(seq, "cloud_bin_1.ply"), pair["pcd1"])
        for j, img in ((0, pair["p_image"]), (1, pair["q_image"])):
            mpimg.imsave(os.path.join(seq, f"cloud_bin_{j}_0.png"),
                         (img * 255).astype(np.uint8))
        # gt.log stores the fragment-space transform the harness inverts
        T_ts = np.linalg.inv(pair["T_gt"].astype(np.float64))
        with open(os.path.join(workdir, scene, "gt.log"), "w") as f:
            f.write("0 1 2\n")
            for row in T_ts:
                f.write(" ".join(f"{v:.8f}" for v in row) + "\n")
        scenes.append(scene)
    with open(os.path.join(workdir, "scenes.txt"), "w") as f:
        f.write("\n".join(scenes))
    print(f"fixture: {N_HELD} scenes under {workdir}")


def phase_train(workdir):
    jax = _cpu()

    from gmf_tpu.configs.presets import dgr_3dmatch
    from gmf_tpu.data.dgr_loader import make_dgr_pair
    from gmf_tpu.train.dgr_trainer import WeightedProcrustesTrainer
    from gmf_tpu.utils.checkpoint import save_checkpoint

    fcgf, fv, inlier, iv = _tiny_ckpts(workdir)
    # BCE-only: the Procrustes term's arccos-at-clip gradients are
    # chaotic at this scale and drove recall to collapse (r5 A/B:
    # full loss F1 0.33 -> 0.13 over rounds; BCE-only precision
    # climbs 0.38 -> 0.53 base 0.28) — the reference exposes the same
    # weighting knob (--procrustes_loss_weight).
    cfg = dgr_3dmatch(procrustes_loss_weight=0.0)
    t = WeightedProcrustesTrainer(
        fcgf, fv, inlier, iv, cfg, voxel_cap_granule=256,
        corr_cap_granule=256, descriptor="fpfh", device_maps=False)
    rng = np.random.RandomState(7)
    pool = [make_dgr_pair(rng, **FIXTURE_KW) for _ in range(N_POOL)]
    import time

    t0 = time.time()
    for rd in range(ROUNDS):
        order = rng.permutation(N_POOL)
        for i in range(0, N_POOL, 4):
            m = t.train_step([pool[j] for j in order[i:i + 4]])
        print(f"train rd{rd} ({time.time() - t0:.0f}s): "
              f"loss={m.get('loss', float('nan')):.3f}", flush=True)
    save_checkpoint(os.path.join(workdir, "inlier_trained"),
                    {"params": jax.tree.map(np.asarray, t.inlier_params),
                     "batch_stats": jax.tree.map(np.asarray,
                                                 t.inlier_bstats)})
    print(f"trained checkpoint saved ({ROUNDS * N_POOL} pair-updates)")


def phase_eval(workdir, which):
    _cpu()
    import sys as _sys

    from gmf_tpu.eval import test_dgr

    scenes = open(os.path.join(workdir, "scenes.txt")).read().split()
    # two engine configurations per arm:
    #   default — the reference engine: its wsum gate (min weight 200,
    #     deep_global_registration.py:330) routes the tiny nets' low-
    #     confidence weights to the RANSAC safeguard + ICP, which
    #     rescues EVERY pair at this hit ratio (~0.28; RANSAC succeeds
    #     at any inlier fraction >= ~5%) — trained == untrained == 100%
    #     BY DESIGN. The engine cannot fail on a learnable fixture.
    #   ablated — --safeguard-min-weight 0 and NO ICP: the pure
    #     weighted-Procrustes + refine path, isolating what the
    #     TRAINED weights contribute (the discriminating measurement).
    #     ICP must be off here too: from the untrained arm's diluted-
    #     but-unbiased init (~16 deg — zero-mean wrong matches cancel
    #     out of the cross-covariance) ICP converges to GT on its own,
    #     rescuing 12/12 exactly like the safeguard (measured r5).
    for mode, extra in (("default", ["--use-icp"]),
                        ("ablated", ["--safeguard-min-weight", "0"])):
        out = os.path.join(workdir, f"eval_{which}_{mode}")
        _sys.argv = [
            "test_dgr", "--root", workdir,
            "--fcgf-checkpoint", os.path.join(workdir, "fcgf_ckpt"),
            "--inlier-checkpoint", os.path.join(workdir,
                                                f"inlier_{which}"),
            "--descriptor", "fpfh", "--tiny", "--voxel", "0.05",
            "--out", out, "--scenes", *scenes, *extra,
        ]
        test_dgr.main()
        stats = np.load(os.path.join(out, "dgr_stats.npy"))
        ok = stats[:, 0] > 0
        print(f"[{which}/{mode}] success {stats[:, 0].mean() * 100:.1f}% "
              f"({int(stats[:, 0].sum())}/{len(stats)}) "
              f"rre {stats[ok][:, 1].mean() if ok.any() else float('nan'):.2f} "
              f"rte {stats[ok][:, 2].mean() if ok.any() else float('nan'):.3f} "
              f"safeguard {stats[:, 4].mean() * 100:.0f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["all", "fixture", "train", "eval-untrained",
                             "eval-trained"])
    ap.add_argument("--workdir", default="/tmp/dgr_closure_r5")
    args = ap.parse_args()

    if args.phase == "fixture":
        phase_fixture(args.workdir)
    elif args.phase == "train":
        phase_train(args.workdir)
    elif args.phase == "eval-untrained":
        phase_eval(args.workdir, "untrained")
    elif args.phase == "eval-trained":
        phase_eval(args.workdir, "trained")
    else:
        # one process per phase: long many-shape CPU runs exhaust LLVM
        # JIT code memory in a single process (CLAUDE.md)
        for ph in ("fixture", "train", "eval-untrained", "eval-trained"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--phase", ph,
                 "--workdir", args.workdir])
            if r.returncode:
                raise SystemExit(f"phase {ph} failed rc={r.returncode}")


if __name__ == "__main__":
    main()
