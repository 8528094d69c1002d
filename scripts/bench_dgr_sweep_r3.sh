#!/bin/bash
# Re-measure the DGR register() e2e set on the real TPU chip after the
# row-gather srcdense tier + budget-raise commits (f0f8be2). One config
# at a time (single chip, single core).
# Usage: bash scripts/bench_dgr_sweep_r3.sh [outdir]
out="${1:-outputs/r3_tpu_sweep2}"
mkdir -p "$out"
run() {
  name="$1"; shift
  echo "== $name: $*"
  timeout 1800 python scripts/bench_dgr_e2e.py "$@" \
    > "$out/$name.txt" 2>&1 || echo "FAILED $name"
  tail -12 "$out/$name.txt" | grep -v Warning
}
run dgr_oracle   --device-maps on --matches oracle --runs 3
run dgr_random   --device-maps on --runs 3
run dgr_surface_oracle_bf16 --device-maps on --cloud surface --bf16 --matches oracle --runs 3
run dgr_surface_bf16        --device-maps on --cloud surface --bf16 --runs 3
run dgr_kitti_lidar_oracle  --kitti --cloud lidar --device-maps on --bf16 --matches oracle --runs 3
run dgr_kitti_lidar         --kitti --cloud lidar --device-maps on --bf16 --runs 3
echo "sweep done"
