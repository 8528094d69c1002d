#!/bin/bash
# Resume the r3 TPU measurement sweep: the runs that never completed when
# the previous session died. One process at a time (single chip).
out="${1:-outputs/r3_tpu_sweep2}"
mkdir -p "$out"
fix=/tmp/eval_cli_fixture
run() {
  name="$1"; to="$2"; shift 2
  echo "== $name: $*"
  timeout "$to" "$@" > "$out/$name.txt" 2>&1 || echo "FAILED $name"
  tail -6 "$out/$name.txt" | grep -v -i warning
}
run dgr_kitti_lidar_oracle 2400 python scripts/bench_dgr_e2e.py \
    --kitti --cloud lidar --device-maps on --bf16 --matches oracle --runs 3
run dgr_kitti_lidar 2400 python scripts/bench_dgr_e2e.py \
    --kitti --cloud lidar --device-maps on --bf16 --runs 3
run eval_cli_serial 2400 python scripts/bench_eval_cli.py --batch 1 --pairs 64 \
    --keep-fixture "$fix"
run eval_cli_b64 2400 python scripts/bench_eval_cli.py --batch 64 --pairs 64 \
    --keep-fixture "$fix"
run eval_cli_b64_full 2400 python scripts/bench_eval_cli.py --batch 64 --pairs 64 \
    --device-match --workers 2 --inflight 2 --keep-fixture "$fix"
run bench_lomatch 3000 python bench.py --lomatch
echo "resume sweep done"
