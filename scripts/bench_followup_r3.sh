#!/bin/bash
# Follow-up r3 measurements after the resume sweep: DGR eval-set wall
# throughput with the --overlap register() pipeline, and a PointDSC
# batch-96 probe (b=64 is the current default; b=128 OOMs).
# Waits for the resume sweep (pid in /tmp/sweep.pid) to exit first.
out="${1:-outputs/r3_tpu_sweep2}"
mkdir -p "$out"
if [ -f /tmp/sweep.pid ]; then
  while kill -0 "$(cat /tmp/sweep.pid)" 2>/dev/null; do sleep 30; done
fi
run() {
  name="$1"; to="$2"; shift 2
  echo "== $name: $*"
  timeout "$to" "$@" > "$out/$name.txt" 2>&1 || echo "FAILED $name"
  tail -6 "$out/$name.txt" | grep -v -i warning
}
run dgr_overlap3_oracle 2400 python scripts/bench_dgr_e2e.py \
    --device-maps on --matches oracle --overlap 3 --runs 4
run dgr_overlap3_random 2400 python scripts/bench_dgr_e2e.py \
    --device-maps on --overlap 3 --runs 4
run bench_b96 2400 python bench.py --batch 96
echo "followup sweep done"
