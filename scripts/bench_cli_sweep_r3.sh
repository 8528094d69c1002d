#!/bin/bash
# Measure the REAL eval CLI + LoMatch megapair preset on the TPU chip.
# (VERDICT r2 item 1b: the 3DMatch eval CLI measured at >= the b-batched
# single-chip rate.) One process at a time.
out="${1:-outputs/r3_tpu_sweep2}"
mkdir -p "$out"
fix=/tmp/eval_cli_fixture
run() {
  name="$1"; shift
  echo "== $name: $*"
  timeout 2400 "$@" > "$out/$name.txt" 2>&1 || echo "FAILED $name"
  tail -8 "$out/$name.txt" | grep -v -i warning
}
run eval_cli_serial python scripts/bench_eval_cli.py --batch 1 --pairs 64 \
    --keep-fixture "$fix"
run eval_cli_b64 python scripts/bench_eval_cli.py --batch 64 --pairs 64 \
    --keep-fixture "$fix"
run eval_cli_b64_full python scripts/bench_eval_cli.py --batch 64 --pairs 64 \
    --device-match --workers 2 --inflight 2 --keep-fixture "$fix"
run bench_lomatch python bench.py --lomatch
echo "cli sweep done"
