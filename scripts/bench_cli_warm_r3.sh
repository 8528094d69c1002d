#!/bin/bash
# Steady-state eval-CLI measurement (r3): 256-pair fixture, warm pass
# first, steady-state metric excludes the first batch's trace/compile.
# Waits for the follow-up sweep (pid in /tmp/followup.pid) to exit.
out="${1:-outputs/r3_tpu_sweep2}"
mkdir -p "$out"
fix=/tmp/eval_cli_fixture
if [ -f /tmp/followup.pid ]; then
  while kill -0 "$(cat /tmp/followup.pid)" 2>/dev/null; do sleep 30; done
fi
run() {
  name="$1"; to="$2"; shift 2
  echo "== $name: $*"
  timeout "$to" "$@" > "$out/$name.txt" 2>&1 || echo "FAILED $name"
  tail -7 "$out/$name.txt" | grep -v -i warning
}
run eval_cli_warm_serial 3600 python scripts/bench_eval_cli.py \
    --batch 1 --pairs 256 --warm --keep-fixture "$fix"
run eval_cli_warm_b64 3600 python scripts/bench_eval_cli.py \
    --batch 64 --pairs 256 --warm --keep-fixture "$fix"
run eval_cli_warm_b64_fused 3600 python scripts/bench_eval_cli.py \
    --batch 64 --pairs 256 --warm --bf16 --fused --keep-fixture "$fix"
run eval_cli_warm_b64_full 3600 python scripts/bench_eval_cli.py \
    --batch 64 --pairs 256 --warm --bf16 --fused \
    --device-match --workers 2 --inflight 2 --keep-fixture "$fix"
echo "warm cli sweep done"
