#!/bin/bash
# Round-3 sweep 3: frag-cache + jitted-assembly TPU measurements.
# Serialize: only one process may use the TPU at a time.
set -u
OUT=outputs/r3_tpu_sweep3
mkdir -p $OUT

run() {
  name=$1; shift
  echo "== $name: $*" | tee -a $OUT/sweep.log
  timeout 2400 "$@" > $OUT/$name.txt 2>&1
  tail -4 $OUT/$name.txt | tee -a $OUT/sweep.log
}

# 1. warm eval CLI, full pipeline, with the jitted batch assembly
run eval_cli_warm_b64_full python scripts/bench_eval_cli.py \
  --batch 64 --pairs 256 --warm --bf16 --fused --device-match \
  --workers 2 --inflight 2 --keep-fixture /tmp/eval_cli_fixture

# 2. DGR chain-pattern frag cache, oracle + random matches
run dgr_chain_oracle python scripts/bench_dgr_e2e.py \
  --device-maps on --matches oracle --overlap 3 --frag-cache 512 --runs 4
run dgr_chain_random python scripts/bench_dgr_e2e.py \
  --device-maps on --overlap 3 --frag-cache 512 --runs 4

echo "sweep3 done" | tee -a $OUT/sweep.log
