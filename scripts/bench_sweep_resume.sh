#!/bin/bash
# Resume the r2 sweep from where it was interrupted (b=8 --no-fused --bf16).
out="${1:-outputs/bench_sweep_r2.txt}"
run() {
  echo "== $1" | tee -a "$out"
  shift
  timeout 900 python bench.py "$@" 2>>"$out.err" | tail -1 | tee -a "$out" \
    || echo "FAILED" | tee -a "$out"
}
run "N=5000 b=8 --no-fused --bf16" --num-corr 5000 --batch 8 --no-fused --bf16
for b in 16 32; do
  run "N=5000 b=$b --fused "        --num-corr 5000 --batch "$b" --fused
  run "N=5000 b=$b --fused --bf16"  --num-corr 5000 --batch "$b" --fused --bf16
  run "N=5000 b=$b --no-fused "     --num-corr 5000 --batch "$b" --no-fused
  run "N=5000 b=$b --no-fused --bf16" --num-corr 5000 --batch "$b" --no-fused --bf16
done
run "kitti N=12000 b=1 --fused --bf16" --num-corr 12000 --batch 1 --fused --bf16
run "kitti N=12000 b=2 --fused --bf16" --num-corr 12000 --batch 2 --fused --bf16
echo "sweep done" | tee -a "$out"
