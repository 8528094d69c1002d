#!/bin/bash
# Sweep bench.py configs on the real TPU chip (one process at a time).
# Usage: bash scripts/bench_sweep.sh [outfile]
out="${1:-outputs/bench_sweep.txt}"
mkdir -p "$(dirname "$out")"
: > "$out"
for b in 4 8 16 32; do
  for fused in "--fused" "--no-fused"; do
    for prec in "" "--bf16"; do
      cfg="N=5000 b=$b $fused $prec"
      echo "== $cfg" | tee -a "$out"
      timeout 900 python bench.py --num-corr 5000 --batch "$b" $fused $prec \
        2>>"$out.err" | tail -1 | tee -a "$out" || echo "FAILED" | tee -a "$out"
    done
  done
done
echo "== kitti N=12000 b=1 --fused --bf16" | tee -a "$out"
timeout 900 python bench.py --num-corr 12000 --batch 1 --fused --bf16 \
  2>>"$out.err" | tail -1 | tee -a "$out" || echo "FAILED" | tee -a "$out"
echo "== kitti N=12000 b=2 --fused --bf16" | tee -a "$out"
timeout 900 python bench.py --num-corr 12000 --batch 2 --fused --bf16 \
  2>>"$out.err" | tail -1 | tee -a "$out" || echo "FAILED" | tee -a "$out"
echo "sweep done" | tee -a "$out"
