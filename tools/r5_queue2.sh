#!/bin/bash
# Round-5 chip queue #2: fixed headline (per-chunk step ladder), spec
# headline, warm-pass mixed sustained.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=~/.cache/tpujpeg-jax-cache

python -u bench.py > /tmp/bench_r5c.log 2>&1
grep -o '{.*}' /tmp/bench_r5c.log | tail -1 \
  > benchmark_results/headline_r5.json

python -u bench.py --rst-rows 0 --skip-runtime --one-corpus \
  > /tmp/r5_spec2.log 2>&1
grep -o '{.*}' /tmp/r5_spec2.log | tail -1 \
  > benchmark_results/headline_r5_spec.json

TPJ_MIXED_MAX=780 python -u tools/bench_sustained.py \
  --images 400 --size 520 --mixed-sizes --windows 4 --chunk 32 --passes 3 \
  --out benchmark_results/sustained_r5_mixed.jsonl \
  > /tmp/r5_mixed3.log 2>&1

echo DONE > /tmp/r5_queue2.done
