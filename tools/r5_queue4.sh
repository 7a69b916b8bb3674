#!/bin/bash
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=~/.cache/tpujpeg-jax-cache
python -u bench.py > /tmp/bench_r5e.log 2>&1
grep -o '{.*}' /tmp/bench_r5e.log | tail -1 > benchmark_results/headline_r5.json
python -u bench.py --rst-rows 0 --skip-runtime > /tmp/r5_spec4.log 2>&1
grep -o '{.*}' /tmp/r5_spec4.log | tail -1 > benchmark_results/headline_r5_spec.json
python -u tools/profile_fused.py --images 128 --cuts scan materialize full --slots 128 \
  --out benchmark_results/profile_fused_r5_slots.jsonl > /tmp/r5_prof128.log 2>&1
echo DONE > /tmp/r5_queue4.done
