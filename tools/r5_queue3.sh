#!/bin/bash
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=~/.cache/tpujpeg-jax-cache
python -u bench.py > /tmp/bench_r5d.log 2>&1
grep -o '{.*}' /tmp/bench_r5d.log | tail -1 > benchmark_results/headline_r5.json
python -u bench.py --rst-rows 0 --skip-runtime > /tmp/r5_spec3.log 2>&1
grep -o '{.*}' /tmp/r5_spec3.log | tail -1 > benchmark_results/headline_r5_spec.json
timeout 3600 python -u /tmp/check_photo_exact.py > /tmp/r5_exact.log 2>&1
echo DONE > /tmp/r5_queue3.done
