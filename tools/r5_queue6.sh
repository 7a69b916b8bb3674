#!/bin/bash
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=~/.cache/tpujpeg-jax-cache
python -u bench.py --chunk 256 --corpus synthetic --one-corpus --skip-runtime > /tmp/r5_c256.log 2>&1
grep -o '{.*}' /tmp/r5_c256.log | tail -1 > benchmark_results/headline_r5_chunk256.json
python -u bench.py --chunk 192 --corpus synthetic --one-corpus --skip-runtime > /tmp/r5_c192.log 2>&1
grep -o '{.*}' /tmp/r5_c192.log | tail -1 > benchmark_results/headline_r5_chunk192.json
echo DONE > /tmp/r5_queue6.done
