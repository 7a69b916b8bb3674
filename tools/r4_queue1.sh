#!/bin/bash
# Round-4 chip queue #1: wide-chunk headline probes + spec-path profile.
# Runs serially (benchmarks on this box are only valid when idle).
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=~/.cache/tpujpeg-jax-cache

wait_profile() {
  # don't overlap the running profile_decode
  while pgrep -f "profile_decode" >/dev/null 2>&1; do sleep 20; done
}
wait_profile

python -u bench.py --chunk 128 --skip-runtime \
  > /tmp/r4_chunk128.log 2>&1
grep -o '{.*}' /tmp/r4_chunk128.log | tail -1 \
  > benchmark_results/headline_r4_chunk128.json

python -u bench.py --chunk 256 --skip-runtime \
  > /tmp/r4_chunk256.log 2>&1
grep -o '{.*}' /tmp/r4_chunk256.log | tail -1 \
  > benchmark_results/headline_r4_chunk256.json

python -u tools/bench_spec.py --images 64 \
  --chunk-bytes 512 1024 2048 4096 \
  --out benchmark_results/spec_profile_r4.jsonl \
  > /tmp/r4_spec.log 2>&1

echo DONE
