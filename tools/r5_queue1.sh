#!/bin/bash
# Round-5 chip queue: spec headline + batch-size sweep + warm-cache
# mixed-size sustained.  Runs serially (benchmarks on this box are only
# valid idle); started AFTER the headline bench finishes (the launcher
# waits on its PID file — never pgrep -f, which matches the launcher's
# own wrapper shell, CLAUDE.md).
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=~/.cache/tpujpeg-jax-cache

if [ -f /tmp/bench_r5.pid ]; then
  while kill -0 "$(cat /tmp/bench_r5.pid)" 2>/dev/null; do sleep 30; done
fi

# 1. no-restart (speculative) headline, both corpora — the reference's
# own benchmark condition (VERDICT r4 #2)
python -u bench.py --rst-rows 0 --skip-runtime \
  > /tmp/r5_spec.log 2>&1
grep -o '{.*}' /tmp/r5_spec.log | tail -1 \
  > benchmark_results/headline_r5_spec.json

# 2. full batch-size ladder on the device path (reference sweep:
# nvjpeg-implementation/benchmark_throughput/benchmark_bs.cc:32)
python -u benchmarks/bench_throughput.py \
  --batches 1 2 4 8 16 32 64 128 256 512 1024 2048 3000 \
  --backend fsm --chunk 64 --iters 3 --size 500 \
  --jsonl benchmark_results/throughput_bs_r5.jsonl \
  > /tmp/r5_bs.log 2>&1

# 3. warm-cache mixed-size sustained (VERDICT r4 #5): a bounded bucket
# envelope (squares 520-780 px -> 2 bucket classes), run TWICE in one
# process — window deltas between pass 1 (cold jit keys) and pass 2
# (warm) separate compile cost from serving cost
TPJ_MIXED_MAX=780 python -u tools/bench_sustained.py \
  --images 400 --size 520 --mixed-sizes --windows 4 --chunk 32 \
  --out benchmark_results/sustained_r5_mixed.jsonl \
  > /tmp/r5_mixed1.log 2>&1
TPJ_MIXED_MAX=780 python -u tools/bench_sustained.py \
  --images 400 --size 520 --mixed-sizes --windows 4 --chunk 32 \
  --out benchmark_results/sustained_r5_mixed.jsonl \
  > /tmp/r5_mixed2.log 2>&1

echo DONE > /tmp/r5_queue1.done
