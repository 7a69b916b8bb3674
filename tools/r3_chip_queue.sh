#!/bin/bash
# Round-3 chip measurement queue: run the moment the axon relay answers.
# Ordered by value; each step is timeout-guarded; every JSON artifact is
# ARCHIVED into benchmark_results/ at capture time (VERDICT r2 weak #2:
# headlines that exist only in commit messages don't count).
# Usage: bash tools/r3_chip_queue.sh [outdir]   (default /tmp/chipq3)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chipq3}
ARC=benchmark_results
mkdir -p "$OUT" "$ARC"
export JAX_COMPILATION_CACHE_DIR=~/.cache/tpujpeg-jax-cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" > "$OUT/$name.log" 2>&1
  echo "    exit=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' ' | tail -c 120))"
}

# archive the LAST json-looking line of a log
arch_json() {  # arch_json <log-name> <artifact-file>
  grep -E '^\{' "$OUT/$1.log" | tail -1 > "$ARC/$2" 2>/dev/null
  [ -s "$ARC/$2" ] && echo "    archived -> $ARC/$2"
}

# 0. sanity: chip reachable
TMO=120 run probe python3 -c "import jax; print(jax.devices())" || true

# 1. HEADLINE re-measure (everything since 210.5 is chip-unverified:
#    native destuff, prep pool, 16-block buckets, device-resident spec,
#    one-round-trip spec, device idx build) — archive immediately.
TMO=3600 run bench python -u bench.py
arch_json bench headline_r3.json

# 2. fresh stage breakdown at the production shape
TMO=1800 run profile python -u tools/profile_decode.py --images 64 --no-split --iters 3
cp "$OUT/profile.log" "$ARC/profile_r3.txt" 2>/dev/null || true

# 3. two-level symbol map A/B (49 vs 130 pieces; MXU-in-scan overhead is
#    the open question) — bench-level A/B, archived separately
TMO=3600 run bench_symmap env TPUJPEG_SYMMAP=1 python -u bench.py --skip-runtime
arch_json bench_symmap headline_r3_symmap.json
TMO=1800 run prof_symmap env TPUJPEG_SYMMAP=1 \
    python -u tools/profile_decode.py --images 64 --no-split --iters 3

# 4. runtime-vs-size curve with the CURRENT code (archived r2 curve is
#    stale: 260 ms @2000^2 predates the fused path; claim is 104.3)
TMO=3600 run runtime python -u benchmarks/bench_runtime.py --out "$ARC/runtime_r3.txt" --iters 4
cp "$OUT/runtime.log" "$ARC/runtime_r3.stdout" 2>/dev/null || true

# 5. speculative-path headline (no-restart streams; exercises the new
#    one-round-trip + device idx build on the real chip)
TMO=3600 run bench_spec python -u bench.py --rst-rows 0 --skip-runtime
arch_json bench_spec headline_r3_spec.json

# 6. multi-window butterfly spans (interpret-proven; VMEM is the risk)
TMO=1800 run kc2 env TPUJPEG_PALLAS_KC=2 TPUJPEG_TEST_TPU=1 \
    python -m pytest tests/test_materialize.py -q -k "compiled_on_chip or wider_span" -p no:cacheprovider
TMO=1800 run prof_kc2 env TPUJPEG_PALLAS_KC=2 \
    python -u tools/profile_decode.py --images 64 --no-split --iters 3

# 7. gather strategy table incl. the 256-byte-row spec-assemble case
TMO=1800 run gather python -u tools/bench_gather.py
cp "$OUT/gather.log" "$ARC/gather_r3.txt" 2>/dev/null || true

# 8. reference-scale sustained run (3000 images, windows + RSS)
TMO=7200 run sustained python -u tools/bench_sustained.py \
    --images 3000 --size 500 --out "$ARC/sustained_r3.jsonl"

# 9. mixed-size sustained run through the bucketed path (compile-bounded)
TMO=7200 run sustained_mixed python -u tools/bench_sustained.py \
    --images 600 --mixed-sizes --windows 6 --out "$ARC/sustained_mixed_r3.jsonl"

# 10. on-chip test pass for the code the relay outage left CPU-only
#     (interpret mode has missed Mosaic limits before)
TMO=5400 run tests_chip env TPUJPEG_TEST_TPU=1 \
    python -m pytest tests/test_fsm_spec.py tests/test_buckets.py -q -p no:cacheprovider

echo "ALL DONE -> $OUT ; artifacts in $ARC"
