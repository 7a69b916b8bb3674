#!/bin/bash
# Run every measurement queued while the axon relay was down (r2+).
# Usage: bash tools/r2_chip_queue.sh [outdir]   (default /tmp/chipq)
# Each step is independently timeout-guarded; results land in $OUT/*.log.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/chipq}
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR=~/.cache/tpujpeg-jax-cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" "$@" > "$OUT/$name.log" 2>&1
  echo "    exit=$? ($(tail -c 200 "$OUT/$name.log" | tr '\n' ' ' | tail -c 120))"
}

# 0. sanity: chip reachable
TMO=120 run probe python3 -c "import jax; print(jax.devices())" || true

# 1. fresh stage breakdown at the production shape
TMO=1800 run profile python -u tools/profile_decode.py --images 64 --no-split --iters 3

# 2. two-level symbol map (49 vs 130 pieces): MXU-in-scan overhead
TMO=1800 run symmap python -u tools/bench_symbol_map.py

# 3. gather strategy table incl. the new 256-byte-row case
TMO=1800 run gather python -u tools/bench_gather.py

# 4. multi-window butterfly spans: compiled-on-chip correctness + timing
TMO=1800 run kc2 env TPUJPEG_PALLAS_KC=2 TPUJPEG_TEST_TPU=1 \
    python -m pytest tests/test_materialize.py -q -k "compiled_on_chip or wider_span" -p no:cacheprovider
TMO=1800 run prof_kc2 env TPUJPEG_PALLAS_KC=2 \
    python -u tools/profile_decode.py --images 64 --no-split --iters 3
TMO=1800 run prof_kc4 env TPUJPEG_PALLAS_KC=4 \
    python -u tools/profile_decode.py --images 64 --no-split --iters 3

# 5. integrated two-level symbol map A/B at the production shape
TMO=1800 run prof_symmap env TPUJPEG_SYMMAP=1 \
    python -u tools/profile_decode.py --images 64 --no-split --iters 3

# 6. headline re-measure (host pipeline + 16-block max_blk landed since 210.5)
TMO=3600 run bench python -u bench.py

echo "ALL DONE -> $OUT"
