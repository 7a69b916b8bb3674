"""Per-image runtime benchmark: decode time vs image size.

Parity with the reference's runtime harness (cuda-decoder/benchmark/
benchmark.cu:27-111): sizes 200..2000 step 200, several iterations per
image, results appended as "path ms" lines (the format its plot scripts
parse) plus a JSONL record per measurement for the observability pipeline.

The timed region is parse + entropy + device pixel program (no output
fetch), matching the cudaH row of BASELINE.md (host Huffman + kernel).

  python benchmarks/bench_runtime.py --out runtime_results.txt \
      [--sizes 200 2000 200] [--iters 5] [--backend host]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpujpeg-jax-cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# Reference per-image runtime means @ WxW (BASELINE.md, ms).
REFERENCE_MS = {
    "cudaH": {200: 3.48, 400: 12.4, 600: 30.2, 800: 52.2, 1000: 82.8,
              1200: 114, 1400: 159, 1600: 195, 1800: 218, 2000: 243},
    "jpeglib": {200: 2.68, 400: 5.49, 600: 10.3, 800: 17.2, 1000: 25.3,
                1200: 35.1, 1400: 47.2, 1600: 60.2, 1800: 70.0, 2000: 78.2},
}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs=3, default=[200, 2000, 200],
                    metavar=("LO", "HI", "STEP"))
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--rst-rows", type=int, default=1)
    ap.add_argument("--backend", default="host",
                    choices=["auto", "host", "fsm", "oracle", "cpu"])
    ap.add_argument("--out", default="benchmark_results.txt")
    ap.add_argument("--jsonl", default=None)
    ap.add_argument("--images-dir", default=None,
                    help="benchmark real files instead of synthetic images")
    args = ap.parse_args(argv)

    import numpy as np

    from bench import _encode, _make_image  # repo-root bench helpers
    from tpujpeg.runtime.batch import BatchDecoder

    if args.images_dir:
        cases = [
            (os.path.join(args.images_dir, f), open(
                os.path.join(args.images_dir, f), "rb").read())
            for f in sorted(os.listdir(args.images_dir))
            if f.lower().endswith((".jpg", ".jpeg"))
        ]
    else:
        lo, hi, step = args.sizes
        cases = []
        for size in range(lo, hi + 1, step):
            data = _encode(_make_image(size, size), args.quality, args.rst_rows)
            cases.append((f"synthetic/{size}x{size}.jpg", data))

    dec = BatchDecoder(backend=args.backend, chunk_size=1, strict=False)
    jsonl = open(args.jsonl, "a") if args.jsonl else None
    with open(args.out, "a") as out:
        for path, data in cases:
            dec.decode([data], fetch=False)  # warm compile for this geometry
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                dec.decode([data], fetch=False)
                times.append((time.perf_counter() - t0) * 1e3)
            ms = float(np.mean(times))
            out.write(f"{path} {ms:.4f}\n")
            rec = {
                "path": path,
                "bytes": len(data),
                "ms_mean": round(ms, 3),
                "ms_min": round(min(times), 3),
                "backend": dec.stats.backend,
                "stage_s": {
                    "parse": round(dec.stats.parse_s, 4),
                    "entropy": round(dec.stats.entropy_s, 4),
                    "device": round(dec.stats.device_s, 4),
                },
            }
            if jsonl:
                jsonl.write(json.dumps(rec) + "\n")
            print(f"{path}: {ms:.1f} ms  (min {min(times):.1f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
