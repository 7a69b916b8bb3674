"""Batched throughput benchmark: compressed MB/s and images/s vs batch size.

Parity with the reference's throughput harness
(cuda-decoder/benchmark_thoughput/benchmark.cu:25-136): a fixed dataset
decoded as one batch, reporting images/s and bytes/s counters, swept over
batch sizes the way the reference's nvJPEG comparison sweeps them
(nvjpeg-implementation/benchmark_bs.cc:32-37).

  python benchmarks/bench_throughput.py --batches 8 32 96 --size 640
  python benchmarks/bench_throughput.py --batches 96 --chunks 16 32 96
  python benchmarks/bench_throughput.py --batches 96 --workers 1 2 4

Sweeps over chunk size and host worker count mirror the reference's
thread-count sweep (plots/throughput_boxplot_ts.py parses "Threads:"
lines); per-iteration times are recorded so distributions can be drawn
as boxplots (plots/throughput_boxplot*.py).
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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32, 96])
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--rst-rows", type=int, default=1)
    ap.add_argument("--backend", default="host",
                    choices=["auto", "host", "fsm", "gather", "oracle"])
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--chunks", type=int, nargs="+", default=None,
                    help="sweep chunk sizes (device batch granularity)")
    ap.add_argument("--workers", type=int, nargs="+", default=None,
                    help="sweep host thread-pool sizes (reference: Threads sweep)")
    ap.add_argument("--corpus", default="synthetic",
                    choices=["photo", "synthetic"],
                    help="photo = real-fixture mosaics (bench.py corpus)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--jsonl", default=None)
    args = ap.parse_args(argv)

    import numpy as np

    from bench import _encode, _make_image, _make_photo_image
    from tpujpeg.runtime.batch import BatchDecoder

    gen = _make_photo_image if args.corpus == "photo" else _make_image
    max_b = max(args.batches)
    datas = [
        _encode(gen(args.size, i), args.quality, args.rst_rows)
        for i in range(max_b)
    ]
    jsonl = open(args.jsonl, "a") if args.jsonl else None
    # configs: cross-product of the requested sweeps (defaults = one config)
    configs = []
    for chunk in args.chunks or [args.chunk]:
        for workers in args.workers or [None]:
            configs.append((chunk, workers))

    for chunk, workers in configs:
        dec = BatchDecoder(
            backend=args.backend, chunk_size=chunk, workers=workers,
            strict=False,
        )
        dec.decode(datas[:chunk], fetch=False)  # warm compiles
        for b in args.batches:
            batch = datas[:b]
            nbytes = sum(len(d) for d in batch)
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                dec.decode(batch, fetch=False)
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            rec = {
                "batch": b,
                "chunk": chunk,
                "workers": workers,
                "size": args.size,
                "mb_per_s": round(nbytes / dt / 1e6, 1),
                "images_per_s": round(b / dt, 1),
                "mpix_per_s": round(b * args.size * args.size / dt / 1e6, 1),
                "mb_per_s_samples": [
                    round(nbytes / t / 1e6, 1) for t in times
                ],
                "backend": dec.stats.backend,
                "chunks": dec.stats.chunks,
            }
            if jsonl:
                jsonl.write(json.dumps(rec) + "\n")
                jsonl.flush()
            wtag = f" workers={workers}" if workers else ""
            print(
                f"batch {b:4d} chunk {chunk:3d}{wtag}: "
                f"{rec['mb_per_s']:7.1f} MB/s  "
                f"{rec['images_per_s']:7.1f} img/s  "
                f"{rec['mpix_per_s']:7.1f} MPix/s",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
