"""Batched throughput benchmark: compressed MB/s and images/s vs batch size.

Parity with the reference's throughput harness
(cuda-decoder/benchmark_thoughput/benchmark.cu:25-136): a fixed dataset
decoded as one batch, reporting images/s and bytes/s counters, swept over
batch sizes the way the reference's nvJPEG comparison sweeps them
(nvjpeg-implementation/benchmark_bs.cc:32-37).

  python benchmarks/bench_throughput.py --batches 8 32 96 --size 640
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
                    choices=["auto", "host", "fsm", "oracle"])
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--jsonl", default=None)
    args = ap.parse_args(argv)

    import numpy as np

    from bench import _encode, _make_image
    from tpujpeg.runtime.batch import BatchDecoder

    max_b = max(args.batches)
    datas = [
        _encode(_make_image(args.size, i), args.quality, args.rst_rows)
        for i in range(max_b)
    ]
    dec = BatchDecoder(backend=args.backend, chunk_size=args.chunk, strict=False)
    dec.decode(datas[: args.chunk], fetch=False)  # warm compiles

    jsonl = open(args.jsonl, "a") if args.jsonl else None
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
            "mb_per_s": round(nbytes / dt / 1e6, 1),
            "images_per_s": round(b / dt, 1),
            "mpix_per_s": round(b * args.size * args.size / dt / 1e6, 1),
            "backend": dec.stats.backend,
            "chunks": dec.stats.chunks,
        }
        if jsonl:
            jsonl.write(json.dumps(rec) + "\n")
        print(
            f"batch {b:4d}: {rec['mb_per_s']:7.1f} MB/s  "
            f"{rec['images_per_s']:7.1f} img/s  {rec['mpix_per_s']:7.1f} MPix/s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
