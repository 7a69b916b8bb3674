"""Local competitor baselines: PIL/libjpeg and OpenCV on the same data.

Parity with the reference's competitor harnesses (jpeglib-implementation/,
zune-implementation/, nvjpeg-implementation/ — SURVEY §2.4), which shell
out to djpeg / a zune binary / nvJPEG samples over the same datasets.
Here the honest comparison is in-process against the CPU JPEG decoders
available on this machine, over the exact same synthetic dataset bench.py
uses.

  python benchmarks/bench_competitors.py --images 32 --size 640
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--rst-rows", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)

    import numpy as np

    from bench import _encode, _make_image

    datas = [
        _encode(_make_image(args.size, i), args.quality, args.rst_rows)
        for i in range(args.images)
    ]
    nbytes = sum(len(d) for d in datas)
    mpix = args.images * args.size * args.size / 1e6

    def timed(name, fn):
        fn()  # warm
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        print(
            f"{name:>12}: {nbytes/dt/1e6:7.1f} MB/s  {mpix/dt:7.1f} MPix/s  "
            f"({dt*1e3:.0f} ms/batch)",
            flush=True,
        )

    def pil_decode():
        from PIL import Image

        for d in datas:
            np.asarray(Image.open(io.BytesIO(d)).convert("RGB"))

    timed("PIL/libjpeg", pil_decode)

    try:
        import cv2

        def cv_decode():
            for d in datas:
                cv2.imdecode(np.frombuffer(d, np.uint8), cv2.IMREAD_COLOR)

        timed("OpenCV", cv_decode)
    except ImportError:
        pass

    from tpujpeg.io.parser import parse
    from tpujpeg.runtime import host as _host

    if _host._load_native() is not None:
        imgs = [parse(d) for d in datas]
        _host.decode_cpu(imgs[0])  # warm (build + OpenMP pool)

        def cpu_decode():
            for im in imgs:
                _host.decode_cpu(im)

        # the complete native C++ decoder (entropy + pixels, OpenMP) —
        # the apples-to-apples row against PIL/OpenCV on the same cores
        timed("tpujpeg/cpu-native", cpu_decode)

    from tpujpeg.runtime.batch import BatchDecoder

    for backend in ("host", "fsm"):
        dec = BatchDecoder(backend=backend, chunk_size=32, strict=False)
        try:
            timed(f"tpujpeg/{backend}",
                  lambda: dec.decode(datas, fetch=False))
        except Exception as e:  # e.g. fsm envelope
            print(f"tpujpeg/{backend}: skipped ({e})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
