"""Headline benchmark: batched JPEG decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology mirrors the reference's throughput benchmark
(cuda-decoder/benchmark_thoughput/benchmark.cu:56-77): host-side parse +
entropy decode sit OUTSIDE the timed region (the reference times its batch
kernel only, with extract/allocate per image done beforehand on host), and
the timed region is the device decode program (dequant + inverse zigzag +
integer IDCT + color conversion + risk flagging) over the whole batch,
kernel-resident inputs, synchronized with block_until_ready.

Baseline: the reference's published batch throughput, ~550 compressed MB/s
(figures/throughput.png, BASELINE.md).  We report compressed MB/s over the
same definition: total compressed scan bytes / device decode time.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpujpeg-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

BASELINE_MBPS = 550.0  # reference final-cuda batch throughput (BASELINE.md)


def _make_batch(n_images: int, size: int, quality: int, seed: int = 0):
    """Synthetic photographic-ish JPEGs, one size class (libjpeg-encoded)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    datas = []
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for i in range(n_images):
        f1, f2 = rng.uniform(0.01, 0.12, 2)
        base = (
            128
            + 80 * np.sin(xx * f1 + i)
            + 47 * np.cos(yy * f2 - 2 * i)
            + rng.normal(0, 6, (size, size))
        )
        arr = np.stack(
            [base, np.roll(base, 11, 0), np.roll(base, 23, 1)], -1
        ).clip(0, 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=quality, subsampling=0)
        datas.append(buf.getvalue())
    return datas


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpujpeg import pipeline
    from tpujpeg.io.parser import parse
    from tpujpeg.parallel import sharding

    datas = _make_batch(args.images, args.size, args.quality)
    compressed_bytes = sum(len(d) for d in datas)

    # Host stage (untimed, matching reference methodology).
    plans = [pipeline.build_plan(parse(d)) for d in datas]
    geom = plans[0][0]
    coeffs = jax.device_put(jnp.stack([jnp.asarray(p[1]) for p in plans]))
    quant = jax.device_put(jnp.stack([jnp.asarray(p[2]) for p in plans]))

    mesh = sharding.make_mesh(n_batch=len(jax.devices()), n_stripe=1)
    fn = sharding.compiled_batch_decoder(geom, mesh)

    # Warmup/compile.
    out = fn(coeffs, quant)
    jax.block_until_ready(out)

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = fn(coeffs, quant)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    mbps = compressed_bytes / dt / 1e6
    mpixps = args.images * args.size * args.size / dt / 1e6
    result = {
        "metric": "batch_decode_throughput",
        "value": round(mbps, 1),
        "unit": "compressed_MB_per_s",
        "vs_baseline": round(mbps / BASELINE_MBPS, 3),
        "mpixels_per_s": round(mpixps, 1),
        "config": f"{args.images}x{args.size}x{args.size} q{args.quality} "
        f"4:4:4, device-stage timing, {len(jax.devices())} chip(s)",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
