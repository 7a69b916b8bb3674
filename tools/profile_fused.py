"""Cumulative-cut profile of the PRODUCTION fused chunk program.

The standalone stage probes (profile_decode.py) fence on slices, which
lets XLA narrow or dead-code-eliminate buffers the real program must
materialize — the round-4 scan-scaling probe measured a scan whose event
matrix had been optimized away, overstating the wide-scan win (the
superchunk measured a wash against its prediction).  This tool instead
compiles the REAL fused program truncated after each stage, with a
checksum fence that consumes the stage's full output, and reports
marginal (x4-x1)/3 wall-clock per cut; consecutive differences are each
stage's honest cost inside the production program.

Usage: python tools/profile_fused.py [--images 64] [--size 640]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpujpeg-jax-cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--corpus", default="synthetic",
                    choices=["photo", "synthetic"])
    ap.add_argument("--slots", default="auto",
                    choices=["auto", "off", "64", "128", "256"],
                    help="slot-spread materialization (round 5): auto/"
                         "off/explicit capacity C")
    ap.add_argument("--cuts", nargs="+",
                    default=["scan", "materialize", "assemble", "full"],
                    help="subset to profile (each cut is its own compile)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _encode, _make_image, _make_photo_image
    from tpujpeg.io.parser import parse
    from tpujpeg.ops import fsm
    from tpujpeg.pipeline import Geometry
    from tpujpeg.runtime import fused

    print(f"platform={jax.devices()[0].platform} images={args.images}")
    gen = _make_photo_image if args.corpus == "photo" else _make_image
    datas = [
        _encode(gen(args.size, i), args.quality, 1)
        for i in range(args.images)
    ]
    imgs = [parse(d) for d in datas]
    plan = fsm.build_plan(imgs, split=False)
    geom = Geometry.of(imgs[0])
    xs, sn = plan.groups[0]
    up = (jax.device_put(jnp.asarray(xs)), jax.device_put(jnp.asarray(sn)))
    quant = np.stack(
        [np.stack([im.quant_tables[c.quant_id] for c in im.components])
         for im in imgs]
    ).astype(np.int32)
    qd = jax.device_put(jnp.asarray(quant))
    comp = sum(len(d) for d in datas)
    print(f"[{xs.shape[0]} x {xs.shape[1]}] max_blk={plan.max_blk} "
          f"{comp/1e6:.2f} MB")

    def _fence(out):
        arr = out[0]
        np.asarray(jax.device_get(arr.ravel()[:1]))

    def marginal(call):
        call()
        def best(n):
            b = None
            for _ in range(args.iters):
                t0 = time.perf_counter()
                out = None
                for _ in range(n):
                    out = call()
                _fence(out)
                dt = time.perf_counter() - t0
                b = dt if b is None else min(b, dt)
            return b
        return (best(4) - best(1)) / 3

    records = []
    prev = 0.0
    slots = (False if args.slots == "off"
             else None if args.slots == "auto" else int(args.slots))
    for cut in [None if c == "full" else c for c in args.cuts]:
        fn = fused.compiled_fused_decoder(
            geom, plan.tables, plan.max_blk, plan.layout, args.images,
            False, fsm.STEPS_PRODUCTION, False, cut, slots,
        )
        ms = marginal(lambda: fn(up[0], up[1], qd)) * 1e3
        rec = dict(cut=cut or "full", cumulative_ms=round(ms, 2),
                   stage_ms=round(ms - prev, 2), corpus=args.corpus,
                   slots=args.slots)
        prev = ms
        records.append(rec)
        print(json.dumps(rec))
    full = records[-1]["cumulative_ms"]
    print(f"full-chunk marginal {full:.1f} ms -> "
          f"{comp / full * 1e3 / 1e6:.1f} MB/s per-chunk ceiling")

    if args.out:
        with open(args.out, "a") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
