"""Profile the speculative (no-restart) decode path on the real chip.

VERDICT r3 #2: the spec entropy stage reads 4.29 s vs the restart path's
0.48 s on identical data (`headline_r3_spec.json`).  The spec chain per
chunk is: Jacobi converge (N count-mode scans inside one while_loop
dispatch) + write pass (1 scan) + quota gather + pixel program.  Total
serial columns ~= (iters + 1) * (chunk_bytes + SPEC_OVERLAP + FLUSH),
so the levers are (a) the iteration count (self-synchronization should
make it a small constant, independent of lanes-per-image) and (b) the
per-scan column count (smaller chunk_bytes = fewer columns, more lanes —
and lanes are near-free if the scan is latency-bound).

This tool reports, per chunk_bytes: measured Jacobi iterations, converge
wall, write wall, end-to-end spec decode wall, and implied MB/s.

Usage: python tools/bench_spec.py [--images 64] [--size 640]
       [--chunk-bytes 512 1024 2048 4096]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpujpeg-jax-cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fence(x) -> None:
    import jax

    arr = x
    while isinstance(arr, (tuple, list)):
        arr = arr[0]
    np.asarray(jax.device_get(arr.ravel()[:1]))


def timed_best(call, iters=3):
    call()
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(call())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--chunk-bytes", type=int, nargs="+",
                    default=[512, 1024, 2048, 4096])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _encode, _make_image
    from tpujpeg.io.parser import parse
    from tpujpeg.ops import fsm

    print(f"platform={jax.devices()[0].platform} images={args.images} "
          f"size={args.size} (rst=0)")

    datas = [
        _encode(_make_image(args.size, i), args.quality, 0)
        for i in range(args.images)
    ]
    imgs = [parse(d) for d in datas]
    comp = sum(len(d) for d in datas)
    print(f"compressed {comp/1e6:.2f} MB")

    # oracle coefficients for bit-exactness spot check (first image)
    from tpujpeg.oracle import decoder as oracle

    want0 = oracle.entropy_decode(imgs[0])

    records = []
    for cb in args.chunk_bytes:
        plan = fsm.build_spec_plan_batch(imgs, cb)
        L = plan.chunk_bits.shape[0]
        xs_dev = jax.device_put(jnp.asarray(plan.xs))
        cbits = jnp.asarray(plan.chunk_bits)
        inherit = np.ones(L, bool)
        inherit[plan.img_first] = False
        inherit[plan.n_lanes:] = False
        max_iters = int(plan.img_lanes.max()) + 1

        def converge():
            return fsm._spec_converge_jit(
                xs_dev, cbits, jnp.asarray(inherit), jnp.int32(max_iters),
                tables=plan.tables, blk_cap=plan.blk_cap,
            )

        out = converge()
        iters_used = int(np.asarray(jax.device_get(out[6])))
        t_conv = timed_best(lambda: converge()[7], iters=args.iters)

        # full batch decode end-to-end on device (converge + write +
        # gather), excluding pixels, fenced on the dense tensor
        def full():
            coeffs, (em, ee) = fsm.decode_speculative_batch(
                imgs, cb, device_out=True, pad_to=args.images,
                plan=plan, xs_dev=xs_dev,
            )
            return coeffs

        t_full = timed_best(full, iters=args.iters)

        # exactness spot check + write-pass error masks (production folds
        # these into the chunk fence; an unchecked latched lane here
        # explains an inexact result, not a silent bug)
        coeffs, (em, ee) = fsm.decode_speculative_batch(
            imgs, cb, device_out=True, pad_to=args.images,
            plan=plan, xs_dev=xs_dev,
        )
        em_h, ee_h = (np.asarray(jax.device_get(x)) for x in (em, ee))
        coeffs = np.asarray(jax.device_get(coeffs))
        nb0 = int(plan.img_blocks[0])
        ok = bool(np.array_equal(coeffs[0, :nb0], want0))
        bad_imgs = []
        if not ok:
            for ii in range(args.images):
                w = oracle.entropy_decode(imgs[ii])
                nbi = int(plan.img_blocks[ii])
                if not np.array_equal(coeffs[ii, :nbi], w):
                    bad_imgs.append(ii)
                if len(bad_imgs) >= 4:
                    break

        rec = dict(
            chunk_bytes=cb, lanes=int(plan.n_lanes), L_padded=L,
            stride=cb + fsm.SPEC_OVERLAP, blk_cap=plan.blk_cap,
            jacobi_iters=iters_used, max_iters=max_iters,
            converge_ms=round(t_conv * 1e3, 1),
            full_entropy_ms=round(t_full * 1e3, 1),
            entropy_MBps=round(comp / t_full / 1e6, 1),
            exact=ok,
            write_err_mal=int(em_h.sum()),
            write_err_env=int(ee_h.sum()),
            bad_imgs=bad_imgs,
        )
        records.append(rec)
        print(json.dumps(rec))

    if args.out:
        with open(args.out, "a") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
