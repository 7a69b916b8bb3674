"""How does the FSM scan's cost scale with lanes and with stride?

The round-4 headline lever depends on the answer (VERDICT r3 #1):

- If per-column cost is ~flat in lane count (latency-bound), the win is
  scanning MORE IMAGES per dispatch (a 4x-wider scan decodes 4x the
  bytes for ~the same wall-clock) and per-lane-length sorting is
  actively harmful (splitting a scan into stride groups adds serial
  columns without making any column cheaper).
- If per-column cost is ~linear in lane count (throughput-bound),
  length-sorted stride groups win: total work = sum_g stride_g * L_g
  instead of max_stride * L.

The r2/r3 notes disagree (r3 profile: "640 lanes ≈ 5120"; r2 negative
result: "step-THROUGHPUT-bound at 5120 lanes"), so this probe measures a
full lane sweep x stride sweep with the marginal (x4-x1)/3 methodology
(single dispatches swing ±10 ms with the shared tunnel).

Usage: python tools/bench_scan_scaling.py [--size 640] [--iters 3]
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


def marginal(call, iters=3, reps=(1, 4)):
    """Best-of-iters marginal cost per call: (t_hi - t_lo) / (hi - lo)."""
    lo, hi = reps
    call()  # warm/compile

    def best_of(n):
        best = None
        for _ in range(iters):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = call()
            _fence(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    return (best_of(hi) - best_of(lo)) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default=None, help="append JSONL records here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _encode, _make_image
    from tpujpeg.io.parser import parse
    from tpujpeg.ops import fsm

    print(f"platform={jax.devices()[0].platform} size={args.size} "
          f"q={args.quality}")

    # One 64-image plan gives 5120 real lanes of production-shaped data;
    # wider matrices tile it, narrower ones slice it.
    datas = [
        _encode(_make_image(args.size, i), args.quality, 1) for i in range(64)
    ]
    imgs = [parse(d) for d in datas]
    plan = fsm.build_plan(imgs, split=False)
    xs0, snb0 = plan.groups[0]
    L0, stride0 = xs0.shape
    print(f"base lane matrix [{L0} x {stride0}] "
          f"({sum(len(d) for d in datas)/1e6:.2f} MB compressed)")

    @functools.partial(jax.jit, static_argnames=("tables", "steps"))
    def scan_only(xs, snb, *, tables, steps=fsm.STEPS_PRODUCTION):
        events, (em, ee), st = fsm._fsm_scan(xs.T, snb, tables, steps=steps)
        # fence on data derived from every lane's full run
        return events[-1, 0], em, st[4]

    records = []

    def record(**kw):
        records.append(kw)
        print("  " + json.dumps(kw))

    # ---- lane sweep at fixed stride ----------------------------------
    print("\nlane sweep (fixed stride, marginal ms per scan):")
    for L in (640, 1280, 2560, 5120, 10240, 20480):
        if L <= L0:
            xs, snb = xs0[:L], snb0[:L]
        else:
            rep = -(-L // L0)
            xs = np.tile(xs0, (rep, 1))[:L]
            snb = np.tile(snb0, rep)[:L]
        xd, sd = jnp.asarray(xs), jnp.asarray(snb)
        fn = functools.partial(scan_only, tables=plan.tables)
        ms = marginal(lambda: fn(xd, sd), iters=args.iters) * 1e3
        mb = float(np.minimum(snb[:L] > 0, 1).sum())  # real lanes
        record(kind="lanes", lanes=L, stride=stride0, ms=round(ms, 2),
               us_per_col=round(ms * 1e3 / (stride0 + fsm.FLUSH_COLS), 2))

    # ---- stride sweep at fixed lanes ----------------------------------
    print("\nstride sweep (5120 lanes, marginal ms per scan):")
    for frac in (4, 2, 1):
        s = stride0 // frac
        xs = np.ascontiguousarray(xs0[:, :s])
        # cap quotas so truncated rows just finish early (timing only;
        # decode output is NOT bit-exact here and isn't checked)
        snb = np.minimum(snb0, 8)
        xd, sd = jnp.asarray(xs), jnp.asarray(snb)
        fn = functools.partial(scan_only, tables=plan.tables)
        ms = marginal(lambda: fn(xd, sd), iters=args.iters) * 1e3
        record(kind="stride", lanes=L0, stride=s, ms=round(ms, 2),
               us_per_col=round(ms * 1e3 / (s + fsm.FLUSH_COLS), 2))

    # ---- steps / symmap ablation at production shape -------------------
    print("\nstep-spec ablation (5120 lanes, production stride):")
    xd, sd = jnp.asarray(xs0), jnp.asarray(snb0)
    for steps in ((1, 1), (1, 2), (1, 3)):
        fn = functools.partial(scan_only, tables=plan.tables, steps=steps)
        ms = marginal(lambda: fn(xd, sd), iters=args.iters) * 1e3
        record(kind="steps", steps=list(steps), ms=round(ms, 2))

    if args.out:
        with open(args.out, "a") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        print(f"\nappended {len(records)} records to {args.out}")


if __name__ == "__main__":
    main()
