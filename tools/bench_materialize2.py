"""Fine-grained materialization cost probe on the real chip.

Splits fsm._decode_jit's device time into: scan, compact (fine kernel +
coarse XLA stages), spread (coarse XLA stages + fine kernel), DC cumsum —
each timed as its own jitted program with real-event inputs at the bench
shape (64x640^2 q90 rst=1, single group).  Informs where the next
headline milestone comes from (CLAUDE.md round-3 candidates #1/#3).
"""

from __future__ import annotations

import argparse
import functools
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


def _fence(x):
    import jax

    arr = x
    while isinstance(arr, (tuple, list)):
        arr = arr[0]
    np.asarray(jax.device_get(arr.ravel()[:1]))


def timed(label, fn, *args, iters=3):
    fn(*args)
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(fn(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:<52s} {best * 1e3:9.2f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import _encode, _make_image
    from tpujpeg.io.parser import parse
    from tpujpeg.ops import fsm, materialize

    datas = [
        _encode(_make_image(args.size, i), 90, 1) for i in range(args.images)
    ]
    imgs = [parse(d) for d in datas]
    plan = fsm.build_plan(imgs, split=False)
    xs = jnp.asarray(plan.groups[0][0])
    snb = jnp.asarray(plan.groups[0][1])
    tables, max_blk = plan.tables, plan.max_blk
    M = max_blk * 64
    W = materialize._W

    @functools.partial(jax.jit, static_argnames=("tables",))
    def scan_events(xs, snb, *, tables):
        events, (em, ee), st = fsm._fsm_scan(xs.T, snb, tables)
        stride, S, L = events.shape
        return events.reshape(stride * S, L), em, st[4]

    sfn = functools.partial(scan_events, tables=tables)
    timed("scan -> events", sfn, xs, snb, iters=args.iters)
    ev, _, _ = sfn(xs, snb)
    ev = jax.block_until_ready(ev)
    N, L = ev.shape
    valid = np.asarray(ev >= 0)
    print(f"  events N={N} L={L} fill={valid.mean():.2f} M={M}")

    # -- full materialization (production v3)
    timed("place_events_v3 (full)",
          lambda e: materialize.place_events_v3(e, M=M), ev, iters=args.iters)

    # -- compact only: fine kernel + coarse XLA stages
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    @jax.jit
    def compact_only(ev):
        Np = -(-N // W) * W
        valid = ev >= 0
        vi = valid.astype(jnp.int32)
        rank = jnp.cumsum(vi, axis=0) - vi
        pos = jax.lax.broadcasted_iota(jnp.int32, ev.shape, 0)
        o = jnp.where(valid, pos - rank, -1).astype(jnp.int16)
        p = jnp.where(valid, ev, 0)
        if Np > N:
            o = jnp.concatenate([o, jnp.full((Np - N, L), -1, jnp.int16)])
            p = jnp.concatenate([p, jnp.zeros((Np - N, L), jnp.int32)])
        n_win = Np // W
        cur = pl.BlockSpec((W, 128), lambda q, i: (q, i),
                           memory_space=pltpu.VMEM)
        succ = pl.BlockSpec((W, 128),
                            lambda q, i: (jnp.minimum(q + 1, n_win - 1), i),
                            memory_space=pltpu.VMEM)
        p, o = pl.pallas_call(
            functools.partial(materialize._fine_compact_kernel, n_win=n_win),
            out_shape=(jax.ShapeDtypeStruct((Np, L), jnp.int32),
                       jax.ShapeDtypeStruct((Np, L), jnp.int16)),
            grid=(n_win, L // 128),
            in_specs=[cur, succ, cur, succ],
            out_specs=(cur, cur),
        )(p, p, o, o)
        d = W
        while d < Np:
            sp = materialize._rolled(p, d, 0)
            so = materialize._rolled(o, d, jnp.int16(-1))
            move = (so >= 0) & ((so & d) > 0)
            stay = (o >= 0) & ((o & d) == 0)
            p = jnp.where(move, sp, jnp.where(stay, p, 0))
            o = jnp.where(move, so - jnp.int16(d),
                          jnp.where(stay, o, jnp.int16(-1)))
            d *= 2
        return p, o

    timed("  compact (fine kernel + coarse XLA)", compact_only, ev,
          iters=args.iters)
    cp, co = jax.block_until_ready(compact_only(ev))

    # fine-kernel-only and coarse-only variants
    @jax.jit
    def compact_fine_only(ev):
        Np = -(-N // W) * W
        valid = ev >= 0
        vi = valid.astype(jnp.int32)
        rank = jnp.cumsum(vi, axis=0) - vi
        pos = jax.lax.broadcasted_iota(jnp.int32, ev.shape, 0)
        o = jnp.where(valid, pos - rank, -1).astype(jnp.int16)
        p = jnp.where(valid, ev, 0)
        if Np > N:
            o = jnp.concatenate([o, jnp.full((Np - N, L), -1, jnp.int16)])
            p = jnp.concatenate([p, jnp.zeros((Np - N, L), jnp.int32)])
        n_win = Np // W
        cur = pl.BlockSpec((W, 128), lambda q, i: (q, i),
                           memory_space=pltpu.VMEM)
        succ = pl.BlockSpec((W, 128),
                            lambda q, i: (jnp.minimum(q + 1, n_win - 1), i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(materialize._fine_compact_kernel, n_win=n_win),
            out_shape=(jax.ShapeDtypeStruct((Np, L), jnp.int32),
                       jax.ShapeDtypeStruct((Np, L), jnp.int16)),
            grid=(n_win, L // 128),
            in_specs=[cur, succ, cur, succ],
            out_specs=(cur, cur),
        )(p, p, o, o)

    timed("  compact fine kernel only", compact_fine_only, ev,
          iters=args.iters)

    # -- spread only, from the compacted output
    @jax.jit
    def spread_only(p, o):
        Np = p.shape[0]
        Mp = -(-M // W) * W
        cvalid = o >= 0
        blk = (p >> 18) & 0x1FFF
        z = (p >> 12) & 63
        val = (p & 0xFFF) - 2048
        pos = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
        o2 = jnp.where(cvalid, blk * 64 + z - pos, -1).astype(jnp.int16)
        v = jnp.where(cvalid, val, 0).astype(jnp.int16)
        if Mp > Np:
            o2 = jnp.concatenate([o2, jnp.full((Mp - Np, L), -1, jnp.int16)])
            v = jnp.concatenate([v, jnp.zeros((Mp - Np, L), jnp.int16)])
        else:
            o2, v = o2[:Mp], v[:Mp]
        d = 1
        while d * 2 < Mp:
            d *= 2
        while d >= W:
            sp = materialize._rolled_down(v, d, jnp.int16(0))
            so = materialize._rolled_down(o2, d, jnp.int16(-1))
            move = so >= d
            stay = (o2 >= 0) & (o2 < d)
            v = jnp.where(move, sp, jnp.where(stay, v, jnp.int16(0)))
            o2 = jnp.where(move, so - jnp.int16(d),
                           jnp.where(stay, o2, jnp.int16(-1)))
            d //= 2
        n_win = Mp // W
        cur = pl.BlockSpec((W, 128), lambda q, i: (q, i),
                           memory_space=pltpu.VMEM)
        pred = pl.BlockSpec((W, 128),
                            lambda q, i: (jnp.maximum(q - 1, 0), i),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            materialize._fine_spread_kernel,
            out_shape=jax.ShapeDtypeStruct((Mp, L), jnp.int16),
            grid=(n_win, L // 128),
            in_specs=[pred, cur, pred, cur],
            out_specs=cur,
        )(o2, o2, v, v)

    timed("  spread (coarse XLA + fine kernel)", spread_only, cp, co,
          iters=args.iters)

    # -- DC cumsum + transpose/reshape overhead
    out16 = jax.block_until_ready(spread_only(cp, co))

    @jax.jit
    def dc_and_layout(coeffs_t):
        per_lane = coeffs_t[:M].astype(jnp.int32).T.reshape(L, max_blk, 64)
        return fsm._resolve_dc(per_lane, tables, max_blk)

    timed("  transpose+reshape+DC cumsum", dc_and_layout, out16,
          iters=args.iters)


if __name__ == "__main__":
    main()
