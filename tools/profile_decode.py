"""Stage-level device profiling for the FSM decode path.

Answers, with wall-clock on the real chip (or CPU), where a chunk's device
time actually goes — dispatch floor, FSM scan, butterflies, DC cumsum,
assemble, pixel program — and how the scan scales with lanes (latency- vs
throughput-bound).  Every timing fences on fetching real output elements
(axon's block_until_ready lies; CLAUDE.md).

Usage: python tools/profile_decode.py [--images 32] [--size 640] [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpujpeg-jax-cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np


def _fence(x) -> None:
    import jax

    arr = x
    while isinstance(arr, (tuple, list)):
        arr = arr[0]
    np.asarray(jax.device_get(arr.ravel()[:1]))


def timed(label, fn, *args, iters=3, fetch=None, bytes_note=None):
    fn(*args)  # warm/compile
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _fence(out if fetch is None else fetch(out))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    note = f"  [{bytes_note}]" if bytes_note else ""
    print(f"{label:<44s} {best * 1e3:9.2f} ms{note}")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--rst-rows", type=int, default=1)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--materialize", action="store_true",
                    help="profile place_events_v3 sub-stage marginals")
    ap.add_argument("--no-split", action="store_true",
                    help="single-group lane packing (min device time)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _encode, _make_image
    from tpujpeg.io.parser import parse
    from tpujpeg.ops import fsm
    from tpujpeg.pipeline import Geometry
    from tpujpeg.parallel import sharding

    print(f"platform={jax.devices()[0].platform} images={args.images} "
          f"size={args.size} rst_rows={args.rst_rows}")

    datas = [
        _encode(_make_image(args.size, i), args.quality, args.rst_rows)
        for i in range(args.images)
    ]
    t0 = time.perf_counter()
    imgs = [parse(d) for d in datas]
    print(f"{'host: parse+destuff (serial)':<44s} "
          f"{(time.perf_counter() - t0) * 1e3:9.2f} ms")
    t0 = time.perf_counter()
    plan = fsm.build_plan(imgs, split=not args.no_split)
    print(f"{'host: fsm.build_plan':<44s} "
          f"{(time.perf_counter() - t0) * 1e3:9.2f} ms")
    geom = Geometry.of(imgs[0])
    comp = sum(len(d) for d in datas)
    shapes = " + ".join(f"[{xs.shape[0]}x{xs.shape[1]}]" for xs, _ in plan.groups)
    print(f"groups={shapes} max_blk={plan.max_blk} "
          f"compressed={comp/1e6:.2f} MB n_blocks/img={geom.n_blocks} "
          f"upload={sum(xs.nbytes for xs, _ in plan.groups)/1e6:.1f} MB")

    xs = jnp.asarray(plan.groups[0][0])
    snb = jnp.asarray(plan.groups[0][1])
    L = xs.shape[0]

    # -- dispatch floor: trivial program round trip
    trivial = jax.jit(lambda a: a.sum())
    timed("dispatch+fetch floor (scalar sum)", trivial, xs, iters=args.iters)

    # -- FSM scan only (events + state, no butterflies)
    @functools.partial(jax.jit, static_argnames=("tables",))
    def scan_only(xs, snb, *, tables):
        # xs is row-major [L, stride]; the scan wants byte columns
        events, (em, ee), st = fsm._fsm_scan(xs.T, snb, tables)
        return events[-1, 0], em, st[4]

    timed("fsm scan only", functools.partial(scan_only, tables=plan.tables),
          xs, snb, iters=args.iters)

    # -- scan with an 8x narrower lane matrix (latency vs throughput probe)
    xs8 = xs[: max(128, L // 8)]
    snb8 = snb[: max(128, L // 8)]
    timed(f"fsm scan only (lanes={xs8.shape[0]})",
          functools.partial(scan_only, tables=plan.tables),
          xs8, snb8, iters=args.iters)

    # -- full _decode_jit on group 0 (scan + butterflies + DC cumsum)
    dec = functools.partial(
        fsm._decode_jit, tables=plan.tables, max_blk=plan.max_blk
    )
    timed("fsm._decode_jit grp0 (scan+butterfl+cumsum)", dec, xs, snb,
          iters=args.iters)

    # -- full decode_plan: all groups + un-shuffle gather
    uploaded = fsm.upload_plan(plan)
    timed("fsm.decode_plan (all groups + unshuffle)",
          lambda: fsm.decode_plan(plan, uploaded=uploaded), iters=args.iters)

    per_lane, errs = fsm.decode_plan(plan, uploaded=uploaded)

    # -- device assemble
    B = args.images
    asm = functools.partial(
        fsm.assemble_batched, layout=plan.layout, pad_to=B
    )
    timed("assemble_batched", asm, per_lane, iters=args.iters)
    coeffs = asm(per_lane).reshape(B, geom.n_blocks, 64)

    # -- pixel program
    mesh = sharding.make_mesh(n_stripe=1)
    quant = np.zeros((B, len(geom.comps), 64), np.int32)
    for bi, img in enumerate(imgs):
        quant[bi] = np.stack(
            [img.quant_tables[c.quant_id] for c in img.components]
        )
    fn = sharding.compiled_batch_decoder(geom, mesh)
    qd = jnp.asarray(quant)
    timed("pixel program (dequant+idct+color)", fn, coeffs, qd,
          iters=args.iters)

    # -- whole chain, separate dispatches (the engine's current shape)
    def chain(qd):
        pl, errs = fsm.decode_plan(plan, uploaded=uploaded)
        cf = asm(pl).reshape(B, geom.n_blocks, 64)
        return fn(cf, qd)

    timed("chain: decode_plan+asm+pixels", chain, qd,
          iters=args.iters, fetch=lambda o: o[0])

    # -- fused single-program chunk (runtime/fused.py): the engine's
    # production shape on a 1-device mesh with single-group plans
    if len(plan.groups) == 1:
        from tpujpeg.runtime import fused

        def fchain(qd):
            return fused.decode_chunk_fused(
                plan, qd, geom, B, uploaded=(xs, snb), want_coeffs=False
            )

        timed("fused single-program chunk", fchain, qd,
              iters=args.iters, fetch=lambda o: o[0])

    # -- marginal cost of extra chunks in flight: dispatch N independent
    # chains back-to-back, fence once.  If the ~30 ms dispatch floor
    # amortizes, marginal cost per chunk ≈ real compute only.
    use_fused = len(plan.groups) == 1
    def chain_n(n):
        outs = [(fchain if use_fused else chain)(qd) for _ in range(n)]
        return outs[-1]

    t1 = timed("chain x1 (fence once)", lambda: chain_n(1),
               iters=args.iters, fetch=lambda o: o[0])
    t2 = timed("chain x2 (fence once)", lambda: chain_n(2),
               iters=args.iters, fetch=lambda o: o[0])
    t4 = timed("chain x4 (fence once)", lambda: chain_n(4),
               iters=args.iters, fetch=lambda o: o[0])
    print(f"{'marginal per extra chunk (x2, x4)':<44s} "
          f"{(t2 - t1) * 1e3:7.2f} / {(t4 - t2) / 2 * 1e3:7.2f} ms")

    # -- marginal per-stage real costs: the single-dispatch readings above
    # carry a ±10 ms floor swing (shared tunnel); dispatching N copies of
    # ONE stage back-to-back and fencing once isolates its real compute
    # ((x4 - x1) / 3, the same method the chunk-marginal uses).
    def stage_marginal(label, call, fetch=None):
        def run_n(n):
            outs = [call() for _ in range(n)]
            return outs[-1]
        # quiet warm + un-printed x1/x4 (keep the log compact)
        run_n(1)
        def best_of(n):
            best = None
            for _ in range(args.iters):
                t0 = time.perf_counter()
                out = run_n(n)
                _fence(out if fetch is None else fetch(out))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best
        t1, t4 = best_of(1), best_of(4)
        print(f"{label + ' (marginal, x4-x1/3)':<44s} "
              f"{(t4 - t1) / 3 * 1e3:9.2f} ms")

    scan_fn = functools.partial(scan_only, tables=plan.tables)
    stage_marginal("fsm scan only", lambda: scan_fn(xs, snb))
    stage_marginal("fsm._decode_jit grp0", lambda: dec(xs, snb))
    stage_marginal("assemble_batched", lambda: asm(per_lane))
    stage_marginal("pixel program", lambda: fn(coeffs, qd),
                   fetch=lambda o: o[0])

    # -- materialize sub-stages (--materialize): cumulative cuts through
    # place_events_v3 on the REAL event matrix; consecutive differences
    # give each stage's marginal cost
    if args.materialize:
        from tpujpeg.ops import materialize

        @functools.partial(jax.jit, static_argnames=("tables",))
        def scan_events(xs, snb, *, tables):
            events, _, _ = fsm._fsm_scan(xs.T, snb, tables)
            stride, S, L = events.shape
            return events.reshape(stride * S, L)

        ev = jax.block_until_ready(
            functools.partial(scan_events, tables=plan.tables)(xs, snb)
        )
        M = plan.max_blk * 64
        print(f"materialize: ev {ev.shape} -> M={M}")
        for cut in ("init", "compact_fine", "compact", "unpack",
                    "spread_coarse", None):
            pe = functools.partial(
                materialize.place_events_v3, M=M, stop_after=cut
            )
            stage_marginal(f"place_events_v3 [{cut or 'full'}]",
                           lambda pe=pe: pe(ev),
                           fetch=lambda o: o[0] if isinstance(o, tuple) else o)

    # -- upload cost for the scan bytes (all groups)
    hosts = [np.asarray(g[0]) for g in plan.groups]
    nbytes = sum(h.nbytes for h in hosts)
    timed(f"upload scan bytes ({nbytes/1e6:.1f} MB)",
          lambda: [jax.device_put(h) for h in hosts], iters=args.iters,
          fetch=lambda o: o[0])


if __name__ == "__main__":
    main()
