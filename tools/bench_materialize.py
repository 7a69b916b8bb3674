"""Butterfly materialization strategies on the actual chip.

Times, at the production chunk shape (N event slots x L lanes -> M x L
dense coefficients), the XLA butterfly networks vs the comparison-free
windowed Pallas v3 path (ops/materialize.py), checking exact agreement.
Also breaks the pixel program into sub-stages (dequant+zigzag, IDCT,
block->raster, color) to locate its ~25 ms of real device time.

Usage: python tools/bench_materialize.py [--lanes 2560] [--stride 2560]
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

import numpy as np


def _fence(x):
    import jax

    arr = x
    while isinstance(arr, (tuple, list)):
        arr = arr[0]
    np.asarray(jax.device_get(arr.ravel()[:1]))


def timed(label, fn, *args, iters=3):
    try:
        fn(*args)
    except Exception as e:  # noqa: BLE001
        print(f"{label:<46s}   FAILED: {type(e).__name__}: {str(e)[:120]}")
        return None
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _fence(out)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:<46s} {best * 1e3:9.2f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=2560)
    ap.add_argument("--stride", type=int, default=2560)
    ap.add_argument("--max-blk", type=int, default=256)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from tpujpeg.ops import fsm, materialize

    L, K = args.lanes, fsm._steps_spec(fsm.STEPS_PRODUCTION)[1]
    N = args.stride * K
    M = args.max_blk * 64
    print(f"platform={jax.devices()[0].platform} N={N} L={L} M={M} "
          f"pallas_v3_eligible={materialize._use_pallas_v3(N, M, L)}")

    rng = np.random.default_rng(1)
    ev_np = np.full((N, L), -1, np.int32)
    for lane in range(L):
        n = int(rng.integers(M // 32, min(N, M) - 1))
        t = np.sort(rng.choice(M, size=n, replace=False))
        slots = np.sort(rng.choice(N, size=n, replace=False))
        vals = rng.integers(-2048, 2048, n)
        vals[vals == 0] = 1
        ev_np[slots, lane] = ((t // 64) << 18) | ((t % 64) << 12) | (vals + 2048)
    ev = jnp.asarray(ev_np)

    @jax.jit
    def xla_place(ev):
        valid = ev >= 0
        cv, cp = fsm._compact(valid, ev)
        blk = (cp >> 18) & 0x1FFF
        z = (cp >> 12) & 63
        val = (cp & 0xFFF) - 2048
        return fsm._spread(cv, val, blk * 64 + z, M)

    @jax.jit
    def xla_compact_only(ev):
        return fsm._compact(ev >= 0, ev)[1]

    t_xla = timed("XLA compact+spread", xla_place, ev, iters=args.iters)
    timed("XLA compact only", xla_compact_only, ev, iters=args.iters)
    v3 = functools.partial(materialize.place_events_v3, M=M)
    t_v3 = timed("Pallas v3 compact+spread", v3, ev, iters=args.iters)
    if t_xla and t_v3:
        ref = np.asarray(xla_place(ev))
        got = np.asarray(v3(ev)).astype(np.int32)
        print(f"{'v3 == XLA (device)':<46s} {np.array_equal(ref, got)}")

    # ---- pixel program sub-stages at the 32x640^2 batch shape
    from tpujpeg.ops.color import pack_mask, ycbcr_to_rgb
    from tpujpeg.ops.idct import idct_blocks
    from tpujpeg.constants import ZIGZAG_TO_NATURAL

    B, n_blocks = 32, 19200
    mcus_x = mcus_y = 80
    coeffs = jnp.asarray(
        rng.integers(-512, 512, (B, n_blocks, 64)).astype(np.int32)
    )
    quant = jnp.asarray(rng.integers(1, 64, (B, 3, 64)).astype(np.int32))
    pattern = jnp.asarray(np.tile(np.arange(3, dtype=np.int32), n_blocks // 3))

    @jax.jit
    def stage_deq(coeffs, quant):
        bq = jax.vmap(lambda q: jnp.take(q, pattern, axis=0))(quant)
        deq = coeffs * bq
        return jnp.take(deq, jnp.asarray(ZIGZAG_TO_NATURAL), axis=2)

    @jax.jit
    def stage_idct(nat):
        return idct_blocks(nat.reshape(B, n_blocks, 8, 8))

    @jax.jit
    def stage_raster(pix):
        blocks = pix.reshape(B, mcus_y * mcus_x, 3, 8, 8)
        planes = []
        for c in range(3):
            grid = blocks[:, :, c].reshape(B, mcus_y, mcus_x, 8, 8)
            planes.append(
                grid.transpose(0, 1, 3, 2, 4).reshape(B, mcus_y * 8, mcus_x * 8)
            )
        return planes

    @jax.jit
    def stage_color(planes):
        rgb, risky = jax.vmap(ycbcr_to_rgb)(*planes)
        return rgb, jax.vmap(pack_mask)(risky)

    @jax.jit
    def pixels_all(coeffs, quant):
        return stage_color(stage_raster(stage_idct(stage_deq(coeffs, quant))))

    nat = stage_deq(coeffs, quant)
    pix = stage_idct(nat)
    planes = stage_raster(pix)
    timed("pixel: dequant+zigzag", stage_deq, coeffs, quant, iters=args.iters)
    timed("pixel: idct", stage_idct, nat, iters=args.iters)
    timed("pixel: block->raster", stage_raster, pix, iters=args.iters)
    timed("pixel: color+mask", stage_color, planes, iters=args.iters)
    timed("pixel: all fused", pixels_all, coeffs, quant, iters=args.iters)


if __name__ == "__main__":
    main()
