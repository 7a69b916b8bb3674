"""Measure dynamic table-lookup strategies on the actual chip.

VERDICT r1 asked for this measurement: the whole gather-free FSM design
rests on "XLA lowers dynamic gather at ~8-15 ns/element" — measured
through XLA's lowering in round 1, but not through a Pallas kernel with a
VMEM-resident LUT.  This tool times, on whatever backend is active:

  1. XLA jnp.take: [N] random indices into a 64Ki-entry LUT (the 16-bit
     peek decode shape);
  2. XLA jnp.take into a 256-entry LUT (the symbol-map shape);
  3. a Pallas kernel doing the same lookup with the LUT and indices in
     VMEM (does Mosaic lower a vector gather better than XLA?);
  4. a Pallas kernel chaining DEPENDENT scalar lookups through SMEM (the
     shape of a serial per-segment decoder: next index depends on the
     previous value);
  5. one-hot matmul "gather" via the MXU for a 256-entry table (the
     arithmetic alternative the FSM's select trees compete against);
  6. large-row gather: jnp.take of whole [blk, 64] rows (the lane-
     permutation cost for length-sorted packing).

Prints ns/lookup for each.  Results land in PERFORMANCE.md.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpujpeg-jax-cache")
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fence(x):
    import jax

    np.asarray(jax.device_get(x.ravel()[:1]))


def timed(label, fn, n_lookups, iters=5):
    fn()
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        _fence(fn())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:<52s} {best * 1e3:9.3f} ms  "
          f"{best / n_lookups * 1e9:8.2f} ns/lookup")
    return best


def main():
    import jax
    import jax.numpy as jnp

    print(f"platform={jax.devices()[0].platform}")
    rng = np.random.default_rng(0)
    N = 1 << 20  # 1M lookups

    lut64k = jnp.asarray(rng.integers(0, 255, 1 << 16, np.int32))
    lut256 = jnp.asarray(rng.integers(0, 255, 256, np.int32))
    idx64k = jnp.asarray(rng.integers(0, 1 << 16, N).astype(np.int32))
    idx256 = jnp.asarray(rng.integers(0, 256, N).astype(np.int32))

    take = jax.jit(lambda t, i: jnp.take(t, i))
    timed("XLA take, 64Ki LUT, 1M independent", lambda: take(lut64k, idx64k), N)
    timed("XLA take, 256 LUT, 1M independent", lambda: take(lut256, idx256), N)

    # one-hot matmul gather (MXU)
    @jax.jit
    def onehot_gather(t, i):
        oh = (i[:, None] == jnp.arange(256)[None, :]).astype(jnp.float32)
        return (oh @ t.astype(jnp.float32)).astype(jnp.int32)

    timed("MXU one-hot matmul, 256 LUT, 1M independent",
          lambda: onehot_gather(lut256, idx256), N)

    # large-row gather (lane permutation shape)
    rows = jnp.asarray(rng.integers(-1000, 1000, (2560, 256 * 64), np.int32))
    perm = jnp.asarray(rng.permutation(2560).astype(np.int32))
    rowtake = jax.jit(lambda r, p: jnp.take(r, p, axis=0))
    timed("XLA take, 2560 rows x 64KiB (lane permutation)",
          lambda: rowtake(rows, perm), 2560)

    # medium-row gather (the fsm-spec ragged-assemble shape): 2^20 rows
    # of 64 int32 (256 B) — decides whether spec coefficients can stay
    # on device via an index gather instead of a host round-trip
    rows64 = jnp.asarray(rng.integers(-1000, 1000, (1 << 20, 64), np.int32))
    perm64 = jnp.asarray(rng.permutation(rows64.shape[0]).astype(np.int32))
    timed("XLA take, 1M rows x 256 B (spec assemble)",
          lambda: rowtake(rows64, perm64), rows64.shape[0])

    # per-row gather: Mosaic reports "Only 2D gather is supported", so
    # probe take_along_axis over a row-replicated LUT — if this lowers to
    # a real vector gather it would beat the FSM's select trees.
    R, K = 1024, 1024  # 1M lookups as [R, K] rows into [R, 256] tables
    tbl2d = jnp.asarray(
        np.broadcast_to(rng.integers(0, 255, 256, np.int32), (R, 256)).copy()
    )
    idx2d = jnp.asarray(rng.integers(0, 256, (R, K)).astype(np.int32))
    taa = jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=1))
    timed("XLA take_along_axis, [1024,256] tables, 1M",
          lambda: taa(tbl2d, idx2d), R * K)

    # Pallas experiments
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def vkernel2(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

        @jax.jit
        def pallas_taa(t, i):
            return pl.pallas_call(
                vkernel2,
                out_shape=jax.ShapeDtypeStruct(i.shape, jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)

        try:
            timed("Pallas VMEM take_along_axis, [1024,256], 1M",
                  lambda: pallas_taa(tbl2d, idx2d), R * K)
        except Exception as e:  # noqa: BLE001
            print(f"Pallas take_along_axis: FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}")

        def vkernel(t_ref, i_ref, o_ref):
            o_ref[:] = jnp.take(t_ref[:], i_ref[:])

        @jax.jit
        def pallas_vec(t, i):
            return pl.pallas_call(
                vkernel,
                out_shape=jax.ShapeDtypeStruct(i.shape, jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(t, i)

        try:
            Nv = 1 << 18  # keep VMEM modest
            timed("Pallas VMEM vector take, 256 LUT, 256K ind.",
                  lambda: pallas_vec(lut256, idx256[:Nv]), Nv)
        except Exception as e:  # noqa: BLE001
            print(f"Pallas vector take: FAILED to lower/run: {type(e).__name__}: "
                  f"{str(e)[:160]}")

        # dependent scalar chain in SMEM (serial decoder shape)
        CHAIN = 4096

        def skernel(t_ref, s_ref, o_ref):
            def body(k, idx):
                return (t_ref[idx, 0] * 7 + 1) % 4096

            out = jax.lax.fori_loop(0, CHAIN, body, s_ref[0])
            o_ref[0] = out

        @jax.jit
        def pallas_chain(t, s):
            return pl.pallas_call(
                skernel,
                out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            )(t, s)

        tbl = jnp.asarray(rng.integers(0, 4096, (4096, 1), np.int32))
        seed = jnp.asarray([3], jnp.int32)
        try:
            timed(f"Pallas dependent scalar chain ({CHAIN} lookups)",
                  lambda: pallas_chain(tbl, seed), CHAIN)
        except Exception as e:  # noqa: BLE001
            print(f"Pallas scalar chain: FAILED to lower/run: {type(e).__name__}: "
                  f"{str(e)[:160]}")
    except ImportError as e:
        print("pallas unavailable:", e)


if __name__ == "__main__":
    main()
