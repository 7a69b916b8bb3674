"""Event materialization: packed FSM events -> dense coefficient tensor.

The FSM emits per-lane (block, zigzag, value) events in order; turning
them into the dense [lanes, max_blk, 64] coefficient tensor is a stable
compaction followed by a monotone spread (ops/fsm.py docstring).  Both
networks are log-depth passes of shift+select over the full event matrix,
so in plain XLA every pass round-trips HBM — measured at ~40 ms per
32-image chunk (after int16 narrowing) on the v5e, making materialization
the single largest device cost of the decode.

This module adds the Pallas path: each 128-lane tile runs ALL passes of a
network inside VMEM, touching HBM once on the way in and once on the way
out (~28 round-trips -> 1).  Two kernels keep the working set under the
~16 MB VMEM budget:

  * `_compact_kernel`: events int32 [N, 128] -> compacted events, offsets
    carried as int16, validity in the offset sign;
  * `_spread_kernel`: compacted events -> values int16 at rows
    64*block + zigzag of [M, 128].

STATUS (round 2): an opt-in experiment (`TPUJPEG_PALLAS=1`).  On the
real v5e (jax 0.9) Mosaic rejected three building blocks in turn —
rotate on int16 ("Rotate with non-32-bit data"; worked around with
slice+concat shifts), 16-bit iota (worked around via int32+convert), and
finally 16-bit vector comparisons ("Target does not support this
comparison"), whose int32-cast workaround pushes the per-stage working
set past the ~16 MB VMEM budget at production shapes (VMEM quantizes the
lane dimension to 128, so narrower tiles do not shrink the footprint).
The XLA butterflies meanwhile measure near HBM speed after the int16
narrowing (~40 ms/chunk), bounding the achievable win.  The kernels stay
correct in interpret mode (tests/test_materialize.py) as the starting
point for a future Mosaic version; the XLA path is the production one.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

LANE_TILE = 128
_VMEM_BUDGET = 14 * 1024 * 1024  # leave headroom under ~16 MB/core


def _tile_for(N: int, M: int, L: int) -> int | None:
    """Widest lane tile whose working set fits VMEM (None = use XLA path).

    The kernels are HBM-bandwidth-bound, so a narrower tile costs little:
    per-stage compute is far below the VPU roofline either way.
    """
    # Opt-in (TPUJPEG_PALLAS=1): three Mosaic lowering limits were hit on
    # the real v5e (jax 0.9) — 16-bit rotate, 16-bit iota, 16-bit compares
    # — and the int32 workarounds push the per-stage working set past the
    # ~16 MB VMEM budget at production shapes.  The XLA butterflies
    # meanwhile measure near HBM speed (~40 ms/chunk after the int16
    # narrowing), so the ceiling this kernel chases is modest; details in
    # PERFORMANCE.md ("Pallas materialization").
    if not os.environ.get("TPUJPEG_PALLAS"):
        return None
    if jax.default_backend() != "tpu":
        return None
    if N >= 32768 or M >= 32768:
        return None  # int16 offsets are part of the kernel contract
    for tile in (128, 64, 32):
        if L % tile:
            continue
        compact_bytes = N * tile * (4 + 4 + 2 + 2)   # ev/p, shifted, o, so
        spread_bytes = (N * (4 + 2 + 2) + M * (2 + 2 + 2)) * tile
        if max(compact_bytes, spread_bytes) < _VMEM_BUDGET:
            return tile
    return None


def _use_pallas(N: int, M: int, L: int) -> bool:
    return _tile_for(N, M, L) is not None


def _rolled(x, d, fill):
    """Shift rows up by d (rows i <- i+d), filling the tail.

    Implemented as slice+concat (sublane copies): Mosaic's rotate
    instruction only handles 32-bit data, but plain shifts keep the int16
    carries packed, which is what lets the working set fit VMEM.
    """
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[d:], pad])


def _rolled_down(x, d, fill):
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-d]])


def _compact_kernel(ev_ref, out_ref):
    ev = ev_ref[:]                                   # [N, 128] int32
    N = ev.shape[0]
    valid = ev >= 0
    # exclusive prefix sum of `valid` via log-depth doubling (VMEM-local;
    # jnp.cumsum has no reliable Mosaic lowering for this shape)
    rank = valid.astype(jnp.int16)
    d = 1
    while d < N:
        rank = rank + _rolled_down(rank, d, jnp.int16(0))
        d *= 2
    rank = rank - valid.astype(jnp.int16)
    # NB: iota must be materialized as int32 — Mosaic has no 16-bit iota
    pos = jax.lax.broadcasted_iota(jnp.int32, ev.shape, 0).astype(jnp.int16)
    o = jnp.where(valid, pos - rank, jnp.int16(-1))
    p = jnp.where(valid, ev, 0)
    d = 1
    while d < N:
        sp = _rolled(p, d, 0)
        so = _rolled(o, d, jnp.int16(-1))
        move = (so >= 0) & ((so & d) > 0)
        stay = (o >= 0) & ((o & d) == 0)
        p = jnp.where(move, sp, jnp.where(stay, p, 0))
        o = jnp.where(move, so - d, jnp.where(stay, o, jnp.int16(-1)))
        d *= 2
    out_ref[:] = p


def _spread_kernel(cp_ref, out_ref):
    cp = cp_ref[:]                                   # [N, 128] int32 compacted
    N = cp.shape[0]
    M = out_ref.shape[0]
    valid = cp > 0          # valid packed events are >= 1 (value field != 0)
    blk = (cp >> 18) & 0x1FFF
    z = (cp >> 12) & 63
    val = ((cp & 0xFFF) - 2048).astype(jnp.int16)
    pos = jax.lax.broadcasted_iota(jnp.int32, cp.shape, 0)
    o = jnp.where(valid, blk * 64 + z - pos, -1).astype(jnp.int16)
    p = jnp.where(valid, val, jnp.int16(0))
    if M > N:
        pad_o = jnp.full((M - N, cp.shape[1]), -1, jnp.int16)
        pad_p = jnp.zeros((M - N, cp.shape[1]), jnp.int16)
        o = jnp.concatenate([o, pad_o])
        p = jnp.concatenate([p, pad_p])
    else:
        o = o[:M]
        p = p[:M]
    d = 1
    while d * 2 < M:
        d *= 2
    while d >= 1:
        sp = _rolled_down(p, d, jnp.int16(0))
        so = _rolled_down(o, d, jnp.int16(-1))
        move = so >= d
        stay = (o >= 0) & (o < d)
        p = jnp.where(move, sp, jnp.where(stay, p, jnp.int16(0)))
        o = jnp.where(move, so - d, jnp.where(stay, o, jnp.int16(-1)))
        d //= 2
    out_ref[:] = jnp.where(o == 0, p, jnp.int16(0))


@functools.partial(jax.jit, static_argnames=("M", "interpret"))
def place_events_pallas(ev: jnp.ndarray, *, M: int, interpret: bool = False):
    """events int32 [N, L] (-1 = empty) -> values int16 [M, L], Pallas path."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, L = ev.shape
    if interpret:
        tile = min(LANE_TILE, L)
    else:
        tile = _tile_for(N, M, L)
        assert tile is not None, "caller must gate on _use_pallas"
    grid = (L // tile,)
    compacted = pl.pallas_call(
        _compact_kernel,
        out_shape=jax.ShapeDtypeStruct((N, L), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ev)
    return pl.pallas_call(
        _spread_kernel,
        out_shape=jax.ShapeDtypeStruct((M, L), jnp.int16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((M, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(compacted)
