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

STATUS (round 3+): the **v3 windowed kernels below (`place_events_v3`,
line ~400) are the PRODUCTION DEFAULT on TPU** (`TPUJPEG_PALLAS_V3`
defaults on; measured `_decode_jit` 80 -> 37 ms/chunk on the v5e,
PERFORMANCE.md).  v3 runs the fine butterfly stages (d < W=1024)
VMEM-resident on [2W, 128] window stacks with int32 in-kernel compute +
int16 HBM storage; the ~3 coarse stages (d >= W) stay XLA.

The v1 full-height kernels in the first half of this file remain an
opt-in experiment (`TPUJPEG_PALLAS=1`), kept because they document the
Mosaic lowering limits that shaped v3: on the real v5e (jax 0.9) Mosaic
rejected rotate on int16 ("Rotate with non-32-bit data"; worked around
with slice+concat shifts), 16-bit iota (worked around via
int32+convert), and 16-bit vector comparisons ("Target does not support
this comparison"), whose int32-cast workaround pushes v1's full-height
working set past the ~16 MB VMEM budget at production shapes (VMEM
quantizes the lane dimension to 128, so narrower tiles do not shrink
the footprint) — hence v3's windowing.  Both kernel families are diffed
bit-for-bit against the XLA butterflies (tests/test_materialize.py).
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


# ---------------------------------------------------------------------------
# v3: windowed kernels, int16 storage + int32 in-kernel compute
# ---------------------------------------------------------------------------
#
# Probing the chip (round 2) pinned down Mosaic's int16 vector support on
# this stack (jax 0.9, v5e): ONLY add / and / or / xor / not and the
# int16<->int32 converts lower; every shift (shrsi/shrui/shli), sub, mul,
# min/max, compare and select on int16 fails to legalize.  So v2's
# "comparison-free int16 arithmetic" design cannot lower, and full-size
# int32 blocks blow the ~16 MB VMEM budget (a [7680, 128] int32 plane is
# 3.9 MB and a routing stage keeps ~5 live).
#
# v3 resolves the bind with WINDOWING, exploiting that butterfly routing
# is local at small distances:
#   * compact stages d < W move entries UP by < W rows total, so they run
#     VMEM-resident per (window, lane-tile) on a [2W, tile] stack of the
#     window and its SUCCESSOR, int32 in-register ([2W=2048, 128] int32 is
#     1 MB/plane — comfortable); the few stages d >= W (3 at production
#     shapes) run in XLA over the HBM matrix;
#   * spread mirrors it: coarse stages d >= W in XLA bring every entry
#     within W rows of its target, then stages d < W run on a stack of
#     the window and its PREDECESSOR (entries move DOWN).
# Masked-roll routing is per-entry self-determined (an entry's path
# depends only on its own offset bits), so restricting a network to the
# stack is a faithful sub-network of the proven global one
# (ops/fsm.py _compact/_spread); collision-freeness at every intermediate
# stage means each window's rows are well-defined mid-network.
# HBM round-trips: ~26 XLA passes -> ~7 XLA passes + 2 Pallas kernels.

# Window rows for the fine (VMEM-resident) stages.  Bigger windows move
# coarse (full-HBM-pass) stages into VMEM at the cost of VMEM pressure;
# env-tunable for A/B on real chips (jit caches key on traced shapes, so
# changing this mid-process after tracing would be ignored — set it before
# the first decode).
_W = int(os.environ.get("TPUJPEG_PALLAS_W", "1024"))


def _scalar_mask(cond_i32):
    """all-ones int32 where the scalar condition (0/1 int32) holds."""
    return jnp.int32(0) - cond_i32


def _fine_compact_rank_kernel(*refs, n_win: int, kc: int):
    """Fine compact with IN-KERNEL rank computation.

    Same routing as `_fine_compact_kernel`, but takes the RAW event
    stack (window + kc successors) plus one scalar row of window-base
    ranks and derives the initial offsets itself: for any stack row r,
    global_rank(r) = w_base[q] + rank_within_stack(r) — the stack-local
    exclusive prefix already accounts for the full windows between q and
    r's window, so ONE base row serves the whole stack.  This removes
    the XLA init pass (a full-matrix cumsum + a 220 MB p/o round-trip,
    measured 4.8 ms of the 25 ms materialize budget on the v5e) at the
    cost of ~11 int16 doubling stages in VMEM.
    """
    from jax.experimental import pallas as pl

    ev_refs = refs[: kc + 1]
    base_ref, p_out, o_out = refs[kc + 1], refs[kc + 2], refs[kc + 3]
    # base_ref holds ALL window base rows [n_win, tile] (a (1, tile)
    # block would violate Mosaic's 8-sublane block quantum); select this
    # window's row with a dynamic sublane slice
    from jax.experimental import pallas as _pl
    ev = jnp.concatenate([r[:] for r in ev_refs])        # [(kc+1)W, t] int32
    H = ev.shape[0]
    W = H // (kc + 1)
    D = kc * W
    shift = W.bit_length() - 1
    q = pl.program_id(0)
    pos = jax.lax.broadcasted_iota(jnp.int32, ev.shape, 0)
    # ghost rows: clamped successor windows past the last real window
    # must not contribute to ranks or emit entries
    ghost = ~(((q + (pos >> shift)) - n_win) >> 31)
    valid = (ev >= 0) & (ghost == 0)
    # stack-local exclusive prefix count of valid rows (int16 doubling;
    # counts are bounded by the stack height << 32768)
    rank = valid.astype(jnp.int16)
    d = 1
    while d < H:
        rank = rank + _rolled_down(rank, d, jnp.int16(0))
        d *= 2
    # int16 SUB does not lower on this stack (only add/and/or/xor/not);
    # widen before the exclusive-prefix adjustment
    rank = rank.astype(jnp.int32) - valid.astype(jnp.int32)
    # global offset: stack row r sits at global position q*W + r and has
    # global rank w_base[q] + rank(r), so o = q*W + r - w_base[q] - rank.
    # base_ref carries the PRE-ADJUSTED w_base[q] - q*W (see caller), so
    # the kernel needs no q*W term of its own.
    base = base_ref[_pl.dslice(q, 1), :]                 # [1, t] int32
    o = jnp.where(valid, pos - rank - base, -1)
    p = jnp.where(valid, ev, 0)
    exit_local = pos - (o & (D - 1))
    keep = (o >= 0) & (exit_local >= 0) & (exit_local < W) & valid
    o = jnp.where(keep, o, -1)
    p = jnp.where(keep, p, 0)
    d = 1
    while d < D:
        sp = _rolled(p, d, 0)
        so = _rolled(o, d, -1)
        move = (so >= 0) & ((so & d) > 0)
        stay = (o >= 0) & ((o & d) == 0)
        p = jnp.where(move, sp, jnp.where(stay, p, 0))
        o = jnp.where(move, so - d, jnp.where(stay, o, -1))
        d *= 2
    p_out[:] = p[:W]
    o_out[:] = o[:W].astype(jnp.int16)


def _fine_compact_kernel(*refs, n_win: int, kc: int):
    """Compact stages d < kc*W on a [(kc+1)W, tile] stack (window + kc
    successors).

    Entries move UP by (offset & (kc*W - 1)) < kc*W during these stages,
    so every entry whose mid-network position lands in window q starts in
    the stack; the keep mask drops the rest (they are produced by their
    own window's grid cell).  Clamped successors past the LAST window are
    duplicates and are ghost-masked.  kc=1 is the round-2 two-ref kernel;
    larger spans trade VMEM for coarse XLA passes (each +1 of kc removes
    one full-matrix HBM round-trip from the compact network).
    """
    from jax.experimental import pallas as pl

    p_refs, o_refs = refs[: kc + 1], refs[kc + 1 : 2 * (kc + 1)]
    p_out, o_out = refs[2 * (kc + 1)], refs[2 * (kc + 1) + 1]
    p = jnp.concatenate([r[:] for r in p_refs])          # [(kc+1)W, t] int32
    o = jnp.concatenate([r[:] for r in o_refs]).astype(jnp.int32)
    H = o.shape[0]
    W = H // (kc + 1)
    D = kc * W
    shift = W.bit_length() - 1
    q = pl.program_id(0)
    pos = jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
    # a stack row is a ghost when its source window q + pos//W clamped
    ghost = ~(((q + (pos >> shift)) - n_win) >> 31)
    exit_local = pos - (o & (D - 1))
    keep = (o >= 0) & (exit_local >= 0) & (exit_local < W) & (ghost == 0)
    o = jnp.where(keep, o, -1)
    p = jnp.where(keep, p, 0)
    d = 1
    while d < D:
        sp = _rolled(p, d, 0)
        so = _rolled(o, d, -1)
        move = (so >= 0) & ((so & d) > 0)
        stay = (o >= 0) & ((o & d) == 0)
        p = jnp.where(move, sp, jnp.where(stay, p, 0))
        o = jnp.where(move, so - d, jnp.where(stay, o, -1))
        d *= 2
    p_out[:] = p[:W]
    o_out[:] = o[:W].astype(jnp.int16)


def _fine_spread_kernel(*refs, kc: int):
    """Spread stages d < kc*W on a [(kc+1)W, tile] stack (kc predecessors
    + window).

    Coarse XLA stages ran down to d = kc*W, so every remaining offset is
    < kc*W and entries move DOWN by < kc*W rows: window q's coefficients
    come from the stack.  Clamped predecessor duplicates below window 0
    are ghost-masked.
    """
    from jax.experimental import pallas as pl

    o_refs, v_refs = refs[: kc + 1], refs[kc + 1 : 2 * (kc + 1)]
    out_ref = refs[2 * (kc + 1)]
    o = jnp.concatenate([r[:] for r in o_refs]).astype(jnp.int32)
    p = jnp.concatenate([r[:] for r in v_refs]).astype(jnp.int32)
    H = o.shape[0]
    W = H // (kc + 1)
    D = kc * W
    shift = W.bit_length() - 1
    q = pl.program_id(0)
    pos = jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
    # stack row r comes from window q - kc + r//W; negative => ghost
    ghost = (q - kc + (pos >> shift)) >> 31
    land = pos + o                                       # stack frame target
    keep = (o >= 0) & (land >= D) & (land < D + W) & (ghost == 0)
    o = jnp.where(keep, o, -1)
    p = jnp.where(keep, p, 0)
    d = D // 2
    while d >= 1:
        sp = _rolled_down(p, d, 0)
        so = _rolled_down(o, d, -1)
        move = so >= d
        stay = (o >= 0) & (o < d)
        p = jnp.where(move, sp, jnp.where(stay, p, 0))
        o = jnp.where(move, so - d, jnp.where(stay, o, -1))
        d //= 2
    out_ref[:] = jnp.where(o == 0, p, 0)[D:].astype(jnp.int16)


# Stack span: the fine kernels run all stages d < _KC*_W on a
# [(KC+1)W, tile] stack.  Each +1 of span removes one coarse XLA pass
# (a full-matrix HBM round-trip) from EACH network at the cost of
# (2 live int32 stack arrays + staged refs) more VMEM; the working set
# is ~(2.75*(KC+1) + 1) MB at W=1024/tile=128.  Default 1 (the proven
# round-2 shape) until the larger spans are validated on a real chip —
# Mosaic VMEM accounting is the risk, not correctness (interpret-mode
# tests cover KC=2/3 explicitly).
_KC = int(os.environ.get("TPUJPEG_PALLAS_KC", "1"))

# Spread-side stack span.  The v5e A/B (PERFORMANCE.md, r3) split the
# verdict by network: a wider COMPACT span loses (the rank+routing
# kernel's extra stack reads cost more than the saved coarse XLA pass)
# while a wider SPREAD span wins (its kernel is int16-in, lighter per
# window) — so the spans are independent, compact at _KC=1 and spread
# at _KS=2 by default.
_KS = int(os.environ.get("TPUJPEG_PALLAS_KS", "2"))

# Rank-in-kernel fine compact (default on): the initial offsets are
# derived inside the Pallas kernel from per-window base counts instead
# of a full-matrix XLA cumsum; TPUJPEG_RANK_KERNEL=0 reverts for A/B.
_RANK_KERNEL = os.environ.get("TPUJPEG_RANK_KERNEL", "1") == "1"


def _span_for(n_win: int, kc: int | None = None, default: int = None) -> int:
    """Clamp the span to a power of two (the in-kernel stage mask
    `o & (kc*W - 1)` needs contiguous bits) that fits the window count."""
    if default is None:
        default = _KC
    k = max(1, min(default if kc is None else kc, n_win - 1))
    p = 1
    while p * 2 <= k:
        p *= 2
    return p


def _use_pallas_v3(N: int, M: int, L: int) -> bool:
    if os.environ.get("TPUJPEG_PALLAS_V3", "1") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    Np = -(-N // _W) * _W
    Mp = -(-M // _W) * _W
    # int16 offsets bound both spaces (an offset reaches at most
    # Np-1 / Mp-1 = 32767, exactly int16 max, so <= not <); lane dim
    # must tile by 128; the windowed kernels need two windows each.
    # Keeping the gate as wide as int16 allows matters beyond speed:
    # the fall-back XLA butterflies fused behind the scan have a real
    # XLA:TPU miscompile at some shapes (fsm._decode_jit note), which
    # the Pallas call structure avoids.
    return (
        Np <= 32768 and Mp <= 32768
        and L % LANE_TILE == 0
        and Np >= 2 * _W and Mp >= 2 * _W
    )


@functools.partial(
    jax.jit, static_argnames=("M", "interpret", "kc", "stop_after")
)
def place_events_v3(ev: jnp.ndarray, *, M: int, interpret: bool = False,
                    kc: int | None = None, stop_after: str | None = None):
    """events int32 [N, L] (-1 = empty) -> values int16 [M, L].

    Windowed Pallas compact + spread (fine stages VMEM-resident, coarse
    stages XLA); bit-exact vs the XLA butterflies
    (tests/test_materialize.py).  `kc` widens the in-kernel stage span
    (see _KC); None uses the env default.

    stop_after: profiling hook (tools/profile_decode.py --materialize):
    'init' | 'compact_fine' | 'compact' | 'unpack' | 'spread_coarse'
    return the intermediates at that cut so each stage's marginal cost
    can be measured on a real chip; None (production) runs everything.
    """
    from jax.experimental import pallas as pl

    N, L = ev.shape
    W = _W
    tile = min(LANE_TILE, L)
    Mp = -(-M // W) * W

    res = _compact_to_rank(ev, interpret=interpret, kc=kc,
                           stop_after=stop_after)
    if stop_after in ("init", "compact_fine", "compact"):
        return res
    p, o = res
    Np = p.shape[0]

    # unpack compacted events -> spread offsets/values (int16)
    cvalid = o >= 0
    blk = (p >> 18) & 0x1FFF
    z = (p >> 12) & 63
    val = (p & 0xFFF) - 2048
    pos = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    o2 = jnp.where(cvalid, blk * 64 + z - pos, -1).astype(jnp.int16)
    v = jnp.where(cvalid, val, 0).astype(jnp.int16)

    def fit(x, fill):
        if Mp > Np:
            pad = jnp.full((Mp - Np, L), fill, x.dtype)
            return jnp.concatenate([x, pad])
        # compacted rank r has target >= r, so rows >= Mp hold no entries
        return x[:Mp]

    o2, v = fit(o2, jnp.int16(-1)), fit(v, jnp.int16(0))
    if stop_after == "unpack":
        return o2, v

    # coarse spread stages (d >= kc*W), XLA
    n_win_s = Mp // W
    k_s = _span_for(n_win_s, kc, default=_KS)
    d = 1
    while d * 2 < Mp:
        d *= 2
    while d >= k_s * W:
        sp = _rolled_down(v, d, jnp.int16(0))
        so = _rolled_down(o2, d, jnp.int16(-1))
        move = so >= d
        stay = (o2 >= 0) & (o2 < d)
        v = jnp.where(move, sp, jnp.where(stay, v, jnp.int16(0)))
        o2 = jnp.where(move, so - jnp.int16(d),
                       jnp.where(stay, o2, jnp.int16(-1)))
        d //= 2

    if stop_after == "spread_coarse":
        return o2, v
    # fine spread stages (d < kc*W), Pallas
    from jax.experimental.pallas import tpu as pltpu

    cur_s = pl.BlockSpec((W, tile), lambda q, i: (q, i),
                         memory_space=pltpu.VMEM)
    preds = [
        pl.BlockSpec((W, tile),
                     (lambda j: lambda q, i: (
                         jnp.maximum(q - j, 0), i))(j),
                     memory_space=pltpu.VMEM)
        for j in range(k_s, 0, -1)
    ]
    stack_s = preds + [cur_s]
    out = pl.pallas_call(
        functools.partial(_fine_spread_kernel, kc=k_s),
        out_shape=jax.ShapeDtypeStruct((Mp, L), jnp.int16),
        grid=(n_win_s, L // tile),
        in_specs=stack_s + stack_s,
        out_specs=cur_s,
        interpret=interpret,
    )(*([o2] * (k_s + 1) + [v] * (k_s + 1)))
    return out[:M]


# Compact-side window (rank kernel + coarse-stage boundary).  W=2048
# would remove one coarse compact pass (~470 MB ≈ 2 ms/chunk) but the
# rank kernel's scoped VMEM measures 16.41 MB vs the 16 MB limit on the
# v5e — the r4 "W=2048 OOMs by 420 KB" finding was THIS kernel, and
# kc=2 at W=1024 (same coarse saving, smaller stack) measured a LOSS in
# the r3 A/B (the kernel is compute-bound in its doubling stages, not
# bandwidth-bound).  Kept as a knob for chips with more VMEM.
_WC = int(os.environ.get("TPUJPEG_PALLAS_WC", "1024"))


def _compact_to_rank(ev: jnp.ndarray, *, interpret: bool = False,
                     kc: int | None = None, stop_after: str | None = None):
    """Shared compact-to-rank phase: events [N, L] -> (p int32, o int16)
    at [Np, L] with every valid event at its per-lane rank row (o == 0
    there after completion... o holds remaining offsets DURING the
    network; on return compaction is complete and `o >= 0` marks valid
    rows).  Fine stages run in the Pallas rank kernel, coarse stages in
    XLA — exactly the first half of place_events_v3, shared with the
    slot path (place_events_slots).  Windows are _WC (compact-side knob;
    output height Np is a multiple of it, hence of the spread-side _W
    whenever _WC >= _W)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, L = ev.shape
    W = max(_WC, _W) if N >= max(_WC, _W) * 2 else _W
    tile = min(LANE_TILE, L)
    Np = -(-N // W) * W
    n_win_c = Np // W
    k_c = _span_for(n_win_c, kc)
    cur_c = pl.BlockSpec((W, tile), lambda q, i: (q, i),
                         memory_space=pltpu.VMEM)
    succs = [
        pl.BlockSpec((W, tile),
                     (lambda j: lambda q, i: (
                         jnp.minimum(q + j, n_win_c - 1), i))(j),
                     memory_space=pltpu.VMEM)
        for j in range(1, k_c + 1)
    ]
    stack = [cur_c] + succs

    if _RANK_KERNEL:
        # rank-in-kernel: replace the full-matrix cumsum + 220 MB p/o
        # round-trip with a per-window count pass; the fine kernel
        # derives offsets from ONE base row per stack (the stack-local
        # prefix covers the rest — see _fine_compact_rank_kernel)
        if Np > N:
            ev = jnp.concatenate(
                [ev, jnp.full((Np - N, L), -1, jnp.int32)]
            )
        w_cnt = (ev >= 0).reshape(n_win_c, W, L).sum(1, dtype=jnp.int32)
        w_base = jnp.cumsum(w_cnt, axis=0) - w_cnt
        base_adj = w_base - (
            jax.lax.iota(jnp.int32, n_win_c) * W
        )[:, None]
        if stop_after == "init":
            return ev, base_adj
        base_spec = pl.BlockSpec((n_win_c, tile), lambda q, i: (0, i),
                                 memory_space=pltpu.VMEM)
        p, o = pl.pallas_call(
            functools.partial(
                _fine_compact_rank_kernel, n_win=n_win_c, kc=k_c
            ),
            out_shape=(
                jax.ShapeDtypeStruct((Np, L), jnp.int32),
                jax.ShapeDtypeStruct((Np, L), jnp.int16),
            ),
            grid=(n_win_c, L // tile),
            in_specs=stack + [base_spec],
            out_specs=(cur_c, cur_c),
            interpret=interpret,
        )(*([ev] * (k_c + 1) + [base_adj]))
    else:
        # initial offsets: rank = exclusive prefix count of valid entries
        valid = ev >= 0
        vi = valid.astype(jnp.int32)
        rank = jnp.cumsum(vi, axis=0) - vi
        pos = jax.lax.broadcasted_iota(jnp.int32, ev.shape, 0)
        o = jnp.where(valid, pos - rank, -1).astype(jnp.int16)
        p = jnp.where(valid, ev, 0)
        if Np > N:
            o = jnp.concatenate([o, jnp.full((Np - N, L), -1, jnp.int16)])
            p = jnp.concatenate([p, jnp.zeros((Np - N, L), jnp.int32)])
        if stop_after == "init":
            return p, o
        p, o = pl.pallas_call(
            functools.partial(_fine_compact_kernel, n_win=n_win_c, kc=k_c),
            out_shape=(
                jax.ShapeDtypeStruct((Np, L), jnp.int32),
                jax.ShapeDtypeStruct((Np, L), jnp.int16),
            ),
            grid=(n_win_c, L // tile),
            in_specs=stack + stack,
            out_specs=(cur_c, cur_c),
            interpret=interpret,
        )(*([p] * (k_c + 1) + [o] * (k_c + 1)))

    if stop_after == "compact_fine":
        return p, o
    # coarse compact stages (d >= kc*W), XLA over the HBM matrix
    d = k_c * W
    while d < Np:
        sp = _rolled(p, d, 0)
        so = _rolled(o, d, jnp.int16(-1))
        move = (so >= 0) & ((so & d) > 0)
        stay = (o >= 0) & ((o & d) == 0)
        p = jnp.where(move, sp, jnp.where(stay, p, 0))
        o = jnp.where(move, so - jnp.int16(d), jnp.where(stay, o, jnp.int16(-1)))
        d *= 2

    return p, o


# ---------------------------------------------------------------------------
# Slot materialization (round 5): spread in compressed coordinates
# ---------------------------------------------------------------------------
#
# The v3 spread network expands the compacted event stream into the FULL
# dense space [M = max_blk*64, L] — every coarse XLA pass round-trips a
# [M, L] offset/value matrix through HBM, and the profile pins those
# passes as the single largest decode cost (PERFORMANCE.md round-4
# roofline: ~5 GB forced traffic per 64-image chunk vs the reference's
# zero-amplification prefix-sum + direct writes, parser.cu:176-194).
# Dense rows are mostly zeros: measured corpora carry ~5-11 nonzero
# coefficients per 64-row block.
#
# The slot scheme routes the coarse stages through a COMPRESSED space
# instead: G consecutive blocks (scan order, so Y/Cb/Cr interleave and
# density mixes) share C slots, target
#
#     t' = group(blk) * C + rank_in_group,
#
# giving a spread space of Ms = ceil(max_blk/G)*C rows — a 64*G/C = 2x
# reduction at the default G=8, C=256.  rank_in_group is recovered from
# the compacted stream inside a windowed Pallas kernel: group boundaries
# are rows where blk>>log2(G) changes, and a boundary is never more than
# C-1 valid rows back (else the group overflowed), so a log2(C)-stage
# running-max over row positions resolves it VMEM-locally.  The fine
# spread kernel finishes slot placement and then expands each group's C
# slots into its 64*G dense rows entirely in VMEM (a short monotone
# down-spread: within a group, target 64*b_loc + z >= rank holds because
# every block has <= 64 events; entries never leave their group's span,
# so groups cannot collide).
#
# Capacity is CONTENT-ADAPTIVE (suggest_slot_c): callers scan a host
# sample (or the whole corpus, ~1 ms/image via the native decoder) and
# pick the smallest pow2 C in [64, 256] covering the max group load —
# aligned group sums for restart lanes (segment starts are whole MCU
# rows, so groups align), the max SLIDING G-block window for
# speculative lanes (which start at arbitrary blocks).  Measured at
# q90: whole-corpus aligned maxima of 143 (synthetic) / 252 (photo
# mosaics), with wide per-image variance — bench.py sorts images by
# need so sparse chunks serve at C=128.  Overflow is handled exactly
# either way: the unpack kernel latches a per-lane flag (boundary out
# of window, or rank_in_group >= C) and the batch engine re-decodes the
# chunk through the classic v3 path, mirroring the STEPS_SAFE ladder.

_SLOT_C = int(os.environ.get("TPUJPEG_SLOT_C", "256"))
_SLOT_G = int(os.environ.get("TPUJPEG_SLOT_G", "8"))


def suggest_slot_c(nonzero_per_block, G: int | None = None,
                   aligned: bool = True) -> int:
    """Content-adaptive slot capacity from a host-side corpus sample.

    nonzero_per_block: int array of per-block nonzero-coefficient counts
    (oracle.entropy_decode output; counting DC unconditionally is a safe
    overestimate of emitted events).  Returns the smallest power-of-two
    C in [64, 256] covering the sampled max group load, or 0 when even
    C=256 cannot (callers disable slots).  The pow2 ceiling supplies the
    safety margin, and the err_slot retry ladder covers the residual.

    aligned: restart lanes start at segment boundaries (block index 0
    mod a whole MCU row), so their slot groups align with the image's
    8-block grid — use the aligned group sums.  SPECULATIVE lanes start
    at arbitrary blocks (a lane's local block 0 is wherever its
    predecessor ended), so their groups are arbitrary G-block windows:
    aligned=False bounds with the max SLIDING-window sum instead (the
    spec photo bench latched err_slot at C=256 from exactly this
    aliasing — aligned gmax 252, unaligned above 256).
    """
    import numpy as np

    G = _SLOT_G if G is None else G
    nz = np.asarray(nonzero_per_block)
    if aligned:
        m = (len(nz) // G) * G
        gmax = (
            int(nz[:m].reshape(-1, G).sum(1).max()) if m else int(nz.sum())
        )
    else:
        if len(nz) < G:
            gmax = int(nz.sum())
        else:
            cs = np.concatenate([[0], np.cumsum(nz)])
            gmax = int((cs[G:] - cs[:-G]).max())
    c = 64
    while c < gmax:
        c *= 2
    return c if c <= 256 else 0


def _use_pallas_slots(N: int, M: int, L: int, C: int | None = None) -> bool:
    """Gate for the slot spread (compact side shares _use_pallas_v3's)."""
    if os.environ.get("TPUJPEG_SLOTS", "1") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    C, G = (_SLOT_C if C is None else C), _SLOT_G
    if C & (C - 1) or G & (G - 1) or _W % C or C > _W or C > 64 * G:
        return False
    max_blk = M // 64
    Ms = -(-max_blk // G) * C
    Np = -(-N // _W) * _W
    Msp = -(-Ms // _W) * _W
    # int16 offsets bound the rank and slot spaces; the dense space is
    # only ever addressed window-locally, so M itself may exceed 32768
    # (the spec path's win over v3's gate).
    return (
        Np <= 32768 and Msp <= 32768
        and L % LANE_TILE == 0
        and Np >= 2 * _W and Msp >= 2 * _W
    )


def _slot_unpack_kernel(p_prev_ref, p_cur_ref, o2_out, ovf_out,
                        *, C: int, G: int):
    """Compacted events -> slot offsets + overflow latch, one window.

    Stack = [predecessor window | current window] of the rank-compacted
    packed events (p == 0 iff empty: a real event's value field val+2048
    is never 0 and any nonzero blk/z packs nonzero high bits).  For each
    valid current row: group = blk >> log2(G); the group's first event
    is the latest row where the group id changes, at most C-1 rows back
    (else overflow — latched, entry dropped); slot offset
    o2 = group*C + rank_in_group - global_row.
    """
    from jax.experimental import pallas as pl

    p = jnp.concatenate([p_prev_ref[:], p_cur_ref[:]])   # [2W, t] int32
    H = p.shape[0]
    W = H // 2
    q = pl.program_id(0)
    gshift = G.bit_length() - 1
    valid = p != 0
    grp = ((p >> 18) & 0x1FFF) >> gshift
    pos = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
    boundary = valid & (grp != _rolled_down(grp, 1, jnp.int32(-1)))
    # global row 0 starts group 0; for q == 0 the predecessor block is a
    # clamped duplicate of window 0, so force the boundary explicitly.
    # (Duplicate-halo "boundaries" below stack row W cannot corrupt any
    # current row: a current row at global r <= C-1 always has its real
    # group start at stack pos >= W inside the lookback window, and the
    # running max prefers the larger position.)
    boundary = boundary | (valid & (pos == W) & (q == 0))
    m = jnp.where(boundary, pos, -1)
    d = 1
    while d < C:
        m = jnp.maximum(m, _rolled_down(m, d, jnp.int32(-1)))
        d *= 2
    rib = pos - m
    ovf = valid & ((m < 0) | (rib >= C))
    gpos = pos - W + q * W                               # global row index
    t_slot = grp * C + rib
    o2 = jnp.where(valid & ~ovf, t_slot - gpos, -1)
    o2_out[:] = o2[W:].astype(jnp.int16)
    any_ovf = jnp.max(ovf[W:].astype(jnp.int32), axis=0, keepdims=True)
    ovf_out[:] = jnp.broadcast_to(any_ovf, ovf_out.shape)


def _fine_spread_expand_kernel(*refs, kc: int, C: int, G: int):
    """Slot-space fine spread + in-VMEM group->dense expansion.

    Stack = kc predecessor slot windows + the current one (o2 int16,
    payload int32 packed events).  Coarse XLA stages brought every slot
    offset below kc*W, so the current window's slots come from the
    stack; after the fine stages each slot row g*C + r_g holds its
    packed event.  Expansion re-targets each placed event inside its
    group's 64*G dense rows (offset (blk mod G)*64 + z - r_g, in
    [0, 64G)) and runs the short monotone down-spread; entries never
    overshoot their in-span target, so groups stay disjoint and the
    within-group non-decreasing-offset argument of fsm._spread applies
    unchanged.  Output: [ (W/C)*64G, tile ] dense int16 rows.
    """
    from jax.experimental import pallas as pl

    o_refs, v_refs = refs[: kc + 1], refs[kc + 1 : 2 * (kc + 1)]
    out_ref = refs[2 * (kc + 1)]
    o = jnp.concatenate([r[:] for r in o_refs]).astype(jnp.int32)
    p = jnp.concatenate([r[:] for r in v_refs])
    H = o.shape[0]
    W = H // (kc + 1)
    D = kc * W
    shift = W.bit_length() - 1
    q = pl.program_id(0)
    pos = jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
    ghost = (q - kc + (pos >> shift)) >> 31
    land = pos + o
    keep = (o >= 0) & (land >= D) & (land < D + W) & (ghost == 0)
    o = jnp.where(keep, o, -1)
    p = jnp.where(keep, p, 0)
    d = D // 2
    while d >= 1:
        sp = _rolled_down(p, d, 0)
        so = _rolled_down(o, d, -1)
        move = so >= d
        stay = (o >= 0) & (o < d)
        p = jnp.where(move, sp, jnp.where(stay, p, 0))
        o = jnp.where(move, so - d, jnp.where(stay, o, -1))
        d //= 2
    slots = jnp.where(o == 0, p, 0)[D:]                  # [W, t] placed
    valid = slots != 0
    b_loc = (slots >> 18) & (G - 1)
    z = (slots >> 12) & 63
    val = jnp.where(valid, (slots & 0xFFF) - 2048, 0)
    r_g = jax.lax.broadcasted_iota(jnp.int32, slots.shape, 0) & (C - 1)
    o3 = jnp.where(valid, (b_loc << 6) + z - r_g, -1)
    span = 64 * G
    n_grp = W // C
    pad_o = jnp.full((span - C,) + slots.shape[1:], -1, jnp.int32)
    pad_v = jnp.zeros((span - C,) + slots.shape[1:], jnp.int32)
    fo, fv = [], []
    for g in range(n_grp):
        fo += [o3[g * C : (g + 1) * C], pad_o]
        fv += [val[g * C : (g + 1) * C], pad_v]
    o = jnp.concatenate(fo)                              # [(W/C)*64G, t]
    p = jnp.concatenate(fv)
    d = span // 2
    while d >= 1:
        sp = _rolled_down(p, d, 0)
        so = _rolled_down(o, d, -1)
        move = so >= d
        stay = (o >= 0) & (o < d)
        p = jnp.where(move, sp, jnp.where(stay, p, 0))
        o = jnp.where(move, so - d, jnp.where(stay, o, -1))
        d //= 2
    out_ref[:] = jnp.where(o == 0, p, 0).astype(jnp.int16)


@functools.partial(
    jax.jit, static_argnames=("M", "interpret", "C", "G", "stop_after")
)
def place_events_slots(ev: jnp.ndarray, *, M: int, C: int | None = None,
                       G: int | None = None, interpret: bool = False,
                       stop_after: str | None = None):
    """events int32 [N, L] (-1 = empty) -> (values int16 [M, L],
    overflow bool [L]).

    Slot-space spread (module comment above): compact-to-rank exactly as
    place_events_v3, then the coarse stages run over Ms = groups*C rows
    instead of M, and the fine kernel expands groups to dense in VMEM.
    Overflow lanes (any group with > C events) yield garbage rows and a
    latched flag — callers re-decode those chunks via the classic path.
    Bit-exact vs the XLA butterflies otherwise (tests/test_materialize).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = _SLOT_C if C is None else C
    G = _SLOT_G if G is None else G
    N, L = ev.shape
    W = _W
    tile = min(LANE_TILE, L)
    max_blk = M // 64
    n_groups = -(-max_blk // G)
    Ms = n_groups * C
    Np = -(-N // W) * W
    Msp = -(-Ms // W) * W
    assert W % C == 0 and C & (C - 1) == 0 and G & (G - 1) == 0

    p, o = _compact_to_rank(ev, interpret=interpret)
    if stop_after == "compact":
        return p, o
    Np = p.shape[0]  # compact may pad to its own (wider) window multiple

    # rank space -> slot offsets (windowed kernel, predecessor halo)
    n_win_r = Np // W
    cur = pl.BlockSpec((W, tile), lambda q, i: (q, i),
                       memory_space=pltpu.VMEM)
    prev = pl.BlockSpec((W, tile), lambda q, i: (jnp.maximum(q - 1, 0), i),
                        memory_space=pltpu.VMEM)
    ovf_spec = pl.BlockSpec((8, tile), lambda q, i: (q, i),
                            memory_space=pltpu.VMEM)
    o2, ovf8 = pl.pallas_call(
        functools.partial(_slot_unpack_kernel, C=C, G=G),
        out_shape=(
            jax.ShapeDtypeStruct((Np, L), jnp.int16),
            jax.ShapeDtypeStruct((n_win_r * 8, L), jnp.int32),
        ),
        grid=(n_win_r, L // tile),
        in_specs=[prev, cur],
        out_specs=(cur, ovf_spec),
        interpret=interpret,
    )(p, p)
    overflow = jnp.any(ovf8 != 0, axis=0)
    # overflow/invalid payloads need no masking: their o2 is -1, so the
    # first spread stage (or the fine kernel's keep mask) zeroes them
    pay = p
    if stop_after == "unpack":
        return o2, pay, overflow

    def fit(x, fill):
        if Msp > Np:
            padr = jnp.full((Msp - Np, L), fill, x.dtype)
            return jnp.concatenate([x, padr])
        # without overflow, rank r <= slot target < Ms <= Msp, so rows
        # >= Msp hold no valid entries (overflow rows are latched)
        return x[:Msp]

    o2, pay = fit(o2, jnp.int16(-1)), fit(pay, 0)

    # coarse slot-spread stages (d >= kc*Ws), XLA over [Msp, L].  The
    # spread-side window shrinks with the compression ratio so the fine
    # kernel's in-VMEM dense frame stays <= 2048 rows (C=128's x4
    # expansion at Ws=1024 measured a 496 KB scoped-VMEM overflow).
    span = 64 * G
    Ws = min(W, max(C, (2048 * C) // span))
    n_win_s = Msp // Ws
    k_s = _span_for(n_win_s, None, default=_KS)
    d = 1
    while d * 2 < Msp:
        d *= 2
    while d >= k_s * Ws:
        sp = _rolled_down(pay, d, 0)
        so = _rolled_down(o2, d, jnp.int16(-1))
        move = so >= d
        stay = (o2 >= 0) & (o2 < d)
        pay = jnp.where(move, sp, jnp.where(stay, pay, 0))
        o2 = jnp.where(move, so - jnp.int16(d),
                       jnp.where(stay, o2, jnp.int16(-1)))
        d //= 2
    if stop_after == "spread_coarse":
        return o2, pay, overflow

    # fine slot spread + group->dense expansion (Pallas)
    Wd = (Ws // C) * span
    cur_s = pl.BlockSpec((Ws, tile), lambda q, i: (q, i),
                         memory_space=pltpu.VMEM)
    preds = [
        pl.BlockSpec((Ws, tile),
                     (lambda j: lambda q, i: (jnp.maximum(q - j, 0), i))(j),
                     memory_space=pltpu.VMEM)
        for j in range(k_s, 0, -1)
    ]
    stack_s = preds + [cur_s]
    out_spec = pl.BlockSpec((Wd, tile), lambda q, i: (q, i),
                            memory_space=pltpu.VMEM)
    dense = pl.pallas_call(
        functools.partial(_fine_spread_expand_kernel, kc=k_s, C=C, G=G),
        out_shape=jax.ShapeDtypeStruct((n_win_s * Wd, L), jnp.int16),
        grid=(n_win_s, L // tile),
        in_specs=stack_s + stack_s,
        out_specs=out_spec,
        interpret=interpret,
    )(*([o2] * (k_s + 1) + [pay] * (k_s + 1)))
    return dense[:M], overflow


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
