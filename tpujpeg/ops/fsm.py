"""Gather-free vectorized entropy decode: the column-synchronous bit FSM.

This is the TPU-native answer to the reference's parallel Huffman decoder
(cuda-decoder/src/parser.cu:50-208).  Measurement drove the design: on TPU,
XLA lowers dynamic gather AND scatter to ~8 ns/element serial loops, so any
decoder that does per-symbol table lookups by dynamic index (including the
lockstep gather decoder in ops/entropy.py) is capped near 100 MB/s.  The
FSM decoder therefore contains **zero dynamically-indexed memory ops**:

  * lanes  = entropy segments (restart intervals), exactly parallel;
  * the scan walks BYTE COLUMNS of a [stride, lanes] matrix — `lax.scan`
    feeds each lane its next byte with no indexing at all;
  * each byte is processed as 8 unrolled bit substeps of a canonical-
    Huffman finite state machine held entirely in vector registers
    (code register + length, raw-magnitude countdown, coefficient index,
    block counter, DC predictors);
  * all table lookups are arithmetic: code-completion thresholds come from
    a 64-entry index select tree (table-id x code-length), and the
    canonical-index -> symbol map is piecewise-affine in the code value
    (canonical JPEG tables are runs of consecutive symbols), evaluated as
    a constant-pivot binary select tree — compare/select ops on the VPU,
    never a memory gather;
  * decoded coefficients are emitted as packed (block, zigzag, value)
    events into per-byte slots (scan ys), then materialized WITHOUT
    scatter by two butterfly networks of uniform rolls + selects:
    a stable compaction (events -> front of each lane column) and a
    monotone spread (event rank -> 64*block + zigzag position).  Both are
    collision-free because per-lane emission order matches coefficient
    order, so targets are strictly increasing.

The result is a decode whose wall-clock scales with VPU width (add lanes =
add segments/images) instead of with gather latency, and whose serial depth
is bits-per-segment — the same quantity the reference's speculative
self-synchronization attacks (SURVEY §2.7).

Bit-exactness contract: identical to tpujpeg.oracle.decoder.entropy_decode
(EXTEND per reference utils.cu:34-41, AC RLE/EOB/ZRL per cpp
parser.cpp:105-142, DC DPCM reset per restart segment).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import JpegError
from ..io.huffman import HuffmanTable
from ..io.parser import JpegImage

MAX_BLOCKS_PER_LANE = 8191  # blk field is 13 bits in the packed event
MAX_PIECES = 512
EMIT_SLOTS = 4  # max coefficient completions per lane-byte


# ---------------------------------------------------------------------------
# Host-side table compilation
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FsmTables:
    """Per-batch Huffman constants, hashable (jit static arg).

    lim[t][l]    : maxcode+1 for table t, code length l+1 (0 = no codes).
    pieces       : sorted (skey, base) pairs; for a completed code creg of
                   length clen in table t, sym = base + creg where (skey,
                   base) is the last piece with skey <= t<<21 | clen<<16 | creg.
    tsel[bim]    : table set (0/1) of the component of MCU block bim.
    comp[bim]    : component index of MCU block bim.
    n_comp       : number of frame components.
    """

    lim: tuple  # [4][16] ints
    piece_keys: tuple
    piece_bases: tuple
    tsel: tuple
    comp: tuple
    n_comp: int


def _table_constants(table: HuffmanTable, tbl_id: int):
    """(lim[16], pieces) for one canonical table."""
    counts = np.asarray(table.counts, np.int64)
    symbols = np.asarray(table.symbols, np.int64)
    lim = [0] * 16
    pieces = []
    code = 0
    k = 0
    for length in range(1, 17):
        n = int(counts[length - 1])
        if n:
            mincode = code
            lim[length - 1] = code + n  # maxcode + 1
            run_start = 0
            for i in range(n):
                if i and symbols[k + i] != symbols[k + i - 1] + 1:
                    pieces.append((length, mincode + run_start,
                                   int(symbols[k + run_start]) - (mincode + run_start)))
                    run_start = i
            pieces.append((length, mincode + run_start,
                           int(symbols[k + run_start]) - (mincode + run_start)))
            k += n
            code += n
        code <<= 1
    keyed = [((tbl_id << 21) | (length << 16) | creg_lo, base)
             for (length, creg_lo, base) in pieces]
    return lim, keyed


def build_tables(img: JpegImage) -> FsmTables:
    """Compile the scan's Huffman tables into FSM constants.

    Raises JpegError when the scan is outside the FSM's envelope (more than
    two table sets per class, or size symbols that overflow the 12-bit
    packed value field) — callers fall back to the host/gather decoders.
    """
    set_of: dict[int, int] = {}  # table id -> set index (0/1)
    for c in img.components:
        if c.dc_table_id != c.ac_table_id:
            # Table sets pair (dc_i, ac_i); mixed assignments are legal JPEG
            # but rare — fall back rather than widen the select trees.
            raise JpegError("fsm: component uses mismatched dc/ac table ids")
        if c.dc_table_id not in set_of:
            if len(set_of) == 2:
                raise JpegError("fsm: more than two Huffman table sets")
            set_of[c.dc_table_id] = len(set_of)

    lim = [[0] * 16 for _ in range(4)]
    pieces: list[tuple[int, int]] = []
    for tid, s in set_of.items():
        dc = img.huffman.get(tid)
        ac = img.huffman.get(0x10 | tid)
        if dc is None or ac is None:
            raise JpegError("fsm: scan references missing DHT table")
        if dc.symbols.size and int(np.max(dc.symbols)) > 11:
            raise JpegError("fsm: DC size symbol > 11 overflows packed event")
        if ac.symbols.size and int(np.max(ac.symbols) & 0x0F) > 10:
            raise JpegError("fsm: AC size symbol > 10 overflows packed event")
        for is_ac, table in ((0, dc), (1, ac)):
            tbl_id = is_ac * 2 + s
            lim_t, keyed = _table_constants(table, tbl_id)
            lim[tbl_id] = lim_t
            pieces.extend(keyed)
    pieces.sort()
    if len(pieces) > MAX_PIECES:
        raise JpegError("fsm: Huffman tables too irregular")

    tsel = []
    comp = []
    for ci, c in enumerate(img.components):
        for _ in range(c.h * c.v):
            tsel.append(set_of[c.dc_table_id])
            comp.append(ci)
    return FsmTables(
        lim=tuple(tuple(row) for row in lim),
        piece_keys=tuple(k for k, _ in pieces),
        piece_bases=tuple(b for _, b in pieces),
        tsel=tuple(tsel),
        comp=tuple(comp),
        n_comp=len(img.components),
    )


# ---------------------------------------------------------------------------
# Host-side segment packing
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FsmPlan:
    """Device-ready column matrix + lane metadata for one batch."""

    xs: np.ndarray            # uint8 [stride, L] — lane byte columns
    seg_n_blocks: np.ndarray  # int32 [L] (0 = padding lane)
    tables: FsmTables
    max_blk: int              # max blocks in any lane (static)
    # assembly: per image, (first_lane, n_lanes, blocks_per_full_lane,
    #                       blocks_in_last_lane)
    layout: tuple
    n_blocks_total: int


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def build_plan(imgs: list[JpegImage]) -> FsmPlan:
    """Pack the restart segments of a batch into the FSM lane matrix."""
    tables = build_tables(imgs[0])
    pattern0 = imgs[0].mcu_block_pattern()
    bpm = len(pattern0)

    seg_bytes: list[np.ndarray] = []
    nblocks: list[int] = []
    layout = []
    n_blocks_total = 0
    for img in imgs:
        if img.mcu_block_pattern() != pattern0 or build_tables(img) != tables:
            raise JpegError("fsm: batch mixes geometries or Huffman tables")
        offs = img.segment_offsets
        n_seg = offs.size
        ri = img.restart_interval or img.n_mcus
        need = -(-img.n_mcus // ri)
        if need > n_seg:
            raise JpegError("fsm: missing restart segments")
        ends = np.append(offs[1:need], img.scan_data.size)
        first = len(seg_bytes)
        for s in range(need):
            seg_bytes.append(img.scan_data[int(offs[s]) : int(ends[s])])
            mcus = min(ri, img.n_mcus - s * ri)
            nblocks.append(mcus * bpm)
        rib = ri * bpm
        last = img.n_mcus * bpm - (need - 1) * rib
        if max(rib, last) > MAX_BLOCKS_PER_LANE:
            raise JpegError("fsm: restart interval too long for packed events")
        layout.append((first, need, rib, last))
        n_blocks_total += img.n_mcus * bpm

    L = _round_up(max(len(seg_bytes), 8), 128)
    # Stride buckets: pow2 up to 1 KiB, then 512-byte steps — the column
    # scan costs wall-clock per column, so coarse pow2 buckets would waste
    # up to half the decode on padding columns.
    longest = max(b.size for b in seg_bytes)
    stride = 64
    while stride < min(longest, 1024):
        stride *= 2
    if longest > stride:
        stride = _round_up(longest, 512)
    xs = np.zeros((L, stride), np.uint8)
    for i, b in enumerate(seg_bytes):
        xs[i, : b.size] = b
    seg_n = np.zeros(L, np.int32)
    seg_n[: len(nblocks)] = nblocks
    # Bucket the lane capacity so nearby geometries share one compile
    # (axon compiles are minutes; the spread network only grows ~2x).
    max_blk = 8
    while max_blk < max(nblocks):
        max_blk *= 2
    return FsmPlan(
        xs=np.ascontiguousarray(xs.T),
        seg_n_blocks=seg_n,
        tables=tables,
        max_blk=max_blk,
        layout=tuple(layout),
        n_blocks_total=n_blocks_total,
    )


# ---------------------------------------------------------------------------
# Select-tree primitives (constant tables, no memory ops)
# ---------------------------------------------------------------------------


def _index_tree(idx: jnp.ndarray, values: list[int]) -> jnp.ndarray:
    """Select values[idx] from constants via a bit-indexed select tree."""
    n = 1
    while n < len(values):
        n *= 2
    vals = [jnp.int32(values[i] if i < len(values) else 0) for i in range(n)]
    bit = 0
    while n > 1:
        b = (idx >> bit) & 1
        vals = [jnp.where(b == 0, vals[2 * i], vals[2 * i + 1]) for i in range(n // 2)]
        n //= 2
        bit += 1
    return vals[0]


def _bst_tree(key: jnp.ndarray, keys: tuple, values: tuple) -> jnp.ndarray:
    """value of the last entry with keys[i] <= key (keys sorted ascending).

    Constant-pivot binary select tree; key must be >= keys[0] for a
    meaningful result (guaranteed: callers mask incomplete codes).
    """

    def rec(lo: int, hi: int) -> jnp.ndarray:  # entries [lo, hi)
        if hi - lo == 1:
            return jnp.int32(values[lo])
        mid = (lo + hi) // 2
        return jnp.where(key < keys[mid], rec(lo, mid), rec(mid, hi))

    return rec(0, len(keys))


# ---------------------------------------------------------------------------
# The FSM decode kernel
# ---------------------------------------------------------------------------


def _fsm_scan(
    xs,
    seg_n_blocks,
    tables: FsmTables,
    start_bits=None,
    start_bim=None,
    dc_diff: bool = False,
    chunk_bits=None,
):
    """Run the bit FSM over byte columns.

    Restart mode (defaults): every lane starts at bit 0 of its row with a
    fresh DC predictor.  Speculative mode: `start_bits`/`start_bim` give
    each lane its handoff state (bit offset into its row, MCU block phase)
    from the Jacobi boundary iteration, and `dc_diff=True` emits raw DC
    differences (predictors are unknowable mid-stream; a global segmented
    cumsum resolves DPCM afterwards — the 3-thread prefix pass of the
    reference, parser.cu:198-206, as one vector op).

    Returns (events int32 [stride, EMIT_SLOTS, L], err bool [L], state).
    """
    L = xs.shape[1]
    bpm = len(tables.comp)
    lim_flat = [tables.lim[t][l] for t in range(4) for l in range(16)]
    zero = jnp.zeros(L, jnp.int32)

    def substep(st, byte, j, col):
        (creg, clen, rawn, rawacc, rsize, pz, k, blk, bim, dcs, done, err,
         ec, slots, end_bits, end_bim) = st
        bit = (byte >> (7 - j)) & 1
        active = ~done & ~err
        if start_bits is not None:
            active = active & ((col * 8 + j) >= start_bits)
        in_raw = rawn > 0

        # ---- raw-magnitude path (JPEG EXTEND bits) ----
        rawacc2 = rawacc * 2 + bit
        rawn2 = rawn - 1
        raw_done = in_raw & (rawn2 == 0) & active

        # ---- Huffman code path ----
        h_active = active & ~in_raw
        creg2 = creg * 2 + bit
        clen2 = clen + 1
        is_dc = k == 0
        tsel = _index_tree(bim, list(tables.tsel))
        comp = _index_tree(bim, list(tables.comp))
        tbl = jnp.where(is_dc, tsel, tsel + 2)
        lim = _index_tree(tbl * 16 + (clen2 - 1), lim_flat)
        complete = h_active & (creg2 < lim)
        skey = (tbl << 21) | (clen2 << 16) | creg2
        sym = _bst_tree(skey, tables.piece_keys, tables.piece_bases) + creg2
        size = sym & 15
        run = sym >> 4
        eob = (sym == 0) & ~is_dc
        z_ac = k + run
        goes_raw = complete & (size > 0)
        emit_dc_now = complete & is_dc & (size == 0)
        k_code0 = jnp.where(is_dc, 1, jnp.where(eob, 64, z_ac + 1))

        # ---- EXTEND at raw completion (reference utils.cu:34-41) ----
        half = 1 << jnp.maximum(rsize - 1, 0)
        val_raw = jnp.where(rawacc2 >= half, rawacc2, rawacc2 - 2 * half + 1)
        raw_is_dc = is_dc  # k stayed 0 through a DC magnitude

        dc_here = zero
        dcs2 = []
        for ci in range(tables.n_comp):
            sel = comp == ci
            dc_new = dcs[ci] + jnp.where(raw_done & raw_is_dc & sel, val_raw, 0)
            dcs2.append(dc_new)
            dc_here = jnp.where(sel, dc_new, dc_here)

        emit = emit_dc_now | (raw_done & (raw_is_dc | (pz < 64)))
        # diff mode: a size-0 DC symbol means difference 0 (emit_dc_now
        # fires without any magnitude bits, so val_raw is stale there)
        dc_emit = jnp.where(emit_dc_now, 0, val_raw) if dc_diff else dc_here
        emit_val = jnp.where(raw_done & ~raw_is_dc, val_raw, dc_emit)
        emit_z = jnp.where(raw_done & ~raw_is_dc, pz, 0)

        # ---- coefficient/block bookkeeping ----
        fired = raw_done | (complete & ~goes_raw)
        k3 = jnp.where(raw_done, jnp.where(raw_is_dc, 1, pz + 1),
                       jnp.where(complete & ~goes_raw, k_code0, k))
        block_end = fired & (k3 >= 64)
        blk2 = blk + block_end.astype(jnp.int32)
        bim2 = jnp.where(block_end,
                         jnp.where(bim + 1 == bpm, 0, bim + 1), bim)
        k4 = jnp.where(block_end, 0, k3)
        done2 = done | (blk2 >= seg_n_blocks)
        if chunk_bits is not None:
            # speculative count: stop at the first block boundary at or
            # past the lane's chunk end (the reference's overflow rule,
            # parser.cu:156-173)
            done2 = done2 | (block_end & (col * 8 + j + 1 >= chunk_bits))
        newly_done = done2 & ~done
        end_bits = jnp.where(newly_done, col * 8 + j + 1, end_bits)
        end_bim = jnp.where(newly_done, bim2, end_bim)

        packed = (blk << 18) | (emit_z << 12) | (emit_val + 2048)
        slots2 = tuple(
            jnp.where(emit & (ec == i), packed, slots[i])
            for i in range(EMIT_SLOTS)
        )
        ec2 = ec + emit.astype(jnp.int32)

        err2 = (
            err
            | (h_active & (clen2 >= 17))                      # overlong code
            | (emit & (ec >= EMIT_SLOTS))                     # slot overflow
            | (emit & (((emit_val + 2048) & ~0xFFF) != 0))    # value overflow
        )

        creg3 = jnp.where(h_active, jnp.where(complete, 0, creg2), creg)
        clen3 = jnp.where(h_active, jnp.where(complete, 0, clen2), clen)
        rawn3 = jnp.where(in_raw & active, rawn2, jnp.where(goes_raw, size, rawn))
        rawacc3 = jnp.where(goes_raw, 0, jnp.where(in_raw & active, rawacc2, rawacc))
        rsize3 = jnp.where(goes_raw, size, rsize)
        pz2 = jnp.where(goes_raw, jnp.where(is_dc, 0, z_ac), pz)

        return (creg3, clen3, rawn3, rawacc3, rsize3, pz2, k4, blk2, bim2,
                tuple(dcs2), done2, err2, ec2, slots2, end_bits, end_bim)

    def body(st, col_and_byte):
        col, byte_u8 = col_and_byte
        byte = byte_u8.astype(jnp.int32)
        # fresh emit slots each byte
        st = (
            st[:12]
            + (zero, tuple(jnp.full(L, -1, jnp.int32) for _ in range(EMIT_SLOTS)))
            + st[14:]
        )
        for j in range(8):
            st = substep(st, byte, j, col)
        return st, jnp.stack(st[13])

    init = (
        zero, zero, zero, zero, zero, zero, zero, zero,
        zero if start_bim is None else start_bim,
        tuple(zero for _ in range(tables.n_comp)),
        seg_n_blocks == 0,
        jnp.zeros(L, bool),
        zero,
        tuple(jnp.full(L, -1, jnp.int32) for _ in range(EMIT_SLOTS)),
        zero,
        zero if start_bim is None else start_bim,
    )
    cols = jnp.arange(xs.shape[0], dtype=jnp.int32)
    st, events = jax.lax.scan(body, init, (cols, xs))
    err = st[11] | ~st[10]  # undone lane at end of data = truncated
    # NB: the full carry is returned (and surfaced through the jit below)
    # on purpose: XLA:CPU (observed on jax 0.9.0) miscompiles scans whose
    # carry outputs are dead — execution spins forever.  Keeping every
    # carry live costs a few [L] vectors and sidesteps the bug.
    return events, err, st


# ---------------------------------------------------------------------------
# Butterfly materialization (no scatter)
# ---------------------------------------------------------------------------


def _shift_up(x, d, fill):
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[d:], pad])


def _shift_down(x, d, fill):
    pad = jnp.full((d,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[:-d]])


def _compact(valid, payload):
    """Stable per-column compaction of [N, L] via masked power-of-2 shifts.

    Valid entries move to the front of each column preserving order.  The
    move offset (position - rank) is non-decreasing down each column, which
    makes every stage collision-free.
    """
    N = valid.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 0)
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=0) - valid
    off = jnp.where(valid, pos - rank, 0)
    v, p, o = valid, payload, off
    d = 1
    while d < N:
        sv = _shift_up(v, d, False)
        sp = _shift_up(p, d, 0)
        so = _shift_up(o, d, 0)
        move = sv & ((so & d) > 0)
        stay = v & ((o & d) == 0)
        p = jnp.where(move, sp, jnp.where(stay, p, 0))
        o = jnp.where(move, so - d, jnp.where(stay, o, 0))
        v = move | stay
        d *= 2
    return v, p


def _spread(valid, payload, target, M):
    """Place entry of rank r at row target[r] of [M, L] (zeros elsewhere).

    Requires per column: targets strictly increasing over valid ranks and
    target >= rank (true for compacted coefficient events), so rightward
    offsets are non-decreasing and stages are collision-free.
    """
    N = valid.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 0)
    o = jnp.where(valid, target - pos, 0)

    def fit(x, fill):
        if M > N:
            pad = jnp.full((M - N,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x, pad])
        return x[:M]

    v, p, o = fit(valid, False), fit(payload, 0), fit(o, 0)
    d = 1
    while d * 2 < M:
        d *= 2
    while d >= 1:
        sv = _shift_down(v, d, False)
        sp = _shift_down(p, d, 0)
        so = _shift_down(o, d, 0)
        move = sv & (so >= d)
        stay = v & (o < d)
        p = jnp.where(move, sp, jnp.where(stay, p, 0))
        o = jnp.where(move, so - d, jnp.where(stay, o, 0))
        v = move | stay
        d //= 2
    return jnp.where(v, p, 0)


# ---------------------------------------------------------------------------
# Full jitted decode
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("tables", "max_blk", "dc_diff"))
def _decode_jit(
    xs,
    seg_n_blocks,
    *,
    tables: FsmTables,
    max_blk: int,
    start_bits=None,
    start_bim=None,
    dc_diff: bool = False,
):
    """FSM + butterflies: (per_lane int32 [L, max_blk, 64], err bool [L]).

    Deliberately independent of the batch's image layout so one compile
    serves every batch with the same (stride, lanes, tables, capacity);
    assembly into [n_blocks, 64] is a cheap layout-keyed step on top.
    The optional start state + dc_diff serve the speculative-split path.
    """
    events, err, scan_state = _fsm_scan(
        xs, seg_n_blocks, tables,
        start_bits=start_bits, start_bim=start_bim, dc_diff=dc_diff,
    )
    stride, S, L = events.shape
    ev = events.reshape(stride * S, L)
    valid = ev >= 0
    cv, cp = _compact(valid, ev)
    blk = (cp >> 18) & 0x1FFF
    z = (cp >> 12) & 63
    val = (cp & 0xFFF) - 2048
    target = blk * 64 + z
    M = max_blk * 64
    coeffs_t = _spread(cv, val, target, M)       # [M, L]
    per_lane = coeffs_t.T.reshape(L, max_blk, 64)
    return per_lane, err, scan_state


def assemble(per_lane: np.ndarray, layout) -> np.ndarray:
    """Per-lane block rows -> scan-order [n_blocks_total, 64] (host)."""
    parts = []
    for first, n_lanes, rib, last in layout:
        if n_lanes > 1:
            parts.append(
                per_lane[first : first + n_lanes - 1, :rib].reshape(-1, 64)
            )
        parts.append(per_lane[first + n_lanes - 1, :last])
    return np.concatenate(parts) if len(parts) > 1 else np.asarray(parts[0])


@functools.partial(jax.jit, static_argnames=("layout", "pad_to"))
def assemble_batched(per_lane: jnp.ndarray, *, layout, pad_to: int):
    """Device-side assemble for a uniform batch: [pad_to, blocks_img, 64].

    All images must share one per-image layout (the batch engine buckets by
    geometry, so this holds within a chunk).  Keeps the FSM -> pixel-stage
    hand-off entirely on device: on this machine host<->device round-trips
    run over a slow tunnel, and the coefficient tensor is ~100x the size of
    the compressed scan it came from.
    """
    per_img = []
    for first, n_lanes, rib, last in layout:
        rows = [per_lane[first : first + n_lanes - 1, :rib].reshape(-1, 64)]
        rows.append(per_lane[first + n_lanes - 1, :last])
        per_img.append(jnp.concatenate(rows) if n_lanes > 1 else rows[-1])
    out = jnp.stack(per_img)
    if pad_to > out.shape[0]:
        pad = jnp.zeros((pad_to - out.shape[0],) + out.shape[1:], out.dtype)
        out = jnp.concatenate([out, pad])
    return out


def decode_plan(plan: FsmPlan):
    """Run the FSM decoder -> (per_lane [L, max_blk, 64] device, err [L])."""
    per_lane, err, _ = _decode_jit(
        jnp.asarray(plan.xs),
        jnp.asarray(plan.seg_n_blocks),
        tables=plan.tables,
        max_blk=plan.max_blk,
    )
    return per_lane, err


def entropy_decode_fsm(imgs: list[JpegImage]) -> np.ndarray:
    """Decode a batch's scans with the FSM; int32 [total_blocks, 64].

    Raises JpegError on malformed streams or plans outside the FSM envelope
    (callers fall back to the host runtime).
    """
    plan = build_plan(imgs)
    per_lane, err = decode_plan(plan)
    if bool(jax.device_get(jnp.any(err))):
        raise JpegError("fsm decode failed (malformed or truncated scan)")
    return assemble(np.asarray(jax.device_get(per_lane)), plan.layout)


# ---------------------------------------------------------------------------
# Speculative equal-split decode (streams without restart markers)
# ---------------------------------------------------------------------------
#
# The TPU rendition of the reference's centerpiece (cuda-decoder/src/
# parser.cu:50-208): split the bitstream at equal byte boundaries, decode
# every chunk in parallel from a guessed start state, and iterate until
# neighboring boundary states agree.  The reference's per-thread overflow
# loop becomes a Jacobi fixed-point over lane handoff states: lane i's
# true start is lane i-1's end, lane 0's start is exact, so after k
# iterations lanes 0..k are exact — and Huffman self-synchronization makes
# convergence take a handful of rounds in practice.  The count pass is the
# same bit FSM in count mode (stop at the first block boundary at or past
# the chunk end); the final pass reuses the full decoder with per-lane
# block quotas and DC-difference emission, with DPCM resolved by one
# segmented cumsum (the reference's 3-thread DC prefix pass,
# parser.cu:198-206).

SPEC_OVERLAP = 384  # bytes a block may straddle past its chunk (max ~213)


@dataclass(frozen=True)
class SpecPlan:
    xs: np.ndarray           # uint8 [chunk+overlap, S]
    chunk_bits: np.ndarray   # int32 [S]
    blk_cap: int
    tables: FsmTables
    chunk_bytes: int
    n_lanes: int             # real lanes (before padding)
    n_blocks_total: int
    bpm: int


@functools.partial(jax.jit, static_argnames=("tables", "blk_cap"))
def _count_jit(xs, chunk_bits, start_bits, start_bim, *, tables, blk_cap):
    caps = jnp.full(chunk_bits.shape, blk_cap, jnp.int32)
    events, err, st = _fsm_scan(
        xs, caps, tables,
        start_bits=start_bits, start_bim=start_bim, chunk_bits=chunk_bits,
    )
    # end_bits/end_bim/blk: st[14], st[15], st[7].  Full state surfaced to
    # keep every scan carry live (see the XLA:CPU note in _fsm_scan).
    return st[14], st[15], st[7], err, st, events[0, 0]


def build_spec_plan(img: JpegImage, chunk_bytes: int = 2048) -> SpecPlan:
    tables = build_tables(img)
    scan = img.scan_data
    S = max(1, -(-scan.size // chunk_bytes))
    n_blocks = img.n_mcus * img.blocks_per_mcu
    stride = chunk_bytes + SPEC_OVERLAP
    L = _round_up(S, 8)
    xs = np.zeros((L, stride), np.uint8)
    chunk_bits = np.zeros(L, np.int32)
    for i in range(S):
        part = scan[i * chunk_bytes : i * chunk_bytes + stride]
        xs[i, : part.size] = part
        chunk_bits[i] = min(chunk_bytes, scan.size - i * chunk_bytes) * 8
    cap = 8
    while cap < min(4 * (n_blocks // S + 1) + 64, MAX_BLOCKS_PER_LANE):
        cap *= 2
    return SpecPlan(
        xs=np.ascontiguousarray(xs.T),
        chunk_bits=chunk_bits,
        blk_cap=cap,
        tables=tables,
        chunk_bytes=chunk_bytes,
        n_lanes=S,
        n_blocks_total=n_blocks,
        bpm=img.blocks_per_mcu,
    )


def decode_speculative(
    img: JpegImage, chunk_bytes: int = 2048, max_iters: int | None = None
) -> np.ndarray:
    """Entropy-decode a no-restart stream on device via speculative split.

    Returns int32 [n_blocks, 64] zigzag coefficients, bit-identical to the
    oracle.  Raises JpegError on malformed streams or non-convergence.
    """
    plan = build_spec_plan(img, chunk_bytes)
    S = plan.n_lanes
    L = plan.chunk_bits.shape[0]
    xs = jnp.asarray(plan.xs)
    cbits = jnp.asarray(plan.chunk_bits)
    max_start = (plan.chunk_bytes + SPEC_OVERLAP) * 8 - 1

    start_bits = np.zeros(L, np.int32)
    start_bim = np.zeros(L, np.int32)
    blocks = None
    for _ in range(max_iters or S + 1):
        eb, ebim, blk, err, _, _ = _count_jit(
            xs, cbits, jnp.asarray(start_bits), jnp.asarray(start_bim),
            tables=plan.tables, blk_cap=plan.blk_cap,
        )
        eb = np.asarray(jax.device_get(eb))
        ebim = np.asarray(jax.device_get(ebim))
        blk = np.asarray(jax.device_get(blk))
        new_bits = start_bits.copy()
        new_bim = start_bim.copy()
        # lane i's start <- lane i-1's end, rebased into lane i's row
        new_bits[1:S] = np.clip(eb[: S - 1] - plan.chunk_bytes * 8, 0, max_start)
        new_bim[1:S] = ebim[: S - 1]
        if np.array_equal(new_bits, start_bits) and np.array_equal(
            new_bim, start_bim
        ):
            blocks = blk
            break
        start_bits, start_bim = new_bits, new_bim
    if blocks is None:
        raise JpegError("speculative split did not converge")

    quotas = blocks[:L].copy()
    quotas[S:] = 0
    last = plan.n_blocks_total - int(quotas[: S - 1].sum())
    if last <= 0 or last > plan.blk_cap or np.any(quotas[: S - 1] >= plan.blk_cap):
        raise JpegError("speculative split found inconsistent block counts")
    quotas[S - 1] = last

    per_lane, err, _ = _decode_jit(
        xs, jnp.asarray(quotas),
        tables=plan.tables, max_blk=plan.blk_cap,
        start_bits=jnp.asarray(start_bits), start_bim=jnp.asarray(start_bim),
        dc_diff=True,
    )
    if bool(jax.device_get(jnp.any(err))):
        raise JpegError("speculative decode failed (malformed scan)")
    pl = np.asarray(jax.device_get(per_lane))
    coeffs = np.concatenate([pl[i, : quotas[i]] for i in range(S)])

    # Global DPCM: DC was emitted as differences; accumulate per component.
    pattern = np.asarray(
        [c for c in plan.tables.comp], np.int32
    )
    comp_seq = np.tile(pattern, plan.n_blocks_total // plan.bpm)
    for c in range(plan.tables.n_comp):
        m = comp_seq == c
        coeffs[m, 0] = np.cumsum(coeffs[m, 0])
    return coeffs
