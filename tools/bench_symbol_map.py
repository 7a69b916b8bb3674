"""Probe: two-level symbol map (length tree + MXU nibble-bilinear lookup)
vs the production single piece tree (ops/fsm.py `_bst_tree`).

The FSM's per-step cost is dominated by the piecewise-affine
(tbl, peek16) -> (length, symbol) evaluation: ~130 pieces (one per run of
consecutive symbols per code length, SURVEY ref huffmanTree.cpp:40-53)
at 2 vector ops per piece.  This tool evaluates the alternative:

  1. a LENGTH tree with one piece per (table, code length) — ~55 leaves
     instead of ~130 — whose leaf value packs (length, adj) such that
     g = (peek >> (16-length)) + adj is a GLOBAL canonical symbol index;
  2. sym = SYMTAB[g] via a nibble-decomposed bilinear form on the MXU:
     onehot(g >> 4) @ SYMTAB2D selects the row, a masked row-sum selects
     the nibble column — no gather (Mosaic has none; PERFORMANCE.md).

Checked exhaustively against the production tree over every
(tbl, peek16) on CPU; timed per symbol-step inside a lax.scan on
whatever backend is active (run on the real chip: MXU-in-scan overhead
is the open question).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/tpujpeg-jax-cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

INVALID_LEN = 31


def build_length_map(tables_by_tbl):
    """Per-(table, length) pieces + the global symbol table.

    tables_by_tbl: list of 4 HuffmanTable (dc0, dc1, ac0, ac1 order, as
    ops/fsm.py tbl ids).  Returns (keys, vals, symtab) where keys/vals
    are the sorted length-tree pieces over (tbl<<16|peek) and
    vals pack (length << 18) | (adj + 0x20000), adj mapping
    code -> global symbol index; symtab[g] is the symbol byte.
    """
    keys, vals, symtab = [], [], []
    for tbl, table in enumerate(tables_by_tbl):
        counts = np.asarray(table.counts, np.int64)
        symbols = np.asarray(table.symbols, np.int64)
        code = 0
        k = 0
        cover_end = 0
        for length in range(1, 17):
            n = int(counts[length - 1])
            if n:
                adj = len(symtab) - code  # g = code + adj
                keys.append((tbl << 16) | (code << (16 - length)))
                vals.append((length << 18) | (adj + 0x20000))
                symtab.extend(int(s) for s in symbols[k : k + n])
                k += n
                code += n
                cover_end = code << (16 - length)
            code <<= 1
        if cover_end < (1 << 16):
            keys.append((tbl << 16) | cover_end)
            vals.append((INVALID_LEN << 18) | 0x20000)
    return tuple(keys), tuple(vals), np.asarray(symtab, np.int32)


def main():
    import jax
    import jax.numpy as jnp

    from tpujpeg.io.parser import parse
    from tpujpeg.ops import fsm
    from bench import _make_image, _encode

    print(f"platform={jax.devices()[0].platform}")
    img = parse(_encode(_make_image(64, 0), 90, 1))
    t = fsm.build_tables(img)
    dc0 = img.huffman[img.components[0].dc_table_id]
    ac0 = img.huffman[0x10 | img.components[0].ac_table_id]
    dc1 = img.huffman[img.components[1].dc_table_id]
    ac1 = img.huffman[0x10 | img.components[1].ac_table_id]
    keys, vals, symtab = build_length_map([dc0, dc1, ac0, ac1])
    G = symtab.size
    H = -(-G // 16)
    symtab2d = np.zeros((H, 16), np.int32)
    symtab2d.reshape(-1)[:G] = symtab
    print(f"pieces: production {len(t.piece_keys)} vs length-map {len(keys)}; "
          f"G={G} H={H}")

    lo_iota = jnp.arange(16, dtype=jnp.int32)
    hi_iota = jnp.arange(H, dtype=jnp.int32)
    tab_bf = jnp.asarray(symtab2d, jnp.bfloat16)

    def twolevel(key):
        packed = fsm._bst_tree(key, keys, vals)
        length = packed >> 18
        adj = (packed & 0x3FFFF) - 0x20000
        peek = key & 0xFFFF
        code = peek >> jnp.clip(16 - length, 0, 16)
        g = jnp.where(length <= 16, code + adj, 0)
        oh_hi = (g[:, None] >> 4 == hi_iota[None, :]).astype(jnp.bfloat16)
        row = oh_hi @ tab_bf                               # [L, 16] MXU
        oh_lo = (g[:, None] & 15 == lo_iota[None, :])
        sym = jnp.sum(jnp.where(oh_lo, row, 0), axis=1).astype(jnp.int32)
        return length, jnp.where(length <= 16, sym, 0)

    def production(key):
        packed = fsm._bst_tree(key, t.piece_keys, t.piece_vals)
        length = packed >> 17
        base = (packed & 0x1FFFF) - 0x10000
        peek = key & 0xFFFF
        code = peek >> jnp.clip(16 - length, 0, 16)
        sym = (base + code) & 0xFF
        return length, jnp.where(length <= 16, sym, 0)

    # -- exhaustive equivalence over every (tbl, peek) -----------------------
    ok = True
    f2 = jax.jit(twolevel)
    f1 = jax.jit(production)
    for tbl in range(4):
        key = (jnp.arange(1 << 16, dtype=jnp.int32)) | (tbl << 16)
        l2, s2 = (np.asarray(x) for x in f2(key))
        l1, s1 = (np.asarray(x) for x in f1(key))
        same_l = np.array_equal(l1, l2)
        # symbols only matter where the length is valid
        valid = l1 <= 16
        same_s = np.array_equal(s1[valid], s2[valid])
        print(f"tbl {tbl}: lengths equal {same_l}, symbols equal {same_s}")
        ok &= same_l and same_s
    print("EXHAUSTIVE MATCH" if ok else "MISMATCH")

    # -- per-step cost inside a scan (the production shape) ------------------
    L = 5120
    steps = 512
    rng = np.random.default_rng(0)
    ks = jnp.asarray(rng.integers(0, 4 << 16, (steps, L)).astype(np.int32))

    def run(fn, xs):
        def body(c, k):
            length, sym = fn(k ^ (c & 1))  # serial dependence on the carry
            return c + length + sym, ()
        out, _ = jax.lax.scan(body, jnp.zeros(L, jnp.int32), xs)
        return out

    for name, fn in (("production tree", production), ("two-level+MXU", twolevel)):
        g = jax.jit(lambda xs, fn=fn: run(fn, xs))
        np.asarray(jax.device_get(g(ks)[:1]))  # compile+warm
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(g(ks)[:1]))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:<20s} {best*1e3:8.2f} ms for {steps} steps x {L} lanes "
              f"({best/steps*1e6:6.2f} us/step)")


if __name__ == "__main__":
    main()
