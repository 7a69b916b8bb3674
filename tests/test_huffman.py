"""Unit tests for canonical Huffman table construction and decode LUTs."""

import numpy as np
import pytest

from tpujpeg.io.huffman import HuffmanTable, parse_dht_payload


def _table(counts, symbols):
    return HuffmanTable(
        counts=np.array(counts, np.uint8), symbols=np.array(symbols, np.uint8)
    )


def test_canonical_codes_simple():
    # lengths: one 1-bit code, two 3-bit codes -> canonical: 0, 100, 101
    t = _table([1, 0, 2] + [0] * 13, [7, 3, 9])
    assert t.lengths[7] == 1 and t.codes[7] == 0b0
    assert t.lengths[3] == 3 and t.codes[3] == 0b100
    assert t.lengths[9] == 3 and t.codes[9] == 0b101


def test_lut_matches_linear_scan():
    # A denser, realistic DC-style table.
    counts = [0, 2, 3, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    symbols = [0, 1, 2, 3, 4, 5, 6, 7]
    t = _table(counts, symbols)
    lut_sym, lut_len = t.build_lut(16)
    rng = np.random.default_rng(0)
    for peek in rng.integers(0, 1 << 16, 200):
        peek = int(peek)
        if lut_len[peek] == 0:
            with pytest.raises(ValueError):
                t.decode_one(peek)
        else:
            sym, length = t.decode_one(peek)
            assert sym == lut_sym[peek] and length == lut_len[peek]


def test_lut_prefix_property():
    counts = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    symbols = list(range(12))
    t = _table(counts, symbols)
    lut_sym, lut_len = t.build_lut(16)
    # Every window starting with a valid code decodes to that code.
    for sym in symbols:
        length = int(t.lengths[sym])
        lo = int(t.codes[sym]) << (16 - length)
        assert lut_sym[lo] == sym
        assert lut_len[lo + (1 << (16 - length)) - 1] == length


def test_oversubscribed_rejected():
    with pytest.raises(ValueError):
        _table([3] + [0] * 15, [1, 2, 3])  # three 1-bit codes


def test_parse_dht_multiple_tables():
    # Two tables in one payload: 0x00 (DC) and 0x10 (AC).
    payload = bytes(
        [0x00] + [1] + [0] * 15 + [5] + [0x10] + [0, 2] + [0] * 14 + [1, 2]
    )
    tables = parse_dht_payload(payload)
    assert set(tables) == {0x00, 0x10}
    assert tables[0x00].lengths[5] == 1
    assert tables[0x10].lengths[1] == 2 and tables[0x10].lengths[2] == 2
