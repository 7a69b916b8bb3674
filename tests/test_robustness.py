"""Malformed-input robustness: truncations and bit flips never crash.

The reference aborts via a CUDA error check on bad input
(parser.cu:317-321); the contract here is stronger — every malformed
stream either raises JpegError or decodes to *some* image (garbage-in
garbage-out is allowed for streams whose corruption still parses), and
never crashes, hangs, or corrupts unrelated state.
"""

import numpy as np
import pytest

from tpujpeg.errors import JpegError
from tpujpeg.io.parser import parse
from tpujpeg.oracle import decoder as oracle
from tpujpeg.runtime import host

from conftest import make_jpeg


@pytest.fixture(scope="module")
def good():
    return make_jpeg(shape=(32, 40), quality=85, seed=0)


def test_truncations_never_crash(good):
    rng = np.random.default_rng(1)
    for cut in sorted(rng.integers(2, len(good) - 1, 25)):
        try:
            img = parse(good[:cut])
        except JpegError:
            continue
        try:
            host.entropy_decode(img)
        except JpegError:
            pass


def test_bit_flips_never_crash(good):
    rng = np.random.default_rng(2)
    data = bytearray(good)
    for _ in range(25):
        i = int(rng.integers(0, len(data)))
        b = 1 << int(rng.integers(0, 8))
        flipped = bytes(data[:i] + bytes([data[i] ^ b]) + data[i + 1 :])
        try:
            img = parse(flipped)
            host.entropy_decode(img)
        except JpegError:
            pass


def test_native_oracle_agree_on_corrupt_decodable(good):
    # When a corrupted stream still decodes, both host decoders must
    # agree bit-for-bit (same garbage is part of the contract).
    rng = np.random.default_rng(3)
    data = bytearray(good)
    checked = 0
    for _ in range(40):
        i = int(rng.integers(len(data) // 2, len(data)))
        flipped = bytes(data[:i] + bytes([data[i] ^ 1]) + data[i + 1 :])
        try:
            img = parse(flipped)
            a = host.entropy_decode(img)
        except JpegError:
            continue
        try:
            b = oracle.entropy_decode(img)
        except JpegError:
            # native accepted what oracle rejects (or vice versa) would be
            # a contract violation; oracle raising alone means the native
            # decoder must have raised too (it did not) -> flag it
            pytest.fail("native decoded a stream the oracle rejects")
        np.testing.assert_array_equal(a, b)
        checked += 1
    assert checked > 0
