"""Native C++ host entropy decoder == NumPy oracle, bit for bit."""

import numpy as np
import pytest

from tpujpeg.io.parser import parse, parse_file
from tpujpeg.oracle import decoder as oracle

from conftest import GOLDEN, fixture_path, make_jpeg, make_jpeg_rst


@pytest.fixture(scope="module")
def native():
    from tpujpeg.runtime.native import lib

    return lib.load()


def test_native_builds_and_loads(native):
    assert native is not None


@pytest.mark.parametrize("name", GOLDEN)
def test_native_matches_oracle_fixtures(native, name):
    img = parse_file(fixture_path(name))
    np.testing.assert_array_equal(
        native.entropy_decode(img), oracle.entropy_decode(img)
    )


@pytest.mark.parametrize("subsampling", [0, 1, 2])
@pytest.mark.parametrize("smooth", [True, False])
def test_native_matches_oracle_synthetic(native, subsampling, smooth):
    data = make_jpeg(
        shape=(56, 72), quality=85, subsampling=subsampling, seed=3, smooth=smooth
    )
    img = parse(data)
    np.testing.assert_array_equal(
        native.entropy_decode(img), oracle.entropy_decode(img)
    )


def test_native_matches_oracle_grayscale(native):
    img = parse(make_jpeg(shape=(40, 48), gray=True, seed=5))
    np.testing.assert_array_equal(
        native.entropy_decode(img), oracle.entropy_decode(img)
    )


@pytest.mark.parametrize("rst", [1, 2, 7])
def test_native_matches_oracle_restart(native, rst):
    img = parse(make_jpeg_rst(shape=(48, 64), rst_interval=rst, seed=rst))
    assert img.restart_interval == rst
    assert img.n_segments() > 1
    np.testing.assert_array_equal(
        native.entropy_decode(img), oracle.entropy_decode(img)
    )


def test_native_rejects_garbage(native):
    from tpujpeg.errors import JpegError

    img = parse(make_jpeg(shape=(32, 32), seed=1))
    img.scan_data = img.scan_data[: img.scan_data.size // 8].copy()
    with pytest.raises(JpegError):
        native.entropy_decode(img)


def test_native_int16_output(native):
    img = parse(make_jpeg_rst(shape=(48, 64), rst_interval=2, seed=3))
    out16 = np.zeros((img.n_mcus * img.blocks_per_mcu, 64), np.int16)
    native.entropy_decode(img, out=out16)
    np.testing.assert_array_equal(
        out16.astype(np.int32), oracle.entropy_decode(img)
    )


def _dc_runaway_image():
    """A gray image whose scan is rewritten so the DC predictor walks past
    int16 range: every block is [DC size-11, magnitude 2047, EOB].
    Corrupt-but-decodable — conformant streams keep |DC| <= 2047."""
    img = parse(make_jpeg(shape=(32, 48), gray=True, seed=2))
    dc = img.huffman[0x00]
    ac = img.huffman[0x10]
    assert dc.lengths[11] > 0  # Annex K DC tables define size 11

    bits: list[int] = []

    def put(code: int, length: int):
        for i in range(length - 1, -1, -1):
            bits.append((code >> i) & 1)

    n_blocks = img.n_mcus * img.blocks_per_mcu
    for _ in range(n_blocks):
        put(int(dc.codes[11]), int(dc.lengths[11]))
        put((1 << 11) - 1, 11)          # magnitude 2047 -> EXTEND +2047
        put(int(ac.codes[0]), int(ac.lengths[0]))  # EOB
    while len(bits) % 8:
        bits.append(1)
    data = np.packbits(np.asarray(bits, np.uint8))
    img.scan_data = data
    img.segment_offsets = np.array([0], np.int64)
    return img, n_blocks


def test_native_int16_dc_overflow_flagged(native):
    # round-1 advisor: the int16 path silently wrapped when a corrupt
    # stream walked the DC predictor out of range, diverging from the
    # int32 oracle.  It must now raise Int16RangeError instead.
    from tpujpeg.runtime.native.lib import Int16RangeError

    img, n_blocks = _dc_runaway_image()
    assert n_blocks * 2047 > 32767  # the walk really escapes int16
    want = oracle.entropy_decode(img)
    assert int(want[:, 0].max()) > 32767
    np.testing.assert_array_equal(native.entropy_decode(img), want)  # int32 ok
    out16 = np.zeros((n_blocks, 64), np.int16)
    with pytest.raises(Int16RangeError):
        native.entropy_decode(img, out=out16)


def test_batch_int16_overflow_retries_on_int32():
    # the batch engine must transparently redo such a chunk at int32 and
    # still return oracle-identical pixels
    from tpujpeg.runtime.batch import BatchDecoder

    img, _ = _dc_runaway_image()
    dec = BatchDecoder(backend="host", chunk_size=2, strict=False)
    got = dec.decode_parsed([img])
    want = oracle.decode(img).astype(np.uint8)
    np.testing.assert_array_equal(got[0], want)


# -- native destuff == NumPy destuff ------------------------------------------


def _numpy_destuff(sub):
    """Run destuff_scan's NumPy tail with the native fast path disabled."""
    from tpujpeg.io import destuff as D

    old = D._native, D._native_checked
    D._native, D._native_checked = None, True
    try:
        return D.destuff_scan(sub, 0)
    finally:
        D._native, D._native_checked = old


def _edge_streams():
    mk = lambda *bs: np.asarray(bs, np.uint8)  # noqa: E731
    return [
        mk(1, 2, 0xFF, 0x00, 3, 0xFF, 0xD9),          # stuffed byte
        mk(0xFF, 0xD0, 1, 2, 0xFF, 0xD9),              # opens with RST
        mk(0xFF, 0xFF, 0xD9),                          # fill byte then EOI
        mk(1, 0xFF, 0xFF, 0x00, 2, 0xFF, 0xD9),        # fill then stuffed
        mk(1, 2, 3, 0xFF, 0xD1, 0xFF, 0xD2, 0xFF, 0xD9),  # two RSTs
        mk(0xFF, 0xD7, 0xFF, 0xD9),                    # RST then EOI
    ]


def test_native_destuff_matches_numpy(native):
    from tpujpeg.errors import JpegError

    for i, sub in enumerate(_edge_streams()):
        a = native.destuff(sub)
        b = _numpy_destuff(sub)
        assert np.array_equal(a[0], b[0]), f"scan bytes differ (case {i})"
        assert np.array_equal(a[1], b[1]), f"segment offsets differ (case {i})"
    # error cases agree (no terminator / lone trailing 0xFF)
    for sub in (np.asarray([1, 2, 3], np.uint8), np.asarray([1, 0xFF], np.uint8)):
        with pytest.raises(JpegError):
            native.destuff(sub)
        with pytest.raises(JpegError):
            _numpy_destuff(sub)


def test_native_destuff_matches_numpy_real_scans(native):
    for rst, q in ((0, 90), (1, 90), (3, 50)):
        data = (
            make_jpeg_rst((96, 96), rst_interval=rst, quality=q)
            if rst
            else make_jpeg((96, 96), quality=q, smooth=False)
        )
        # run the full parse through each destuff path and compare
        from tpujpeg.io.parser import parse as _parse
        from tpujpeg.io import destuff as D

        old = D._native, D._native_checked
        try:
            D._native, D._native_checked = native, True
            img_n = _parse(data)
            D._native = None
            img_p = _parse(data)
        finally:
            D._native, D._native_checked = old
        assert np.array_equal(img_n.scan_data, img_p.scan_data)
        assert np.array_equal(img_n.segment_offsets, img_p.segment_offsets)


# -- full native pixel stage (pixels.cpp): complete CPU decode ----------------


@pytest.mark.parametrize("name", GOLDEN)
def test_native_cpu_decode_matches_goldens(native, name):
    from tpujpeg.io.arrayio import read_array
    from tpujpeg.runtime import host

    img = parse_file(fixture_path(name))
    got = host.decode_cpu(img)
    gt = read_array(fixture_path(name, ".array"))
    np.testing.assert_array_equal(got.astype(np.int32), gt)


@pytest.mark.parametrize("subsampling", [0, 1, 2])
@pytest.mark.parametrize("fancy", [False, True])
def test_native_pixels_match_oracle(native, subsampling, fancy):
    img = parse(
        make_jpeg(shape=(57, 41), quality=88, seed=9, subsampling=subsampling,
                  smooth=False)
    )
    from tpujpeg.runtime import host

    got = host.decode_cpu(img, fancy=fancy)
    np.testing.assert_array_equal(
        got.astype(np.int32), oracle.decode(img, fancy=fancy)
    )


def test_native_pixels_grayscale_and_int32(native):
    from tpujpeg.runtime import host

    img = parse(make_jpeg(shape=(48, 48), quality=90, seed=5, gray=True))
    got = host.decode_cpu(img)
    np.testing.assert_array_equal(got.astype(np.int32), oracle.decode(img))
    # int32 coefficient path (the Int16RangeError fallback shape)
    coeffs32 = native.entropy_decode(img)
    assert coeffs32.dtype == np.int32
    got32 = native.pixels(img, coeffs32)
    np.testing.assert_array_equal(got32, got)


# -- speculative self-sync path (no restart markers) -------------------------


@pytest.fixture()
def spec_forced(monkeypatch):
    """Route every no-restart scan through the speculative parallel
    decoder (entropy.cpp decode_noseg_spec), whatever its size."""
    monkeypatch.setenv("TPJ_SPEC_MIN_BYTES", "64")


@pytest.mark.parametrize("subsampling", [0, 1, 2])
def test_native_spec_matches_oracle(native, spec_forced, subsampling):
    img = parse(
        make_jpeg(shape=(120, 152), quality=90, subsampling=subsampling, seed=11)
    )
    assert img.restart_interval == 0
    np.testing.assert_array_equal(
        native.entropy_decode(img), oracle.entropy_decode(img)
    )
    out16 = np.zeros((img.n_mcus * img.blocks_per_mcu, 64), np.int16)
    native.entropy_decode(img, out=out16)
    np.testing.assert_array_equal(
        out16.astype(np.int32), oracle.entropy_decode(img)
    )


def test_native_spec_grayscale(native, spec_forced):
    img = parse(make_jpeg(shape=(104, 120), gray=True, seed=12))
    np.testing.assert_array_equal(
        native.entropy_decode(img), oracle.entropy_decode(img)
    )


def test_native_spec_error_parity_truncated(native, spec_forced):
    from tpujpeg.errors import JpegError

    img = parse(make_jpeg(shape=(96, 96), seed=13))
    img.scan_data = img.scan_data[: img.scan_data.size // 8].copy()
    with pytest.raises(JpegError):
        native.entropy_decode(img)


def test_native_spec_dc_runaway_int16(native, spec_forced):
    """The adopted-suffix DC accumulation must surface int16 predictor
    overflow exactly like the serial path (store_dc is shared)."""
    from tpujpeg.runtime.native.lib import Int16RangeError

    img, n_blocks = _dc_runaway_image()
    out16 = np.zeros((n_blocks, 64), np.int16)
    with pytest.raises(Int16RangeError):
        native.entropy_decode(img, out=out16)
    # ...and the int32 path decodes it, == oracle
    np.testing.assert_array_equal(
        native.entropy_decode(img), oracle.entropy_decode(img)
    )


def _oracle_pixels(img, coeffs, fancy=False):
    natural = oracle.dequantize(img, coeffs)
    pixels = oracle.idct_blocks(natural)
    planes = oracle.assemble_planes(img, pixels, fancy=fancy)
    if len(planes) == 1:
        yp = planes[0][: img.height, : img.width]
        zeros = np.zeros_like(yp)
        return oracle.ycbcr_to_rgb_exact(yp, zeros, zeros)
    yp, cbp, crp = (p[: img.height, : img.width] for p in planes)
    return oracle.ycbcr_to_rgb_exact(yp, cbp, crp)


@pytest.mark.parametrize("mag", [1 << 12, 1 << 20])
def test_native_pixels_extreme_coefficients(native, mag):
    """Adversarial coefficient magnitudes (corrupt-stream garbage) stay
    bit-identical to the oracle.  The SoA IDCT keeps int64 intermediates
    unconditionally: exact worst-case L1 analysis of the butterfly
    schedule bounds the provably-overflow-safe dequantized magnitude of
    an int32 variant at 151, so any int32 fast path would be UB here."""
    img = parse(
        make_jpeg(shape=(40, 56), quality=75, seed=3, subsampling=2)
    )
    nb = img.n_mcus * sum(c.h * c.v for c in img.components)
    rng = np.random.default_rng(7)
    coeffs = rng.integers(-mag, mag + 1, size=(nb, 64), dtype=np.int32)
    coeffs[0] = mag  # uniform worst-sign rows
    coeffs[1] = -mag
    coeffs[2] = mag * (1 - 2 * (np.arange(64, dtype=np.int32) & 1))
    coeffs[3] = 0  # DC-only shortcut row...
    coeffs[3, 0] = mag  # ...at extreme DC
    for fancy in (False, True):
        got = native.pixels(img, coeffs, fancy=fancy)
        np.testing.assert_array_equal(
            got.astype(np.int32), _oracle_pixels(img, coeffs, fancy=fancy)
        )
