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
