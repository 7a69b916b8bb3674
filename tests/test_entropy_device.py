"""Device-side lockstep-lane entropy decoder == oracle, bit for bit."""

import numpy as np
import pytest

from tpujpeg.io.parser import parse, parse_file
from tpujpeg.ops.entropy import build_segment_plan, entropy_decode_device
from tpujpeg.oracle import decoder as oracle

from conftest import GOLDEN, fixture_path, make_jpeg, make_jpeg_rst


def oracle_batch(imgs):
    return np.concatenate([oracle.entropy_decode(im) for im in imgs])


@pytest.mark.parametrize("rst", [1, 3, 5])
def test_device_matches_oracle_restart(rst):
    img = parse(make_jpeg_rst(shape=(48, 64), rst_interval=rst, seed=rst))
    assert img.n_segments() > 1
    np.testing.assert_array_equal(
        entropy_decode_device([img]), oracle.entropy_decode(img)
    )


def test_device_matches_oracle_single_segment():
    img = parse(make_jpeg(shape=(40, 56), quality=85, seed=2))
    assert img.n_segments() == 1
    np.testing.assert_array_equal(
        entropy_decode_device([img]), oracle.entropy_decode(img)
    )


def test_device_matches_oracle_batch_mixed_segments():
    imgs = [
        parse(make_jpeg_rst(shape=(48, 64), rst_interval=2, seed=7)),
        parse(make_jpeg(shape=(48, 64), quality=70, seed=8)),
        parse(make_jpeg_rst(shape=(48, 64), rst_interval=4, seed=9)),
    ]
    np.testing.assert_array_equal(entropy_decode_device(imgs), oracle_batch(imgs))


@pytest.mark.parametrize("name", GOLDEN[:3])
def test_device_matches_oracle_fixture(name):
    img = parse_file(fixture_path(name))
    np.testing.assert_array_equal(
        entropy_decode_device([img]), oracle.entropy_decode(img)
    )


@pytest.mark.parametrize("subsampling", [1, 2])
def test_device_matches_oracle_subsampled(subsampling):
    img = parse(make_jpeg(shape=(48, 64), subsampling=subsampling, seed=4))
    np.testing.assert_array_equal(
        entropy_decode_device([img]), oracle.entropy_decode(img)
    )


def test_device_matches_oracle_grayscale():
    img = parse(make_jpeg(shape=(40, 48), gray=True, seed=5))
    np.testing.assert_array_equal(
        entropy_decode_device([img]), oracle.entropy_decode(img)
    )


def test_device_flags_garbage():
    from tpujpeg.errors import JpegError

    img = parse(make_jpeg_rst(shape=(48, 64), rst_interval=2, seed=11))
    img.scan_data = img.scan_data[: img.scan_data.size // 4].copy()
    img.segment_offsets = img.segment_offsets[
        img.segment_offsets < img.scan_data.size
    ]
    with pytest.raises(JpegError):
        entropy_decode_device([img])


def test_plan_lane_padding():
    img = parse(make_jpeg_rst(shape=(48, 64), rst_interval=2, seed=1))
    plan = build_segment_plan([img])
    assert plan.seg_start_bits.shape[0] % 64 == 0
    assert plan.cap % 256 == 0
    assert plan.scan.size % (1 << 16) == 0
