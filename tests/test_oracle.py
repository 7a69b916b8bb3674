"""Oracle decoder tests: golden-file exactness + encode/decode properties.

Golden strategy mirrors the reference's (`testing/compare.py:37-64`): decode
each fixture and require exact equality with `testing/ground_truth/*.array`.
Property tests add what the reference lacks (SURVEY §4): PIL/libjpeg
roundtrips, restart-marker invariance, EXTEND unit coverage.
"""

import numpy as np
import pytest

from conftest import GOLDEN, fixture_path, make_jpeg, make_jpeg_rst
from tpujpeg.io.arrayio import read_array, write_array
from tpujpeg.io.parser import parse, parse_file
from tpujpeg.oracle import decoder as oracle


@pytest.mark.parametrize("name", GOLDEN)
def test_golden_exact(name):
    img = parse_file(fixture_path(name))
    rgb = oracle.decode(img)
    gt = read_array(fixture_path(name, ".array"))
    assert rgb.shape == gt.shape
    assert np.array_equal(rgb, gt), f"max diff {np.abs(rgb - gt).max()}"


def test_extend():
    # JPEG EXTEND table (ITU T.81 F.12 / reference utils.cu:34-41).
    assert oracle.extend(0, 0) == 0
    assert oracle.extend(1, 0) == -1 and oracle.extend(1, 1) == 1
    assert oracle.extend(2, 0) == -3 and oracle.extend(2, 3) == 3
    assert oracle.extend(3, 0) == -7 and oracle.extend(3, 7) == 7
    assert oracle.extend(11, 0) == -2047 and oracle.extend(11, 2047) == 2047


def test_idct_dc_only():
    # All-AC-zero block: IDCT must equal the reference's DC shortcut,
    # clip((dc*q + 32) >> 6) replicated (cpp idct.cpp:83-85).
    for dc in (-512, -100, -1, 0, 1, 77, 511):
        block = np.zeros((1, 8, 8), np.int32)
        block[0, 0, 0] = dc
        out = oracle.idct_blocks(block)
        expected = np.clip((dc * 8 + 32) >> 6, -256, 255)
        assert np.all(out == expected), (dc, out[0, 0, 0], expected)


def test_idct_matches_float_reference():
    # The integer IDCT approximates the exact float IDCT within 1 gray level
    # for in-range coefficient data.
    rng = np.random.default_rng(1)
    blocks = rng.integers(-128, 128, (32, 8, 8)).astype(np.int32)
    blocks[:, 2:, :] //= 8  # keep high-frequency energy realistic
    got = oracle.idct_blocks(blocks)

    k = np.arange(8)
    c = np.where(k == 0, 1 / np.sqrt(2), 1.0)
    basis = c[:, None] * np.cos((2 * np.arange(8)[None, :] + 1) * k[:, None] * np.pi / 16)
    # x = B^T F B / 4 (2-D IDCT)
    ref = np.einsum("ku,nkl,lv->nuv", basis, blocks.astype(np.float64), basis) / 4
    ref = np.clip(np.round(ref), -256, 255)
    assert np.abs(got - ref).max() <= 1


def test_color_conversion_range():
    y = np.arange(-256, 256, dtype=np.int32).reshape(-1, 1)
    zeros = np.zeros_like(y)
    rgb = oracle.ycbcr_to_rgb_exact(y, zeros, zeros)
    # Gray inputs: R == G == B == clamp(y + 128).
    expected = np.clip(y + 128, 0, 255)
    assert np.array_equal(rgb[..., 0], expected)
    assert np.array_equal(rgb[..., 1], expected)
    assert np.array_equal(rgb[..., 2], expected)


@pytest.mark.parametrize("quality", [60, 90, 95])
def test_roundtrip_vs_libjpeg_444(quality):
    import io

    from PIL import Image

    data = make_jpeg(shape=(48, 56), quality=quality, subsampling=0, seed=quality)
    rgb = oracle.decode(parse(data))
    pil = np.asarray(Image.open(io.BytesIO(data))).astype(np.int32)
    # Different IDCT/color rounding than libjpeg: allow small tolerance
    # (reference used TOL=8 for its float-IDCT era, compare_with_tolerance.py:7).
    assert np.abs(rgb - pil).max() <= 4


def test_roundtrip_vs_libjpeg_420():
    import io

    from PIL import Image

    data = make_jpeg(shape=(48, 56), quality=92, subsampling=2, seed=3)
    rgb = oracle.decode(parse(data))
    pil = np.asarray(Image.open(io.BytesIO(data))).astype(np.int32)
    # Box upsampling vs libjpeg fancy (triangle) upsampling differs most at
    # chroma edges; smooth content keeps it bounded.
    assert np.abs(rgb - pil).max() <= 16
    assert np.abs(rgb - pil).mean() <= 2.0


def test_grayscale_decode():
    import io

    from PIL import Image

    data = make_jpeg(shape=(40, 40), quality=90, gray=True, seed=5)
    rgb = oracle.decode(parse(data))
    pil = np.asarray(Image.open(io.BytesIO(data))).astype(np.int32)
    assert np.abs(rgb[..., 0] - pil).max() <= 4
    assert np.array_equal(rgb[..., 0], rgb[..., 1])


def test_restart_invariance():
    """Restart markers change entropy framing, not pixels."""
    import io

    import cv2
    from PIL import Image

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    params = [cv2.IMWRITE_JPEG_QUALITY, 90, cv2.IMWRITE_JPEG_SAMPLING_FACTOR,
              cv2.IMWRITE_JPEG_SAMPLING_FACTOR_444]
    _, plain = cv2.imencode(".jpg", arr[:, :, ::-1], params)
    _, rst = cv2.imencode(
        ".jpg", arr[:, :, ::-1], params + [cv2.IMWRITE_JPEG_RST_INTERVAL, 3]
    )
    img_plain = parse(plain.tobytes())
    img_rst = parse(rst.tobytes())
    assert img_plain.n_segments() == 1 and img_rst.n_segments() > 1
    assert np.array_equal(oracle.decode(img_plain), oracle.decode(img_rst))


def test_array_io_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (5, 7, 3)).astype(np.int32)
    p = str(tmp_path / "x.array")
    write_array(p, rgb)
    assert np.array_equal(read_array(p), rgb)
