"""Device-pipeline tests: bit-exactness vs oracle and golden files.

Runs on the CPU backend (conftest) with small geometries — XLA compiles on
this box are slow, so the golden sweep over all fixtures lives in the
nightly-ish test_pipeline_golden_all marker, while the default suite covers
one golden fixture + synthetic streams (4:2:0, RST, grayscale).
"""

import numpy as np
import pytest

from conftest import fixture_path, make_jpeg, make_jpeg_rst
from tpujpeg import pipeline
from tpujpeg.io.arrayio import read_array
from tpujpeg.io.parser import parse, parse_file
from tpujpeg.oracle import decoder as oracle


def _check_vs_oracle(data: bytes):
    img = parse(data)
    got = pipeline.decode(img)
    want = oracle.decode(img)
    assert np.array_equal(got, want), (
        f"device != oracle: {int((got != want).sum())} px, "
        f"max diff {np.abs(got - want).max()}"
    )


def test_golden_fixture_exact():
    img = parse_file(fixture_path("3_120x120"))
    rgb = pipeline.decode(img)
    gt = read_array(fixture_path("3_120x120", ".array"))
    assert np.array_equal(rgb, gt)


def test_444_vs_oracle():
    _check_vs_oracle(make_jpeg(shape=(48, 64), quality=88, subsampling=0, seed=11))


def test_420_vs_oracle():
    _check_vs_oracle(make_jpeg(shape=(48, 64), quality=90, subsampling=2, seed=12))


def test_422_vs_oracle():
    _check_vs_oracle(make_jpeg(shape=(48, 64), quality=85, subsampling=1, seed=13))


def test_gray_vs_oracle():
    _check_vs_oracle(make_jpeg(shape=(48, 64), quality=90, gray=True, seed=14))


def test_odd_dims_vs_oracle():
    # Non-multiple-of-8 dims exercise the pad/crop path (reference quirk,
    # SURVEY §2: fixtures 225x168, 401x363).
    _check_vs_oracle(make_jpeg(shape=(41, 53), quality=90, subsampling=0, seed=15))


def test_rst_vs_oracle():
    _check_vs_oracle(make_jpeg_rst(shape=(48, 64), rst_interval=3, seed=16))


def test_noise_image_repair_path():
    # Noisy content maximizes flagged color-boundary pixels; this exercises
    # the host repair path end to end.
    _check_vs_oracle(make_jpeg(shape=(48, 64), quality=95, smooth=False, seed=17))


def test_strict_flag_rate_sane():
    img = parse(make_jpeg(shape=(48, 64), seed=18))
    geom, coeffs, quant = pipeline.build_plan(img)
    import jax.numpy as jnp

    from tpujpeg.ops.color import unpack_mask

    _, riskbits = pipeline._compiled(geom)(jnp.asarray(coeffs), jnp.asarray(quant))
    mask = unpack_mask(np.asarray(riskbits), img.width)
    # Flagged fraction should be small (few %), never the whole image.
    assert mask.mean() < 0.2
