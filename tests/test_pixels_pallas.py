"""Fused Pallas pixel kernel == XLA pixel path, bit for bit.

The kernel (ops/pixels_pallas.py) shares the butterfly and color-math
definitions with the XLA path, so any divergence would come from the
layout prologue/epilogue or the packing — exactly what these diffs pin:
interpret-mode kernel output vs the XLA `_decode_rgb_planar_fused`
branch (rgb AND riskbits), on real decoded streams and on adversarial
coefficient tensors.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpujpeg import pipeline
from tpujpeg.io.parser import parse
from tpujpeg.oracle import decoder as oracle

from conftest import make_jpeg


def _assert_paths_agree(geom, want, got):
    """Bit-equality outside the risky mask; masks identical.

    Flagged pixels are ALLOWED to differ between compilations: the color
    proof (ops/color.py) only guarantees f32 truncation stability OUTSIDE
    the EPS band, and FMA fusion differs between the interpret-mode
    kernel and the XLA fusion.  Strict repair replaces flagged pixels
    with exact oracle math, so end-to-end output is unaffected (pinned
    by test_kernel_end_to_end_oracle).
    """
    from tpujpeg.ops.color import unpack_mask

    rgb_w, risk_w = np.asarray(want[0]), np.asarray(want[1])
    rgb_g, risk_g = np.asarray(got[0]), np.asarray(got[1])
    np.testing.assert_array_equal(risk_g, risk_w)
    safe = ~unpack_mask(risk_w, geom.width)
    np.testing.assert_array_equal(rgb_g[:, safe], rgb_w[:, safe])


def _both_paths(monkeypatch, geom, coeffs, quant, dc=None):
    coeffs = jnp.asarray(coeffs)
    quant = jnp.asarray(quant)
    dc = None if dc is None else jnp.asarray(dc)
    monkeypatch.setattr(pipeline, "_pixel_pallas_mode", lambda g: None)
    want = pipeline._decode_rgb_planar_fused(geom, coeffs, quant, dc)
    monkeypatch.setattr(pipeline, "_pixel_pallas_mode", lambda g: True)
    got = pipeline._decode_rgb_planar_fused(geom, coeffs, quant, dc)
    return want, got


@pytest.mark.parametrize("shape", [(48, 64), (64, 128), (225, 168)])
def test_kernel_matches_xla_on_streams(monkeypatch, shape):
    img = parse(make_jpeg(shape=shape, quality=85, seed=3))
    geom, coeffs, quant = pipeline.build_plan(img)
    want, got = _both_paths(monkeypatch, geom, coeffs, quant)
    _assert_paths_agree(geom, want, got)


def test_kernel_matches_xla_with_dc_side_channel(monkeypatch):
    # the fused chunk program passes DPCM diffs in coeffs[:, 0] and the
    # resolved DC on the side channel — substitute arbitrary values and
    # check both paths agree on the override semantics
    img = parse(make_jpeg(shape=(64, 80), quality=90, seed=7))
    geom, coeffs, quant = pipeline.build_plan(img)
    rng = np.random.default_rng(1)
    dc = rng.integers(-1024, 1024, coeffs.shape[0]).astype(np.int32)
    garbled = coeffs.copy()
    garbled[:, 0] = rng.integers(-2048, 2047, coeffs.shape[0])
    want, got = _both_paths(monkeypatch, geom, garbled, quant, dc)
    _assert_paths_agree(geom, want, got)


def test_kernel_extreme_coefficients(monkeypatch):
    # saturate the int ranges the IDCT contract allows: +-1023 AC,
    # +-2047 DC, high-quant tables — wraparound must match the XLA int32
    # arithmetic exactly (the reference wraps identically, idct.py NB)
    img = parse(make_jpeg(shape=(40, 48), quality=10, seed=5))
    geom, coeffs, quant = pipeline.build_plan(img)
    rng = np.random.default_rng(2)
    coeffs = rng.integers(-1023, 1024, coeffs.shape).astype(np.int16)
    coeffs[:, 0] = rng.integers(-2047, 2048, coeffs.shape[0])
    want, got = _both_paths(monkeypatch, geom, coeffs, quant)
    _assert_paths_agree(geom, want, got)


def test_kernel_end_to_end_oracle(monkeypatch):
    # full decode (strict repair on) through the interpret-mode kernel
    # must stay bit-exact vs the reference oracle
    data = make_jpeg(shape=(120, 136), quality=92, seed=9)
    img = parse(data)
    monkeypatch.setattr(pipeline, "_pixel_pallas_mode", lambda g: True)
    got = pipeline.decode(img)
    want = oracle.decode(parse(data))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_kernel_under_vmap(monkeypatch):
    # the fused chunk program calls device_decode_fn under jax.vmap —
    # pallas_call's batching rule must produce the same pixels as
    # per-image calls
    import jax

    img = parse(make_jpeg(shape=(48, 64), quality=88, seed=13))
    geom, coeffs, quant = pipeline.build_plan(img)
    rng = np.random.default_rng(3)
    batch = np.stack([coeffs, np.clip(coeffs + rng.integers(
        -2, 3, coeffs.shape), -1023, 1023).astype(coeffs.dtype)])
    quants = np.stack([quant, quant])
    monkeypatch.setattr(pipeline, "_pixel_pallas_mode", lambda g: True)
    fn = lambda c, q: pipeline._decode_rgb_planar_fused(geom, c, q)
    rgb_v, risk_v = jax.vmap(fn)(jnp.asarray(batch), jnp.asarray(quants))
    for i in range(2):
        rgb_1, risk_1 = fn(jnp.asarray(batch[i]), jnp.asarray(quants[i]))
        np.testing.assert_array_equal(np.asarray(rgb_v[i]), np.asarray(rgb_1))
        np.testing.assert_array_equal(np.asarray(risk_v[i]), np.asarray(risk_1))
