"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import make_jpeg
from tpujpeg import pipeline
from tpujpeg.io.parser import parse
from tpujpeg.oracle import decoder as oracle
from tpujpeg.parallel import sharding


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


def test_batch_sharded_decode(eight_devices):
    # 8 images of one size class, sharded one per device.
    datas = [make_jpeg(shape=(24, 32), quality=88, seed=100 + i) for i in range(8)]
    imgs = [parse(d) for d in datas]
    plans = [pipeline.build_plan(im) for im in imgs]
    geom = plans[0][0]
    assert all(p[0] == geom for p in plans)
    coeffs = jnp.stack([jnp.asarray(p[1]) for p in plans])
    quant = jnp.stack([jnp.asarray(p[2]) for p in plans])

    mesh = sharding.make_mesh(n_batch=8, n_stripe=1)
    fn = sharding.compiled_batch_decoder(geom, mesh)
    rgb, risk, total = fn(coeffs, quant)
    assert rgb.shape == (8, 3, 24, 32)  # device layout is planar
    assert int(total) == 8 * 24 * 32  # psum across the mesh

    # Every image matches its single-device decode bit-for-bit (pre-repair).
    for i, im in enumerate(imgs):
        single_rgb, single_risk = pipeline._compiled(geom)(
            jnp.asarray(plans[i][1]), jnp.asarray(plans[i][2])
        )
        assert np.array_equal(np.asarray(rgb[i]), np.asarray(single_rgb))
        assert np.array_equal(np.asarray(risk[i]), np.asarray(single_risk))


def test_stripe_sharded_decode_exact(eight_devices):
    # One taller image, MCU rows sharded over 8 stripes: must equal oracle.
    data = make_jpeg(shape=(64, 48), quality=90, seed=42)  # 8 MCU rows
    img = parse(data)
    mesh = sharding.make_mesh(n_batch=1, n_stripe=8)
    rgb = sharding.decode_striped(img, mesh=mesh)
    want = oracle.decode(img)
    assert np.array_equal(rgb, want)


def test_stripe_sharded_subsampled(eight_devices):
    # 4:2:0: MCU height 16 -> 4 stripes of 2 MCU rows for a 128-row image.
    data = make_jpeg(shape=(128, 32), quality=90, subsampling=2, seed=43)
    img = parse(data)
    mesh = sharding.make_mesh(n_batch=2, n_stripe=4)
    rgb = sharding.decode_striped(img, mesh=mesh)
    want = oracle.decode(img)
    assert np.array_equal(rgb, want)


def test_stripe_requires_divisibility(eight_devices):
    data = make_jpeg(shape=(24, 32), quality=88, seed=44)  # 3 MCU rows
    img = parse(data)
    mesh = sharding.make_mesh(n_batch=4, n_stripe=2)
    with pytest.raises(ValueError, match="not divisible"):
        sharding.decode_striped(img, mesh=mesh)
