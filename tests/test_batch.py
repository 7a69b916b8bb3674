"""Batch engine: bit-exactness across backends, bucketing, stats."""

import numpy as np
import pytest

from tpujpeg.oracle import decoder as oracle
from tpujpeg.io.parser import parse
from tpujpeg.runtime.batch import BatchDecoder

from conftest import make_jpeg, make_jpeg_rst


@pytest.fixture(scope="module")
def batch_data():
    return (
        [make_jpeg(shape=(48, 64), quality=q, seed=q) for q in (60, 80, 95)]
        + [make_jpeg_rst(shape=(48, 64), rst_interval=2, seed=9)]
        + [make_jpeg(shape=(32, 40), quality=85, seed=5)]  # second bucket
    )


def expected(datas):
    return [oracle.decode(parse(d)).astype(np.uint8) for d in datas]


@pytest.mark.parametrize("backend", ["host", "auto"])
def test_batch_bit_exact(batch_data, backend):
    dec = BatchDecoder(backend=backend, chunk_size=4)
    got = dec.decode(batch_data)
    for g, e in zip(got, expected(batch_data)):
        np.testing.assert_array_equal(g, e)
    assert dec.stats.n_images == len(batch_data)
    assert dec.stats.chunks >= 2  # two geometry buckets
    assert dec.stats.total_s > 0


def test_batch_fsm_backend():
    datas = [make_jpeg_rst(shape=(48, 64), rst_interval=2, seed=s) for s in (1, 2)]
    dec = BatchDecoder(backend="fsm", chunk_size=2)
    got = dec.decode(datas)
    for g, e in zip(got, expected(datas)):
        np.testing.assert_array_equal(g, e)
    assert dec.stats.backend == "fsm"


def test_batch_no_fetch(batch_data):
    dec = BatchDecoder(backend="host", chunk_size=8)
    assert dec.decode(batch_data, fetch=False) is None
    assert dec.stats.pixels == sum(
        parse(d).width * parse(d).height for d in batch_data
    )
