"""Size-class bucketed decode: recompile-free mixed-size batches.

The reference decodes any image size with one compiled binary (dims are
runtime values, cuda-decoder/src/parser.cu:324-331); the XLA answer is
pad-to-bucket MCU grids (pipeline.bucket_geometry) with true extents as
runtime scalars.  Contract here: a mixed-size manifest decodes bit-exact
vs the oracle while compiling one pixel program PER BUCKET, not per size.
"""

import numpy as np
import pytest

from tpujpeg.io.parser import parse
from tpujpeg.oracle import decoder as oracle
from tpujpeg.pipeline import Geometry, bucket_geometry, bucket_up
from tpujpeg.runtime.batch import BatchDecoder

from conftest import make_jpeg


def test_bucket_ladder():
    # monotone, >= n, and reused across nearby sizes
    prev = 0
    for n in range(1, 400):
        b = bucket_up(n)
        assert b >= n
        assert b >= prev
        prev = b
    # ladder values are sparse: 1..256 maps to a handful of classes
    classes = {bucket_up(n) for n in range(1, 257)}
    assert len(classes) <= 16


def test_bucket_geometry_shares_classes():
    imgs = [
        parse(make_jpeg(shape=s, seed=i))
        for i, s in enumerate([(64, 80), (60, 88), (50, 80), (64, 82)])
    ]
    buckets = {bucket_geometry(Geometry.of(im)) for im in imgs}
    # 4 distinct exact geometries, one shared bucket class
    assert len({Geometry.of(im) for im in imgs}) == 4
    assert len(buckets) == 1


def _roundtrip(datas, **kw):
    dec = BatchDecoder(size_buckets=True, chunk_size=4, **kw)
    out = dec.decode(datas)
    assert all("bucketed" in b for b in dec.stats.backend.split("+"))
    return out, dec


@pytest.mark.parametrize("backend", ["oracle", "host"])
def test_mixed_sizes_match_oracle(backend):
    shapes = [(64, 80), (60, 88), (57, 41), (120, 56), (48, 64), (64, 80)]
    datas = [
        make_jpeg(shape=s, quality=88, seed=i) for i, s in enumerate(shapes)
    ]
    out, _ = _roundtrip(datas, backend=backend)
    for data, got in zip(datas, out):
        ref = oracle.decode(parse(data))
        assert got.shape == ref.shape
        np.testing.assert_array_equal(got, ref.astype(np.uint8))


def test_bucketed_subsampled_fancy_matches_exact():
    # 4:2:0 + fancy triangle upsampling: the hard case — bucket padding
    # sits right past the true sample extent, and the filter's bottom/
    # right replication edges must move to the TRUE extent (runtime
    # scalars) to stay bit-identical to the exact-geometry decode.
    shapes = [(40, 56), (56, 40), (34, 50)]
    datas = [
        make_jpeg(shape=s, quality=85, seed=7 + i, subsampling=2)
        for i, s in enumerate(shapes)
    ]
    out, _ = _roundtrip(datas, backend="host", fancy=True)
    for data, got in zip(datas, out):
        ref = oracle.decode(parse(data), fancy=True)
        np.testing.assert_array_equal(got, ref.astype(np.uint8))


def test_bucketed_grayscale():
    datas = [
        make_jpeg(shape=(40, 56), seed=3, gray=True),
        make_jpeg(shape=(48, 48), seed=4, gray=True),
    ]
    out, _ = _roundtrip(datas, backend="host")
    for data, got in zip(datas, out):
        ref = oracle.decode(parse(data))
        np.testing.assert_array_equal(got, ref.astype(np.uint8))


def test_bucketed_compile_count_bounded():
    # many distinct sizes, one bucket class -> ONE pixel-program compile
    from tpujpeg.parallel import sharding

    shapes = [(64, 80), (60, 88), (50, 80), (64, 82), (58, 86), (52, 84)]
    datas = [make_jpeg(shape=s, seed=i) for i, s in enumerate(shapes)]
    before = sharding.compiled_batch_decoder.cache_info().currsize
    out, dec = _roundtrip(datas, backend="host")
    after = sharding.compiled_batch_decoder.cache_info().currsize
    assert after - before <= 1  # <= because an earlier test may share it
    assert len(out) == len(datas)


def test_bucketed_skip_mode_isolates_bad_stream():
    datas = [
        make_jpeg(shape=(64, 80), seed=1),
        make_jpeg(shape=(60, 88), seed=2)[:200],  # truncated mid-scan
        make_jpeg(shape=(50, 80), seed=3),
    ]
    dec = BatchDecoder(backend="host", size_buckets=True, chunk_size=4)
    out = dec.decode(datas, on_error="skip")
    assert out[1] is None and 1 in dec.stats.failures
    for i in (0, 2):
        ref = oracle.decode(parse(datas[i]))
        np.testing.assert_array_equal(out[i], ref.astype(np.uint8))


def test_size_buckets_rejects_fsm_backend():
    with pytest.raises(ValueError):
        BatchDecoder(backend="fsm", size_buckets=True)
