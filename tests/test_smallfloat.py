"""SmallFloat port tests — mirrors TestSmallFloat round-trip strategy
(lucene/core/src/test/org/apache/lucene/util/TestSmallFloat.java)."""

import numpy as np
import pytest

from lucene_solr_8_7_0_spark.functions.smallfloat import (
    LENGTH_TABLE,
    NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
    int_to_byte4_np,
    long_to_int4,
    int4_to_long,
)


def test_constants():
    # longToInt4(Integer.MAX_VALUE) == 231 => 255-231 == 24 free values
    assert long_to_int4(2**31 - 1) == 231
    assert NUM_FREE_VALUES == 24


def test_small_values_exact():
    # values below 24 encode as themselves; exact up to 39 per SmallFloat docs
    for i in range(40):
        assert byte4_to_int(int_to_byte4(i)) == i


def test_monotonic_and_lossy_roundtrip():
    prev_b, prev_dec = -1, -1
    for i in list(range(0, 4096)) + [2**k for k in range(12, 31)] + [2**31 - 1]:
        b = int_to_byte4(i)
        dec = byte4_to_int(b)
        assert 0 <= b <= 255
        assert dec <= i  # decoded value never exceeds input
        assert b >= prev_b  # encoding is monotonic
        if b == prev_b:
            assert dec == prev_dec
        prev_b, prev_dec = b, dec
        # re-encoding the decoded value gives the same byte (idempotent)
        assert int_to_byte4(dec) == b


def test_int4_roundtrip():
    for i in list(range(0, 2000)) + [2**k - 1 for k in range(4, 32)]:
        enc = long_to_int4(i)
        dec = int4_to_long(enc)
        assert dec <= i
        assert long_to_int4(dec) == enc


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    vals = np.concatenate(
        [
            np.arange(0, 300),
            rng.integers(0, 2**31 - 1, size=5000),
            np.array([0, 23, 24, 25, 39, 40, 2**31 - 1]),
        ]
    )
    vec = int_to_byte4_np(vals)
    scalar = np.array([int_to_byte4(int(v)) for v in vals])
    np.testing.assert_array_equal(vec, scalar)


def test_length_table():
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE[0] == 0.0
    for b in range(256):
        # Java's LENGTH_TABLE is float[]: the decoded int is rounded to f32
        assert LENGTH_TABLE[b] == np.float32(byte4_to_int(b))
    # strictly non-decreasing
    assert (np.diff(LENGTH_TABLE) >= 0).all()


def test_negative_rejected():
    with pytest.raises(ValueError):
        int_to_byte4(-1)
    with pytest.raises(ValueError):
        int_to_byte4_np(np.array([-5]))


def test_jvm_column_matches_numpy(spark):
    """int_to_byte4_col (pure Column expression, the docmeta norm path)
    must be bit-exact vs the numpy port: exhaustive small values plus
    every power-of-two boundary up to 2^40."""
    import pandas as pd
    from pyspark.sql import functions as F

    from lucene_solr_8_7_0_spark.functions.smallfloat import int_to_byte4_col

    vals = list(range(0, 5000))
    for k in range(3, 41):
        p = 1 << k
        vals += [p - 2, p - 1, p, p + 1, p + 2]
    arr = np.array(sorted(set(vals)), dtype=np.int64)
    df = spark.createDataFrame(pd.DataFrame({"length": arr}))
    got = (
        df.select("length", int_to_byte4_col(F.col("length")).alias("norm"))
        .toPandas().sort_values("length")
    )
    expected = int_to_byte4_np(got["length"].to_numpy(dtype=np.int64))
    assert (got["norm"].to_numpy(dtype=np.int64) == expected).all()
