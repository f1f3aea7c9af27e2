"""Bit-exact port of Lucene's SmallFloat length-norm encoding.

Reference semantics: lucene/core/src/java/org/apache/lucene/util/
SmallFloat.java:101-169 (longToInt4 / int4ToLong / intToByte4 /
byte4ToInt).  BM25 quantizes the per-document field length (number of
indexed tokens) to one byte with ``int_to_byte4``; scoring decodes it
through a 256-entry table (BM25Similarity.java:116-126, LENGTH_TABLE).

All functions here are pure integer bit math — exact at any scale —
and are vectorized over numpy arrays for use inside Arrow UDFs.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "long_to_int4",
    "int4_to_long",
    "int_to_byte4",
    "byte4_to_int",
    "int_to_byte4_np",
    "LENGTH_TABLE",
    "NUM_FREE_VALUES",
]


def long_to_int4(i: int) -> int:
    """Scalar reference: float-like 4-significant-bit encoding of i >= 0."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i: int) -> int:
    """Scalar reference; returns the encoded byte as unsigned int 0..255."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return (NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)) & 0xFF


def byte4_to_int(b: int) -> int:
    """Decode a byte (given as unsigned int 0..255)."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


# Decoded lengths for every possible norm byte, as float32 — this is
# BM25Similarity.LENGTH_TABLE (BM25Similarity.java:116-122).
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.float32)

# Powers of two for a vectorized bit_length via searchsorted.
_POW2 = np.left_shift(np.int64(1), np.arange(63, dtype=np.int64))


def int_to_byte4_col(length_col):
    """``int_to_byte4`` as a pure JVM Column expression (exact integer
    bit math — no Python/Arrow hop, so the full docmeta stream stays in
    whole-stage codegen at any scale).

    ``bit_length(j) == char_length(bin(j))`` for j >= 1 gives the exact
    numberOfLeadingZeros complement (SmallFloat.java:139 numBits); the
    j == 0 case falls into the ``num_bits < 4`` identity branch like
    the scalar port.  Parity with int_to_byte4_np is pytest-pinned
    exhaustively over small values and power-of-two boundaries."""
    from pyspark.sql import functions as F

    i = length_col.cast("long")
    j = i - NUM_FREE_VALUES
    nb = F.length(F.bin(j)).cast("long")
    shift = nb - 4
    # shiftright by a COLUMN: exact floor-division by 2^shift (both
    # operands < 2^53, and division by a power of two is exact in
    # binary floating point)
    shifted = F.floor(j / F.pow(F.lit(2.0), shift.cast("double"))).cast("long")
    normal = shifted.bitwiseAND(F.lit(7)).bitwiseOR((shift + 1) * 8)
    enc = F.when(nb < 4, j).otherwise(normal)
    return F.when(i < NUM_FREE_VALUES, i).otherwise(enc + NUM_FREE_VALUES)


def int_to_byte4_np(arr: np.ndarray) -> np.ndarray:
    """Vectorized int_to_byte4 over an int array; returns uint8-valued int64."""
    arr = np.asarray(arr, dtype=np.int64)
    if arr.size and arr.min() < 0:
        raise ValueError("Only supports positive values")
    out = arr.copy()
    big = arr >= NUM_FREE_VALUES
    if big.any():
        i = arr[big] - NUM_FREE_VALUES
        # bit_length(i) == index of first power of two > i
        num_bits = np.searchsorted(_POW2, i, side="right").astype(np.int64)
        shift = np.maximum(num_bits - 4, 0)
        encoded = np.right_shift(i, shift) & 0x07
        normal = num_bits >= 4
        enc = np.where(normal, encoded | ((shift + 1) << 3), i)
        out[big] = NUM_FREE_VALUES + enc
    return out
