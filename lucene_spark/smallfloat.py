"""Lossy 1-byte norm encoding, semantics-identical to Lucene's SmallFloat byte4.

Reference behavior (not code): ``core/util/SmallFloat.java:103-175`` — values
``< NUM_FREE_VALUES`` (= 255 - longToInt4(Integer.MAX_VALUE) = 24) are stored
verbatim; larger values store ``value - 24`` as a 4-significant-bit float-like
code (3 mantissa bits + implicit leading 1 + shift), so lengths < 40 are exact
and larger lengths are rounded down to the nearest representable value.

BM25 scores are computed from the *decoded lossy* length (``LENGTH_TABLE``),
never the true document length — reproducing this is load-bearing for
bit-identical scores (``BM25Similarity.java:123-129``).

All functions are numpy-vectorized so they can run inside Arrow pandas UDFs.
"""

from __future__ import annotations

import numpy as np

# 255 - longToInt4(Integer.MAX_VALUE) == 255 - 231
NUM_FREE_VALUES = 24


def _long_to_int4(i: np.ndarray) -> np.ndarray:
    """Vectorized order-preserving 4-significant-bit encoding of non-negative ints."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only supports positive values")
    # number of significant bits; num_bits(0) == 0
    num_bits = np.zeros_like(i)
    nz = i > 0
    num_bits[nz] = np.floor(np.log2(i[nz].astype(np.float64))).astype(np.int64) + 1
    # float64 log2 is exact for deciding bit length only up to 2^53; fix up edges
    # by direct comparison (cheap, fully vectorized)
    pow_lo = np.where(num_bits > 0, np.int64(1) << np.maximum(num_bits - 1, 0), 0)
    too_high = nz & (pow_lo > i)
    num_bits[too_high] -= 1
    pow_hi = np.int64(1) << num_bits
    too_low = nz & (pow_hi <= i)
    num_bits[too_low] += 1

    subnormal = num_bits < 4
    shift = np.maximum(num_bits - 4, 0)
    encoded = (i >> shift) & 0x07
    encoded = encoded | ((shift + 1) << 3)
    return np.where(subnormal, i, encoded).astype(np.int64)


def _int4_to_long(i: np.ndarray) -> np.ndarray:
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    normal = (bits | 0x08) << np.maximum(shift, 0)
    return np.where(shift == -1, bits, normal)


def int_to_byte4(i) -> np.ndarray:
    """Encode non-negative int lengths to the 0..255 norm code. Vectorized."""
    i = np.asarray(i, dtype=np.int64)
    if np.any(i < 0):
        raise ValueError("only supports positive values")
    enc = NUM_FREE_VALUES + _long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0))
    return np.where(i < NUM_FREE_VALUES, i, enc).astype(np.uint8)


def byte4_to_int(b) -> np.ndarray:
    """Decode a 0..255 norm code back to the (lossy) length. Vectorized."""
    b = np.asarray(b, dtype=np.int64) & 0xFF
    dec = NUM_FREE_VALUES + _int4_to_long(b - NUM_FREE_VALUES)
    return np.where(b < NUM_FREE_VALUES, b, dec).astype(np.int64)


# LENGTH_TABLE[code] = decoded length as float32 (BM25Similarity.java:123-129)
LENGTH_TABLE: np.ndarray = byte4_to_int(np.arange(256)).astype(np.float32)
