"""SmallFloat byte4 semantics (reference: core/util/SmallFloat.java:147-175)."""

import numpy as np
from hypothesis import given, strategies as st

from lucene_spark.smallfloat import LENGTH_TABLE, byte4_to_int, int_to_byte4


def test_exact_below_40():
    v = np.arange(40)
    assert (byte4_to_int(int_to_byte4(v)) == v).all()


def test_codes_cover_0_255_monotone():
    dec = byte4_to_int(np.arange(256))
    assert dec[0] == 0
    assert (np.diff(dec) > 0).all()  # strictly increasing decode


def test_known_values():
    # free values: identity below 24; exact through 39
    assert int_to_byte4([0, 1, 23, 24, 39]).tolist() == [0, 1, 23, 24, 39]
    # 40 = 24 + 16 → first rounded range: subnormal boundary
    assert byte4_to_int(int_to_byte4([40]))[0] == 40
    assert byte4_to_int([255])[0] == 24 + ((0x07 | 0x08) << ((255 - 24 >> 3) - 1))


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_roundtrip_properties(i):
    code = int(int_to_byte4([i])[0])
    dec = int(byte4_to_int([code])[0])
    assert 0 <= code <= 255
    assert dec <= i  # rounds down
    # decode is the largest representable value ≤ i
    if code < 255:
        assert int(byte4_to_int([code + 1])[0]) > i


@given(st.integers(min_value=0, max_value=2**20), st.integers(min_value=0, max_value=2**20))
def test_order_preserving(a, b):
    ca, cb = int(int_to_byte4([a])[0]), int(int_to_byte4([b])[0])
    if a <= b:
        assert ca <= cb


def test_length_table_dtype():
    assert LENGTH_TABLE.dtype == np.float32
    assert LENGTH_TABLE.shape == (256,)
