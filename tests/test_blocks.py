"""Posting block codec: varint round-trip, block round-trip, Pareto impacts,
CheckIndex-style invariants (core/index/CheckIndex.java:533,2393 analogy)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_spark.indexing.blocks import (
    BLOCK_SIZE,
    decode_block,
    decode_varints,
    encode_term_blocks,
    encode_varints,
    pareto_impacts,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=300))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert decode_varints(encode_varints(arr)).tolist() == vals


def test_varint_boundaries():
    edge = [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**21, 2**28, 2**40]
    assert decode_varints(encode_varints(np.array(edge))).tolist() == edge


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 10**6), st.integers(1, 50), st.integers(0, 255)),
        min_size=1, max_size=500, unique_by=lambda t: t[0],
    )
)
def test_block_roundtrip(postings):
    postings.sort()
    docs = np.array([p[0] for p in postings], dtype=np.int64)
    tfs = np.array([p[1] for p in postings], dtype=np.int64)
    norms = np.array([p[2] for p in postings], dtype=np.int64)
    out_d, out_t, out_n = [], [], []
    for blk in encode_term_blocks(docs, tfs, norms):
        assert blk["count"] <= BLOCK_SIZE
        d, t, n = decode_block(
            blk["first_doc"], blk["count"], blk["doc_gaps"], blk["tfs"], blk["norms"]
        )
        assert (np.diff(d) > 0).all()  # strictly increasing docIDs
        assert d[-1] == blk["last_doc"] and d[0] == blk["first_doc"]
        assert blk["ttf"] == int(t.sum()) and blk["max_tf"] == int(t.max())
        out_d.append(d); out_t.append(t); out_n.append(n)
    assert np.concatenate(out_d).tolist() == docs.tolist()
    assert np.concatenate(out_t).tolist() == tfs.tolist()
    assert np.concatenate(out_n).tolist() == norms.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.tuples(st.integers(1, 30), st.integers(0, 255)), min_size=1, max_size=128)
)
def test_pareto_frontier(pairs):
    tfs = np.array([p[0] for p in pairs])
    norms = np.array([p[1] for p in pairs])
    ft, fn = pareto_impacts(tfs, norms)
    # frontier is strictly increasing in both tf and norm (FIXTURES.md §4)
    assert (np.diff(ft) > 0).all() and (np.diff(fn) > 0).all()
    # every input pair is dominated by (or equal to) some frontier pair
    for tf, nm in pairs:
        assert any(ft[i] >= tf and fn[i] <= nm for i in range(ft.size))
    # every frontier pair is an input pair
    inputs = set(pairs)
    assert all((int(ft[i]), int(fn[i])) in inputs for i in range(ft.size))
