"""Property-based tests (hypothesis) — the randomized-testing layer of the
reference test strategy (SURVEY.md §5):

- BM25 monotonicity invariants, mirroring
  ``tf/search/similarities/BaseSimilarityTestCase.java:360-470``: score is
  finite, ≥ 0, non-decreasing in tf, non-increasing in doclen and df;
- SmallFloat norm encoding round-trip invariants
  (``core/util/SmallFloat.java:147-167``);
- varint codec round-trip over adversarial int distributions;
- byte-level tokenizer ≡ regex chain on arbitrary ASCII-ish text.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_spark.analysis import SimpleAnalyzer, StandardAnalyzer
from lucene_spark.indexing.blocks import decode_varints, encode_varints
from lucene_spark.similarity import BM25Similarity
from lucene_spark.smallfloat import byte4_to_int, int_to_byte4

SIM = BM25Similarity()


@settings(max_examples=200, deadline=None)
@given(
    df=st.integers(1, 10**9),
    doc_count=st.integers(1, 2 * 10**9),
    sum_ttf=st.integers(1, 10**12),
    tf=st.integers(1, 10**6),
    norm=st.integers(0, 255),
)
def test_bm25_score_bounds(df, doc_count, sum_ttf, tf, norm):
    df = min(df, doc_count)
    sc = SIM.scorer(1.0, doc_count, sum_ttf, [df])
    s = sc.score(np.array([tf]), np.array([norm]))[0]
    assert np.isfinite(s) and s >= 0
    # bounded by weight (the tf→∞ limit)
    assert s <= sc.weight * (1 + 1e-6)


@settings(max_examples=100, deadline=None)
@given(
    df=st.integers(1, 10**6),
    doc_count=st.integers(10, 10**7),
    sum_ttf=st.integers(10, 10**9),
    tf=st.integers(1, 10**4),
    norm=st.integers(0, 254),
)
def test_bm25_monotonicity(df, doc_count, sum_ttf, tf, norm):
    df = min(df, doc_count)
    sc = SIM.scorer(1.0, doc_count, sum_ttf, [df])
    s = float(sc.score(np.array([tf]), np.array([norm]))[0])
    # non-decreasing in tf
    s_tf = float(sc.score(np.array([tf + 1]), np.array([norm]))[0])
    assert s_tf >= s
    # non-increasing in decoded doc length (norm codes order lengths; skip the
    # 0→1 wrap: LENGTH_TABLE[0] is 0)
    if norm >= 1:
        s_len = float(sc.score(np.array([tf]), np.array([norm + 1]))[0])
        assert s_len <= s + 1e-7
    # non-increasing in df
    if df + 1 <= doc_count:
        sc2 = SIM.scorer(1.0, doc_count, sum_ttf, [df + 1])
        s_df = float(sc2.score(np.array([tf]), np.array([norm]))[0])
        assert s_df <= s + 1e-7


@settings(max_examples=200, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_smallfloat_roundtrip_invariants(dl):
    c = int(int_to_byte4(np.array([dl]))[0])
    assert 0 <= c <= 255
    dec = int(byte4_to_int(np.array([c]))[0])
    assert dec <= dl  # decoded (lossy) length never exceeds the true length
    # values < 40 are exact (SmallFloat.java:103-122)
    if dl < 40:
        assert dec == dl
    # re-encoding the decoded value is a fixpoint
    assert int(int_to_byte4(np.array([dec]))[0]) == c


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(0, 127),
            st.integers(0, 2**20),
            st.integers(0, 2**62),
        ),
        max_size=300,
    )
)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert decode_varints(encode_varints(arr)).tolist() == vals


_TEXT_ALPHABET = st.text(
    alphabet="abcXYZ019_'.:, \t\n-!?\"()" + "é光",  # joiners + separators + non-ASCII
    max_size=120,
)


@settings(max_examples=150, deadline=None)
@given(st.lists(_TEXT_ALPHABET, max_size=8))
def test_tokenizer_byte_path_equals_regex_path(texts):
    import pandas as pd

    s = pd.Series(texts, dtype=object)
    for an in (StandardAnalyzer(), SimpleAnalyzer()):
        flat, lens = an.tokenize_flat(s)
        lists = an.tokenize_series(s)
        assert lens.tolist() == [len(x) for x in lists]
        assert flat.tolist() == [t for ts in lists for t in ts]


@given(
    pos_lists=st.lists(
        st.lists(st.integers(0, 60), min_size=1, max_size=8, unique=True),
        min_size=2, max_size=4,
    ),
    slop=st.integers(0, 6),
)
@settings(max_examples=300, deadline=None)
def test_sloppy_matcher_invariants(pos_lists, slop):
    """Independent invariants of the sloppy matcher (no shared code):
    1. slop=0 ≡ exact matching: freq == count of aligned start positions;
    2. binary match ⟺ some alignment tuple has window ≤ slop (brute force);
    3. freq is monotone non-decreasing in slop.
    """
    import itertools

    import numpy as np

    from lucene_spark.search.phrase import _sloppy_freq_doc

    pls = [np.array(sorted(p), dtype=np.int64) - i
           for i, p in enumerate(pos_lists)]

    # 1. slop=0 equals exact count (intersection of adjusted positions)
    exact = len(set(pls[0].tolist()).intersection(
        *[set(p.tolist()) for p in pls[1:]]))
    assert _sloppy_freq_doc(pls, 0) == float(np.float32(exact))

    # 2. binary match vs brute force over all alignment tuples
    f = _sloppy_freq_doc(pls, slop)
    brute = any(
        max(t) - min(t) <= slop
        for t in itertools.product(*[p.tolist() for p in pls])
    )
    assert (f > 0.0) == brute, (pos_lists, slop, f)

    # 3. monotone in slop
    assert _sloppy_freq_doc(pls, slop + 1) >= f - 1e-6
