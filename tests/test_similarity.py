"""BM25 kernel: monotonicity properties (BaseSimilarityTestCase.java:244-247)
and frozen float32 spot values (dtype-pinning regression guard)."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_spark.similarity import BM25Similarity, idf
from lucene_spark.smallfloat import LENGTH_TABLE


def test_idf_matches_double_formula():
    assert float(idf(7, 100)) == np.float32(math.log(1 + (100 - 7 + 0.5) / (7 + 0.5)))
    assert idf(7, 100).dtype == np.float32


def test_score_dtype_and_formula_spot():
    sim = BM25Similarity()
    sc = sim.scorer(boost=1.0, doc_count=100, sum_total_term_freq=2000, dfs=[7])
    # reproduce the exact op sequence in scalar float32 independently
    w = np.float32(1.0) * idf(7, 100)
    avgdl = np.float32(2000 / 100.0)
    norm = 13  # dl 13 → exact
    inv = np.float32(1.0) / np.float32(
        np.float32(1.2) * np.float32(
            (np.float32(1.0) - np.float32(0.75))
            + np.float32(np.float32(np.float32(0.75) * LENGTH_TABLE[norm]) / avgdl)
        )
    )
    expected = np.float32(w - np.float32(w / np.float32(np.float32(1.0) + np.float32(np.float32(3.0) * inv))))
    got = sc.score([3], [norm])
    assert got.dtype == np.float32
    assert got[0] == expected  # bit-identical


@settings(max_examples=300, deadline=None)
@given(
    tf=st.integers(min_value=1, max_value=1000),
    norm=st.integers(min_value=0, max_value=255),
    df=st.integers(min_value=1, max_value=10**6),
    extra=st.integers(min_value=0, max_value=10**6),
)
def test_monotonicity(tf, norm, df, extra):
    doc_count = df + extra + 1
    sim = BM25Similarity()
    sc = sim.scorer(1.0, doc_count, doc_count * 15, [df])
    s = float(sc.score([tf], [norm])[0])
    assert np.isfinite(s) and s >= 0
    # non-decreasing in tf
    assert float(sc.score([tf + 1], [norm])[0]) >= s
    # non-increasing in decoded length (larger norm code = longer doc)
    if norm < 255:
        assert float(sc.score([tf], [norm + 1])[0]) <= s
    # bounded by the tf→∞ limit (weight)
    assert s <= float(sc.weight) * (1 + 1e-6)
    # non-increasing in df
    sc2 = sim.scorer(1.0, doc_count, doc_count * 15, [min(df + 1, doc_count)])
    assert float(sc2.score([tf], [norm])[0]) <= s + 1e-9


def test_multi_term_idf_sums_in_double():
    sim = BM25Similarity()
    sc = sim.scorer(1.0, 1000, 20000, [3, 50, 400])
    acc = 0.0
    for df in (3, 50, 400):
        acc += float(idf(df, 1000))
    assert float(sc.weight) == np.float32(1.0) * np.float32(acc)
