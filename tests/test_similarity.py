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


def test_alternative_similarities_engine_vs_golden(spark, index_dir, corpus_pdf):
    """Classic / Boolean / LMDirichlet ride the same generic WAND kernel:
    engine ≡ golden, and WAND ≡ exhaustive, per similarity."""
    from lucene_spark.corpus import VOCAB
    from lucene_spark.goldens import BruteForceIndex
    from lucene_spark.search.searcher import IndexSearcher
    from lucene_spark.similarity import get_similarity

    queries = [
        VOCAB[0],
        f"{VOCAB[0]} {VOCAB[3]} {VOCAB[17]}",
        f"+{VOCAB[1]} {VOCAB[5]} -{VOCAB[0]}",
        f"{VOCAB[4]}^2.5 {VOCAB[9]}",
    ]
    for name in ["classic", "boolean", "lm_dirichlet", "lm_jelinek_mercer",
                 "dfr_gb2", "ib_ll", "dfi_chi2", "axiomatic_f2exp",
                 "indri_dirichlet", "dfr_inl2", "dfr_ineb2", "ib_spl",
                 "dfi_sat", "dfi_std", "axiomatic_f1exp", "axiomatic_f1log",
                 "axiomatic_f2log", "axiomatic_f3exp", "axiomatic_f3log",
                 "multi_bm25_classic"]:
        sim = get_similarity(name)
        s = IndexSearcher(spark, index_dir, similarity=sim)
        golden = BruteForceIndex(corpus_pdf, similarity=sim)
        for q in queries:
            exp = golden.search(q, 60)
            wand = [(h.doc_id, h.score) for h in s.search(q, 60, mode="wand")]
            exh = [(h.doc_id, h.score) for h in s.search(q, 60, mode="exhaustive")]
            assert wand == exp, f"{name} wand mismatch for {q!r}"
            assert exh == exp, f"{name} exhaustive mismatch for {q!r}"


def test_similarity_formula_spot_checks():
    """Hand-computed formula values (reference file:line in similarity.py)."""
    import math

    import numpy as np

    from lucene_spark.similarity import (
        BooleanSimilarity,
        ClassicSimilarity,
        LMDirichletSimilarity,
    )
    from lucene_spark.smallfloat import LENGTH_TABLE, int_to_byte4

    # Classic: tf=4, df=9, n=99, dl decodes exactly (dl=16)
    sc = ClassicSimilarity().scorer(1.0, 99, 10_000, [9])
    norm = int(int_to_byte4(np.array([16]))[0])
    idf = np.float32(math.log(100 / 10.0) + 1.0)
    exp = np.float32(np.float32(np.float32(math.sqrt(4.0)) * idf)
                     * np.float32(1.0 / math.sqrt(16.0)))
    assert sc.score(np.array([4]), np.array([norm]))[0] == exp

    # Boolean: constant boost
    bs = BooleanSimilarity().scorer(2.5, 99, 10_000, [9])
    assert bs.score(np.array([7]), np.array([norm]))[0] == np.float32(2.5)

    # LMDirichlet: tf below the collection model's prediction clamps to 0
    lm = LMDirichletSimilarity().scorer(1.0, 99, 10, [9], ttfs=[9])
    # P = 10/11 is huge → log(1 + tf/(mu*P)) tiny, doc norm negative → 0
    assert lm.score(np.array([1]), np.array([norm]))[0] == np.float32(0.0)
    # and a genuinely positive case
    lm2 = LMDirichletSimilarity().scorer(1.0, 10 ** 6, 50_000_000, [9],
                                         ttfs=[9])
    p = 10.0 / 50_000_001.0
    dl = float(LENGTH_TABLE[norm])
    exp2 = np.float32(max(0.0, math.log(1 + 3.0 / (2000.0 * p))
                          + math.log(2000.0 / (dl + 2000.0))))
    assert lm2.score(np.array([3]), np.array([norm]))[0] == exp2


def test_new_similarity_formula_spot_checks():
    """Hand-computed double-math values for the round-3 model additions
    (reference file:line cited in similarity.py docstrings)."""
    import math

    import numpy as np

    from lucene_spark.similarity import get_similarity
    from lucene_spark.smallfloat import LENGTH_TABLE, int_to_byte4

    norm = int(int_to_byte4(np.array([16]))[0])
    dl = float(LENGTH_TABLE[norm])
    N, ttf, df, sttf, tf = 99, 40, 9, 10_000, 4
    avgdl = sttf / N

    # IndriDirichlet: boost IGNORED, score negative
    sc = get_similarity("indri_dirichlet").scorer(3.0, N, sttf, [df],
                                                  ttfs=[ttf])
    p = ttf / sttf
    exp = np.float32(math.log((4.0 + 2000.0 * p) / (dl + 2000.0)))
    got = sc.score(np.array([tf]), np.array([norm]))[0]
    assert got == exp and got < 0

    # DFR I(n)L2
    sc = get_similarity("dfr_inl2").scorer(1.0, N, sttf, [df])
    A = math.log((N + 1.0) / (df + 0.5)) / math.log(2)
    tfn = 4.0 * math.log(1 + avgdl / dl) / math.log(2)
    assert sc.score(np.array([tf]), np.array([norm]))[0] == np.float32(
        A * (1 - 1 / (1 + tfn)))

    # DFR I(ne)B2
    sc = get_similarity("dfr_ineb2").scorer(1.0, N, sttf, [df], ttfs=[ttf])
    ne = N * (1 - ((N - 1) / N) ** ttf)
    A = math.log((N + 1.0) / (ne + 0.5)) / math.log(2)
    ae = (ttf + 2.0) / (df + 1.0)
    assert sc.score(np.array([tf]), np.array([norm]))[0] == np.float32(
        A * ae * (1 - 1 / (1 + tfn)))

    # IB SPL
    sc = get_similarity("ib_spl").scorer(1.0, N, sttf, [df], ttfs=[ttf])
    lam = float(np.float32((ttf + 1.0) / (N + 1.0)))
    q = 1 - 1 / (tfn + 1)
    assert sc.score(np.array([tf]), np.array([norm]))[0] == np.float32(
        -math.log((lam ** q - lam) / (1 - lam)))

    # DFI saturated / standardized gate at expected
    for meas, den in (("dfi_sat", None), ("dfi_std", "sqrt")):
        sc = get_similarity(meas).scorer(1.0, N, sttf, [df], ttfs=[ttf])
        e = (ttf + 1.0) * dl / (sttf + 1.0)
        d = math.sqrt(e) if den else e
        assert sc.score(np.array([tf]), np.array([norm]))[0] == np.float32(
            math.log((4.0 - e) / d + 1.0) / math.log(2))
        assert sc.score(np.array([0]), np.array([norm]))[0] == np.float32(0.0)

    # Axiomatic variants compose tf/ln/tfln/idf/gamma per Axiomatic.java
    s_, k_ = 0.25, 0.35
    tfc = 1 + math.log(1 + math.log(tf + 1.0))
    lnc = (avgdl + s_) / (avgdl + dl * s_)
    tflnc = tf / (tf + s_ + s_ * dl / avgdl)
    idf_exp = ((N + 1.0) / df) ** k_
    idf_log = math.log((N + 1.0) / df)
    gamma = (dl - 1.0) * s_ * 1.0 / avgdl
    cases = {
        "axiomatic_f1exp": tfc * lnc * idf_exp,
        "axiomatic_f1log": tfc * lnc * idf_log,
        "axiomatic_f2log": tflnc * idf_log,
        "axiomatic_f3exp": tfc * idf_exp - gamma,
        "axiomatic_f3log": tfc * idf_log - gamma,
    }
    for name, want in cases.items():
        sc = get_similarity(name).scorer(1.0, N, sttf, [df])
        assert sc.score(np.array([tf]), np.array([norm]))[0] == np.float32(
            max(0.0, want)), name

    # MultiSimilarity: float32 running sum of sub-scores
    from lucene_spark.similarity import BM25Similarity, ClassicSimilarity
    msc = get_similarity("multi_bm25_classic").scorer(1.0, N, sttf, [df])
    b = BM25Similarity().scorer(1.0, N, sttf, [df])
    c = ClassicSimilarity().scorer(1.0, N, sttf, [df])
    assert msc.score(np.array([tf]), np.array([norm]))[0] == np.float32(
        b.score(np.array([tf]), np.array([norm]))[0]
        + c.score(np.array([tf]), np.array([norm]))[0])


def test_sweet_spot_properties():
    """SweetSpotSimilarity (misc module): plateau norm = 1.0 on [min,max],
    sqrt falloff outside; baselineTf floor; degrades to Classic at
    defaults; WAND must not prune it (length_monotone = False)."""
    from lucene_spark.similarity import (ClassicSimilarity,
                                         SweetSpotSimilarity)
    from lucene_spark.smallfloat import int_to_byte4

    sim = SweetSpotSimilarity(ln_min=6, ln_max=40, steepness=0.5,
                              tf_base=1.5, tf_min=2.0)
    sc = sim.scorer(1.0, 1000, 30000, [50])
    assert sc.length_monotone is False
    # plateau: every EXACTLY-representable length in [6, 40] → norm 1.0
    for dl in (6, 10, 24, 39, 40):
        code = int(int_to_byte4(np.array([dl]))[0])
        if int(LENGTH_TABLE[code]) == dl:
            assert sc.norm_table[code] == np.float32(1.0)
    # falloff both sides of the plateau
    c1 = int(int_to_byte4(np.array([1]))[0])
    c200 = int(int_to_byte4(np.array([200]))[0])
    assert sc.norm_table[c1] < 1.0 and sc.norm_table[c200] < 1.0
    # baselineTf: 0 → 0; freq ≤ tf_min → tf_base; then sqrt growth
    got = sc.score([0, 1, 2, 3], [13, 13, 13, 13])
    assert got[0] == 0.0 and got[1] == got[2] < got[3]
    # defaults degrade to ClassicSimilarity bit-for-bit (code 0 excluded:
    # Classic special-cases the zero-length norm slot, Java does too —
    # SweetSpot's formula is finite at 0 by construction)
    d = SweetSpotSimilarity().scorer(1.0, 1000, 30000, [50])
    c = ClassicSimilarity().scorer(1.0, 1000, 30000, [50])
    tfs = [1, 2, 3, 9, 100]
    codes = [1, 13, 40, 200, 255]
    assert np.array_equal(d.score(tfs, codes), c.score(tfs, codes))


def test_sweet_spot_wand_equals_exhaustive(spark, index_dir):
    """The unpruned fallback: mode='wand' ≡ mode='exhaustive' under the
    non-length-monotone flag."""
    from lucene_spark.corpus import VOCAB
    from lucene_spark.search.searcher import IndexSearcher
    from lucene_spark.similarity import get_similarity

    s = IndexSearcher(spark, index_dir, similarity=get_similarity(
        "sweet_spot", ln_min=3, ln_max=12, tf_base=1.5, tf_min=2.0))
    q = s.parse(f"{VOCAB[0]} {VOCAB[2]} {VOCAB[5]}")
    a = s.search(q, k=25, mode="wand")
    b = s.search(q, k=25, mode="exhaustive")
    assert [(h.doc_id, h.score) for h in a] == [
        (h.doc_id, h.score) for h in b]
    assert a
