"""Multi-field indexing: keyword fields (StringField/KeywordField analogy) as
filter clauses alongside scored text clauses."""

import shutil

import pytest

from lucene_spark.corpus import VOCAB, synthetic_transcripts, synthetic_transcripts_pdf
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.indexing.builder import IndexBuilder
from lucene_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def kw_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("kwidx") / "index")
    shutil.rmtree(d, ignore_errors=True)
    df = synthetic_transcripts(spark, 80)
    IndexBuilder(spark, d, num_segments=4, keyword_fields=("role",)).build(df)
    return d


@pytest.fixture(scope="module")
def kw_golden(corpus_pdf):
    return BruteForceIndex(corpus_pdf, keyword_fields=("role",))


def test_keyword_filter_clauses(spark, kw_index, kw_golden):
    s = IndexSearcher(spark, kw_index)
    queries = [
        f"+role:assistant {VOCAB[0]}",       # keyword MUST(→FILTER) + scored
        f"+role:tool +{VOCAB[1]}",           # keyword + text MUST
        f"-role:user {VOCAB[0]} {VOCAB[3]}", # keyword MUST_NOT
        f"+role:nosuchrole {VOCAB[0]}",      # absent keyword value → no hits
    ]
    for q in queries:
        exp = kw_golden.search(q, 50)
        got = [(h.doc_id, h.score) for h in s.search(q, 50)]
        assert got == exp, f"keyword-field mismatch for {q!r}"
    # keyword filter on a required text term selects a strict subset
    # (note: FILTER + bare SHOULD matches on the filter alone — Lucene
    # semantics — so the subset claim needs MUST on the text term)
    base = {h.doc_id for h in s.search(f"+{VOCAB[0]}", 100_000)}
    filt = {h.doc_id for h in s.search(f"+role:assistant +{VOCAB[0]}", 100_000)}
    assert filt and filt < base


def test_keyword_field_stats_and_resume(spark, kw_index, corpus_pdf):
    from pyspark.sql import functions as F

    ts = spark.read.parquet(f"{kw_index}/term_stats")
    roles = {r["term"]: r["df"] for r in
             ts.filter(F.col("field") == "role").collect()}
    expected = corpus_pdf["role"].value_counts().to_dict()
    assert roles == expected
    # resume with identical data reuses everything (fingerprint covers role)
    b = IndexBuilder(spark, kw_index, num_segments=4, keyword_fields=("role",))
    r = b.build(synthetic_transcripts(spark, 80), resume=True)
    assert r["built"] == 0 and r["reused"] == 4


def test_keyword_with_phrase_and_multiterm_clauses(spark, kw_index, kw_golden,
                                                   corpus_pdf):
    """Mixed booleans resolve stats/postings per clause field (ADVICE r1:
    a keyword clause next to a phrase must NOT become a text-field lookup)."""
    an = kw_golden.analyzer
    ordered = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pair = None
    for text in ordered["text"]:
        toks = an.tokenize_text(text)
        if len(toks) >= 2:
            pair = (toks[0], toks[1])
            break
    s = IndexSearcher(spark, kw_index)
    ph = f'"{pair[0]} {pair[1]}"'
    queries = [
        f"+role:assistant {ph}",            # keyword FILTER + phrase
        f"-role:user {ph} {VOCAB[0]}",      # keyword MUST_NOT + phrase + term
        f"+role:assistant ba* {VOCAB[0]}",  # keyword + multiterm + term
        f"+role:nosuchrole {ph}",           # absent keyword value → no hits
    ]
    for q in queries:
        exp = kw_golden.search(q, 50)
        got = [(h.doc_id, h.score) for h in s.search(q, 50)]
        assert got == exp, f"keyword mixed mismatch for {q!r}"

def test_keyword_scoring_clauses(spark, kw_index, kw_golden, corpus_pdf):
    """Keyword MUST/SHOULD term clauses contribute the ACTIVE similarity
    evaluated at freq=1, dl=1 under the keyword field's own collection
    stats (BM25-on-StringField; BooleanQuery semantics — MUST scores, it is
    not FILTER)."""
    s = IndexSearcher(spark, kw_index)
    queries = [
        f"{VOCAB[0]} role:assistant",        # SHOULD keyword scores
        f"+role:assistant +{VOCAB[0]}",      # MUST keyword scores too
        f"{VOCAB[0]} role:assistant^2.5",    # boosted keyword clause
        "role:assistant role:user",          # keyword-only scoring boolean
    ]
    for q in queries:
        exp = kw_golden.search(q, 50)
        got = [(h.doc_id, h.score) for h in s.search(q, 50)]
        assert got == exp, f"keyword scoring mismatch for {q!r}"
    # the constant is a true BM25 weight: rarer role values score higher
    counts = corpus_pdf["role"].value_counts()
    rare, common = counts.index[-1], counts.index[0]
    sc_rare = {h.doc_id: h.score for h in s.search(f"role:{rare}", 100_000)}
    sc_common = {h.doc_id: h.score
                 for h in s.search(f"role:{common}", 100_000)}
    assert max(sc_rare.values()) > max(sc_common.values())


def test_keyword_scoring_other_similarities(spark, kw_index, corpus_pdf):
    """The keyword constant follows the plugged similarity, not just BM25."""
    from lucene_spark.similarity import get_similarity

    q = f"{VOCAB[0]} role:assistant"
    for name in ("classic", "lm_dirichlet"):
        sim = get_similarity(name)
        s = IndexSearcher(spark, kw_index, similarity=sim)
        g = BruteForceIndex(corpus_pdf, similarity=sim,
                            keyword_fields=("role",))
        got = [(h.doc_id, h.score) for h in s.search(q, 30)]
        assert got == g.search(q, 30), name


def test_synonym_dismax_on_keyword_field(spark, kw_index, corpus_pdf):
    """SynonymQuery / DisjunctionMaxQuery carry a field attribute: the match
    set and stats must resolve against THAT field, not text (regression:
    both kernels ignored q.field)."""
    import numpy as np

    from lucene_spark.search.ast import DisjunctionMaxQuery, SynonymQuery
    from lucene_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, kw_index)
    roles = corpus_pdf["role"].tolist()
    exp_docs = sorted(i for i, r in enumerate(roles)
                      if r in ("user", "assistant"))
    assert exp_docs  # the corpus actually has these roles

    q = SynonymQuery(("user", "assistant"), field="role")
    got = sorted(h.doc_id for h in s.search(q, 100_000))
    assert got == exp_docs

    q2 = DisjunctionMaxQuery(("user", "assistant"), field="role")
    got2 = sorted(h.doc_id for h in s.search(q2, 100_000))
    assert got2 == exp_docs

    # the scorer must use the ROLE field's collection stats, not text's:
    # recompute one synonym score from reader.field_stats
    from lucene_spark.search.reader import IndexReader

    rd = IndexReader(spark, kw_index)
    fs = rd.field_stats["role"]
    st = rd.term_stats(["user", "assistant"], field="role")
    df_blend = max(st["user"]["df"], st["assistant"]["df"])
    scorer = s.similarity.scorer(1.0, fs["doc_count"], fs["sum_ttf"],
                                 [df_blend])
    hits = s.search(q, 5)
    # keyword postings: tf=1, norm = the role field's single-token length
    exp_score = float(scorer.score(np.array([1]), np.array([1]))[0])
    assert hits[0].score == exp_score, (hits[0].score, exp_score)


def test_combined_field_matches_brute(spark, kw_index, corpus_pdf):
    """CombinedFieldQuery (BM25F): bit-exact vs a from-scratch numpy
    reimplementation of the reference semantics — pseudo df = MAX over
    (term, field) pairs, freq = Σ weight·tf, combined collection stats,
    norms from the text field only (keyword fields omit norms)."""
    import numpy as np

    from lucene_spark.analysis import get_analyzer
    from lucene_spark.similarity import BM25Similarity
    from lucene_spark.smallfloat import LENGTH_TABLE, int_to_byte4

    s = IndexSearcher(spark, kw_index)
    terms = [VOCAB[0], "assistant"]
    fields = {"text": 1.0, "role": 2.0}  # non-unit weight exercises Σ w·tf
    hits = s.combined_field(terms, fields, k=15)

    pdf = corpus_pdf.sort_values(["conv_id", "turn_idx"],
                                 kind="mergesort").reset_index(drop=True)
    an = get_analyzer("standard")
    toks = [an.tokenize_text(t) for t in pdf["text"]]
    n = len(toks)
    # per-field stats
    df_text = {t: sum(1 for ts in toks if t in ts) for t in terms}
    df_role = {t: int((pdf["role"] == t).sum()) for t in terms}
    pseudo_df = max(max(df_text.values()), max(df_role.values()))
    sum_ttf = 1.0 * sum(len(ts) for ts in toks) + 2.0 * n  # role on all docs
    scorer = BM25Similarity().scorer(1.0, n, int(sum_ttf), [pseudo_df])
    freq = np.zeros(n, dtype=np.float32)
    for i, ts in enumerate(toks):
        freq[i] += np.float32(1.0) * sum(ts.count(t) for t in terms)
    for t in terms:
        freq += np.where(pdf["role"].to_numpy() == t, np.float32(2.0),
                         np.float32(0.0))
    norm_text = int_to_byte4(np.array([len(ts) for ts in toks]))
    comb = int_to_byte4(
        np.floor(1.0 * LENGTH_TABLE[norm_text] + 0.5).astype(np.int64))
    scores = scorer.score(freq, comb)
    exp = sorted(((i, float(scores[i])) for i in range(n) if freq[i] > 0),
                 key=lambda x: (-x[1], x[0]))[:15]
    assert [(h.doc_id, h.score) for h in hits] == exp
    # absent everywhere → empty
    assert s.combined_field(["zzznotaterm"], fields, k=5) == []
