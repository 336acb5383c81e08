"""BlendedTermQuery (core/search/BlendedTermQuery.java): blended-stats
rewrite vs a numpy brute (dismax combine) and the override mechanism."""

import numpy as np
import pytest

from lucene_spark.corpus import VOCAB
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.search import ast
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.similarity import BM25Similarity

F32 = np.float32


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


@pytest.fixture(scope="module")
def golden(corpus_pdf):
    return BruteForceIndex(corpus_pdf)


def _brute_blended_dismax(golden, terms, k, tie=0.01):
    """BM25 clause scores with the blended MAX docFreq (BlendedTermQuery
    rewrite :281-291), combined per doc with the engine's dismax f32
    chain: f32(max + f32(tie · f32(f32(Σ_double) − max)))."""
    present = [t for t in dict.fromkeys(terms) if t in golden.postings]
    if not present:
        return []
    bdf = max(golden.postings[t][0].size for t in present)
    sim = BM25Similarity()
    n = golden.n
    per_doc: dict[int, list] = {}
    for t in present:
        docs, tfs = golden.postings[t]
        sc = sim.scorer(1.0, n, int(golden.dl.sum()), [bdf])
        scores = sc.score(tfs.astype(np.int64),
                          golden.norms[docs].astype(np.int64))
        for d, s in zip(docs.tolist(), scores.tolist()):
            per_doc.setdefault(d, []).append(np.float32(s))
    hits = []
    for d, subs in per_doc.items():
        smax = max(subs)
        ssum = np.float32(sum(np.float64(x) for x in subs))
        score = np.float32(
            smax + np.float32(np.float32(tie)
                              * np.float32(ssum - smax)))
        hits.append((d, float(score)))
    hits.sort(key=lambda h: (-h[1], h[0]))
    return hits[:k]


def test_blended_dismax_matches_brute(searcher, golden):
    got = [(h.doc_id, h.score)
           for h in searcher.blended_search((VOCAB[0], VOCAB[7]), k=30)]
    want = _brute_blended_dismax(golden, (VOCAB[0], VOCAB[7]), 30)
    assert got == want


def test_blend_actually_changes_scores(searcher):
    """The rarer term's clause must score LOWER under the inflated df."""
    plain = {h.doc_id: h.score for h in searcher.search(
        ast.DisjunctionMaxQuery((VOCAB[0], VOCAB[7]), tie_breaker=0.01), k=50)}
    blended = {h.doc_id: h.score
               for h in searcher.blended_search((VOCAB[0], VOCAB[7]), k=50)}
    stats = searcher.reader.term_stats([VOCAB[0], VOCAB[7]])
    assert stats[VOCAB[0]]["df"] != stats[VOCAB[7]]["df"], "pick rarer terms"
    assert any(abs(plain.get(d, 0.0) - s) > 1e-9 for d, s in blended.items())


def test_blended_absent_term_is_noop(searcher):
    """A corpus-absent term has df = 0 (null TermStates): the blend and
    the match set reduce to the present term alone."""
    lone = searcher.blended_search((VOCAB[0],), k=20)
    with_ghost = searcher.blended_search((VOCAB[0], "zzzznotaterm"), k=20)
    assert [(h.doc_id, h.score) for h in lone] == \
        [(h.doc_id, h.score) for h in with_ghost]
    assert searcher.blended_search(("zzzznotaterm",), k=5) == []


def test_blended_boolean_rewrite(searcher):
    """BOOLEAN_REWRITE (:137): SHOULD-only boolean scored with the blended
    stats — equals a manual override + plain boolean search."""
    terms = (VOCAB[0], VOCAB[7])
    stats = searcher.reader.term_stats(list(terms))
    bdf = max(s["df"] for s in stats.values())
    bttf = sum(s["ttf"] for s in stats.values())
    got = [(h.doc_id, h.score)
           for h in searcher.blended_search(terms, k=25, rewrite="boolean")]
    saved = searcher.reader.term_stats_override
    searcher.reader.term_stats_override = {
        "text": {t: {**stats[t], "df": bdf, "ttf": bttf} for t in terms}}
    try:
        want = [(h.doc_id, h.score) for h in searcher.search(
            ast.BooleanQuery(tuple(
                (ast.SHOULD, ast.TermQuery(t)) for t in terms)), k=25)]
    finally:
        searcher.reader.term_stats_override = saved
    assert got == want
    assert searcher.reader.term_stats_override is saved


def test_blended_rejects_unknown_rewrite(searcher):
    with pytest.raises(ValueError):
        searcher.blended_search((VOCAB[0],), rewrite="nope")


# ---------------------------------------------------------------------------
# FuzzyQuery default rewrite — TopTermsBlendedFreqScoringRewrite
# (core/search/FuzzyQuery.java:56-61, MultiTermQuery.java:197-236,
#  FuzzyTermsEnum.java:236-256, TopTermsRewrite.java:118-121,168-171)
# ---------------------------------------------------------------------------

def _manual_fuzzy_blended(searcher, term, k, max_edits=2, max_expansions=50):
    """Reproduce the documented rewrite with explicit steps: expansion,
    float32 similarity boosts, (boost DESC, term ASC) top-N selection,
    blended MAX-df/Σ-ttf override, clamp-negative-to-zero SHOULD boolean."""
    from lucene_spark.search import multiterm as mt

    cand = mt.expand_terms(
        searcher.reader,
        ast.MultiTermQuery("fuzzy", term, max_edits=max_edits))
    scored = []
    for t in cand:
        ed = 0 if t == term else mt.damerau_levenshtein(t, term)
        boost = (np.float32(1.0) if ed == 0 else
                 np.float32(1.0)
                 - np.float32(ed) / np.float32(min(len(t), len(term))))
        scored.append((float(boost), t))
    scored.sort(key=lambda bt: (-bt[0], bt[1]))
    kept = scored[:max_expansions]
    if not kept:
        return []
    stats = searcher.reader.term_stats([t for _, t in kept])
    bdf = max(stats[t]["df"] for _, t in kept)
    bttf = sum(stats[t]["ttf"] for _, t in kept)
    saved = searcher.reader.term_stats_override
    searcher.reader.term_stats_override = {
        "text": {t: {**stats[t], "df": bdf, "ttf": bttf} for _, t in kept}}
    try:
        return [(h.doc_id, h.score) for h in searcher.search(
            ast.BooleanQuery(tuple(
                (ast.SHOULD, ast.TermQuery(t, boost=max(0.0, b)))
                for b, t in kept)), k=k)]
    finally:
        searcher.reader.term_stats_override = saved


def test_fuzzy_blended_matches_manual_rewrite(searcher):
    """End-to-end equals the explicit expansion+blend+boolean construction
    (the vocab has 62 DL<=2 neighbours of 'qeso', so the default
    max_expansions=50 queue truncation is exercised)."""
    got = [(h.doc_id, h.score)
           for h in searcher.fuzzy_blended_search("qeso", k=30)]
    want = _manual_fuzzy_blended(searcher, "qeso", 30)
    assert len(got) == 30
    assert got == want
    # the stats override must not leak past the call
    assert searcher.reader.term_stats_override is None


def test_fuzzy_blended_truncates_to_max_expansions(searcher):
    """A small max_expansions keeps only the top (boost DESC, term ASC)
    terms — results must differ from the full expansion and equal the
    manual selection at the same cap."""
    full = [(h.doc_id, h.score)
            for h in searcher.fuzzy_blended_search("qeso", k=30)]
    capped = [(h.doc_id, h.score)
              for h in searcher.fuzzy_blended_search("qeso", k=30,
                                                     max_expansions=3)]
    assert capped == _manual_fuzzy_blended(searcher, "qeso", 30,
                                           max_expansions=3)
    assert capped != full


def test_fuzzy_blended_exact_match_gets_unit_boost(searcher):
    """Querying an existing vocabulary term: the ed == 0 candidate carries
    boost 1.0 (FuzzyTermsEnum.java:248-249) and the top hit scores at least
    the plain blended-df term score of that term."""
    from lucene_spark.search import multiterm as mt

    # pick a term that actually occurs in the test corpus
    term = sorted(mt.expand_terms(
        searcher.reader, ast.MultiTermQuery("fuzzy", "qeso")))[0]
    stats = searcher.reader.term_stats([term])
    assert stats[term]["df"] > 0, "probe must be a corpus term"
    hits = searcher.fuzzy_blended_search(term, k=5)
    assert hits and hits[0].score > 0.0
    manual = _manual_fuzzy_blended(searcher, term, 5)
    assert [(h.doc_id, h.score) for h in hits] == manual


def test_fuzzy_blended_no_candidates_is_empty(searcher):
    assert searcher.fuzzy_blended_search("zzzzzzzzzzzz", k=5) == []


def test_fuzzy_like_this(spark, index_dir):
    """FuzzyLikeThisQuery: typo'd multi-term text still retrieves the
    clean terms' documents; deterministic; respects max_num_terms."""
    from lucene_spark.corpus import VOCAB
    from lucene_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, index_dir)
    v0, v1 = VOCAB[0], VOCAB[1]
    typo = v0[:-1] + ("x" if v0[-1] != "x" else "y")
    hits = s.fuzzy_like_this(f"{typo} {v1}", k=30, prefix_length=1,
                             max_num_terms=8)
    assert hits
    # docs containing the CLEAN v0 dominate (the typo fuzzifies back)
    clean = {h.doc_id for h in s.search(f"{v0} {v1}", 30)}
    got = {h.doc_id for h in hits}
    assert len(got & clean) >= len(got) // 2
    # deterministic
    again = s.fuzzy_like_this(f"{typo} {v1}", k=30, prefix_length=1,
                              max_num_terms=8)
    assert [(h.doc_id, h.score) for h in hits] == \
        [(h.doc_id, h.score) for h in again]
    # max_num_terms=1 keeps only the single best variant globally
    one = s.fuzzy_like_this(f"{typo} {v1}", k=30, max_num_terms=1)
    assert one and len({h.score for h in one}) <= len(one)
    # nothing fuzzifiable -> empty
    assert s.fuzzy_like_this("zzqqxxyyzz", k=5) == []
