"""SimpleNaiveBayesClassifier (lucene/classification) — brute-force parity
over the synthetic corpus, bit-exact under the f32-ln/double-sum contract."""

import math
import shutil

import numpy as np
import pytest

from lucene_spark.classification import SimpleNaiveBayesClassifier
from lucene_spark.corpus import VOCAB, synthetic_transcripts, synthetic_transcripts_pdf
from lucene_spark.indexing.builder import IndexBuilder
from lucene_spark.search.searcher import IndexSearcher

N = 80


@pytest.fixture(scope="module")
def nb_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nbidx") / "index")
    shutil.rmtree(d, ignore_errors=True)
    IndexBuilder(spark, d, num_segments=4, keyword_fields=("role",)).build(
        synthetic_transcripts(spark, N))
    return d


def _brute_scores(pdf, analyzer, text: str):
    """The SimpleNaiveBayesClassifier formula recomputed from the raw
    corpus rows with the same f32-ln narrowing."""
    toks = [analyzer.tokenize_text(t or "") for t in pdf["text"]]
    roles = list(pdf["role"])
    classes = sorted(set(roles))
    dfc = {c: roles.count(c) for c in classes}
    n_class = len(roles)
    sum_df = sum(len(set(ws)) for ws in toks)
    doc_count_text = sum(1 for ws in toks if ws)
    avg_unique = sum_df / float(doc_count_text)
    words = analyzer.tokenize_text(text)

    def f32ln(x):
        return float(np.float32(math.log(x)))

    out = {}
    for c in classes:
        den = avg_unique * float(dfc[c]) + float(n_class)
        sc = f32ln(dfc[c]) - f32ln(n_class)
        for w in words:
            hits = sum(1 for ws, r in zip(toks, roles) if r == c and w in ws)
            sc += float(np.float32(math.log((hits + 1) / den)))
        out[c] = sc
    return out


def test_nb_matches_brute(spark, nb_index, corpus_pdf):
    s = IndexSearcher(spark, nb_index)
    clf = SimpleNaiveBayesClassifier(s, class_field="role")
    assert sorted(clf.classes) == sorted(set(corpus_pdf["role"]))
    texts = [f"{VOCAB[0]} {VOCAB[3]} {VOCAB[0]}",  # repeated word counts twice
             f"{VOCAB[7]} {VOCAB[11]} zzznovocab"]
    got = clf.classify_all(texts)
    for text, scored in zip(texts, got):
        want = _brute_scores(corpus_pdf, s.analyzer, text)
        assert dict(scored) == want  # bit-exact
        assert [c for c, _ in scored] == sorted(
            want, key=lambda c: (-want[c], c))
    best = clf.assign_class(texts[0])
    assert best == got[0][0]
    df = clf.classify_df(texts).collect()
    assert len(df) == 2 * len(clf.classes)
    by = {(r["input_id"], r["cls"]): r["score"] for r in df}
    for i, scored in enumerate(got):
        for c, sc in scored:
            assert by[(i, c)] == sc


def test_knn_classifier_vote(spark, nb_index, corpus_pdf):
    from lucene_spark.classification import KNearestNeighborClassifier

    s = IndexSearcher(spark, nb_index)
    k = 12
    clf = KNearestNeighborClassifier(s, class_field="role", k=k)
    text = " ".join([VOCAB[0], VOCAB[1], VOCAB[0], VOCAB[2]] * 3)
    hits = s.more_like_this(text, k=k)
    assert hits
    # brute vote from the raw corpus rows (analyzer-tokenized role lookup)
    roles = list(corpus_pdf["role"])
    max_score = float(hits[0].score)
    counts, boosts = {}, {}
    for h in hits:
        c = roles[h.doc_id]
        counts[c] = counts.get(c, 0) + 1
        boosts[c] = boosts.get(c, 0.0) + float(
            np.float32(float(h.score) / max_score))
    sumdoc = sum(counts.values())
    want = {}
    for c in counts:
        sc = (counts[c] * (boosts[c] / counts[c])) / float(k)
        if sumdoc < k:
            sc = sc * float(k) / float(sumdoc)
        want[c] = sc
    got = clf.classify_all([text])[0]
    assert dict(got) == want  # bit-exact
    assert [c for c, _ in got] == sorted(want, key=lambda c: (-want[c], c))
    best = clf.assign_class(text)
    assert best == got[0]


def test_bm25_nb_top1_closed_form_matches_engine(spark, nb_index):
    """The classifier's analytic top-1 scores equal the engine actually
    running the reference's queries (BM25NBClassifier.java:205-231):
    top-1(+role:c) = cconst(c) and top-1(+role:c text:w) =
    f32(cconst + max class-doc word score)."""
    from lucene_spark.classification import BM25NBClassifier
    from lucene_spark.search import ast

    s = IndexSearcher(spark, nb_index)
    clf = BM25NBClassifier(s, class_field="role")
    for c in sorted(clf.cconst):
        hits = s.search(ast.BooleanQuery(
            [(ast.MUST, ast.TermQuery(c, "role"))]), k=1)
        assert hits and hits[0].score == pytest.approx(clf.cconst[c], abs=0)
        for w in (VOCAB[0], VOCAB[7], "zzznovocab"):
            bq = ast.BooleanQuery([(ast.MUST, ast.TermQuery(c, "role")),
                                   (ast.SHOULD, ast.TermQuery(w, "text"))])
            top1 = s.search(bq, k=1)[0].score
            mx = clf._max_word_scores([w]).get((w, c), 0.0)
            p = float(np.float32(clf.cconst[c] + mx))
            assert top1 == p


def test_bm25_nb_scores_and_normalization(spark, nb_index):
    """Raw log posteriors recompute from the engine's own pieces; softmax
    normalization preserves ranking and sums to 1 per input
    (normClassificationResults BM25NBClassifier.java:147-174)."""
    from lucene_spark.classification import BM25NBClassifier

    s = IndexSearcher(spark, nb_index)
    clf = BM25NBClassifier(s, class_field="role")
    texts = [f"{VOCAB[0]} {VOCAB[3]} {VOCAB[0]}",  # repeat counts twice
             f"{VOCAB[7]} zzznovocab"]
    raw = clf.classify_all(texts)
    # repeated word: score differs from the dedup'd version
    dedup = clf.classify_all([f"{VOCAB[0]} {VOCAB[3]}"])[0]
    assert dict(raw[0]) != dict(dedup)
    # brute recompute of input 0 from cconst + one max_word_scores call
    words = [VOCAB[0], VOCAB[3], VOCAB[0]]
    mx = clf._max_word_scores(words)
    for c, sc in raw[0]:
        want = float(np.float32(math.log(clf.cconst[c])))
        for w in words:
            p = float(np.float32(clf.cconst[c] + mx.get((w, c), 0.0)))
            want += float(np.float32(math.log(p)))
        assert sc == want
    norm = clf.classify_all(texts, normalize=True)
    for r, n in zip(raw, norm):
        assert [c for c, _ in r] == [c for c, _ in n]
        assert sum(p for _, p in n) == pytest.approx(1.0, rel=1e-12)
        assert all(p > 0 for _, p in n)


def test_knn_fuzzy_classifier(spark, nb_index, corpus_pdf):
    """KNearestFuzzyClassifier end-to-end: variants vs brute DL, clause
    scores vs hand recompute, df1 scoring vs the (patched) golden, vote vs
    _build_list_from_top_docs over golden hits."""
    from lucene_spark.classification import (
        NF_PREFIX_LENGTH, KNearestFuzzyClassifier, _build_list_from_top_docs,
        fuzzy_variants, nearest_fuzzy_query)
    from lucene_spark.goldens import BruteForceIndex
    from lucene_spark.search import ast
    from lucene_spark.search.multiterm import damerau_levenshtein

    s = IndexSearcher(spark, nb_index)
    golden = BruteForceIndex(corpus_pdf, keyword_fields=("role",))

    # variants ≡ brute enumeration over the full dictionary
    tok = VOCAB[0][:-1] + ("x" if VOCAB[0][-1] != "x" else "q")  # typo
    got = sorted(fuzzy_variants(s.reader, tok))
    vocab = sorted({w for t in corpus_pdf["text"]
                    for w in golden.analyzer.tokenize_text(t or "")})
    want = sorted(
        (v, len(golden.postings[v][0]),
         damerau_levenshtein(v[NF_PREFIX_LENGTH:], tok[NF_PREFIX_LENGTH:]))
        for v in vocab
        if v[:NF_PREFIX_LENGTH] == tok[:NF_PREFIX_LENGTH]
        and damerau_levenshtein(v[NF_PREFIX_LENGTH:],
                                tok[NF_PREFIX_LENGTH:]) <= 1
    )
    assert got == want and got  # the typo must have real variants

    # clause boosts: hand-recomputed f32 chain
    fq = nearest_fuzzy_query(s, tok)
    n = s.reader.doc_count
    src_df = sum(df for _, df, _ in want) // len(want)  # tok corpus-absent
    idf = float(np.float32(math.log((n + 1) / float(src_df + 1)) + 1.0))
    expect = {}
    for v, _df, ed in want:
        b = 1.0 if v == tok else float(
            np.float32(1.0) - np.float32(ed) / np.float32(min(len(v),
                                                              len(tok))))
        expect[v] = float(np.float32(
            np.float32(np.float32(b) * np.float32(b)) * np.float32(idf)))
    assert {c.term: c.boost for _, c in fq.clauses} == expect
    assert all(c.df1 for _, c in fq.clauses)

    # df1 scoring: engine ≡ golden on the raw fuzzy boolean (WAND/flat
    # path) and nested under a class wildcard (mixed path)
    hits = s.search(fq, k=15)
    ghits = golden.search(fq, k=15)
    assert [(h.doc_id, h.score) for h in hits] == ghits
    bq = ast.BooleanQuery(
        ((ast.MUST, fq),
         (ast.MUST, ast.MultiTermQuery("wildcard", "*", field="role"))))
    hits2 = s.search(bq, k=15)
    ghits2 = golden.search(bq, k=15)
    assert [(h.doc_id, h.score) for h in hits2] == ghits2
    # the class wildcard adds the constant 1.0 AFTER the nested fuzzy
    # node's float32 narrowing (per-level Scorer.score() contract)
    g1 = dict(ghits)
    assert all(sc == float(np.float32(np.float64(g1[d]) + 1.0))
               for d, sc in ghits2 if d in g1)

    # vote: classifier ≡ _build_list_from_top_docs over golden hits
    clf = KNearestFuzzyClassifier(s, class_field="role", k=15)
    roles = list(corpus_pdf["role"])
    cls_of = {d: roles[d] for d, _ in ghits2}
    want_vote = _build_list_from_top_docs(
        [type("H", (), {"doc_id": d, "score": sc})() for d, sc in ghits2],
        cls_of, 15)
    assert clf.classify_all([tok])[0] == want_vote


@pytest.fixture(scope="module")
def bool_index(spark, tmp_path_factory, corpus_pdf):
    """Index whose role field is a boolean string: 'true' for docs whose
    original role was 'user', else 'false'."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("boolidx") / "index")
    t = synthetic_transcripts(spark, N).withColumn(
        "role", F.when(F.col("role") == "user", "true").otherwise("false"))
    IndexBuilder(spark, d, num_segments=4, keyword_fields=("role",)).build(t)
    return d


def test_boolean_perceptron_matches_brute(spark, bool_index, corpus_pdf):
    """BooleanPerceptronClassifier (BooleanPerceptronClassifier.java:59):
    the engine's training loop ≡ an independent simulation from the raw
    corpus (integer weight arithmetic, stale-FST reads, batch-boundary
    flushes, tail updates dropped)."""
    from lucene_spark.classification import BooleanPerceptronClassifier

    s = IndexSearcher(spark, bool_index)
    an = s.analyzer

    for batch_size in (1, 3):
        clf = BooleanPerceptronClassifier(s, class_field="role",
                                          batch_size=batch_size)
        # brute simulation
        toks = [an.tokenize_text(t or "") for t in corpus_pdf["text"]]
        weights = {}
        for ws in toks:
            for w in ws:
                weights[w] = weights.get(w, 0.0) + 1.0
        sum_ttf = sum(len(ws) for ws in toks)
        bias = sum_ttf / float(len(toks))
        assert clf.bias == bias
        fst = {t: int(w) for t, w in weights.items()}

        def assign(ws):
            out = sum(fst[t] for t in ws if t in fst)
            return out >= bias

        batch_count = 0
        for ws, role in zip(toks, corpus_pdf["role"]):
            assigned = assign(ws)
            correct = role == "user"
            modifier = (correct > assigned) - (correct < assigned)
            if modifier:
                tfs = {}
                for t in ws:
                    tfs[t] = tfs.get(t, 0) + 1
                for t, tf in tfs.items():
                    prev = fst.get(t)
                    weights[t] = (0.0 if prev is None
                                  else float(max(0, prev + modifier * tf)))
                if batch_count % batch_size == 0:
                    fst = {t: int(w) for t, w in weights.items()}
            batch_count += 1
        assert clf.fst == fst, f"fst mismatch at batch_size={batch_size}"
        # the training must have actually updated something (the initial
        # weights are the raw ttf counts)
        init = {t0: int(sum(ws.count(t0) for ws in toks)) for t0 in clf.fst}
        assert clf.fst != init
        for text in [f"{VOCAB[0]} {VOCAB[3]}", "", "zzznovocab"]:
            a, sc = clf.assign_class(text)
            ws = an.tokenize_text(text)
            out = sum(fst[t] for t in ws if t in fst)
            assert a == (out >= bias)
            assert sc == 1.0 - math.exp(-abs(bias - float(out)) / bias)


def test_caching_nb_matches_simple(spark, nb_index):
    """CachingNaiveBayesClassifier ≡ SimpleNB scores; repeat calls answer
    from the cache (no new words → no new Spark job needed)."""
    from lucene_spark.classification import CachingNaiveBayesClassifier

    s = IndexSearcher(spark, nb_index)
    simple = SimpleNaiveBayesClassifier(s, class_field="role")
    caching = CachingNaiveBayesClassifier(s, class_field="role")
    texts = [f"{VOCAB[0]} {VOCAB[3]}", f"{VOCAB[3]} {VOCAB[7]}"]
    assert caching.classify_all(texts) == simple.classify_all(texts)
    words_before = set(caching._cached_words)
    assert caching.classify_all([texts[0]]) == simple.classify_all([texts[0]])
    assert caching._cached_words == words_before  # nothing re-fetched


def test_fuzzy_variants_short_token(spark, nb_index, corpus_pdf):
    """Tokens shorter than the 2-char prefix use realPrefixLength =
    min(prefixLength, termLength) (FuzzyAutomatonBuilder): for token 'a',
    a 2-char term like 'ab' is at suffix distance 1, NOT an exact match."""
    from lucene_spark.classification import fuzzy_variants
    from lucene_spark.search.multiterm import damerau_levenshtein

    s = IndexSearcher(spark, nb_index)
    vocab = sorted({w for t in corpus_pdf["text"]
                    for w in s.analyzer.tokenize_text(t or "")})
    tok = min(vocab, key=len)[:1]  # a 1-char key
    got = fuzzy_variants(s.reader, tok)
    for t, _df, ed in got:
        assert t[:1] == tok
        assert ed == damerau_levenshtein(t[1:], "") == len(t) - 1
        assert ed <= 1
    want = sorted(t for t in vocab if t[:1] == tok and len(t) <= 2)
    assert sorted(t for t, _, _ in got) == want
