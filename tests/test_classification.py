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
