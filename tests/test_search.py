"""Search correctness: engine (exhaustive AND wand) ≡ brute-force goldens,
bit-exact float32 scores, tie-break, WAND≡exhaustive (TestWANDScorer analogy)."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.corpus import VOCAB
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.search import ast
from lucene_spark.search.searcher import IndexSearcher

QUERIES = [
    VOCAB[0],                                # hot term
    VOCAB[800],                              # rare term
    f"{VOCAB[0]} {VOCAB[3]} {VOCAB[17]}",    # OR
    f"+{VOCAB[1]} {VOCAB[5]}",               # MUST + SHOULD
    f"+{VOCAB[1]} +{VOCAB[0]}",              # AND
    f"+{VOCAB[2]} -{VOCAB[0]}",              # MUST + MUST_NOT
    f"{VOCAB[4]}^2.5 {VOCAB[9]}",            # boost
    f"{VOCAB[0]} {VOCAB[0]}",                # duplicate SHOULD clauses
    "zzznotaterm",                           # absent term
    f"+zzznotaterm {VOCAB[0]}",              # absent MUST
    f"-{VOCAB[0]}",                          # only prohibited → no hits
]


@pytest.fixture(scope="module")
def golden(corpus_pdf):
    return BruteForceIndex(corpus_pdf)


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


@pytest.mark.parametrize("k", [10, 100])
@pytest.mark.parametrize("mode", ["exhaustive", "wand"])
def test_rank_and_score_identity(searcher, golden, mode, k):
    for q in QUERIES:
        exp = golden.search(q, k)
        got = [(sd.doc_id, sd.score) for sd in searcher.search(q, k, mode=mode)]
        assert got == exp, f"mismatch for query {q!r} mode={mode} k={k}"


def test_wand_equals_exhaustive_large_k(searcher):
    for q in QUERIES[:7]:
        a = searcher.search(q, 250, mode="exhaustive")
        b = searcher.search(q, 250, mode="wand")
        assert a == b, f"WAND != exhaustive for {q!r}"


def test_tiebreak_lower_docid_wins(spark, tmp_path):
    """Equal scores → lower docID first (HitQueue.java:78-84)."""
    import shutil

    from lucene_spark.indexing.builder import IndexBuilder

    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(6)],
            "turn_idx": [0] * 6,
            "role": ["user"] * 6,
            # identical docs → identical (tf, dl) → identical score
            "text": ["apple pie"] * 5 + ["banana"],
            "tool": [None] * 6,
            "ts": [None] * 6,
        }
    )
    df = spark.createDataFrame(pdf)
    d = str(tmp_path / "tieidx")
    shutil.rmtree(d, ignore_errors=True)
    IndexBuilder(spark, d, num_segments=2).build(df)
    s = IndexSearcher(spark, d)
    for mode in ("exhaustive", "wand"):
        hits = s.search("apple", 3, mode=mode)
        assert [h.doc_id for h in hits] == [0, 1, 2]
        assert len({h.score for h in hits}) == 1


def test_count(searcher, golden):
    q = f"{VOCAB[0]} {VOCAB[3]}"
    assert searcher.count(q) == len(golden.search(q, 10**6))


def test_parser_shapes():
    from lucene_spark.analysis import StandardAnalyzer

    an = StandardAnalyzer()
    q = ast.parse(f"+{VOCAB[1]} -{VOCAB[2]} {VOCAB[3]}^2", an)
    occ = q.by_occur
    assert [t.term for t in occ[ast.MUST]] == [VOCAB[1]]
    assert [t.term for t in occ[ast.MUST_NOT]] == [VOCAB[2]]
    assert occ[ast.SHOULD][0].boost == 2.0
    # single bare term collapses to TermQuery
    assert isinstance(ast.parse("hello", an), ast.TermQuery)
    # empty / all-dropped → MatchNoDocs
    assert isinstance(ast.parse("", an), ast.MatchNoDocsQuery)
    assert isinstance(ast.parse("x" * 300, an), ast.MatchNoDocsQuery)
