"""Query-time synonym graph expansion (SynonymGraphFilter + QueryBuilder
analyzeGraphBoolean) and SynonymQuery-as-a-BooleanClause scoring."""

import numpy as np
import pytest

from lucene_spark.analysis import get_analyzer
from lucene_spark.corpus import VOCAB
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.search import ast
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.syngraph import (
    SynonymMap,
    expand_spans,
    graph_boolean,
)

AN = get_analyzer("standard")


@pytest.fixture(scope="module")
def golden(corpus_pdf):
    return BruteForceIndex(corpus_pdf)


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


def test_expand_spans_leftmost_longest():
    smap = SynonymMap([
        ("a b", ["x y"]),
        ("a", ["z"]),
        ("b c", ["w"]),
    ])
    # "a b" wins over "a" (longest at the leftmost start) and CONSUMES
    # b — no "b c" match can start inside the matched region
    spans = expand_spans(["a", "b", "c"], smap)
    assert spans == [(("a", "b"), ("x", "y")), (("c",),)]
    # single-token rule applies where the longer one cannot
    spans = expand_spans(["a", "c"], smap)
    assert spans == [(("a",), ("z",)), (("c",),)]


def test_expand_spans_dedup_original_first():
    smap = SynonymMap([("a", ["b", "a", "b"])])
    spans = expand_spans(["a"], smap)
    assert spans == [(("a",), ("b",))]  # original first, dup dropped


def test_graph_boolean_shapes():
    smap = SynonymMap([
        ("fast", ["slow"]),                     # single → single
        ("hash join", ["merge join", "group"]),  # multi → multi + single
    ], analyzer=AN)
    q = graph_boolean("hash join fast scan", smap, AN)
    assert isinstance(q, ast.BooleanQuery)
    occs = [o for o, _ in q.clauses]
    assert occs == [ast.SHOULD] * 3
    inner, syn, term = [s for _, s in q.clauses]
    # multi-token span → SHOULD boolean of phrase/term alternatives
    assert isinstance(inner, ast.BooleanQuery)
    alts = [s for _, s in inner.clauses]
    assert isinstance(alts[0], ast.PhraseQuery)
    assert alts[0].terms == ("hash", "join")   # original path first
    assert isinstance(alts[1], ast.PhraseQuery)
    assert alts[1].terms == ("merge", "join")
    assert isinstance(alts[2], ast.TermQuery) and alts[2].term == "group"
    # all-single-token span → SynonymQuery blend
    assert isinstance(syn, ast.SynonymQuery)
    assert syn.terms == ("fast", "slow")
    assert isinstance(term, ast.TermQuery) and term.term == "scan"
    # AND operator → MUST spans
    q_and = graph_boolean("fast scan", smap, AN, operator="and")
    assert [o for o, _ in q_and.clauses] == [ast.MUST, ast.MUST]
    # single span collapses; empty text → MatchNoDocs
    assert isinstance(graph_boolean("fast", smap, AN), ast.SynonymQuery)
    assert isinstance(graph_boolean("", smap, AN), ast.MatchNoDocsQuery)


def _syn_queries():
    """Boolean ASTs with SynonymQuery clauses over the corpus vocabulary."""
    v = VOCAB
    syn = ast.SynonymQuery
    tq = ast.TermQuery
    return [
        # SHOULD synonym + term
        ast.BooleanQuery(((ast.SHOULD, syn((v[0], v[7]))),
                          (ast.SHOULD, tq(v[3])))),
        # MUST synonym (blend gates the match set)
        ast.BooleanQuery(((ast.MUST, syn((v[5], v[9]))),
                          (ast.SHOULD, tq(v[0])))),
        # MUST_NOT synonym (union exclusion)
        ast.BooleanQuery(((ast.SHOULD, tq(v[2])),
                          (ast.MUST_NOT, syn((v[0], v[1]))))),
        # absent member drops silently from blend
        ast.BooleanQuery(((ast.SHOULD, syn((v[4], "zzznotaterm"))),
                          (ast.SHOULD, tq(v[8])))),
        # all members absent → SHOULD clause drops
        ast.BooleanQuery(((ast.SHOULD, syn(("zzznotaterm", "zzzother"))),
                          (ast.SHOULD, tq(v[6])))),
        # duplicate members dedup (SynonymQuery builder rejects dups)
        ast.BooleanQuery(((ast.SHOULD, syn((v[0], v[0], v[7]))),
                          (ast.SHOULD, tq(v[1])))),
    ]


def test_synonym_clause_golden_identity(searcher, golden):
    for q in _syn_queries():
        exp = golden.search(q, 50)
        got = [(h.doc_id, h.score) for h in searcher.search(q, 50)]
        assert got == exp, f"mismatch for {q}"


def test_synonym_clause_count(searcher, golden):
    q = _syn_queries()[0]
    assert searcher.count(q) == len(golden.search(q, 10**6))


def test_graph_boolean_end_to_end(searcher, golden, corpus_pdf):
    """Full chain: text → graph expansion → engine ≡ golden, both
    operators."""
    v = VOCAB
    smap = SynonymMap([
        (v[0], [v[7]]),
        (f"{v[1]} {v[2]}", [f"{v[4]} {v[5]}", v[9]]),
    ], analyzer=AN)
    for op in ("or", "and"):
        q = graph_boolean(f"{v[1]} {v[2]} {v[0]} {v[3]}", smap, AN,
                          operator=op)
        exp = golden.search(q, 30)
        got = [(h.doc_id, h.score) for h in searcher.search(q, 30)]
        assert got == exp, f"mismatch for operator {op}"
        assert got, "expansion should match documents"


def test_explain_synonym_clause(searcher):
    q = _syn_queries()[0]
    hits = searcher.search(q, 1)
    ex = searcher.explain(q, hits[0].doc_id)
    assert ex["match"] is True
    syn_entries = [c for c in ex["clauses"] if c["kind"] == "synonym"]
    assert syn_entries and syn_entries[0]["freq"] >= 1
    assert abs(ex["total"] - hits[0].score) < 1e-6
