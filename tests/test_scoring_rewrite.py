"""MultiTermQuery.SCORING_BOOLEAN_REWRITE (core/search/ScoringRewrite.java:44-79):
scored expansion vs a manual SHOULD boolean, and the 1024-clause cap parity
(IndexSearcher.java maxClauseCount)."""

import pytest

from lucene_spark.search import ast
from lucene_spark.search.multiterm import TooManyClauses, expand_terms
from lucene_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


def test_scored_rewrite_equals_manual_boolean(searcher):
    q = ast.MultiTermQuery("prefix", "qe")
    terms = sorted(expand_terms(searcher.reader, q))
    assert len(terms) >= 2, "prefix should expand to several corpus terms"
    got = [(h.doc_id, h.score)
           for h in searcher.multiterm_scored_search(q, k=25)]
    want = [(h.doc_id, h.score) for h in searcher.search(
        ast.BooleanQuery(tuple(
            (ast.SHOULD, ast.TermQuery(t)) for t in terms)), k=25)]
    assert got == want


def test_scored_rewrite_differs_from_constant_score(searcher):
    """Unlike CONSTANT_SCORE (score == boost), scored clauses carry BM25
    weights — the two rewrites must produce different score profiles."""
    q = ast.MultiTermQuery("prefix", "qe")
    scored = searcher.multiterm_scored_search(q, k=10)
    assert scored and len({round(h.score, 6) for h in scored}) > 1


def test_scored_rewrite_raises_too_many_clauses(searcher):
    """checkMaxClauseCount (:75-79): an expansion past the clause cap must
    fail loudly like the reference — never silently truncate
    (max_clause_count mirrors IndexSearcher.setMaxClauseCount)."""
    with pytest.raises(TooManyClauses):
        searcher.multiterm_scored_search(ast.MultiTermQuery("wildcard", "*"),
                                         k=10, max_clause_count=10)


def test_scored_rewrite_empty_expansion(searcher):
    assert searcher.multiterm_scored_search(
        ast.MultiTermQuery("prefix", "zzzzzz"), k=10) == []
