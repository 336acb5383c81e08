"""Surround query parser + span-clauses-inside-booleans: engine ≡ golden
(the golden's brute position enumeration), parse shapes, error paths."""

import pytest

from lucene_spark.corpus import VOCAB
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.search import ast
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.surround import SurroundSyntaxError, parse_surround


@pytest.fixture(scope="module")
def golden(corpus_pdf):
    return BruteForceIndex(corpus_pdf)


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


A, B, C = VOCAB[0], VOCAB[3], VOCAB[7]


def test_parse_shapes(searcher):
    """Grammar: precedence (W tightest), infix ≡ prefix, distance → slop,
    field scope, boost, truncation expansion."""
    q = parse_surround(searcher, f"{A} 3W {B}")
    assert q == ast.SpanNearQuery((A, B), slop=2, in_order=True)
    assert parse_surround(searcher, f"3w({A}, {B})") == q
    n = parse_surround(searcher, f"{A} 4N {B}")
    assert n == ast.SpanNearQuery((A, B), slop=3, in_order=False)
    # W binds tighter than AND: a 2W b AND c == (a 2W b) AND c
    mixed = parse_surround(searcher, f"{A} 2W {B} AND {C}")
    assert isinstance(mixed, ast.BooleanQuery)
    (o1, c1), (o2, c2) = mixed.clauses
    assert o1 == o2 == ast.MUST
    assert c1 == ast.SpanNearQuery((A, B), slop=1, in_order=True)
    assert c2 == ast.TermQuery(C)
    # NOT: first MUST, rest MUST_NOT
    nq = parse_surround(searcher, f"{A} NOT {B}")
    assert nq.clauses == ((ast.MUST, ast.TermQuery(A)),
                          (ast.MUST_NOT, ast.TermQuery(B)))
    # field scope + boost
    fq = parse_surround(searcher, f"role:user AND {A}^2")
    assert (ast.MUST, ast.TermQuery("user", "role")) in fq.clauses
    assert (ast.MUST, ast.TermQuery(A, "text", 2.0)) in fq.clauses
    # truncation inside a distance op expands to a SpanOr slot
    tq = parse_surround(searcher, f"{A[:2]}* 2W {B}")
    assert isinstance(tq, ast.SpanNearQuery) and tq.slop == 1
    slot = tq.terms[0]
    assert isinstance(slot, tuple) and A in slot
    assert all(t.startswith(A[:2]) for t in slot)
    # OR group inside a distance op unions alternatives
    og = parse_surround(searcher, f"2W(OR({A}, {B}), {C})")
    assert set(og.terms[0]) == {A, B} and og.terms[1] == C


def test_parse_errors(searcher):
    for bad in [f"2W(3N({A}, {B}), {C})",      # nested distance
                f"{A} 2W {B} 3W {C}",           # mixed distances in a chain
                f"{A} 101W {B}",                # 101w lexes as a TERM →
                                                # two adjacent terms
                f"({A} AND {B}"]:               # unbalanced paren
        with pytest.raises(SurroundSyntaxError):
            parse_surround(searcher, bad)


def test_span_in_boolean_matches_golden(spark, searcher, golden):
    """Span clauses inside booleans (SpanQuery as a BooleanClause):
    engine ≡ golden bit-exact across MUST/SHOULD/MUST_NOT/FILTER and
    SpanOr slots."""
    span = ast.SpanNearQuery((A, B), slop=4)
    orspan = ast.SpanNearQuery(((A, VOCAB[2]), B), slop=3, in_order=False)
    queries = [
        ast.BooleanQuery(((ast.MUST, span), (ast.SHOULD, ast.TermQuery(C)))),
        ast.BooleanQuery(((ast.SHOULD, span),
                          (ast.SHOULD, ast.TermQuery(C)))),
        ast.BooleanQuery(((ast.MUST, ast.TermQuery(C)),
                          (ast.MUST_NOT, span))),
        ast.BooleanQuery(((ast.FILTER, span),
                          (ast.SHOULD, ast.TermQuery(VOCAB[5], boost=2.0)))),
        ast.BooleanQuery(((ast.MUST, orspan),
                          (ast.SHOULD, ast.TermQuery(VOCAB[9])))),
        # absent-term span as MUST → no hits; as SHOULD → other clause wins
        ast.BooleanQuery(((ast.MUST,
                           ast.SpanNearQuery(("zzznotaterm", B), slop=2)),
                          (ast.SHOULD, ast.TermQuery(C)))),
        ast.BooleanQuery(((ast.SHOULD,
                           ast.SpanNearQuery(("zzznotaterm", B), slop=2)),
                          (ast.SHOULD, ast.TermQuery(C)))),
    ]
    for q in queries:
        eng = [(h.doc_id, h.score) for h in searcher.search(q, k=20)]
        assert eng == golden.search(q, k=20), q


def test_surround_end_to_end_matches_golden(spark, searcher, golden):
    """Parsed surround queries run and match the golden."""
    for text in [f"({A} 3W {B}) AND {C}",
                 f"{A} AND {B} NOT {C}",
                 f"AND({A}, OR({B}, {C}))",
                 f"{A} 3N {B}"]:
        q = parse_surround(searcher, text)
        eng = [(h.doc_id, h.score) for h in searcher.search(q, k=15)]
        assert eng == golden.search(q, k=15), text


def test_distop_lexing_matches_reference(searcher):
    """_DISTOP_NUM is ("2"-"9")("0"-"9")? (QueryParser.jj) — '1w' and
    '10w'..'19w' are plain terms, not distance operators."""
    from lucene_spark.search.surround import _dist_op

    assert _dist_op("w") == (1, True) and _dist_op("99n") == (99, False)
    assert _dist_op("1w") is None and _dist_op("15n") is None
    q = parse_surround(searcher, f"{A} AND 1w")
    assert (ast.MUST, ast.TermQuery("1w")) in q.clauses
