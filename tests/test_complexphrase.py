"""ComplexPhraseQueryParser: parse shapes, span rewrite semantics
(``queryparser/complexPhrase/ComplexPhraseQueryParser.java``), dead-slot
never-match rule, and engine ≡ golden equivalence."""

import pytest

from lucene_spark.corpus import VOCAB
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.search import ast
from lucene_spark.search.complexphrase import parse_complex_phrase
from lucene_spark.search.searcher import IndexSearcher

A, B, C = VOCAB[0], VOCAB[3], VOCAB[7]


@pytest.fixture(scope="module")
def golden(corpus_pdf):
    return BruteForceIndex(corpus_pdf)


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


def test_parse_shapes(searcher):
    # group + prefix inside a phrase → SpanNear with SpanOr slots
    q = parse_complex_phrase(searcher, f'"({A} {B}) {C[:4]}*"~2')
    assert isinstance(q, ast.SpanNearQuery)
    assert q.slop == 2 and q.in_order
    assert q.terms[0] == (A, B)
    assert isinstance(q.terms[1], tuple)
    assert all(t.startswith(C[:4]) for t in q.terms[1])
    assert C in q.terms[1]
    # plain-terms phrase: term slots, default slop 0
    q2 = parse_complex_phrase(searcher, f'"{A} {B}"')
    assert q2 == ast.SpanNearQuery((A, B), slop=0, in_order=True)
    # in_order toggle (setInOrder)
    q3 = parse_complex_phrase(searcher, f'"{A} {B}"', in_order=False)
    assert not q3.in_order
    # boost after the phrase lands on the span query
    q4 = parse_complex_phrase(searcher, f'"{A} {B}"^2.5')
    assert q4.boost == 2.5
    # single-element phrase returns the element query directly (:262-266)
    assert parse_complex_phrase(searcher, f'"{A}"') == ast.TermQuery(A)
    mt = parse_complex_phrase(searcher, f'"{A[:3]}*"')
    assert mt == ast.MultiTermQuery("prefix", value=A[:3])
    # classic context preserved around phrases
    q5 = parse_complex_phrase(searcher, f'+"{A} {B}*" {C}')
    assert isinstance(q5, ast.BooleanQuery)
    (o1, c1), (o2, c2) = q5.clauses
    assert o1 == ast.MUST and isinstance(c1, ast.SpanNearQuery)
    assert (o2, c2) == (ast.SHOULD, ast.TermQuery(C))


def test_negation_inside_phrase_rejected(searcher):
    with pytest.raises(NotImplementedError):
        parse_complex_phrase(searcher, f'"{A} -{B}"')


def test_dead_slot_never_matches(searcher):
    """An element with no dictionary expansion keeps a never-match slot —
    the phrase must NOT degrade to matching its other elements (:300-316)."""
    q = parse_complex_phrase(searcher, f'"{A} zzqqabsent*"')
    assert isinstance(q, ast.SpanNearQuery)
    assert q.terms[1] == ()
    assert searcher.search(q, k=5) == []
    assert searcher.count(q) == 0


@pytest.mark.parametrize("qstr,kw", [
    (f'"({{A}} {{B}}) {{C}}"~1', {}),
    (f'"{{A}} {{B}}"~2', {"in_order": False}),
    (f'+"{{A}} {{B}}" {{C}}', {}),
])
def test_engine_matches_golden(searcher, golden, qstr, kw):
    qs = qstr.format(A=A, B=B, C=C)
    q = parse_complex_phrase(searcher, qs, **kw)
    got = searcher.search(q, k=30)
    want = golden.search(q, k=30)
    assert [(h.doc_id, h.score) for h in got] == want
