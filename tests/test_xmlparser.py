"""XML query parser (queryparser/xml CoreParser analogue)."""

import pytest

from lucene_spark.analysis import get_analyzer
from lucene_spark.search import ast
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.xmlparser import ParserException, parse_xml

AN = get_analyzer("standard")


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


def test_parse_shapes():
    q = parse_xml(
        '<BooleanQuery minimumNumberShouldMatch="1">'
        '<Clause occurs="must"><TermQuery>alpha</TermQuery></Clause>'
        '<Clause occurs="should"><TermQuery boost="2.0">beta</TermQuery>'
        "</Clause>"
        '<Clause occurs="mustNot"><TermQuery>gamma</TermQuery></Clause>'
        "</BooleanQuery>", AN)
    assert isinstance(q, ast.BooleanQuery) and q.min_should_match == 1
    occs = [o for o, _ in q.clauses]
    assert occs == [ast.MUST, ast.SHOULD, ast.MUST_NOT]
    assert q.clauses[1][1].boost == 2.0
    # TermsQuery analyzes; TermQuery takes raw text
    tq = parse_xml("<TermsQuery fieldName='text'>Alpha BETA</TermsQuery>", AN)
    assert {t.term for _, t in tq.clauses} == {"alpha", "beta"}
    raw = parse_xml("<TermQuery>MiXeD</TermQuery>", AN)
    assert raw.term == "MiXeD"  # unanalyzed (TermQueryBuilder contract)
    # range, matchall, constant-score, dismax
    r = parse_xml('<RangeQuery lowerTerm="a" upperTerm="b" '
                  'includeUpper="false"/>', AN)
    assert r.kind == "range" and not r.include_upper
    assert isinstance(parse_xml("<MatchAllDocsQuery/>", AN),
                      ast.MatchAllDocsQuery)
    cs = parse_xml('<ConstantScoreQuery boost="1.5">'
                   "<TermQuery>x</TermQuery></ConstantScoreQuery>", AN)
    assert isinstance(cs, ast.ConstantScoreQuery) and cs.boost == 1.5
    dm = parse_xml('<DisjunctionMaxQuery tieBreaker="0.3">'
                   "<TermQuery>a</TermQuery><TermQuery>b</TermQuery>"
                   "</DisjunctionMaxQuery>", AN)
    assert dm.terms == ("a", "b") and dm.tie_breaker == 0.3
    # spans
    sn = parse_xml('<SpanNear slop="2" inOrder="false">'
                   "<SpanTerm>u</SpanTerm>"
                   "<SpanOrTerms>v w</SpanOrTerms></SpanNear>", AN)
    assert sn.terms == (("u",), ("v", "w")) and sn.slop == 2
    assert not sn.in_order
    sf = parse_xml('<SpanFirst end="3"><SpanTerm>z</SpanTerm></SpanFirst>',
                   AN)
    assert isinstance(sf, ast.SpanFirstQuery) and sf.end == 3
    sx = parse_xml("<SpanNot><Include><SpanNear slop=\"1\">"
                   "<SpanTerm>p</SpanTerm><SpanTerm>q</SpanTerm>"
                   "</SpanNear></Include>"
                   "<Exclude><SpanTerm>r</SpanTerm></Exclude></SpanNot>", AN)
    assert isinstance(sx, ast.SpanNotQuery) and sx.exclude == "r"


def test_parse_errors():
    for bad in ("<PointRangeQuery/>", "<TermQuery>  </TermQuery>",
                "not xml at all <",
                '<BooleanQuery><Clause occurs="weird">'
                "<TermQuery>x</TermQuery></Clause></BooleanQuery>",
                "<DisjunctionMaxQuery><MatchAllDocsQuery/>"
                "</DisjunctionMaxQuery>"):
        with pytest.raises(ParserException):
            parse_xml(bad, AN)


def test_xml_equals_classic(searcher):
    """The XML form of a classic query returns identical hits."""
    from lucene_spark.corpus import VOCAB

    v = VOCAB
    classic = searcher.search(f"+{v[1]} {v[5]} -{v[2]}", 30)
    xml = parse_xml(
        "<BooleanQuery>"
        f'<Clause occurs="must"><TermQuery>{v[1]}</TermQuery></Clause>'
        f'<Clause occurs="should"><TermQuery>{v[5]}</TermQuery></Clause>'
        f'<Clause occurs="mustNot"><TermQuery>{v[2]}</TermQuery></Clause>'
        "</BooleanQuery>", AN)
    assert [(h.doc_id, h.score) for h in searcher.search(xml, 30)] == \
        [(h.doc_id, h.score) for h in classic]
    # UserQuery passthrough — byte-identical by construction
    u = parse_xml(f"<UserQuery>+{v[1]} {v[5]} -{v[2]}</UserQuery>", AN)
    assert [(h.doc_id, h.score) for h in searcher.search(u, 30)] == \
        [(h.doc_id, h.score) for h in classic]


def test_xml_span_executes(searcher):
    from lucene_spark.corpus import VOCAB

    xml = parse_xml(
        f'<SpanNear slop="3" inOrder="false"><SpanTerm>{VOCAB[0]}</SpanTerm>'
        f"<SpanOrTerms>{VOCAB[1]} {VOCAB[2]}</SpanOrTerms></SpanNear>", AN)
    direct = ast.SpanNearQuery(((VOCAB[0],), (VOCAB[1], VOCAB[2])),
                               slop=3, in_order=False)
    assert [h.doc_id for h in searcher.search(xml, 20)] == \
        [h.doc_id for h in searcher.search(direct, 20)]
    assert searcher.count(xml) > 0


def test_boost_on_composite_elements():
    """boost on TermsQuery/BooleanQuery/UserQuery distributes onto scoring
    clauses (r4 review finding: AttributeError on boost-less booleans)."""
    q = parse_xml('<TermsQuery boost="2.0" fieldName="text">alpha beta'
                  "</TermsQuery>", AN)
    assert all(t.boost == 2.0 for _, t in q.clauses)
    u = parse_xml('<UserQuery boost="3.0">alpha beta -gamma</UserQuery>', AN)
    boosts = {t.term: t.boost for o, t in u.clauses}
    assert boosts["alpha"] == 3.0 and boosts["beta"] == 3.0
    assert boosts["gamma"] == 1.0  # MUST_NOT never scores → boost untouched
    b = parse_xml('<BooleanQuery boost="2.0">'
                  '<Clause occurs="must"><TermQuery>x</TermQuery></Clause>'
                  "</BooleanQuery>", AN)
    # single-must collapses after normalize; boost survived
    assert b.boost == 2.0
    # dismax children cannot carry their own attrs (explicit raise)
    with pytest.raises(ParserException):
        parse_xml('<DisjunctionMaxQuery><TermQuery boost="2">a</TermQuery>'
                  "</DisjunctionMaxQuery>", AN)
