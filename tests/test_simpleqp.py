"""SimpleQueryParser: parse shapes mirroring the reference's test semantics
(``queryparser/simple/TestSimpleQueryParser.java``), the never-throws
contract, and engine ≡ golden equivalence for the MatchAllDocsQuery-inside-
boolean shapes the NOT operator produces."""

import pytest

from lucene_spark.analysis import get_analyzer
from lucene_spark.corpus import VOCAB
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.search import ast
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.search.simpleqp import (
    ALL_OPERATORS,
    NOT_OPERATOR,
    PREFIX_OPERATOR,
    SimpleQueryParser,
    parse_simple,
)

A, B, C, D = VOCAB[0], VOCAB[3], VOCAB[7], VOCAB[11]
AN = get_analyzer("standard")


def sp(text, **kw):
    return parse_simple(text, AN, **kw)


@pytest.fixture(scope="module")
def golden(corpus_pdf):
    return BruteForceIndex(corpus_pdf)


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


# -- parse shapes (TestSimpleQueryParser semantics) ------------------------

def test_term_and_defaults():
    assert sp(A) == ast.TermQuery(A)
    # default operator is SHOULD / OR (SimpleQueryParser.java:130)
    assert sp(f"{A} {B}") == ast.BooleanQuery(
        ((ast.SHOULD, ast.TermQuery(A)), (ast.SHOULD, ast.TermQuery(B))))
    # settable to MUST (testDefaultOperator)
    assert sp(f"{A} {B}", default_operator=ast.MUST) == ast.BooleanQuery(
        ((ast.MUST, ast.TermQuery(A)), (ast.MUST, ast.TermQuery(B))))


def test_explicit_operators():
    assert sp(f"{A}+{B}") == ast.BooleanQuery(
        ((ast.MUST, ast.TermQuery(A)), (ast.MUST, ast.TermQuery(B))))
    assert sp(f"{A}|{B}") == ast.BooleanQuery(
        ((ast.SHOULD, ast.TermQuery(A)), (ast.SHOULD, ast.TermQuery(B))))
    # left fold on operator change: a | b + c == (a OR b) AND c
    assert sp(f"{A} | {B} + {C}") == ast.BooleanQuery((
        (ast.MUST, ast.BooleanQuery(((ast.SHOULD, ast.TermQuery(A)),
                                     (ast.SHOULD, ast.TermQuery(B))))),
        (ast.MUST, ast.TermQuery(C)),
    ))
    # doubled/dangling operators are ignored (testGarbage*)
    assert sp(f"{A}++{B}") == sp(f"{A}+{B}")
    assert sp(f"+{A}") == ast.TermQuery(A)
    assert sp(f"{A}|") == ast.TermQuery(A)


def test_not_operator():
    # -foo == BQ[(MUST_NOT foo), (SHOULD matchall)] (testNOT)
    w = ast.BooleanQuery(((ast.MUST_NOT, ast.TermQuery(A)),
                          (ast.SHOULD, ast.MatchAllDocsQuery())))
    assert sp(f"-{A}") == w
    # double negation cancels
    assert sp(f"--{A}") == ast.TermQuery(A)
    # not binds to the next token only; whitespace between - and token
    # resets it (parseSubQuery:227-229)
    assert sp(f"- {A}") == ast.TermQuery(A)
    # a -b == a OR complement(b) under the default operator
    assert sp(f"{A} -{B}") == ast.BooleanQuery(
        ((ast.SHOULD, ast.TermQuery(A)), (ast.SHOULD, ast.BooleanQuery((
            (ast.MUST_NOT, ast.TermQuery(B)),
            (ast.SHOULD, ast.MatchAllDocsQuery()))))))


def test_precedence_groups():
    q = sp(f"{A} + ({B} | {C})")
    assert q == ast.BooleanQuery((
        (ast.MUST, ast.TermQuery(A)),
        (ast.MUST, ast.BooleanQuery(((ast.SHOULD, ast.TermQuery(B)),
                                     (ast.SHOULD, ast.TermQuery(C))))),
    ))
    # unmatched '(' is extraneous (testGarbageSubquery)
    assert sp(f"({A}") == ast.TermQuery(A)
    assert sp(f"{A})") == ast.TermQuery(A)
    # empty parens reset the pending operator
    assert sp(f"{A} + () {B}") == ast.BooleanQuery(
        ((ast.SHOULD, ast.TermQuery(A)), (ast.SHOULD, ast.TermQuery(B))))


def test_phrase_and_near():
    assert sp(f'"{A} {B}"') == ast.PhraseQuery((A, B))
    assert sp(f'"{A} {B}"~3') == ast.PhraseQuery((A, B), slop=3)
    # ~ at end of input → no slop chars → plain phrase
    assert sp(f'"{A} {B}"~') == ast.PhraseQuery((A, B))
    # junk slop → 0 (parseFuzziness NFE path)
    assert sp(f'"{A} {B}"~x') == ast.PhraseQuery((A, B), slop=0)
    # one-token phrase collapses to a term (createPhraseQuery)
    assert sp(f'"{A}"') == ast.TermQuery(A)
    # unmatched quote is extraneous (testGarbageQuote)
    assert sp(f'"{A}') == ast.TermQuery(A)


def test_prefix_and_fuzzy():
    assert sp(f"{A}*") == ast.MultiTermQuery("prefix", value=A)
    # '*' mid-token is literal; only a trailing one is the operator
    mid = sp(f"{A}*{B}")
    assert not isinstance(mid, ast.MultiTermQuery) or mid.kind != "prefix"
    assert sp(f"{A}~1") == ast.MultiTermQuery("fuzzy", value=A, max_edits=1)
    # bare ~ → 2; >2 caps at 2 (LevenshteinAutomata max)
    assert sp(f"{A}~") == ast.MultiTermQuery("fuzzy", value=A, max_edits=2)
    assert sp(f"{A}~9") == ast.MultiTermQuery("fuzzy", value=A, max_edits=2)
    # ~0 / junk → plain term (fuzziness 0 → newDefaultQuery)
    assert sp(f"{A}~0") == ast.TermQuery(A)
    assert sp(f"{A}~z") == ast.TermQuery(A)


def test_escape_matchall_empty():
    assert sp("*") == ast.MatchAllDocsQuery()
    assert sp("  *  ") == ast.MatchAllDocsQuery()
    assert sp("") == ast.MatchNoDocsQuery()
    assert sp("   ") == ast.MatchNoDocsQuery()
    # escaped '*' is not a prefix operator
    assert sp(f"{A}\\*") == sp(f"{A}*", flags=ALL_OPERATORS
                               & ~PREFIX_OPERATOR)
    # escaped '+' keeps the chars one token; the analyzer then splits them
    q = sp(f"{A}\\+{B}")
    assert q == ast.BooleanQuery(
        ((ast.SHOULD, ast.TermQuery(A)), (ast.SHOULD, ast.TermQuery(B))))


def test_flags_disable_operators():
    # NOT disabled: '-' is an ordinary token char, analyzer strips it
    q = sp(f"-{A}", flags=ALL_OPERATORS & ~NOT_OPERATOR)
    assert q == ast.TermQuery(A)


def test_never_throws():
    junk = ["((", "))((", '"""', "+-|", "\\", "~", "(~)", '"(-~\\', "-",
            "a+(b", "((a|b)", '"a b', "*a", "a**", "|+-"]
    for s in junk:
        sp(s)  # must not raise


def test_multi_field_weights():
    p = SimpleQueryParser(AN, {"text": 1.0, "role": 2.0})
    q = p.parse(A)
    assert isinstance(q, ast.BooleanQuery)
    assert (ast.SHOULD, ast.TermQuery(A, "text", 1.0)) in q.clauses
    assert (ast.SHOULD, ast.TermQuery(A, "role", 2.0)) in q.clauses


# -- engine ≡ golden over SQP queries (incl. matchall-in-boolean) ----------

QUERIES = [
    f"{A} + ({B} | {C}) -{D}",
    f"-{A}",
    f"{A} -{B}",
    f"{A} | {B} + {C}",
    f'"{A} {B}" | {C}',
    f"-{A} -{B}",
    f"{A} + -{B}",  # AND with a complement clause
]


@pytest.mark.parametrize("qstr", QUERIES)
def test_engine_matches_golden(searcher, golden, qstr):
    q = parse_simple(qstr, AN)
    got = searcher.search(q, k=40)
    want = golden.search(q, k=40)
    assert [(h.doc_id, h.score) for h in got] == [
        (d, pytest.approx(s, abs=0.0)) for d, s in want]


def test_count_complement(searcher, golden):
    """count() with a matchall clause: complement cardinality, distributed
    per-segment (incl. segments holding none of the query's terms)."""
    q = parse_simple(f"-{A}", AN)
    got = searcher.count(q)
    want = len(golden.search(q, k=10**9))
    assert got == want


def test_explain_matchall_clause(searcher):
    """explain() on a NOT-wrapper query: total must equal the search score
    bit-exactly, with the matchall clause reported."""
    q = parse_simple(f"{A} -{B}", AN)
    hits = searcher.search(q, k=3)
    assert hits
    for h in hits:
        e = searcher.explain(q, h.doc_id)
        assert e["match"] is True
        assert e["total"] == h.score

    def kinds(entries):
        out = []
        for c in entries:
            out.append(c["kind"])
            out.extend(kinds(c.get("clauses", [])))
        return out

    assert "matchall" in kinds(e["clauses"])


def test_absent_term_complement_runs_distributed(searcher, golden):
    """A NOT of a corpus-absent term matches EVERY doc — every segment is
    uncovered by postings, so the whole result comes from the distributed
    complement path."""
    q = parse_simple("-zzzabsenttermzzz", AN)
    n = searcher.count(q)
    assert n == golden.n
    hits = searcher.search(q, k=5)
    assert [h.doc_id for h in hits] == list(range(5))
    assert all(h.score == 1.0 for h in hits)
