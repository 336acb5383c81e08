"""Span-near matching (SpanNearQuery analogue): engine kernel vs brute-force
enumeration over the corpus positions, ordered and unordered."""

from itertools import permutations

import numpy as np
import pytest

from lucene_spark.corpus import VOCAB
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.search import ast
from lucene_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def golden(corpus_pdf):
    return BruteForceIndex(corpus_pdf)


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


def brute_span_docs(golden, terms, slop, in_order):
    """Docs with an ordered (or any-order) all-distinct position assignment
    whose window max−min−(n−1) ≤ slop."""
    n = len(terms)
    maps = [golden.positions.get(t, {}) for t in terms]
    if any(not m for m in maps):
        return []
    docs = set(maps[0])
    for m in maps[1:]:
        docs &= set(m)
    out = []
    for d in sorted(docs):
        pls = [sorted(m[d]) for m in maps]

        def feasible(order_idx):
            # greedy: pick the earliest strictly-increasing chain, then
            # check every end against the best (max) start — brute:
            # enumerate all combos for small lists
            from itertools import product

            for combo in product(*[pls[i] for i in order_idx]):
                if all(combo[j] > combo[j - 1] for j in range(1, n)) and \
                        combo[-1] - combo[0] - (n - 1) <= slop:
                    return True
            return False

        if in_order:
            hit = feasible(list(range(n)))
        else:
            hit = any(
                feasible(list(p)) for p in permutations(range(n))
            )
        if hit:
            out.append(d)
    return out


@pytest.mark.parametrize("in_order", [True, False])
@pytest.mark.parametrize("slop", [0, 2, 5])
def test_span_near_two_terms(searcher, golden, slop, in_order):
    terms = (VOCAB[0], VOCAB[3])
    q = ast.SpanNearQuery(terms, slop=slop, in_order=in_order)
    exp = brute_span_docs(golden, terms, slop, in_order)
    got = [h.doc_id for h in searcher.search(q, k=10_000)]
    assert got == exp, (slop, in_order)
    assert searcher.count(q) == len(exp)


def test_span_near_three_terms_ordered(searcher, golden):
    terms = (VOCAB[0], VOCAB[3], VOCAB[5])
    for slop in (1, 4, 10):
        q = ast.SpanNearQuery(terms, slop=slop)
        exp = brute_span_docs(golden, terms, slop, True)
        got = [h.doc_id for h in searcher.search(q, k=10_000)]
        assert got == exp, slop


def test_span_near_three_terms_unordered(searcher, golden):
    terms = (VOCAB[5], VOCAB[0], VOCAB[3])
    q = ast.SpanNearQuery(terms, slop=6, in_order=False)
    exp = brute_span_docs(golden, terms, 6, False)
    got = [h.doc_id for h in searcher.search(q, k=10_000)]
    assert got == exp


def test_span_near_repeated_term(searcher, golden):
    """span_near(t, t): two DISTINCT positions of the same term."""
    t = VOCAB[0]
    q = ast.SpanNearQuery((t, t), slop=3)
    exp = brute_span_docs(golden, (t, t), 3, True)
    got = [h.doc_id for h in searcher.search(q, k=10_000)]
    assert got == exp


def test_span_near_absent_term(searcher):
    q = ast.SpanNearQuery((VOCAB[0], "zzznotaterm"), slop=5)
    assert searcher.search(q, 10) == []
    assert searcher.count(q) == 0


def test_span_near_constant_score(searcher):
    q = ast.SpanNearQuery((VOCAB[0], VOCAB[3]), slop=4, boost=2.5)
    hits = searcher.search(q, 5)
    assert hits and all(h.score == float(np.float32(2.5)) for h in hits)
    assert [h.doc_id for h in hits] == sorted(h.doc_id for h in hits)
