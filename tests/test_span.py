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


def _slot_positions(golden, slot):
    """Positions map of a slot: a term name, or a tuple of SpanOr
    alternatives (union of the alternatives' positions per doc)."""
    if isinstance(slot, tuple):
        merged: dict = {}
        for t in slot:
            for d, ps in golden.positions.get(t, {}).items():
                merged.setdefault(d, set()).update(ps)
        return {d: sorted(ps) for d, ps in merged.items()}
    return golden.positions.get(slot, {})


def brute_span_docs(golden, terms, slop, in_order):
    """Docs with an ordered (or any-order) all-distinct position assignment
    whose window max−min−(n−1) ≤ slop."""
    n = len(terms)
    maps = [_slot_positions(golden, t) for t in terms]
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


@pytest.mark.parametrize("in_order", [True, False])
@pytest.mark.parametrize("slop", [0, 3])
def test_span_or_clause(searcher, golden, slop, in_order):
    """SpanOr sub-span (tuple slot): matches at the union of the
    alternatives' positions — brute enumeration over the merged maps."""
    terms = ((VOCAB[0], VOCAB[5]), VOCAB[3])
    q = ast.SpanNearQuery(terms, slop=slop, in_order=in_order)
    exp = brute_span_docs(golden, terms, slop, in_order)
    got = [h.doc_id for h in searcher.search(q, k=10_000)]
    assert got == exp, (slop, in_order)
    assert searcher.count(q) == len(exp)


def test_span_or_three_slots(searcher, golden):
    terms = (VOCAB[1], (VOCAB[0], VOCAB[3], VOCAB[7]), VOCAB[5])
    q = ast.SpanNearQuery(terms, slop=8)
    exp = brute_span_docs(golden, terms, 8, True)
    got = [h.doc_id for h in searcher.search(q, k=10_000)]
    assert got == exp


def test_span_or_superset_of_single(searcher, golden):
    """A SpanOr slot's match set contains each single-alternative set."""
    a = set(h.doc_id for h in searcher.search(
        ast.SpanNearQuery(((VOCAB[0], VOCAB[5]), VOCAB[3]), slop=4),
        k=10_000))
    for alt in (VOCAB[0], VOCAB[5]):
        single = set(h.doc_id for h in searcher.search(
            ast.SpanNearQuery((alt, VOCAB[3]), slop=4), k=10_000))
        assert single <= a


def test_span_or_absent_alternative_ignored(searcher, golden):
    """Corpus-absent alternatives drop out; the slot dies only when ALL
    alternatives are absent."""
    base = [h.doc_id for h in searcher.search(
        ast.SpanNearQuery((VOCAB[0], VOCAB[3]), slop=4), k=10_000)]
    mixed = [h.doc_id for h in searcher.search(
        ast.SpanNearQuery(((VOCAB[0], "zzznotaterm"), VOCAB[3]), slop=4),
        k=10_000)]
    assert mixed == base
    q_dead = ast.SpanNearQuery((("zzznotaterm", "zzzalsonot"), VOCAB[3]),
                               slop=4)
    assert searcher.search(q_dead, 10) == []
    assert searcher.count(q_dead) == 0


def brute_span_spans(golden, terms, slop, d):
    """All (start, end_pos) of ordered chains in doc d with width ≤ slop."""
    from itertools import product

    n = len(terms)
    maps = [golden.positions.get(t, {}) for t in terms]
    if any(d not in m for m in maps):
        return []
    out = []
    for combo in product(*[sorted(m[d]) for m in maps]):
        if all(combo[j] > combo[j - 1] for j in range(1, n)) and \
                combo[-1] - combo[0] - (n - 1) <= slop:
            out.append((combo[0], combo[-1]))
    return out


@pytest.mark.parametrize("end", [3, 8, 15, 40])
def test_span_first(searcher, golden, end):
    """SpanFirstQuery: docs with an ordered chain whose end position + 1
    ≤ end — brute enumeration of every chain."""
    terms = (VOCAB[0], VOCAB[3])
    q = ast.SpanFirstQuery(terms, end=end, slop=4)
    exp = [
        d for d in brute_span_docs(golden, terms, 4, True)
        if any(e + 1 <= end for _s, e in
               brute_span_spans(golden, terms, 4, d))
    ]
    got = [h.doc_id for h in searcher.search(q, k=10_000)]
    assert got == exp, end
    assert searcher.count(q) == len(exp)


@pytest.mark.parametrize("pre,post", [(0, 0), (1, 1), (3, 0), (0, 5)])
def test_span_not(searcher, golden, pre, post):
    """SpanNotQuery: docs with an ordered chain no exclude-term position
    inside [start − pre, end + post] — brute enumeration."""
    terms = (VOCAB[0], VOCAB[3])
    exc = VOCAB[5]
    q = ast.SpanNotQuery(terms, exclude=exc, pre=pre, post=post, slop=4)
    exc_pos = golden.positions.get(exc, {})
    exp = []
    for d in brute_span_docs(golden, terms, 4, True):
        eps = set(exc_pos.get(d, []))
        if any(not any(s - pre <= qp <= e + post for qp in eps)
               for s, e in brute_span_spans(golden, terms, 4, d)):
            exp.append(d)
    got = [h.doc_id for h in searcher.search(q, k=10_000)]
    assert got == exp, (pre, post)
    assert searcher.count(q) == len(exp)


def test_span_not_absent_exclude(searcher, golden):
    """Exclude term absent from the corpus → behaves as plain span_near."""
    terms = (VOCAB[0], VOCAB[3])
    a = [h.doc_id for h in searcher.search(
        ast.SpanNotQuery(terms, exclude="zzznotaterm", slop=4), k=10_000)]
    b = [h.doc_id for h in searcher.search(
        ast.SpanNearQuery(terms, slop=4), k=10_000)]
    assert a == b


def test_span_near_constant_score(searcher):
    q = ast.SpanNearQuery((VOCAB[0], VOCAB[3]), slop=4, boost=2.5)
    hits = searcher.search(q, 5)
    assert hits and all(h.score == float(np.float32(2.5)) for h in hits)
    assert [h.doc_id for h in hits] == sorted(h.doc_id for h in hits)


def test_span_kernel_rejects_global_docids():
    """The chain-DP kernel keys by docID * 2^34 — global docIDs past 2^29
    would overflow int64, so callers must pass segment-local IDs and the
    kernel enforces the bound."""
    from lucene_spark.search.phrase import (
        _term_postings_with_positions,
        segment_span_near,
    )

    # craft a single-term segment whose first_doc is already past 2^29
    import numpy as np

    def varint(vals):
        from lucene_spark.indexing.blocks import CODEC_VARINT

        out = bytearray([CODEC_VARINT])  # tagged, as the builder writes
        for v in vals:
            while True:
                b = v & 0x7F
                v >>= 7
                if v:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)

    rows = {
        "term": np.array(["t"], dtype=object),
        "first_doc": np.array([1 << 29], dtype=np.int64),
        "last_doc": np.array([1 << 29], dtype=np.int64),
        "count": np.array([1], dtype=np.int64),
        "doc_gaps": np.array([varint([0])], dtype=object),
        "tfs": np.array([varint([1])], dtype=object),
        "norms": np.array([bytes([24])], dtype=object),
        "positions": np.array([varint([0])], dtype=object),
    }
    with pytest.raises(ValueError, match="segment-local"):
        segment_span_near(rows, ["t"], slop=0)


def brute_containing_docs(golden, terms, slop, little, in_order=True):
    """Docs with a feasible span [s, e] containing a little-term position
    — full enumeration over all chains."""
    lmap = golden.positions.get(little, {})
    out = []
    for d in brute_span_docs(golden, terms, slop, in_order):
        spans = brute_span_spans(golden, terms, slop, d) if in_order else []
        if not in_order:
            from itertools import permutations as _perms

            seen = set()
            for p in _perms(terms):
                for sp in brute_span_spans(golden, list(p), slop, d):
                    seen.add(sp)
            spans = sorted(seen)
        lps = set(lmap.get(d, []))
        if any(any(s <= p <= e for p in lps) for s, e in spans):
            out.append(d)
    return out


@pytest.mark.parametrize("slop", [1, 4, 8])
def test_span_containing(searcher, golden, slop):
    """SpanContainingQuery ≡ brute chain enumeration + containment."""
    terms, little = (VOCAB[0], VOCAB[3]), VOCAB[5]
    q = ast.SpanContainingQuery(terms, little=little, slop=slop)
    exp = brute_containing_docs(golden, terms, slop, little)
    got = [h.doc_id for h in searcher.search(q, k=10_000)]
    assert got == exp, slop
    assert searcher.count(q) == len(exp)


def test_span_containing_unordered(searcher, golden):
    terms, little = (VOCAB[3], VOCAB[0]), VOCAB[5]
    q = ast.SpanContainingQuery(terms, little=little, slop=6,
                                in_order=False)
    exp = brute_containing_docs(golden, terms, 6, little, in_order=False)
    got = [h.doc_id for h in searcher.search(q, k=10_000)]
    assert got == exp


def test_span_within_equals_containing_docset(searcher):
    """Under constant scoring the two role views match the same docs
    (documented v1 cut — they differ only in which spans feed scoring)."""
    kw = dict(terms=(VOCAB[0], VOCAB[3]), little=VOCAB[5], slop=4)
    a = [h.doc_id for h in searcher.search(
        ast.SpanContainingQuery(**kw), k=10_000)]
    b = [h.doc_id for h in searcher.search(
        ast.SpanWithinQuery(**kw), k=10_000)]
    assert a == b and a


def test_span_containing_subset_of_base(searcher, golden):
    base = set(h.doc_id for h in searcher.search(
        ast.SpanNearQuery((VOCAB[0], VOCAB[3]), slop=4), k=10_000))
    cont = set(h.doc_id for h in searcher.search(
        ast.SpanContainingQuery((VOCAB[0], VOCAB[3]), little=VOCAB[5],
                                slop=4), k=10_000))
    assert cont <= base and cont != base  # the containment check bites


def test_span_containing_absent_little(searcher):
    q = ast.SpanContainingQuery((VOCAB[0], VOCAB[3]), little="zzznotaterm",
                                slop=4)
    assert searcher.search(q, 10) == []
    assert searcher.count(q) == 0


def test_span_containing_single_term_big(searcher, golden):
    """n=1 big span is [p, p]: containment requires the little position AT
    the big position — the slop window must not widen feasible starts
    (review finding: lo_bound over-matched for n=1)."""
    big, little = VOCAB[0], VOCAB[3]
    bmap = golden.positions.get(big, {})
    lmap = golden.positions.get(little, {})
    exp = sorted(d for d, ps in bmap.items()
                 if set(ps) & set(lmap.get(d, [])))
    # tokens are distinct positions → a width-1 span can never contain a
    # DIFFERENT term's position; engine must agree with brute (empty here)
    q = ast.SpanContainingQuery((big,), little=little, slop=3)
    got = [h.doc_id for h in searcher.search(q, k=10_000)]
    assert got == exp == []
    # same term as little: [p, p] contains p → every doc with the term
    q_self = ast.SpanContainingQuery((big,), little=big, slop=3)
    got_self = [h.doc_id for h in searcher.search(q_self, k=10_000)]
    assert got_self == sorted(bmap)


def test_span_exclude_contain_combination_refused():
    """The kernel refuses exclude+contain in one query (narrowest- vs
    widest-window checks are mutually unsound)."""
    from lucene_spark.search.phrase import (
        _term_postings_with_positions,  # noqa: F401 (import check)
        segment_span_near,
    )
    import numpy as np

    def varint(vals):
        from lucene_spark.indexing.blocks import CODEC_VARINT

        out = bytearray([CODEC_VARINT])  # tagged, as the builder writes
        for v in vals:
            while True:
                b = v & 0x7F
                v >>= 7
                if v:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    break
        return bytes(out)

    rows = {
        "term": np.array(["a", "b", "e", "y"], dtype=object),
        "first_doc": np.array([0, 0, 0, 0], dtype=np.int64),
        "last_doc": np.array([0, 0, 0, 0], dtype=np.int64),
        "count": np.array([1, 1, 1, 1], dtype=np.int64),
        "doc_gaps": np.array([varint([0])] * 4, dtype=object),
        "tfs": np.array([varint([2]), varint([1]), varint([1]),
                         varint([1])], dtype=object),
        "norms": np.array([bytes([24])] * 4, dtype=object),
        "positions": np.array([varint([0, 2]), varint([3]), varint([1]),
                               varint([1])], dtype=object),
    }
    with pytest.raises(NotImplementedError, match="exclude and contain"):
        segment_span_near(rows, ["a", "b"], slop=2, exclude="e",
                          contain="y")


def test_explain_span_query(searcher, golden):
    """explain() on span queries: constant-score breakdown with the span
    match decided by the kernel."""
    q = ast.SpanNearQuery((VOCAB[0], VOCAB[3]), slop=4, boost=2.0)
    hits = searcher.search(q, 3)
    assert hits
    ex = searcher.explain(q, hits[0].doc_id)
    assert ex["match"] and ex["total"] == float(np.float32(2.0))
    assert ex["clauses"][0]["kind"] == "SpanNearQuery"
    # a non-matching doc
    non = next(d for d in range(golden.pdf.shape[0])
               if d not in {h.doc_id for h in searcher.search(q, 10**6)})
    ex2 = searcher.explain(q, non)
    assert not ex2["match"] and ex2["total"] == 0.0
