"""Minimal-interval algebra (queries/intervals): kernel vs the reference's
own golden expectations (``TestIntervals.java``) and vs a definition-based
brute-force enumerator; IntervalQuery scoring end-to-end on a built index."""

from itertools import product

import numpy as np
import pytest

from lucene_spark.goldens import BruteForceIndex
from lucene_spark.search import ast
from lucene_spark.search import intervals as iv
from lucene_spark.search.intervals import (
    Ordered,
    Unordered,
    _minimal_ordered,
    _minimal_unordered,
    interval_freqs,
    saturation_scores,
)
from lucene_spark.search.phrase import _POS_M
from lucene_spark.search.searcher import IndexSearcher

# the reference's own test corpus (TestIntervals.java:66-87, public Apache-2.0
# test fixtures) — positions derive from whitespace/punct tokenization
FIELD1_DOCS = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot "
    "nine days old.  Some like it hot, some like it cold, some like it in "
    "the pot nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot "
    "twelve days old.  Some like it cold, some like it hot, some like it "
    "in the fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot "
    "nine years old.  Some like it hot, some like it twelve",
    "Porridge is great",
]

FIELD2_DOCS = [
    "In Xanadu did Kubla Khan a stately pleasure dome decree",
    "Where Alph the sacred river ran through caverns measureless to man",
    "a b a c b a b c",
    "So thrice five miles of fertile ground",
    "Pease hot porridge porridge",
    "w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6",
]


def _positions(docs, term):
    """{doc: [positions]} under simple word tokenization (the reference
    uses StandardAnalyzer with an empty stop set)."""
    import re

    out = {}
    for d, text in enumerate(docs):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        ps = [i for i, t in enumerate(toks) if t == term]
        if ps:
            out[d] = ps
    return out


def _keys_for(docs, slot):
    """Sorted composite keys doc*2^34 + pos for a slot (term or or-tuple)."""
    names = slot if isinstance(slot, tuple) else (slot,)
    pairs = []
    for t in names:
        for d, ps in _positions(docs, t).items():
            pairs += [(d, p) for p in ps]
    pairs = sorted(set(pairs))
    return np.array([d * int(_POS_M) + p for d, p in pairs], dtype=np.int64)


def _run(docs, source):
    """{doc: [(start, end), ...]} via the kernel's recursive evaluator."""
    def keys_of(slot):
        k = _keys_for(docs, slot)
        return None if k.size == 0 else k

    doc, s, e = iv.eval_intervals(source, keys_of)
    out = {}
    for d, a, b in zip(doc.tolist(), s.tolist(), e.tolist()):
        out.setdefault(d, []).append((a, b))
    return out


def _golden(expected):
    """TestIntervals checkIntervals int[][] — flat (start, end) pairs per
    doc — to {doc: [(s, e), ...]} skipping empty docs."""
    out = {}
    for d, flat in enumerate(expected):
        if flat:
            out[d] = [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]
    return out


# --- reference goldens (TestIntervals.java method:line cited per case) ---


def test_golden_term_intervals():
    # testTermQueryIntervals (:284-291)
    got = _run(FIELD1_DOCS, "porridge")
    assert got == _golden([
        [], [1, 1, 4, 4, 7, 7], [1, 1, 4, 4, 7, 7], [], [1, 1, 4, 4, 7, 7],
        [0, 0]])


def test_golden_ordered():
    # testOrderedNearIntervals (:307-311)
    got = _run(FIELD1_DOCS, Ordered(("pease", "hot")))
    assert got == _golden([
        [], [0, 2, 6, 17], [3, 5, 6, 21], [], [0, 2, 6, 17], []])


def test_golden_unordered():
    # testUnorderedNearIntervals (:380-389)
    got = _run(FIELD1_DOCS, Unordered(("pease", "hot")))
    assert got == _golden([
        [], [0, 2, 2, 3, 6, 17], [3, 5, 5, 6, 6, 21], [3, 7],
        [0, 2, 2, 3, 6, 17], []])


def test_golden_phrase():
    # testPhraseIntervals (:351-357) — Intervals.phrase == ordered maxgaps=0
    got = _run(FIELD1_DOCS, iv.phrase("pease", "porridge"))
    assert got == _golden([
        [], [0, 1, 3, 4, 6, 7], [0, 1, 3, 4, 6, 7], [], [0, 1, 3, 4, 6, 7],
        []])


def test_golden_ordered_with_or_slot():
    # testCombinationDisjunction (:493-499): ordered(or(alph, sacred),
    # measureless) on field2
    got = _run(FIELD2_DOCS, Ordered((("alph", "sacred"), "measureless")))
    assert got == _golden([[], [3, 8], [], [], [], []])


def test_overlapping_or_slots_rejected():
    """Plain-term repeats are supported (RepeatingIntervalsSource shapes);
    or-slot alternatives overlapping other slots are not."""
    assert iv.source_slots(Ordered(("pease", "pease", "porridge"))) == [
        "pease", "pease", "porridge"]
    with pytest.raises(ValueError):
        iv.source_slots(Ordered((("a", "b"), "b")))
    with pytest.raises(ValueError):
        iv.source_slots(Ordered((("a", "b"), ("b", "c"))))


# --- definition-based brute force vs kernel, randomized ---


def _brute_minimal(docs, source):
    """All match windows enumerated from positions, minimized by the
    definition (no enumerated window properly contains another), then
    maxgaps-filtered — the semantics OrderedIntervalsSource /
    UnorderedIntervalsSource / FilteredIntervalsSource implement lazily."""
    slots = iv.source_slots(source)
    n = len(slots)
    ordered = not isinstance(source, Unordered) and n > 1
    mg = getattr(source, "max_gaps", None)
    out = {}
    per_slot = []
    for s in slots:
        names = s if isinstance(s, tuple) else (s,)
        merged = {}
        for t in names:
            for d, ps in _positions(docs, t).items():
                merged.setdefault(d, set()).update(ps)
        per_slot.append(merged)
    common = set(per_slot[0])
    for m in per_slot[1:]:
        common &= set(m)
    for d in sorted(common):
        pls = [sorted(m[d]) for m in per_slot]
        cands = set()
        for combo in product(*pls):
            if ordered:
                if not all(combo[i] > combo[i - 1] for i in range(1, n)):
                    continue
                cands.add((combo[0], combo[-1]))
            else:
                if len(set(combo)) != n:  # repeats need distinct positions
                    continue
                cands.add((min(combo), max(combo)))
        minimal = {
            (s, e) for (s, e) in cands
            if not any(s2 >= s and e2 <= e and (s2, e2) != (s, e)
                       for (s2, e2) in cands)
        }
        if mg is not None:
            minimal = {(s, e) for (s, e) in minimal if (e - s + 1) - n <= mg}
        if minimal:
            out[d] = sorted(minimal)
    return out


@pytest.mark.parametrize("seed", range(8))
def test_randomized_vs_brute(seed):
    rng = np.random.default_rng(seed)
    vocab = ["a", "b", "c", "d", "e", "f"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(5, 40)))
            for _ in range(12)]
    sources = [
        Ordered(("a", "b")),
        Ordered(("a", "b", "c")),
        Ordered(("a", "b"), max_gaps=2),
        Ordered((("a", "b"), "c"), max_gaps=3),
        Ordered(("a", "b", "c"), max_gaps=0),  # phrase
        Unordered(("a", "b")),
        Unordered(("a", "b", "c")),
        Unordered(("a", "b"), max_gaps=1),
        Unordered((("a", "b"), "c", "d"), max_gaps=4),
    ]
    for src in sources:
        assert _run(docs, src) == _brute_minimal(docs, src), src


# --- scoring: Java-float freq fold + saturation ---


def test_interval_freq_java_float_parity():
    rng = np.random.default_rng(7)
    docs = np.repeat(np.arange(20, dtype=np.int64),
                     rng.integers(1, 9, size=20))
    n = docs.size
    starts = np.sort(rng.integers(0, 50, size=n).astype(np.int64))
    ends = starts + rng.integers(1, 9, size=n)
    udocs, freq = interval_freqs(docs, starts, ends, extent=2)
    # brute per-doc Java-float emulation
    for i, d in enumerate(udocs.tolist()):
        acc = np.float32(0.0)
        sel = docs == d
        for ln in (ends[sel] - starts[sel] + 1).tolist():
            acc = np.float32(np.float64(acc) + 1.0 / max(ln - 2 + 1, 1))
        assert freq[i] == acc
    sc = saturation_scores(freq, pivot=1.0, boost=2.5)
    for i in range(udocs.size):
        t = np.float32(1.0) - np.float32(1.0) / (np.float32(1.0) + freq[i])
        assert sc[i] == np.float32(2.5) * t


# --- end-to-end on a built index ---


@pytest.fixture(scope="module")
def searcher(spark, index_dir):
    return IndexSearcher(spark, index_dir)


@pytest.fixture(scope="module")
def golden(corpus_pdf):
    return BruteForceIndex(corpus_pdf)


def _brute_hits(golden, source, pivot, boost, k):
    """IntervalScorer emulation over BruteForceIndex positions."""
    slots = iv.source_slots(source)
    texts = {}
    for s in slots:
        names = s if isinstance(s, tuple) else (s,)
        for t in names:
            texts[t] = golden.positions.get(t, {})
    hits = []
    per_slot = []
    for s in slots:
        names = s if isinstance(s, tuple) else (s,)
        merged = {}
        for t in names:
            for d, ps in texts[t].items():
                merged.setdefault(d, set()).update(ps)
        per_slot.append(merged)
    common = set(per_slot[0])
    for m in per_slot[1:]:
        common &= set(m)
    n = len(slots)
    ordered = not isinstance(source, Unordered) and n > 1
    mg = getattr(source, "max_gaps", None)
    for d in sorted(common):
        pls = [sorted(m[d]) for m in per_slot]
        cands = set()
        for combo in product(*pls):
            if ordered:
                if not all(combo[i] > combo[i - 1] for i in range(1, n)):
                    continue
                cands.add((combo[0], combo[-1]))
            else:
                cands.add((min(combo), max(combo)))
        minimal = sorted(
            (s, e) for (s, e) in cands
            if not any(s2 >= s and e2 <= e and (s2, e2) != (s, e)
                       for (s2, e2) in cands))
        if mg is not None:
            minimal = [(s, e) for (s, e) in minimal if (e - s + 1) - n <= mg]
        if not minimal:
            continue
        acc = np.float32(0.0)
        for s, e in minimal:
            acc = np.float32(
                np.float64(acc) + 1.0 / max((e - s + 1) - n + 1, 1))
        t = np.float32(1.0) - (
            np.float32(pivot) / (np.float32(pivot) + acc))
        hits.append((d, float(np.float32(boost) * t)))
    hits.sort(key=lambda h: (-h[1], h[0]))
    return hits[:k]


@pytest.mark.parametrize("source,pivot", [
    (Ordered(("table", "value")), 1.0),
    (Ordered(("table", "value"), max_gaps=6), 1.0),
    (Unordered(("table", "value", "query")), 2.0),
    (Ordered((("table", "key"), "value"), max_gaps=8), 1.0),
])
def test_engine_matches_brute(searcher, golden, source, pivot):
    q = ast.IntervalQuery(source, pivot=pivot, boost=1.5)
    got = [(h.doc_id, h.score) for h in searcher.search(q, k=30)]
    want = _brute_hits(golden, source, pivot, 1.5, 30)
    assert got == want
    assert searcher.count(q) == len(
        _brute_hits(golden, source, pivot, 1.5, 10 ** 9))


# --- IntervalQuery as a boolean clause ---


def test_interval_as_boolean_clause(searcher, golden):
    """+term SHOULD(interval): per-doc score = f32(Σ_double of the term's
    BM25 f32 score and the interval clause's f32 saturation score) over the
    MUST match set — composed exactly like any other clause."""
    from lucene_spark.corpus import VOCAB

    iq = ast.IntervalQuery(Ordered((VOCAB[0], VOCAB[3]), max_gaps=6),
                           boost=2.0)
    bq = ast.BooleanQuery(((ast.MUST, ast.TermQuery(VOCAB[5])),
                           (ast.SHOULD, iq)))
    got = [(h.doc_id, h.score) for h in searcher.search(bq, k=25)]

    term_scores = {r["doc_id"]: r["score"] for r in
                   searcher.score_df(ast.TermQuery(VOCAB[5])).collect()}
    iv_scores = {r["doc_id"]: r["score"] for r in
                 searcher.interval_scored_df(iq).collect()}
    want = []
    for d, ts in term_scores.items():
        tot = np.float32(np.float64(ts) + np.float64(iv_scores.get(d, 0.0)))
        want.append((d, float(tot)))
    want.sort(key=lambda h: (-h[1], h[0]))
    assert got == want[:25]


def test_interval_as_required_clause(searcher):
    """MUST(interval) restricts the match set to interval-matching docs."""
    from lucene_spark.corpus import VOCAB

    iq = ast.IntervalQuery(Unordered((VOCAB[0], VOCAB[3]), max_gaps=4))
    bq = ast.BooleanQuery(((ast.MUST, iq),
                           (ast.SHOULD, ast.TermQuery(VOCAB[5]))))
    got_docs = {h.doc_id for h in searcher.search(bq, k=10 ** 6)}
    iv_docs = {r["doc_id"]
               for r in searcher.interval_scored_df(iq).collect()}
    assert got_docs == iv_docs
    # MUST_NOT(interval) excludes them
    bq2 = ast.BooleanQuery(((ast.MUST, ast.TermQuery(VOCAB[5])),
                            (ast.MUST_NOT, iq)))
    ex_docs = {h.doc_id for h in searcher.search(bq2, k=10 ** 6)}
    assert ex_docs.isdisjoint(iv_docs) and ex_docs


def test_explain_interval_and_span_clauses(searcher):
    """explain() on booleans holding interval AND span clauses (the span
    case was a latent KeyError before intervals landed)."""
    from lucene_spark.corpus import VOCAB

    iq = ast.IntervalQuery(Ordered((VOCAB[0], VOCAB[3]), max_gaps=6),
                           boost=2.0)
    bq = ast.BooleanQuery(((ast.MUST, ast.TermQuery(VOCAB[5])),
                           (ast.SHOULD, iq)))
    hits = searcher.search(bq, k=3)
    assert hits
    ex = searcher.explain(bq, hits[0].doc_id)
    assert ex["match"] and abs(ex["total"] - hits[0].score) < 1e-6
    kinds = {c["kind"] for c in ex["clauses"]}
    assert "interval" in kinds
    sq = ast.BooleanQuery(((ast.MUST, ast.TermQuery(VOCAB[5])),
                           (ast.SHOULD, ast.SpanNearQuery(
                               (VOCAB[0], VOCAB[3]), slop=5, boost=3.0))))
    shits = searcher.search(sq, k=3)
    assert shits
    ex2 = searcher.explain(sq, shits[0].doc_id)
    assert ex2["match"] and abs(ex2["total"] - shits[0].score) < 1e-6
    assert "span" in {c["kind"] for c in ex2["clauses"]}


# --- relational filters: reference goldens (TestIntervals.java lines) ---


def test_golden_containing():
    # testContaining (:666-688)
    src = iv.containing(Ordered(("pease", "cold")), "porridge")
    assert _run(FIELD1_DOCS, src) == _golden([
        [], [3, 5, 6, 21], [0, 2, 6, 17], [], [3, 5], []])


def test_golden_contained_by():
    # testContainedBy (:644-664)
    src = iv.contained_by("porridge", Ordered(("pease", "cold")))
    assert _run(FIELD1_DOCS, src) == _golden([
        [], [4, 4, 7, 7], [1, 1, 7, 7], [], [4, 4], []])


def test_golden_not_containing():
    # testNotContaining (:690-705)
    src = iv.not_containing(Ordered(("porridge", "pease")), "hot")
    assert _run(FIELD1_DOCS, src) == _golden([
        [], [4, 6], [1, 3], [], [4, 6], []])


def test_golden_within():
    # testWithin (:917-925): within(hot, 6, or(porridge, fraggle))
    src = iv.within("hot", 6, ("porridge", "fraggle"))
    assert _run(FIELD1_DOCS, src) == _golden([
        [], [2, 2], [5, 5, 21, 21], [], [2, 2], []])


def test_golden_overlapping():
    # testOverlapping (:927-950)
    src = iv.overlapping(Unordered(("hot", "porridge")),
                         Unordered(("cold", "pease")))
    assert _run(FIELD1_DOCS, src) == _golden([
        [], [2, 4, 7, 17], [5, 7, 7, 21], [], [2, 4], []])


def test_golden_extend():
    # testExtends (:272-281): extend(term(fox), 1, 2) on field2 doc6
    docs2 = FIELD2_DOCS + ["the quick brown fox jumps over the lazy dog"]
    src = iv.Extended("fox", 1, 2)
    got = _run(docs2, src)
    assert got == {6: [(2, 5)]}
    assert iv.min_extent(src) == 4  # 1 + 1 + 2 (:126-132)


def test_golden_maxgaps_unordered():
    # testMaxGaps (:706-712): maxgaps(1, unordered(w1, w3, w4)) on field2
    src = Unordered(("w1", "w3", "w4"), max_gaps=1)
    assert _run(FIELD2_DOCS, src) == _golden([
        [], [], [], [], [], [0, 3, 2, 4, 3, 6]])


def _brute_filtered(docs, source):
    """Definition-based reference for Filtered/Extended over _brute_minimal
    (positive = keep source minimal intervals with a satisfying reference
    minimal interval in the same doc)."""
    if isinstance(source, iv.Extended):
        inner = _brute_filtered(docs, source.source)
        return {d: sorted((max(0, s - source.before), e + source.after)
                          for s, e in ivs)
                for d, ivs in inner.items()}
    if not isinstance(source, iv.Filtered):
        return _brute_minimal(docs, source)
    src = _brute_filtered(docs, source.source)
    ref = _brute_filtered(docs, source.reference)
    neg = source.kind.startswith(("not_", "non_"))
    base = source.kind.removeprefix("not_").removeprefix("non_")

    def rel(a, b):
        (s, e), (rs, re_) = a, b
        if base == "containing":
            return rs >= s and re_ <= e
        if base == "contained_by":
            return rs <= s and re_ >= e
        return rs <= e and re_ >= s  # overlapping

    out = {}
    for d, ivs in src.items():
        refs = ref.get(d, [])
        kept = [ab for ab in ivs
                if any(rel(ab, r) for r in refs) != neg]
        if kept:
            out[d] = sorted(kept)
    return out


@pytest.mark.parametrize("seed", range(6))
def test_randomized_filters_vs_brute(seed):
    rng = np.random.default_rng(100 + seed)
    vocab = ["a", "b", "c", "d", "e"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(6, 35)))
            for _ in range(10)]
    sources = [
        iv.containing(Ordered(("a", "b"), max_gaps=5), "c"),
        iv.not_containing(Ordered(("a", "b"), max_gaps=5), "c"),
        iv.contained_by("c", Unordered(("a", "b"))),
        iv.not_contained_by("c", Unordered(("a", "b"))),
        iv.overlapping(Ordered(("a", "b")), Ordered(("c", "d"))),
        iv.non_overlapping(Ordered(("a", "b")), Ordered(("c", "d"))),
        iv.within("a", 2, Ordered(("c", "d"))),
        iv.not_within("a", 2, ("c", "d")),
        iv.containing(Ordered(("a", "b")), "zznothere"),
        iv.not_containing(Ordered(("a", "b")), "zznothere"),
    ]
    for src in sources:
        assert _run(docs, src) == _brute_filtered(docs, src), src


def test_filtered_end_to_end(searcher, golden):
    """Filtered source through the full engine path (search + count)."""
    from lucene_spark.corpus import VOCAB

    src = iv.not_containing(Ordered((VOCAB[0], VOCAB[3]), max_gaps=8),
                            VOCAB[5])
    q = ast.IntervalQuery(src, boost=1.5)
    hits = searcher.search(q, k=20)
    # brute: minimal ordered intervals (from golden positions) minus those
    # containing a VOCAB[5] position, scored with the saturation fold
    texts = golden.pdf["text"].tolist()
    want_iv = _brute_filtered(texts, src)
    want = []
    for d, ivs in want_iv.items():
        acc = np.float32(0.0)
        for s, e in sorted(ivs):
            acc = np.float32(np.float64(acc) + 1.0 / max((e - s + 1) - 1, 1))
        t = np.float32(1.0) - (np.float32(1.0) / (np.float32(1.0) + acc))
        want.append((d, float(np.float32(1.5) * t)))
    want.sort(key=lambda h: (-h[1], h[0]))
    assert [(h.doc_id, h.score) for h in hits] == want[:20]
    assert searcher.count(q) == len(want)


# --- repeats + atLeast (RepeatingIntervalsSource / MinimumShouldMatch) ---


def test_golden_ordered_with_duplicates():
    # testOrderedNearWithDuplicates (:330-348)
    got = _run(FIELD1_DOCS, Ordered(("pease", "pease", "porridge")))
    assert got == _golden([
        [], [0, 4, 3, 7], [0, 4, 3, 7], [], [0, 4, 3, 7], []])


def test_golden_unordered_with_repeats():
    # testUnorderedWithRepeats (:407-423)
    got = _run(FIELD1_DOCS, Unordered(("pease", "pease", "hot")))
    assert got == _golden([
        [], [0, 3, 2, 6, 3, 17], [0, 5, 3, 6], [], [0, 3, 2, 6, 3, 17], []])


def test_golden_unordered_repeats_maxgaps():
    # testUnorderedWithRepeatsAndMaxGaps (:425-433)
    got = _run(FIELD1_DOCS,
               Unordered(("pease", "pease", "hot"), max_gaps=2))
    assert got == _golden([
        [], [0, 3, 2, 6], [3, 6], [], [0, 3, 2, 6], []])


def test_golden_at_least():
    # testMinimumShouldMatch (:772-815)
    src = iv.AtLeast(3, ("porridge", "hot", "twelve", "nine", "pease"))
    got = _run(FIELD1_DOCS, src)
    assert got == _golden([
        [],
        [0, 2, 1, 3, 2, 4, 6, 11, 7, 17],
        [3, 5, 4, 6, 5, 7, 6, 11, 7, 21],
        [],
        [0, 2, 1, 3, 2, 4, 6, 11, 7, 17, 11, 21],
        [],
    ])
    assert iv.min_extent(src) == 3


def _brute_atleast(docs, n, slots, max_gaps=None):
    from itertools import combinations

    per_slot = []
    for s in slots:
        names = s if isinstance(s, tuple) else (s,)
        merged = {}
        for t in names:
            for d, ps in _positions(docs, t).items():
                merged.setdefault(d, set()).update(ps)
        per_slot.append(merged)
    alldocs = sorted(set().union(*[set(m) for m in per_slot]))
    out = {}
    for d in alldocs:
        cands = set()
        present = [sorted(m[d]) for m in per_slot if d in m]
        if len(present) < n:
            continue
        for chosen in combinations(range(len(present)), n):
            for combo in product(*[present[i] for i in chosen]):
                if len(set(combo)) != n:
                    continue
                cands.add((min(combo), max(combo)))
        minimal = {(s, e) for (s, e) in cands
                   if not any(s2 >= s and e2 <= e and (s2, e2) != (s, e)
                              for (s2, e2) in cands)}
        if max_gaps is not None:
            minimal = {(s, e) for (s, e) in minimal
                       if (e - s + 1) - n <= max_gaps}
        if minimal:
            out[d] = sorted(minimal)
    return out


@pytest.mark.parametrize("seed", range(6))
def test_randomized_repeats_and_atleast(seed):
    rng = np.random.default_rng(200 + seed)
    vocab = ["a", "b", "c", "d"]
    docs = [" ".join(rng.choice(vocab, size=rng.integers(6, 30)))
            for _ in range(10)]
    for src in [Ordered(("a", "a", "b")),
                Ordered(("a", "b", "a"), max_gaps=4),
                Unordered(("a", "a", "b")),
                Unordered(("b", "b", "a"), max_gaps=3)]:
        assert _run(docs, src) == _brute_minimal(docs, src), src
    for n, slots, mg in [(2, ("a", "b", "c"), None),
                         (3, ("a", "b", "c", "d"), None),
                         (2, (("a", "b"), "c", "d"), 2),
                         (4, ("a", "b", "c", "zznothere", "d"), None)]:
        got = _run(docs, iv.AtLeast(n, slots, max_gaps=mg))
        assert got == _brute_atleast(docs, n, slots, mg), (n, slots, mg)


def test_atleast_rejects_duplicate_subs():
    with pytest.raises(ValueError):
        _run(FIELD1_DOCS, iv.AtLeast(2, ("pease", "pease", "hot")))


def test_golden_before_after():
    # testBefore (:911-915) / testAfter (:894-909)
    got_b = _run(FIELD1_DOCS, iv.before("cold", "twelve"))
    assert got_b == _golden([[], [], [2, 2], [], [5, 5], []])
    got_a = _run(FIELD1_DOCS,
                 iv.after("porridge", Ordered(("pease", "cold"))))
    assert got_a == _golden([[], [7, 7], [4, 4, 7, 7], [], [7, 7], []])
