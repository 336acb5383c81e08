"""Minimal-interval algebra + IntervalQuery scoring — the PySpark-native
re-expression of Lucene's ``queries/intervals`` module.

Reference semantics (all file:line cites are into ``/root/reference``):

* ``queries/intervals/OrderedIntervalsSource.java:140-172`` and
  ``UnorderedIntervalsSource.java:112-185`` enumerate **minimal** intervals
  per document: the returned sequence has strictly increasing starts AND
  strictly increasing ends — an enumerated interval never properly contains
  another one.  For an ordered source the candidate chain from a start
  position is greedy (each sub begins strictly after the previous sub ends,
  ``OrderedIntervalsSource.java:153`` ``start() <= end()`` re-advance), and
  the iterator's in-call "minimizing" loop keeps only the LARGEST start for
  each distinct end.  For an unordered source the candidate window ending at
  a position ``e`` spans from the minimum over sub-sources of the latest
  occurrence ``<= e``; minimality again keeps windows whose start strictly
  grows.
* ``queries/intervals/FilteredIntervalsSource.java`` (``Intervals.maxgaps``)
  filters the enumerated minimal intervals by
  ``gaps = (end - start + 1) - Σ sub-widths <= max_gaps`` AFTER
  minimization — a filtered-out interval does not resurrect a contained
  non-minimal one.
* ``queries/intervals/BlockIntervalsSource.java`` (``Intervals.phrase``)
  matches exact adjacency.  For width-1 sub-sources this is provably the
  ordered source filtered to ``gaps == 0``: a block occurrence has the
  minimum possible width, so no chain can nest inside it and the greedy
  chain from its start lands exactly on its end.
* ``queries/intervals/IntervalScorer.java:69-75``: per matching document,
  ``freq += 1.0 / max(length - minExtent + 1, 1)`` over the enumerated
  intervals **accumulated in Java float** (each += rounds the double sum
  back to float32); ``minExtent`` is the source's minimum possible extent
  (Σ of sub minExtents for ordered/unordered, 1 for a term).
* ``queries/intervals/IntervalScoreFunction.java:56-88`` saturation:
  ``score = weight * (1.0f - pivot / (pivot + freq))`` in float32, pivot
  default 1 (``IntervalQuery.java:72``).

Also covered: repeated sub-sources (``RepeatingIntervalsSource.java``
shapes inside ordered/unordered), ``Intervals.atLeast``
(``MinimumShouldMatchIntervalsSource.java``), the relational filters
(containing / containedBy / not-variants / overlapping / nonOverlapping),
``Intervals.extend`` / ``within`` / ``notWithin`` / ``before`` / ``after``
(``OffsetIntervalsSource.java``).

Out of scope (documented cuts): heterogeneous NESTED ordered/unordered
sub-sources (Lucene itself flattens ordered-in-ordered,
``OrderedIntervalsSource.java:40-49``), ``Intervals.fixField`` (cross-field
position spaces), and or-slot alternatives overlapping other slots.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Union

import numpy as np

from lucene_spark.search.phrase import _POS_M, _structs_for_slots

Slot = Union[str, tuple]


@dataclass(frozen=True)
class Ordered:
    """``Intervals.ordered`` (+ optional ``Intervals.maxgaps`` wrapper).

    ``slots``: sub-sources in order; each is a term name or a tuple of
    alternative term names (``Intervals.or`` of terms — width-1 union,
    ``DisjunctionIntervalsSource.java``).  ``max_gaps=0`` is
    ``Intervals.phrase`` (``BlockIntervalsSource.java``).
    """

    slots: tuple
    max_gaps: int | None = None


@dataclass(frozen=True)
class Unordered:
    """``Intervals.unordered`` (+ optional maxgaps), overlaps allowed."""

    slots: tuple
    max_gaps: int | None = None


def phrase(*slots) -> Ordered:
    """``Intervals.phrase`` — exact adjacency (gaps == 0)."""
    return Ordered(tuple(slots), max_gaps=0)


@dataclass(frozen=True)
class AtLeast:
    """``Intervals.atLeast(n, subs…)``
    (``MinimumShouldMatchIntervalsSource.java``): minimal intervals
    containing at least ``n`` of the sub-sources — the window ending at a
    position ``e`` starts at the n-th LARGEST latest-occurrence ≤ e
    (the proximity queue's bottom), minimized like unordered; ``gaps`` and
    ``minExtent`` count ``n`` matching width-1 subs (pinned by
    ``TestIntervals.testMinimumShouldMatch:772-815`` incl. its gaps
    assertion)."""

    n: int
    slots: tuple
    max_gaps: int | None = None


@dataclass(frozen=True)
class Filtered:
    """Relational interval filters (``Intervals.containing / containedBy /
    notContaining / notContainedBy / overlapping / nonOverlapping``,
    ``queries/intervals/ContainingIntervalsSource.java`` et al.): keep the
    MINIMAL intervals of ``source`` for which a MINIMAL interval of
    ``reference`` (not-)satisfies the relation — both sides enumerate
    minimal sets first (pinned by the reference's own goldens:
    ``TestIntervals.java:644-712,927-950``)."""

    kind: str  # containing|not_containing|contained_by|not_contained_by|
    #            overlapping|non_overlapping
    source: object
    reference: object


@dataclass(frozen=True)
class Extended:
    """``Intervals.extend`` (``ExtendedIntervalsSource.java``): every
    enumerated interval widens to [max(0, start − before), end + after];
    minExtent grows by before + after (``:126-132``)."""

    source: object
    before: int
    after: int


@dataclass(frozen=True)
class Offset:
    """``OffsetIntervalsSource.java:50-84``: each reference interval maps to
    a zero-width interval one position before its start (clamped at 0) or
    one position after its end — the building block of ``Intervals.before``
    / ``after``."""

    source: object
    before_side: bool


# extend() bound standing in for Integer.MAX_VALUE (any value larger than a
# document's position space works — positions are < 2^34)
_MAX_EXTEND = int(_POS_M) - 1


def containing(source, reference) -> Filtered:
    return Filtered("containing", source, reference)


def not_containing(source, reference) -> Filtered:
    return Filtered("not_containing", source, reference)


def contained_by(source, reference) -> Filtered:
    return Filtered("contained_by", source, reference)


def not_contained_by(source, reference) -> Filtered:
    return Filtered("not_contained_by", source, reference)


def overlapping(source, reference) -> Filtered:
    return Filtered("overlapping", source, reference)


def non_overlapping(source, reference) -> Filtered:
    return Filtered("non_overlapping", source, reference)


def within(source, positions: int, reference) -> Filtered:
    """``Intervals.within`` (``Intervals.java:418-421``)."""
    return contained_by(source, Extended(reference, positions, positions))


def not_within(source, positions: int, reference) -> Filtered:
    """``Intervals.notWithin`` (``Intervals.java:403-407``)."""
    return non_overlapping(source, Extended(reference, positions, positions))


def before(source, reference) -> Filtered:
    """``Intervals.before`` (``Intervals.java:491-494``): source intervals
    appearing before a reference interval — containedBy the prefix ending
    one position before the reference's start."""
    return contained_by(source,
                        Extended(Offset(reference, True), _MAX_EXTEND, 0))


def after(source, reference) -> Filtered:
    """``Intervals.after`` (``Intervals.java:497-501``)."""
    return contained_by(source,
                        Extended(Offset(reference, False), 0, _MAX_EXTEND))


def _norm_slots(slots) -> list[Slot]:
    """Normalize slots. Plain-term slots may REPEAT (the reference's
    ``deduplicate`` → ``RepeatingIntervalsSource`` shapes: ordered chains
    handle duplicates natively, unordered requires the r-th latest
    occurrence — ``TestIntervals.java:330-348,407-433`` goldens). Or-slot
    alternatives must stay disjoint from every other slot (overlapping
    unions would double-assign one position)."""
    out = []
    for s in slots:
        out.append(tuple(s) if isinstance(s, (tuple, list)) else s)
    tup_terms = [t for s in out if isinstance(s, tuple) for t in s]
    plain = {s for s in out if not isinstance(s, tuple)}
    if len(set(tup_terms)) != len(tup_terms) or plain & set(tup_terms):
        raise ValueError(
            "or-slot alternatives must not repeat or overlap other slots")
    return out


def source_slots(source) -> list[Slot]:
    """Normalized slot list of a source's REQUIRED (source-side) chain —
    the slots whose corpus absence makes the source unable to match.
    Filter references don't appear: a dead positive reference empties the
    result at evaluation, a dead negative one passes everything."""
    if isinstance(source, (Filtered, Extended, Offset)):
        return source_slots(source.source)
    if isinstance(source, AtLeast):
        return []  # no slot is individually required (any n of m match)
    if isinstance(source, (Ordered, Unordered)):
        return _norm_slots(source.slots)
    return _norm_slots([source])


def source_terms(source) -> list[str]:
    """All distinct terms a source touches (incl. filter references)."""
    if isinstance(source, Filtered):
        return sorted(set(source_terms(source.source))
                      | set(source_terms(source.reference)))
    if isinstance(source, (Extended, Offset)):
        return source_terms(source.source)
    slots = (_norm_slots(source.slots) if isinstance(source, AtLeast)
             else source_slots(source))
    return sorted({t for s in slots
                   for t in (s if isinstance(s, tuple) else (s,))})


def min_extent(source) -> int:
    """``IntervalsSource.minExtent`` — Σ sub extents; width-1 leaves;
    filters keep the source's extent; extend adds before + after."""
    if isinstance(source, Filtered):
        return min_extent(source.source)
    if isinstance(source, Extended):
        return min_extent(source.source) + int(source.before) + int(
            source.after)
    if isinstance(source, AtLeast):
        return int(source.n)
    if isinstance(source, Offset):
        return 1  # zero-width single-position intervals
    return len(source_slots(source))


def prefix_terms(source, prefix: str):
    """Copy of ``source`` with every term name prefixed — the mixed boolean
    kernel's rows carry field-prefixed term names (``field SEP term``)."""
    def p_slot(s):
        if isinstance(s, tuple):
            return tuple(prefix + t for t in s)
        return prefix + s

    if isinstance(source, Filtered):
        return Filtered(source.kind, prefix_terms(source.source, prefix),
                        prefix_terms(source.reference, prefix))
    if isinstance(source, Extended):
        return Extended(prefix_terms(source.source, prefix),
                        source.before, source.after)
    if isinstance(source, Offset):
        return Offset(prefix_terms(source.source, prefix),
                      source.before_side)
    if isinstance(source, AtLeast):
        return AtLeast(source.n, tuple(p_slot(s) for s in source.slots),
                       source.max_gaps)
    if isinstance(source, Ordered):
        return Ordered(tuple(p_slot(s) for s in source.slots),
                       source.max_gaps)
    if isinstance(source, Unordered):
        return Unordered(tuple(p_slot(s) for s in source.slots),
                         source.max_gaps)
    return p_slot(source)


def _slot_keys(per):
    """Per slot: sorted int64 composite keys doc*2^34 + position."""
    keys = []
    for docs, tfs, _nms, flat, _offs in per:
        k = np.repeat(docs.astype(np.int64), tfs) * _POS_M + flat
        keys.append(k)
    return keys


def _minimal_ordered(keys):
    """Minimal ordered intervals over per-slot position key arrays.

    Returns (doc, start, end) int64 arrays sorted by (doc, start), with
    strictly increasing starts and ends per doc — the exact sequence
    ``OrderedIntervalIterator`` enumerates."""
    k0 = keys[0]
    doc = k0 // _POS_M
    start = k0 % _POS_M
    cur = k0.copy()
    valid = np.ones(k0.size, dtype=bool)
    for ki in keys[1:]:
        # greedy: first occurrence of this slot strictly after cur
        idx = np.searchsorted(ki, cur + 1, side="left")
        ok = idx < ki.size
        nxt = ki[np.minimum(idx, ki.size - 1)]
        ok &= (nxt // _POS_M) == doc
        valid &= ok
        cur = np.where(ok, nxt, cur)
    doc, start, end = doc[valid], start[valid], (cur % _POS_M)[valid]
    if doc.size == 0:
        return doc, start, end
    # minimality: keep the LAST (max) start per distinct (doc, end) — the
    # iterator's in-call minimizing loop (OrderedIntervalsSource.java:144-171)
    keep = np.ones(doc.size, dtype=bool)
    keep[:-1] = (doc[:-1] != doc[1:]) | (end[:-1] != end[1:])
    return doc[keep], start[keep], end[keep]


def _minimal_unordered(keys, ranks=None):
    """Minimal unordered (overlaps-allowed) intervals over slot keys.
    ``ranks[i]`` > 0 marks the i-th slot as the (rank+1)-th occurrence of a
    REPEATED sub-source: it binds the (rank+1)-th-latest occurrence ≤ the
    candidate end (RepeatingIntervalsSource inside unordered,
    ``TestIntervals.java:407-423`` golden)."""
    if ranks is None:
        ranks = [0] * len(keys)
    ends_k = np.unique(np.concatenate(keys))
    doc = ends_k // _POS_M
    smin = np.full(ends_k.size, np.iinfo(np.int64).max)
    valid = np.ones(ends_k.size, dtype=bool)
    for ki, rank in zip(keys, ranks):
        # (rank+1)-th latest occurrence of this slot <= the candidate end
        idx = np.searchsorted(ki, ends_k, side="right") - 1 - rank
        ok = idx >= 0
        last = ki[np.maximum(idx, 0)]
        ok &= (last // _POS_M) == doc
        valid &= ok
        smin = np.minimum(smin, np.where(ok, last, np.iinfo(np.int64).max))
    doc, sk, ek = doc[valid], smin[valid], ends_k[valid]
    if doc.size == 0:
        return doc, sk, ek
    start, end = sk % _POS_M, ek % _POS_M
    # minimality: scanning ends ascending, start is non-decreasing; keep
    # candidates whose start strictly grows (UnorderedIntervalsSource's
    # queue minimization, :154-185)
    keep = np.ones(doc.size, dtype=bool)
    keep[1:] = (doc[1:] != doc[:-1]) | (start[1:] > start[:-1])
    return doc[keep], start[keep], end[keep]


def _minimal_atleast(keys, n: int):
    """``Intervals.atLeast(n, …)``: the window ending at position ``e``
    starts at the n-th LARGEST latest-occurrence ≤ e among the sub-sources
    (exactly n subs fall inside — the (n+1)-th largest is strictly
    earlier); minimized by the strictly-growing-start rule."""
    m = len(keys)
    ends_k = np.unique(np.concatenate(keys))
    doc = ends_k // _POS_M
    lasts = np.full((m, ends_k.size), np.int64(-1))
    for i, ki in enumerate(keys):
        idx = np.searchsorted(ki, ends_k, side="right") - 1
        last = ki[np.maximum(idx, 0)]
        ok = (idx >= 0) & ((last // _POS_M) == doc)
        lasts[i] = np.where(ok, last, np.int64(-1))
    # n-th largest last per candidate (-1 sentinels sort below any key)
    nth = np.partition(lasts, m - n, axis=0)[m - n]
    valid = nth >= 0  # fewer than n present → the n-th largest is -1
    doc, sk, ek = doc[valid], nth[valid], ends_k[valid]
    if doc.size == 0:
        return doc, sk, ek
    start, end = sk % _POS_M, ek % _POS_M
    keep = np.ones(doc.size, dtype=bool)
    keep[1:] = (doc[1:] != doc[:-1]) | (start[1:] > start[:-1])
    return doc[keep], start[keep], end[keep]


def _exists_relation(kind, d, s, e, rd, rs, re_):
    """Boolean mask over source intervals: does a reference interval (in
    the same doc) satisfy the relation? Vectorized: references arrive
    sorted by (doc, start); per-doc prefix-max / suffix-min of reference
    ends answer the suffix/prefix existence tests in one searchsorted."""
    import pandas as pd

    neg = kind.startswith(("not_", "non_"))
    base = kind.removeprefix("not_").removeprefix("non_")
    if rd.size == 0:
        hit = np.zeros(d.size, dtype=bool)
        return ~hit if neg else hit
    rkey = rd * _POS_M + rs
    rds = pd.Series(rd)
    if base == "containing":
        # ∃ ref with rs >= s and re <= e: suffix-min of re over rs >= s
        sm = pd.Series(re_[::-1]).groupby(rds.iloc[::-1].to_numpy()) \
            .cummin().to_numpy()[::-1]
        idx = np.searchsorted(rkey, d * _POS_M + s, side="left")
        ok = idx < rkey.size
        ii = np.minimum(idx, rkey.size - 1)
        hit = ok & (rd[ii] == d) & (sm[ii] <= e)
    elif base == "contained_by":
        # ∃ ref with rs <= s and re >= e: prefix-max of re over rs <= s
        pm = pd.Series(re_).groupby(rds.to_numpy()).cummax().to_numpy()
        idx = np.searchsorted(rkey, d * _POS_M + s, side="right") - 1
        ok = idx >= 0
        ii = np.maximum(idx, 0)
        hit = ok & (rd[ii] == d) & (pm[ii] >= e)
    elif base == "overlapping":
        # ∃ ref with rs <= e and re >= s: prefix-max of re over rs <= e
        pm = pd.Series(re_).groupby(rds.to_numpy()).cummax().to_numpy()
        idx = np.searchsorted(rkey, d * _POS_M + e, side="right") - 1
        ok = idx >= 0
        ii = np.maximum(idx, 0)
        hit = ok & (rd[ii] == d) & (pm[ii] >= s)
    else:
        raise ValueError(f"unknown interval relation: {kind!r}")
    return ~hit if neg else hit


def eval_intervals(source, keys_of):
    """Recursive minimal-interval evaluation; ``keys_of(slot)`` returns the
    slot's sorted doc·2^34+pos keys, or None when every alternative is
    absent. Returns (doc, start, end) ordered by (doc, start)."""
    empty = (np.zeros(0, np.int64),) * 3
    if isinstance(source, Extended):
        d, s, e = eval_intervals(source.source, keys_of)
        return d, np.maximum(s - int(source.before), 0), \
            e + int(source.after)
    if isinstance(source, Offset):
        d, s, e = eval_intervals(source.source, keys_of)
        p = np.maximum(s - 1, 0) if source.before_side else e + 1
        return d, p, p.copy()
    if isinstance(source, Filtered):
        d, s, e = eval_intervals(source.source, keys_of)
        if d.size == 0:
            return empty
        rd, rs, re_ = eval_intervals(source.reference, keys_of)
        keep = _exists_relation(source.kind, d, s, e, rd, rs, re_)
        return d[keep], s[keep], e[keep]
    if isinstance(source, AtLeast):
        slots = _norm_slots(source.slots)
        if len(set(slots)) != len(slots):
            raise ValueError("atLeast sub-sources must be distinct")
        keys = [k for k in (keys_of(s) for s in slots) if k is not None]
        n = int(source.n)
        if len(keys) < n or n < 1:
            return empty
        doc, start, end = _minimal_atleast(keys, n)
        extent = n
    else:
        slots = source_slots(source)
        keys = [keys_of(s) for s in slots]
        if any(k is None for k in keys):
            return empty
        if len(keys) == 1:
            k = keys[0]
            doc, pos = k // _POS_M, k % _POS_M
            return doc, pos, pos
        if isinstance(source, Unordered):
            # rank = index among identical repeated slots: the j-th copy
            # binds the (j+1)-th latest occurrence
            ranks = [slots[:i].count(s) for i, s in enumerate(slots)]
            doc, start, end = _minimal_unordered(keys, ranks)
        else:
            doc, start, end = _minimal_ordered(keys)
        extent = len(slots)
    mg = getattr(source, "max_gaps", None)
    if mg is not None and doc.size:
        # FilteredIntervalsSource: gaps = width − Σ sub widths (all 1 here)
        gaps = (end - start + 1) - extent
        m = gaps <= mg
        doc, start, end = doc[m], start[m], end[m]
    return doc, start, end


def segment_intervals(rows, source):
    """Minimal (+ filtered) intervals of ``source`` within one segment:
    (doc, start, end) int64 arrays ordered by (doc, start)."""
    cache: dict = {}

    def keys_of(slot):
        if slot not in cache:
            per = _structs_for_slots(rows, [slot])
            cache[slot] = None if per is None else _slot_keys(per)[0]
        return cache[slot]

    return eval_intervals(source, keys_of)


def interval_freqs(doc, start, end, extent: int):
    """Per-doc sloppy frequency, Java-float exact.

    ``IntervalScorer.ensureFreq`` (:69-75): iterate the doc's intervals in
    enumeration order, ``freq = (float)(freq + 1.0 / max(len - minExtent
    + 1, 1))`` — each step rounds through float32.  Vectorized over docs by
    interval rank (bounded by the max interval count per doc)."""
    if doc.size == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.float32)
    udocs, first = np.unique(doc, return_index=True)
    # rank of each interval within its doc (doc-sorted input)
    rank = np.arange(doc.size) - np.repeat(first, np.diff(
        np.concatenate([first, [doc.size]])))
    incr = 1.0 / np.maximum((end - start + 1) - extent + 1, 1)  # float64
    loc = np.searchsorted(udocs, doc)
    freq = np.zeros(udocs.size, dtype=np.float32)
    for j in range(int(rank.max()) + 1):
        sel = rank == j
        li = loc[sel]
        freq[li] = (freq[li].astype(np.float64) + incr[sel]).astype(
            np.float32)
    return udocs, freq


def saturation_scores(freq, pivot: float = 1.0, boost: float = 1.0):
    """``IntervalScoreFunction.SaturationFunction`` (:56-72), float32 ops:
    ``weight * (1.0f - pivot / (pivot + freq))``."""
    p = np.float32(pivot)
    t = np.float32(1.0) - (p / (p + freq.astype(np.float32)))
    return np.float32(boost) * t


def segment_interval_postings(rows, source, pivot: float = 1.0,
                              boost: float = 1.0):
    """(docs, scores) of the IntervalQuery over one segment's postings."""
    doc, start, end = segment_intervals(rows, source)
    udocs, freq = interval_freqs(doc, start, end, min_extent(source))
    return udocs, saturation_scores(freq, pivot, boost)
