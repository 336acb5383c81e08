"""Exact-phrase matching kernel (per segment, numpy).

Semantics mirror ``core/search/ExactPhraseMatcher.java``: a document matches
when the phrase terms occur at consecutive positions (term i at position
p + i); the phrase frequency is the number of such start positions p. The
score is BM25(freq, norm) with the weight built from the SUM of the per-term
idfs (``core/search/similarities/BM25Similarity.java:185-194``), i.e. the
phrase behaves as one pseudo-term.

Execution shape: docID-set leapfrog first (np.intersect1d over the per-term
doc arrays — the cheap approximation), positions verified only for the
surviving docs (the TwoPhaseIterator pattern,
``core/search/TwoPhaseIterator.java``).
"""

from __future__ import annotations

import numpy as np

from lucene_spark.indexing.blocks import decode_block, decode_block_positions

F32 = np.float32


def _term_postings_with_positions(rows, idxs):
    """Concatenate a term's blocks → (docs, tfs, norms, flat_pos, offsets)."""
    docs_p, tf_p, nm_p, pos_p = [], [], [], []
    order = sorted(idxs, key=lambda i: int(rows["first_doc"][i]))
    for i in order:
        d, tf, nm = decode_block(
            rows["first_doc"][i], rows["count"][i],
            rows["doc_gaps"][i], rows["tfs"][i], rows["norms"][i],
        )
        flat, _ = decode_block_positions(rows["positions"][i], tf)
        docs_p.append(d)
        tf_p.append(tf)
        nm_p.append(nm)
        pos_p.append(flat)
    docs = np.concatenate(docs_p)
    tfs = np.concatenate(tf_p)
    norms = np.concatenate(nm_p)
    flat_pos = np.concatenate(pos_p)
    offsets = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
    return docs, tfs, norms, flat_pos, offsets


def term_postings(rows, idxs):
    """Concatenate a term's blocks → (docs, tfs, norms)."""
    order = sorted(idxs, key=lambda i: int(rows["first_doc"][i]))
    parts = [
        decode_block(rows["first_doc"][i], rows["count"][i],
                     rows["doc_gaps"][i], rows["tfs"][i], rows["norms"][i])
        for i in order
    ]
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]))


def segment_boolean_mixed(rows, clauses, cache, k: int, min_should_match: int = 0):
    """Exhaustive boolean evaluation where clauses are terms, phrases, or
    constant-score term sets (rewritten MultiTermQuery clauses).

    ``clauses``: list of dicts {occur, kind: 'term'|'phrase'|'const',
    terms: tuple, weight: float32 (0 for FILTER/MUST_NOT)}. ``kind='const'``
    matches the union of the terms' doc sets and contributes the constant
    ``weight`` (ConstantScoreQuery semantics — the CONSTANT_SCORE rewrite of
    prefix/wildcard/fuzzy/range/set clauses inside booleans). Otherwise
    identical to the term-only kernel: score = float32(Σ_double float32
    clause scores), hit iff all MUST ∧ no MUST_NOT ∧ (MUST present ∨
    ≥ minShouldMatch SHOULD).
    """
    from lucene_spark.search.ast import FILTER, MUST, MUST_NOT, SHOULD

    by_term: dict[str, list[int]] = {}
    for i, t in enumerate(rows["term"]):
        by_term.setdefault(t, []).append(i)

    def clause_postings(c):
        """(docs, contrib_f32 or None) for one clause; None docs → no match."""
        if c["kind"] == "const":
            idxs = [i for t in c["terms"] if t in by_term for i in by_term[t]]
            if not idxs:
                return None, None
            parts = [
                decode_block(rows["first_doc"][i], rows["count"][i],
                             rows["doc_gaps"][i], rows["tfs"][i])[0]
                for i in idxs
            ]
            d = np.unique(np.concatenate(parts))
            if c["occur"] in (MUST, SHOULD):
                return d, np.full(d.size, np.float32(c["weight"]), dtype=F32)
            return d, None
        if c["kind"] == "term":
            t = c["terms"][0]
            if t not in by_term:
                return None, None
            d, tf, nm = term_postings(rows, by_term[t])
        else:
            d, tf, nm = segment_phrase_postings(rows, list(c["terms"]))
            if d.size == 0:
                return None, None
        if c["occur"] in (MUST, SHOULD):
            w = np.float32(c["weight"])
            inv = cache[np.asarray(nm, dtype=np.int64) & 0xFF]
            tf32 = np.asarray(tf, dtype=F32)
            denom = (F32(1.0) + (tf32 * inv).astype(F32)).astype(F32)
            return d, (w - (w / denom).astype(F32)).astype(F32)
        return d, None

    n_req = sum(1 for c in clauses if c["occur"] in (MUST, FILTER))
    docs_parts, score_parts, must_parts, should_parts = [], [], [], []
    excl_parts = []
    for c in clauses:
        d, sc = clause_postings(c)
        if d is None:
            if c["occur"] in (MUST, FILTER):
                return np.zeros(0, np.int64), np.zeros(0, F32)
            continue
        if c["occur"] == MUST_NOT:
            excl_parts.append(d)
            continue
        docs_parts.append(d)
        score_parts.append(
            sc.astype(np.float64) if sc is not None else np.zeros(d.size)
        )
        must_parts.append(
            np.full(d.size, 1 if c["occur"] in (MUST, FILTER) else 0, np.int64)
        )
        should_parts.append(
            np.full(d.size, 1 if c["occur"] == SHOULD else 0, np.int64)
        )

    if not docs_parts:
        return np.zeros(0, np.int64), np.zeros(0, F32)
    alld = np.concatenate(docs_parts)
    uniq, inv = np.unique(alld, return_inverse=True)
    acc = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(acc, inv, np.concatenate(score_parts))
    mcnt = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(mcnt, inv, np.concatenate(must_parts))
    scnt = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(scnt, inv, np.concatenate(should_parts))

    ok = mcnt >= n_req if n_req else scnt >= max(1, min_should_match)
    if n_req and min_should_match:
        ok &= scnt >= min_should_match
    if excl_parts:
        excl = np.unique(np.concatenate(excl_parts))
        ok &= ~np.isin(uniq, excl)
    if not ok.any():
        return np.zeros(0, np.int64), np.zeros(0, F32)
    d = uniq[ok]
    s = acc[ok].astype(F32)
    if k is None:  # count-only callers: skip the top-k sort
        return d, s
    order = np.lexsort((d, -s.astype(np.float64)))[:k]
    return d[order], s[order]


def segment_phrase_postings(rows, terms: list[str]):
    """(docs, freqs, norms) of exact-phrase matches within one segment.

    ``rows``: postings block columns (with globalized first/last_doc) for all
    phrase terms in this segment.
    """
    by_term: dict[str, list[int]] = {}
    for i, t in enumerate(rows["term"]):
        by_term.setdefault(t, []).append(i)
    if any(t not in by_term for t in terms):
        return (np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0, np.int64))

    per_term = [_term_postings_with_positions(rows, by_term[t]) for t in terms]

    # leapfrog docID intersection (cheap approximation phase)
    common = per_term[0][0]
    for docs, *_ in per_term[1:]:
        common = np.intersect1d(common, docs, assume_unique=True)
        if common.size == 0:
            return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                    np.zeros(0, np.int64))

    # verification phase: aligned-position intersection per candidate doc
    # (position of term i adjusted by -i; ExactPhraseMatcher alignment rule)
    locs = [np.searchsorted(docs, common) for docs, *_ in per_term]
    out_docs, out_freqs, out_norms = [], [], []
    norms0 = per_term[0][2]
    for j in range(common.size):
        cand = None
        for i, (docs, tfs, _nm, flat, offs) in enumerate(per_term):
            k = locs[i][j]
            p = flat[offs[k]: offs[k] + tfs[k]] - i
            cand = p if cand is None else np.intersect1d(cand, p, assume_unique=True)
            if cand.size == 0:
                break
        if cand is not None and cand.size:
            out_docs.append(int(common[j]))
            out_freqs.append(int(cand.size))
            out_norms.append(int(norms0[locs[0][j]]))
    return (np.array(out_docs, dtype=np.int64),
            np.array(out_freqs, dtype=np.int64),
            np.array(out_norms, dtype=np.int64))
