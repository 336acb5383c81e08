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
