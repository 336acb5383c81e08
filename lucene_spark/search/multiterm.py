"""Multi-term query expansion + constant-score execution, and the
synonym / disjunction-max scorers.

Expansion mirrors ``core/search/MultiTermQuery.java``'s term-dictionary
intersection, Spark-first: the predicate is pushed into the sorted
``term_stats`` parquet scan (prefix/range predicates hit row-group min/max
stats — the job of Lucene's FST ``.tip`` index), the matched terms come back
tiny, and the doc-set union runs per segment on decoded posting blocks.

CONSTANT_SCORE rewrite semantics (the Lucene default for these queries):
every matching doc scores exactly ``boost``; ties → docID ascending — so
top-k = the k smallest matching docIDs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_spark.indexing.blocks import decode_block
from lucene_spark.search import ast

F32 = np.float32


def _wildcard_to_like(pattern: str) -> str:
    """Lucene wildcard (* any run, ? one char) → SQL LIKE pattern."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def expand_terms(reader, q: ast.MultiTermQuery, max_terms: int = 100_000) -> list[str]:
    """Matching terms from the term dictionary (predicate-pushdown scan)."""
    from pyspark.sql import functions as F

    ts = reader._term_stats_df
    c = F.col("term")
    if q.kind == "prefix":
        cond = c.startswith(q.value)
    elif q.kind == "wildcard":
        cond = c.like(_wildcard_to_like(q.value))
    elif q.kind == "regexp":
        cond = c.rlike(f"^(?:{q.value})$")  # Lucene regexps are anchored
    elif q.kind == "fuzzy":
        # length pre-filter prunes the scan; exact Levenshtein on the rest
        n = len(q.value)
        cond = (
            (F.length(c) >= n - q.max_edits)
            & (F.length(c) <= n + q.max_edits)
            & (F.levenshtein(c, F.lit(q.value)) <= q.max_edits)
        )
    elif q.kind == "range":
        cond = F.lit(True)
        if q.lower is not None:
            cond = cond & (c >= q.lower)
        if q.upper is not None:
            cond = cond & (c <= q.upper)
    elif q.kind == "set":
        cond = c.isin(list(q.terms))
    else:
        raise ValueError(f"unknown MultiTermQuery kind: {q.kind}")
    rows = ts.filter(cond).select("term").limit(max_terms).collect()
    return [r["term"] for r in rows]


def constant_score_topk(reader, terms: list[str], k: int, boost: float):
    """First k matching docIDs (docID asc) with score == boost.

    Per segment: decode only enough leading blocks to cover k docs (blocks
    are doc-ordered), union, take k smallest; driver merges.
    """
    from lucene_spark.search.searcher import ScoreDoc

    if not terms:
        return []
    postings = reader.postings(terms)
    cols = ["term", "first_doc", "count", "doc_gaps", "tfs", "doc_offset"]

    def run_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = {c: pdf[c].to_numpy() for c in cols}
        off = np.int64(rows["doc_offset"][0])
        order = np.argsort(rows["first_doc"], kind="stable")
        parts, seen = [], 0
        for i in order.tolist():
            d, _ = decode_block(
                rows["first_doc"][i] + off, rows["count"][i],
                rows["doc_gaps"][i], rows["tfs"][i],
            )
            parts.append(d)
            seen += d.size
            if seen >= 4 * k and np.unique(np.concatenate(parts)).size >= k:
                break
        docs = np.unique(np.concatenate(parts))[:k]
        return pd.DataFrame({"doc_id": docs})

    out = (
        postings.select("seg", *cols)
        .groupBy("seg")
        .applyInPandas(run_segment, "doc_id long")
        .collect()
    )
    docs = sorted(int(r["doc_id"]) for r in out)[:k]
    return [ScoreDoc(d, float(boost)) for d in docs]


def constant_score_count(reader, terms: list[str]) -> int:
    """Exact matching-doc count (union of posting doc-sets)."""
    if not terms:
        return 0
    postings = reader.postings(terms)
    cols = ["term", "first_doc", "count", "doc_gaps", "tfs", "doc_offset"]

    def run_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = {c: pdf[c].to_numpy() for c in cols}
        parts = [
            decode_block(rows["first_doc"][i], rows["count"][i],
                         rows["doc_gaps"][i], rows["tfs"][i])[0]
            for i in range(len(pdf))
        ]
        n = int(np.unique(np.concatenate(parts)).size) if parts else 0
        return pd.DataFrame({"n": [n]})

    out = (
        postings.select("seg", *cols)
        .groupBy("seg")
        .applyInPandas(run_segment, "n long")
        .collect()
    )
    return sum(int(r["n"]) for r in out)


def synonym_topk(reader, similarity, q: ast.SynonymQuery, k: int):
    """SynonymQuery: per-doc tf summed across terms, one BM25 score with
    blended df = max over the terms' docFreqs."""
    from lucene_spark.search.searcher import ScoreDoc

    terms = [t for t in dict.fromkeys(q.terms)]
    stats = reader.term_stats(terms)
    present = [t for t in terms if t in stats and stats[t]["df"] > 0]
    if not present:
        return []
    df_blend = max(stats[t]["df"] for t in present)
    scorer = reader.similarity_scorer(similarity, q.boost, [df_blend])
    postings = reader.postings(present)
    cols = ["term", "first_doc", "count", "doc_gaps", "tfs", "norms", "doc_offset"]

    def run_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = {c: pdf[c].to_numpy() for c in cols}
        off = np.int64(rows["doc_offset"][0])
        d_parts, tf_parts, nm_parts = [], [], []
        for i in range(len(pdf)):
            d, tf, nm = decode_block(
                rows["first_doc"][i] + off, rows["count"][i],
                rows["doc_gaps"][i], rows["tfs"][i], rows["norms"][i],
            )
            d_parts.append(d)
            tf_parts.append(tf)
            nm_parts.append(nm)
        alld = np.concatenate(d_parts)
        uniq, inv = np.unique(alld, return_inverse=True)
        tfsum = np.zeros(uniq.size, dtype=np.int64)
        np.add.at(tfsum, inv, np.concatenate(tf_parts))
        norm = np.zeros(uniq.size, dtype=np.int64)
        norm[inv] = np.concatenate(nm_parts)  # same doc → same norm
        s = scorer.score(tfsum, norm)
        order = np.lexsort((uniq, -s.astype(np.float64)))[:k]
        return pd.DataFrame({"doc_id": uniq[order], "score": s[order]})

    return _merge_topk(postings, cols, run_segment, k)


def dismax_topk(reader, similarity, q: ast.DisjunctionMaxQuery, k: int):
    """DisjunctionMaxQuery over term subqueries:
    score = max(sub) + tie_breaker × Σ(others)."""
    terms = [t for t in dict.fromkeys(q.terms)]
    stats = reader.term_stats(terms)
    present = [t for t in terms if t in stats and stats[t]["df"] > 0]
    if not present:
        return []
    scorers = {
        t: reader.similarity_scorer(similarity, q.boost, [stats[t]["df"]])
        for t in present
    }
    tie = F32(q.tie_breaker)
    postings = reader.postings(present)
    cols = ["term", "first_doc", "count", "doc_gaps", "tfs", "norms", "doc_offset"]

    def run_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = {c: pdf[c].to_numpy() for c in cols}
        off = np.int64(rows["doc_offset"][0])
        d_parts, s_parts = [], []
        for i in range(len(pdf)):
            d, tf, nm = decode_block(
                rows["first_doc"][i] + off, rows["count"][i],
                rows["doc_gaps"][i], rows["tfs"][i], rows["norms"][i],
            )
            d_parts.append(d)
            s_parts.append(scorers[rows["term"][i]].score(tf, nm))
        alld = np.concatenate(d_parts)
        alls = np.concatenate(s_parts)
        uniq, inv = np.unique(alld, return_inverse=True)
        smax = np.zeros(uniq.size, dtype=F32)
        np.maximum.at(smax, inv, alls)
        ssum = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(ssum, inv, alls.astype(np.float64))
        score = (smax + (tie * (ssum.astype(F32) - smax).astype(F32)).astype(F32)).astype(F32)
        order = np.lexsort((uniq, -score.astype(np.float64)))[:k]
        return pd.DataFrame({"doc_id": uniq[order], "score": score[order]})

    return _merge_topk(postings, cols, run_segment, k)


def _merge_topk(postings, cols, run_segment, k: int):
    from lucene_spark.search.searcher import ScoreDoc

    out = (
        postings.select("seg", *cols)
        .groupBy("seg")
        .applyInPandas(run_segment, "doc_id long, score float")
        .collect()
    )
    if not out:
        return []
    d = np.array([r["doc_id"] for r in out], dtype=np.int64)
    s = np.array([r["score"] for r in out], dtype=np.float32)
    order = np.lexsort((d, -s.astype(np.float64)))[:k]
    return [ScoreDoc(int(d[i]), float(s[i])) for i in order]
