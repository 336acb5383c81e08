"""Highlighter-lite: re-analysis snippet extraction, pure JVM.

The reference highlighter modules (``lucene/highlighter``) re-analyze the
stored text and surface a window around the first match. This is that idea
Spark-first: one whole-stage-codegen pass over the source table (tokenize
with the SimpleAnalyzer contract, locate the first query-term position,
slice a ±window token context, wrap matched terms in tags) — no UDFs, no
positions storage needed, and the identical computation is expressible in
DuckDB SQL for the correctness gate.

Semantics (deterministic, mirrored by ``oracle.highlight_sql``):
- tokens = ``[a-z0-9]+`` runs of the lowercased text;
- first match index f = smallest token position holding any query term;
- snippet tokens = ``tokens[max(f-window,0) : max(f-window,0)+2*window+1]``;
- every query term inside the snippet is wrapped in ``<b>…</b>``;
- docs with no match are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def highlight_df(docs: DataFrame, terms: list[str], window: int = 4,
                 text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id_col, snippet) for every doc containing ≥1 of ``terms``."""
    terms_sql = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = (f"regexp_extract_all(lower(coalesce({text_col}, '')), "
            f"'[a-z0-9]+', 0)")
    first = (f"array_min(filter(transform({toks}, (x, i) -> "
             f"IF(array_contains(array({terms_sql}), x), i, NULL)), "
             f"v -> v IS NOT NULL))")
    start = f"greatest({first} - {window}, 0)"
    snip = f"slice({toks}, {start} + 1, {2 * window + 1})"
    marked = (f"transform({snip}, x -> "
              f"IF(array_contains(array({terms_sql}), x), "
              f"concat('<b>', x, '</b>'), x))")
    return (
        docs.select(id_col, F.expr(first).alias("_f"),
                    F.expr(f"array_join({marked}, ' ')").alias("snippet"))
        .filter(F.col("_f").isNotNull())
        .select(id_col, "snippet")
    )


def passage_highlight_df(docs: DataFrame, terms: list[str],
                         passage_len: int = 30, k1: float = 1.2,
                         b: float = 0.75, pivot: float = 87.0,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """UnifiedHighlighter analogue — best passage per matching doc.

    The reference scores candidate passages with ``PassageScorer``
    (``highlighter/uhighlight/PassageScorer.java:78-136``): per unique
    matching term, contribution = tf(freqInPassage, passageLen) ×
    weight(contentLength, termFreqInDoc); passage score = norm(start) × Σ;
    weight = (k1+1)·ln(1 + (1 + len/pivot + 0.5)/(ttf + 0.5)),
    tf = freq/(freq + k1·((1−b) + b·len/pivot)), norm = 1 + 1/ln(pivot +
    start). Deterministic deviations for a cross-engine contract (the
    reference's BreakIterator sentence passages and char offsets are
    locale-dependent): passages are fixed non-overlapping ``passage_len``-
    token windows, lengths/offsets are in TOKENS, and the per-term sum runs
    in DOUBLE with one final f32 cast (vs Java's f32 hash-order
    accumulation).

    Returns (id_col, passage_start, score float, snippet) — the single
    best passage per doc by (score DESC, start ASC); non-matching docs are
    dropped. Scale shape: tokens explode → early filter to query terms →
    two partial-agg groupBys → per-doc top-1 window; the snippet slice
    joins back to the (pruned) source row only for winning docs.
    """
    terms_arr = F.array(*[F.lit(t) for t in terms])
    base = docs.select(
        F.col(id_col),
        F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), "
               f"'[a-z0-9]+', 0)").alias("_toks"),
    )
    toked = base.select(
        id_col, F.size("_toks").alias("dl"),
        F.posexplode("_toks").alias("pos", "term"),
    ).filter(F.array_contains(terms_arr, F.col("term")))

    ttf = toked.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("ttf"), F.first("dl").alias("dl"))
    freqs = toked.groupBy(
        id_col, (F.col("pos") / passage_len).cast("long").alias("pid"),
        "term",
    ).agg(F.count(F.lit(1)).alias("freq"))

    j = freqs.join(ttf, [id_col, "term"])
    start = (F.col("pid") * passage_len).cast("double")
    plen = F.least(F.lit(float(passage_len)),
                   F.col("dl").cast("double") - start)
    weight = (
        F.lit(k1 + 1.0)
        * F.log(1.0 + (1.0 + F.col("dl").cast("double") / pivot + 0.5)
                / (F.col("ttf").cast("double") + 0.5))
    )
    tf = (F.col("freq").cast("double")
          / (F.col("freq").cast("double")
             + k1 * ((1.0 - b) + b * plen / pivot)))
    norm = 1.0 + 1.0 / F.log(F.lit(pivot) + start)
    scored = (
        j.select(id_col, "pid", (tf * weight).alias("c"), norm.alias("nrm"))
        .groupBy(id_col, "pid")
        .agg((F.sum("c") * F.first("nrm")).cast("float").alias("score"))
    )

    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("pid"))
    best = (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))

    snip_toks = F.expr(
        f"slice(_toks, CAST(pid * {passage_len} AS INT) + 1, {passage_len})")
    marked = F.transform(
        snip_toks,
        lambda x: F.when(F.array_contains(terms_arr, x),
                         F.concat(F.lit("<b>"), x, F.lit("</b>")))
        .otherwise(x),
    )
    return (
        best.join(base, id_col)
        .select(
            id_col,
            (F.col("pid") * passage_len).cast("long").alias("passage_start"),
            "score",
            F.array_join(marked, " ").alias("snippet"),
        )
    )
