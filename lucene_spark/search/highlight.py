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
