"""Driver contract for the spark-graft builder (PySpark target).

Engine: ``lucene_spark`` — PySpark-native inverted-index build + BM25 top-k
(see SURVEY.md §7). Driver-checked queries run the FULL engine pipeline
(tokenize → segment index build → posting-block decode → float32 BM25 →
block-max WAND top-k) over ``documents.parquet`` mapped to transcript shape
(one doc = one turn), and are verified against independent DuckDB SQL that
recomputes everything from the raw parquet — including bit-exact float32
scoring (DuckDB FLOAT arithmetic == numpy float32 == JVM float).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lucene_spark import oracle
from lucene_spark.analysis import SimpleAnalyzer
from lucene_spark.search import ast

K_HOT, K_OR, K_BOOL, K_BOOST = 20, 100, 50, 30
Q_HOT = "table"
Q_OR = "table value query"
Q_BOOL = "+table value -spark"
Q_BOOST = "table^2.5 customer"
Q_AND = "+table +value"

_AN = SimpleAnalyzer()


def _parse(s: str):
    return ast.parse(s, _AN)


def _index_dir(sf_dir: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"/tmp/lucene_spark_driver_index/{tag}"


def _ensure_index(spark: SparkSession, sf_dir: str) -> str:
    from lucene_spark.corpus import transcripts_from_documents
    from lucene_spark.indexing.builder import IndexBuilder

    d = _index_dir(sf_dir)
    b = IndexBuilder(spark, d, analyzer="simple", num_segments=8)
    transcripts = transcripts_from_documents(spark, sf_dir)
    b.build(transcripts, resume=os.path.exists(f"{d}/manifest.json"))
    return d


def _searcher(spark: SparkSession, sf_dir: str):
    from lucene_spark.search.searcher import IndexSearcher

    return IndexSearcher(spark, _ensure_index(spark, sf_dir))


def _hits_df(spark: SparkSession, hits) -> DataFrame:
    rows = [(int(h.doc_id), float(h.score)) for h in hits]
    return spark.createDataFrame(rows, "doc_id long, score double")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full engine pipeline + boolean WAND top-10 at sf0.001."""
    s = _searcher(spark, "/root/testdata/sf0.001")
    return _hits_df(spark, s.search(_parse(Q_BOOL), k=10, mode="wand"))


# ---------------------------------------------------------------- queries --

def _q_term_stats(spark, sf_dir):
    from pyspark.sql import functions as F

    d = _ensure_index(spark, sf_dir)
    return (
        spark.read.parquet(f"{d}/term_stats")
        .orderBy(F.desc("df"), F.asc("term"))
        .select("term", "df", "ttf")
        .limit(100)
    )


def _q_doc_norms(spark, sf_dir):
    """(doc_id, dl, decoded-lossy-length) — validates docID order + SmallFloat."""
    import numpy as np
    from pyspark.sql import functions as F

    from lucene_spark.smallfloat import LENGTH_TABLE

    from lucene_spark.search.reader import IndexReader

    d = _ensure_index(spark, sf_dir)
    lookup = spark.createDataFrame(
        [(i, int(LENGTH_TABLE[i])) for i in range(256)], "norm int, dlen long"
    )
    return (
        IndexReader(spark, d).docs()
        .join(F.broadcast(lookup), "norm")
        .select("doc_id", F.col("dl").cast("long").alias("dl"), "dlen")
        .orderBy("doc_id")
    )


def _mk_bm25(qstr: str, k: int):
    def run(spark, sf_dir):
        s = _searcher(spark, sf_dir)
        return _hits_df(spark, s.search(_parse(qstr), k=k, mode="wand"))

    return run


def _q_count_and(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    n = s.count(_parse(Q_AND))
    return spark.createDataFrame([(n,)], "hits long")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "index_term_stats": _q_term_stats,
        "index_doc_norms": _q_doc_norms,
        "bm25_hot_term": _mk_bm25(Q_HOT, K_HOT),
        "bm25_or_top100": _mk_bm25(Q_OR, K_OR),
        "bm25_bool_mix": _mk_bm25(Q_BOOL, K_BOOL),
        "bm25_boost": _mk_bm25(Q_BOOST, K_BOOST),
        "count_and": _q_count_and,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "index_term_stats": oracle.term_stats_sql(100),
        "index_doc_norms": oracle.doc_norms_sql(),
        "bm25_hot_term": oracle.bm25_topk_sql(_parse(Q_HOT), K_HOT),
        "bm25_or_top100": oracle.bm25_topk_sql(_parse(Q_OR), K_OR),
        "bm25_bool_mix": oracle.bm25_topk_sql(_parse(Q_BOOL), K_BOOL),
        "bm25_boost": oracle.bm25_topk_sql(_parse(Q_BOOST), K_BOOST),
        "count_and": oracle.count_sql(_parse(Q_AND)),
    }
