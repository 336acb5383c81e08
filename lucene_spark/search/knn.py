"""KNN vector query — the ``KnnFloatVectorQuery`` analogue, Spark-first.

Reference semantics (``core/search/KnnFloatVectorQuery.java:44``): find the k
nearest vectors to the query vector (optionally restricted by a pre-filter),
then rewrite to a query matching exactly those k docs with their similarity
scores (``AbstractKnnVectorQuery.rewrite`` → DocAndScoreQuery) — usable
standalone or as a clause inside a BooleanQuery.

Spark-first mapping: vectors live as a columnar doc-values table
(doc_id, embedding array<float>) instead of an HNSW graph file
(``core/codecs/lucene95/Lucene95HnswVectorsFormat.java``). Two strategies:

- exact (recall = 1): ONE pushdown-pruned scan, dot product computed JVM-side
  with ``aggregate(zip_with(...))`` (whole-stage codegen, no Python), TakeOrdered
  reduces to k. At 100 TB this is embarrassingly parallel: no shuffle at all —
  each partition emits its local top-k and the driver merges k rows/partition.
- lsh: the banded sign-pattern hyperplane candidates from
  ``pipeline/simsearch.py`` — the query's band keys are computed ON THE DRIVER
  (numpy, same axis-aligned scheme) and pushed as literal equality filters, so
  the scan prunes to matching buckets before any dot product (recall < 1 by
  design; the brute pass is the oracle-gated recall=1 config).

Ordering contract: all vectors quantize to ints (``contracts.
quantized_embeddings`` — floor(double(x)·1000)), so top-k by
(dot DESC, doc_id ASC) is hash-exact across engines.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

from lucene_spark.pipeline.contracts import EMB_SCALE
from lucene_spark.pipeline.simsearch import band_key_col
from lucene_spark.pipeline.contracts import quantized_embeddings


def quantize_query(vec) -> list[int]:
    """floor(double(x) · EMB_SCALE) per component — the exact contract the
    corpus side applies (``contracts.quantized_embeddings``)."""
    return [int(math.floor(float(np.float32(x)) * EMB_SCALE)) for x in vec]


def query_band_keys(qvec_quantized: list[int], bands: int = 4,
                    band_bits: int = 16) -> list[int]:
    """The query's per-band 16-bit sign-pattern keys, computed driver-side
    with the same axis-aligned hyperplane scheme as ``band_key_col``."""
    keys = []
    for m in range(bands):
        key = 0
        for j in range(band_bits):
            i = m * band_bits + j
            if i < len(qvec_quantized) and qvec_quantized[i] >= 0:
                key |= 1 << j
        keys.append(key)
    return keys


def knn_topk_df(vectors: DataFrame, query_vec, k: int,
                filter_df: DataFrame | None = None,
                strategy: str = "exact", bands: int = 4,
                band_bits: int = 16, hnsw_dir: str | None = None,
                spark=None) -> DataFrame:
    """Top-k (doc_id, dot) for one query vector over a
    (doc_id, embedding array<float>) doc-values DataFrame.

    ``filter_df``: optional (doc_id) match set — the reference's pre-filter
    semantics (k nearest AMONG the filtered docs, not post-filtered), applied
    as a semi-join BEFORE ranking. ``strategy``: "exact" | "lsh" | "hnsw"
    (requires ``hnsw_dir`` from ``simsearch.build_hnsw`` over this table;
    unfiltered only — the reference's filtered-HNSW walk that skips
    non-matching nodes inside the beam is a documented cut, filtered
    queries take the exact path).
    """
    if strategy == "hnsw":
        if filter_df is not None:
            raise NotImplementedError(
                "filtered HNSW (AbstractKnnVectorQuery's acceptDocs-aware "
                "graph walk) is not implemented — use strategy='exact' for "
                "filtered KNN")
        if hnsw_dir is None or spark is None:
            raise ValueError(
                "strategy='hnsw' needs set_vectors(df, hnsw_dir=...) with "
                "a graph built by simsearch.build_hnsw")
        from lucene_spark.pipeline.simsearch import hnsw_topk_single

        return hnsw_topk_single(spark, vectors, hnsw_dir, query_vec, k)
    q = quantized_embeddings(vectors.select(
        F.col("doc_id").alias("vec_id"), "embedding"))
    qq = quantize_query(query_vec)
    if strategy == "lsh":
        # clamp to the query's dimensionality (ANSI element_at past the
        # array end throws; partial trailing bands add no selectivity) —
        # for dims below band_bits shrink the band itself, so band 1 never
        # indexes past the array end
        band_bits = min(band_bits, len(qq))
        bands = max(1, min(bands, len(qq) // band_bits))
        keys = query_band_keys(qq, bands, band_bits)
        cond = None
        for m, key in enumerate(keys):
            c = band_key_col(F.col("q"), m, band_bits) == F.lit(key)
            cond = c if cond is None else (cond | c)
        q = q.filter(cond)
    if filter_df is not None:
        q = q.join(filter_df.select(F.col("doc_id")),
                   q["vec_id"] == filter_df["doc_id"], "leftsemi")
    qlit = F.array(*[F.lit(v).cast("long") for v in qq])
    scored = q.select(
        F.col("vec_id").alias("doc_id"),
        F.aggregate(
            F.zip_with(F.col("q"), qlit, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("dot"),
    )
    return scored.orderBy(F.desc("dot"), F.asc("doc_id")).limit(k)


def knn_similarity_f32(dot: int, boost: float = 1.0) -> np.float32:
    """DOT_PRODUCT similarity scaling (``VectorSimilarityFunction.java``:
    (1 + dot) / 2 on unit vectors) applied to the quantized integer dot —
    the float32 score a KnnQuery clause contributes inside a boolean."""
    f = np.float32
    return f(f(boost) * f((1.0 + dot / float(EMB_SCALE * EMB_SCALE)) / 2.0))
