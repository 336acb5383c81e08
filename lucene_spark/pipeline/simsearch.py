"""Similarity search over the embeddings table — brute-force cosine top-k and
an LSH-bucketed approximate variant.

Ordering contract: with all vectors quantized to ints (``contracts.
quantized_embeddings``), cosine order for a fixed query = integer-dot order
(top-k by ``dot DESC, vec_id ASC``), so results are hash-exact across engines.
(For unnormalized corpora the production variant divides by |b| — same plan
shape, float ordering; the quantized form is the oracle-gated one.)

Scale: brute-force is one broadcast of the k query vectors against a full scan
(embarrassingly parallel, no shuffle but the final top-k); the LSH variant
prunes the scan to same-bucket candidates (sign-pattern buckets over the first
16 dims), the standard random-hyperplane scheme with axis-aligned planes so
both engines derive identical buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.pipeline.contracts import quantized_embeddings


def _dot(qa, qb):
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def brute_topk(emb: DataFrame, n_queries: int = 5, k: int = 10) -> DataFrame:
    """(query_id, rank, neighbor_id, dot) — exact top-k by quantized dot.

    Queries = the first ``n_queries`` vec_ids; self-matches excluded. The
    query side is tiny → broadcast; the corpus side is a single scan.
    """
    q = quantized_embeddings(emb)
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    scored = (
        q.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("qq"), F.col("q")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )


def band_key_col(qcol, band: int, band_bits: int = 16):
    """16-bit sign-pattern hyperplane key over dims [band·16+1, band·16+16]."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(band_bits)),
        F.lit(0).cast("long"),
        lambda acc, j: acc + F.when(
            F.element_at(qcol, (F.lit(band * band_bits) + j).cast("int")) >= 0,
            F.pow(F.lit(2), j - 1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def _band_rows(q: DataFrame, bands: int, band_bits: int) -> DataFrame:
    """(vec_id, q, band, key) — one row per (vector, band)."""
    return q.select(
        "vec_id", "q",
        F.posexplode(
            F.array(*[band_key_col(F.col("q"), m, band_bits)
                      for m in range(bands)])
        ).alias("band", "key"),
    )


def lsh_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
             bands: int = 4, band_bits: int = 16) -> DataFrame:
    """Approximate top-k via BANDED hyperplane LSH (multi-probe): a corpus
    vector is a candidate when ANY of its ``bands`` 16-bit sign-pattern keys
    matches the query's — 2^16 buckets per band (vs the naive 256-bucket
    single hash whose pruning collapses at corpus scale), with the band
    union recovering recall. Deterministic, so the oracle reproduces it
    exactly; recall < 1 by design (documented ANN trade-off).
    """
    q = quantized_embeddings(emb)
    corpus = _band_rows(q, bands, band_bits)
    queries = _band_rows(q.filter(F.col("vec_id") < n_queries), bands,
                         band_bits).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"),
        "band", "key",
    )
    scored = (
        corpus.join(F.broadcast(queries), ["band", "key"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("qq"), F.col("q")).alias("dot"),
        )
        # a pair can collide in several bands — one candidate row each
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("dot").alias("dot"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )

# --------------------------------------------------------------------- IVF --
# The coarse-quantizer scale path (IVF a la Faiss IndexIVFFlat): partition the
# corpus into C Voronoi cells once, at query time scan only the nprobe nearest
# cells. Everything is integer/IEEE-deterministic so the DuckDB oracle
# reproduces the EXACT candidate sets (recall < 1 by design, like ann_lsh).


def _assign_cells(q: DataFrame, cents: np.ndarray) -> DataFrame:
    """(vec_id, q, cell): nearest centroid by squared-L2 over the quantized
    ints, tie -> smallest centroid id. One Arrow-batched BLAS matmul per
    batch (dist = |c|^2 - 2 v.c; |v|^2 is constant per row) - a pure
    projection, NO shuffle: at 100 TB this is the only full-corpus pass and
    it pipelines with the scan. ``cents`` ships inside the task closure
    (C x D ints, a few KB)."""
    c = np.ascontiguousarray(cents, dtype=np.int64)
    cn2 = (c * c).sum(axis=1)

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.array(pdf["q"].tolist(), dtype=np.int64)
            dist = cn2[None, :] - 2 * (v @ c.T)
            pdf = pdf.copy()
            # np.argmin takes the FIRST minimum -> min-cid tie-break
            pdf["cell"] = np.argmin(dist, axis=1).astype(np.int32)
            yield pdf

    return q.mapInPandas(fn, "vec_id long, q array<long>, cell int")


def train_ivf(q: DataFrame, n_centroids: int = 16,
              lloyd_iters: int = 1) -> np.ndarray:
    """Deterministic IVF coarse quantizer: seeds = the quantized vectors of
    vec_ids [0, C) (a fixed-seed sample stand-in), refined by ``lloyd_iters``
    k-means steps. The Lloyd mean is ``floor(sum / count)`` computed in
    float64 (bit-identical to the oracle's ``floor(sum(v)::DOUBLE /
    count(*))``); a cell that loses all members keeps its previous centroid.
    Each iteration is one assignment pass + one (cell, dim) aggregation -
    bounded C x D rows to the driver."""
    seeds = (q.filter(F.col("vec_id") < n_centroids)
             .orderBy("vec_id").collect())
    cents = np.array([r["q"] for r in seeds], dtype=np.int64)
    for _ in range(lloyd_iters):
        sums = (
            _assign_cells(q, cents)
            .select("cell", F.posexplode("q").alias("j", "v"))
            .groupBy("cell", "j")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        nxt = cents.copy()
        for r in sums:
            nxt[r["cell"], r["j"]] = np.floor(float(r["s"]) / float(r["n"]))
        cents = nxt
    return cents


def ivf_topk(emb: DataFrame, n_queries: int = 5, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             lloyd_iters: int = 1) -> DataFrame:
    """Approximate top-k via IVF: assign the corpus to C cells (one
    shuffle-free pass), probe each query's ``nprobe`` nearest cells, exact
    integer-dot re-rank inside the union of probed cells. Cells are disjoint
    so candidates need no dedup (unlike the LSH band union). Queries resolve
    their probe lists on the driver (n_queries x C distances, trivial) and
    broadcast into the candidate join."""
    spark = emb.sparkSession
    q = quantized_embeddings(emb)
    cents = train_ivf(q, n_centroids, lloyd_iters)
    cn2 = (cents * cents).sum(axis=1)

    qrows = q.filter(F.col("vec_id") < n_queries).collect()
    probe_rows = []
    for r in qrows:
        v = np.array(r["q"], dtype=np.int64)
        dist = cn2 - 2 * (cents @ v)
        # train_ivf returns fewer centroids than requested on tiny corpora
        # — lexsort keys must share len(cents), not n_centroids
        order = np.lexsort((np.arange(len(cents)), dist))[:nprobe]
        probe_rows.extend(
            (int(r["vec_id"]), [int(x) for x in r["q"]], int(cell))
            for cell in order
        )
    probes = spark.createDataFrame(probe_rows, "query_id long, qq array<long>, cell int")

    cands = (
        _assign_cells(q, cents)
        .join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("qq"), F.col("q")).alias("dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "dot")
    )


# -------------------------------------------------------------------- HNSW --
# Per-segment HNSW graphs (Lucene95HnswVectorsFormat architecture): build
# inside each segment's applyInPandas task, persist adjacency parquet +
# hnsw_meta.json (segment count / M / efc — readers NEVER guess the
# partitioning), search by per-segment fan-out + bounded k-merge. Graph
# walks are not SQL-expressible by construction; the gate pins the
# recall-1 configuration against the exact brute SQL instead.

def _hnsw_meta_path(out_dir: str) -> str:
    import os

    return os.path.join(out_dir, "_hnsw_meta.json")  # "_"-prefixed: invisible to the parquet file listing


def build_hnsw(emb: DataFrame, out_dir: str, num_segments: int = 4,
               m: int = 8, ef_construction: int = 64) -> None:
    """Build per-segment HNSW graphs over the quantized embeddings and
    persist (seg, node, level, neighbors) adjacency parquet plus a
    ``_hnsw_meta.json`` (num_segments/m/efc — the search side reads the
    REAL build partitioning instead of inferring it from which segments
    happen to be non-empty). One shuffle (the seg grouping); each graph
    builds executor-side over only its segment's vectors."""
    import json
    import os

    import pandas as pd

    from lucene_spark.search.hnsw import SegmentHnsw, node_levels

    q = quantized_embeddings(emb).withColumn(
        "seg", (F.col("vec_id") % num_segments).cast("int"))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["seg"].iloc[0])
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        vecs = np.stack(pdf["q"].to_numpy()[order]).astype(np.int64)
        g = SegmentHnsw(vecs, node_levels(ids), m, ef_construction)
        rows = g.to_rows(seg, ids)
        return pd.DataFrame(rows,
                            columns=["seg", "node", "level", "neighbors"])

    (q.groupBy("seg")
     .applyInPandas(build,
                    "seg int, node long, level int, neighbors array<long>")
     .write.mode("overwrite").partitionBy("seg").parquet(out_dir))
    with open(_hnsw_meta_path(out_dir), "w") as f:
        json.dump({"num_segments": int(num_segments), "m": int(m),
                   "ef_construction": int(ef_construction)}, f)


def _hnsw_num_segments(index_dir: str) -> int:
    import json

    with open(_hnsw_meta_path(index_dir)) as f:
        return int(json.load(f)["num_segments"])


def _hnsw_segment_search(gpdf, vpdf, queries, per_seg: int, ef_search: int):
    """Shared cogrouped kernel: one segment's (graph rows, vector rows) ×
    the broadcast query list → [(query_id, neighbor_id, dot)] with up to
    ``per_seg`` rows per query (callers over-fetch by one when a
    self-match will be dropped afterwards).
    Row extraction is columnar (numpy zip) — never pandas iterrows."""
    from lucene_spark.search.hnsw import graph_from_rows, graph_search

    if not len(gpdf) or not len(vpdf):
        return []
    ids = vpdf["vec_id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    vecs = np.stack(vpdf["q"].to_numpy()[order]).astype(np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}
    rows = list(zip(gpdf["seg"].to_numpy().tolist(),
                    gpdf["node"].to_numpy().tolist(),
                    gpdf["level"].to_numpy().tolist(),
                    (list(x) for x in gpdf["neighbors"].to_numpy())))
    adj, entry, top = graph_from_rows(rows, pos)
    out = []
    for qid, qv in queries:
        for s, n in graph_search(vecs, adj, entry, top, qv,
                                 per_seg, ef_search):
            out.append((qid, int(ids[n]), int(s)))
    return out


def hnsw_topk(spark, emb: DataFrame, index_dir: str, n_queries: int = 5,
              k: int = 10, ef_search: int = 64) -> DataFrame:
    """(query_id, rank, neighbor_id, dot) — approximate top-k via the
    per-segment HNSW graphs: the tiny query set broadcasts in the task
    closure, each segment walks ONLY its graph and returns k rows per
    query, the global merge ranks k from num_segments × k candidates
    (the same bounded-merge shape as per-segment text top-k). Segment
    count comes from the index's own metadata."""
    import pandas as pd

    num_segments = _hnsw_num_segments(index_dir)
    qe = quantized_embeddings(emb)
    qrows = qe.filter(F.col("vec_id") < n_queries).collect()
    queries = sorted((int(r["vec_id"]),
                      np.asarray(r["q"], dtype=np.int64)) for r in qrows)
    graph = spark.read.parquet(index_dir)
    corpus = qe.withColumn(
        "seg", (F.col("vec_id") % num_segments).cast("int"))

    def search(key, gpdf: pd.DataFrame, vpdf: pd.DataFrame) -> pd.DataFrame:
        hits = [(q, n, d) for q, n, d
                in _hnsw_segment_search(gpdf, vpdf, queries, k + 1, ef_search)
                if n != q]
        return pd.DataFrame({
            "query_id": pd.Series([h[0] for h in hits], dtype="int64"),
            "neighbor_id": pd.Series([h[1] for h in hits], dtype="int64"),
            "dot": pd.Series([h[2] for h in hits], dtype="int64")})

    cand = (graph.groupBy("seg").cogroup(corpus.groupBy("seg"))
            .applyInPandas(search,
                           "query_id long, neighbor_id long, dot long"))
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"),
                                               F.asc("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "dot"))


def hnsw_topk_single(spark, vectors: DataFrame, index_dir: str,
                     query_vec, k: int = 10,
                     ef_search: int = 64) -> DataFrame:
    """(doc_id, dot) top-k for ONE query vector via the per-segment HNSW
    graphs — the searcher's ``KnnQuery(strategy="hnsw")`` execution path.
    ``vectors``: (doc_id, embedding); ``index_dir``: built by
    :func:`build_hnsw` over the same table (doc_id as vec_id). The query
    quantizes through the SAME float32 contract as the exact path
    (``knn.quantize_query``) so both strategies score identically."""
    import pandas as pd

    from lucene_spark.search.knn import quantize_query

    num_segments = _hnsw_num_segments(index_dir)
    qv = np.asarray(quantize_query(query_vec), dtype=np.int64)
    queries = [(-1, qv)]
    graph = spark.read.parquet(index_dir)
    corpus = quantized_embeddings(
        vectors.select(F.col("doc_id").alias("vec_id"), "embedding")
    ).withColumn("seg", (F.col("vec_id") % num_segments).cast("int"))

    def search(key, gpdf: pd.DataFrame, vpdf: pd.DataFrame) -> pd.DataFrame:
        hits = _hnsw_segment_search(gpdf, vpdf, queries, k, ef_search)
        return pd.DataFrame({
            "doc_id": pd.Series([h[1] for h in hits], dtype="int64"),
            "dot": pd.Series([h[2] for h in hits], dtype="int64")})

    cand = (graph.groupBy("seg").cogroup(corpus.groupBy("seg"))
            .applyInPandas(search, "doc_id long, dot long"))
    return cand.orderBy(F.desc("dot"), F.asc("doc_id")).limit(k)


# ------------------------------------------- other similarity functions --
# VectorSimilarityFunction parity (core/index/VectorSimilarityFunction.java:
# EUCLIDEAN, DOT_PRODUCT (brute_topk above), COSINE; MAXIMUM_INNER_PRODUCT
# ranks identically to DOT_PRODUCT). Euclidean stays pure-integer (exact
# cross-engine); cosine uses IEEE doubles (sqrt is correctly rounded, so
# DuckDB reproduces it bit-for-bit).

def euclidean_topk(emb: DataFrame, n_queries: int = 5,
                   k: int = 10) -> DataFrame:
    """(query_id, rank, neighbor_id, dist2) — exact k-NN by SQUARED
    euclidean distance over the quantized vectors (EUCLIDEAN similarity:
    1/(1+d²) ranks identically to d² ascending). Integer math throughout."""
    q = quantized_embeddings(emb)
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"))
    d2 = F.aggregate(
        F.zip_with(F.col("qq"), F.col("q"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)
    scored = (
        q.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                d2.alias("dist2")))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist2"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "dist2"))


def cosine_topk(emb: DataFrame, n_queries: int = 5,
                k: int = 10) -> DataFrame:
    """(query_id, rank, neighbor_id, cos) — exact k-NN by cosine over the
    quantized vectors (COSINE similarity: (1+cos)/2 ranks identically to
    cos). dot and the two squared norms are exact integers; the final
    cos = dot / sqrt(na) / sqrt(nb) is three correctly-rounded IEEE double
    ops, reproduced bit-for-bit by the SQL oracle."""
    q = quantized_embeddings(emb)
    nrm = F.aggregate(F.transform(F.col("q"), lambda x: x * x),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    qn = q.select("vec_id", "q", nrm.alias("n2"))
    queries = qn.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq"),
        F.col("n2").alias("qn2"))
    dot = F.aggregate(F.zip_with(F.col("qq"), F.col("q"),
                                 lambda x, y: x * y),
                      F.lit(0).cast("long"), lambda acc, v: acc + v)
    scored = (
        qn.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"),
            (dot.cast("double")
             / F.sqrt(F.col("qn2").cast("double"))
             / F.sqrt(F.col("n2").cast("double"))).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cos"))
