"""Index build invariants (FIXTURES.md §4) + checkpoint/resume semantics."""

import shutil

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from lucene_spark.corpus import synthetic_transcripts
from lucene_spark.indexing.blocks import decode_block
from lucene_spark.indexing.builder import IndexBuilder
from lucene_spark.smallfloat import byte4_to_int, int_to_byte4


def _reader(spark, index_dir):
    from lucene_spark.search.reader import IndexReader

    return IndexReader(spark, index_dir)


def test_docid_assignment_invariant(spark, index_dir, corpus_pdf):
    docs = _reader(spark, index_dir).docs().orderBy("doc_id").toPandas()
    expected = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert docs["doc_id"].tolist() == list(range(len(expected)))
    assert docs["conv_id"].tolist() == expected["conv_id"].tolist()
    assert docs["turn_idx"].tolist() == expected["turn_idx"].tolist()


def test_norm_is_smallfloat_of_dl(spark, index_dir):
    docs = _reader(spark, index_dir).docs().toPandas()
    dl = docs["dl"].to_numpy()
    assert (int_to_byte4(dl).astype(int) == docs["norm"].to_numpy()).all()
    # decode ≤ dl and is the lossy LENGTH_TABLE value
    assert (byte4_to_int(docs["norm"].to_numpy()) <= dl).all()


def test_stats_consistent_with_postings(spark, index_dir):
    post = spark.read.parquet(f"{index_dir}/postings")
    docs = spark.read.parquet(f"{index_dir}/docs")
    ts = spark.read.parquet(f"{index_dir}/term_stats")
    fs = spark.read.parquet(f"{index_dir}/field_stats").collect()[0]
    recount = post.groupBy("term").agg(
        F.sum("count").alias("df2"), F.sum("ttf").alias("ttf2")
    )
    assert ts.join(recount, "term").filter("df != df2 or ttf != ttf2").count() == 0
    assert fs["sum_ttf"] == docs.agg(F.sum("dl")).collect()[0][0]
    assert fs["doc_count"] == docs.count()
    assert fs["sum_df"] == ts.agg(F.sum("df")).collect()[0][0]


def test_postings_decode_matches_bruteforce(spark, index_dir, corpus_pdf):
    """Decode every block of a hot term; postings == recount from raw text."""
    from lucene_spark.analysis import StandardAnalyzer
    from lucene_spark.corpus import VOCAB

    term = VOCAB[0]
    rows = (
        _reader(spark, index_dir).postings([term])
        .filter(F.col("term") == term)
        .orderBy(F.col("doc_offset") + F.col("first_doc"))
        .collect()
    )
    got = {}
    prev_last = -1
    for r in rows:
        d, t = decode_block(r["doc_offset"] + r["first_doc"], r["count"],
                            bytes(r["doc_gaps"]), bytes(r["tfs"]))
        assert d[0] > prev_last  # blocks globally disjoint & ordered per term
        prev_last = int(d[-1])
        got.update(dict(zip(d.tolist(), t.tolist())))

    an = StandardAnalyzer()
    expected = {}
    ordered = corpus_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for doc_id, text in enumerate(ordered["text"]):
        c = an.tokenize_text(text).count(term)
        if c:
            expected[doc_id] = c
    assert got == expected


def test_resume_rebuilds_only_changed_segment(spark, tmp_path):
    d = str(tmp_path / "idx")
    shutil.rmtree(d, ignore_errors=True)
    df = synthetic_transcripts(spark, 40)
    b = IndexBuilder(spark, d, num_segments=4)
    r1 = b.build(df)
    assert r1["built"] == 4
    r2 = b.build(df, resume=True)
    assert {k: r2[k] for k in ("doc_count", "built", "reused")} == {
        "doc_count": r1["doc_count"], "built": 0, "reused": 4}
    mut = df.withColumn(
        "text",
        F.when(
            (F.col("conv_id") == "conv00000003") & (F.col("turn_idx") == 0),
            F.lit("totally new text here"),
        ).otherwise(F.col("text")),
    )
    r3 = b.build(mut, resume=True)
    assert r3["built"] == 1 and r3["reused"] == 3
    assert (
        spark.read.parquet(f"{d}/term_stats").filter("term='totally'").count() == 1
    )


def test_murmur3_matches_spark_hash(spark):
    """partitioning.murmur3_int32 must equal F.hash for int32 inputs — the
    collision-free shuffle mapping depends on it."""
    from lucene_spark.indexing.partitioning import collision_free_skeys, murmur3_int32

    vals = list(range(200)) + [2**31 - 1, -1, -2**31, 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v int")
    got = {r["v"]: r["h"] for r in df.select("v", F.hash("v").alias("h")).collect()}
    for v in vals:
        assert murmur3_int32(v) == got[v], v
    # and the skeys really are collision-free under pmod
    for n in (4, 16, 64):
        ks = collision_free_skeys(n)
        assert sorted(murmur3_int32(k) % n for k in ks) == list(range(n))


def test_tokenize_flat_matches_tokenize_series(corpus_pdf):
    from lucene_spark.analysis import SimpleAnalyzer, StandardAnalyzer

    texts = corpus_pdf["text"].head(3000)
    for an in (StandardAnalyzer(), SimpleAnalyzer()):
        flat, lens = an.tokenize_flat(texts)
        lists = an.tokenize_series(texts)
        assert lens.tolist() == [len(x) for x in lists]
        assert flat.tolist() == [t for ts in lists for t in ts]


def test_vectorized_block_encode_matches_per_term(spark):
    import numpy as np

    from lucene_spark.indexing.blocks import (
        encode_segment_blocks,
        encode_term_blocks,
    )

    rng = np.random.RandomState(7)
    rows = []
    for term in ["aa", "bb", "cc"]:
        docs = np.sort(rng.choice(5000, size=rng.randint(1, 700), replace=False))
        tfs = rng.randint(1, 9, size=docs.size)
        norms = rng.randint(0, 255, size=docs.size)
        rows.append((term, docs, tfs, norms))
    terms_arr = np.concatenate([np.full(d.size, t, dtype=object) for t, d, _, _ in rows])
    d_arr = np.concatenate([d for _, d, _, _ in rows])
    tf_arr = np.concatenate([tf for _, _, tf, _ in rows])
    nm_arr = np.concatenate([nm for _, _, _, nm in rows])
    got = encode_segment_blocks(terms_arr, d_arr, tf_arr, nm_arr)
    i = 0
    for term, docs, tfs, norms in rows:
        for blk in encode_term_blocks(docs, tfs, norms):
            assert got["term"][i] == term
            for key in ("block_id", "first_doc", "last_doc", "count", "ttf",
                        "max_tf", "doc_gaps", "tfs", "norms", "impact_tfs",
                        "impact_norms"):
                assert np.asarray(got[key][i]).tolist() == np.asarray(blk[key]).tolist(), (term, i, key)
            i += 1
    assert i == len(got["term"])


def test_plan_boundaries_bounded_driver_collection(spark):
    """The boundary planner must never materialize more than
    O(num_segments) keys on the driver (scale blocker: VERDICT r1 #1) and
    must plan identical boundaries on a re-run."""
    from lucene_spark.corpus import synthetic_transcripts
    from lucene_spark.indexing.partitioning import plan_boundaries

    df = synthetic_transcripts(spark, 120)
    n_rows = df.count()
    stats: dict = {}
    b1 = plan_boundaries(df, 4, sample_mod=1, target_per_segment=4,
                         _stats=stats)
    budget = 4 * 4
    assert stats["pre_sample"] == n_rows
    assert stats["collected"] <= 8 * budget           # O(num_segments)
    assert stats["collected"] < n_rows / 2            # really thinned
    assert len(b1) == 3
    stats2: dict = {}
    b2 = plan_boundaries(df, 4, sample_mod=1, target_per_segment=4,
                         _stats=stats2)
    assert b1 == b2 and stats2 == stats               # deterministic


def test_hot_term_skew_balanced(spark, tmp_path):
    """North-rule hot-term skew evidence: a term carrying ~half of ALL
    token occurrences must not unbalance the build. The tf aggregation is
    two-stage with the SEGMENT as the salt — tf is counted per-segment
    inside the Arrow kernel (a hot term never becomes a shuffle key; the
    only build shuffle keys on the range-balanced doc sort key), and the
    global term_stats merge sees at most n_segments pre-aggregated rows
    per term. So per-segment input rows stay balanced no matter how
    skewed the term distribution is, and the hot term's postings spread
    across every segment as independent block runs."""
    df = synthetic_transcripts(spark, 40)
    hot = " hotzipfterm" * 20
    df = df.withColumn("text", F.concat(F.col("text"), F.lit(hot)))
    d = str(tmp_path / "skew_idx")
    IndexBuilder(spark, d, num_segments=8).build(df)

    man = spark.read.parquet(f"{d}/build_manifest").toPandas()
    rows = man["rows_in"].to_numpy()
    assert len(rows) == 8
    # doc-key range partitioning: segments balanced despite 50% token skew
    assert rows.max() <= 2.0 * max(1, rows.min())

    post = spark.read.parquet(f"{d}/postings").filter(
        F.col("term") == "hotzipfterm")
    segs = {r["seg"] for r in post.select("seg").distinct().collect()}
    assert segs == set(range(8))  # per-segment runs = the salt buckets
    ts = spark.read.parquet(f"{d}/term_stats").filter(
        F.col("term") == "hotzipfterm").collect()
    n_docs = df.count()
    assert len(ts) == 1 and ts[0]["df"] == n_docs
    assert ts[0]["ttf"] == 20 * n_docs


def test_read_transcript_table_formats(spark, tmp_path):
    """tables.read_transcript_table: parquet path, catalog table (temp
    view), auto sniffing, and a CLEAR error for fmt='iceberg' without the
    runtime (no silent fallback)."""
    import pytest

    from lucene_spark.corpus import synthetic_transcripts
    from lucene_spark.tables import iceberg_available, read_transcript_table

    df = synthetic_transcripts(spark, 10)
    p = str(tmp_path / "tt")
    df.write.mode("overwrite").parquet(p)
    assert read_transcript_table(spark, p).count() == df.count()          # auto→parquet
    assert read_transcript_table(spark, p, "parquet").count() == df.count()
    df.createOrReplaceTempView("tt_view")
    assert read_transcript_table(spark, "tt_view", "table").count() == df.count()
    assert not iceberg_available(spark)  # sandbox has no iceberg jar
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_transcript_table(spark, "cat.db.t", "iceberg")
    with pytest.raises(ValueError):
        read_transcript_table(spark, p, "orc2")
