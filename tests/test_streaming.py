"""Incremental / streaming index maintenance: appended segments ≡ one-shot
batch build; exactly-once epoch guard; real Structured Streaming source."""

import shutil

import pytest
from pyspark.sql import functions as F

from lucene_spark.corpus import synthetic_transcripts
from lucene_spark.indexing.builder import IndexBuilder
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.streaming.incremental import IncrementalIndexer


def _hits(searcher, q, k=50):
    return [(h.doc_id, h.score) for h in searcher.search(q, k)]


@pytest.fixture(scope="module")
def corpus(spark):
    return synthetic_transcripts(spark, 60).cache()


def test_incremental_append_equals_batch(spark, corpus, tmp_path):
    from lucene_spark.corpus import VOCAB

    d_batch = str(tmp_path / "batch")
    d_inc = str(tmp_path / "inc")
    IndexBuilder(spark, d_batch, num_segments=3).build(corpus)

    # split by conv ranges so arrival order == global (conv, turn) order
    lo = corpus.filter(F.col("conv_id") < "conv00000030")
    hi = corpus.filter(F.col("conv_id") >= "conv00000030")
    inc = IncrementalIndexer(spark, d_inc, rows_per_segment=40)
    r1 = inc.append(lo, epoch_id=0)
    r2 = inc.append(hi, epoch_id=1)
    assert r1["doc_count"] + 0 < r2["doc_count"]

    sb = IndexSearcher(spark, d_batch)
    si = IndexSearcher(spark, d_inc)
    for q in (VOCAB[0], f"+{VOCAB[1]} {VOCAB[5]}", f"{VOCAB[0]} {VOCAB[3]}"):
        assert _hits(sb, q) == _hits(si, q), q

    # replayed epoch is a no-op (exactly-once sink semantics)
    before = si.reader.manifest["doc_count"]
    r3 = inc.append(hi, epoch_id=1)
    assert r3.get("skipped_epoch") == 1
    si2 = IndexSearcher(spark, d_inc)
    assert si2.reader.doc_count == before


def test_structured_streaming_source(spark, corpus, tmp_path):
    from lucene_spark.corpus import VOCAB

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    idx = str(tmp_path / "stream_idx")
    shutil.rmtree(src, ignore_errors=True)

    lo = corpus.filter(F.col("conv_id") < "conv00000030")
    hi = corpus.filter(F.col("conv_id") >= "conv00000030")
    lo.write.mode("overwrite").parquet(src)

    indexer = IncrementalIndexer(spark, idx, rows_per_segment=40)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    q1 = indexer.write_stream(stream, ckpt)
    q1.awaitTermination(120)

    # late-arriving files → next availableNow pass appends them
    hi.write.mode("append").parquet(src)
    q2 = indexer.write_stream(
        spark.readStream.schema(corpus.schema).parquet(src), ckpt
    )
    q2.awaitTermination(120)

    d_batch = str(tmp_path / "batch2")
    IndexBuilder(spark, d_batch, num_segments=3).build(corpus)
    sb = IndexSearcher(spark, d_batch)
    si = IndexSearcher(spark, idx)
    # appended stream order was (lo files..., hi files...) → same docID space
    assert si.reader.doc_count == sb.reader.doc_count
    for q in (VOCAB[0], f"{VOCAB[0]} {VOCAB[3]}"):
        got = {h.doc_id for h in si.search(q, 50)}
        exp = {h.doc_id for h in sb.search(q, 50)}
        # file-source ordering within one batch may interleave lo-files, so
        # docIDs are assigned in (conv, turn) order per batch — identical sets
        assert got == exp, q


def test_append_stats_match_fresh_build(spark, tmp_path):
    """Incremental stats merge (per-append delta) ≡ full recompute: after
    several appends, term_stats and field_stats equal a fresh build's."""
    import shutil

    from pyspark.sql import functions as F

    from lucene_spark.corpus import synthetic_transcripts
    from lucene_spark.indexing.builder import IndexBuilder
    from lucene_spark.streaming.incremental import IncrementalIndexer

    df = synthetic_transcripts(spark, 60).cache()
    convs = sorted(r["conv_id"] for r in df.select("conv_id").distinct().collect())
    cuts = [convs[20], convs[40]]
    d_inc = str(tmp_path / "inc")
    d_full = str(tmp_path / "full")
    shutil.rmtree(d_inc, ignore_errors=True)
    inc = IncrementalIndexer(spark, d_inc, rows_per_segment=40)
    inc.append(df.filter(F.col("conv_id") < cuts[0]), epoch_id=0)
    inc.append(df.filter((F.col("conv_id") >= cuts[0])
                         & (F.col("conv_id") < cuts[1])), epoch_id=1)
    inc.append(df.filter(F.col("conv_id") >= cuts[1]), epoch_id=2)
    IndexBuilder(spark, d_full, num_segments=3).build(df)

    def sdirs(d):
        import json

        with open(f"{d}/manifest.json") as f:
            m = json.load(f)
        sd = m.get("stats_dirs", {})
        return (sd.get("term_stats", "term_stats"),
                sd.get("field_stats", "field_stats"))

    def stats(d):
        ts = spark.read.parquet(f"{d}/{sdirs(d)[0]}")
        return {(r["field"], r["term"]): (r["df"], r["ttf"], r["max_tf"])
                for r in ts.collect()}

    assert stats(d_inc) == stats(d_full)
    fs_inc = spark.read.parquet(f"{d_inc}/{sdirs(d_inc)[1]}").collect()[0]
    fs_full = spark.read.parquet(f"{d_full}/{sdirs(d_full)[1]}").collect()[0]
    assert (fs_inc["doc_count"], fs_inc["sum_ttf"], fs_inc["sum_df"]) == \
        (fs_full["doc_count"], fs_full["sum_ttf"], fs_full["sum_df"])


def test_append_crash_replay_exactly_once(spark, tmp_path):
    """A micro-batch that crashes AFTER writing segments/stats but BEFORE
    the manifest commit must be replayable without double-counting stats
    (the manifest replace is the single commit point)."""
    import json
    import shutil

    from pyspark.sql import functions as F

    from lucene_spark.corpus import synthetic_transcripts
    from lucene_spark.indexing.builder import IndexBuilder
    from lucene_spark.streaming.incremental import IncrementalIndexer

    df = synthetic_transcripts(spark, 40).cache()
    convs = sorted(r["conv_id"] for r in df.select("conv_id").distinct().collect())
    cut = convs[len(convs) // 2]
    d = str(tmp_path / "replayidx")
    shutil.rmtree(d, ignore_errors=True)
    inc = IncrementalIndexer(spark, d, rows_per_segment=40)
    inc.append(df.filter(F.col("conv_id") < cut), epoch_id=0)

    batch2 = df.filter(F.col("conv_id") >= cut)
    # crash injection: fail at the manifest commit
    orig = inc._builder._save_manifest
    def crash(m):
        raise RuntimeError("injected crash before commit")
    inc._builder._save_manifest = crash
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        inc.append(batch2, epoch_id=1)
    inc._builder._save_manifest = orig
    # replay the same epoch (what foreachBatch does after recovery)
    inc.append(batch2, epoch_id=1)
    # a second replay is a no-op (epoch recorded)
    res = inc.append(batch2, epoch_id=1)
    assert res.get("skipped_epoch") == 1

    # stats must equal a fresh build of the full corpus — no double counts
    d_full = str(tmp_path / "replayfull")
    IndexBuilder(spark, d_full, num_segments=2).build(df)

    def stats(dd):
        with open(f"{dd}/manifest.json") as f:
            m = json.load(f)
        sd = m.get("stats_dirs", {})
        ts = spark.read.parquet(
            f"{dd}/{sd.get('term_stats', 'term_stats')}")
        fs = spark.read.parquet(
            f"{dd}/{sd.get('field_stats', 'field_stats')}").collect()[0]
        return ({(r['field'], r['term']): (r['df'], r['ttf'])
                 for r in ts.collect()},
                (fs['doc_count'], fs['sum_ttf'], fs['sum_df']))

    assert stats(d) == stats(d_full)


def test_auto_compact_merge_scheduler(spark, tmp_path):
    """ConcurrentMergeScheduler analogue: appends past the segment
    threshold trigger an inline tiered compaction; results stay identical
    to a fresh batch build of the full corpus and the segment count stays
    bounded."""
    import shutil

    from lucene_spark.corpus import synthetic_transcripts
    from lucene_spark.indexing.builder import IndexBuilder
    from lucene_spark.search.searcher import IndexSearcher
    from lucene_spark.streaming.incremental import IncrementalIndexer
    from pyspark.sql import functions as F

    d = str(tmp_path / "auto_idx")
    full = synthetic_transcripts(spark, 60).cache()
    inc = IncrementalIndexer(spark, d, rows_per_segment=20,
                             auto_compact_segments=4,
                             auto_compact_rows=10_000)
    convs = sorted(r["conv_id"] for r in full.select("conv_id").distinct().collect())
    step = len(convs) // 5
    compacted = 0
    for i in range(5):
        lo = convs[i * step]
        hi = convs[(i + 1) * step - 1] if i < 4 else convs[-1]
        batch = full.filter((F.col("conv_id") >= lo) & (F.col("conv_id") <= hi))
        out = inc.append(batch, epoch_id=i)
        if "auto_compacted" in out:
            compacted += 1
            assert out["auto_compacted"]["num_segments"] <= 4
    assert compacted >= 1, "threshold never triggered"

    d2 = str(tmp_path / "batch_idx")
    shutil.rmtree(d2, ignore_errors=True)
    IndexBuilder(spark, d2, num_segments=3).build(full)
    s1 = IndexSearcher(spark, d)
    s2 = IndexSearcher(spark, d2)
    from lucene_spark.corpus import VOCAB

    q = f"{VOCAB[0]} {VOCAB[3]}"
    h1 = [(h.doc_id, h.score) for h in s1.search(q, 30)]
    h2 = [(h.doc_id, h.score) for h in s2.search(q, 30)]
    assert h1 == h2
    full.unpersist()


def test_streaming_monitor_percolates_stream(spark, corpus, tmp_path):
    """Monitor semantics over a real Structured Streaming source: registered
    term / conjunction / phrase queries match each arriving doc; matches
    agree with a brute-force recomputation; epoch replay is idempotent."""
    from pyspark.sql import Window

    from lucene_spark.corpus import VOCAB
    from lucene_spark.streaming.monitor import StreamingMonitor

    src = str(tmp_path / "msrc")
    out = str(tmp_path / "mout")
    ckpt = str(tmp_path / "mckpt")

    docs = corpus.select(
        F.row_number().over(
            Window.orderBy("conv_id", "turn_idx")
        ).cast("long").alias("doc_id"),
        "text",
    ).cache()
    lo = docs.filter(F.col("doc_id") <= 100)
    hi = docs.filter(F.col("doc_id") > 100)
    lo.write.mode("overwrite").parquet(src)

    mon = StreamingMonitor(spark)
    mon.register("q_term", VOCAB[0])
    mon.register("q_and", f"+{VOCAB[1]} +{VOCAB[3]}")
    mon.register("q_dup", f"+{VOCAB[1]} +{VOCAB[1]}")  # duplicated MUST term
    mon.register("q_phrase", '"casige baca"')
    # pure SHOULD registers via the MemoryIndex tier (presearch = term union)
    mon.register("q_or", f"{VOCAB[0]} {VOCAB[2]}")

    mon.open_stream(
        spark.readStream.schema(docs.schema).parquet(src), out, ckpt
    ).awaitTermination(120)
    hi.write.mode("append").parquet(src)
    mon.open_stream(
        spark.readStream.schema(docs.schema).parquet(src), out, ckpt
    ).awaitTermination(120)

    got = {(r["query_id"], r["doc_id"])
           for r in mon.matches(out).collect()}

    an = mon.analyzer
    exp = set()
    for r in docs.collect():
        toks = an.tokenize_text(r["text"] or "")
        if VOCAB[0] in toks:
            exp.add(("q_term", r["doc_id"]))
        if VOCAB[1] in toks and VOCAB[3] in toks:
            exp.add(("q_and", r["doc_id"]))
        if VOCAB[1] in toks:  # "+t +t" needs one distinct match, not two
            exp.add(("q_dup", r["doc_id"]))
        if any(a == "casige" and b == "baca"
               for a, b in zip(toks, toks[1:])):
            exp.add(("q_phrase", r["doc_id"]))
        if VOCAB[0] in toks or VOCAB[2] in toks:
            exp.add(("q_or", r["doc_id"]))
    assert got == exp
    assert any(q == "q_phrase" for q, _ in exp)  # phrase actually exercised

    # epoch replay (same source, fresh checkpoint) rewrites, not duplicates
    mon.open_stream(
        spark.readStream.schema(docs.schema).parquet(src), out,
        str(tmp_path / "mckpt2"),
    ).awaitTermination(120)
    assert {(r["query_id"], r["doc_id"])
            for r in mon.matches(out).collect()} == exp


def test_monitor_memoryindex_tier(spark, corpus):
    """Complex query shapes (nested boolean, sloppy phrase, prefix
    multiterm, MUST_NOT) percolate via the Presearcher + per-doc
    MemoryIndex tier; results equal brute-force MemoryIndex over every
    doc (candidate filtering must lose nothing)."""
    from pyspark.sql import Window

    from lucene_spark.corpus import VOCAB
    from lucene_spark.memory import MemoryIndex
    from lucene_spark.search import ast
    from lucene_spark.streaming.monitor import StreamingMonitor

    docs = corpus.select(
        F.row_number().over(
            Window.orderBy("conv_id", "turn_idx")
        ).cast("long").alias("doc_id"),
        "text",
    ).filter(F.col("doc_id") <= 120).cache()

    v = VOCAB
    queries = {
        "q_nested": f"({v[0]} AND {v[1]}) OR ({v[2]} AND {v[3]})",
        "q_sloppy": f'"{v[0]} {v[1]}"~3',
        "q_prefix": ast.MultiTermQuery("prefix", v[5][:4]),  # ANYTOKEN
        "q_not": f"+{v[2]} -{v[0]}",
        "q_msm": f"({v[0]} {v[1]} {v[4]})~2",
    }
    mon = StreamingMonitor(spark)
    for qid, q in queries.items():
        mon.register(qid, q)
    got = {(r["query_id"], r["doc_id"])
           for r in mon.match_batch(docs).collect()}

    exp = set()
    for r in docs.collect():
        mi = MemoryIndex.from_text(r["text"] or "")
        for qid, q in queries.items():
            if isinstance(q, str):
                q = ast.parse(q, mon.analyzer)
            if mi.matches(q):
                exp.add((qid, r["doc_id"]))
    assert got == exp
    assert {q for q, _ in exp} == set(queries)  # every shape matched >=1 doc


def test_presearch_terms_soundness():
    """_presearch_terms must never exclude a matchable doc: required
    clause's set covers; pure-SHOULD unions; ANYTOKEN on inextractable."""
    from lucene_spark.search import ast
    from lucene_spark.streaming.monitor import _presearch_terms

    tq = ast.TermQuery
    assert _presearch_terms(tq("a")) == {"a"}
    assert _presearch_terms(ast.PhraseQuery(("a", "b"))) == {"a", "b"}
    assert _presearch_terms(ast.BooleanQuery((
        (ast.MUST, tq("a")), (ast.SHOULD, tq("b"))))) == {"a"}
    assert _presearch_terms(ast.BooleanQuery((
        (ast.SHOULD, tq("a")), (ast.SHOULD, tq("b"))))) == {"a", "b"}
    # SHOULD with an inextractable member -> ANYTOKEN
    assert _presearch_terms(ast.BooleanQuery((
        (ast.SHOULD, tq("a")),
        (ast.SHOULD, ast.MultiTermQuery("prefix", "x"))))) is None
    # keyword-field-only / matchall -> ANYTOKEN
    assert _presearch_terms(tq("user", field="role")) is None
    assert _presearch_terms(ast.MatchAllDocsQuery()) is None
    # required-but-inextractable -> ANYTOKEN (NOT the should union)
    assert _presearch_terms(ast.BooleanQuery((
        (ast.MUST, ast.MultiTermQuery("prefix", "x")),
        (ast.SHOULD, tq("a"))))) is None


def test_monitor_msm_conjunction_not_fast_pathed(spark, corpus):
    """'(a AND b)~1' has msm=1 with zero SHOULD clauses — it matches
    NOTHING under the engine semantics; the all-MUST JVM fast path must
    not claim it (r4 review finding)."""
    from pyspark.sql import Window

    from lucene_spark.corpus import VOCAB
    from lucene_spark.streaming.monitor import StreamingMonitor

    docs = corpus.select(
        F.row_number().over(
            Window.orderBy("conv_id", "turn_idx")
        ).cast("long").alias("doc_id"), "text",
    ).filter(F.col("doc_id") <= 40)
    mon = StreamingMonitor(spark)
    mon.register("q_msm0", f"+{VOCAB[0]} +{VOCAB[1]}")
    mon.register("q_msm1", f"({VOCAB[0]} AND {VOCAB[1]})~1")
    got = mon.match_batch(docs).collect()
    qids = {r["query_id"] for r in got}
    assert "q_msm1" not in qids      # matches nothing
    assert "q_msm0" in qids          # plain conjunction still matches
