"""Deletes (live docs) + segment compaction: delete-by-term filtering on
every query shape, stale-stats semantics (Lucene parity), and the
build → append → delete → compact ≡ fresh-build-of-survivors contract."""

import shutil

import pytest

from lucene_spark.corpus import VOCAB, synthetic_transcripts, synthetic_transcripts_pdf
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.indexing.builder import IndexBuilder
from lucene_spark.indexing.maintenance import IndexMaintenance
from lucene_spark.search import ast
from lucene_spark.search.searcher import IndexSearcher

N = 60


@pytest.fixture(scope="module")
def pdf60():
    return synthetic_transcripts_pdf(N)


def _queries():
    return [
        VOCAB[0],
        f"+{VOCAB[1]} {VOCAB[5]}",
        f"{VOCAB[0]} {VOCAB[3]} {VOCAB[17]}",
        f"+{VOCAB[2]} -{VOCAB[0]}",
    ]


def test_delete_by_term_then_compact(spark, tmp_path, pdf60):
    df = synthetic_transcripts(spark, N)
    d = str(tmp_path / "delidx")
    shutil.rmtree(d, ignore_errors=True)
    IndexBuilder(spark, d, num_segments=5).build(df)
    s = IndexSearcher(spark, d)
    victim = VOCAB[7]
    big = 10 ** 5
    before = {q: s.search(q, big) for q in _queries()}
    deleted_docs = {h.doc_id for h in s.search(f"+{victim}", big)}
    assert deleted_docs

    m = IndexMaintenance(spark, d)
    n = m.delete_by_term(victim)
    assert n == len(deleted_docs)
    assert m.delete_by_term(victim) == 0  # idempotent

    # deletes filter hits on every query shape, scores unchanged for
    # survivors (stats are stale until merge — Lucene live-docs semantics)
    s2 = IndexSearcher(spark, d)
    assert s2.count(f"+{victim}") == 0
    for q in _queries():
        got = [(h.doc_id, h.score) for h in s2.search(q, big)]
        exp = [(h.doc_id, h.score) for h in before[q]
               if h.doc_id not in deleted_docs]
        assert got == exp, f"post-delete mismatch for {q!r}"
    # multiterm + phrase + count paths also respect live docs
    pref = s2.search(ast.MultiTermQuery("prefix", victim[:4]), big)
    assert deleted_docs.isdisjoint({h.doc_id for h in pref})
    assert s2.count(ast.MultiTermQuery("prefix", victim[:4])) == len(pref)

    # compact: drop deleted rows, renumber docIDs, recompute stats —
    # must equal a FRESH build of the surviving corpus exactly
    res = m.compact(target_rows=10 ** 6)
    assert res["merged_runs"] >= 1

    golden = BruteForceIndex(pdf60)
    del_ids = set(golden.postings[victim][0].tolist())
    assert del_ids == deleted_docs
    ordered = pdf60.sort_values(["conv_id", "turn_idx"],
                                kind="mergesort").reset_index(drop=True)
    surv = ordered[~ordered.index.isin(del_ids)]
    fresh_d = str(tmp_path / "freshidx")
    IndexBuilder(spark, fresh_d, num_segments=2).build(
        spark.createDataFrame(surv))

    s3 = IndexSearcher(spark, d)
    s4 = IndexSearcher(spark, fresh_d)
    assert s3.reader.doc_count == s4.reader.doc_count
    assert s3.reader.sum_ttf == s4.reader.sum_ttf
    phrase = None
    gold_surv = BruteForceIndex(surv)
    an = gold_surv.analyzer
    for text in surv["text"]:
        toks = an.tokenize_text(text)
        if len(toks) >= 2:
            phrase = ast.PhraseQuery((toks[0], toks[1]))
            break
    checks = _queries() + [phrase, ast.MultiTermQuery("prefix", "ba")]
    for q in checks:
        a = [(h.doc_id, h.score) for h in s3.search(q, 200)]
        b = [(h.doc_id, h.score) for h in s4.search(q, 200)]
        assert a == b, f"compacted != fresh for {q!r}"
        ge = gold_surv.search(q, 200)
        assert a == ge, f"compacted != golden for {q!r}"


def test_append_many_then_compact_pure_merge(spark, tmp_path):
    """Thousands-of-micro-segments scenario in miniature: many appended
    segments compact into few, with identical query results (no deletes)."""
    from pyspark.sql import functions as F

    from lucene_spark.streaming.incremental import IncrementalIndexer

    df = synthetic_transcripts(spark, 40).cache()
    convs = sorted(r["conv_id"] for r in df.select("conv_id").distinct().collect())
    d = str(tmp_path / "incidx")
    shutil.rmtree(d, ignore_errors=True)
    inc = IncrementalIndexer(spark, d, rows_per_segment=25)
    step = len(convs) // 4
    bounds = [convs[i * step] for i in range(1, 4)] + [None]
    lo = None
    for i, hi in enumerate([convs[step], convs[2 * step], convs[3 * step], None]):
        part = df
        if lo is not None:
            part = part.filter(F.col("conv_id") >= lo)
        if hi is not None:
            part = part.filter(F.col("conv_id") < hi)
        inc.append(part, epoch_id=i)
        lo = hi
    s_before = IndexSearcher(spark, d)
    n_seg_before = s_before.reader.manifest["num_segments"]
    assert n_seg_before >= 4
    before = {q: s_before.search(q, 500) for q in _queries()}

    res = IndexMaintenance(spark, d).compact(target_rows=10 ** 6)
    assert res["num_segments"] < n_seg_before

    s_after = IndexSearcher(spark, d)
    for q in _queries():
        assert s_after.search(q, 500) == before[q], q
    # per-query task count shrinks with the segment count
    assert s_after.reader.manifest["num_segments"] == res["num_segments"]


def test_update_by_term_single_commit(spark, tmp_path):
    """updateDocument analogue: delete-by-term + append published by ONE
    commit ≡ separate delete then append; delete applies only to docs
    present before the update (Lucene semantics)."""
    from pyspark.sql import functions as F

    from lucene_spark.streaming.incremental import IncrementalIndexer

    df = synthetic_transcripts(spark, 40).cache()
    convs = sorted(r["conv_id"] for r in df.select("conv_id").distinct().collect())
    cut = convs[len(convs) // 2]
    lo = df.filter(F.col("conv_id") < cut)
    hi = df.filter(F.col("conv_id") >= cut)
    victim = VOCAB[3]

    d_u = str(tmp_path / "upd")
    inc_u = IncrementalIndexer(spark, d_u, rows_per_segment=40)
    inc_u.append(lo, epoch_id=0)
    res = inc_u.update(hi, delete_term=victim, epoch_id=1)
    assert res["deleted"] > 0

    d_s = str(tmp_path / "sep")
    inc_s = IncrementalIndexer(spark, d_s, rows_per_segment=40)
    inc_s.append(lo, epoch_id=0)
    IndexMaintenance(spark, d_s).delete_by_term(victim)
    inc_s.append(hi, epoch_id=1)

    su = IndexSearcher(spark, d_u)
    ss = IndexSearcher(spark, d_s)
    for q in _queries() + [f"+{victim}"]:
        assert [(h.doc_id, h.score) for h in su.search(q, 500)] == \
            [(h.doc_id, h.score) for h in ss.search(q, 500)], q
    # the appended docs containing the victim term still match
    lo_count = len({h.doc_id for h in su.search(f"+{victim}", 500)})
    assert lo_count > 0  # survivors come from the appended batch only
    assert su.count(f"+{victim}") == lo_count
    # replayed epoch is a no-op
    assert inc_u.update(hi, delete_term=victim, epoch_id=1) \
        .get("skipped_epoch") == 1


def test_second_compaction_id_order_vs_doc_order(spark, tmp_path):
    """After a first compaction assigns fresh segment ids, segment-id order
    no longer matches doc order; a second compaction spanning old and fresh
    ids must still merge in DOC order (review r2: sorting by seg id here
    silently corrupted docs/postings alignment)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from lucene_spark.streaming.incremental import IncrementalIndexer

    n = 160
    texts = []
    for i in range(n):
        t = f"alpha w{i % 5} beta"
        if i % 4 == 0:
            t += " vkill"
        texts.append(t)
    pdf = pd.DataFrame({
        "conv_id": [f"c{i:05d}" for i in range(n)],
        "turn_idx": [0] * n, "role": ["user"] * n,
        "text": texts, "tool": [None] * n, "ts": [None] * n,
    })
    df = spark.createDataFrame(pdf)
    d = str(tmp_path / "dbl")
    shutil.rmtree(d, ignore_errors=True)
    inc = IncrementalIndexer(spark, d, rows_per_segment=10 ** 6)
    # four appends → segments 0..3 sized 60/20/20/60
    for e, (lo, hi) in enumerate([(0, 60), (60, 80), (80, 100), (100, 160)]):
        inc.append(df.filter((F.col("conv_id") >= f"c{lo:05d}")
                             & (F.col("conv_id") < f"c{hi:05d}")), epoch_id=e)
    m = IndexMaintenance(spark, d)
    # first compact merges ONLY the middle pair [1,2] → fresh id 4;
    # doc order becomes [0, 4, 3] while id order is [0, 3, 4]
    res1 = m.compact(target_rows=50)
    assert res1["merged_runs"] == 1 and res1["num_segments"] == 3
    order = sorted(IndexSearcher(spark, d).reader.offsets.items(),
                   key=lambda kv: kv[1])
    assert [s for s, _ in order] != sorted(s for s, _ in order), \
        "precondition: id order must differ from doc order"

    # delete + second compact spanning the out-of-id-order run
    m.delete_by_term("vkill")
    res2 = m.compact(target_rows=10 ** 6)
    assert res2["num_segments"] == 1

    surv = pdf[~pdf["text"].str.contains("vkill")].reset_index(drop=True)
    fresh = str(tmp_path / "dblfresh")
    IndexBuilder(spark, fresh, num_segments=2).build(spark.createDataFrame(surv))
    s_c = IndexSearcher(spark, d)
    s_f = IndexSearcher(spark, fresh)
    golden = BruteForceIndex(surv)
    for q in ["alpha", "w0", "w3", "+alpha +w1", '"alpha w2"',
              ast.MultiTermQuery("prefix", "w")]:
        a = [(h.doc_id, h.score) for h in s_c.search(q, 200)]
        b = [(h.doc_id, h.score) for h in s_f.search(q, 200)]
        assert a == b, f"double-compaction mismatch for {q!r}"
        assert a == golden.search(q, 200), f"golden mismatch for {q!r}"


def test_index_writer_facade_and_delete_by_query(spark, tmp_path):
    """IndexWriter (writer.py): addDocuments → deleteDocuments(query=...)
    → forceMerge, with exact count bookkeeping at each step and the
    post-merge index equal in hit counts to the pre-merge live view."""
    from lucene_spark.corpus import VOCAB, synthetic_transcripts
    from lucene_spark.search import ast
    from lucene_spark.search.searcher import IndexSearcher
    from lucene_spark.writer import IndexWriter

    d = str(tmp_path / "wfacade")
    w = IndexWriter(spark, d, rows_per_segment=100)
    df = synthetic_transcripts(spark, 60)
    n_docs = df.count()
    w.add_documents(df)
    assert w.num_docs() == n_docs and not w.has_deletions()
    s = IndexSearcher(spark, d)
    q = ast.parse(f"+{VOCAB[0]} +{VOCAB[3]}", s.analyzer)
    n_match = s.count(q)
    n_hot = s.count(VOCAB[0])
    nd = w.delete_documents(query=q)
    assert nd == n_match and w.has_deletions()
    s2 = IndexSearcher(spark, d)
    assert s2.count(q) == 0
    assert s2.count(VOCAB[0]) == n_hot - nd
    w.force_merge()
    s3 = IndexSearcher(spark, d)
    assert s3.count(q) == 0
    assert s3.count(VOCAB[0]) == n_hot - nd
    assert w.num_docs() == n_docs - nd and not w.has_deletions()
    # term-form delete still works through the facade
    nd2 = w.delete_documents(term=VOCAB[1])
    assert nd2 > 0 and w.has_deletions()
    assert IndexSearcher(spark, d).count(ast.TermQuery(VOCAB[1])) == 0


def test_add_indexes_copies_segments(spark, tmp_path):
    """addIndexes(Directory) analogue: combined index equals a fresh build
    over the union corpus on stats, counts, and (conv, turn, score) hit
    sets; config mismatch and deleted sources are refused."""
    from pyspark.sql import functions as F

    from lucene_spark.writer import IndexWriter

    a_df = synthetic_transcripts(spark, 30)
    b_df = (synthetic_transcripts(spark, 20, seed=77)
            .withColumn("conv_id", F.concat(F.lit("b"), F.col("conv_id"))))
    da, db, du = (str(tmp_path / x) for x in ("a", "b", "u"))
    IndexBuilder(spark, da, num_segments=3).build(a_df)
    IndexBuilder(spark, db, num_segments=2).build(b_df)
    IndexBuilder(spark, du, num_segments=5).build(a_df.unionByName(b_df))

    w = IndexWriter(spark, da)
    out = w.add_indexes(db)
    assert out["copied_segments"] == 2

    sa = IndexSearcher(spark, da)
    su = IndexSearcher(spark, du)
    assert sa.reader.doc_count == su.reader.doc_count
    # stats are order-independent → must match a fresh union build exactly
    def ts(d):
        import json
        with open(f"{d}/manifest.json", encoding="utf-8") as f:
            sd = json.load(f).get("stats_dirs", {}).get("term_stats",
                                                        "term_stats")
        return sorted(
            map(tuple, spark.read.parquet(f"{d}/{sd}")
                .select("field", "term", "df", "ttf").collect()))
    assert ts(da) == ts(du)
    assert sa.reader.sum_ttf == su.reader.sum_ttf
    # scores are stats-dependent only → hit sets match modulo docID layout
    for q in _queries():
        assert sa.count(q) == su.count(q)
        def keyed(s, q):
            hits = s.search(q, k=s.reader.doc_count)
            docs = {r["doc_id"]: (r["conv_id"], r["turn_idx"])
                    for r in s.reader.docs().collect()}
            return sorted((*docs[h.doc_id], round(h.score, 6)) for h in hits)
        assert keyed(sa, q) == keyed(su, q)

    # config mismatch refused
    dws = str(tmp_path / "ws")
    IndexBuilder(spark, dws, num_segments=1, analyzer="whitespace").build(
        synthetic_transcripts(spark, 5))
    with pytest.raises(ValueError):
        IndexWriter(spark, da).add_indexes(dws)
    # deleted source refused
    IndexMaintenance(spark, db).delete_by_term(VOCAB[0])
    with pytest.raises(NotImplementedError):
        IndexWriter(spark, da).add_indexes(db)


def test_snapshot_commit_points(spark, tmp_path):
    """SnapshotDeletionPolicy + DirectoryReader.open(IndexCommit) analogue:
    a pinned commit survives append + delete + compaction GC and serves the
    OLD point-in-time results bit-exactly; rollback restores it as the live
    view; release unpins it."""
    from pyspark.sql import functions as F

    from lucene_spark.writer import IndexWriter

    d = str(tmp_path / "snapidx")
    df = synthetic_transcripts(spark, 30)
    IndexBuilder(spark, d, num_segments=3).build(df)
    w = IndexWriter(spark, d, rows_per_segment=20)
    q = f"{VOCAB[0]} {VOCAB[3]}"

    s0 = IndexSearcher(spark, d)
    before = [(h.doc_id, h.score) for h in s0.search(q, k=20)]
    n0 = s0.reader.doc_count
    w.snapshot("pre")

    # mutate heavily: append new docs, delete a term, compact everything
    extra = (synthetic_transcripts(spark, 10, seed=99)
             .withColumn("conv_id", F.concat(F.lit("z"), F.col("conv_id"))))
    w.add_documents(extra)
    w.delete_documents(term=VOCAB[7])
    w.force_merge(target_rows=10 ** 6)

    live = IndexSearcher(spark, d)
    assert live.reader.doc_count != n0  # the live view moved on

    snap = IndexSearcher(spark, d, commit="pre")
    assert snap.reader.doc_count == n0
    after = [(h.doc_id, h.score) for h in snap.search(q, k=20)]
    assert after == before  # bit-exact point-in-time scores

    # rollback: the live manifest becomes the pinned commit again
    w.rollback("pre")
    rolled = IndexSearcher(spark, d)
    assert rolled.reader.doc_count == n0
    assert [(h.doc_id, h.score) for h in rolled.search(q, k=20)] == before

    # release + a fresh mutation's GC may now collect the pinned state
    w.release_snapshot("pre")
    assert "pre" not in w.snapshots()
    with pytest.raises(FileNotFoundError):
        w.release_snapshot("pre")
    with pytest.raises(ValueError):
        w.snapshot("bad/tag")


def test_rollback_append_never_reuses_segment_ids(spark, tmp_path):
    """Append-after-rollback must not recycle the rolled-back commits'
    segment ids: another snapshot may pin those dirs, and overwriting them
    would corrupt its point-in-time view. Ids come from a disk scan
    (``commits.next_segment_base``), mirroring the reference's monotone
    ``SegmentInfos.counter``; ``gc_orphan_segments`` then sweeps only the
    truly-unreferenced leftovers (IndexFileDeleter refCount-0)."""
    import os

    from pyspark.sql import functions as F

    from lucene_spark.indexing import commits
    from lucene_spark.writer import IndexWriter

    d = str(tmp_path / "rbidx")
    IndexBuilder(spark, d, num_segments=2).build(synthetic_transcripts(spark, 20))
    n0 = IndexSearcher(spark, d).reader.doc_count
    w = IndexWriter(spark, d, rows_per_segment=5)
    q = f"{VOCAB[0]} {VOCAB[3]}"

    w.snapshot("a")
    segs_a = {int(s) for s in commits.load(d, "a")["offsets"]}

    extra = (synthetic_transcripts(spark, 10, seed=7)
             .withColumn("conv_id", F.concat(F.lit("x"), F.col("conv_id"))))
    w.add_documents(extra)
    w.snapshot("b")
    segs_b = {int(s) for s in commits.load(d, "b")["offsets"]}
    sb = IndexSearcher(spark, d, commit="b")
    hits_b = [(h.doc_id, h.score) for h in sb.search(q, k=20)]

    # roll back to "a", then append fresh docs: the new commit's segment
    # ids must be disjoint from EVERYTHING on disk (incl. b-only segments)
    w.rollback("a")
    extra2 = (synthetic_transcripts(spark, 10, seed=8)
              .withColumn("conv_id", F.concat(F.lit("y"), F.col("conv_id"))))
    w.add_documents(extra2)
    segs_live = {int(s) for s in w.manifest["offsets"]}
    new_segs = segs_live - segs_a
    assert new_segs and not (new_segs & segs_b)

    # snapshot "b"'s point-in-time view is bit-exact after the new append
    sb2 = IndexSearcher(spark, d, commit="b")
    assert [(h.doc_id, h.score) for h in sb2.search(q, k=20)] == hits_b

    # orphan GC keeps live + pinned dirs, removes nothing while b pins all
    assert IndexMaintenance(spark, d).gc_orphan_segments() == []
    # release "b": its private segments are now refCount-0 and swept
    w.release_snapshot("b")
    swept = IndexMaintenance(spark, d).gc_orphan_segments()
    assert set(swept) == segs_b - segs_a - segs_live
    for s in segs_live:
        assert os.path.isdir(f"{d}/postings/seg={s}")
    live = IndexSearcher(spark, d)
    assert live.reader.doc_count == n0 + extra2.count()
