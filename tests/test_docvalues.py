"""Numeric doc-values updates (updateNumericDocValue / .dvu generation
chain analogue): overlay semantics, sort integration, compact fold, GC."""

import os
import shutil

import pytest

from lucene_spark.corpus import VOCAB, synthetic_transcripts
from lucene_spark.indexing.builder import IndexBuilder
from lucene_spark.indexing.maintenance import IndexMaintenance
from lucene_spark.search.searcher import IndexSearcher
from lucene_spark.writer import IndexWriter

N = 60


def _build(spark, d):
    shutil.rmtree(d, ignore_errors=True)
    IndexBuilder(spark, d, num_segments=5).build(synthetic_transcripts(spark, N))


def _match_ids(spark, d, q):
    s = IndexSearcher(spark, d)
    return {r["doc_id"] for r in s.match_df(s.parse(q)).collect()}


def test_update_chain_newest_wins(spark, tmp_path):
    d = str(tmp_path / "dvidx")
    _build(spark, d)
    a_ids = _match_ids(spark, d, VOCAB[0])
    b_ids = _match_ids(spark, d, VOCAB[1])
    assert a_ids and b_ids and (a_ids & b_ids), "need overlapping match sets"
    w = IndexWriter(spark, d)
    assert w.update_numeric_doc_value(VOCAB[0], "priority", 100) == len(a_ids)
    assert w.update_numeric_doc_value(VOCAB[1], "priority", 200) == len(b_ids)
    r = IndexSearcher(spark, d).reader
    assert r.dv_fields() == ["priority"]
    vals = {row["doc_id"]: row["value"]
            for row in r.numeric_doc_values("priority").collect()}
    assert set(vals) == (a_ids | b_ids)
    for i in sorted(a_ids | b_ids):
        assert vals[i] == (200 if i in b_ids else 100)  # newest gen wins
    # sparse: untouched docs have no row
    assert r.numeric_doc_values("absent_field") is None


def test_no_match_update_is_noop(spark, tmp_path):
    d = str(tmp_path / "dvnoop")
    _build(spark, d)
    w = IndexWriter(spark, d)
    assert w.update_numeric_doc_value("zzzznotaterm", "rank", 5) == 0
    assert IndexSearcher(spark, d).reader.numeric_doc_values("rank") is None
    assert not os.path.isdir(f"{d}/dv")  or not os.listdir(f"{d}/dv")
    m = IndexMaintenance(spark, d)
    with pytest.raises(ValueError):
        m.update_numeric_doc_value("rank", 5)  # neither term nor query
    with pytest.raises(ValueError):
        m.update_numeric_doc_value("rank", 5, term="x", query=object())


def test_sort_by_doc_value(spark, tmp_path):
    d = str(tmp_path / "dvsort")
    _build(spark, d)
    w = IndexWriter(spark, d)
    w.update_numeric_doc_value(VOCAB[3], "prio", 7)
    w.update_numeric_doc_value(VOCAB[4], "prio", 3)
    s = IndexSearcher(spark, d)
    q = s.parse(f"{VOCAB[0]} {VOCAB[3]} {VOCAB[4]}")
    match = sorted(r["doc_id"] for r in s.match_df(q).collect())
    v3 = _match_ids(spark, d, VOCAB[3])
    v4 = _match_ids(spark, d, VOCAB[4])
    want_val = {i: (3 if i in v4 else 7 if i in v3 else 0) for i in match}
    got = s.sort_by_doc_value_df(q, "prio", ascending=False).collect()
    assert [r["doc_id"] for r in got] == sorted(
        match, key=lambda i: (-want_val[i], i))
    assert all(r["value"] == want_val[r["doc_id"]] for r in got)
    k3 = s.sort_by_doc_value_df(q, "prio", k=3, default=-1).collect()
    assert len(k3) == 3 and [r["value"] for r in k3] == sorted(
        r["value"] for r in k3)


def test_compact_folds_dv_chain(spark, tmp_path):
    d = str(tmp_path / "dvcompact")
    _build(spark, d)
    s = IndexSearcher(spark, d)
    # keyed identity BEFORE mutation: (conv_id, turn_idx) → updated value
    docs_before = {(r["conv_id"], r["turn_idx"]): r["doc_id"]
                   for r in s.reader.docs().collect()}
    w = IndexWriter(spark, d)
    w.update_numeric_doc_value(VOCAB[2], "prio", 11)
    w.update_numeric_doc_value(VOCAB[5], "prio", 22)
    pre = {r["doc_id"]: r["value"] for r in
           IndexSearcher(spark, d).reader
           .numeric_doc_values("prio").collect()}
    by_key = {k: pre[i] for k, i in docs_before.items() if i in pre}
    deleted = _match_ids(spark, d, VOCAB[7])
    m = IndexMaintenance(spark, d)
    m.delete_by_term(VOCAB[7])
    m.compact(target_rows=10 ** 9)
    r2 = IndexSearcher(spark, d).reader
    assert len(r2.manifest["dv_updates"]["prio"]) == 1  # chain folded
    docs_after = {(r["conv_id"], r["turn_idx"]): r["doc_id"]
                  for r in r2.docs().collect()}
    post = {r["doc_id"]: r["value"]
            for r in r2.numeric_doc_values("prio").collect()}
    deleted_keys = {k for k, i in docs_before.items() if i in deleted}
    want = {docs_after[k]: v for k, v in by_key.items()
            if k not in deleted_keys}
    assert post == want and want  # values follow docs; survivors non-empty
    # old dv generations kept for open readers; exactly one fresh + 2 old
    assert len(os.listdir(f"{d}/dv")) == 3
    # a second compact is a no-op merge plan OR GCs the stale gens — either
    # way the manifest chain stays folded
    assert r2.manifest["dv_updates"]["prio"][0].startswith("dv/prio.g")


def test_field_exists_df(spark, index_dir):
    """FieldExistsQuery (core/search/FieldExistsQuery.java): doc-values
    variant = non-null side-table rows ∩ live; norms variant = union of a
    keyword field's postings docs."""
    import pyspark.sql.functions as F

    from lucene_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, index_dir)
    n = s.reader.doc_count
    vals = (s.reader.docs()
            .filter(F.col("doc_id") % 3 == 0)
            .select("doc_id",
                    F.when(F.col("doc_id") % 5 != 0, F.col("dl"))
                    .alias("value")))
    got = sorted(r["doc_id"]
                 for r in s.field_exists_df(value_df=vals).collect())
    want = [d for d in range(n) if d % 3 == 0 and d % 5 != 0]
    assert got == want
    # norms variant: every doc has >=1 text posting in this corpus except
    # docs whose text tokenized to nothing
    got_txt = {r["doc_id"] for r in s.field_exists_df(field="text").collect()}
    dls = {r["doc_id"]: r["dl"] for r in
           s.reader.docs().select("doc_id", "dl").collect()}
    assert got_txt == {d for d, dl in dls.items() if dl > 0}
    # exactly-one-variant guard
    import pytest as _pytest

    with _pytest.raises(ValueError):
        s.field_exists_df()
    with _pytest.raises(ValueError):
        s.field_exists_df(field="text", value_df=vals)
