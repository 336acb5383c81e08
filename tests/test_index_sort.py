"""Index sorting (``IndexWriterConfig.setIndexSort``): docIDs assigned in
(*index_sort, conv_id, turn_idx) order, sort columns persisted as doc
values, sorted-search early termination, resume invalidation on a sort
change."""

import shutil

import pytest
from pyspark.sql import functions as F

from lucene_spark.corpus import VOCAB, synthetic_transcripts
from lucene_spark.indexing.builder import IndexBuilder
from lucene_spark.search.searcher import IndexSearcher

A = VOCAB[0]


@pytest.fixture(scope="module")
def sorted_ctx(spark, tmp_path_factory):
    df = synthetic_transcripts(spark, 50).withColumn(
        "slen", F.length(F.coalesce("text", F.lit(""))))
    d = str(tmp_path_factory.mktemp("sortedidx") / "index")
    shutil.rmtree(d, ignore_errors=True)
    IndexBuilder(spark, d, num_segments=4, index_sort=("slen",)).build(df)
    return df, d, IndexSearcher(spark, d)


def test_docid_order_follows_index_sort(sorted_ctx):
    df, _d, s = sorted_ctx
    want = [(r[0], r[1]) for r in df.orderBy("slen", "conv_id", "turn_idx")
            .select("conv_id", "turn_idx").collect()]
    got = [(r[0], r[1]) for r in s.reader.docs().orderBy("doc_id")
           .select("conv_id", "turn_idx").collect()]
    assert got == want
    assert s.reader.manifest["index_sort"] == ["slen"]
    # the sort column is a stored doc value
    assert "slen" in s.reader.docs().columns


def test_sorted_search_early_terminates_correctly(sorted_ctx):
    df, _d, s = sorted_ctx
    # sort-by-slen is now an index-sort prefix → early path; compare to a
    # brute ordering of the full match set
    assert s._INDEX_SORT_PREFIXES[0] == (("slen", False),)
    got = s.search_sorted(A, "slen", k=7, reverse=False)
    brute = sorted(
        [(int(r["doc_id"]), int(r["slen"])) for r in
         s.match_df(s.parse(A)).join(s.reader.docs(), "doc_id")
         .select("doc_id", "slen").collect()],
        key=lambda x: (x[1], x[0]))[:7]
    assert got == brute


def test_sort_by_doc_field(sorted_ctx):
    """SortField.Type.DOC: ascending == the index sort; reverse == the
    k largest docIDs."""
    _df, _d, s = sorted_ctx
    asc = s.search_sorted(A, "_doc", k=5, reverse=False)
    ids = [t[0] for t in asc]
    assert ids == sorted(ids)
    brute = sorted(int(r["doc_id"]) for r in
                   s.match_df(s.parse(A)).collect())
    assert ids == brute[:5]
    desc = [t[0] for t in s.search_sorted(A, "_doc", k=5, reverse=True)]
    assert desc == brute[::-1][:5]


def test_wand_still_exact_on_sorted_index(sorted_ctx):
    _df, _d, s = sorted_ctx
    w = [(h.doc_id, h.score) for h in s.search(A, k=15, mode="wand")]
    e = [(h.doc_id, h.score) for h in s.search(A, k=15, mode="exhaustive")]
    assert w == e


def test_sort_change_invalidates_resume(spark, sorted_ctx, tmp_path_factory):
    """Resuming with a DIFFERENT index_sort must rebuild (order-independent
    fingerprints cannot see an order change)."""
    df, d, _s = sorted_ctx
    d2 = str(tmp_path_factory.mktemp("sortedidx2") / "index")
    shutil.rmtree(d2, ignore_errors=True)
    IndexBuilder(spark, d2, num_segments=4, index_sort=("slen",)).build(df)
    # resume with NO sort → full rebuild in default (conv, turn) order
    IndexBuilder(spark, d2, num_segments=4).build(df, resume=True)
    s2 = IndexSearcher(spark, d2)
    assert s2.reader.manifest["index_sort"] == []
    got = [(r[0], r[1]) for r in s2.reader.docs().orderBy("doc_id")
           .select("conv_id", "turn_idx").collect()]
    want = [(r[0], r[1]) for r in df.orderBy("conv_id", "turn_idx")
            .select("conv_id", "turn_idx").collect()]
    assert got == want
