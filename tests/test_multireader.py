"""MultiIndexSearcher: two half-corpus indexes searched as one composite
must reproduce the single merged index bit-for-bit (combined collection
statistics + docBase mapping — ``core/index/MultiReader.java``,
``IndexSearcher.termStatistics`` over a composite)."""

import shutil

import pytest

from lucene_spark.corpus import VOCAB, synthetic_transcripts_pdf
from lucene_spark.indexing.builder import IndexBuilder
from lucene_spark.search.multireader import MultiIndexSearcher
from lucene_spark.search.searcher import IndexSearcher

A, B, C = VOCAB[0], VOCAB[3], VOCAB[7]


@pytest.fixture(scope="module")
def pair(spark, tmp_path_factory):
    """(single-index searcher, multi searcher over a prefix split)."""
    rows = synthetic_transcripts_pdf(60).sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    half = len(rows) // 2
    root = tmp_path_factory.mktemp("mr")
    dirs = []
    for name, part in [("a", rows.iloc[:half]), ("b", rows.iloc[half:])]:
        d = str(root / name)
        shutil.rmtree(d, ignore_errors=True)
        IndexBuilder(spark, d, num_segments=3).build(
            spark.createDataFrame(part))
        dirs.append(d)
    full = str(root / "full")
    IndexBuilder(spark, full, num_segments=6).build(
        spark.createDataFrame(rows))
    return IndexSearcher(spark, full), MultiIndexSearcher(spark, dirs), half


@pytest.mark.parametrize("qstr", [
    "{A}",
    "{A} {B} {C}",
    "+{A} {B} -{C}",
    '"{A} {B}"',
    "({A} AND {B}) OR ({C} AND {A})",
])
def test_multi_equals_single(pair, qstr):
    single, multi, _ = pair
    q = qstr.format(A=A, B=B, C=C)
    hs = [(h.doc_id, h.score) for h in single.search(q, k=25)]
    hm = [(h.doc_id, h.score) for h in multi.search(q, k=25)]
    assert hm == hs  # bit-exact scores AND global docIDs


def test_count_and_absent_and_document(pair):
    single, multi, half = pair
    q = f"+{A} +{B}"
    assert multi.count(q) == single.count(q)
    assert multi.search("zzqqabsent", k=5) == []
    assert multi.count("zzqqabsent") == 0
    # stored-fields lookup re-bases to the global docID (the internal
    # `seg` metadata differs by construction — segment layouts are
    # independent per sub-index)
    want = {k: v for k, v in single.reader.document(half + 3).items()
            if k != "seg"}
    got = {k: v for k, v in multi.document(half + 3).items() if k != "seg"}
    assert got == want
    assert multi.document(multi.doc_count + 5) is None


def test_stats_are_combined_not_per_index(pair):
    """The idf must come from the UNION corpus: per-sub-index scores for
    the same doc must NOT equal the composite's when dfs differ between
    halves (they do for Zipf terms)."""
    single, multi, _ = pair
    sub = multi.searchers[0]
    q = multi.parse(A)
    top_multi = multi.search(q, k=1)[0]
    # the same local doc scored by the sub-searcher alone (its own stats)
    local = sub.search(q, k=25)
    by_id = {h.doc_id: h.score for h in local}
    if top_multi.doc_id in by_id:  # doc lives in the first half
        assert by_id[top_multi.doc_id] != top_multi.score