"""PFOR codec: roundtrip properties, tagged-buffer dispatch, and end-to-end
search equality between a pfor-built and a varint-built index (same corpus →
bit-identical hits), plus compression sanity vs varint.

Reference semantics: ``core/codecs/lucene90/PForUtil.java`` (≤7 patched
exceptions, all-equal run token) over 128-int sub-blocks.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.indexing import blocks
from lucene_spark.indexing.pfor import (
    MAX_EXCEPTIONS,
    pack_bits,
    pfor_decode,
    pfor_encode,
    pfor_encode_grouped,
    unpack_bits,
)


@given(st.lists(st.integers(0, 2**62 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_pfor_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert pfor_decode(pfor_encode(arr)).tolist() == vals


@given(st.integers(1, 64), st.lists(st.integers(0, 2**30), min_size=1,
                                    max_size=200))
@settings(max_examples=100, deadline=None)
def test_pack_bits_roundtrip(width, vals):
    arr = (np.array(vals, dtype=np.uint64)
           & ((np.uint64(1) << np.uint64(width)) - np.uint64(1)
              if width < 64 else np.uint64(2**64 - 1)))
    assert unpack_bits(pack_bits(arr, width), arr.size, width).tolist() \
        == arr.tolist()


def test_pfor_all_equal_is_tiny():
    # "all values equal → single byte" analogue: header + one varint
    v = np.full(128, 7, dtype=np.int64)
    assert len(pfor_encode(v)) <= 4


def test_pfor_exceptions_patched():
    # 3 huge outliers among tiny values: packed width stays small
    v = np.full(128, 3, dtype=np.int64)
    v[[5, 77, 127]] = 2**40
    buf = pfor_encode(v)
    assert pfor_decode(buf).tolist() == v.tolist()
    # without patching this block needs 128×41 bits ≈ 656 B; patched ≈
    # 128×2 bits + 3 patches ≈ 60 B
    assert len(buf) < 120


def test_pfor_beats_varint_on_small_gaps():
    rng = np.random.default_rng(7)
    gaps = rng.integers(1, 16, 4096).astype(np.int64)
    assert len(pfor_encode(gaps)) < len(blocks.encode_varints(gaps))


def test_pfor_concatenated_streams_decode():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 100, 130).astype(np.int64)
    b = rng.integers(0, 2**33, 7).astype(np.int64)
    got = pfor_decode(pfor_encode(a) + pfor_encode(b))
    assert got.tolist() == a.tolist() + b.tolist()


def test_pfor_grouped_matches_per_group():
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1000, 500).astype(np.int64)
    starts = np.array([0, 7, 7, 300], dtype=np.int64)  # incl. empty group
    bufs = pfor_encode_grouped(v, starts)
    ends = [7, 7, 300, 500]
    for buf, s, e in zip(bufs, starts.tolist(), ends):
        assert pfor_decode(buf).tolist() == v[s:e].tolist()


def test_max_exceptions_bound():
    # the cost search never patches more than MAX_EXCEPTIONS values
    v = np.arange(128, dtype=np.int64) ** 4  # smoothly growing: many "big"
    buf = pfor_encode(v)
    assert buf[2] <= MAX_EXCEPTIONS
    assert pfor_decode(buf).tolist() == v.tolist()


def test_tagged_block_roundtrip_both_codecs():
    rng = np.random.default_rng(5)
    docs = np.cumsum(rng.integers(1, 9, 300)).astype(np.int64)
    tfs = rng.integers(1, 6, 300).astype(np.int64)
    norms = rng.integers(1, 50, 300).astype(np.int64)
    for codec in (blocks.CODEC_VARINT, blocks.CODEC_PFOR):
        blks = list(blocks.encode_term_blocks(docs, tfs, norms, codec=codec))
        got_d, got_tf = [], []
        for b in blks:
            d, tf, nm = blocks.decode_block(
                b["first_doc"], b["count"], b["doc_gaps"], b["tfs"],
                b["norms"])
            got_d.append(d)
            got_tf.append(tf)
        assert np.concatenate(got_d).tolist() == docs.tolist()
        assert np.concatenate(got_tf).tolist() == tfs.tolist()
        # batch doc-id decode (the broad-match path) agrees too
        d_all, _ = blocks.decode_doc_ids_batch(
            [b["first_doc"] for b in blks], [b["last_doc"] for b in blks],
            [b["count"] for b in blks], [b["doc_gaps"] for b in blks])
        assert d_all.tolist() == docs.tolist()


def test_decode_posting_bufs_mixed_codecs():
    rng = np.random.default_rng(9)
    a = rng.integers(1, 100, 50).astype(np.int64)
    b = rng.integers(1, 100, 50).astype(np.int64)
    bufs = [blocks._encode_one(a, blocks.CODEC_VARINT),
            b"",  # empty buffers stay untagged and decode to nothing
            blocks._encode_one(b, blocks.CODEC_PFOR)]
    got = blocks.decode_posting_bufs(bufs)
    assert got.tolist() == a.tolist() + b.tolist()


def test_unknown_tag_raises():
    with pytest.raises(ValueError):
        blocks.decode_posting_buf(b"\x07\x01\x02")


@pytest.fixture(scope="module")
def pfor_index(spark, tmp_path_factory):
    from lucene_spark.corpus import synthetic_transcripts
    from lucene_spark.indexing.builder import IndexBuilder

    d = str(tmp_path_factory.mktemp("pfor") / "index")
    df = synthetic_transcripts(spark, 80)
    IndexBuilder(spark, d, num_segments=4, postings_codec="pfor").build(df)
    return d


def test_pfor_index_search_equals_varint(spark, index_dir, pfor_index):
    """End-to-end: a pfor-built index returns bit-identical hits to the
    varint-built session index on WAND top-k, phrase, and count paths."""
    from lucene_spark.analysis import StandardAnalyzer
    from lucene_spark.search import ast
    from lucene_spark.search.searcher import IndexSearcher

    an = StandardAnalyzer()
    sv = IndexSearcher(spark, index_dir)
    sp = IndexSearcher(spark, pfor_index)
    for qs in ("table value", "+table +query", '"the table"',
               "tab* -value", "spark OR (table AND value)"):
        q = ast.parse(qs, an)
        hv = sv.search(q, k=25, mode="wand")
        hp = sp.search(q, k=25, mode="wand")
        assert [(h.doc_id, h.score) for h in hv] \
            == [(h.doc_id, h.score) for h in hp], qs
        assert sv.count(q) == sp.count(q), qs


def test_pfor_manifest_and_rebuild_on_codec_change(spark, pfor_index):
    import json

    from lucene_spark.corpus import synthetic_transcripts
    from lucene_spark.indexing.builder import IndexBuilder

    with open(f"{pfor_index}/manifest.json") as f:
        m = json.load(f)
    assert m["postings_codec"] == "pfor"
    assert m["postings_format"] == blocks.POSTINGS_FORMAT
    # resuming with a DIFFERENT codec must rebuild, not reuse segments
    df = synthetic_transcripts(spark, 80)
    res = IndexBuilder(spark, pfor_index, num_segments=4).build(
        df, resume=True)
    with open(f"{pfor_index}/manifest.json") as f:
        m2 = json.load(f)
    assert m2["postings_codec"] == "varint"
    assert res["reused"] == 0
