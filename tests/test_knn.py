"""KnnQuery (KnnFloatVectorQuery analogue): exact/LSH strategies, pre-filter
semantics, and composition as a boolean clause — engine vs numpy brute force.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.corpus import VOCAB
from lucene_spark.goldens import BruteForceIndex
from lucene_spark.pipeline.contracts import EMB_SCALE
from lucene_spark.search import ast
from lucene_spark.search.knn import (
    knn_similarity_f32,
    quantize_query,
    query_band_keys,
)
from lucene_spark.search.searcher import IndexSearcher

DIMS = 32
F32 = np.float32


@pytest.fixture(scope="module")
def vectors_np(corpus_pdf):
    rng = np.random.RandomState(7)
    n = len(corpus_pdf)
    v = rng.uniform(-0.5, 0.5, size=(n, DIMS)).astype(np.float32)
    return v


@pytest.fixture(scope="module")
def knn_searcher(spark, index_dir, vectors_np):
    s = IndexSearcher(spark, index_dir)
    rows = [(i, [float(x) for x in vectors_np[i]])
            for i in range(vectors_np.shape[0])]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    return s.set_vectors(df)


def brute_quantized(vectors_np):
    return np.floor(vectors_np.astype(np.float64) * EMB_SCALE).astype(np.int64)


def brute_topk(vectors_np, qvec, k, allowed=None):
    qv = brute_quantized(vectors_np)
    qq = np.array(quantize_query(qvec), dtype=np.int64)
    dots = qv @ qq
    ids = np.arange(len(dots))
    if allowed is not None:
        keep = np.isin(ids, allowed)
        ids, dots = ids[keep], dots[keep]
    order = np.lexsort((ids, -dots))[:k]
    return [(int(ids[i]), int(dots[i])) for i in order]


def test_knn_exact_vs_brute(knn_searcher, vectors_np):
    qvec = vectors_np[3].tolist()
    got = knn_searcher.knn_search(qvec, k=15)
    assert got == brute_topk(vectors_np, qvec, 15)


def test_knn_lsh_candidates_match_scheme(knn_searcher, vectors_np):
    """LSH strategy returns exactly the top-k among the docs sharing ANY
    band key with the query (recall < 1 documented trade-off)."""
    qvec = vectors_np[5].tolist()
    qq = np.array(quantize_query(qvec), dtype=np.int64)
    keys = query_band_keys(qq.tolist(), bands=2, band_bits=16)
    qv = brute_quantized(vectors_np)
    cand = []
    for i in range(qv.shape[0]):
        vkeys = query_band_keys(qv[i].tolist(), bands=2, band_bits=16)
        if any(a == b for a, b in zip(vkeys, keys)):
            cand.append(i)
    exp = brute_topk(vectors_np, qvec, 10, allowed=np.array(cand))
    got = knn_searcher.knn_search(qvec, k=10, strategy="lsh")
    # engine uses bands=4 default → broader candidates; re-run with bands=2
    from lucene_spark.search.knn import knn_topk_df

    df = knn_topk_df(knn_searcher.vectors, qvec, 10, strategy="lsh",
                     bands=2)
    got2 = [(int(r["doc_id"]), int(r["dot"])) for r in df.collect()]
    assert got2 == exp
    assert len(got) >= len(got2) or got  # 4-band union ⊇ 2-band is not
    # guaranteed per-key, but both must rank by (dot DESC, doc ASC):
    assert got == sorted(got, key=lambda p: (-p[1], p[0]))


def test_knn_prefilter(knn_searcher, vectors_np, corpus_pdf):
    """Pre-filter semantics: k nearest AMONG the filter's matches
    (KnnFloatVectorQuery.java:44), not post-filtered."""
    golden = BruteForceIndex(corpus_pdf)
    t = VOCAB[0]
    allowed = golden.postings[t][0]
    qvec = vectors_np[11].tolist()
    got = knn_searcher.knn_search(qvec, k=12, filter=t)
    assert got == brute_topk(vectors_np, qvec, 12, allowed=allowed)
    assert all(d in set(allowed.tolist()) for d, _ in got)


def test_knn_as_boolean_clause(knn_searcher, vectors_np, corpus_pdf):
    """KnnQuery SHOULD clause inside a BooleanQuery: the k knn docs
    contribute their float32 DOT_PRODUCT-scaled similarity, summed with the
    BM25 term clause (DocAndScoreQuery-as-clause semantics)."""
    golden = BruteForceIndex(corpus_pdf)
    t = VOCAB[1]
    qvec = vectors_np[2].tolist()
    kq = ast.KnnQuery(tuple(qvec), k=25)
    q = ast.BooleanQuery(((ast.SHOULD, ast.TermQuery(t)), (ast.SHOULD, kq)))
    hits = knn_searcher.search(q, k=300)

    ok, term_sc = golden._bool_eval(
        ast.BooleanQuery(((ast.SHOULD, ast.TermQuery(t)),)))
    knn_pairs = brute_topk(vectors_np, qvec, 25)
    exp = {}
    for d in np.flatnonzero(ok):
        exp[int(d)] = np.float64(term_sc[d])
    for d, dot in knn_pairs:
        exp[d] = exp.get(d, np.float64(0)) + np.float64(
            knn_similarity_f32(dot))
    exp_list = sorted(
        ((d, float(F32(s))) for d, s in exp.items()),
        key=lambda p: (-np.float64(F32(p[1])), p[0]),
    )[:300]
    got = [(h.doc_id, h.score) for h in hits]
    assert got == exp_list

    # MUST knn clause: only the k knn docs can match at all
    q2 = ast.BooleanQuery(((ast.MUST, kq), (ast.SHOULD, ast.TermQuery(t))))
    hits2 = knn_searcher.search(q2, k=50)
    knn_docs = {d for d, _ in knn_pairs}
    assert hits2 and all(h.doc_id in knn_docs for h in hits2)


def test_knn_standalone_query_node(knn_searcher, vectors_np):
    """search(KnnQuery) standalone: scores = DOT_PRODUCT-scaled float32."""
    qvec = vectors_np[8].tolist()
    hits = knn_searcher.search(ast.KnnQuery(tuple(qvec), k=9), k=9)
    exp = [(d, float(knn_similarity_f32(dot)))
           for d, dot in brute_topk(vectors_np, qvec, 9)]
    exp.sort(key=lambda p: (-np.float64(p[1]), p[0]))
    assert [(h.doc_id, h.score) for h in hits] == exp


def test_knn_boolean_hits_in_termless_segments(spark, tmp_path, vectors_np):
    """A KNN SHOULD/MUST clause must surface hits living in segments that
    contain NONE of the boolean's terms (those segments get no postings
    task — the docset complement path must cover them), and a boolean whose
    clauses are ALL KnnQuery must run at all."""
    import pandas as pd

    from lucene_spark.indexing.builder import IndexBuilder
    from lucene_spark.search.knn import knn_similarity_f32

    # 40 conversations of 1 turn each; the term 'zzrare' occurs ONLY in the
    # first 4 docs, which land in segment 0 of 4 — segments 1-3 are
    # termless for this query
    n = 40
    pdf = pd.DataFrame({
        "conv_id": [f"conv{i:08d}" for i in range(n)],
        "turn_idx": [0] * n,
        "role": ["user"] * n,
        "text": [("zzrare filler words here" if i < 4
                  else "filler words here") for i in range(n)],
        "tool": [""] * n,
        "ts": pd.Timestamp("2024-01-01"),
    })
    d = str(tmp_path / "knn_seg_idx")
    IndexBuilder(spark, d, num_segments=4).build(spark.createDataFrame(pdf))
    s = IndexSearcher(spark, d)
    rows = [(i, [float(x) for x in vectors_np[i]]) for i in range(n)]
    s.set_vectors(spark.createDataFrame(
        rows, "doc_id long, embedding array<float>"))

    qvec = vectors_np[30].tolist()  # nearest doc (itself) is in segment 3
    kq = ast.KnnQuery(tuple(qvec), k=10)
    knn_pairs = brute_topk(vectors_np[:n], qvec, 10)
    assert any(dd >= 10 for dd, _ in knn_pairs)  # hits beyond segment 0

    q = ast.BooleanQuery(((ast.SHOULD, ast.TermQuery("zzrare")),
                          (ast.SHOULD, kq)))
    got = {h.doc_id: h.score for h in s.search(q, k=n)}
    for dd, dot in knn_pairs:
        assert dd in got, f"knn hit {dd} dropped (termless segment)"
    # docs 0-3 match via the term; knn-only docs score exactly the knn sim
    for dd, dot in knn_pairs:
        if dd >= 4:
            assert got[dd] == float(knn_similarity_f32(dot))
    assert s.count(q) == len(set(range(4)) | {dd for dd, _ in knn_pairs})

    # all-docset boolean: no terms at all
    q2 = ast.BooleanQuery(((ast.MUST, kq),))
    got2 = [(h.doc_id, h.score) for h in s.search(q2, k=n)]
    exp2 = sorted(
        ((dd, float(F32(knn_similarity_f32(dot)))) for dd, dot in knn_pairs),
        key=lambda p: (-np.float64(p[1]), p[0]),
    )
    assert got2 == exp2
    assert s.count(q2) == len(knn_pairs)


def test_knn_lsh_small_dim(spark):
    """LSH strategy with vector dim < band_bits must not index past the
    array end (ANSI element_at throws) — the band shrinks to the dim."""
    from lucene_spark.search.knn import knn_topk_df

    rng = np.random.RandomState(3)
    v = rng.uniform(-0.5, 0.5, size=(30, 8)).astype(np.float32)
    rows = [(i, [float(x) for x in v[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, embedding array<float>")
    out = knn_topk_df(df, v[4].tolist(), 5, strategy="lsh").collect()
    assert out and out[0]["doc_id"] == 4  # self is its own nearest bucket


def test_explain_nested_and_knn_clauses(spark, tmp_path, vectors_np):
    """explain() must handle nested-boolean and KNN (docset) clauses — the
    clause breakdown recurses and the f32 total equals the search score."""
    from lucene_spark.corpus import VOCAB, synthetic_transcripts
    from lucene_spark.indexing.builder import IndexBuilder

    d = str(tmp_path / "exp_idx")
    IndexBuilder(spark, d, num_segments=2).build(
        synthetic_transcripts(spark, 30))
    s = IndexSearcher(spark, d)
    n = s.reader.doc_count
    rows = [(i, [float(x) for x in vectors_np[i % len(vectors_np)]])
            for i in range(n)]
    s.set_vectors(spark.createDataFrame(
        rows, "doc_id long, embedding array<float>"))

    nested = ast.BooleanQuery((
        (ast.MUST, ast.TermQuery(VOCAB[0])),
        (ast.SHOULD, ast.BooleanQuery((  # MUST-conj inside SHOULD: no flatten
            (ast.MUST, ast.TermQuery(VOCAB[3])),
            (ast.MUST, ast.TermQuery(VOCAB[5])),
        ))),
        (ast.SHOULD, ast.KnnQuery(tuple(vectors_np[2].tolist()), k=8)),
    ))
    hits = s.search(nested, 10)
    assert hits
    ex = s.explain(nested, hits[0].doc_id)
    assert ex["match"] is True
    assert ex["total"] == hits[0].score
    kinds = {c["kind"] for c in ex["clauses"]}
    assert "nested" in kinds and "docset" in kinds
    nested_entry = next(c for c in ex["clauses"] if c["kind"] == "nested")
    assert nested_entry["clauses"]  # recursive breakdown present
    # non-matching doc explains as no-match
    miss = next(i for i in range(n)
                if i not in {h.doc_id for h in s.search(nested, n)})
    assert s.explain(nested, miss)["match"] is False


def test_ivf_topk_tiny_corpus(spark):
    """ivf_topk with fewer vectors than n_centroids must not crash
    (train_ivf returns fewer centroids than requested)."""
    from lucene_spark.pipeline.simsearch import ivf_topk

    rng = np.random.RandomState(5)
    v = rng.uniform(-0.5, 0.5, size=(10, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in v[i]]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivf_topk(emb, n_queries=2, k=3, n_centroids=16, nprobe=4).collect()
    assert out  # produced candidates without shape errors


def test_hybrid_rrf_vs_brute(knn_searcher, vectors_np, corpus_pdf):
    """hybrid_rrf_df == brute RRF over the independently-computed BM25 and
    KNN rankings (rrf = sum over lists of 1/(60+rank))."""
    qvec = vectors_np[5].tolist()
    q = " ".join(VOCAB[:2])  # terms guaranteed present in the synthetic corpus
    n_each, k = 20, 10
    got = {r["doc_id"]: r["rrf"]
           for r in knn_searcher.hybrid_rrf_df(q, qvec, k=k,
                                               n_each=n_each).collect()}

    bm_rank = {h.doc_id: i + 1
               for i, h in enumerate(knn_searcher.search(q, k=n_each))}
    kn_rank = {d: i + 1
               for i, (d, _) in enumerate(brute_topk(vectors_np, qvec,
                                                     n_each))}
    rrf = {}
    for src_, ranks in (("bm", bm_rank), ("kn", kn_rank)):
        for d, r in ranks.items():
            rrf[d] = rrf.get(d, 0.0) + 1.0 / (60 + r)
    exp = sorted(rrf.items(), key=lambda t: (-t[1], t[0]))[:k]
    assert got == dict(exp)
    # fused list must actually mix both sources when they disagree
    assert set(got) & set(bm_rank) and set(got) & set(kn_rank)


def test_hnsw_graph_recall_determinism_roundtrip():
    """Pure-graph invariants: recall@10 >= 0.9 on 600 random vectors at
    ef=64, identical rebuilds, serialization round-trip, level
    distribution decays geometrically."""
    import numpy as np

    from lucene_spark.search.hnsw import (
        SegmentHnsw,
        graph_from_rows,
        graph_search,
        node_levels,
    )

    n, k, ef = 600, 10, 64
    rng = np.random.RandomState(7)
    V = rng.randint(-50, 50, size=(n, 32)).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    lv = node_levels(ids)
    hist = np.bincount(lv)
    assert hist[0] > hist[1] > hist[2]  # geometric level decay
    g = SegmentHnsw(V, lv)
    recalls = []
    for qi in range(10):
        got = [x for _, x in g.search(V[qi], k + 1, ef) if x != qi][:k]
        sims = V @ V[qi]
        exact = [int(x) for x in np.lexsort((ids, -sims)) if x != qi][:k]
        recalls.append(len(set(got) & set(exact)) / k)
    assert min(recalls) >= 0.8 and sum(recalls) / len(recalls) >= 0.95
    # deterministic rebuild
    g2 = SegmentHnsw(V, lv)
    assert g.search(V[3], 10) == g2.search(V[3], 10)
    # parquet-row round trip
    rows = g.to_rows(0, ids)
    adj, entry, top = graph_from_rows(rows, {int(i): int(i) for i in ids})
    assert g.search(V[5], 10) == graph_search(V, adj, entry, top, V[5], 10)
    # empty graph
    g0 = SegmentHnsw(V[:0], lv[:0])
    assert g0.search(V[0], 5) == []


def test_hnsw_spark_end_to_end(spark, tmp_path):
    """build_hnsw + hnsw_topk over the sf0.001 embeddings: deterministic
    across runs and (at this scale / ef=64) identical to brute force —
    the driver gate's contract."""
    from lucene_spark.pipeline.simsearch import brute_topk, build_hnsw, hnsw_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = str(tmp_path / "hnsw")
    build_hnsw(emb, d)
    got = hnsw_topk(spark, emb, d).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    exact = brute_topk(emb).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got.equals(exact)
    got2 = hnsw_topk(spark, emb, d).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got2.equals(got)


def test_knn_strategy_hnsw_in_searcher(spark, index_dir, tmp_path):
    """KnnQuery strategy='hnsw' through the searcher surface: equals the
    exact strategy at this scale; filtered HNSW raises the documented
    NotImplementedError; missing graph dir raises clearly."""
    import pytest

    from lucene_spark.pipeline.simsearch import build_hnsw
    from lucene_spark.search.searcher import IndexSearcher

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = emb.selectExpr("vec_id as doc_id", "embedding")
    hd = str(tmp_path / "hnswknn")
    build_hnsw(emb, hd)
    s = IndexSearcher(spark, index_dir).set_vectors(vecs, hnsw_dir=hd)
    qv = emb.filter("vec_id = 3").first()["embedding"]
    assert s.knn_search(qv, 10, strategy="hnsw") == \
        s.knn_search(qv, 10, strategy="exact")
    with pytest.raises(NotImplementedError, match="filtered"):
        s.knn_search(qv, 5, filter="anything", strategy="hnsw")
    s2 = IndexSearcher(spark, index_dir).set_vectors(vecs)
    with pytest.raises(ValueError, match="hnsw"):
        s2.knn_search(qv, 5, strategy="hnsw")


def test_euclidean_cosine_topk(spark):
    """VectorSimilarityFunction EUCLIDEAN/COSINE variants: ranking sanity
    vs numpy recomputation on the sf0.001 embeddings."""
    import numpy as np

    from lucene_spark.pipeline.simsearch import cosine_topk, euclidean_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = emb.toPandas().sort_values("vec_id")
    V = np.floor(np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                 * 1000.0).astype(np.int64)
    ids = pdf["vec_id"].to_numpy()

    got_e = euclidean_topk(emb, n_queries=2, k=5).toPandas()
    got_c = cosine_topk(emb, n_queries=2, k=5).toPandas()
    for qid in (0, 1):
        qv = V[ids == qid][0]
        d2 = ((V - qv) ** 2).sum(axis=1)
        d2[ids == qid] = 2**62
        exp = ids[np.lexsort((ids, d2))][:5].tolist()
        assert got_e[got_e.query_id == qid].sort_values("rank")[
            "neighbor_id"].tolist() == exp
        cos = (V @ qv) / np.sqrt((V * V).sum(axis=1)) / np.sqrt(qv @ qv)
        cos[ids == qid] = -2.0
        expc = ids[np.lexsort((ids, -cos))][:5].tolist()
        assert got_c[got_c.query_id == qid].sort_values("rank")[
            "neighbor_id"].tolist() == expc
    assert got_c["cos"].between(-1.0000001, 1.0000001).all()


def test_hnsw_meta_and_segment_mismatch(spark, tmp_path):
    """The search side reads num_segments from _hnsw_meta.json — a build
    with a gappy id space (no id ≡ 3 mod 4 → segment 3 empty) must still
    search correctly (r4 review finding: max(seg)+1 inference broke
    this)."""
    from pyspark.sql import functions as F

    from lucene_spark.pipeline.simsearch import (
        _hnsw_num_segments,
        build_hnsw,
        hnsw_topk,
    )

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .filter(F.col("vec_id") % 4 != 3))
    d = str(tmp_path / "gappy")
    build_hnsw(emb, d, num_segments=4)
    assert _hnsw_num_segments(d) == 4
    got = hnsw_topk(spark, emb, d).toPandas()
    assert len(got) > 0
    assert (got["neighbor_id"] % 4 != 3).all()


def test_hnsw_single_quantizes_like_exact(spark, index_dir, tmp_path):
    """strategy='hnsw' must quantize the query through the float32
    contract (knn.quantize_query) — boundary values like 1.998 diverge
    under a float64 shortcut (r4 review finding)."""
    from lucene_spark.pipeline.simsearch import build_hnsw
    from lucene_spark.search.searcher import IndexSearcher

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = emb.selectExpr("vec_id as doc_id", "embedding")
    hd = str(tmp_path / "qz")
    build_hnsw(emb, hd)
    s = IndexSearcher(spark, index_dir).set_vectors(vecs, hnsw_dir=hd)
    dim = len(emb.first()["embedding"])
    qv = [1.998] * dim  # floors differently under float64 vs float32
    assert s.knn_search(qv, 10, strategy="hnsw") == \
        s.knn_search(qv, 10, strategy="exact")
