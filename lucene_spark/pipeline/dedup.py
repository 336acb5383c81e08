"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding near-dup.

All plans are pure DataFrame compositions (JVM-side, Catalyst-optimized; no
Python UDFs) and follow the deterministic contracts in ``contracts.py`` so the
DuckDB oracles in ``oracles.py`` reproduce them exactly.

Scale design (10^9-doc corpora):
- every groupBy is two-stage (Spark partial aggregation) on uniformly
  distributed keys (md5-derived), so no skew salting is needed;
- LSH candidate generation joins on band buckets — bucket sizes are bounded by
  near-dup cluster sizes, not corpus size; the pathological giant-bucket case
  (mass-duplicated boilerplate) is handled by ``max_bucket`` pruning, the
  standard production guard;
- exact-verification joins run only over candidate pairs (≪ n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.pipeline.contracts import (
    LSH_BANDS,
    MINHASH_PERMS,
    ROWS_PER_BAND,
    doc_shingles,
    doc_tokens,
    tokens_col,
)


# ------------------------------------------------------------- URL-level ----

def extract_urls(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, url) exploded — one row per URL occurrence, JVM-side
    (``regexp_extract_all`` in codegen; the pattern is the URL alternative
    of the UAX29URLEmailTokenizer-lite chain, shared with the oracle)."""
    from lucene_spark.analysis import URL_PATTERN

    # pattern passed as a literal Column, NOT interpolated into an F.expr SQL
    # string — the SQL parser processes backslash escapes in string literals,
    # so the '\.' in the host grammar would silently become '.' (any char)
    return docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(
            F.lower(F.coalesce(F.col(text_col), F.lit(""))),
            F.lit(URL_PATTERN), F.lit(0))).alias("url"),
    )


def canonical_url(col):
    """Canonicalization: strip the #fragment and trailing slashes — the
    C4-style URL key (scheme/host already lowercased by extraction)."""
    return F.regexp_replace(F.regexp_replace(col, "#.*$", ""), "/+$", "")


def url_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(url, n_docs, canonical_doc) — URL-level dedup groups: documents
    sharing a canonical URL collapse to one group keyed by the smallest
    docID (the C4/web-pipeline pre-dedup on source URL). Two-stage hash agg
    on the canonical-URL key; no skew (URL keys are near-unique, and a
    boilerplate URL shared by millions of docs still reduces map-side)."""
    urls = (extract_urls(docs, text_col)
            .select("doc_id", canonical_url(F.col("url")).alias("url"))
            .distinct())
    return urls.groupBy("url").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("canonical_doc"),
    )


# ---------------------------------------------------------------- exact -----

def exact_dedup(docs: DataFrame) -> DataFrame:
    """(doc_id, canonical_id, group_size) — exact dedup on normalized text.

    Hash-groupBy on md5 of the token-normalized text; canonical = min doc_id.
    """
    d = docs.select(
        "doc_id", F.md5(F.concat_ws(" ", tokens_col())).alias("h")
    )
    grp = d.groupBy("h").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        d.join(grp, "h")
        .select("doc_id", "canonical_id", "group_size")
    )


# ------------------------------------------------------------- minhash ------

def minhash_signatures(docs: DataFrame, perms: int = MINHASH_PERMS) -> DataFrame:
    """(doc_id, sig: array<string>) — P-permutation MinHash over 3-shingles.

    Permutation p's hash of shingle s is ``md5(p || ':' || s)``; the signature
    entry is the lexicographic min — an order-preserving stand-in for integer
    minhash that both engines compute identically.
    """
    sh = doc_shingles(docs)
    hashed = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(perms - 1))).alias("p"),
        F.col("sh"),
    ).select(
        "doc_id", "p",
        F.md5(F.concat(F.col("p").cast("string"), F.lit(":"), F.col("sh"))).alias("h"),
    )
    mins = hashed.groupBy("doc_id", "p").agg(F.min("h").alias("mh"))
    return mins.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "mh"))), lambda s: s["mh"]
        ).alias("sig")
    )


def lsh_bands(sigs: DataFrame, bands: int = LSH_BANDS,
              rows: int = ROWS_PER_BAND) -> DataFrame:
    """(doc_id, band, key) — md5 band keys over signature slices."""
    return sigs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        F.col("sig"),
    ).select(
        "doc_id", "band",
        F.md5(F.concat_ws("|", F.slice(F.col("sig"), F.col("band") * rows + 1, rows))).alias("key"),
    )


def candidate_pairs(band_df: DataFrame, max_bucket: int = 64) -> DataFrame:
    """Distinct (a, b) with a < b sharing ≥1 LSH bucket.

    ``max_bucket`` prunes degenerate giant buckets (boilerplate floods) before
    the self-join — the O(bucket²) pair blow-up guard.
    """
    sized = band_df.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
    ).filter(F.col("bsz") <= max_bucket)
    l = sized.select("band", "key", F.col("doc_id").alias("a"))
    r = sized.select("band", "key", F.col("doc_id").alias("b"))
    return (
        l.join(r, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def verified_jaccard(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """(a, b, inter, uni, jaccard) — exact 3-shingle Jaccard per pair.

    jaccard = inter / uni as an exact ratio of ints widened to double.
    """
    sh = doc_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sh_a = sh.select(F.col("doc_id").alias("a"), "sh")
    sh_b = sh.select(F.col("doc_id").alias("b"), "sh")
    inter = (
        pairs.join(sh_a, "a").join(sh_b, ["b", "sh"])
        .groupBy("a", "b").agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(inter, ["a", "b"], "left")
        .na.fill({"inter": 0})
        .join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a", "b", "inter",
            (F.col("na") + F.col("nb") - F.col("inter")).alias("uni"),
        )
        .withColumn(
            "jaccard", F.col("inter").cast("double") / F.col("uni").cast("double")
        )
    )


def minhash_dedup_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Full MinHash+LSH pipeline: shingle → minhash → band → candidate →
    exact-verify; keeps pairs with Jaccard ≥ threshold."""
    pairs = candidate_pairs(lsh_bands(minhash_signatures(docs)))
    return verified_jaccard(docs, pairs).filter(F.col("jaccard") >= threshold)


# ------------------------------------------------------------- simhash ------

def _hexdigit(ch):
    # hex char → 0..15 (== strpos('0123456789abcdef', ch) - 1 in the oracle)
    return F.conv(ch, 16, 10).cast("long")


def simhash64(docs: DataFrame) -> DataFrame:
    """(doc_id, b0..b3) — 64-bit tf-weighted SimHash as 4×16-bit band ints.

    Token hash bits come from the first 16 hex chars of md5(token); bit
    position q of hex digit d is ``(d >> q) & 1``. Each bit accumulates
    Σ tf·(2·bit−1); the SimHash bit is 1 iff the sum is positive. Bands are
    16-bit ints → equality-joinable for Hamming LSH.
    """
    tf = (
        doc_tokens(docs)
        .select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", F.md5(F.col("tok")))
    )
    # per (doc, hexpos 1..16, bit 0..3): weighted contribution
    bits = (
        tf.select(
            "doc_id", "tf", "h",
            F.explode(F.sequence(F.lit(1), F.lit(16))).alias("pos"),
        )
        .withColumn("d", _hexdigit(F.col("h").substr(F.col("pos"), F.lit(1))))
        .select(
            "doc_id", "tf", "pos", "d",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("q"),
        )
        .withColumn("bit", F.floor(F.col("d") / F.pow(F.lit(2), F.col("q"))).cast("long") % 2)
        .withColumn("bitpos", (F.col("pos") - 1) * 4 + F.col("q"))
        .groupBy("doc_id", "bitpos")
        .agg(F.sum(F.col("tf") * (F.col("bit") * 2 - 1)).alias("w"))
        .withColumn("sbit", (F.col("w") > 0).cast("long"))
    )
    return (
        bits.withColumn("band", F.floor(F.col("bitpos") / 16).cast("int"))
        .withColumn("off", F.col("bitpos") % 16)
        .groupBy("doc_id")
        .pivot("band", [0, 1, 2, 3])
        .agg(F.sum(F.col("sbit") * F.pow(F.lit(2), F.col("off")).cast("long")))
        .select(
            "doc_id",
            F.col("0").alias("b0"), F.col("1").alias("b1"),
            F.col("2").alias("b2"), F.col("3").alias("b3"),
        )
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 8,
                  max_bucket: int = 64) -> DataFrame:
    """(a, b, hamming) — banded SimHash near-dup join.

    Candidates share ≥1 identical 16-bit band (finds all pairs with ≤3
    differing bits, plus most up to max_hamming); Hamming distance is
    bit_count(xor) summed over bands. ``max_bucket`` prunes degenerate
    giant buckets before the self-join — without it a boilerplate-heavy
    corpus (16-bit bands over 10^9 docs) goes ~n²/2^15 quadratic.
    """
    sh = simhash64(docs)
    bands = sh.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), F.col("b0").alias("v")),
                F.struct(F.lit(1).alias("band"), F.col("b1").alias("v")),
                F.struct(F.lit(2).alias("band"), F.col("b2").alias("v")),
                F.struct(F.lit(3).alias("band"), F.col("b3").alias("v")),
            )
        ).alias("bv"),
    ).select("doc_id", F.col("bv.band").alias("band"), F.col("bv.v").alias("v"))
    sized = bands.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "v"))
    ).filter(F.col("bsz") <= max_bucket)
    cand = (
        sized.alias("x")
        .join(sized.alias("y"), ["band", "v"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("a"), *[F.col(c).alias(f"{c}a") for c in ["b0", "b1", "b2", "b3"]])
    sb = sh.select(F.col("doc_id").alias("b"), *[F.col(c).alias(f"{c}b") for c in ["b0", "b1", "b2", "b3"]])
    ham = sum(
        F.bit_count(F.col(f"b{i}a").bitwiseXOR(F.col(f"b{i}b"))) for i in range(4)
    )
    return (
        cand.join(sa, "a").join(sb, "b")
        .select("a", "b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


# ------------------------------------------------- n-gram jaccard (all) -----

def ngram_jaccard_topk(docs: DataFrame, k: int = 50, max_df: int = 100) -> DataFrame:
    """Top-k most similar pairs by exact 3-shingle Jaccard.

    Candidate pairs come from an inverted shingle→docs self-join with rare
    shingles only (df ≤ max_df — hot boilerplate shingles generate quadratic
    pairs while identifying nothing); the Jaccard then recomputed EXACTLY over
    the full shingle sets of each candidate pair.
    """
    sh = doc_shingles(docs)
    rare = (
        sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("sh")))
        .filter(F.col("df") <= max_df)
        .select("doc_id", "sh")
    )
    pairs = (
        rare.select(F.col("doc_id").alias("a"), "sh")
        .join(rare.select(F.col("doc_id").alias("b"), "sh"), "sh")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    vj = verified_jaccard(docs, pairs)
    return vj.orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b")).limit(k)


# --------------------------------------------------- embedding near-dup -----

def embedding_neardup_pairs(qemb: DataFrame, t_num: int = 361,
                            t_den: int = 400, bands: int = 4,
                            band_bits: int = 16,
                            max_bucket: int = 64) -> DataFrame:
    """(a, b, dot) — pairs with cosine ≥ sqrt(t_num/t_den), integer-exact.

    Input: quantized embeddings (vec_id, q array<long>). cos ≥ t (with
    dot ≥ 0) ⟺ t_den·dot² ≥ t_num·|a|²·|b|² — all int64 (components ≤ ~1e3,
    dims 64 → dot ≤ ~6.4e7, dot² ≤ 4.1e15 < 2^63). Default t² = 361/400 →
    t = 0.95.

    Candidate generation is a BANDED hyperplane LSH: ``bands`` keys per
    vector, each the 16-bit sign pattern of one 16-dim slice (64 bits of
    hyperplane signature total — not the 8-bit/256-bucket scheme that goes
    O(n²/256) at corpus scale); a near-dup pair collides when ANY band
    matches. ``max_bucket`` prunes degenerate buckets (zero/constant
    vectors) before the self-join.
    """
    b = qemb.select(
        "vec_id", "q",
        F.aggregate("q", F.lit(0).cast("long"), lambda a2, x: a2 + x * x).alias("n2"),
    )
    bandrows = b.select(
        "vec_id", "q",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
    ).select(
        "vec_id", "band",
        F.aggregate(
            F.sequence(F.lit(1), F.lit(band_bits)),
            F.lit(0).cast("long"),
            lambda acc, j: acc + F.when(
                F.element_at(
                    F.col("q"),
                    (F.col("band") * band_bits + j).cast("int"),
                ) >= 0,
                F.pow(F.lit(2), j - 1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        ).alias("key"),
    )
    sized = bandrows.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
    ).filter(F.col("bsz") <= max_bucket)
    pairs = (
        sized.select("band", "key", F.col("vec_id").alias("a"))
        .join(sized.select("band", "key", F.col("vec_id").alias("b")),
              ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .join(b.select(F.col("vec_id").alias("a"), F.col("q").alias("qa"),
                       F.col("n2").alias("na")), "a")
        .join(b.select(F.col("vec_id").alias("b"), F.col("q").alias("qb"),
                       F.col("n2").alias("nb")), "b")
    )
    dotted = pairs.withColumn(
        "dot",
        F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ),
    )
    return dotted.filter(
        # zero vectors have undefined cosine and would trivially satisfy
        # the cross-multiplied inequality (0 >= 0) — require both norms > 0
        (F.col("na") > 0) & (F.col("nb") > 0)
        & (F.col("dot") >= 0)
        & (F.lit(t_den) * F.col("dot") * F.col("dot")
           >= F.lit(t_num) * F.col("na") * F.col("nb"))
    ).select("a", "b", "dot")


# ------------------------------------------------------------- clusters -----

def neardup_clusters(docs: DataFrame, threshold: float = 0.5,
                     max_rounds: int = 20) -> DataFrame:
    """(doc_id, cluster_id) — connected components over the near-dup pair
    graph, cluster_id = min doc_id in the component (the canonical doc).

    A real pipeline dedupes CLUSTERS, not pairs: `a~b` and `b~c` must
    canonicalize a, b, c together even when `a~c` was never a candidate
    pair. Algorithm: iterative min-label propagation — each round every
    node takes the min label among itself and its neighbors (one join + one
    groupBy), converging in ≤ diameter rounds with an early-exit fixpoint
    check. Near-dup components are small and shallow (boilerplate clusters
    are star-shaped), so rounds stay in the low single digits at any corpus
    size; each round is shuffle-bounded by |edges|. ``localCheckpoint``
    truncates the iterative lineage. (The O(log n)-round large-star/
    small-star variant is the drop-in upgrade if ever needed.)
    """
    pairs = minhash_dedup_pairs(docs, threshold).select("a", "b")
    edges = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    changed = -1
    for _ in range(max_rounds):
        nbr = (
            edges.join(
                labels.select(F.col("doc_id").alias("a"), "cluster_id"), "a")
            .select(F.col("b").alias("doc_id"), "cluster_id")
        )
        new = (
            labels.union(nbr)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    if changed != 0:
        # silently returning a split component would KEEP duplicates
        # downstream — a component whose diameter exceeds max_rounds must
        # be surfaced, not papered over
        raise RuntimeError(
            f"neardup_clusters did not converge in {max_rounds} rounds "
            f"({changed} labels still changing) — raise max_rounds (a "
            f"component's diameter exceeds it)")
    return labels


# ----------------------------------------------------------- incremental ----

def incremental_dedup(corpus: DataFrame, batch: DataFrame,
                      threshold: float = 0.5,
                      max_bucket: int = 64) -> DataFrame:
    """(doc_id, dup_of, jaccard) — for each NEW-batch doc, its canonical
    near-dup in the EXISTING corpus (min corpus doc_id among verified
    matches), if any.

    Probe-shaped (the steady-state ingestion pattern): both sides are
    banded, but the candidate join only crosses batch rows with corpus rows
    — no batch×batch or corpus×corpus pairs are generated, so incremental
    cost is O(|batch| × bucket hit rate), not a corpus rebuild. Bucket-size
    pruning counts over the UNION (identical guard semantics to the full
    ``candidate_pairs`` pipeline, so results match re-running from scratch).
    """
    all_docs = corpus.unionByName(batch)
    bands = lsh_bands(minhash_signatures(corpus)).withColumn(
        "side", F.lit(0)
    ).unionByName(
        lsh_bands(minhash_signatures(batch)).withColumn("side", F.lit(1))
    )
    sized = bands.withColumn(
        "bsz", F.count(F.lit(1)).over(Window.partitionBy("band", "key"))
    ).filter(F.col("bsz") <= max_bucket)
    probe = sized.filter(F.col("side") == 1).select(
        "band", "key", F.col("doc_id").alias("a"))
    base = sized.filter(F.col("side") == 0).select(
        "band", "key", F.col("doc_id").alias("b"))
    pairs = (
        probe.join(base, ["band", "key"])
        .select("a", "b")
        .distinct()
    )
    hits = verified_jaccard(all_docs, pairs).filter(
        F.col("jaccard") >= threshold)
    best = hits.groupBy("a").agg(F.min("b").alias("dup_of"))
    h = hits.select(F.col("a").alias("ha"), F.col("b").alias("hb"), "jaccard")
    return (
        best.join(h, (best["a"] == h["ha"]) & (best["dup_of"] == h["hb"]))
        .select(F.col("a").alias("doc_id"), "dup_of", "jaccard")
    )
