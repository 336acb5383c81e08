"""Shared deterministic contracts for the training-data pipeline operators.

Every operator in ``lucene_spark.pipeline`` is defined twice — once as a Spark
DataFrame plan (JVM built-ins, Catalyst-optimizable) and once as DuckDB oracle
SQL (``oracles.py``) — over the SAME arithmetic contract, so the driver's
value-hash gate passes exactly:

- tokenization: ``regexp_extract_all(lower(text), '[a-z0-9]+')``;
- shingles: ``SHINGLE_K``-gram of tokens joined with a single space;
- hashing: **md5 hex strings** (identical in Spark and DuckDB) — minhash is the
  lexicographic min of ``md5(perm || ':' || shingle)``; LSH band keys are md5
  of '|'-joined signature slices;
- all similarity arithmetic is integer (quantized embeddings, counts) or an
  exact ratio of integers widened to double — never accumulated floats, so no
  cross-engine ulp drift.

Scale notes (100 TB): the md5-based permutation hashing is chosen for oracle
parity; it is also the production-sane choice — all ops below stay JVM-side
(whole-stage codegen, no Python), aggregations are two-stage (partial map-side
combine), and the only wide shuffles key on (doc, perm) / band buckets, both
uniformly distributed by construction (md5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOK_RE = "[a-z0-9]+"
SHINGLE_K = 3
MINHASH_PERMS = 16   # P = BANDS * ROWS_PER_BAND
LSH_BANDS = 4
ROWS_PER_BAND = 4
AUG_OFFSET = 1_000_000  # doc_id offset of the synthetic near-dup twins
EMB_SCALE = 1000        # embedding quantization: floor(double(x) * 1000)


def tokens_col(text_col="text"):
    return F.regexp_extract_all(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                                F.lit(TOK_RE), F.lit(0))


def shingles_col(tokens, k: int = SHINGLE_K):
    """k-gram shingle array from a token-array column (empty if < k tokens)."""
    n = F.size(tokens)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
        )
    )


def doc_tokens(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", tokens_col().alias("toks"))


def doc_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, sh) — distinct shingles per doc."""
    return (
        doc_tokens(docs)
        .select("doc_id", F.explode(shingles_col(F.col("toks"), k)).alias("sh"))
        .distinct()
    )


def augmented_docs(docs: DataFrame) -> DataFrame:
    """documents ∪ deterministic near-dup twins (truncate last 5 tokens).

    Gives the dedup operators true positives to find at any scale without
    external data; twin doc_id = doc_id + AUG_OFFSET.
    """
    base = docs.select("doc_id", tokens_col().alias("toks"))
    twins = base.select(
        (F.col("doc_id") + F.lit(AUG_OFFSET)).alias("doc_id"),
        F.slice(
            F.col("toks"), 1, F.greatest(F.size("toks") - 5, F.lit(1))
        ).alias("toks"),
    )
    return base.unionAll(twins).select(
        "doc_id", F.concat_ws(" ", F.col("toks")).alias("text")
    )


def quantized_embeddings(emb: DataFrame) -> DataFrame:
    """(vec_id, q: array<long>) — floor(double(x) * EMB_SCALE) per component.

    float→double widening is exact and double ops are IEEE-identical across
    engines, so the quantized ints match DuckDB bit-for-bit; all downstream
    similarity math is integer (dot, squared norms) → hash-stable.
    """
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(float(EMB_SCALE))).cast("long"),
        ).alias("q"),
    )


def augmented_qemb(qemb: DataFrame) -> DataFrame:
    """quantized embeddings ∪ deterministic near-dup twins (dim 1 bumped +1).

    Twin vec_id = vec_id + AUG_OFFSET, cosine(original, twin) ≈ 1 — gives the
    embedding near-dup operator true positives without external data; integer
    perturbation keeps both engines exact.
    """
    twins = qemb.select(
        (F.col("vec_id") + F.lit(AUG_OFFSET)).alias("vec_id"),
        F.transform(
            "q", lambda x, i: x + F.when(i == 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        ).alias("q"),
    )
    return qemb.unionAll(twins)
