"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.

Pure DataFrame plans (JVM built-ins); arithmetic is integer / md5-hex only so
DuckDB oracles reproduce results exactly. At 100 TB each op is a single
column-pruned scan + narrow projections (whole-stage codegen) and at most one
two-stage aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.pipeline.contracts import doc_shingles, tokens_col

# Tiny per-language marker sets (stopword heuristic). Deliberately minimal —
# the operator contract is the argmax logic, not lexicon quality.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "los", "las", "es", "de", "y"),
    "fr": ("le", "la", "les", "et", "est", "des"),
    "zh": ("de0", "shi4", "le0", "zai4"),  # pinyin-romanized placeholder set
}

STOPWORDS = LANG_MARKERS["en"]
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, n_hits) — argmax of marker-token hits.

    Tie-break: higher hits win, then lexicographically smaller lang code
    (deterministic). Docs with zero hits in every set → 'und'.
    """
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    markers = [(lang, t) for lang, ts in LANG_MARKERS.items() for t in ts]
    mdf = toks.sparkSession.createDataFrame(markers, "lang string, tok string")
    hits = (
        toks.join(F.broadcast(mdf), "tok")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_hits"), F.asc("lang"))
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "n_hits")
    )
    return (
        docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_alpha, n_punct, n_stop, quality_ok).

    quality_ok (all integer comparisons — cross-engine exact):
      ≥ 10 tokens, ≥ 1 stopword per 20 tokens, punctuation ≤ 20% of tokens,
      mean token length between 2 and 12 chars (as 2·n_tokens ≤ n_alpha_chars
      ≤ 12·n_tokens).
    """
    t = F.lower(F.coalesce(F.col("text"), F.lit("")))
    toks = tokens_col()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    d = docs.select(
        "doc_id",
        F.length(t).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("n_alpha"),
        F.size(F.regexp_extract_all(t, F.lit(r"[^a-z0-9\s]"), F.lit(0)))
        .cast("long").alias("n_punct"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
        .cast("long").alias("n_stop"),
    )
    ok = (
        (F.col("n_tokens") >= 10)
        & (F.col("n_stop") * 20 >= F.col("n_tokens"))
        & (F.col("n_punct") * 5 <= F.col("n_tokens"))
        & (F.col("n_alpha") >= 2 * F.col("n_tokens"))
        & (F.col("n_alpha") <= 12 * F.col("n_tokens"))
    )
    return d.withColumn("quality_ok", ok)


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws, n_bpe) — whitespace tokens + BPE-ish regex tokens."""
    t = F.lower(F.coalesce(F.col("text"), F.lit("")))
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(r"\S+"), F.lit(0))).cast("long").alias("n_ws"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_RE), F.lit(0))).cast("long").alias("n_bpe"),
    )


def fingerprints(docs: DataFrame, sketch_size: int = 4) -> DataFrame:
    """(doc_id, fp, sketch) — md5 full fingerprint + winnowing-style sketch.

    fp = md5 of the token-normalized text (rolling-hash equivalent under the
    deterministic-token contract); sketch = the ``sketch_size`` smallest
    md5(3-shingle) values, sorted — a locality-sensitive content sketch
    (bottom-k of a hash-permuted shingle set ≡ k-minimum-values sketch).
    Docs with < 3 tokens get an empty sketch.
    """
    fp = docs.select(
        "doc_id", F.md5(F.concat_ws(" ", tokens_col())).alias("fp")
    )
    sk = (
        doc_shingles(docs)
        .select("doc_id", F.md5("sh").alias("h"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "|", F.slice(F.array_sort(F.collect_set("h")), 1, sketch_size)
            ).alias("sketch")
        )
    )
    return (
        fp.join(sk, "doc_id", "left")
        .select("doc_id", "fp", F.coalesce("sketch", F.lit("")).alias("sketch"))
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """CCNet-style unigram-LM quality score: each doc's mean token
    log-probability under the corpus's OWN unigram MLE (self-trained —
    deterministic, no external model; the perplexity-bucketing proxy of
    public pipeline reports). Returns (doc_id, n_tokens, avg_lp) — lower
    avg_lp = rarer vocabulary.

    Exactness contract (cross-engine hash parity): the per-TERM ``ln`` is
    rounded to float32 (absorbs last-ulp libm differences, same trick as
    the BM25 idf oracle); per-doc accumulation multiplies by integer tf
    and sums in double — every partial sum stays well under 53 significant
    bits, so the sum is EXACT and order-independent.

    Scale: two two-stage groupBys (doc_id×term, then term) + one shuffle
    join of per-doc tfs against the term LM (hot stopword keys bounded by
    the distinct-per-doc tf side; AQE skew-join splits the rest), then a
    per-doc groupBy. All JVM.
    """
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    lm0 = tf.groupBy("term").agg(F.sum("tf").alias("ttf"))
    total = lm0.agg(F.sum("ttf").alias("tot"))
    lm = lm0.crossJoin(F.broadcast(total)).select(
        "term",
        F.expr("CAST(ln(CAST(ttf AS DOUBLE) / CAST(tot AS DOUBLE)) AS FLOAT)")
        .alias("lp"),
    )
    per_doc = (
        tf.join(lm, "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf").cast("double") * F.col("lp").cast("double"))
            .alias("slp"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("slp") / F.col("n_tokens"), F.lit(0.0))
            .cast("double").alias("avg_lp"),
        )
    )
