"""Training-data curation operators: eval-set decontamination, repetition
scoring, deterministic stratified sampling, and domain-mixture resampling.

Like the rest of ``lucene_spark.pipeline`` these are pure JVM DataFrame plans
(no Python UDFs) over the deterministic contracts in ``contracts.py`` so the
DuckDB oracles in ``oracles.py`` hash-match bit-for-bit: md5-hex hashing,
integer counting, and exact int-ratio doubles only.

Scale notes (100 TB):

- ``contamination_check`` broadcasts the DISTINCT eval-set shingles (eval
  benchmarks are tiny next to a training corpus — the standard n-gram
  decontamination setup, e.g. the 13-gram filtering described in public LLM
  reports) and makes ONE pass over the corpus: shingle → broadcast semi-ish
  join → two-stage count.  No corpus×corpus shuffle exists anywhere.
- ``repetition_scores`` is explode → two-stage groupBy per n-gram order; all
  aggregations have map-side partial combine and key on (doc_id) which is
  unique by construction → no skew.
- ``stratified_sample`` ranks by md5(doc_id) inside each stratum — a
  deterministic uniform permutation, so rank ≤ n is an exact-size uniform
  sample per group (reservoir-sampling equivalent, but reproducible and
  engine-portable).  One shuffle on the stratum key; skewed strata are
  bounded by the window's top-n early stop under AQE.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from lucene_spark.pipeline.contracts import (
    SHINGLE_K,
    doc_shingles,
    shingles_col,
    tokens_col,
)
from lucene_spark.pipeline.textqc import BPE_RE, STOPWORDS


def contamination_check(
    corpus: DataFrame, evalset: DataFrame, k: int = SHINGLE_K, min_hits: int = 2
) -> DataFrame:
    """(doc_id, n_hit, n_shingles, contaminated) per corpus doc.

    ``n_hit`` = number of DISTINCT k-token shingles of the doc that appear
    anywhere in the eval set; ``contaminated`` = n_hit >= min_hits (integer
    compare — cross-engine exact).  Docs with < k tokens have 0 shingles and
    are never contaminated.
    """
    eval_sh = doc_shingles(evalset, k).select("sh").distinct()
    corpus_sh = doc_shingles(corpus, k)  # distinct (doc_id, sh)
    per_doc = corpus_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        corpus_sh.join(F.broadcast(eval_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        corpus.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            (F.coalesce("n_hit", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


# Minimum doc length (tokens) for the repetition fraction rules to apply;
# below it, n-gram counts are too small for a 20%/10% fraction to be
# meaningful (1 duplicate out of 4 bigrams is already 25%).
MIN_REP_TOKENS = 10


def _ngram_rep(docs: DataFrame, n: int, prefix: str) -> DataFrame:
    """(doc_id, {prefix}_total, {prefix}_dup, {prefix}_top) n-gram repetition
    counts: total n-grams, duplicated occurrences (total - distinct), and the
    occurrence count of the most frequent n-gram (0 when no n-grams)."""
    toks = tokens_col()
    size = F.size(toks)
    grams = F.when(size < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), size - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    g = docs.select("doc_id", F.explode(grams).alias("g"))
    per_gram = g.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    agg = per_gram.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias(f"{prefix}_total"),
        (F.sum("c") - F.count(F.lit(1))).cast("long").alias(f"{prefix}_dup"),
        F.max("c").cast("long").alias(f"{prefix}_top"),
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            *[
                F.coalesce(f"{prefix}_{c}", F.lit(0)).cast("long").alias(f"{prefix}_{c}")
                for c in ("total", "dup", "top")
            ],
        )
    )


def repetition_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, g2_total, g2_dup, g2_top, g3_total, g3_dup, g3_top,
    rep_ok) — n-gram repetition signals in the spirit of the public
    MassiveText/Gopher quality rules (duplicate-n-gram and top-n-gram
    fractions), in pure integer arithmetic.

    rep_ok (all integer comparisons): duplicated 2-grams ≤ 20% of 2-grams,
    duplicated 3-grams ≤ 10% of 3-grams, and the most frequent 2-gram covers
    ≤ 20% of 2-gram slots.  The fraction rules apply only to docs with
    ≥ MIN_REP_TOKENS tokens (the public Gopher rules likewise gate on a
    minimum word count) — shorter docs pass trivially, so e.g. a clean
    2-token doc (one bigram, top count 1 > 20% of 1) is not rejected for
    being short.
    """
    r2 = _ngram_rep(docs, 2, "g2")
    r3 = _ngram_rep(docs, 3, "g3")
    base = docs.select(
        "doc_id", F.size(tokens_col()).cast("long").alias("n_tokens")
    )
    out = base.join(r2, "doc_id").join(r3, "doc_id")
    ok = (F.col("n_tokens") < MIN_REP_TOKENS) | (
        (F.col("g2_dup") * 5 <= F.col("g2_total"))
        & (F.col("g3_dup") * 10 <= F.col("g3_total"))
        & (F.col("g2_top") * 5 <= F.col("g2_total"))
    )
    return out.withColumn("rep_ok", ok)


def stratified_sample(
    docs: DataFrame, strata: Sequence[str], n_per_stratum: int
) -> DataFrame:
    """Deterministic exact-n-per-stratum sample: within each stratum, rank
    docs by (md5(doc_id), doc_id) — a fixed uniform permutation — and keep
    rank ≤ n.  Returns (strata…, doc_id, rk).

    Reproducible across engines/runs (no RNG state), unlike
    ``df.sampleBy``, and exact-size per group, unlike Bernoulli sampling.
    """
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select(*strata, "doc_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_per_stratum)
    )


# PII patterns (RE2/ICU-portable: no backrefs, no lookaround) — emails,
# international-ish phone numbers, and IPv4 addresses. Deliberately compact;
# the operator contract is the scrub/count plumbing, not regex completeness.
PII_PATTERNS = (
    # order matters: emails first (their digits must not feed the phone
    # rule), then IPv4 (dots + digits would otherwise match as a phone),
    # then phones
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]"),
)


def redact_pii(docs: DataFrame, patterns=PII_PATTERNS) -> DataFrame:
    """(doc_id, clean_text, n_email, n_ipv4, n_phone, has_pii) — scrub PII
    spans with ``<NAME>`` placeholders and count the matches per class.

    Patterns apply in order (see ``PII_PATTERNS`` — an email or IPv4 is
    redacted before the phone rule can see its digits). All work is JVM
    ``regexp_replace`` /
    ``regexp_extract_all`` — one codegen projection, no shuffle; at 100 TB
    this is a map-only pass.
    """
    t = F.coalesce(F.col("text"), F.lit(""))
    counts = []
    for name, pat in patterns:
        counts.append(
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
            .cast("long").alias(f"n_{name}"))
        t = F.regexp_replace(t, pat, f"<{name.upper()}>")
    out = docs.select("doc_id", t.alias("clean_text"), *counts)
    has = reduce(lambda a, b: a | b,
                 [F.col(f"n_{name}") > 0 for name, _ in patterns])
    return out.withColumn("has_pii", has)


def _mix_requested(weights: dict, total: int) -> dict:
    """Per-domain requested counts: floor(total * w / Σw) — integer, so the
    Spark plan and the DuckDB oracle agree bit-for-bit."""
    wsum = float(sum(weights.values()))
    return {d: int(total * w / wsum) for d, w in weights.items()}


def domain_mix(
    docs: DataFrame, weights: dict, total: int, domain_col: str = "source"
) -> DataFrame:
    """Deterministic domain-mixture resampling — the "data recipe" step of
    a training pipeline (sample each domain toward target mixture weights,
    e.g. up-weighting curated sources and down-weighting web crawl).

    ``requested_d = floor(total * w_d / Σw)``; within each domain docs are
    ranked by the fixed uniform permutation (md5(doc_id), doc_id) and rank
    ≤ requested_d survive.  A domain with fewer rows than requested
    contributes everything it has (the rank filter caps naturally);
    domains absent from ``weights`` are dropped.  Returns
    (domain_col, doc_id, rk).

    Scale: the requested counts are a tiny literal map (no join); the only
    shuffle is the window partition on the domain key.  A skewed giant
    domain pays one per-domain sort — at real scale swap the full sort for
    a two-pass rank-threshold estimate, but the exact rank keeps the
    contract reproducible and oracle-checkable here.
    """
    req = _mix_requested(weights, total)
    req_map = F.create_map(
        *[F.lit(x) for d, n in sorted(req.items()) for x in (d, n)]
    )
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy(domain_col).orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select(domain_col, "doc_id")
        .withColumn("req", req_map[F.col(domain_col)])
        .filter(F.col("req").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= F.col("req"))
        .select(domain_col, "doc_id", "rk")
    )


def domain_mix_report(
    docs: DataFrame, weights: dict, total: int, domain_col: str = "source"
) -> DataFrame:
    """Achieved-vs-requested mixture audit for :func:`domain_mix`:
    (domain, available, requested, taken, achieved) where
    ``taken = least(requested, available)`` and ``achieved`` is the
    resulting mixture share ``taken / Σ taken`` (an exact int-ratio double,
    cross-engine stable).  One groupBy on the domain key; the final share
    is a window over ≤ #domains rows."""
    req = _mix_requested(weights, total)
    req_map = F.create_map(
        *[F.lit(x) for d, n in sorted(req.items()) for x in (d, n)]
    )
    avail = (
        docs.select(domain_col)
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("available"))
        .withColumn("requested", req_map[F.col(domain_col)])
        .filter(F.col("requested").isNotNull())
        .withColumn("taken", F.least("requested", "available"))
    )
    wall = Window.partitionBy()
    return avail.withColumn(
        "achieved",
        F.col("taken").cast("double") / F.sum("taken").over(wall).cast("double"),
    ).select(domain_col, "available", "requested", "taken", "achieved")


def line_dedup(docs: DataFrame) -> DataFrame:
    """C4-style global line-level deduplication (the "deduplicate lines
    across the dataset" step of public web-corpus pipelines): keep the
    globally-FIRST occurrence of every distinct line — first = smallest
    (doc_id, line position) — drop every other occurrence, and rebuild
    each doc's text from its kept lines in their original order.

    Returns (doc_id, n_lines, n_kept, text_clean); docs whose every line
    was deduplicated away come back with ``n_kept = 0`` and empty text.

    Scale (100 TB): lines explode into (doc_id, pos, line); ownership is
    ONE two-stage groupBy on the line hash computing ``min(struct(doc_id,
    pos))`` — map-side partial combine collapses boilerplate hot lines
    before the shuffle (no window over skewed per-line groups) — then a
    join back on the hash. The rebuild groupBy keys on doc_id (unique by
    construction → no skew). All JVM, no Python UDFs.
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col("text"), F.lit("")), "\n")
        ).alias("pos", "line"),
    ).withColumn("lh", F.md5(F.col("line")))
    first = lines.groupBy("lh").agg(
        F.min(F.struct(F.col("doc_id").alias("d"),
                       F.col("pos").alias("p"))).alias("o"))
    kept = (
        lines.join(first, "lh")
        .filter((F.col("doc_id") == F.col("o.d")) & (F.col("pos") == F.col("o.p")))
        .select("doc_id", "pos", "line")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
    )
    totals = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"))
    return (
        docs.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def exact_substring_stats(docs: DataFrame, window: int = 10) -> DataFrame:
    """ExactSubstr deduplication statistics — the duplicated-span removal
    of Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better", the suffix-array ExactSubstr method) re-expressed as
    fixed-width window hashing, the standard distributed approximation: a
    ``window``-token span is duplicated when the identical token window
    occurs ≥ 2 times anywhere in the corpus; every occurrence EXCEPT the
    globally-first (smallest (doc_id, pos)) is a removal candidate.

    Returns (doc_id, n_tokens, dup_tokens): ``dup_tokens`` = size of the
    union of the candidate spans' token intervals — exactly the token
    count ExactSubstr would cut from that doc, keeping first occurrences.

    Scale (100 TB): windows explode to one row per token (same order as
    the corpus itself); ownership is ONE two-stage groupBy on the window
    hash computing (count, min(struct(doc_id, pos))) with map-side partial
    combine, then a shuffle join of the occurrences against the ≥2-count
    hashes only. The interval union is the classic gaps-and-islands sweep:
    two window functions partitioned by doc_id (unique-ish key → no skew),
    no Python UDFs, everything whole-stage codegen.
    """
    toks = docs.select("doc_id", tokens_col().alias("toks"))
    wins = toks.select(
        "doc_id",
        F.posexplode(shingles_col(F.col("toks"), window)).alias("pos", "w"),
    ).select("doc_id", "pos", F.md5("w").alias("h"))
    stats = wins.groupBy("h").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct(F.col("doc_id").alias("d"),
                       F.col("pos").alias("p"))).alias("o"),
    )
    cand = (
        wins.join(stats.filter(F.col("cnt") >= 2).select("h", "o"), "h")
        .filter(~((F.col("doc_id") == F.col("o.d"))
                  & (F.col("pos") == F.col("o.p"))))
        .select("doc_id", F.col("pos").alias("s"),
                (F.col("pos") + F.lit(window)).alias("e"))
    )
    wdoc = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        cand.withColumn(
            "new_isl",
            (F.col("s") > F.coalesce(prev_max_e, F.lit(-1))).cast("long"))
        .withColumn("isl", F.sum("new_isl").over(
            wdoc.rowsBetween(Window.unboundedPreceding, 0)))
    )
    dup = (
        islands.groupBy("doc_id", "isl")
        .agg((F.max("e") - F.min("s")).alias("ilen"))
        .groupBy("doc_id")
        .agg(F.sum("ilen").cast("long").alias("dup_tokens"))
    )
    return (
        toks.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
        .join(dup, "doc_id", "left")
        .select("doc_id", "n_tokens",
                F.coalesce("dup_tokens", F.lit(0)).cast("long")
                .alias("dup_tokens"))
    )


# HTMLStripCharFilter-lite (``analysis/common/src/java/org/apache/lucene/
# analysis/charfilter/HTMLStripCharFilter.jflex``): the reference strips
# INLINE elements to nothing (:116-141 InlineElment — "a<b>x</b>c" → "axc"),
# replaces every other (block-level) tag plus <script>/<style> blocks with
# '\n' (:148-153), and decodes character entities. Lite contract
# (documented): the same inline-element list, block→'\n', script/style/
# comments handled, NAMED entities only (amp/lt/gt/quot/apos/nbsp) — numeric
# entities and the exotic states (CDATA, server-side includes, bare '<')
# stay out. Every rule is one JVM regexp_replace — a codegen projection
# that DuckDB mirrors verbatim, no UDF.
_HTML_INLINE = ("a|b|i|q|s|u|abbr|acronym|basefont|bdo|big|cite|code|dfn|em|"
                "font|img|input|kbd|label|samp|select|small|span|strike|"
                "strong|sub|sup|textarea|tt|var")

#: (pattern, replacement) chain — order matters (script/style/comments
#: before generic tags). Shared verbatim by the SQL oracle.
HTML_STRIP_RULES = (
    (r"(?is)<script(\s[^>]*)?>.*?</script\s*>", "\n"),
    (r"(?is)<style(\s[^>]*)?>.*?</style\s*>", "\n"),
    (r"(?s)<!--.*?-->", ""),
    (rf"(?i)</?({_HTML_INLINE})(\s[^>]*)?/?>", ""),
    (r"<[^>]*>", "\n"),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&apos;", "'"),
    (r"&amp;", "&"),
)


def html_strip_col(col):
    """Spark Column: HTML-stripped text per :data:`HTML_STRIP_RULES`."""
    from pyspark.sql import functions as F

    for pat, rep in HTML_STRIP_RULES:
        col = F.regexp_replace(col, pat, rep)
    return col


def html_strip(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Strip HTML markup from ``text_col`` in place — the pre-tokenization
    cleaning pass of a web-crawl curation pipeline. Pure whole-stage-codegen
    projection: no shuffle, no UDF, pipelines with the scan at any scale."""
    return docs.withColumn(text_col, html_strip_col(docs[text_col]))


def html_strip_sql_expr(expr: str = "coalesce(text, '')") -> str:
    """The identical rule chain as a DuckDB SQL expression (oracle side)."""
    out = expr
    for pat, rep in HTML_STRIP_RULES:
        p = pat.replace("'", "''")
        # DuckDB swallows backslash escapes in replacement literals —
        # newline must go through chr(10)
        r = "chr(10)" if rep == "\n" else "'" + rep.replace("'", "''") + "'"
        out = f"regexp_replace({out}, '{p}', {r}, 'gs')"
    return out


# --------------------------------------------------------------- packing --

def _doc_token_starts(docs: DataFrame, n_buckets: int = 1024) -> DataFrame:
    """(doc_id, n_tok, start) — each doc's token count (BPE-ish regex + one
    EOS separator, the standard concat-and-chunk accounting) and its global
    start offset in the doc_id-ordered token stream.

    The global prefix sum is DISTRIBUTED: docs bucket by doc_id range
    (contiguous buckets preserve the global order), per-bucket token sums
    reduce to ``n_buckets`` rows on the driver, their exclusive cumsum
    broadcasts back as bucket base offsets, and the within-bucket running
    sum is a window partitioned BY BUCKET — never a single-partition global
    window. At 10^12 docs this is one shuffle on the bucket key plus a
    1024-row driver exchange; bucket skew is bounded because doc_ids are
    dense row numbers.
    """
    t = F.lower(F.coalesce(F.col("text"), F.lit("")))
    n_tok = (F.size(F.regexp_extract_all(t, F.lit(BPE_RE), F.lit(0)))
             .cast("long") + F.lit(1))
    # persist the tokenized counts: three actions read this relation (the
    # max-id probe, the bucket-sums collect, the final plan) and the
    # regexp tokenization dominates — cached rows are two longs per doc
    # (~16 B/doc), small even at 10^12 docs spread over executors
    base = docs.select("doc_id", n_tok.alias("n_tok")).persist()
    hi = base.agg(F.max("doc_id")).first()[0]
    if hi is None:
        return base.withColumn("start", F.lit(0).cast("long"))
    span = (int(hi) // n_buckets) + 1
    with_b = base.withColumn("bucket",
                             (F.col("doc_id") / F.lit(span)).cast("long"))
    sums = (with_b.groupBy("bucket").agg(F.sum("n_tok").alias("btok"))
            .orderBy("bucket").collect())
    off, offsets = 0, {}
    for r in sums:
        offsets[int(r["bucket"])] = off
        off += int(r["btok"])
    off_df = with_b.sparkSession.createDataFrame(
        [(b, o) for b, o in offsets.items()], "bucket long, base long")
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (
        with_b.join(F.broadcast(off_df), "bucket")
        .withColumn("start",
                    (F.coalesce(F.sum("n_tok").over(w), F.lit(0))
                     + F.col("base")).cast("long"))
        .select("doc_id", "n_tok", "start")
    )


def pack_spans(docs: DataFrame, context_len: int,
               n_buckets: int = 1024) -> DataFrame:
    """(doc_id, n_tok, start, pack_first, pack_last) — concat-and-chunk
    sequence packing: the doc_id-ordered token stream (each doc = its
    BPE-ish tokens + 1 EOS) chunks into fixed ``context_len`` windows; a
    doc spans every pack its tokens fall into (docs longer than one window
    cross pack boundaries — the standard GPT-style pretraining packing)."""
    s = _doc_token_starts(docs, n_buckets)
    L = F.lit(int(context_len))
    return (
        s.withColumn("pack_first", (F.col("start") / L).cast("long"))
        .withColumn("pack_last",
                    ((F.col("start") + F.col("n_tok") - 1) / L).cast("long"))
    )


def pack_report(docs: DataFrame, context_len: int,
                n_buckets: int = 1024) -> DataFrame:
    """(pack_id, n_docs, n_tokens, n_full_docs) per context window:
    how many docs contribute tokens, how many tokens land in the window
    (== context_len except the final partial pack), and how many docs sit
    ENTIRELY inside it (never split across a boundary). The explode emits
    one row per (doc, pack) intersection — bounded by n_tok/context_len + 1
    rows per doc, so giant docs fan out proportionally to their length and
    the per-pack aggregation keys are uniform by construction."""
    L = int(context_len)
    spans = pack_spans(docs, L, n_buckets)
    per = (
        spans.select(
            "doc_id", "start", "n_tok",
            F.explode(F.sequence("pack_first", "pack_last")).alias("pack_id"))
        .withColumn("lo", F.greatest(F.col("start"),
                                     F.col("pack_id") * F.lit(L)))
        .withColumn("hi", F.least(F.col("start") + F.col("n_tok"),
                                  (F.col("pack_id") + 1) * F.lit(L)))
    )
    return (
        per.groupBy("pack_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("hi") - F.col("lo")).cast("long").alias("n_tokens"),
            F.sum(
                F.when((F.col("start") >= F.col("pack_id") * F.lit(L))
                       & (F.col("start") + F.col("n_tok")
                          <= (F.col("pack_id") + 1) * F.lit(L)), 1)
                .otherwise(0)
            ).cast("long").alias("n_full_docs"),
        )
    )


# ---------------------------------------------------------- gopher filter --

def gopher_filter(docs: DataFrame, min_words: int = 10,
                  max_words: int = 100_000) -> DataFrame:
    """(doc_id, n_words, fail_mask, keep) — Gopher-style document quality
    rules (the published repetition/quality heuristics of the Gopher
    corpus pipeline, integer-exact so the oracle matches bit-for-bit).

    fail_mask bit i set ⇔ rule i failed:
      0: word count < min_words            1: word count > max_words
      2: mean word length outside [3, 10]  (3n ≤ alpha_chars ≤ 10n)
      3: symbol-to-word ratio > 0.1        (10·(#'#' + #'...') > n)
      4: < 80% of words contain a letter   (5·alpha_words < 4n)
      5: < 2 stopwords
      6: duplicate-line fraction > 0.3     (10·dup_lines > 3·n_lines)
    keep ⇔ fail_mask == 0. One codegen projection + a tiny per-doc line
    aggregation — no shuffle beyond the doc_id-unique groupBy, no Python.
    """
    t = F.lower(F.coalesce(F.col("text"), F.lit("")))
    words = F.split(F.trim(t), r"\s+")
    words = F.filter(words, lambda w: w != F.lit(""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    base = docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)).alias("n_wchars"),
        F.size(F.regexp_extract_all(t, F.lit(r"#|\.\.\."), F.lit(0)))
        .cast("long").alias("n_sym"),
        F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
        .cast("long").alias("n_alpha_words"),
        F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
        .cast("long").alias("n_stop"),
        F.size(F.split(t, "\n")).cast("long").alias("n_lines"),
        (F.size(F.split(t, "\n"))
         - F.size(F.array_distinct(F.split(t, "\n"))))
        .cast("long").alias("dup_lines"),
    )
    mask = (
        F.when(F.col("n_words") < min_words, 1).otherwise(0)
        + F.when(F.col("n_words") > max_words, 2).otherwise(0)
        + F.when((3 * F.col("n_words") > F.col("n_wchars"))
                 | (F.col("n_wchars") > 10 * F.col("n_words")), 4)
        .otherwise(0)
        + F.when(10 * F.col("n_sym") > F.col("n_words"), 8).otherwise(0)
        + F.when(5 * F.col("n_alpha_words") < 4 * F.col("n_words"), 16)
        .otherwise(0)
        + F.when(F.col("n_stop") < 2, 32).otherwise(0)
        + F.when(10 * F.col("dup_lines") > 3 * F.col("n_lines"), 64)
        .otherwise(0)
    ).cast("long")
    return (base.withColumn("fail_mask", mask)
            .withColumn("keep", F.col("fail_mask") == 0)
            .select("doc_id", "n_words", "fail_mask", "keep"))
