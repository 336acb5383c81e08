"""Deterministic synthetic transcript corpora (FIXTURES.md §1) — no external data.

Input shape is the authoritative one from BASELINE.json input_hint:
``(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)``.

Two sources:

- ``synthetic_transcripts``: seeded generator — Zipf term frequencies over a
  closed ASCII vocabulary (hot head terms exercise skew), a sprinkle of
  >255-char tokens (exercise the max-token-length drop rule), empty-text turns
  (dl=0), role cycle user/assistant/tool, monotone timestamps. Generation is
  keyed per conversation id, so it is reproducible under ANY partitioning —
  the distributed path (``spark.range`` + ``mapInPandas``) and the local
  pandas path produce identical rows.
- ``transcripts_from_documents``: maps the driver-provided
  ``documents.parquet`` (doc_id, text, …) to transcript shape one-doc-one-turn
  (``conv_id = printf('c%010d', doc_id)``), entirely with JVM-side SQL
  functions. Used by the sf-scaled correctness queries so a DuckDB oracle can
  reproduce the derivation in plain SQL.

docID invariant (SURVEY.md §1.2): doc_id == row_number over
``(conv_id ASC, turn_idx ASC)`` - 1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 20260816

# Closed vocabulary: deterministic pseudo-words over [a-z]. Zipf ranks make
# vocab[0..] hot; a handful of "giant" tokens exceed 255 chars.
_CONSONANTS = "bcdfghjklmnpqrstvwz"
_VOWELS = "aeiou"


def make_vocab(size: int = 2000) -> list[str]:
    words = []
    i = 0
    while len(words) < size:
        # deterministic syllable construction, no RNG needed
        s = ""
        j = i
        for _ in range(2 + (i % 3)):
            s += _CONSONANTS[j % len(_CONSONANTS)] + _VOWELS[(j // 7) % len(_VOWELS)]
            j = j // 5 + 13 * (j % 11) + 1
        if s not in words[-50:]:  # cheap local dedup; global dups are harmless
            words.append(s)
        i += 1
    return words[:size]


VOCAB = make_vocab()
GIANT_TOKEN = "x" * 300  # > 255 chars → dropped by the analyzer, excluded from dl


def _conv_turns(conv_i: int, rng: np.random.RandomState, vocab: np.ndarray,
                zipf_a: float) -> list[dict]:
    n_turns = int(rng.randint(1, 9))
    rows = []
    base_ts = np.datetime64("2026-01-01T00:00:00") + np.timedelta64(conv_i * 60, "s")
    for t in range(n_turns):
        role = ("user", "assistant", "tool")[t % 3]
        r = rng.rand()
        if r < 0.02:
            text = ""  # empty turn → dl = 0
        else:
            n_words = int(rng.randint(3, 60))
            ranks = np.minimum(rng.zipf(zipf_a, size=n_words) - 1, len(vocab) - 1)
            words = list(vocab[ranks])
            if r < 0.05:
                words.insert(int(rng.randint(0, len(words) + 1)), GIANT_TOKEN)
            text = " ".join(words)
        rows.append(
            {
                "conv_id": f"conv{conv_i:08d}",
                "turn_idx": np.int32(t),
                "role": role,
                "text": text,
                "tool": "search_tool" if role == "tool" else None,
                "ts": base_ts + np.timedelta64(t * 7, "s"),
            }
        )
    return rows


def synthetic_transcripts_pdf(n_convs: int, seed: int = SEED,
                              zipf_a: float = 1.3) -> pd.DataFrame:
    """Local pandas generation (tests / goldens). Deterministic per (seed, conv)."""
    vocab = np.array(VOCAB)
    rows: list[dict] = []
    for i in range(n_convs):
        rng = np.random.RandomState((seed + i * 2654435761) % (2**31 - 1))
        rows.extend(_conv_turns(i, rng, vocab, zipf_a))
    pdf = pd.DataFrame(rows)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def synthetic_transcripts(spark, n_convs: int, seed: int = SEED,
                          zipf_a: float = 1.3, parallelism: int | None = None):
    """Distributed generation: spark.range over conv ids → mapInPandas.

    Per-conversation RNG keying makes output independent of partitioning, so
    the same (seed, n_convs) corpus is identical at local[8] and local[32] —
    required for the two-parallelism scaling benchmark.
    """
    from pyspark.sql import functions as F  # noqa: F401

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    par = parallelism or spark.sparkContext.defaultParallelism

    def gen(iterator):
        vocab = np.array(VOCAB)
        for pdf in iterator:
            out: list[dict] = []
            for conv_i in pdf["id"].to_numpy():
                rng = np.random.RandomState(
                    (seed + int(conv_i) * 2654435761) % (2**31 - 1))
                out.extend(_conv_turns(int(conv_i), rng, vocab, zipf_a))
            if out:
                opdf = pd.DataFrame(out)
                opdf["turn_idx"] = opdf["turn_idx"].astype("int32")
                yield opdf

    return spark.range(0, n_convs, numPartitions=par).mapInPandas(gen, schema)


def transcripts_from_documents(spark, sf_dir: str):
    """documents.parquet → transcript shape, one doc = one turn (SQL-oracle-able).

    DuckDB equivalent:
      SELECT printf('c%010d', doc_id) AS conv_id, 0 AS turn_idx,
             'user' AS role, text, NULL AS tool, TIMESTAMP '2026-01-01' AS ts
      FROM documents
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.format_string("c%010d", F.col("doc_id")).alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


def multiturn_from_documents(spark, sf_dir: str, words_per_turn: int = 40):
    """documents → multi-turn conversations by chunking words (bench corpus).

    JVM-side only: split → slice loop via posexplode over computed turn count.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = F.split(F.col("text"), r"\s+")
    docs = docs.select(
        F.format_string("c%010d", F.col("doc_id")).alias("conv_id"),
        w.alias("words"),
    ).withColumn("n_turns", F.greatest(F.lit(1), F.ceil(F.size("words") / words_per_turn)).cast("int"))
    turns = docs.select(
        "conv_id",
        F.posexplode(F.expr(f"sequence(0, n_turns - 1)")).alias("turn_idx", "_t"),
        "words",
    ).select(
        "conv_id",
        F.col("turn_idx").cast("int"),
        F.array_join(
            F.slice(F.col("words"), F.col("turn_idx") * words_per_turn + 1, words_per_turn),
            " ",
        ).alias("text"),
    )
    return turns.select(
        "conv_id",
        "turn_idx",
        F.when(F.col("turn_idx") % 3 == 0, "user")
        .when(F.col("turn_idx") % 3 == 1, "assistant")
        .otherwise("tool")
        .alias("role"),
        "text",
        F.when(F.col("turn_idx") % 3 == 2, "search_tool").alias("tool"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("turn_idx") * 7)).alias("ts"),
    )
