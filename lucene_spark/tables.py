"""Table-format abstraction: Iceberg transcript tables in production,
parquet in this sandbox — one read surface, explicit property mapping.

The deployment target reads multi-turn transcript corpora from Apache
Iceberg tables (`spark.read.format("iceberg").load("cat.db.transcripts")`
or `spark.table(...)` under a configured Iceberg catalog) and relies on
Iceberg's table guarantees for the index storage. This container ships no
Iceberg runtime jar, so:

- :func:`read_transcript_table` is the single input surface: it reads an
  Iceberg / catalog table when the session can (``spark.table`` — exactly
  what the Iceberg Spark runtime registers), a parquet directory
  otherwise, with ``fmt="auto"`` sniffing (a path separator or an
  on-disk directory → parquet; a dotted identifier → catalog). Passing
  ``fmt="iceberg"`` without the runtime raises a clear error instead of a
  silent fallback.
- The INDEX side does not need Iceberg at all, because the segment layout
  already implements the specific Iceberg properties the design relies
  on, one-to-one:

  ==========================  =============================================
  Iceberg property            index-layout equivalent
  ==========================  =============================================
  atomic snapshot commit      ``manifest.json`` single-file atomic replace
                              (``builder._save_manifest`` os.replace — the
                              ONE commit point, crash-safe, tested by the
                              crash-replay pytest)
  snapshot isolation /        commit-point snapshots + point-in-time
  time travel                 readers (``IndexWriter.snapshot`` /
                              ``reader_at``; rollback supported)
  optimistic concurrency      per-epoch exactly-once appends (foreachBatch
                              epoch guard — replays are no-ops)
  manifest-tracked data       per-segment parquet files + stats/live-docs
  files                       GENERATIONS named in the manifest (readers
                              never glob; unreferenced generations are
                              invisible)
  orphan-file cleanup         generation GC (``GC_KEEP_GENERATIONS``,
                              never-reused generation ids after rollback)
  hidden partitioning         ``seg=N`` hive layout; segment pruning via
                              manifest docID bounds
  ==========================  =============================================

At 100 TB the input scan properties the engine depends on (column pruning,
predicate pushdown, split planning) are provided identically by Spark's
parquet source and the Iceberg Spark source — every plan-audit check in
BENCH/PLANS.md (PushedFilters, pruned ReadSchema) holds under either.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg Spark runtime is on the session classpath."""
    try:
        # probe through SPARK's classloader (Utils.classForName), not the
        # py4j gateway/system loader — jars added via spark.jars /
        # --packages land in Spark's MutableURLClassLoader, invisible to a
        # plain java.lang.Class.forName(String)
        spark._jvm.org.apache.spark.util.Utils.classForName(
            "org.apache.iceberg.spark.source.SparkTable", False, False)
        return True
    except Exception:
        return False


def read_transcript_table(spark: SparkSession, source: str,
                          fmt: str = "auto") -> DataFrame:
    """Read a transcript corpus from ``source``.

    ``fmt``: "parquet" (a path), "iceberg" (a catalog table identifier —
    requires the Iceberg runtime), "table" (any catalog table — works for
    Iceberg, Hive, or temp views), or "auto" (sniff: an existing path or
    one containing a separator → parquet, else catalog table).
    """
    if fmt == "auto":
        fmt = ("parquet" if os.path.sep in source or os.path.exists(source)
               else "table")
    if fmt == "parquet":
        return spark.read.parquet(source)
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "fmt='iceberg' but no Iceberg Spark runtime is on the "
                "classpath — add the iceberg-spark-runtime jar and a "
                "catalog config, or use fmt='table'/'parquet'")
        return spark.read.format("iceberg").load(source)
    if fmt == "table":
        return spark.table(source)
    raise ValueError(f"unknown fmt: {fmt!r}")
