"""Event-stream analytics over the ``events`` table — tumbling-window and
session-window aggregations that run identically on batch and streaming
DataFrames (the Structured Streaming unified-API contract).

Spark-first: both operators are pure built-in plans — ``F.window`` /
``F.session_window`` groupBys that Catalyst turns into streaming stateful
aggregations when the input is a stream (with ``withWatermark`` bounding
state and dropping late rows) and into ordinary hash aggregations on batch.
No custom state handling is needed for either; ``applyInPandasWithState``
remains for operators these cannot express (see ``running_max_stream``).

Value sums use integer cents (``round(value*100)``) so cross-engine
(Spark vs DuckDB) results are bit-exact regardless of float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str | None = None) -> DataFrame:
    """(window_start, event_type, n, sum_cents) per tumbling window.

    Works on batch and streaming inputs; pass ``watermark`` (e.g. "1 hour")
    on streams to bound state and drop late arrivals. ``window_start`` is
    epoch seconds (long) for engine-neutral comparison.
    """
    src = events
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .alias("sum_cents"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type", "n", "sum_cents",
        )
    )


def session_event_stats(events: DataFrame, gap: str = "30 minutes",
                        watermark: str | None = None) -> DataFrame:
    """Gap-based session windows per user (``F.session_window``): a session
    extends while consecutive events arrive within ``gap``; returns
    (user_id, session_start, n, sum_cents) with session_start in epoch
    seconds. On streams, sessions close (and emit, in append mode) once the
    watermark passes their end."""
    src = events
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .alias("sum_cents"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n", "sum_cents",
        )
    )


def running_max_stream(events: DataFrame) -> DataFrame:
    """Per-user running maximum of ``value`` — the ``applyInPandasWithState``
    custom-stateful-operator surface (for semantics the built-in windowed
    aggregations can't express): each micro-batch emits one row per updated
    user with the new running max carried in GroupState across batches.
    Batch equivalent: ``groupBy(user_id).agg(max(value))``. State is kept
    forever (NoTimeout) — a running max is well-defined for the stream's
    whole lifetime; wire ProcessingTimeTimeout here if per-user state must
    expire on bounded-memory deployments."""
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        mx = state.get[0] if state.exists else float("-inf")
        n = state.get[1] if state.exists else 0
        for pdf in pdfs:
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
                n += len(pdf)
        state.update((mx, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "max_value": [mx], "n_events": [n]})

    return events.select("user_id", "value").groupBy("user_id") \
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, max_value double, n_events long",
            stateStructType="max_value double, n_events long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
