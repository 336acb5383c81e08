"""Event-stream analytics (streaming/events.py): tumbling windows, session
windows, and the applyInPandasWithState custom stateful operator.

The unified-API contract under test: the SAME plan (windowed_event_counts /
session_event_stats) must produce identical results on a batch DataFrame and
on a real Structured Streaming source, with streaming state carried across
micro-batches."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.streaming.events import (
    running_max_stream,
    session_event_stats,
    windowed_event_counts,
)

GAP_S = 30 * 60


def _mk_events_pdf(n=240, users=7):
    """Deterministic synthetic events: per-user bursty timestamps so multiple
    sessions and hour-windows exist; cent-exact values."""
    rows = []
    t = 0
    for i in range(n):
        # bursts: mostly small gaps, every 9th event jumps > the session gap
        t += 5031 if i % 9 == 8 else (37 + (i * 97) % 400)
        rows.append(
            {
                "event_id": i,
                "ts": pd.Timestamp("2024-03-01") + pd.Timedelta(seconds=t),
                "user_id": (i * 13) % users,
                "event_type": ["click", "view", "error"][i % 3],
                "value": round((i * 7.13) % 50, 2),
            }
        )
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def events_pdf():
    return _mk_events_pdf()


@pytest.fixture(scope="module")
def events_df(spark, events_pdf):
    return spark.createDataFrame(events_pdf).cache()


def _brute_windows(pdf):
    out = {}
    for r in pdf.itertuples():
        ws = int(r.ts.timestamp()) // 3600 * 3600
        key = (ws, r.event_type)
        n, c = out.get(key, (0, 0))
        out[key] = (n + 1, c + int(round(r.value * 100)))
    return {k + (v[0], v[1]) for k, v in out.items()}


def _brute_sessions(pdf):
    out = set()
    for uid, g in pdf.sort_values("ts").groupby("user_id"):
        cur = []
        prev = None
        for r in g.itertuples():
            if prev is not None and (r.ts - prev).total_seconds() >= GAP_S:
                out.add(_close(uid, cur))
                cur = []
            cur.append(r)
            prev = r.ts
        if cur:
            out.add(_close(uid, cur))
    return out


def _close(uid, rows):
    return (
        uid,
        math.floor(rows[0].ts.timestamp()),
        len(rows),
        sum(int(round(r.value * 100)) for r in rows),
    )


def test_windowed_counts_batch(events_df, events_pdf):
    got = {
        (r.window_start, r.event_type, r.n, r.sum_cents)
        for r in windowed_event_counts(events_df).collect()
    }
    exp = {
        (ws, et, n, c) for ws, et, n, c in _brute_windows(events_pdf)
    }
    assert got == exp
    assert len({ws for ws, *_ in got}) >= 3  # multiple hour windows exist


def test_session_stats_batch(events_df, events_pdf):
    got = {
        (r.user_id, r.session_start, r.n, r.sum_cents)
        for r in session_event_stats(events_df).collect()
    }
    exp = _brute_sessions(events_pdf)
    assert got == exp
    # gap construction produced >1 session for some user
    per_user = pd.Series([u for u, *_ in got]).value_counts()
    assert per_user.max() > 1


def test_windowed_counts_stream_equals_batch(spark, events_df, tmp_path):
    """Same plan on a real stream (two micro-batches, complete mode): the
    streaming stateful aggregation must merge state across batches and end
    bit-identical to the batch run."""
    src = str(tmp_path / "esrc")
    lo = events_df.filter(F.col("event_id") < 120)
    hi = events_df.filter(F.col("event_id") >= 120)
    lo.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events_df.schema).parquet(src)
    q = (
        windowed_event_counts(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("ewin")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    hi.write.mode("append").parquet(src)
    q2 = (
        windowed_event_counts(
            spark.readStream.schema(events_df.schema).parquet(src),
            watermark="2 hours",
        )
        .writeStream.format("memory")
        .queryName("ewin2")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    got = {
        tuple(r) for r in spark.sql("SELECT * FROM ewin2").collect()
    }
    exp = {tuple(r) for r in windowed_event_counts(events_df).collect()}
    assert got == exp


def test_session_stats_stream_equals_batch(spark, events_df, tmp_path):
    src = str(tmp_path / "ssrc")
    events_df.write.mode("overwrite").parquet(src)
    q = (
        session_event_stats(
            spark.readStream.schema(events_df.schema).parquet(src),
            watermark="1 minute",
        )
        .writeStream.format("memory")
        .queryName("esess")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.sql("SELECT * FROM esess").collect()}
    exp = {tuple(r) for r in session_event_stats(events_df).collect()}
    assert got == exp


def test_running_max_stream_state_across_batches(spark, events_df, tmp_path):
    """applyInPandasWithState carries (max, count) GroupState across
    micro-batches; the final emitted row per user equals the batch
    groupBy(max, count)."""
    src = str(tmp_path / "rsrc")
    lo = events_df.filter(F.col("event_id") < 120)
    hi = events_df.filter(F.col("event_id") >= 120)
    lo.write.mode("overwrite").parquet(src)

    emitted = []  # (epoch, rows) — foreachBatch runs on the driver

    def sink(bdf, epoch_id):
        emitted.append((epoch_id, bdf.collect()))

    def run():
        q = (
            running_max_stream(
                spark.readStream.schema(events_df.schema).parquet(src)
            )
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "rckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    hi.write.mode("append").parquet(src)
    run()

    final = {}
    for _, rows in emitted:
        for r in rows:
            final[r.user_id] = (r.max_value, r.n_events)
    exp = {
        r.user_id: (r.mx, r.n)
        for r in events_df.groupBy("user_id")
        .agg(F.max("value").alias("mx"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == exp
    assert len(emitted) >= 2  # state genuinely crossed micro-batches
