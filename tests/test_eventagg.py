"""Streaming event analytics: watermarked windowed counts equal the
batch aggregation, the watermark guarantees hold (allowed-lateness
inclusion, watermark advancement), and the stateful sessionizer
closes sessions across micro-batch boundaries (gap close + event-time
timeout flush)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.streaming.eventagg import (
    sessionize_events,
    windowed_event_counts,
)


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}")


def test_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.parquet(src + "/b0")
    schema = events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src + "/*")
    )
    # complete mode: every window is emitted regardless of watermark
    agg = windowed_event_counts(stream, window="1 day", watermark="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("winc")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "SELECT window_start, event_type, count FROM winc"
    ).toPandas()
    exp = (
        events.groupBy(
            F.date_trunc("day", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("count"))
        .toPandas()
    )
    key = ["window_start", "event_type"]
    got = got.sort_values(key, ignore_index=True)
    exp = exp.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_windowed_counts_watermark_semantics(spark, tmp_path):
    """The watermark GUARANTEE direction (the Structured Streaming
    contract): events within the allowed lateness are aggregated even
    when they arrive in a later micro-batch, and the event-time
    watermark advances batch over batch (state stays bounded).
    Dropping data beyond the lateness is best-effort per the Spark
    docs, so it is deliberately NOT asserted."""
    import time

    src = str(tmp_path / "late")
    rows1 = [(1, "2024-01-10 12:00:00", "click"),
             (2, "2024-01-10 13:00:00", "click")]
    # arrives one batch later but only 30 min behind the max event
    # time — inside the 1 h watermark, MUST be counted
    rows2 = [(3, "2024-01-10 13:30:00", "click"),
             (4, "2024-01-10 12:30:00", "click")]
    mk = lambda rows: spark.createDataFrame(
        rows, "event_id bigint, ts string, event_type string"
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"),
             "event_type")
    mk(rows1).coalesce(1).write.parquet(src + "/b0")
    time.sleep(1.2)
    mk(rows2).coalesce(1).write.parquet(src + "/b1")
    schema = spark.read.parquet(src + "/b0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    agg = windowed_event_counts(stream, window="1 day", watermark="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("latec")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM latec").toPandas()
    # the in-lateness row reached its window: final update shows 4
    assert got[got["event_type"] == "click"]["count"].max() == 4
    # the event-time watermark advanced to max(event time) - 1 h
    marks = [
        p["eventTime"].get("watermark") for p in q.recentProgress
        if p.get("eventTime")
    ]
    assert "2024-01-10T12:30:00.000Z" in marks


def test_sessionize_across_batches(spark, tmp_path):
    src = str(tmp_path / "sess")
    # user 1: 3 events 10 min apart (one session), then a 2h gap event
    # IN THE SECOND BATCH that closes it; user 2: one event per batch
    # within the gap -> still open, nothing emitted for it
    rows1 = [(1, "2024-01-10 10:00:00"), (1, "2024-01-10 10:10:00"),
             (1, "2024-01-10 10:20:00"), (2, "2024-01-10 10:00:00")]
    rows2 = [(1, "2024-01-10 12:20:00"),  # closes user 1's session
             (2, "2024-01-10 10:20:00")]  # extends user 2's session
    mk = lambda rows: spark.createDataFrame(
        rows, "user_id bigint, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    mk(rows1).coalesce(1).write.parquet(src + "/b0")
    import time

    time.sleep(1.2)
    mk(rows2).coalesce(1).write.parquet(src + "/b1")
    schema = spark.read.parquet(src + "/b0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    sess = sessionize_events(stream, gap_seconds=1800, watermark="10 minutes")
    got = _run_stream(spark, sess, "sessions").toPandas()
    closed = got[got["user_id"] == 1]
    assert len(closed) == 1
    r = closed.iloc[0]
    assert str(r["session_start"]) == "2024-01-10 10:00:00"
    assert str(r["session_end"]) == "2024-01-10 10:20:00"
    assert r["n_events"] == 3
    # user 2's open session flushes via the EVENT-TIME TIMEOUT once
    # the watermark (12:10, from user 1's closing event) passes
    # last + gap = 10:50 — both batches' events merged into one state
    u2 = got[got["user_id"] == 2]
    assert len(u2) == 1
    r2 = u2.iloc[0]
    assert str(r2["session_start"]) == "2024-01-10 10:00:00"
    assert str(r2["session_end"]) == "2024-01-10 10:20:00"
    assert r2["n_events"] == 2
