"""Streaming event analytics — watermarked windowed aggregation and a
custom stateful sessionizer.

These are the Structured Streaming counterparts of the engine's batch
facet.range over the events table: the same time-bucketed counts,
computed incrementally as events arrive, with event-time watermarks
bounding state and dropping late data (Solr keeps no streaming
analytics surface; the reference workload's "index the stream, facet
the result" loop collapses into readStream -> window -> sink).

* ``windowed_event_counts`` — declarative: withWatermark + groupBy
  (window(ts), event_type).  Spark maintains the per-window partial
  aggregates in its state store; the watermark both expires state and
  drops events later than the configured lateness.

* ``sessionize_events`` — the applyInPandasWithState custom stateful
  operator: per-user session windows with an inactivity gap, the
  canonical "semantics the built-in operators genuinely can't
  express" case (a session's extent depends on the event sequence
  itself).  State per user = the open session (start, last event,
  count); an event past the gap CLOSES the current session (emitted
  downstream) and opens a new one; an event-time timeout flushes the
  open session once the watermark passes last_ts + gap.  Sessions
  close deterministically regardless of micro-batch boundaries —
  state carries across batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["windowed_event_counts", "sessionize_events"]


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 day",
    watermark: str = "1 day",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts per key with an event-time watermark.
    Late events (older than max(event time) - watermark) are dropped;
    window state is expired once the watermark passes the window end —
    bounded state at any input volume."""
    # watermarks require TIMESTAMP (parquet event tables often carry
    # TIMESTAMP_NTZ); the cast interprets in the session timezone
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "count",
        )
    )


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
_STATE_SCHEMA = "start long, last long, n long"


def sessionize_events(
    stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 day",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user sessionization with an inactivity gap.

    Emits one row per CLOSED session: closed by a subsequent event
    arriving more than ``gap_seconds`` after the session's last event,
    or by the event-time timeout once the watermark passes
    last + gap.  Timestamps are treated as UTC epoch seconds
    internally (state must be primitive-typed)."""
    import pandas as pd

    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap = int(gap_seconds)

    def fn(key, pdfs, state: GroupState):
        uid = key[0]
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                state.remove()
                yield pd.DataFrame({
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                })
            return
        ts_all = []
        for pdf in pdfs:
            ts_all.append(pdf["_epoch"])
        ts = pd.concat(ts_all).sort_values().to_numpy()
        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0
        out = []
        for t in ts:
            t = int(t)
            if last is None:
                start, last, n = t, t, 1
            elif t - last > gap:
                out.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((int(start), int(last), int(n)))
        # flush the open session once the watermark passes last + gap
        state.setTimeoutTimestamp((int(last) + gap) * 1000)
        if out:
            yield pd.DataFrame({
                "user_id": uid,
                "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in out],
                "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in out],
                "n_events": [n_ for _, _, n_ in out],
            })

    prepped = (
        stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).alias("user_id"),
            F.col(ts_col),
            F.unix_timestamp(ts_col).alias("_epoch"),
        )
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
