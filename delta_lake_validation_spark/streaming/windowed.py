"""Streaming transformations over an event stream.

All operators take an unbounded DataFrame (from ``spark.readStream``) whose
event-time column is a TIMESTAMP, and return transformed unbounded frames —
sink/trigger choices belong to the caller.  Watermarks bound state: at 100 TB
/day ingest the state store only holds windows newer than the watermark, so
memory is O(windows-in-flight), not O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts_utc",
    window: str = "1 hour",
    watermark: str = "2 hours",
    key: str | None = "event_type",
) -> DataFrame:
    """Per-window (optionally per-key) event counts with late-data handling."""
    keys = [F.window(ts_col, window).alias("w")] + ([F.col(key)] if key else [])
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *([F.col(key)] if key else []),
            "n",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts_utc",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts — each event lands in window/slide windows."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts_utc",
    gap: str = "5 minutes",
    watermark: str = "30 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based) per key — built-in session_window keeps
    the stateful merge JVM-side (no applyInPandasWithState needed for this
    shape; that API remains the escape hatch for custom state machines)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    ts_col: str = "ts_utc",
    id_col: str = "event_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same id within the
    watermark horizon (state auto-expires beyond it).  Keys on the id ALONE
    — an at-least-once producer may re-stamp the timestamp on retry, and a
    (id, ts) key would pass such re-deliveries through as distinct."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    right_key: str | None = None,
    left_ts: str = "ts_utc",
    right_ts: str = "ts_utc",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with right events of
    the same key whose timestamp falls in ``[left_ts - lookback, left_ts)``
    (the streaming twin of the batch attribution_window_join, including its
    strict upper bound — a right event at exactly the left timestamp does
    not match on either path).

    Both sides carry a watermark, so Spark bounds the join state: a buffered
    right row is dropped once the left watermark passes its timestamp plus
    ``lookback`` — state is O(rate × lookback) per key range, never
    O(history).  The time-bound condition is what makes an unbounded
    stream-stream join feasible at all; without it Spark must keep every row
    forever (and refuses in append mode).
    """
    rk = right_key or key
    lt, rt = f"l.{left_ts}", f"r.{right_ts}"
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    return lw.join(
        rw,
        F.expr(
            f"l.{key} = r.{rk} AND {rt} < {lt} "
            f"AND {rt} >= {lt} - INTERVAL {lookback}"
        ),
        "inner",
    )
