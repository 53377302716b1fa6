"""Watermarked event-time windowed aggregation — the Structured Streaming
capability layer above the ingest pipeline.

The reference needs none of this: its records index by their own event time,
so late arrivals just land in old day-buckets (record.py:171-192) and there
is no aggregation to finalize.  The Spark engine keeps that property for the
catalog (append + query-time dedup) and adds real streaming aggregation for
the analytics surface: `withWatermark` bounds state, tumbling windows
finalize exactly once (append mode), and rows later than the watermark are
dropped — the batch twins of these plans are oracle-checked in
queries/windows_q.py (q_tumbling_window / q_sliding_window /
q_session_window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    time_col: str = "event_time",
    window: str = "1 hour",
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("what",),
) -> DataFrame:
    """Tumbling-window counts per key over an epoch-ms event-time column.

    Works on both streaming and batch frames (batch ignores the watermark —
    Spark's unified semantics).  In append mode a window emits exactly once,
    when the watermark passes its end; rows arriving later than the
    watermark are dropped, bounding state at |keys| × (window + watermark).
    """
    ts = F.timestamp_millis(F.col(time_col))
    key_cols = [F.col(k) for k in keys]
    return (
        events.withColumn("_ts", ts)
        .withWatermark("_ts", watermark)
        .groupBy(F.window("_ts", window).alias("w"), *key_cols)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_millis(F.col("w.start")).alias("w_start_ms"),
            F.unix_millis(F.col("w.end")).alias("w_end_ms"),
            *keys,
            "n_events",
        )
    )
