"""Streaming deduplication — the training-pipeline primitive for exact
dedup over a document stream, with state bounded by a watermark.

Two tiers:

- ``dedup_stream``: drop duplicate keys forever (unbounded state — only for
  key spaces that fit, e.g. per-day partitions re-keyed upstream).
- ``dedup_stream_within_watermark``: drop duplicates whose twins arrive
  within the watermark horizon (``dropDuplicatesWithinWatermark``);
  state is bounded by (arrival rate × watermark), the 100 TB shape.  A
  duplicate that arrives later than the watermark is passed through — the
  batch-side exact dedup (operators/dedup.py:exact_dedup) is the terminal
  cleanup, same contract the reference's at-least-once ingest has with its
  query-time dedup-by-id (SURVEY §2.1 O7).

Keys default to the content hash, so the pair (streaming pre-dedup →
batch exact dedup) forms the standard two-stage dedup funnel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(stream: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Exactly-once keys across the whole stream lifetime.  State grows with
    distinct keys — bound it upstream (e.g. re-key by day) or prefer
    :func:`dedup_stream_within_watermark`."""
    return stream.dropDuplicates(key_cols or ["hash"])


def dedup_stream_within_watermark(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    time_col: str = "ms",
    watermark: str = "1 hour",
) -> DataFrame:
    """Bounded-state streaming dedup: duplicates arriving within
    ``watermark`` of event time are dropped; state expires after the
    horizon.  ``time_col`` is epoch-ms."""
    with_ts = stream.withColumn("_ts", F.timestamp_millis(F.col(time_col)))
    return (
        with_ts.withWatermark("_ts", watermark)
        .dropDuplicatesWithinWatermark(key_cols or ["hash"])
        .drop("_ts")
    )
