"""Watermarked stream-stream and stream-static joins.

The reference has no streaming joins (its ingester processes one S3 event at
a time, ingester.py:88-137); this is the Structured Streaming capability
layer for correlating two live event flows — the canonical
impression×click attribution shape — with both sides' state bounded by
watermarks and the join condition carrying an explicit event-time band.

Scale notes: a stream-stream inner join shuffles both sides on the key and
keeps per-key state until the watermark passes `band`; state size ≈
rate × (watermark + band) per side.  The time-band predicate is REQUIRED —
without it Spark must retain unbounded state (and refuses in append mode).
Stream-static joins need no watermark on the static side: each micro-batch
joins against the table snapshot (broadcast when small — the dimension
enrichment path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "what",
    left_time: str = "event_time",
    right_time: str = "event_time",
    watermark: str = "30 minutes",
    band: str = "15 minutes",
    how: str = "inner",
    suffix: str = "_right",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands within
    ``[left_time, left_time + band]`` — impression→click attribution.

    Both sides get the same ``watermark``; epoch-ms long time columns
    become proper timestamps (`_lts`/`_rts` in the output).  Right-side
    payload columns that collide with a left-side name get ``suffix``
    (as asof_join does), so name-based selection stays unambiguous.
    Outer modes emit the unmatched side once its watermark expires (Spark
    semantics).  Works identically on batch frames (unified API,
    watermarks ignored) — which is what the oracle-checked batch twin
    relies on.
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(f"unsupported stream-stream join mode {how!r}")
    l_payload = [c for c in left.columns if c not in (key, left_time)]
    l = (
        left.withColumn("_lts", F.timestamp_millis(F.col(left_time)))
        .withWatermark("_lts", watermark)
        .select(F.col(key).alias("_lkey"), "_lts", *l_payload)
    )
    taken = set(l_payload) | {key, left_time, "_lkey", "_lts"}
    r = (
        right.withColumn("_rts", F.timestamp_millis(F.col(right_time)))
        .withWatermark("_rts", watermark)
        .select(
            F.col(key).alias("_rkey"), "_rts",
            *[
                F.col(c).alias(c + suffix) if c in taken else F.col(c)
                for c in right.columns if c not in (key, right_time)
            ],
        )
    )
    cond = (
        (F.col("_lkey") == F.col("_rkey"))
        & (F.col("_rts") >= F.col("_lts"))
        & (F.col("_rts") <= F.col("_lts") + F.expr(f"INTERVAL {band}"))
    )
    return l.join(r, cond, how)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "what",
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension table — per-micro-batch join
    against the current snapshot; Catalyst broadcasts the dimension when it
    fits, so the stream side never shuffles."""
    dim_cols = [c for c in dim.columns if c != key]
    return stream.join(
        F.broadcast(dim.select(key, *dim_cols)), on=key, how=how
    )
