"""Event-time window battery over the events table: tumbling and sliding
`F.window`, `F.session_window`, and value-navigation frames (first/last/
nth_value).  These are the batch twins of the Structured Streaming windowed
aggregations (streaming/ingest.py) — identical Column API, so a pipeline
validated here runs unchanged under readStream with a watermark.

Oracles recompute window assignment arithmetically (epoch-ms floor division
for tumbling/sliding, gaps-and-islands for sessions), so the gate pins
Spark's window semantics — epoch-aligned starts, [start, end) bounds,
session end = last event + gap, merge at diff <= gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datalake_spark.queries import Q, dsum, load, sql_dsum

_H6_MS = 6 * 3600 * 1000
_DAY_MS = 24 * 3600 * 1000
_GAP_MS = 30 * 60 * 1000


# ---------------------------------------------------------------------------
# q_tumbling_window — 6-hour tumbling windows.  At scale: one shuffle on the
# window key with map-side partial aggregation; identical to the streaming
# plan minus the state store.
# ---------------------------------------------------------------------------
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("w_start_ms"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


Q_TUMBLING_SQL = f"""
SELECT (epoch_ms(ts) // {_H6_MS}) * {_H6_MS} AS w_start_ms, event_type,
       COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_sliding_window — 1-day windows sliding every 6 h: each event lands in 4
# overlapping windows (Spark's Expand).  The oracle replays the assignment
# with a generate_series cross join.
# ---------------------------------------------------------------------------
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day", "6 hours").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            F.unix_millis(F.col("w.start")).alias("w_start_ms"),
            F.unix_millis(F.col("w.end")).alias("w_end_ms"),
            "n_events",
            "sum_value",
        )
    )


Q_SLIDING_SQL = f"""
WITH assigned AS (
  SELECT value, ((epoch_ms(ts) // {_H6_MS}) - j) * {_H6_MS} AS w_start_ms
  FROM events CROSS JOIN (SELECT UNNEST(generate_series(0, 3)) AS j))
SELECT w_start_ms, w_start_ms + {_DAY_MS} AS w_end_ms,
       COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
FROM assigned GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q_session_window — 30-min-gap sessions per user via F.session_window (the
# native session operator; `sessionize` in pipeline_q is the hand-rolled
# gaps-and-islands twin).  Session end = last event + gap; events exactly
# gap apart merge.
# ---------------------------------------------------------------------------
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end")).alias("session_end_ms"),
            "n_events",
            "sum_value",
        )
    )


Q_SESSION_WINDOW_SQL = f"""
WITH e AS (
  SELECT user_id, value, epoch_ms(ts) AS ts_ms FROM events),
flagged AS (
  SELECT *, CASE WHEN ts_ms - LAG(ts_ms) OVER w > {_GAP_MS} THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged)
SELECT user_id, MIN(ts_ms) AS session_start_ms,
       MAX(ts_ms) + {_GAP_MS} AS session_end_ms,
       COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
FROM sess GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# q_value_navigation — first_value / last_value / nth_value over full-frame
# windows (the order-statistics navigation battery).
# ---------------------------------------------------------------------------
def q_value_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 5 == 0)
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.first_value("o_totalprice").over(w).alias("cheapest"),
        F.last_value("o_totalprice").over(w).alias("priciest"),
        F.nth_value("o_totalprice", 3).over(w).alias("third_cheapest"),
    )


Q_VALUE_NAV_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       FIRST_VALUE(o_totalprice) OVER w AS cheapest,
       LAST_VALUE(o_totalprice) OVER w AS priciest,
       NTH_VALUE(o_totalprice, 3) OVER w AS third_cheapest
FROM orders WHERE o_orderkey % 5 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# ---------------------------------------------------------------------------
# q_moving_avg — bounded ROWS frame (3 preceding .. 1 following): the
# centered moving aggregate; decimal-exact so every prefix matches.
# ---------------------------------------------------------------------------
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 25 == 0)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(-3, 1)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
        (
            F.sum(F.col("value").cast("decimal(20,4)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    )


Q_MOVING_AVG_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_in_frame,
       CAST(SUM(CAST(value AS DECIMAL(20,4))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg
FROM events WHERE user_id % 25 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
             ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING)
"""


QUERIES = [
    Q("q_tumbling_window", q_tumbling_window, Q_TUMBLING_SQL, "6h tumbling window agg"),
    Q("q_moving_avg", q_moving_avg, Q_MOVING_AVG_SQL, "bounded ROWS moving aggregate"),
    Q("q_sliding_window", q_sliding_window, Q_SLIDING_SQL, "1d/6h sliding window agg"),
    Q("q_session_window", q_session_window, Q_SESSION_WINDOW_SQL, "native session windows"),
    Q("q_value_navigation", q_value_navigation, Q_VALUE_NAV_SQL, "first/last/nth_value"),
]
