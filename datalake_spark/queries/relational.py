"""Relational operator surface (SURVEY.md §2.2 "SPARK" column): joins of all
flavors, hash aggregation, rollup/cube, windows, set ops, sorts/top-k, scalar
string/date/conditional functions — declared over the TPC-H-ish test tables
with DuckDB oracles.

Scale notes are attached per query: the pattern each exercises is the one a
1000-executor plan needs (broadcast for dims, partial aggregation, AQE skew
handling); `bench.py` measures the headline ones at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datalake_spark.queries import Q, load, dsum, davg, sql_dsum, sql_davg


def _revenue(alias: str = "revenue") -> F.Column:
    """Exact decimal revenue: cast raw columns (tie-free), multiply in
    decimal, sum exactly, surface as double — bit-identical across engines."""
    ep = F.col("l_extendedprice").cast("decimal(12,4)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    return F.round(F.sum(ep * (1 - disc)), 4).cast("double").alias(alias)


_REVENUE_SQL = (
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (1 - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS revenue"
)


# ---------------------------------------------------------------------------
# q1_pricing_summary — TPC-H Q1: the canonical partial+final hash aggregate.
# At scale: map-side combine reduces shuffle to |groups|×partitions rows.
# ---------------------------------------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # arithmetic stays in DECIMAL end-to-end: casting a *computed* double to
    # decimal rounds differently across engines at ULP boundaries, but casting
    # the raw 2-decimal columns is tie-free, and decimal ×/+ are exact.
    ep = F.col("l_extendedprice").cast("decimal(12,4)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    tax = F.col("l_tax").cast("decimal(6,4)")
    disc_price = ep * (1 - disc)
    charge = ep * (1 - disc) * (1 + tax)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.round(F.sum(disc_price), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 4).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_charge,
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3_shipping_priority — TPC-H Q3: selective dim filter + two joins + top-k.
# At scale: customer filter broadcast into orders, orders⋈lineitem shuffles on
# orderkey; top-10 via total order (revenue desc, orderkey) so AQE can take
# a partial limit per partition.
# ---------------------------------------------------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp_ntz")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue())
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority,
       {_REVENUE_SQL}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5_local_supplier — TPC-H Q5: 6-way join with two small broadcast dims and
# the c_nationkey = s_nationkey cross-dimension condition.
# ---------------------------------------------------------------------------
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_revenue())
    )


Q5_SQL = f"""
SELECT n_name, {_REVENUE_SQL}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q_rollup — hierarchical aggregate (GROUP BY ROLLUP): partial aggregation of
# the finest grain then re-aggregation; Spark's Expand node mirrors DuckDB's.
# ---------------------------------------------------------------------------
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "sum_qty"),
    )


Q_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "sum_price"),
    )


Q_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, {sql_dsum('o_totalprice', 'sum_price')}
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# q_topk_per_group — ranking window + filter: the distributed top-k pattern
# (single shuffle on the partition key; no global sort).
# ---------------------------------------------------------------------------
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


Q_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# q_window_running — frame-based analytics: running sum + lag over a total
# per-partition order.  Decimal-exact running sum keeps both engines
# bit-identical at every prefix.
# ---------------------------------------------------------------------------
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") % 10 == 0)
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w = W.partitionBy("l_suppkey").orderBy(*order)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(20,4)"))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_qty"),
        F.lag("l_quantity", 1).over(w).alias("prev_qty"),
        F.lead("l_quantity", 1).over(w).alias("next_qty"),
    )


Q_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) OVER w AS DOUBLE) AS running_qty,
       LAG(l_quantity, 1) OVER w AS prev_qty,
       LEAD(l_quantity, 1) OVER w AS next_qty
FROM lineitem
WHERE l_suppkey % 10 = 0
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# q_semi_join / q_anti_join — EXISTS / NOT EXISTS as left-semi/left-anti.
# At scale: the distinct key side is far smaller than the fact table; Spark
# broadcasts it post-AQE.
# ---------------------------------------------------------------------------
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    )


Q_SEMI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers_with_orders
FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers_without_orders"),
            davg("c_acctbal", "avg_acctbal"),
        )
    )


Q_ANTI_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n_customers_without_orders,
       {sql_davg('c_acctbal', 'avg_acctbal')}
FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q_setops — EXCEPT/INTERSECT/UNION (distinct semantics in both engines).
# ---------------------------------------------------------------------------
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    only_cust = cust.subtract(supp).withColumn("side", F.lit("customer_only"))
    both = cust.intersect(supp).withColumn("side", F.lit("both"))
    return only_cust.unionByName(both).select("side", "nationkey")


Q_SETOPS_SQL = """
SELECT 'customer_only' AS side, nationkey FROM (
  SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
  EXCEPT
  SELECT CAST(s_nationkey AS INTEGER) FROM supplier)
UNION ALL
SELECT 'both' AS side, nationkey FROM (
  SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
  INTERSECT
  SELECT CAST(s_nationkey AS INTEGER) FROM supplier)
"""


# ---------------------------------------------------------------------------
# q_scalar_string — codegen'd string expression battery.
# ---------------------------------------------------------------------------
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_name").alias("name_lower"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).alias("brand_num"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
    )


Q_STRING_SQL = """
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       LOWER(p_name) AS name_lower,
       SUBSTRING(p_type, 1, 4) AS type_prefix,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       COALESCE(REGEXP_EXTRACT(p_brand, '([0-9]+)', 1), '') AS brand_num,
       REPLACE(p_type, ' ', '_') AS type_snake,
       REVERSE(p_brand) AS brand_rev,
       LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded
FROM part
"""


# ---------------------------------------------------------------------------
# q_scalar_datetime — date/time function battery (output as strings/ints).
# ---------------------------------------------------------------------------
def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.datediff(
            F.lit("2002-01-01").cast("timestamp_ntz").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).cast("bigint").alias("days_to_2002"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd").alias("due_date"),
    )


Q_DATETIME_SQL = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
       CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
       CAST(DAYOFMONTH(o_orderdate) AS INTEGER) AS order_day,
       CAST(QUARTER(o_orderdate) AS INTEGER) AS order_quarter,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date
FROM orders
"""


# ---------------------------------------------------------------------------
# q_conditional — CASE/NULLIF/COALESCE battery + conditional aggregation.
# ---------------------------------------------------------------------------
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_discount") < 0.03, "low")
        .when(F.col("l_discount") < 0.07, "mid")
        .otherwise("high")
    )
    return (
        li.withColumn("disc_band", band)
        .groupBy("disc_band", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.nullif(F.col("l_tax"), F.lit(0.0))).alias("n_taxed"),
            F.round(
                F.sum(
                    F.coalesce(
                        F.nullif(
                            F.col("l_discount").cast("decimal(6,4)"),
                            F.lit(0).cast("decimal(6,4)"),
                        )
                        * F.col("l_extendedprice").cast("decimal(12,4)"),
                        F.lit(0).cast("decimal(18,8)"),
                    )
                ),
                4,
            )
            .cast("double")
            .alias("discount_value"),
        )
    )


Q_CONDITIONAL_SQL = f"""
SELECT CASE WHEN l_discount < 0.03 THEN 'low'
            WHEN l_discount < 0.07 THEN 'mid'
            ELSE 'high' END AS disc_band,
       l_returnflag,
       COUNT(*) AS n,
       COUNT(NULLIF(l_tax, 0.0)) AS n_taxed,
       CAST(ROUND(SUM(COALESCE(NULLIF(CAST(l_discount AS DECIMAL(6,4)), CAST(0 AS DECIMAL(6,4)))
                * CAST(l_extendedprice AS DECIMAL(12,4)),
                CAST(0 AS DECIMAL(18,8)))), 4) AS DOUBLE) AS discount_value
FROM lineitem
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q_range_join — interval (theta) join: events against overlapping 10-day
# windows.  At scale the small interval side broadcasts, so the non-equi
# condition never forces a cartesian shuffle (BroadcastNestedLoopJoin).
# ---------------------------------------------------------------------------
_WINDOW_N = 12
_WINDOW_STEP_MS = 3 * 24 * 3600 * 1000  # every 3 days
_WINDOW_LEN_MS = 10 * 24 * 3600 * 1000  # 10-day windows (overlapping)
_T0 = 1704067200000  # 2024-01-01T00:00:00Z


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    windows = spark.range(_WINDOW_N).select(
        F.col("id").cast("int").alias("window_id"),
        (F.lit(_T0) + F.col("id") * _WINDOW_STEP_MS).alias("w_start"),
        (F.lit(_T0) + F.col("id") * _WINDOW_STEP_MS + _WINDOW_LEN_MS).alias("w_end"),
    )
    return (
        ev.join(
            F.broadcast(windows),
            (F.col("ts_ms") >= F.col("w_start")) & (F.col("ts_ms") < F.col("w_end")),
        )
        .groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
    )


Q_RANGE_JOIN_SQL = f"""
WITH windows AS (
  SELECT CAST(i AS INTEGER) AS window_id,
         {_T0} + i * {_WINDOW_STEP_MS} AS w_start,
         {_T0} + i * {_WINDOW_STEP_MS} + {_WINDOW_LEN_MS} AS w_end
  FROM generate_series(0, {_WINDOW_N - 1}) AS t(i))
SELECT window_id, COUNT(*) AS n_events, {sql_dsum('value', 'sum_value')}
FROM events JOIN windows
  ON epoch_ms(ts) >= w_start AND epoch_ms(ts) < w_end
GROUP BY window_id
"""


# ---------------------------------------------------------------------------
# q_pivot — pivot event_type into columns (conditional aggregation).
# ---------------------------------------------------------------------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
        .select(
            "user_id",
            *[F.col(t).alias(f"n_{t}") for t in _EVENT_TYPES],
        )
    )


Q_PIVOT_SQL = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS n_click,
       COUNT(*) FILTER (event_type = 'error') AS n_error,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# q_distinct_counts — exact distinct aggregation (expand-based in Spark).
# approx_count_distinct is exercised separately (no oracle — sketch differs).
# ---------------------------------------------------------------------------
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


QUERIES = [
    Q("q1_pricing_summary", q1_pricing_summary, Q1_SQL, "TPC-H Q1 hash aggregate"),
    Q("q3_shipping_priority", q3_shipping_priority, Q3_SQL, "join + top-k"),
    Q("q5_local_supplier", q5_local_supplier, Q5_SQL, "6-way join"),
    Q("q_rollup", q_rollup, Q_ROLLUP_SQL, "GROUP BY ROLLUP"),
    Q("q_cube", q_cube, Q_CUBE_SQL, "GROUP BY CUBE"),
    Q("q_topk_per_group", q_topk_per_group, Q_TOPK_SQL, "ranking window"),
    Q("q_window_running", q_window_running, Q_RUNNING_SQL, "frame window + lag/lead"),
    Q("q_semi_join", q_semi_join, Q_SEMI_SQL, "EXISTS"),
    Q("q_anti_join", q_anti_join, Q_ANTI_SQL, "NOT EXISTS"),
    Q("q_setops", q_setops, Q_SETOPS_SQL, "EXCEPT/INTERSECT/UNION"),
    Q("q_scalar_string", q_scalar_string, Q_STRING_SQL, "string functions"),
    Q("q_scalar_datetime", q_scalar_datetime, Q_DATETIME_SQL, "date functions"),
    Q("q_conditional", q_conditional, Q_CONDITIONAL_SQL, "CASE/NULLIF/COALESCE"),
    Q("q_range_join", q_range_join, Q_RANGE_JOIN_SQL, "interval theta join"),
    Q("q_pivot", q_pivot, Q_PIVOT_SQL, "pivot"),
    Q("q_distinct_counts", q_distinct_counts, Q_DISTINCT_SQL, "count distinct"),
]
