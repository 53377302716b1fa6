"""Second relational battery (SURVEY.md §2.2 "SPARK" column continued):
outer/full joins, correlated EXISTS, scalar + IN subqueries, analytic window
functions, RANGE frames, string aggregation, math functions, lateral explode,
HAVING, and three more TPC-H-shaped queries (Q6/Q10/Q18 adapted to the test
schema) — all with DuckDB oracles.

Scale notes per query; the float discipline from queries/__init__.py applies
(decimal-exact sums, rounded surfaces, total orders under every limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datalake_spark.queries import Q, load, davg, dsum, sql_davg, sql_dsum
from datalake_spark.queries.relational import _revenue, _REVENUE_SQL


# ---------------------------------------------------------------------------
# q6_forecast_revenue — TPC-H Q6: pure scan + filter + global aggregate.
# At scale this is the pushdown showcase: all three predicates reach the
# parquet reader (row-group stats skip), no shuffle at all beyond the final
# single-row reduce.
# ---------------------------------------------------------------------------
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    ep = F.col("l_extendedprice").cast("decimal(12,4)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(ep * disc), 4).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                      * CAST(l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q10_returned_items — TPC-H Q10: returned-item revenue per customer, top 20.
# At scale: orders filtered to one quarter before the join (pushdown), nation
# broadcast, top-20 via total order so AQE takes partial limits.
# ---------------------------------------------------------------------------
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_mktsegment")
        .agg(_revenue(), davg("c_acctbal", "acctbal"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, n_name, c_mktsegment, {_REVENUE_SQL},
       {sql_davg('c_acctbal', 'acctbal')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q18_large_orders — TPC-H Q18: HAVING-on-aggregate then join back to the
# fact table (the classic "aggregate as join filter").  At scale the qualified
# key set is tiny → broadcast back into lineitem/orders.
# ---------------------------------------------------------------------------
_Q18_QTY = 300


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("_qty"))
        .filter(F.col("_qty") > _Q18_QTY)
        .select("l_orderkey", F.col("_qty").cast("double").alias("total_qty"))
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_totalprice, total_qty
FROM orders
JOIN (SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(20,4))) > {_Q18_QTY}) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# q_left_outer — left outer join with null-producing right side: per order,
# how many of its lineitems shipped in the late tail.  Orders with none keep
# a row (nulls counted separately) — the semantics LEFT JOIN exists for.
# ---------------------------------------------------------------------------
def q_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    late = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp_ntz")
    )
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count("l_orderkey").alias("n_late_items"),
            F.countDistinct(
                F.when(F.col("l_orderkey").isNull(), F.col("o_orderkey"))
            ).alias("n_orders_no_late"),
        )
    )


Q_LEFT_OUTER_SQL = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       COUNT(l_orderkey) AS n_late_items,
       COUNT(DISTINCT CASE WHEN l_orderkey IS NULL THEN o_orderkey END) AS n_orders_no_late
FROM orders
LEFT JOIN (SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01') li
  ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q_full_outer — full outer join of two asymmetric per-nation aggregates
# (negative-balance customers vs negative-balance suppliers); either side may
# be missing → null counts survive to the output.
# ---------------------------------------------------------------------------
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .groupBy(F.col("c_nationkey").cast("int").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_neg_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .groupBy(F.col("s_nationkey").cast("int").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_neg_suppliers"))
    )
    return c.join(s, F.col("c_nk") == F.col("s_nk"), "full_outer").select(
        F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nationkey"),
        "n_neg_customers",
        "n_neg_suppliers",
    )


Q_FULL_OUTER_SQL = """
SELECT COALESCE(c_nk, s_nk) AS nationkey, n_neg_customers, n_neg_suppliers
FROM (SELECT CAST(c_nationkey AS INTEGER) AS c_nk, COUNT(*) AS n_neg_customers
      FROM customer WHERE c_acctbal < 0 GROUP BY 1) c
FULL OUTER JOIN
     (SELECT CAST(s_nationkey AS INTEGER) AS s_nk, COUNT(*) AS n_neg_suppliers
      FROM supplier WHERE s_acctbal < 0 GROUP BY 1) s
  ON c_nk = s_nk
"""


# ---------------------------------------------------------------------------
# q_correlated_exists — correlated EXISTS with a non-equi component: orders
# having at least one lineitem shipped >90 days after the order date.  Spark
# plans the equi part (orderkey) as the join key and the date comparison as a
# join residual — still a single shuffle, no nested loop.
# ---------------------------------------------------------------------------
def q_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_slow_orders"))
    )


Q_CORR_EXISTS_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_slow_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q_scalar_subquery — TPC-H Q17 shape: per-part average quantity as a scalar
# correlated subquery; DataFrame side computes the aggregate once and joins
# (broadcast — it is |parts of one brand| rows at scale).
# ---------------------------------------------------------------------------
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    li = load(spark, sf_dir, "lineitem")
    li_b = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    avg_q = li_b.groupBy(F.col("l_partkey").alias("_pk")).agg(
        davg("l_quantity", "avg_qty")
    )
    return (
        li_b.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice", "below_avg_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q_SCALAR_SUB_SQL = f"""
SELECT {sql_dsum('l1.l_extendedprice', 'below_avg_price')}, COUNT(*) AS n_rows
FROM lineitem l1 JOIN part p1 ON l1.l_partkey = p1.p_partkey
WHERE p1.p_brand = 'Brand#12'
  AND l1.l_quantity < 0.5 * (
        SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(20,4))) AS DOUBLE) / COUNT(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
"""


# ---------------------------------------------------------------------------
# q_sql_subqueries — the spark.sql() surface: one SQL text with nested IN /
# NOT IN subqueries runs verbatim on both engines (temp views registered from
# the same parquet).  Catalyst rewrites IN → left-semi and NOT IN → null-aware
# anti join automatically.
# ---------------------------------------------------------------------------
_SUBQ_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_regionkey IN (SELECT r_regionkey FROM region
                                            WHERE r_name IN ('EUROPE', 'ASIA')))
  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
GROUP BY c_mktsegment
"""


def q_sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "nation", "region", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SUBQ_SQL)


# ---------------------------------------------------------------------------
# q_window_analytic — ranking/distribution battery: ntile, percent_rank,
# cume_dist, rank, dense_rank over a total per-partition order.
# ---------------------------------------------------------------------------
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


Q_WINDOW_ANALYTIC_SQL = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
FROM orders WHERE o_orderkey % 7 = 0
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


# ---------------------------------------------------------------------------
# q_range_frame — value-based (RANGE) window frame: for each customer, count
# and sum of same-nation customers within ±$100 of their balance.  Order key
# is exact integer cents so the frame bounds are engine-identical.
# ---------------------------------------------------------------------------
def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").withColumn(
        "bal_cents", F.round(F.col("c_acctbal") * 100).cast("bigint")
    )
    w = (
        W.partitionBy("c_nationkey")
        .orderBy("bal_cents")
        .rangeBetween(-10000, 10000)
    )
    return cust.select(
        "c_custkey",
        F.col("c_nationkey").cast("int").alias("nationkey"),
        "bal_cents",
        F.count(F.lit(1)).over(w).alias("n_near"),
        F.sum(F.col("bal_cents")).over(w).cast("bigint").alias("sum_near_cents"),
    )


Q_RANGE_FRAME_SQL = """
SELECT c_custkey, CAST(c_nationkey AS INTEGER) AS nationkey, bal_cents,
       COUNT(*) OVER w AS n_near,
       CAST(SUM(bal_cents) OVER w AS BIGINT) AS sum_near_cents
FROM (SELECT c_custkey, c_nationkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer)
WINDOW w AS (PARTITION BY c_nationkey ORDER BY bal_cents
             RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING)
"""


# ---------------------------------------------------------------------------
# q_string_agg — ordered string aggregation (collect_list → sort → join; the
# Spark shape of LISTAGG/STRING_AGG).
# ---------------------------------------------------------------------------
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias(
                "supplier_names"
            ),
        )
    )


Q_STRING_AGG_SQL = """
SELECT n_name, COUNT(*) AS n_suppliers,
       STRING_AGG(s_name, ',' ORDER BY s_name) AS supplier_names
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# q_math_funcs — math scalar battery; transcendentals rounded to 6 places so
# sub-ULP libm differences cannot surface.
# ---------------------------------------------------------------------------
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).cast("bigint").alias("abs_off"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.round("p_retailprice", 1).alias("price_r1"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 6).alias("size_sqrt"),
        F.round(F.log(F.col("p_retailprice")), 6).alias("price_ln"),
        F.round(F.log10(F.col("p_retailprice")), 6).alias("price_log10"),
        F.pow(F.col("p_size").cast("double"), 2).alias("size_sq"),
        F.signum(F.col("p_size").cast("double") - 25).cast("int").alias("size_sign"),
        F.greatest(F.col("p_size"), F.lit(25)).cast("int").alias("size_hi"),
        F.least(F.col("p_size"), F.lit(25)).cast("int").alias("size_lo"),
        (F.col("p_size") % 7).cast("int").alias("size_mod7"),
    )


Q_MATH_SQL = """
SELECT p_partkey,
       CAST(ABS(p_size - 25) AS BIGINT) AS abs_off,
       CAST(CEIL(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
       ROUND(p_retailprice, 1) AS price_r1,
       ROUND(SQRT(CAST(p_size AS DOUBLE)), 6) AS size_sqrt,
       ROUND(LN(p_retailprice), 6) AS price_ln,
       ROUND(LOG10(p_retailprice), 6) AS price_log10,
       POW(CAST(p_size AS DOUBLE), 2) AS size_sq,
       CAST(SIGN(CAST(p_size AS DOUBLE) - 25) AS INTEGER) AS size_sign,
       CAST(GREATEST(p_size, 25) AS INTEGER) AS size_hi,
       CAST(LEAST(p_size, 25) AS INTEGER) AS size_lo,
       CAST(p_size % 7 AS INTEGER) AS size_mod7
FROM part
"""


# ---------------------------------------------------------------------------
# q_having — aggregate filter (HAVING) over a broadcast-dim join.
# ---------------------------------------------------------------------------
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"), davg("c_acctbal", "avg_bal"))
        .filter((F.col("n_customers") >= 5) & (F.col("avg_bal") > 4000))
    )


Q_HAVING_SQL = f"""
SELECT n_name, COUNT(*) AS n_customers, {sql_davg('c_acctbal', 'avg_bal')}
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
HAVING COUNT(*) >= 5 AND CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) / COUNT(c_acctbal) > 4000
"""


# ---------------------------------------------------------------------------
# q_explode_pos — lateral positional explode (UNNEST WITH ORDINALITY shape).
# DuckDB 1.0 has no WITH ORDINALITY; generate_subscripts zips with UNNEST.
# ---------------------------------------------------------------------------
def q_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 8)
    return emb.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "vec_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.col("val").cast("double").alias("val"),
    )


Q_EXPLODE_SQL = """
SELECT vec_id,
       CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS pos,
       CAST(UNNEST(embedding) AS DOUBLE) AS val
FROM embeddings WHERE vec_id < 8
"""


# ---------------------------------------------------------------------------
# q_union_stats — unionByName of two identically-shaped aggregates.
# ---------------------------------------------------------------------------
def q_union_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"), davg("c_acctbal", "avg_bal"))
        .withColumn("side", F.lit("customer"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").cast("int").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n"), davg("s_acctbal", "avg_bal"))
        .withColumn("side", F.lit("supplier"))
    )
    return cust.unionByName(supp).select("side", "nationkey", "n", "avg_bal")


Q_UNION_STATS_SQL = f"""
SELECT 'customer' AS side, CAST(c_nationkey AS INTEGER) AS nationkey,
       COUNT(*) AS n, {sql_davg('c_acctbal', 'avg_bal')}
FROM customer GROUP BY c_nationkey
UNION ALL
SELECT 'supplier' AS side, CAST(s_nationkey AS INTEGER) AS nationkey,
       COUNT(*) AS n, {sql_davg('s_acctbal', 'avg_bal')}
FROM supplier GROUP BY s_nationkey
"""


# ---------------------------------------------------------------------------
# q_map_funcs — map construction + extraction battery (create_map /
# element_at / map_keys / cardinality), surfaced as scalars so the two
# engines' map renderings never meet the comparator.
# ---------------------------------------------------------------------------
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 17 == 0)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "uid").alias("m_uid"),
        F.element_at(m, "missing").alias("m_missing"),
        F.size(m).cast("bigint").alias("m_size"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
    )


Q_MAP_SQL = """
SELECT event_id,
       m['type'][1] AS m_type,
       m['uid'][1] AS m_uid,
       m['missing'][1] AS m_missing,
       CAST(cardinality(m) AS BIGINT) AS m_size,
       array_to_string(map_keys(m), ',') AS m_keys
FROM (SELECT event_id,
             map(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]) AS m
      FROM events WHERE event_id % 17 = 0)
"""


# ---------------------------------------------------------------------------
# q7_volume_shipping — TPC-H Q7 shape: lineitem⋈orders⋈customer⋈supplier with
# TWO nation dimensions (supplier's and customer's) and a symmetric pair
# condition.  At scale: nation broadcasts twice under different aliases; the
# pair disjunction is a residual on the hash join.
# ---------------------------------------------------------------------------
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    # cross-border trade only (TPC-H Q7 picks one nation pair; the test
    # tables have too few suppliers for any single pair to be non-empty, so
    # group over every distinct pair instead — a strictly stronger check)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(_revenue())
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {_REVENUE_SQL}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS INTEGER) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND n1.n_name <> n2.n_name)
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# q_disjunctive_join — TPC-H Q19 shape: equi-join with an OR-of-ANDs
# residual.  Catalyst extracts the common l_partkey = p_partkey conjunct as
# the join key and keeps the disjunction as a post-join filter — still one
# hash join, never a nested loop.
# ---------------------------------------------------------------------------
def q_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    ep = F.col("l_extendedprice").cast("decimal(12,4)")
    disc = F.col("l_discount").cast("decimal(6,4)")
    cond = (F.col("l_partkey") == F.col("p_partkey")) & (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 30))
    )
    return li.join(part, cond).agg(
        F.round(F.sum(ep * (1 - disc)), 4).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q_DISJUNCTIVE_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
                      * (1 - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size <= 10 AND l_quantity >= 10)
   OR (p_brand = 'Brand#23' AND p_size <= 20 AND l_quantity >= 20)
   OR (p_brand = 'Brand#34' AND p_size <= 30 AND l_quantity >= 30)
"""


# ---------------------------------------------------------------------------
# q_unpivot — wide→long melt (the inverse of q_pivot): per-part numeric
# attributes unpivoted to (attribute, value) rows.
# ---------------------------------------------------------------------------
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
        (F.length("p_name").cast("double")).alias("name_len"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["size", "retailprice", "name_len"],
        variableColumnName="attr",
        valueColumnName="val",
    )


Q_UNPIVOT_SQL = """
WITH t AS (
  SELECT p_partkey,
         CAST(p_size AS DOUBLE) AS size,
         CAST(p_retailprice AS DOUBLE) AS retailprice,
         CAST(LENGTH(p_name) AS DOUBLE) AS name_len
  FROM part)
SELECT p_partkey, attr, val
FROM t UNPIVOT (val FOR attr IN (size, retailprice, name_len))
"""


# ---------------------------------------------------------------------------
# q_null_safe_eq — null-safe equality (<=> / IS NOT DISTINCT FROM) join and
# comparison semantics over a column with injected NULLs.
# ---------------------------------------------------------------------------
def q_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # NULL for every third event — deterministic in both engines
    cat = F.when(F.col("event_id") % 3 != 0, F.col("event_type"))
    w = ev.select("event_id", cat.alias("cat"))
    return (
        w.groupBy("cat")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("is_null_group", F.col("cat").eqNullSafe(F.lit(None).cast("string")))
    )


Q_NULL_SAFE_SQL = """
SELECT cat, COUNT(*) AS n, cat IS NOT DISTINCT FROM NULL AS is_null_group
FROM (SELECT CASE WHEN event_id % 3 <> 0 THEN event_type END AS cat FROM events)
GROUP BY cat
"""


# ---------------------------------------------------------------------------
# q_setops_all — multiset (ALL) set operations: bag semantics preserve
# duplicate multiplicities, unlike the distinct-set q_setops.
# ---------------------------------------------------------------------------
def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    both = cust.intersectAll(supp).withColumn("op", F.lit("intersect_all"))
    only = cust.exceptAll(supp).withColumn("op", F.lit("except_all"))
    return both.unionByName(only).groupBy("op", "nationkey").agg(
        F.count(F.lit(1)).alias("multiplicity")
    )


Q_SETOPS_ALL_SQL = """
WITH c AS (SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer),
s AS (SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier),
u AS (
  SELECT 'intersect_all' AS op, nationkey FROM (SELECT * FROM c INTERSECT ALL SELECT * FROM s)
  UNION ALL
  SELECT 'except_all' AS op, nationkey FROM (SELECT * FROM c EXCEPT ALL SELECT * FROM s))
SELECT op, nationkey, COUNT(*) AS multiplicity FROM u GROUP BY op, nationkey
"""


# ---------------------------------------------------------------------------
# q_nulls_ordering — NULLS FIRST / LAST in sorts and the OFFSET clause.
# A fully-specified total order makes the page slice engine-identical.
# ---------------------------------------------------------------------------
def q_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    val = F.when(F.col("event_id") % 5 != 0, F.col("value"))
    return (
        ev.select("event_id", val.alias("val"))
        .orderBy(F.col("val").desc_nulls_first(), F.col("event_id").asc())
        .limit(200)
        .offset(50)
    )


Q_NULLS_ORDERING_SQL = """
SELECT event_id, val FROM (
  SELECT event_id, CASE WHEN event_id % 5 <> 0 THEN value END AS val FROM events)
ORDER BY val DESC NULLS FIRST, event_id
LIMIT 150 OFFSET 50
"""


QUERIES = [
    Q("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL, "TPC-H Q6 scan+filter+agg"),
    Q("q_setops_all", q_setops_all, Q_SETOPS_ALL_SQL, "INTERSECT ALL / EXCEPT ALL"),
    Q("q_nulls_ordering", q_nulls_ordering, Q_NULLS_ORDERING_SQL, "NULLS FIRST + OFFSET"),
    Q("q_map_funcs", q_map_funcs, Q_MAP_SQL, "map function battery"),
    Q("q7_volume_shipping", q7_volume_shipping, Q7_SQL, "TPC-H Q7 dual-nation join"),
    Q("q_disjunctive_join", q_disjunctive_join, Q_DISJUNCTIVE_SQL, "TPC-H Q19 OR-of-ANDs join"),
    Q("q_unpivot", q_unpivot, Q_UNPIVOT_SQL, "wide→long unpivot/melt"),
    Q("q_null_safe_eq", q_null_safe_eq, Q_NULL_SAFE_SQL, "null-safe equality"),
    Q("q10_returned_items", q10_returned_items, Q10_SQL, "TPC-H Q10 top-20 customers"),
    Q("q18_large_orders", q18_large_orders, Q18_SQL, "TPC-H Q18 agg-as-join-filter"),
    Q("q_left_outer", q_left_outer, Q_LEFT_OUTER_SQL, "left outer join w/ nulls"),
    Q("q_full_outer", q_full_outer, Q_FULL_OUTER_SQL, "full outer join"),
    Q("q_correlated_exists", q_correlated_exists, Q_CORR_EXISTS_SQL, "correlated EXISTS"),
    Q("q_scalar_subquery", q_scalar_subquery, Q_SCALAR_SUB_SQL, "TPC-H Q17 scalar subquery"),
    Q("q_sql_subqueries", q_sql_subqueries, _SUBQ_SQL, "spark.sql IN / NOT IN subqueries"),
    Q("q_window_analytic", q_window_analytic, Q_WINDOW_ANALYTIC_SQL, "ntile/percent_rank/cume_dist"),
    Q("q_range_frame", q_range_frame, Q_RANGE_FRAME_SQL, "RANGE window frame"),
    Q("q_string_agg", q_string_agg, Q_STRING_AGG_SQL, "ordered string aggregation"),
    Q("q_math_funcs", q_math_funcs, Q_MATH_SQL, "math scalar battery"),
    Q("q_having", q_having, Q_HAVING_SQL, "HAVING"),
    Q("q_explode_pos", q_explode_pos, Q_EXPLODE_SQL, "lateral posexplode"),
    Q("q_union_stats", q_union_stats, Q_UNION_STATS_SQL, "unionByName"),
]
