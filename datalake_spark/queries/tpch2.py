"""Second TPC-H adaptation wave: Q12/Q13/Q14/Q22 shapes over the driver's
slimmer schemas (no shipmode/receiptdate/comment/phone columns — each query
keeps its reference's PLAN shape and substitutes the nearest available
dimension; the point is the operator pattern, not the literal spec text).

These run as digest-verified members of q_tpch_battery (batteries.py), one
registry slot for all four.  Decimal discipline as in relational.py: raw
2-decimal columns cast to decimal before arithmetic, exact decimal sums,
ROUND then cast to double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_spark.queries import load

_HIGH = ("1-URGENT", "2-HIGH")


# -- Q12 shape: join + conditional two-way counts per category ---------------
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12's plan shape (orders ⋈ lineitem, per-category high/low
    priority counts in a one-year window); l_returnflag stands in for
    l_shipmode, l_shipdate for l_receiptdate."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    hi = F.col("o_orderpriority").isin(*_HIGH).cast("long")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(hi).alias("high_line_count"),
            F.sum(1 - hi).alias("low_line_count"),
        )
    )


Q12_SQL = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
"""


# -- Q13 shape: left join + count distribution (count-of-counts) -------------
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customers LEFT JOIN orders (a filtered order class), order
    count per customer, then the distribution of those counts.  Zero-order
    customers must survive the left join into the c_count=0 bucket."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) pc
GROUP BY c_count
"""


# -- Q14 shape: join + conditional-share aggregate ---------------------------
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share over a one-month window.  p_type
    carries 'PROMO' directly in the test data.  Revenue arithmetic is
    decimal-exact; the final ratio is a division of two identical-in-both-
    engines doubles, rounded."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,4)") * (
        1 - F.col("l_discount").cast("decimal(6,4)")
    )
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias("_p"),
        F.sum(rev).alias("_t"),
    )
    return agg.select(
        F.round(F.col("_p"), 4).cast("double").alias("promo_revenue"),
        F.round(F.col("_t"), 4).cast("double").alias("total_revenue"),
        F.round(
            100.0 * F.col("_p").cast("double") / F.col("_t").cast("double"), 6
        ).alias("promo_share_pct"),
    )


Q14_SQL = """
WITH agg AS (
  SELECT SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))
                  ELSE 0 END) AS _p,
         SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) AS _t
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01')
SELECT CAST(ROUND(_p, 4) AS DOUBLE) AS promo_revenue,
       CAST(ROUND(_t, 4) AS DOUBLE) AS total_revenue,
       ROUND(100.0 * CAST(_p AS DOUBLE) / CAST(_t AS DOUBLE), 6) AS promo_share_pct
FROM agg
"""


# -- Q22 shape: scalar subquery threshold + anti join + grouped agg ----------
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers with above-average positive balance and NO
    orders, grouped by country code (c_nationkey % 10 stands in for the
    phone prefix).  Scalar-subquery threshold + anti join + decimal-exact
    balance sums."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    # threshold via the davg double form: exact decimal sum cast to double,
    # divided by count — bit-identical in both engines (decimal division
    # result SCALES differ between engines, so the comparison stays in
    # doubles)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(20,4)")).cast("double")
            / F.count("c_acctbal")
        ).alias("v")
    )
    rich = cust.join(avg_bal).filter(F.col("c_acctbal") > F.col("v"))
    dormant = rich.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        dormant.withColumn("cntrycode", F.col("c_nationkey") % 10)
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(20,4)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


Q22_SQL = """
WITH threshold AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) / COUNT(c_acctbal) AS v
  FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey % 10 AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DOUBLE) AS totacctbal
FROM customer, threshold
WHERE c_acctbal > v
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY cntrycode
"""
