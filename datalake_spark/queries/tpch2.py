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


# -- Q2 shape: correlated regional-minimum over a derived supply table -------
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's plan shape (part × supply options × supplier → nation →
    region, keep rows achieving the per-part regional minimum cost).  The
    driver schema has no partsupp, so the supply table derives from
    lineitem: (l_partkey, l_suppkey) → MIN(l_extendedprice) — same join
    topology, aggregation-derived dimension included.  Spark expresses the
    correlated scalar MIN as a window over the region-filtered join (one
    shuffle, no second scan); the oracle keeps TPC-H's literal correlated
    subquery — two different plans, same rows."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min("l_extendedprice").alias("cost"))
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "SMALL") & (F.col("p_size") <= 10)
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        ps.join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .join(supp, F.col("ps_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = W.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select("p_partkey", "s_name", "n_name", "s_acctbal", "cost")
    )


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(l_extendedprice) AS cost
  FROM lineitem GROUP BY 1, 2)
SELECT p_partkey, s_name, n_name, s_acctbal, cost
FROM ps
JOIN part ON ps_partkey = p_partkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE' AND p_type = 'SMALL' AND p_size <= 10
  AND cost = (
    SELECT MIN(ps2.cost) FROM ps ps2
    JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
"""


# -- Q4 shape: correlated EXISTS with a cross-table date predicate ----------
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders in a window with EXISTS a "late" line — the
    correlated predicate compares columns of BOTH tables
    (l_shipdate > o_orderdate + 60 days stands in for the missing
    commitdate/receiptdate pair), so it must ride the semi-join condition,
    not a pre-filter."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate")
           > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# -- Q21 shape: EXISTS + NOT EXISTS on the same table, different correlation -
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21, the hardest join shape in the suite: a supplier's late
    line in a multi-supplier order where NO OTHER supplier was late —
    semi-join then anti-join against the same lineitem table with
    different correlated predicates, preserving l1 multiplicity."""
    li = load(spark, sf_dir, "lineitem")
    cutoff = F.lit("2001-01-01").cast("timestamp_ntz")
    l1 = li.filter(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_suppkey"
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late_others = li.filter(F.col("l_shipdate") > cutoff).select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    waiting = l1.join(
        others,
        (F.col("o2_orderkey") == F.col("l_orderkey"))
        & (F.col("o2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("o3_orderkey") == F.col("l_orderkey"))
        & (F.col("o3_suppkey") != F.col("l_suppkey")),
        "left_anti",
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        waiting.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_shipdate > TIMESTAMP '2001-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > TIMESTAMP '2001-01-01')
GROUP BY s_name
"""


# -- Q15 shape: derived revenue view + scalar-max selection ------------------
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: a revenue-per-supplier view consumed twice — once for the
    global MAX, once to select the row(s) achieving it.  Decimal-exact
    revenue so the max comparison is bit-identical across engines; Spark
    compares against a broadcast 1-row global max (an unpartitioned window
    MAX would funnel every supplier through one partition at scale)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(20,4)")
             * (F.lit(1).cast("decimal(20,4)")
                - F.col("l_discount").cast("decimal(20,4)")))
        ).alias("_rev_dec")
    )
    mx = rev.agg(F.max("_rev_dec").alias("_max"))
    supp = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("_rev_dec") == F.col("_max"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("_rev_dec"), 4).cast("double").alias("total_revenue"),
        )
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(20,4))
             * (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4))))
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name,
       CAST(ROUND(total_rev, 4) AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
"""


# -- Q16 shape: anti-set filter + COUNT(DISTINCT) grouping -------------------
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: part attribute grouping counting DISTINCT suppliers,
    excluding a supplier blacklist via NOT IN (anti join) — negative
    acctbal stands in for the missing comment-pattern complaint filter."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_suppkey"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(bad, F.col("l_suppkey") == F.col("bad_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# -- Q20 shape: nested IN-chains with a correlated aggregate threshold -------
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers (in one nation) having some part whose stocked
    quantity exceeds half that part-supplier's yearly demand — an IN over a
    correlated-aggregate subquery, nested inside a second IN.  The
    "availqty" derives from lineitem (driver schema has no partsupp):
    avail = MAX(l_quantity), demand = SUM(l_quantity) in the window; the
    semantics (per-(part,supplier) threshold on a correlated aggregate)
    keep Q20's plan shape intact."""
    li = load(spark, sf_dir, "lineitem")
    win = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    agg = win.groupBy("l_partkey", "l_suppkey").agg(
        F.max("l_quantity").alias("avail"),
        F.sum(F.col("l_quantity").cast("decimal(20,4)")).alias("demand"),
    )
    qualifying = agg.filter(
        F.col("avail").cast("decimal(20,4)")
        > F.col("demand") * F.lit(0.4).cast("decimal(4,2)")
    ).select(F.col("l_suppkey").alias("q_suppkey")).distinct()
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    out = (
        supp.join(qualifying, F.col("s_suppkey") == F.col("q_suppkey"),
                  "left_semi")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"),
              "left_semi")
        .select("s_suppkey", "s_name")
    )
    return out


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM (
      SELECT l_partkey, l_suppkey,
             MAX(l_quantity) AS avail,
             SUM(CAST(l_quantity AS DECIMAL(20,4))) AS demand
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey)
    WHERE CAST(avail AS DECIMAL(20,4)) > demand * CAST(0.4 AS DECIMAL(4,2)))
  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_7')
"""


# -- Q8 shape: market-share ratio of conditional sums per year ---------------
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: all-nation volume per order-year vs one nation's slice —
    a conditional-sum ratio over a 5-table join.  Decimal-exact volumes;
    the share division happens on the exact sums cast to double (identical
    IEEE division in both engines)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    vol = (
        F.col("l_extendedprice").cast("decimal(20,4)")
        * (F.lit(1).cast("decimal(20,4)")
           - F.col("l_discount").cast("decimal(20,4)"))
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("n_name"),
        )
    )
    tgt = F.when(F.col("n_name") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0).cast(joined.schema["volume"].dataType)
    )
    return joined.groupBy("o_year").agg(
        (F.sum(tgt).cast("double") / F.sum("volume").cast("double")).alias(
            "mkt_share"
        )
    )


Q8_SQL = """
SELECT o_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(20,4))
           * (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4))) AS volume,
         n_name
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND p_type = 'ECONOMY')
GROUP BY o_year
"""


# -- Q9 shape: profit decomposition by nation and year -----------------------
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: per-(nation, year) profit over lineitem joined through
    part/supplier/nation/orders.  The driver schema has no
    ps_supplycost, so cost derives from the part dimension
    (p_retailprice·l_quantity·0.1) — same join graph and the same
    sum-of-products decimal discipline."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    amount = (
        F.col("l_extendedprice").cast("decimal(20,4)")
        * (F.lit(1).cast("decimal(20,4)")
           - F.col("l_discount").cast("decimal(20,4)"))
        - F.col("p_retailprice").cast("decimal(20,4)")
        * F.col("l_quantity").cast("decimal(20,4)")
        * F.lit(0.1).cast("decimal(4,2)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(amount), 4).cast("double").alias("sum_profit"))
    )


Q9_SQL = """
SELECT n_name AS nation,
       EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(ROUND(SUM(
         CAST(l_extendedprice AS DECIMAL(20,4))
           * (CAST(1 AS DECIMAL(20,4)) - CAST(l_discount AS DECIMAL(20,4)))
         - CAST(p_retailprice AS DECIMAL(20,4))
           * CAST(l_quantity AS DECIMAL(20,4))
           * CAST(0.1 AS DECIMAL(4,2))), 4) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE 'small%'
GROUP BY n_name, o_year
"""


# -- Q11 shape: group HAVING > fraction-of-global-total ----------------------
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: per-part value with HAVING value > fraction × the global
    total — the global scalar rides a broadcast 1-row aggregate (same
    no-single-partition pattern as q15).  Value derives from lineitem
    (no partsupp): SUM(l_extendedprice·l_quantity) for one nation's
    suppliers."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    )
    val = (
        F.col("l_extendedprice").cast("decimal(20,4)")
        * F.col("l_quantity").cast("decimal(20,4)")
    )
    base = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"),
              "left_semi")
        .select(F.col("l_partkey"), val.alias("value"))
    )
    per_part = base.groupBy("l_partkey").agg(
        F.sum("value").alias("_val_dec")
    )
    total = per_part.agg(
        (F.sum("_val_dec") * F.lit(0.001).cast("decimal(6,4)")).alias("_thr")
    )
    return (
        per_part.join(F.broadcast(total),
                      F.col("_val_dec") > F.col("_thr"))
        .select(
            "l_partkey",
            F.round(F.col("_val_dec"), 4).cast("double").alias("part_value"),
        )
    )


Q11_SQL = """
WITH base AS (
  SELECT l_partkey,
         CAST(l_extendedprice AS DECIMAL(20,4))
           * CAST(l_quantity AS DECIMAL(20,4)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'),
per_part AS (
  SELECT l_partkey, SUM(value) AS val FROM base GROUP BY l_partkey)
SELECT l_partkey, CAST(ROUND(val, 4) AS DOUBLE) AS part_value
FROM per_part
WHERE val > (SELECT SUM(val) * CAST(0.001 AS DECIMAL(6,4)) FROM per_part)
"""
