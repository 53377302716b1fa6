"""Bucketed-table co-located joins: writing both sides bucketed+sorted on
the join key lets SortMergeJoin run with NO shuffle exchange — the layout
strategy for repeated large-scale joins (the 100 TB answer to "this join
shuffles every night").
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 10_000).selectExpr("id AS k", "id * 2 AS lv")
    right = spark.range(0, 10_000, 2).selectExpr("id AS k", "id * 3 AS rv")
    for name, df in (("bt_left", left), ("bt_right", right)):
        (
            df.write.bucketBy(8, "k")
            .sortBy("k")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "bt_left", "bt_right"
    for name in ("bt_left", "bt_right"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


class TestBucketedJoin:
    def test_join_without_shuffle(self, spark, bucketed_pair):
        l, r = bucketed_pair
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(l).join(spark.table(r), "k")
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            # co-located buckets: no exchange on either side
            assert "Exchange" not in plan
            assert joined.count() == 5_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_bucket_pruning_aggregate(self, spark, bucketed_pair):
        l, _ = bucketed_pair
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # groupBy on the bucket key needs no exchange either
            agg = spark.table(l).groupBy("k").count()
            plan = agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert agg.count() == 10_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
