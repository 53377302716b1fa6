"""Skew-mitigation operators: results must equal the unsalted forms, and
the salt must actually reach the shuffle (plan-asserted)."""

import pytest
from pyspark.sql import functions as F

from datalake_spark.operators.skew import salted_agg, salted_join, top_keys


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share key 'hot'."""
    hot = spark.range(900).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(100).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("k"),
        (F.col("id") + 10_000).alias("v"),
    )
    return hot.union(cold)


@pytest.fixture(scope="module")
def dim(spark):
    rows = [("hot", "HOT")] + [(f"c{i}", f"C{i}") for i in range(10)]
    return spark.createDataFrame(rows, "k string, label string")


class TestSaltedJoin:
    def test_equals_plain_join(self, spark, skewed, dim):
        plain = skewed.join(dim, "k").select("k", "v", "label")
        salted = salted_join(skewed, dim, ["k"], salt=8).select("k", "v", "label")
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )

    def test_left_join_keeps_unmatched(self, spark, skewed, dim):
        extra = skewed.union(
            spark.createDataFrame([("orphan", 1)], "k string, v long")
        )
        out = salted_join(extra, dim, ["k"], how="left", salt=4)
        orphans = [r for r in out.collect() if r.k == "orphan"]
        assert len(orphans) == 1 and orphans[0].label is None

    def test_salt_reaches_shuffle(self, skewed, dim):
        plan = salted_join(skewed, dim, ["k"], salt=8)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "_salt" in plan

    def test_salt_is_deterministic(self, skewed, dim):
        a = sorted(map(tuple, salted_join(skewed, dim, ["k"]).collect()))
        b = sorted(map(tuple, salted_join(skewed, dim, ["k"]).collect()))
        assert a == b

    @pytest.mark.parametrize(
        "how", ["right", "right_outer", "full", "outer", "full_outer",
                "right_anti", "cross"]
    )
    def test_small_side_preserving_modes_raise(self, skewed, dim, how):
        """Exploding the small side ×salt would emit each unmatched
        small-side row once per salt value — guard instead (r2 advisory)."""
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(skewed, dim, ["k"], how=how)

    @pytest.mark.parametrize("how", ["left_semi", "leftanti", "LEFT_OUTER"])
    def test_big_side_preserving_spellings_accepted(self, skewed, dim, how):
        # left_anti legitimately yields 0 rows here; the point is no raise
        assert salted_join(skewed, dim, ["k"], how=how).count() >= 0


class TestSaltedAgg:
    def test_mixed_aggs_equal_single_phase(self, spark, skewed):
        got = {
            r.k: r
            for r in salted_agg(
                skewed,
                ["k"],
                {
                    "n": ("v", "count"),
                    "total": ("v", "sum"),
                    "lo": ("v", "min"),
                    "hi": ("v", "max"),
                    "nd": ("v", "count_distinct"),
                },
                salt=8,
            ).collect()
        }
        want = {
            r.k: r
            for r in skewed.groupBy("k")
            .agg(
                F.count("v").alias("n"),
                F.sum("v").alias("total"),
                F.min("v").alias("lo"),
                F.max("v").alias("hi"),
                F.countDistinct("v").alias("nd"),
            )
            .collect()
        }
        assert set(got) == set(want)
        for k in want:
            for c in ("n", "total", "lo", "hi", "nd"):
                assert got[k][c] == want[k][c], (k, c)

    def test_collect_set_merges_exactly(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", 2), ("a", 2), ("b", 3)], "k string, v long"
        )
        out = {
            r.k: sorted(r.vals)
            for r in salted_agg(
                df, ["k"], {"vals": ("v", "collect_set")}, salt=4
            ).collect()
        }
        assert out == {"a": [1, 2], "b": [3]}

    def test_unknown_kind_raises(self, spark, skewed):
        with pytest.raises(ValueError):
            salted_agg(skewed, ["k"], {"x": ("v", "median")})

    def test_two_shuffles_in_plan(self, skewed):
        """The whole point: phase 1 partitions on (k, _salt), phase 2 on k."""
        plan = salted_agg(
            skewed, ["k"], {"nd": ("v", "count_distinct")}, salt=8
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("hashpartitioning") >= 2
        assert "_salt" in plan


class TestTopKeys:
    def test_reports_hot_key_share(self, skewed):
        rows = top_keys(skewed, ["k"], n=3).collect()
        assert rows[0].k == "hot" and abs(rows[0].share - 0.9) < 1e-9
