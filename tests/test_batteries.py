"""Digest batteries: the declared column/kind map must match the Spark
schema exactly, and the digest must actually detect value changes."""

import pytest
from pyspark.sql import functions as F

from datalake_spark.queries.batteries import (
    BATTERY_SUBS,
    digest_df,
    queries as battery_queries,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batteries():
    return {q.name: q for q in battery_queries()}


def test_declared_cols_match_spark_schema(spark, batteries):
    """Each Sub's {column: kind} must list exactly the sub-query's output
    columns, with kind 'd'/'d4' iff the column is floating (doubles need
    the decimal canon) and 'v' otherwise."""
    for bname, subs in BATTERY_SUBS.items():
        for sub in subs:
            df = sub.q.build(spark, SF)
            schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            assert set(schema) == set(sub.cols), (bname, sub.q.name)
            for col, kind in sub.cols.items():
                is_float = schema[col] in ("double", "float")
                assert (kind in ("d", "d4")) == is_float, (
                    bname, sub.q.name, col, schema[col], kind,
                )


def test_digest_is_value_sensitive(spark):
    """Changing one value in one row must change the digest; permuting rows
    must not (order-insensitive multiset hash)."""
    base = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    cols = {"id": "v", "grp": "v"}
    d0 = digest_df(base, "x", cols).collect()[0]
    permuted = base.orderBy(F.rand(seed=7))
    d1 = digest_df(permuted, "x", cols).collect()[0]
    assert d0.digest == d1.digest and d0.n_rows == d1.n_rows == 100
    tweaked = base.withColumn(
        "grp", F.when(F.col("id") == 42, F.lit(99)).otherwise(F.col("grp"))
    )
    d2 = digest_df(tweaked, "x", cols).collect()[0]
    assert d2.digest != d0.digest


def test_digest_distinguishes_duplicate_multiplicity(spark):
    """SUM (not XOR/bit-agg) of row hashes: a row appearing twice vs once
    must produce different digests."""
    one = spark.range(10)
    two = one.union(spark.range(9, 10))  # row 9 duplicated
    d1 = digest_df(one, "x", {"id": "v"}).collect()[0]
    d2 = digest_df(two, "x", {"id": "v"}).collect()[0]
    assert d1.digest != d2.digest


def test_null_canon_distinct_from_literal(spark):
    """NULL must not collide with the string 'None' or empty string."""
    a = spark.createDataFrame([(1, None)], "id int, v string")
    b = spark.createDataFrame([(1, "None")], "id int, v string")
    c = spark.createDataFrame([(1, "")], "id int, v string")
    cols = {"id": "v", "v": "v"}
    ds = {digest_df(df, "x", cols).collect()[0].digest for df in (a, b, c)}
    assert len(ds) == 3
