"""Generic as-of and range joins — operators Spark lacks natively, composed
from built-ins (SURVEY.md §2.2 "Joins").

Two as-of strategies:
- asof_join (union+window): one shuffle on (keys, time); scales to any
  right-side size.  The reference's "latest file ≤ t" (querier.py:351-417)
  is this with right = the probe timestamps.
- asof_join_pandas (merge_asof per group): Arrow-batched per-key pandas
  merge; wins when both sides are pre-bucketed by key and small per key.

range_join: inequality join with an optional bucketized equi-key prologue so
Catalyst gets an equi-condition (turning BroadcastNestedLoop into a hash
join) when intervals are bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the right row with the greatest (backward) /
    least (forward) ``on`` value not beyond the left's, per ``by`` group —
    or the absolutely closest one (``nearest``, ties to the backward match,
    pandas merge_asof semantics).

    Union + window: tag sides, sort by (by, on, tag), carry last right row
    forward (or next backward) with ignoreNulls last(), keep left rows.
    ``nearest`` computes both carries in ONE exchange (same partition keys,
    two sort specs) and picks per row by distance.
    """
    assert direction in ("backward", "forward", "nearest")
    rcols = [c for c in right.columns if c not in by and c != on]
    on_t = right.schema[on].dataType.simpleString()
    _r_fields = ["_on:" + on_t] + [
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in rcols
    ]
    l_tag = left.withColumn("_side", F.lit(1)).withColumn(
        "_r", F.lit(None).cast("struct<" + ",".join(_r_fields) + ">")
    )
    r_tag = (
        right.withColumn("_side", F.lit(0))
        .withColumn("_r", F.struct(F.col(on).alias("_on"),
                                   *[F.col(c) for c in rcols]))
        .select(*by, on, "_side", "_r")
    )
    l_cols = [c for c in left.columns]
    l_full = l_tag.select(*[F.col(c) for c in l_cols], "_side", "_r")
    # align schemas for union
    r_full = r_tag
    for c in l_cols:
        if c not in r_full.columns:
            r_full = r_full.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r_full = r_full.select(*l_cols, "_side", "_r")
    u = l_full.unionByName(r_full)
    wb = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    if direction == "backward":
        u = u.withColumn("_m", F.last("_r", ignorenulls=True).over(wb))
    elif direction == "forward":
        u = u.withColumn("_m", F.last("_r", ignorenulls=True).over(wf))
    else:  # nearest: both carries, one exchange; tie -> backward
        u = (
            u.withColumn("_mb", F.last("_r", ignorenulls=True).over(wb))
            .withColumn("_mf", F.last("_r", ignorenulls=True).over(wf))
            .withColumn(
                "_m",
                F.when(F.col("_mb").isNull(), F.col("_mf"))
                .when(F.col("_mf").isNull(), F.col("_mb"))
                .when(
                    (F.col("_mf._on") - F.col(on))
                    < (F.col(on) - F.col("_mb._on")),
                    F.col("_mf"),
                )
                .otherwise(F.col("_mb")),
            )
            .drop("_mb", "_mf")
        )
    out = u.filter(F.col("_side") == 1).drop("_side", "_r")
    for c in rcols:
        name = c if c not in l_cols else f"{c}{suffix}"
        out = out.withColumn(name, F.col(f"_m.{c}"))
    return out.drop("_m")


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    direction: str = "backward",
) -> DataFrame:
    """merge_asof per key group via applyInPandas (cogroup) — Arrow-batched;
    use when per-key slices fit in memory (they do after a key shuffle)."""
    import pandas as pd

    rcols = [c for c in right.columns if c not in (by, on)]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"{f.name} {right.schema[f.name].dataType.simpleString()}" for f in right.schema.fields if f.name in rcols]
    )

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if len(l) == 0:
            return pd.DataFrame(columns=list(l.columns) + rcols)
        l = l.sort_values(on)
        r = r.sort_values(on)
        return pd.merge_asof(l, r.drop(columns=[by]), on=on, direction=direction)

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=out_schema)
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows whose point falls in [right_start, right_end).

    With ``bucket_width`` (and intervals bounded by it), both sides get an
    equi bucket key: right explodes to ceil(len/width)+1 buckets, left maps to
    one — Catalyst then plans a hash join on bucket instead of a nested-loop
    over everything; the residual range predicate filters within bucket.
    """
    cond = (F.col(left_point) >= F.col(right_start)) & (
        F.col(left_point) < F.col(right_end)
    )
    if bucket_width is None:
        return left.join(right, cond, how)
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # the right side is exploded to one row per bucket, so unmatched
        # right rows would surface once PER BUCKET replica — right/full outer
        # cannot be expressed on the bucketized plan.
        raise ValueError(
            f"range_join with bucket_width supports how='inner'/'left', got {how!r}"
        )
    lb = left.withColumn("_lbucket", (F.col(left_point) / bucket_width).cast("long"))
    rb = right.withColumn(
        "_rbucket",
        F.explode(
            F.sequence(
                (F.col(right_start) / bucket_width).cast("long"),
                (F.col(right_end) / bucket_width).cast("long"),
            )
        ),
    )
    # the range predicate is part of the JOIN CONDITION, not a post-filter:
    # a post-filter would drop left-outer's unmatched (null right) rows and
    # silently degrade to inner semantics.
    return lb.join(
        rb, (F.col("_lbucket") == F.col("_rbucket")) & cond, how
    ).drop("_lbucket", "_rbucket")
