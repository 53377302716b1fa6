"""Skew-mitigation utilities for hot keys.

AQE's skew-join handling (enabled in session.py) splits oversized
sort-merge partitions automatically, but two shapes still die on a hot key
at 100 TB and need explicit salting:

- a shuffled JOIN where one key holds a disproportionate share of the big
  side (AQE splits the partition, but every split still joins against the
  full matching build rows; with a many-to-many hot key the pair explosion
  itself is the problem),
- a groupBy with a non-algebraic aggregate (collect_list/collect_set/
  exact count_distinct): no map-side combine, so one reducer receives the
  whole hot key.

Both helpers keep results exactly equal to their unsalted forms — they
only change the partitioning algebra — and stay pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Join a skew-heavy ``big`` frame against a ``small`` frame on ``on``.

    The big side gets a deterministic per-row salt in [0, salt); the small
    side is exploded ×salt so every (key, salt) bucket finds its match.
    The hot key's rows then spread over ``salt`` reducers instead of one.
    Cost: the small side shuffles ×salt — use for moderate 'small' sides
    that are too big to broadcast but far smaller than the big side (the
    broadcast-impossible huge×large case).

    The salt is xxhash64 over the big side's whole row (deterministic —
    reruns produce identical partitioning, unlike rand()-salting).

    Only big-side-preserving modes are supported: with the small side
    exploded ×salt, right/full outer (and right_anti) would emit each
    unmatched small-side row once per salt value — silently wrong — so
    those modes raise instead (same guard style as range_join).
    """
    canon = how.lower().replace("_", "")
    if canon not in {"inner", "left", "leftouter", "leftsemi", "semi",
                     "leftanti", "anti"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the exploded small "
            "side would duplicate unmatched small-side rows. Use inner/left/"
            "left_semi/left_anti, or swap the sides."
        )
    b_salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    b = big.withColumn("_salt", b_salt)
    return b.join(s, on + ["_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    exprs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase groupBy for aggregates with no map-side combine.

    ``exprs`` maps output column -> (input column, kind), kind one of:

    - 'collect_set'    exact distinct values (merged via flatten+distinct)
    - 'count_distinct' exact distinct count
    - 'sum' / 'count' / 'min' / 'max'  (algebraic — included so mixed aggs
      can ride one plan; Spark combines these map-side anyway)

    Phase 1 groups by (keys, salt) — the hot key's rows land on ``salt``
    reducers, each producing a bounded partial. Phase 2 groups the partials
    by keys alone: ``salt`` rows per key, trivially cheap. Results are
    exactly equal to the single-phase form; only the shuffle algebra
    changes.
    """
    phase1_aggs, phase2_aggs = [], []
    for out, (col, kind) in exprs.items():
        p = f"_p_{out}"
        if kind == "collect_set":
            phase1_aggs.append(F.collect_set(col).alias(p))
            phase2_aggs.append(
                F.array_distinct(F.flatten(F.collect_list(p))).alias(out)
            )
        elif kind == "count_distinct":
            phase1_aggs.append(F.collect_set(col).alias(p))
            phase2_aggs.append(
                F.size(F.array_distinct(F.flatten(F.collect_list(p)))).cast(
                    "bigint"
                ).alias(out)
            )
        elif kind == "sum":
            phase1_aggs.append(F.sum(col).alias(p))
            phase2_aggs.append(F.sum(p).alias(out))
        elif kind == "count":
            phase1_aggs.append(F.count(col).alias(p))
            phase2_aggs.append(F.sum(p).cast("bigint").alias(out))
        elif kind == "min":
            phase1_aggs.append(F.min(col).alias(p))
            phase2_aggs.append(F.min(p).alias(out))
        elif kind == "max":
            phase1_aggs.append(F.max(col).alias(p))
            phase2_aggs.append(F.max(p).alias(out))
        else:
            raise ValueError(f"unsupported agg kind {kind!r}")
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def top_keys(df: DataFrame, keys: list[str], n: int = 20) -> DataFrame:
    """Diagnostic: the n heaviest key groups with their row share — run this
    before deciding a salt factor (salt ≈ hot-key share × target partition
    count)."""
    total = df.count()
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .orderBy(F.desc("n_rows"), *keys)
        .limit(n)
    )
