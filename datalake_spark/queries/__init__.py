"""Declared query surface: every operator from SURVEY.md §2 as a named
(spark-builder, duckdb-oracle-SQL) pair over the driver's test tables.

Oracle-match discipline (the driver hash-compares values after sorting columns
by name):
- every computed column is aliased identically in Spark and SQL
- double aggregations go through DECIMAL(20,4) so the sum is exact and
  order-insensitive, then cast back to double — bit-identical across engines
- dates/timestamps are output as formatted strings or epoch-ms longs, never
  raw temporal types (engine dtype mismatch risk)
- every LIMIT/top-k is totally ordered via a unique tie-break key
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@dataclass
class Q:
    """One declared query: Spark builder + optional DuckDB oracle SQL."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str = ""


# Inferred-schema memo: every bare ``spark.read.parquet(path)`` runs a
# driver-side footer-read job before the DataFrame even exists, and a
# multi-table query pays one such job (plus a Python↔JVM round trip) per
# table, serially, inside its timed region — the r14 stage profile showed
# q5_local_supplier spending ~6 listing jobs before any compute.  Caching
# the inferred StructType per (sf_dir, table, appliedConfs) and passing it
# back via ``reader.schema(...)`` makes repeat loads job-free at
# construction time.  This is metadata-only (no rows, no listings are
# memoized — the scan still plans and reads files normally at execution),
# re-inferred per process, and keyed on the data directory, so it cannot
# serve stale results across input changes within a run's contract.
_SCHEMA_MEMO: dict = {}

# Scan-parallelism floor (r14, guide §2.5 "input skew: one huge
# unsplittable file … repartition immediately after the read").  The
# bench tables ship as SINGLE-ROW-GROUP parquet files, and a parquet row
# group is the atomic split unit — so every scan stage runs as ONE task
# regardless of core count, serializing all pre-exchange map work
# (explodes, quantization folds, partial aggregations) on one core.  The
# r14 stage profile measured it directly: chargram_commonness spent
# 2.1-2.7 s of its 3.3 s wall in a 1-task scan+explode+partial-agg
# stage; table_profile's exact count-distinct Expand ran 2.9 s on one
# task with 31 cores idle.  load(spread=True) therefore floors scan
# parallelism with one round-robin repartition when — and only when —
# the file layout cannot reach the session's default parallelism.
# OPT-IN per call site (a blanket floor measured a net loss at sf0.1:
# +0.3-0.5 s fixed exchange/stage overhead per query dwarfs sub-second
# map stages; see _read_parquet):
#
# - SCALE-ADAPTIVE, not local-tuned: the trigger is metadata
#   (row-group count < defaultParallelism), so any production table
#   with normal file/row-group counts — every table at 100 TB — skips
#   the repartition entirely and keeps its scan splits.  The floor is
#   the session's own defaultParallelism, not a constant.
# - row threshold: parameter-/dimension-sized tables (region, nation —
#   broadcast sides) stay single-partition; shuffling 25 rows into 32
#   partitions would add a stage for nothing.
# - VALUE-NEUTRAL: round-robin placement feeds only order-insensitive
#   aggregations/joins (repo-wide discipline: exact decimal/bigint
#   sums, total-ordered top-k; no partition-sensitive function —
#   monotonically_increasing_id/spark_partition_id/input_file_name/rand
#   — anywhere in the query surface), and Spark's
#   sortBeforeRepartition keeps retries deterministic.  Verified by the
#   full 50-entry oracle gate at sf0.001 + sf0.01.
# - driver cost: one pyarrow footer read per path, memoized, first paid
#   by the bench's untimed warm pre-pass.
# SPARK_GRAFT_NO_SPREAD=1 disables it (A/B isolation knob).
_SPREAD_MIN_ROWS = 2000
_SPREAD_MEMO: dict = {}


def _spread_partitions(spark: SparkSession, path: str):
    """Target partition count when the parquet layout cannot reach the
    session's default parallelism, else None (memoized per path)."""
    if os.environ.get("SPARK_GRAFT_NO_SPREAD"):
        return None
    if path in _SPREAD_MEMO:
        return _SPREAD_MEMO[path]
    out = None
    try:
        import pyarrow.parquet as pq

        par = spark.sparkContext.defaultParallelism
        paths = []
        if os.path.isfile(path):
            paths = [path]
        elif os.path.isdir(path):
            paths = [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        if paths and len(paths) < par:
            rows = 0
            rgs = 0
            for p in paths:
                md = pq.ParquetFile(p).metadata
                rows += md.num_rows
                rgs += md.num_row_groups
            if rows >= _SPREAD_MIN_ROWS and rgs < par:
                out = par
    except (ImportError, OSError, ValueError):
        # pyarrow missing / transient IO / corrupt footer (ArrowInvalid
        # is a ValueError): the safe answer is "no spread", but do NOT
        # memoize it — a transient first-touch hiccup must not disable
        # the floor for the whole session (r14 advisor finding).
        # Anything else (a programming error) propagates.
        return None
    _SPREAD_MEMO[path] = out
    return out


def _read_parquet(
    spark: SparkSession, path: str, spread: bool = False
) -> DataFrame:
    """spark.read.parquet with the inferred schema memoized per path;
    ``spread=True`` applies the scan-parallelism floor (see
    _spread_partitions) — OPT-IN per call site, because a blanket floor
    was measured a net loss: the extra exchange costs ~0.3-0.5 s of
    fixed stage overhead per query at sf0.1, which swamps the map-stage
    speedup everywhere except the few operators whose single-task scan
    stage carries MULTI-SECOND compute (headline-only A/B: blanket
    spread read 29.6-30.0 s vs 21.4-22.1 s unspread at equal canary)."""
    # nanosAsLong changes how TIMESTAMP(NANOS) columns surface, so it is
    # part of the memo key (events is read under a different conf).
    key = (
        path,
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false"),
    )
    schema = _SCHEMA_MEMO.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if spread:
        n = _spread_partitions(spark, path)
        if n:
            df = df.repartition(n)
    return df


def load(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one test table.  events.parquet carries TIMESTAMP(NANOS) which
    Spark only reads via the nanosAsLong legacy mode; we normalize to an
    epoch-ms long (``ts_ms``) and a microsecond timestamp (``ts``) matching
    DuckDB's own nanos→us truncation.  ``spread=True``: scan-parallelism
    floor for call sites whose single-task scan stage carries
    multi-second map work (see _read_parquet / _spread_partitions)."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_parquet(spark, f"{sf_dir}/events.parquet", spread)
        if dict(df.dtypes)["ts"] == "bigint":
            # TIMESTAMP(NANOS) parquet, surfaced as long ns by the legacy
            # conf above
            return (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts_ms", F.expr("ts_ns DIV 1000000"))
                .withColumn("ts", F.timestamp_micros(F.expr("ts_ns DIV 1000")))
            )
        # TIMESTAMP(MICROS) parquet arrives as TIMESTAMP_NTZ; the session
        # timezone is pinned to UTC, so the cast to instant-typed TIMESTAMP
        # preserves the wall clock and epoch math matches DuckDB epoch_ms()
        return (
            df.withColumn("ts", F.col("ts").cast("timestamp"))
            .withColumn("ts_ms", F.expr("unix_micros(ts) DIV 1000"))
        )
    return _read_parquet(spark, f"{sf_dir}/{name}.parquet", spread)


# -- deterministic numeric aggregation helpers ------------------------------
def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive exact sum of a double column: sum in DECIMAL(20,4),
    surface as double.  SQL twin: CAST(SUM(CAST(x AS DECIMAL(20,4))) AS DOUBLE).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(20,4)")).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum / count average.  SQL twin:
    CAST(SUM(CAST(x AS DECIMAL(20,4))) AS DOUBLE) / COUNT(x)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast("decimal(20,4)")).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(20,4))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(20,4))) AS DOUBLE) / COUNT({expr}) AS {alias}"


def registry() -> list[Q]:
    """Declared query surface, sized to fit inside the driver's 50-entry
    correctness gate: single-concept relational queries are folded into
    digest batteries (see batteries.py) that keep per-sub-query value-level
    verification while occupying one registry slot each."""
    from datalake_spark.queries import (
        relational,
        relational2,
        datalake_q,
        pipeline_q,
        ops_q,
        streaming_q,
        windows_q,
        batteries,
    )

    flat = (
        relational.QUERIES
        + relational2.QUERIES
        + datalake_q.QUERIES
        + pipeline_q.QUERIES
        + ops_q.QUERIES
        + streaming_q.QUERIES
        + windows_q.QUERIES
    )
    folded = batteries.folded_names()
    return [q for q in flat if q.name not in folded] + batteries.queries()
