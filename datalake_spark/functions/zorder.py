"""Z-order (Morton) clustering — multi-dimensional data layout for
row-group skipping.

A table sorted on one column skips row groups only for predicates on
that column; predicates on any other column scan everything.  Z-ordering
interleaves the bits of several columns into one sort key, so a range
predicate on ANY of the participating columns touches a bounded fraction
of files/row groups — the standard lakehouse layout technique (Delta
OPTIMIZE ZORDER BY, Iceberg sort orders) re-expressed as pure Column
math.

Everything stays in-plan and integer:

1. each column is affinely scaled to a ``bits``-wide integer using its
   global min/max (ONE tiny aggregate, broadcast back) — rank-free, so
   no global sort is needed to build the key;
2. the scaled values' bits are interleaved into the Morton code with
   shift/or expressions (whole-stage codegen, no UDF);
3. the frame is ``repartitionByRange`` on the z-value and sorted within
   partitions, so each output file covers a compact z-range — a
   hyper-rectangle-ish region of the column space — and parquet footer
   min/max stats on every participating column become selective.

At 100 TB this is the maintenance-job layout pass (compaction-time
rewrite); the cost is one scan + one range shuffle, the payoff is every
future multi-dimensional scan.  ``repartitionByRange`` samples the key
(Spark's RangePartitioner) rather than globally sorting, so the hygiene
rule (no single-partition sorts) holds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def morton_key(scaled: list[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each (already-scaled, nonnegative)
    integer column into a Morton code.  Column i's bit b lands at
    position b*len(cols) + i, so all columns share significance."""
    n = len(scaled)
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(scaled):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + i))
    return out


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    num_files: int = 16,
    key_col: str = "_zval",
    keep_key: bool = False,
) -> DataFrame:
    """Return ``df`` range-partitioned into ``num_files`` partitions and
    sorted by the Morton interleave of ``cols`` (numeric columns; each
    min/max-scaled to ``bits`` bits).  Writing the result with one file
    per partition yields a z-clustered layout.  ``bits`` * len(cols)
    must be <= 63; 12 bits (4096 buckets per dimension) is plenty for
    file-level skipping."""
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit a signed 64-bit key")
    stats = df.agg(
        *[F.min(c).cast("long").alias(f"_lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("long").alias(f"_hi_{i}") for i, c in enumerate(cols)],
    )
    top = (1 << bits) - 1
    keyed = df.crossJoin(F.broadcast(stats))
    # integral scaling via DIV: float division would lose exactness once
    # (value - lo) * top passes 2^53 (epoch-ms columns get close)
    scaled = [
        F.expr(
            f"(CAST({c} AS BIGINT) - _lo_{i}) * {top} "
            f"DIV GREATEST(_hi_{i} - _lo_{i}, 1L)"
        )
        for i, c in enumerate(cols)
    ]
    keyed = keyed.withColumn(key_col, morton_key(scaled, bits)).drop(
        *[f"_lo_{i}" for i in range(len(cols))],
        *[f"_hi_{i}" for i in range(len(cols))],
    )
    out = keyed.repartitionByRange(num_files, F.col(key_col)) \
        .sortWithinPartitions(key_col)
    return out if keep_key else out.drop(key_col)
