"""Exact integer fixed-point math shared by cross-engine-gateable
operators.

The repo's oracle discipline (BATTERIES docstring) bans float
accumulations whose bit patterns the two engines may legitimately
disagree on.  Scores that are *defined* through logarithms (importance
weights, likelihood ratios) therefore need a logarithm both engines
compute bit-identically — this module provides one: a fixed-point
base-2 log over BIGINTs using only integer multiply / compare / shift,
the classic square-and-extract digit recurrence (Knuth TAOCP 1.2.2;
the same algorithm CORDIC-era hardware used), so Spark and DuckDB
produce the SAME integer for the same input on every platform.

    log2_fp(v) = round-down fixed-point log2 of v with FBITS fraction
                 bits: e·2^F + frac, where e = floor(log2 v) and frac's
                 bits come from repeatedly squaring the mantissa.

Exactness argument: every intermediate is a BIGINT; mantissa m starts
in [2^F, 2^(F+1)) so m·m < 2^(2F+2) — with F = 20 that is 2^42, far
inside BIGINT — and floor-division by powers of two is exact in both
engines (all values positive, so truncating div == floor div).
Domain: 1 <= v < 2^(63-F) (v·2^F must not overflow); violations raise
in-plan (the _pq_d_sub pattern — dim is data, not schema).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FBITS = 20
_SCALE = 1 << FBITS
_TWO = 1 << (FBITS + 1)
_VMAX = 1 << (63 - FBITS)


def log2_fp(expr: str) -> Column:
    """Fixed-point log2 of the BIGINT-valued SQL expression ``expr``:
    a BIGINT equal to floor-ish(log2(v) · 2^20), bit-identical across
    engines (see module docstring).  ``expr`` is a SQL fragment (column
    name or expression) because the digit recurrence references it
    several times inside one ``aggregate`` lambda."""
    v = f"CAST(({expr}) AS BIGINT)"
    guard = (
        f"IF({v} >= 1 AND {v} < {_VMAX}, {v}, "
        f"raise_error(CONCAT('log2_fp: domain is [1, 2^{63 - FBITS}), "
        f"got ', CAST({v} AS STRING))))"
    )
    sq = f"((acc.m * acc.m) div {_SCALE})"
    return F.expr(
        f"""
        aggregate(
          sequence(1, {FBITS}),
          struct(
            ({guard} * {_SCALE})
              div (CAST(1 AS BIGINT) << (LENGTH(bin({v})) - 1)) AS m,
            CAST(0 AS BIGINT) AS frac),
          (acc, i) -> struct(
            CASE WHEN {sq} >= {_TWO} THEN {sq} div 2 ELSE {sq} END AS m,
            acc.frac * 2 +
              CASE WHEN {sq} >= {_TWO} THEN CAST(1 AS BIGINT)
                   ELSE CAST(0 AS BIGINT) END AS frac),
          acc -> (CAST(LENGTH(bin({v})) AS BIGINT) - 1) * {_SCALE}
                   + acc.frac)
        """
    )


def sql_log2_fp_cte(vals_select: str, name: str = "log2t") -> str:
    """DuckDB twin of :func:`log2_fp` as a recursive-CTE fragment: given
    ``vals_select`` (a SELECT producing one BIGINT column ``v`` — the
    distinct values needing logs), emits CTE definitions ending in
    ``name`` with columns (v, log2fp).  Callers join ``name`` back on v.
    The iteration is the identical integer recurrence, so the joined
    log2fp values match Spark's bit-for-bit."""
    return f"""
{name}_base AS (SELECT v, LENGTH(bin(v)) - 1 AS e FROM ({vals_select})),
{name}_it AS (
  SELECT v, e, (v * {_SCALE}) // (1::BIGINT << e) AS m,
         0::BIGINT AS frac, 0 AS i
  FROM {name}_base
  UNION ALL
  SELECT v, e,
    CASE WHEN (m*m)//{_SCALE} >= {_TWO}
         THEN (m*m)//{_SCALE}//2 ELSE (m*m)//{_SCALE} END,
    frac*2 + CASE WHEN (m*m)//{_SCALE} >= {_TWO} THEN 1 ELSE 0 END,
    i + 1
  FROM {name}_it WHERE i < {FBITS}),
{name} AS (
  SELECT v, e * {_SCALE} + frac AS log2fp FROM {name}_it
  WHERE i = {FBITS})"""
