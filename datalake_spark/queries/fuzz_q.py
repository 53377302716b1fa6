"""Driver-gated randomized differential testing: a frozen set of seeded
random query plans (datalake_spark/fuzzgen.py grammar) digested through
BOTH engines every correctness round.

The exploratory fuzz harness (tests/test_fuzz_differential.py) hunts
with fresh shapes and a shrinker; this module freezes 100 seeds (r6:
window plans and double-typed outputs — windows carry total-order
NULLS FIRST tiebreaks, and double outputs are declared in Spec.dbl_out
and canonicalized here through the 'd' canon, FLOOR(x*1e6+0.5), on
BOTH engines; r7: correlated scalar subqueries, setops over join
results, CASE/arithmetic projections, 40 -> 60 seeds; r8: HAVING over
real aggregates, COALESCE-canonicalized correlated COUNT scalars, NOT
IN subqueries, RANGE BETWEEN window frames, 60 -> 80 seeds) into ONE
query: each seed's plan
runs as a subquery reduced to
(seed, row count, order-insensitive value hash), and the per-seed
digests are UNION ALLed.  r9: 80 -> 100 seeds alongside grammar round
5 (set ops inside derived tables, uncorrelated scalar subqueries in
WHERE, EXISTS under OR — each a planner path the prior grammar never
reached), freezing the late-r8 LATERAL extension into a full-size
gate.  r10: 100 -> 120 seeds alongside grammar round 6 (rank windows
INSIDE derived tables, correlated scalar subqueries in HAVING with the
correlation key forced into GROUP BY, multi-level set-op nesting).
r11: 120 -> 140 seeds alongside grammar round 7 (FULL OUTER joins
inside derived tables, explicit GROUPING SETS, correlated EXISTS in
HAVING, NULL-bearing IN-subquery lists — the three-valued trap — and
LAG/NTILE windows).  r12: 140 -> 160 seeds alongside grammar round 8
(WITH-CTEs referenced 2-3 times through one named relation — the
round also FOUND a resolution divergence while building: a CTE named
like the table it reads is circular to DuckDB but resolves to the
catalog table in Spark, so the grammar names its CTE base_c;
aggregate FILTER clauses; correlated scalar subqueries as the ORDER
BY lead; INTERSECT ALL / EXCEPT ALL at every set-op site including
inside derived tables under windows).  r13: 160 -> 180 seeds alongside
grammar round 9 (top-k LATERAL joins with real multiplicity and lat_0
in the total-order tiebreak; DISTINCT-aggregated derived tables whose
outputs alias back to the base schema so outer windows compose over an
aggregated input; correlated EXISTS in set-op branches correlating
through the NULL-padded side of an outer join; GROUP BY ALL — and
building the round found engine asymmetry EIGHT before any hunt ran:
DuckDB's binder refuses a correlated HAVING subquery under GROUP BY
ALL while Spark answers, the mirror image of the r10 ROLLUP asymmetry
— guarded in generate(), pinned by
test_correlated_having_under_group_by_all_is_guarded).  r14:
180 -> 200 seeds alongside grammar round 10 (nested LATERAL chains —
a second scalar-agg lateral correlating on lat_0 strictly through its
WHERE, because building the round found engine asymmetry NINE: Spark
4.1 refuses outer references in a lateral's projection/aggregate
expressions while DuckDB answers, pinned by
test_lateral_projection_outer_ref_is_guarded; correlated scalars
inside CASE branches in WHERE and the projection; set ops inside
correlated EXISTS bodies; COUNT(DISTINCT) FILTER — window-frame
GROUPS mode and EXCLUDE were probed and rejected: Spark parses
neither, so no cross-engine surface exists).  The Spark side and the DuckDB oracle share
the identical CORE plan text; only the md5->int digest plumbing
differs per engine (Spark spells it CONV(SUBSTR(MD5 ..)), DuckDB
CAST('0x' || SUBSTR(md5 ..))) — the repo's standing portable-hash
pattern (functions/hashing.py:md5hash60).

A hash mismatch on ANY seed fails the driver's value check for the
whole battery sub, so the gate now certifies not just the hand-written
operator surface but a sample of the open query space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datalake_spark.fuzzgen import TABLES, gate_safe, generate
from datalake_spark.functions.hashing import sql_md5hash60

_N_GATE_PLANS = 200
_MOD = 1_000_000_007


def _gate_specs():
    """First ``_N_GATE_PLANS`` gate-safe specs from seed 200 upward —
    disjoint from the exploratory harness's 0..149 so the two suites
    never sample the same shapes.  Since r6 the whole grammar is
    gate-safe (windows + canonicalized doubles), so this is seeds
    200..279; gate_safe() stays in the loop as the hook for future
    non-digest-safe grammar growth."""
    out = []
    seed = 200
    while len(out) < _N_GATE_PLANS:
        spec = generate(seed)
        if gate_safe(spec):
            out.append((seed, spec))
        seed += 1
    return out


def _spark_hash(expr: str) -> str:
    return f"CAST(CONV(SUBSTR(MD5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _wrap(seed: int, spec, hash_fn) -> str:
    # double-typed outputs go through the repo's standing 'd' canon
    # (FLOOR(x*1e6+0.5) as BIGINT) — identical IEEE ops in both engines
    # — because double-to-string formatting is engine-specific; all
    # other types stringify portably
    def cell(c: str) -> str:
        if c in spec.dbl_out:
            return (
                f"COALESCE(CAST(CAST(FLOOR({c} * 1000000 + 0.5) AS BIGINT)"
                f" AS VARCHAR(64)), '<null>')"
            )
        return f"COALESCE(CAST({c} AS VARCHAR(64)), '<null>')"

    canon = ", ".join(cell(c) for c in spec.out_cols())
    rowstr = f"CONCAT_WS('|', {canon})"
    return (
        f"SELECT {seed} AS seed, CAST(COUNT(*) AS BIGINT) AS n_rows, "
        f"CAST(COALESCE(SUM(({hash_fn(rowstr)}) % {_MOD}), 0) AS BIGINT) "
        f"AS vhash FROM ({spec.sql()}) _t{seed}"
    )


_SPECS = _gate_specs()

_SPARK_TEXT = "\nUNION ALL\n".join(
    _wrap(seed, spec, _spark_hash) for seed, spec in _SPECS
)

FUZZ_PLANS_SQL = "\nUNION ALL\n".join(
    _wrap(seed, spec, sql_md5hash60) for seed, spec in _SPECS
)


def fuzz_plans(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(_SPARK_TEXT)
