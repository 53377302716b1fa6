"""Randomized differential fuzzing: Spark SQL vs DuckDB on the gate tables.

The suite's other invariants are hand-picked; this harness generates
random small query plans from a seeded grammar — scans, equi-join chains,
filter stacks, aggregates with HAVING, window functions — renders each as
ONE portable ANSI-SQL string, runs it through BOTH engines on the same
parquet tables, and compares row count, column names, and order-
insensitive canonical values (the same canon as tools/check_parity).  On
a mismatch it SHRINKS: clauses are dropped one at a time while the
mismatch persists, so the failure report is the minimal spec, not a
20-clause monster.

Cross-engine exactness rules (the repo's standing discipline):
- aggregates only over integer-typed expressions, CAST to BIGINT
  (DuckDB's SUM(BIGINT) -> HUGEINT needs pinning; double sums are
  association-order-dependent in any engine);
- doubles appear only in WHERE comparisons and MIN/MAX (value
  *selection* is exact even when arithmetic is not);
- window ORDER BY always includes a unique tiebreaker key;
- no engine-specific syntax: the same string must parse in both.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
# r6: 150 -> 200 alongside the grammar growth (join chains, DISTINCT,
# OFFSET, outer joins, null ordering, windows, doubles); the r6 hunts
# additionally cleared seeds 300-1199 at sf0.001/sf0.01 one-off.
# r7 grammar (correlated scalar subqueries, setops over join results,
# CASE/arithmetic projections): one-off hunts cleared fresh seeds
# 1200-2199 at sf0.001 and 1200-1699 at sf0.01, 0 divergences.
N_PLANS = 200

from datalake_spark.fuzzgen import (  # noqa: E402
    JOINS, Spec, TABLES, UNIQUE_KEY, generate,
)

# -- execution + canonical comparison ---------------------------------------


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    try:
        import pandas as pd

        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    out = pdf.map(_canon_cell)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def mismatch(spark, con, sql: str) -> str | None:
    """None = the engines agree.  One engine erroring while the other
    answers is a portability finding; BOTH erroring is agreement (the
    query is invalid — e.g. a shrink step dropped a join a projection
    column depended on), not a differential."""
    spk_err = dck_err = None
    try:
        spk = _canon(spark.sql(sql).toPandas())
    except Exception as e:
        spk_err = e
    try:
        dck = _canon(con.execute(sql).df())
    except Exception as e:
        dck_err = e
    if spk_err is not None and dck_err is not None:
        return None
    if spk_err is not None:
        return f"spark-only error: {spk_err}"
    if dck_err is not None:
        return f"duckdb-only error: {dck_err}"
    if list(spk.columns) != list(dck.columns):
        return f"columns {list(spk.columns)} vs {list(dck.columns)}"
    if len(spk) != len(dck):
        return f"rows {len(spk)} vs {len(dck)}"
    # compare as row tuples: pandas .equals is dtype-sensitive, which
    # false-alarms on EMPTY frames (map() keeps the original dtypes when
    # there are no rows to canonicalize)
    a = [tuple(r) for r in spk.itertuples(index=False)]
    b = [tuple(r) for r in dck.itertuples(index=False)]
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return f"values @{i}: spark={ra} duck={rb}"
    return None


def shrink(spark, con, spec: Spec) -> Spec:
    """Greedy clause-dropping to a local minimum that still mismatches."""
    cur = spec
    changed = True
    while changed:
        changed = False
        for _label, drop in cur.clauses():
            cand = cur.copy()
            drop(cand)
            if mismatch(spark, con, cand.sql()) is not None:
                cur = cand
                changed = True
                break
    return cur


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def spark_tables(spark):
    for t in TABLES:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").createOrReplaceTempView(t)
    return spark


@pytest.fixture(scope="module")
def str_values(duck):
    """A few real values per varchar column so IN-list predicates hit."""
    out = {}
    for t, (_k, _i, strs, _d) in TABLES.items():
        for c in strs:
            if c in ("c_name", "n_name"):
                continue  # high-cardinality names add nothing
            vals = [
                r[0]
                for r in duck.execute(
                    f"SELECT DISTINCT {c} FROM {t} ORDER BY {c} LIMIT 5"
                ).fetchall()
            ]
            out[c] = vals
    return out


class TestDifferentialFuzz:
    def test_seeded_plans_agree(self, spark_tables, duck, str_values):
        failures = []
        for seed in range(N_PLANS):
            spec = generate(seed, str_values)
            err = mismatch(spark_tables, duck, spec.sql())
            if err is not None:
                small = shrink(spark_tables, duck, spec)
                failures.append(
                    f"seed {seed}: {err}\n  full:   {spec.sql()}\n"
                    f"  shrunk: {small.sql()}\n"
                    f"  shrunk mismatch: {mismatch(spark_tables, duck, small.sql())}"
                )
        assert not failures, "\n".join(failures)

    def test_rollup_over_empty_input_divergence_is_guarded(
        self, spark_tables, duck
    ):
        """Documents a REAL engine divergence the r6 grammar growth
        exposed (seed 14): grouping sets over an empty input produce one
        grand-total row in DuckDB (SQL standard) but zero rows in Spark.
        The grammar guards every ROLLUP plan with an identity
        HAVING COUNT(*) >= 1; this test pins (a) the divergence still
        exists bare — if a Spark upgrade fixes it, the guard can go —
        and (b) the guarded form agrees."""
        bare = (
            "SELECT n_regionkey, CAST(MIN(n_regionkey) AS BIGINT) AS agg1 "
            "FROM nation WHERE n_name = '<no such nation>' "
            "GROUP BY ROLLUP(n_regionkey)"
        )
        assert len(spark_tables.sql(bare).collect()) == 0
        assert len(duck.execute(bare).fetchall()) == 1
        assert mismatch(spark_tables, duck, bare + " HAVING COUNT(*) >= 1") is None
        spec = Spec()
        spec.table = "nation"
        spec.mode = "agg"
        spec.group = ["n_regionkey"]
        spec.aggs = ["CAST(MIN(n_regionkey) AS BIGINT) AS agg1"]
        spec.rollup = True
        spec.preds = ["n_name = '<no such nation>'"]
        assert "HAVING COUNT(*) >= 1" in spec.sql()
        assert mismatch(spark_tables, duck, spec.sql()) is None

    def test_rollup_over_join_equality_divergence_is_guarded(
        self, spark_tables, duck
    ):
        """Documents the second REAL engine divergence this fuzzer found
        (r6, seed 375): with both sides of a join equality as ROLLUP
        keys, DuckDB propagates the equality and emits the VALUE for
        the rolled-up column in subtotal rows where the standard (and
        Spark) emit NULL.  Pins (a) the bare divergence still exists —
        if a DuckDB upgrade fixes it the generate() guard can go — and
        (b) generate() never emits that shape."""
        bare = (
            "SELECT c_nationkey, n_nationkey, "
            "CAST(COUNT(*) AS BIGINT) AS agg0 "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY ROLLUP(c_nationkey, n_nationkey)"
        )
        assert mismatch(spark_tables, duck, bare) is not None
        for seed in range(0, 800):
            spec = generate(seed)
            if spec.rollup and spec.join is not None:
                keys = {k.strip() for k in spec.join[1].split("=")}
                assert not keys <= set(spec.group), f"seed {seed}"

    def test_correlated_having_under_rollup_is_guarded(
        self, spark_tables, duck
    ):
        """Documents the FOURTH engine asymmetry this fuzzer found (r10,
        gate-freeze seed 251 + hunt seeds 4457/4629/4739): Spark 4.1
        cannot resolve an outer grouping-column reference inside a
        HAVING subquery when the GROUP BY is a ROLLUP (UNRESOLVED_COLUMN
        — the Expand under the Aggregate hides the grouping attribute),
        while DuckDB answers and the same query with plain GROUP BY
        resolves in BOTH engines.  Pins (a) the bare asymmetry still
        reproduces — if a Spark upgrade fixes it the generate() guard
        can go — (b) the plain-GROUP-BY form stays engine-agreed, and
        (c) generate() never pairs correlated HAVING with rollup."""
        corr_having = (
            "HAVING MIN(c_custkey) <= COALESCE((SELECT MAX(n_regionkey) "
            "FROM nation WHERE c_nationkey = n_nationkey "
            "AND n_regionkey % 2 = 0), 10)"
        )
        bare = (
            "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS agg0 "
            "FROM customer GROUP BY ROLLUP(c_nationkey) " + corr_having
        )
        err = mismatch(spark_tables, duck, bare)
        assert err is not None and err.startswith("spark-only error"), err
        plain = (
            "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS agg0 "
            "FROM customer GROUP BY 1 " + corr_having
        )
        assert mismatch(spark_tables, duck, plain) is None
        for seed in range(0, 800):
            spec = generate(seed)
            if spec.rollup and spec.having:
                assert "SELECT" not in spec.having, f"seed {seed}"

    def test_correlated_having_under_group_by_all_is_guarded(
        self, spark_tables, duck
    ):
        """Documents the EIGHTH engine asymmetry this fuzzer found (r13,
        hunt seed 12088): DuckDB's binder refuses a correlated
        grouping-column reference inside a HAVING subquery under GROUP
        BY ALL ("Having clause cannot reference column ... in
        correlated subquery and group by all") while Spark 4.1 resolves
        it — the mirror image of the r10 ROLLUP asymmetry, where Spark
        was the engine that failed.  Pins (a) the bare asymmetry still
        reproduces — if a DuckDB upgrade fixes it the generate() guard
        can go — (b) the explicit-ordinal twin stays engine-agreed, and
        (c) generate() never pairs correlated HAVING with group_all."""
        corr_having = (
            "HAVING MIN(c_custkey) <= COALESCE((SELECT MAX(n_regionkey) "
            "FROM nation WHERE c_nationkey = n_nationkey "
            "AND n_regionkey % 2 = 0), 10)"
        )
        bare = (
            "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS agg0 "
            "FROM customer GROUP BY ALL " + corr_having
        )
        err = mismatch(spark_tables, duck, bare)
        assert err is not None and err.startswith("duckdb-only error"), err
        plain = (
            "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS agg0 "
            "FROM customer GROUP BY 1 " + corr_having
        )
        assert mismatch(spark_tables, duck, plain) is None
        for seed in range(0, 800):
            spec = generate(seed)
            if spec.group_all and spec.having:
                assert "SELECT" not in spec.having, f"seed {seed}"

    def test_correlated_scalar_over_setop_derived_is_guarded(
        self, spark_tables, duck
    ):
        """Documents the THIRD real engine divergence this fuzzer found
        (r9, hunt seed 3463): a correlated scalar-aggregate subquery
        whose outer relation is a set-op derived table crashes Spark
        4.1's subquery decorrelation with an internal planner error
        (java.util.NoSuchElementException: key not found: n_nationkey#0)
        while DuckDB answers the same SQL.  The crash is specific to the
        PROJECTION site: the same correlated scalar in WHERE, EXISTS /
        IN / EXISTS-under-OR forms, LATERAL scalar-agg derived tables,
        and projection scalars over UNION-dedup were each probed fine in
        both engines, so generate() skips only the projection-scalar
        shape when Spec.derived is set.  Pins (a) the bare crash still
        reproduces — if a Spark upgrade fixes it the fuzzgen guard can
        go — and (b) generate() never emits the crashing shape."""
        derived = (
            "(SELECT * FROM customer WHERE c_nationkey BETWEEN 6 AND 29 "
            "UNION ALL SELECT * FROM customer "
            "WHERE c_nationkey BETWEEN 28 AND 28) AS customer"
        )
        bare = (
            "SELECT COALESCE((SELECT MIN(n_regionkey) FROM nation "
            f"WHERE c_nationkey = n_nationkey), -1) AS sc_0 FROM {derived}"
        )
        err = mismatch(spark_tables, duck, bare)
        assert err is not None and err.startswith("spark-only error")
        # the working forms stay engine-agreed (the guard must not widen)
        ok = (
            f"SELECT c_custkey FROM {derived} WHERE EXISTS "
            "(SELECT 1 FROM nation WHERE c_nationkey = n_nationkey "
            "AND n_regionkey % 2 = 0)"
        )
        assert mismatch(spark_tables, duck, ok) is None
        # the crashing shape is specifically the sc_0 PROJECTION scalar;
        # WHERE-scalar predicates, kind-9 uncorrelated scalars, and
        # LATERAL over derived tables are fine and stay in the grammar
        for seed in range(0, 800):
            spec = generate(seed)
            if spec.derived is not None:
                for c in spec.cols:
                    assert "AS sc_0" not in c, f"seed {seed}: {c}"

    def test_correlated_having_over_derived_tables_agrees(
        self, spark_tables, duck
    ):
        """r11 (advisor finding): the grammar CAN pair correlated HAVING
        scalars with setop/window derived tables — the same
        correlated-over-derived class that crashes Spark's decorrelation
        at the PROJECTION site (r9 seed 3463) — but that combination was
        covered only by hunt sampling.  This pins it deterministically:
        both derived shapes + the correlated HAVING scalar agree across
        engines (the hunts' empirical 'clean' made falsifiable).  If a
        Spark upgrade breaks this, THIS test finds it before a hunt
        does, and the fix is the projection-site guard (spec.derived is
        None) extended to the HAVING site."""
        corr_having = (
            "HAVING MIN(c_custkey) <= COALESCE((SELECT MAX(n_regionkey) "
            "FROM nation WHERE c_nationkey = n_nationkey "
            "AND n_regionkey % 2 = 0), 10)"
        )
        setop_derived = (
            "(SELECT * FROM customer WHERE c_nationkey BETWEEN 2 AND 20 "
            "UNION ALL SELECT * FROM customer "
            "WHERE c_nationkey BETWEEN 18 AND 27) AS customer"
        )
        q1 = (
            f"SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS agg0 "
            f"FROM {setop_derived} GROUP BY 1 " + corr_having
        )
        assert mismatch(spark_tables, duck, q1) is None
        win_derived = (
            "(SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal "
            "FROM (SELECT c_custkey, c_nationkey, c_mktsegment, "
            "c_acctbal, ROW_NUMBER() OVER (PARTITION BY c_mktsegment "
            "ORDER BY c_custkey NULLS FIRST) AS _dw FROM customer "
            "WHERE c_nationkey < 22) AS _dws WHERE _dw <= 7) AS customer"
        )
        q2 = (
            f"SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS agg0 "
            f"FROM {win_derived} GROUP BY 1 " + corr_having
        )
        assert mismatch(spark_tables, duck, q2) is None
        # r11: the FULL-OUTER-join derived shape (NULL c_nationkey rows
        # from the unmatched right side correlate to nothing — the
        # COALESCE arm must agree) and the correlated-EXISTS HAVING form
        fjoin_derived = (
            "(SELECT c_custkey, c_nationkey, c_name, c_mktsegment, "
            "c_acctbal FROM customer FULL OUTER JOIN "
            "(SELECT * FROM nation WHERE n_regionkey % 2 = 0) AS nation "
            "ON c_nationkey = n_nationkey) AS customer"
        )
        q3 = (
            f"SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS agg0 "
            f"FROM {fjoin_derived} GROUP BY 1 " + corr_having
        )
        assert mismatch(spark_tables, duck, q3) is None
        exists_having = (
            "HAVING COUNT(*) >= 1 AND EXISTS (SELECT 1 FROM nation "
            "WHERE c_nationkey = n_nationkey AND n_regionkey % 2 = 0)"
        )
        q4 = (
            f"SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS agg0 "
            f"FROM {setop_derived} GROUP BY 1 " + exists_having
        )
        assert mismatch(spark_tables, duck, q4) is None

    def test_correlated_scalar_in_order_by_is_guarded(
        self, spark_tables, duck
    ):
        """Documents the two r12 grammar-round finds:

        (a) SIXTH engine asymmetry — a correlated scalar subquery
        INLINE in ORDER BY is UNRESOLVED_COLUMN in Spark 4.1 (the
        sort's subquery never binds the outer row; found freezing the
        r12 gate, seed 216) while DuckDB answers.  The grammar emits
        the portable twin instead: project the scalar AS ob_0 and
        order by the alias — pinned engine-agreed here.  If a Spark
        upgrade resolves the inline form, the generate() rewrite can
        go back to the literal site.

        (b) CTE-name resolution divergence — WITH customer AS (SELECT
        ... FROM customer ...) is a circular-CTE binder error in
        DuckDB but resolves the inner reference to the catalog table
        in Spark; the grammar therefore names its CTE base_c.  Pinned:
        the self-named form errors in EXACTLY one engine (divergence),
        the base_c form agrees."""
        inline = (
            "SELECT c_custkey FROM customer "
            "ORDER BY COALESCE((SELECT MAX(n_regionkey) FROM nation "
            "WHERE c_nationkey = n_nationkey), -1) DESC NULLS LAST, "
            "c_custkey NULLS FIRST LIMIT 19"
        )
        err = mismatch(spark_tables, duck, inline)
        assert err is not None and err.startswith("spark-only error"), err
        aliased = (
            "SELECT c_custkey, COALESCE((SELECT MAX(n_regionkey) "
            "FROM nation WHERE c_nationkey = n_nationkey), -1) AS ob_0 "
            "FROM customer ORDER BY ob_0 DESC NULLS LAST, "
            "c_custkey NULLS FIRST LIMIT 19"
        )
        assert mismatch(spark_tables, duck, aliased) is None
        self_named = (
            "WITH customer AS (SELECT * FROM customer "
            "WHERE c_nationkey < 9) SELECT c_custkey FROM customer "
            "ORDER BY c_custkey NULLS FIRST LIMIT 5"
        )
        err = mismatch(spark_tables, duck, self_named)
        assert err is not None and "error" in err, err
        renamed = (
            "WITH base_c AS (SELECT * FROM customer "
            "WHERE c_nationkey < 9) SELECT c_custkey "
            "FROM base_c AS customer "
            "ORDER BY c_custkey NULLS FIRST LIMIT 5"
        )
        assert mismatch(spark_tables, duck, renamed) is None
        # and generate() never emits either unguarded form
        for seed in range(0, 800):
            spec = generate(seed)
            sql = spec.sql()
            if spec.order is not None:
                assert "SELECT" not in spec.order[0], f"seed {seed}"
            if spec.cte is not None:
                assert "WITH base_c AS" in sql, f"seed {seed}"

    def test_lateral_projection_outer_ref_is_guarded(
        self, spark_tables, duck
    ):
        """NINTH engine asymmetry, found building the r14 nested-LATERAL
        chain: an outer reference (here lat_0, the previous lateral's
        output) inside a lateral subquery's PROJECTION/aggregate
        expression is UNSUPPORTED_SUBQUERY_EXPRESSION_CATEGORY.
        CORRELATED_REFERENCE in Spark 4.1 ("not supported outside of
        WHERE/HAVING clauses") while DuckDB answers.  The grammar's
        lateral2 therefore correlates strictly through its WHERE — that
        portable twin is pinned engine-agreed here.  If a Spark upgrade
        lifts the restriction, the projection site can join the
        grammar."""
        proj_site = (
            "SELECT o_orderkey, lat_0, lat_1 FROM orders, "
            "LATERAL (SELECT COALESCE(MIN(c_nationkey), -1) AS lat_0 "
            "FROM customer WHERE o_custkey = c_custkey) AS _lt, "
            "LATERAL (SELECT CAST(COUNT(*) AS BIGINT) + lat_0 AS lat_1 "
            "FROM nation WHERE n_regionkey % 3 = 0) AS _lt2 "
            "ORDER BY o_orderkey NULLS FIRST LIMIT 11"
        )
        err = mismatch(spark_tables, duck, proj_site)
        assert err is not None and err.startswith("spark-only error"), err
        where_site = (
            "SELECT o_orderkey, lat_0, lat_1 FROM orders, "
            "LATERAL (SELECT COALESCE(MIN(c_nationkey), -1) AS lat_0 "
            "FROM customer WHERE o_custkey = c_custkey) AS _lt, "
            "LATERAL (SELECT CAST(COUNT(*) AS BIGINT) AS lat_1 "
            "FROM nation WHERE n_regionkey % 3 = lat_0 % 3) AS _lt2 "
            "ORDER BY o_orderkey NULLS FIRST LIMIT 11"
        )
        assert mismatch(spark_tables, duck, where_site) is None
        # and generate() never puts lat_0 outside lateral2's WHERE
        for seed in range(0, 1500):
            spec = generate(seed)
            if spec.lateral2 is None:
                continue
            head = spec.lateral2.split(" WHERE ")[0]
            assert "lat_0" not in head, f"seed {seed}: {spec.lateral2}"

    def test_shrinker_reduces_a_planted_mismatch(self, spark_tables, duck):
        """Sanity-check the shrinking machinery itself with a spec whose
        mismatch survives clause-dropping: an engine-specific function in
        one projection column (DuckDB-only) always errors, so every
        shrink step keeps it and drops everything else."""
        spec = Spec()
        spec.table = "nation"
        spec.preds = ["n_nationkey > 3", "n_regionkey < 4"]
        spec.cols = ["n_nationkey", "list_value(1) AS boom", "n_name"]
        assert mismatch(spark_tables, duck, spec.sql()) is not None
        small = shrink(spark_tables, duck, spec)
        assert small.preds == [] and small.cols == ["list_value(1) AS boom"]


class TestLateralMultiShrink:
    def test_drop_lateral_leaves_parseable_specs(self, duck):
        """r13: top-k laterals fold lat_0 into the tiebreak baked into
        window/order strings — the lateral dropper must remove those
        strings with the lateral or the shrunk spec won't parse.  Every
        lateral-bearing spec in the first 2000 seeds must still parse
        (DuckDB EXPLAIN) after its lateral dropper fires."""
        n_multi = 0
        for seed in range(0, 2000):
            spec = generate(seed)
            if spec.lateral is None:
                continue
            if spec.lateral_multi:
                n_multi += 1
                # lat_0 must be projected and must ride the tiebreak of
                # any window/order the spec carries
                assert "lat_0" in spec.cols
            dropper = dict(
                (label, fn) for label, fn in spec.clauses()
            ).get("lateral")
            assert dropper is not None
            small = spec.copy()
            dropper(small)
            assert small.lateral is None and not small.lateral_multi
            # r14: the chained lateral correlates on lat_0 — it must
            # drop with the first lateral or the shrunk spec won't bind
            assert small.lateral2 is None
            assert "lat_0" not in small.sql()
            assert "lat_1" not in small.sql()
            duck.execute(f"EXPLAIN {small.sql()}")  # parses
        assert n_multi >= 5  # the top-k form actually occurs

    def test_drop_lateral2_leaves_parseable_specs(self, duck):
        """r14: dropping ONLY the chained lateral keeps lat_0 and the
        rest of the spec intact; the result must still parse."""
        n = 0
        for seed in range(0, 2000):
            spec = generate(seed)
            if spec.lateral2 is None:
                continue
            n += 1
            dropper = dict(
                (label, fn) for label, fn in spec.clauses()
            ).get("lateral2")
            assert dropper is not None
            small = spec.copy()
            dropper(small)
            assert small.lateral2 is None and small.lateral is not None
            assert "lat_1" not in small.sql()
            assert "lat_0" in small.sql()
            duck.execute(f"EXPLAIN {small.sql()}")  # parses
        assert n >= 5  # the chain actually occurs
