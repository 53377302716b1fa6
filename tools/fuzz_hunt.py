"""One-off fresh-seed differential hunt: Spark vs DuckDB over the fuzz
grammar (datalake_spark/fuzzgen.py), reusing the exploratory harness's
mismatch + shrink machinery (tests/test_fuzz_differential.py).

Usage:  python tools/fuzz_hunt.py [--digest] START COUNT [SF_DIR]

``--digest`` compares per-seed (n_rows, vhash) gate digests instead of
full materialized results — the ONLY harness shape that works at sf10
(an unlimited projection at 60 M rows trips spark.driver.maxResultSize
and the full-result transfer costs tens of GB); localize a digest
divergence by re-running the seed at a gate SF in full mode.

Seed-range log (each range cleared with 0 unexplained divergences at
the grammar version current at the time; generate() reshuffles all
seeds on every grammar change, so clearances don't carry forward):
  r6: 300-1199 @ sf0.001      r7: 1200-2199 @ sf0.001, 1200-1699 @ sf0.01
  r8: 2x500 hunts             r9: 3200-3699 @ sf0.001 (found the
  projection-scalar-over-derived Spark crash at seed 3463, then clean
  after the guard), 3700-3949 @ sf0.01 clean, 3950-4449 @ sf0.001 clean
  r10 (grammar round 6): 4450-4949 @ sf0.001 pre-guard found the
  correlated-HAVING-under-ROLLUP Spark resolution failure (4457/4629/
  4739, same class as gate-freeze seed 251); clean on re-hunt after the
  guard; 4950-5199 @ sf0.01 clean; bonus 5200-6699 @ sf0.001 clean
  r11 (grammar round 7: fjoin-derived, GROUPING SETS, EXISTS-HAVING,
  NULL-bearing IN, LAG/NTILE): 6700-7399 @ sf0.001 clean; bonus
  7400-7999 @ sf0.001 clean, 8000-8299 @ sf0.01 clean,
  8300-9899 @ sf0.001 clean
  r12 (grammar round 8: base_c CTEs referenced 2-3x, aggregate FILTER,
  correlated scalars driving ORDER BY via projected alias,
  INTERSECT/EXCEPT ALL everywhere — building the round found TWO
  engine asymmetries pre-hunt: self-named CTE resolution and inline
  ORDER-BY correlated scalars, both guarded + pinned):
  9900-10399 @ sf0.001 clean, 10400-10699 @ sf0.01 clean,
  10700-11399 @ sf0.001 clean, 11400-11899 @ sf0.01 clean
  r13 (grammar round 9: top-k LATERAL, DISTINCT-aggregated derived
  tables, correlated EXISTS under set-ops on the NULL-padded side,
  GROUP BY ALL): 11900-12199 @ sf0.001 found asymmetry EIGHT at seed
  12088 (DuckDB binder refuses correlated HAVING under GROUP BY ALL —
  the ROLLUP asymmetry mirrored; guarded + pinned), clean on re-hunt;
  12200-12599 @ sf0.001, 12600-12799 @ sf0.01, 12800-13299 @ sf0.001,
  13300-13599 @ sf0.01 all clean (1,700 fresh seeds this round);
  13700-13819 @ sf10 DIGEST MODE clean (two batches) — plans agree at
  ~60 M rows, 100x the gate SF; 13600-13699 @ sf0.1 clean;
  13820-14019 @ sf1 DIGEST MODE clean (randomized plans verified at
  every SF the harness ships: 0.001/0.01/0.1/1/10)
  r14 (grammar round 10: nested LATERAL chains — building found
  asymmetry NINE pre-hunt: Spark refuses outer refs in a lateral's
  projection, guarded to WHERE-only correlation + pinned; correlated
  scalars in CASE branches, set ops inside correlated EXISTS bodies,
  COUNT(DISTINCT) FILTER): 14020-14519 @ sf0.001 clean,
  14520-14819 @ sf0.01 clean, 14820-14919 @ sf1 DIGEST MODE clean
  (round-10 grammar verified at 10x)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import duckdb  # noqa: E402

from datalake_spark.fuzzgen import TABLES, generate  # noqa: E402
from datalake_spark.session import get_spark  # noqa: E402
from test_fuzz_differential import mismatch, shrink  # noqa: E402


def _digest_mismatch(spark, con, spec, seed) -> str | None:
    """Per-seed (n_rows, vhash) digest comparison — the GATE's own
    semantic (queries/fuzz_q._wrap), one row per engine per seed.  The
    sf10 harness shape: the full-result toPandas() comparison breaks at
    100x on unlimited projections (driver.maxResultSize on the Spark
    side; tens of GB of transfer on both), while the digest bounds
    result transfer to one row regardless of plan output size.  Errors
    follow mismatch()'s rule: both-engines-error = agreement."""
    from datalake_spark.queries.fuzz_q import _spark_hash, _wrap
    from datalake_spark.functions.hashing import sql_md5hash60

    spk_err = dck_err = None
    try:
        srow = spark.sql(_wrap(seed, spec, _spark_hash)).collect()[0]
        s = (srow["n_rows"], srow["vhash"])
    except Exception as e:
        spk_err = e
    try:
        d = con.execute(_wrap(seed, spec, sql_md5hash60)).fetchone()[1:]
        d = (int(d[0]), int(d[1]))
    except Exception as e:
        dck_err = e
    if spk_err is not None and dck_err is not None:
        return None
    if spk_err is not None:
        return f"spark-only error: {spk_err}"
    if dck_err is not None:
        return f"duckdb-only error: {dck_err}"
    if s != d:
        return f"digest: spark={s} duck={d}"
    return None


def main() -> int:
    digest = "--digest" in sys.argv
    if digest:
        sys.argv.remove("--digest")
    start = int(sys.argv[1])
    count = int(sys.argv[2])
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

    spark = get_spark("fuzz-hunt")
    con = duckdb.connect()
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    str_values = {}
    for t, (_k, _i, strs, _d) in TABLES.items():
        for c in strs:
            if c in ("c_name", "n_name"):
                continue
            str_values[c] = [
                r[0]
                for r in con.execute(
                    f"SELECT DISTINCT {c} FROM {t} ORDER BY {c} LIMIT 5"
                ).fetchall()
            ]

    n_div = 0
    for seed in range(start, start + count):
        spec = generate(seed, str_values)
        if digest:
            err = _digest_mismatch(spark, con, spec, seed)
            if err is not None:
                n_div += 1
                print(f"DIVERGENCE seed {seed}: {err}")
                print(f"  full:   {spec.sql()}")
            # no shrink in digest mode: re-run the seed at a gate SF
            # with the full comparison to localize
            if (seed - start + 1) % 10 == 0:
                print(
                    f"... {seed - start + 1}/{count} done, "
                    f"{n_div} divergences", flush=True,
                )
            continue
        err = mismatch(spark, con, spec.sql())
        if err is not None:
            n_div += 1
            small = shrink(spark, con, spec)
            print(f"DIVERGENCE seed {seed}: {err}")
            print(f"  full:   {spec.sql()}")
            print(f"  shrunk: {small.sql()}")
            print(f"  shrunk mismatch: {mismatch(spark, con, small.sql())}")
        if (seed - start + 1) % 50 == 0:
            print(f"... {seed - start + 1}/{count} done, {n_div} divergences",
                  flush=True)
    print(f"HUNTLOG seeds {start}-{start + count - 1} @ {sf_dir}: "
          f"{n_div} divergences")
    return 1 if n_div else 0


if __name__ == "__main__":
    raise SystemExit(main())
