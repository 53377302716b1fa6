"""Local replica of the driver's correctness gate: run each declared query in
Spark AND its DuckDB oracle on the same sf dir, compare row count, column
names/dtypes, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
       python tools/check_parity.py --sf1 [query ...]

``--sf1`` is the fast scale-parity regression harness (r6's one-off
sweep, frozen): it ensures the tiled sf1.0 dataset exists (building it
via tools/make_sfn.py on first use, ~2 min) and runs the six entries r6
identified as sf-SENSITIVE — the ones whose caps/tiebreaks/sketch
verdicts only start binding under 10x duplication (PARITY_sf1.md
findings 1-4): simhash_pairs, fuzzy_join_lev1, dl_latest_all,
hll_distinct_verdict + q_approx_distinct, minhash_lsh_dedup,
dedup_clusters.  Battery SUBS run standalone (their parent batteries
carry sf1.0-hostile siblings like the 20k^2 embedding oracle), each
compared against its own oracle.  Budget ~10 min; run once per round.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from datalake_spark.queries import TABLES  # noqa: E402
from datalake_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values so both engines stringify identically
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(canon)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns {sc} vs {dc}")
        return problems
    # dtype families must agree too (the driver compares schemas; int64 vs
    # float64 or object vs bool would fail there even when values stringify
    # identically)
    def fam(dt):
        k = dt.kind  # b/i/u/f/O/M...
        return {"u": "i"}.get(k, k)

    for c in sc:
        fs, fd = fam(spark_pdf[c].dtype), fam(duck_pdf[c].dtype)
        # an all-NULL spark column arrives as object; don't flag those
        if fs != fd and not (spark_pdf[c].isna().all() or duck_pdf[c].isna().all()):
            problems.append(
                f"dtype {c}: spark {spark_pdf[c].dtype} vs duck {duck_pdf[c].dtype}"
            )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = list(a.index[neq])[:3]
        for i in idx:
            problems.append(f"row diff @{i}:\n  spark={a.loc[i].to_dict()}\n  duck ={b.loc[i].to_dict()}")
    return problems


SF1_DIR = "/root/repo/.sf1"
# the sf-sensitive set (PARITY_sf1.md findings 1-4 + their guards)
SF1_ENTRIES = [
    "simhash_pairs", "fuzzy_join_lev1", "dl_latest_all",
    "hll_distinct_verdict", "q_approx_distinct", "minhash_lsh_dedup",
    "dedup_clusters",
]


def _ensure_sf1() -> str:
    import os

    if not os.path.isfile(f"{SF1_DIR}/lineitem.parquet"):
        print(f"building sf1.0 testdata at {SF1_DIR} (one-time, ~2 min)")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from make_sfn import build

        build("/root/testdata/sf0.1", SF1_DIR, 10)
    return SF1_DIR


def main() -> int:
    argv = list(sys.argv[1:])
    sf1_mode = "--sf1" in argv
    if sf1_mode:
        argv.remove("--sf1")
        sf_dir = _ensure_sf1()
        only = set(argv) or set(SF1_ENTRIES)
    else:
        sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
        only = set(argv[1:])
    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    if sf1_mode:
        # battery subs run standalone: their parent batteries carry
        # sf1.0-hostile siblings (embedding_near_dup's 20k^2 oracle)
        from datalake_spark.queries import registry
        from datalake_spark.queries.batteries import BATTERY_SUBS

        registry()  # populate BATTERY_SUBS
        for subs in BATTERY_SUBS.values():
            for sub in subs:
                if sub.q.name in only and sub.q.name not in qs:
                    qs[sub.q.name] = sub.q.build
                    if sub.q.oracle:
                        oracles[sub.q.name] = sub.q.oracle
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = n_rows_only = 0
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = build(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows):")
            for p in problems:
                print("   ", p)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
