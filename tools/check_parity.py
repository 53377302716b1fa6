"""Local replica of the driver's correctness gate: run each declared query in
Spark AND its DuckDB oracle on the same sf dir, compare row count, column
names/dtypes, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
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
