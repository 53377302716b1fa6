"""Per-sub digest parity for the gate batteries at scale SFs.

The batteries fold their subs into ONE UNION query per engine — the
right gate shape at sf0.01, but sf10-hostile for the big batteries on
BOTH sides (q_subquery_battery, r13: the Spark side needs >16 g driver
heap for the monolithic plan, and the DuckDB oracle's one-query spill
exceeded the sandbox disk).  This harness runs the SAME comparison
per-sub instead: each sub's Spark plan and DuckDB oracle are wrapped in
the battery digest (batteries.digest_df / digest_sql — one
(subq, n_rows, digest) row per engine per sub), so memory and disk stay
bounded at any SF and a mismatch localizes to the sub immediately.

Usage:
    python tools/battery_digest.py SF_DIR BATTERY [BATTERY ...]
                                   [--skip SUB,SUB,...]

``--skip`` names subs whose ORACLE is scale-hostile by construction
(e.g. quadratic all-pairs twins of capped operators); each skip prints
a SKIP line so the run's coverage is explicit, never silent.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from datalake_spark.queries import registry  # noqa: E402
from datalake_spark.queries.batteries import (  # noqa: E402
    BATTERY_SUBS,
    digest_df,
    digest_sql,
)
from datalake_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    argv = list(sys.argv[1:])
    skip: set[str] = set()
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    only: set[str] | None = None
    if "--only" in argv:
        # run just the named subs (e.g. re-verifying a pair of subs at
        # a different SF without paying the whole battery)
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    start_after = None
    if "--start-after" in argv:
        # resume an interrupted run: suppress every sub up to and
        # including the named one (their PASS lines are already in the
        # interrupted run's log — a resume must not re-pay them)
        i = argv.index("--start-after")
        start_after = argv[i + 1]
        del argv[i:i + 2]
    sf_dir, batteries = argv[0], argv[1:]
    registry()
    spark = get_spark("battery-digest")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = n_skip = 0
    for bat in batteries:
        subs = BATTERY_SUBS.get(bat)
        if subs is None:
            print(f"FAIL {bat}: unknown battery "
                  f"(have: {sorted(BATTERY_SUBS)})")
            n_fail += 1
            continue
        for sub in subs:
            name = sub.q.name
            if start_after is not None:
                if name == start_after:
                    start_after = None
                continue
            if only is not None:
                if name not in only:
                    continue
                only.discard(name)
            if name in skip:
                print(f"SKIP {bat}/{name} (oracle scale-hostile, "
                      f"--skip)")
                n_skip += 1
                continue
            t0 = time.time()
            try:
                srow = digest_df(
                    sub.q.build(spark, sf_dir), name, sub.cols
                ).collect()[0]
            except Exception as e:
                print(f"FAIL {bat}/{name}: spark error: "
                      f"{str(e).splitlines()[0][:200]}")
                n_fail += 1
                continue
            try:
                drow = con.execute(
                    digest_sql(name, sub.q.oracle, sub.cols)
                ).fetchone()
            except Exception as e:
                print(f"FAIL {bat}/{name}: duckdb error: "
                      f"{str(e).splitlines()[0][:200]}")
                n_fail += 1
                continue
            s = (int(srow["n_rows"]), str(srow["digest"]))
            d = (int(drow[1]), str(drow[2]))
            if s == d:
                print(f"PASS {bat}/{name}: {s[0]} rows digest-exact "
                      f"({time.time()-t0:.1f}s)")
                n_pass += 1
            else:
                print(f"FAIL {bat}/{name}: spark {s} vs duck {d}")
                n_fail += 1
    if only:
        print(f"FAIL --only subs never ran: {sorted(only)}")
        n_fail += 1
    if start_after is not None:
        # the named sub never appeared (typo / wrong battery): a resume
        # that silently suppressed every sub must not read as clean
        print(f"FAIL --start-after {start_after!r} matched no sub — "
              "0 subs ran")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
