"""Dump `.explain("formatted")` for named declared queries to files.

Usage: python tools/dump_plans.py --out plans/r14 --suffix _before q1 q2 ...

Writes <out>/<query><suffix>.txt for each query — the round deliverable
(plans/r14/<query>_before.txt / _after.txt) the judge checks plan claims
against.  Construction only: no query is executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    out_dir = "plans/r14"
    suffix = ""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--out":
            out_dir = args[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(a)
            i += 1
    os.makedirs(out_dir, exist_ok=True)

    from datalake_spark.queries import registry
    from datalake_spark.queries.batteries import BATTERY_SUBS
    from datalake_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = {q.name: q.build for q in registry()}
    for subs in BATTERY_SUBS.values():
        for sub in subs:
            qs.setdefault(sub.q.name, sub.q.build)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
