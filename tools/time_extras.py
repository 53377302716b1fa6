"""Time named bench entries (headline or extras) with the bench's exact
methodology — warm pre-pass, clearCache per run, noop sink, min-of-N —
plus the CPU canary before/after, for focused A/B measurement inside one
session (the r14 measurement-continuity protocol: never compare raw
seconds across sessions).

Usage: python tools/time_extras.py [--sf SF_DIR] [--passes N] q1 q2 ...
Prints one JSON line: {"queries": {...}, "canary": [s0, s1]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401  (module-global: pandas_udf resolves
#                      the warm-up UDF's 'pd.Series' hints here)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = 2
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--passes":
            passes = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from bench import _canary, _io_probe_and_warm, _serving_search_entry
    from datalake_spark.queries import registry
    from datalake_spark.queries.batteries import BATTERY_SUBS
    from datalake_spark.session import get_spark

    spark = get_spark("time_extras")
    _io_probe_and_warm(spark, sf_dir)

    @F.pandas_udf(T.LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(10000).repartition(64).select(_warm("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    qs = {q.name: q.build for q in registry()}
    for subs in BATTERY_SUBS.values():
        for sub in subs:
            qs.setdefault(sub.q.name, sub.q.build)
    if "ann_serving_search" in names:
        qs["ann_serving_search"] = _serving_search_entry(spark, sf_dir)

    c0 = _canary(spark)
    timings: dict[str, float] = {}
    for _p in range(passes):
        for name in names:
            spark.catalog.clearCache()
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = round(time.time() - t0, 3)
            if name not in timings or dt < timings[name]:
                timings[name] = dt
            print(f"TIMED {name} pass{_p}: {dt:.3f}s", file=sys.stderr,
                  flush=True)
    c1 = _canary(spark)
    print(json.dumps({"queries": timings, "canary": [c0, c1]}))


if __name__ == "__main__":
    main()
