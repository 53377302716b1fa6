"""Benchmark the declared query surface at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the noop sink so every output column is
computed (a bare .count() would let Catalyst prune the interesting work).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from datalake_spark.queries import registry  # noqa: E402
from datalake_spark.session import get_spark  # noqa: E402

# Headline set: the scale-sensitive queries (full-table aggregation, multi-way
# join, window, range join, near-dup self-join, ANN, catalog ops).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q_tumbling_window",
    "q_topk_per_group",
    "q_window_running",
    "q_distinct_counts",
    "q_range_join",
    "q_pivot",
    "dl_time_interval",
    "dl_latest_all",
    "dl_bucket_fanout",
    "dedup_exact",
    "text_stats",
    "ngram_jaccard",
    "minhash_lsh_dedup",
    "simhash_pairs",
    "ann_srp_topk",
    "embedding_cosine_topk",
    "asof_last_signup",
    "sessionize",
    "token_bpe_count",
    "doc_chunks",
    "multimodal_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("bench")
    # untimed warmup: JVM codegen + parquet footer/FS cache + the Python UDF
    # worker pool (first pandas_udf stage otherwise pays ~n_cores process
    # spawns inside whichever query happens to run it first)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    @F.pandas_udf(T.LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(10000).repartition(64).select(_warm("id")).write.mode(
        "overwrite"
    ).format("noop").save()
    qs = {q.name: q.build for q in registry()}
    timings: dict[str, float] = {}
    t_total0 = time.time()
    for name in HEADLINE:
        build = qs[name]
        t0 = time.time()
        df = build(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_total0, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
