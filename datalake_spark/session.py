"""SparkSession factory tuned for the engine.

Local mode is a correctness/test harness; every config here is chosen so the
same code scales to a multi-executor cluster: AQE for runtime re-planning
(partition coalescing, skew-join splitting), shuffle partitions sized to the
parallelism at hand, Arrow for any pandas exchange, UTC session timezone so
results are oracle-comparable (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB the shuffle-partition count should target ~128-256 MB per
# partition post-shuffle; AQE coalesces down from a high initial number, so on
# a real cluster we set a large initialPartitionNum and let AQE shrink it.
# Locally we match core count.
_LOCAL_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "datalake_spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(_LOCAL_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        # r15 config-tier knobs (guide §9), each A/B'd one at a time
        # against the protocol bench — env-overridable so the A/B legs
        # and any production deployment can flip them without a code
        # change; defaults hold the measured-winning value:
        # shuffle/spill compression codec (guide §2.3: zstd compresses
        # markedly better for a bit more CPU; at sf0.1 the shuffles are
        # tiny so local delta is noise — the default stays lz4 unless
        # the A/B shows a win, see OPTIMIZATION_r15.md)
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        # guide §3.1: allow shuffled-hash where its size conditions are
        # met instead of always sort-merge (A/B'd; see
        # OPTIMIZATION_r15.md)
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"),
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        # local mode is one JVM: the "driver" heap is the whole
        # executor memory too.  16g suits the gate SFs; sf10 one-offs
        # (60 M-row windows under the 180-plan fuzz battery) need more
        # — env-tunable so the scale harness can raise it without
        # changing the driver's defaults.
        builder = builder.master(f"local[{cpus}]").config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
