"""Catalog — the ``files`` and ``latest`` tables over a data lake.

The reference stores one DynamoDB row per (day-bucket × file) for index
locality (client/datalake/common/record.py:67-89) and a separate latest table
(ingester/datalake_ingester/storage.py:78-137).  The Spark-native design keeps
ONE logical row per file in a parquet table partitioned by
``what`` / ``bucket_date`` (derived from ``start``), so Catalyst's partition
pruning replaces the DynamoDB time-index walk; the bucket fan-out exists only
as a view (``file_buckets``) for callers that want the reference's physical
shape.

At 100 TB: partitioning by (what, bucket_date) gives ~(#whats × #days)
partitions, each holding the day's files for one producer — time-interval
queries touch only the overlapping day-partitions, work-id queries rely on
parquet min/max stats over the sorted-on-write ``work_id`` column, and the
``latest`` table is a tiny MERGE-maintained aggregate that replaces a full
scan with an O(1) read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datalake_spark.metadata import DAY_MS
from datalake_spark.schema import FILES_SCHEMA


def with_bucket_date(df: DataFrame) -> DataFrame:
    """Add the derived day-partition column (record.py:151-160's bucket)."""
    return df.withColumn(
        "bucket_date", F.to_date(F.timestamp_millis(F.col("start")))
    )


def explode_buckets(df: DataFrame) -> DataFrame:
    """Reference-shaped fan-out: one row per day bucket the interval touches
    (record.py:171-192).  ``sequence`` is evaluated JVM-side; span is bounded
    by validation at MAX_BUCKET_SPAN=30 so the explode factor is ≤30."""
    return df.withColumn(
        "time_bucket",
        F.explode(
            F.sequence(
                (F.col("start") / DAY_MS).cast("long"),
                (F.coalesce(F.col("end"), F.col("start")) / DAY_MS).cast("long"),
            )
        ),
    )


class Catalog:
    """File-metadata catalog: append-oriented ``files`` + derived ``latest``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.files_path = os.path.join(root, "files")
        self.latest_path = os.path.join(root, "latest")

    # -- write path ---------------------------------------------------------
    def append(self, df: DataFrame) -> None:
        """Append validated metadata rows (idempotency is by ``id`` at query
        time, mirroring the reference's tolerated duplicate puts,
        ingester/datalake_ingester/storage.py:64-73)."""
        (
            with_bucket_date(df)
            # sort within partitions so parquet row-group stats make work_id
            # and id lookups skippable without an index
            .sortWithinPartitions("work_id", "id")
            .write.mode("append")
            .partitionBy("what", "bucket_date")
            .parquet(self.files_path)
        )

    def refresh_latest(self) -> None:
        """Recompute the latest table: top-1 per (what, where) by
        (start, create_time) — the reference's conditional-upsert invariant
        'replace iff new.start >= existing.start', ties won by the newer write
        (storage.py:82, ingester/tests/test_storage.py:154+).

        Batch analog of the streaming MERGE in streaming/ingest.py.
        """
        files = self.files()
        latest = (
            files.groupBy("what", "where")
            .agg(
                F.max_by(
                    F.struct(*[f.name for f in FILES_SCHEMA.fields]),
                    F.struct(F.col("start"), F.col("create_time")),
                ).alias("r")
            )
            .select(
                F.concat_ws(":", F.col("what"), F.col("where")).alias("what_where_key"),
                F.col("r.*"),
            )
        )
        latest.write.mode("overwrite").parquet(self.latest_path)

    # -- read path ----------------------------------------------------------
    def files(self) -> DataFrame:
        return self.spark.read.parquet(self.files_path)

    def latest_table(self) -> DataFrame | None:
        try:
            return self.spark.read.parquet(self.latest_path)
        except Exception:
            return None

    def compact(self, target_file_rows: int = 1_000_000) -> None:
        """Rewrite the files table to bounded file counts per partition.

        Streaming ingest appends one parquet file per micro-batch per
        partition; over time a (what, bucket_date) partition accumulates
        many small files and scan task scheduling dominates IO.  Compaction
        rewrites each partition's rows into ceil(rows / target_file_rows)
        files, re-sorting on (work_id, id) so row-group stats stay skippable.

        At 100 TB this is the maintenance job (run off-peak, per partition);
        the rewrite is atomic per run via a staging directory swap —
        concurrent readers of the old listing keep working until the swap.
        """
        import shutil

        df = self.files()
        staged = self.files_path + "_compacting"
        (
            df.repartition(F.col("what"), F.col("bucket_date"))
            .sortWithinPartitions("work_id", "id")
            .write.mode("overwrite")
            .option("maxRecordsPerFile", target_file_rows)
            .partitionBy("what", "bucket_date")
            .parquet(staged)
        )
        old = self.files_path + "_precompact"
        shutil.move(self.files_path, old)
        shutil.move(staged, self.files_path)
        shutil.rmtree(old)

    def file_buckets(self) -> DataFrame:
        """Reference's DatalakeRecord view: the per-bucket fan-out with the
        composite index keys (record.py:53-65), derived — never stored."""
        df = explode_buckets(self.files())
        return df.select(
            "*",
            F.concat_ws(":", F.col("time_bucket"), F.col("what")).alias("time_index_key"),
            F.concat_ws(":", F.col("where"), F.col("id")).alias("range_key"),
            F.when(
                F.col("work_id").isNotNull(),
                F.concat_ws(":", F.col("work_id"), F.col("what")),
            )
            # null work_id is randomized in the reference to avoid a hot key
            # (record.py:197-199); we salt deterministically with the id.
            .otherwise(F.concat(F.lit("null"), F.col("id"), F.lit(":"), F.col("what")))
            .alias("work_id_index_key"),
        )
