"""Pluggable event sources for the streaming ingest pipeline.

The reference ingester long-polls SQS for S3 notifications
(ingester/datalake_ingester/queue.py:52-78); the Spark-native pipeline is
source-agnostic — `StreamingIngester._handle_batch` consumes any streaming
DataFrame in INGEST_EVENT_SCHEMA shape, so swapping the transport is a
one-line change here, not a pipeline rewrite:

- ``files``  — JSON events in a landing directory (the default used by
  tests and the driver gate; an S3-notification drop-bucket behaves the
  same way when mounted).
- ``rate``   — the rate-micro-batch source mapped to synthetic well-formed
  events: deterministic load/soak input with zero external dependencies.
- ``kafka``  — the Kafka connector with the same JSON envelope in
  ``value``; gated on the spark-sql-kafka package being on the classpath
  (absent in this container — the error message says exactly what to add).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_spark.schema import INGEST_EVENT_SCHEMA


def event_stream(
    spark: SparkSession,
    source: str = "files",
    landing_dir: str | None = None,
    rows_per_batch: int = 20,
    kafka_bootstrap: str | None = None,
    kafka_topic: str = "datalake-events",
) -> DataFrame:
    """A streaming DataFrame of ingest events in INGEST_EVENT_SCHEMA shape
    from the chosen transport."""
    if source == "files":
        if landing_dir is None:
            raise ValueError("files source requires landing_dir")
        return spark.readStream.schema(INGEST_EVENT_SCHEMA).json(landing_dir)
    if source == "rate":
        rate = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_batch)
            .load()
        )
        return _rate_to_events(rate)
    if source == "kafka":
        if kafka_bootstrap is None:
            raise ValueError("kafka source requires kafka_bootstrap")
        try:
            raw = (
                spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", kafka_bootstrap)
                .option("subscribe", kafka_topic)
                .load()
            )
        except Exception as e:  # connector jar absent from the classpath
            raise NotImplementedError(
                "the kafka source needs the spark-sql-kafka connector on "
                "the classpath (--packages org.apache.spark:"
                "spark-sql-kafka-0-10_2.13:<spark-version>); the event "
                f"envelope itself is transport-agnostic ({e})"
            )
        return parse_event_envelope(raw)
    raise ValueError(f"unknown event source {source!r}")


def parse_event_envelope(raw: DataFrame) -> DataFrame:
    """Project a Kafka-shaped frame (binary/string ``value`` column holding
    one JSON event) onto INGEST_EVENT_SCHEMA.  Split out from the kafka
    branch so the parse contract is testable on a static DataFrame without
    the connector jar (tests/test_streaming.py pins it against the
    landing-dir JSON read of the same bytes)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), INGEST_EVENT_SCHEMA).alias("e")
    ).select("e.*")


def _rate_to_events(rate: DataFrame) -> DataFrame:
    """Map rate-source (timestamp, value) rows to deterministic well-formed
    Put events — pure Column logic, so the synthetic load path exercises
    the same classify/dedup/append/merge plan as production events."""
    ms = (F.col("timestamp").cast("double") * 1000).cast("long")
    fid = F.concat(F.lit("rate-"), F.col("value").cast("string"))
    return rate.select(
        F.lit("ObjectCreated:Put").alias("event_name"),
        F.lit("2.1").alias("event_version"),
        F.lit("rate-bucket").alias("bucket_name"),
        F.concat(fid, F.lit("/data")).alias("key_name"),
        ms.alias("event_time"),
        fid.alias("file_id"),
        F.struct(
            F.lit(0).cast("int").alias("version"),
            ms.alias("start"),
            F.lit(None).cast("long").alias("end"),
            F.lit("rate").alias("what"),
            # spread rows over 4 'where' hosts so the latest-table merge
            # exercises multi-key upserts
            F.concat(
                F.lit("host"), (F.col("value") % 4).cast("string")
            ).alias("where"),
            fid.alias("id"),
            F.md5(fid).alias("hash"),
            F.concat(F.lit("/synthetic/"), fid).alias("path"),
            F.lit(None).cast("string").alias("work_id"),
        ).alias("metadata"),
        (F.col("value") % 1000).cast("long").alias("size"),
    )
