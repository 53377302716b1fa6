"""Streaming-ingest end-to-end declared as an oracle-checked query.

The pipeline under test is the production path (streaming/ingest.py):
readStream(JSON landing dir) → classify (TestEvent skip, eventVersion 2.x
check, Put/Copy/CompleteMultipartUpload dispatch — ingester.py:101-114,
s3_notification.py:33-61) → foreachBatch: partitioned parquet append to the
files catalog + latest merge + report side-output.

The query synthesizes a deterministic event stream from the ``events`` test
table (exclusive modulo chain marks skip / bad-version / unsupported rows),
runs the real StreamingIngester with availableNow + checkpoint, and returns
the resulting files catalog.  The DuckDB oracle recomputes the surviving rows
relationally — so the correctness gate covers dispatch filtering, metadata
projection, url construction, and the append path end to end.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_spark.catalog import Catalog
from datalake_spark.queries import Q, load
from datalake_spark.queries.datalake_q import FILES_CTE, files_from_events
from datalake_spark.streaming.ingest import StreamingIngester


def _ingest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INGEST_EVENT_SCHEMA rows derived from the events table.  The modulo
    chain is mutually exclusive so the oracle's filter is a plain conjunction:
    %97 → s3:TestEvent (skipped), %89 → eventVersion 1.0 (error), %83 →
    unsupported event name (error), %3 picks among the three supported."""
    files = files_from_events(spark, sf_dir)
    eid = F.col("id")
    name = (
        F.when(eid % 97 == 0, F.lit("s3:TestEvent"))
        .when(eid % 89 == 0, F.lit("ObjectCreated:Put"))
        .when(eid % 83 == 0, F.lit("ObjectRemoved:Delete"))
        .when(eid % 3 == 0, F.lit("ObjectCreated:Copy"))
        .when(eid % 3 == 1, F.lit("ObjectCreated:Put"))
        .otherwise(F.lit("ObjectCreated:CompleteMultipartUpload"))
    )
    version = F.when((eid % 97 != 0) & (eid % 89 == 0), F.lit("1.0")).otherwise(
        F.lit("2.0")
    )
    sid = eid.cast("string")
    return files.select(
        name.alias("event_name"),
        version.alias("event_version"),
        F.lit("test-bucket").alias("bucket_name"),
        F.concat(sid, F.lit("/data")).alias("key_name"),
        F.col("create_time").alias("event_time"),
        sid.alias("file_id"),
        F.struct(
            F.lit(0).alias("version"),
            F.col("start_ms").alias("start"),
            F.col("end_ms").alias("end"),
            F.col("what"),
            F.col("site").alias("where"),
            sid.alias("id"),
            F.col("hash"),
            F.concat(F.lit("/var/log/"), F.col("what"), F.lit("/"), sid).alias("path"),
            F.col("work_id"),
        ).alias("metadata"),
        F.floor(F.col("start_ms") % 100000).cast("long").alias("size"),
    )


def streaming_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = tempfile.mkdtemp(prefix="dl_stream_q_")
    landing = f"{work}/landing"
    _ingest_events(spark, sf_dir).coalesce(4).write.mode("overwrite").json(landing)
    catalog = Catalog(spark, f"{work}/catalog")
    ing = StreamingIngester(spark, catalog, reports_path=f"{work}/reports")
    q = ing.start(landing, f"{work}/checkpoint", available_now=True)
    q.awaitTermination()
    return catalog.files().select(
        "id",
        "what",
        F.col("where").alias("site"),
        F.col("start").alias("start_ms"),
        F.col("end").alias("end_ms"),
        "work_id",
        "create_time",
        "hash",
        "path",
        "url",
        "size",
    )


STREAMING_E2E_SQL = f"""
WITH {FILES_CTE}
SELECT CAST(id AS VARCHAR) AS id, what, site, start_ms, end_ms, work_id,
       create_time, hash,
       '/var/log/' || what || '/' || CAST(id AS VARCHAR) AS path,
       's3://test-bucket/' || CAST(id AS VARCHAR) || '/data' AS url,
       CAST(FLOOR(start_ms % 100000) AS BIGINT) AS size
FROM files
WHERE id % 97 <> 0 AND id % 89 <> 0 AND id % 83 <> 0
"""


QUERIES = [
    Q(
        "streaming_ingest_e2e",
        streaming_ingest_e2e,
        STREAMING_E2E_SQL,
        "readStream → classify → foreachBatch catalog append, end to end",
    ),
]


# ---------------------------------------------------------------------------
# Batch twin of the watermarked stream-stream band join (streaming/joins.py):
# the SAME stream_stream_join function runs here on batch frames (Spark's
# unified API ignores watermarks in batch), so the oracle hash-checks the
# join's key+band logic that the streaming tests drive with real streams —
# view→click attribution within 15 minutes per user.
# ---------------------------------------------------------------------------
def stream_band_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_spark.streaming.joins import stream_stream_join

    ev = load(spark, sf_dir, "events")
    imp = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("k"),
        F.col("ts_ms").alias("event_time"),
        F.col("event_id").alias("imp_id"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"),
        F.col("ts_ms").alias("event_time"),
        F.col("event_id").alias("click_id"),
    )
    out = stream_stream_join(
        imp, clk, key="k", watermark="30 minutes", band="15 minutes"
    )
    return out.select(
        F.col("_lkey").alias("user_id"), "imp_id", "click_id"
    )


STREAM_BAND_JOIN_SQL = """
SELECT a.user_id, a.event_id AS imp_id, b.event_id AS click_id
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_type = 'view' AND b.event_type = 'click'
  AND epoch_ms(b.ts) >= epoch_ms(a.ts)
  AND epoch_ms(b.ts) <= epoch_ms(a.ts) + 900000
"""
