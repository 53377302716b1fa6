"""Opt-in Kafka end-to-end smoke — skipped by default, green when the
``spark-sql-kafka`` connector jar is on the classpath AND a broker is
reachable (same declared-gate pattern as the ``av``-gated real-mp4
test): Spark batch-writes the JSON event envelope to a topic, the
streaming ingester readStreams it back through
``parse_event_envelope``, and the micro-batch commits to the catalog.

The transport-agnostic halves are ALWAYS tested elsewhere
(tests/test_streaming.py pins parse_event_envelope against the
landing-dir parse of the same bytes, and the files/rate sources drive
the full pipeline); this is purely the connector wiring.

Reference analog: the ingester's SQS transport e2e
(ingester/tests/test_ingester.py:27-179 over moto SQS) — the queue
technology swapped for the Spark-native one.

Run it for real with:

    spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>
    DATALAKE_KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_e2e.py
"""

import json
import os
import socket
import uuid

import pytest


def _kafka_gate(spark) -> str | None:
    """None when the e2e can run; otherwise the skip reason."""
    try:
        # classloader probe for the connector's source provider — the
        # same loader Spark resolves DataSource names through
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception:
        return "spark-sql-kafka connector not on the classpath"
    bootstrap = os.environ.get("DATALAKE_KAFKA_BOOTSTRAP", "localhost:9092")
    host, _, port = bootstrap.rpartition(":")
    try:
        socket.create_connection((host or "localhost", int(port)), timeout=2).close()
    except OSError:
        return f"no kafka broker reachable at {bootstrap}"
    return None


class TestKafkaEndToEnd:
    def test_envelope_through_broker_to_committed_batch(self, spark, tmp_path):
        reason = _kafka_gate(spark)
        if reason:
            pytest.skip(reason)
        from datalake_spark.catalog import Catalog
        from datalake_spark.streaming.ingest import StreamingIngester
        from datalake_spark.streaming.sources import event_stream

        bootstrap = os.environ.get("DATALAKE_KAFKA_BOOTSTRAP", "localhost:9092")
        topic = f"dl-e2e-{uuid.uuid4().hex[:8]}"
        t0 = 1420245600000
        events = [
            {
                "event_name": "ObjectCreated:Put",
                "event_version": "2.1",
                "bucket_name": "e2e-bucket",
                "key_name": f"k{i}/data",
                "event_time": t0 + i,
                "file_id": f"k{i}",
                "metadata": {
                    "version": 0, "start": t0 + i, "end": None,
                    "what": "nginx", "where": f"h{i % 2}", "id": f"k{i}",
                    "hash": f"{i:032x}", "path": f"/var/log/{i}",
                    "work_id": None,
                },
                "size": 100 + i,
            }
            for i in range(6)
        ]
        # produce through the SAME connector (batch write): no extra
        # client library needed
        (
            spark.createDataFrame(
                [(json.dumps(e),) for e in events], "value string"
            )
            .write.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
            .save()
        )
        cat = Catalog(spark, str(tmp_path / "cat"))
        ing = StreamingIngester(spark, cat)
        stream = event_stream(
            spark, source="kafka", kafka_bootstrap=bootstrap,
            kafka_topic=topic,
        )
        # availableNow drains everything already in the topic, then stops
        q = ing.start_stream(stream, str(tmp_path / "ckpt"),
                             available_now=True)
        q.awaitTermination(120)
        if q.isActive:  # pragma: no cover - broker stalled
            q.stop()
        got = {r["id"] for r in cat.files().collect()}
        assert got == {f"k{i}" for i in range(6)}
        latest = {r["where"]: r["id"] for r in cat.latest_table().collect()}
        assert latest == {"h0": "k4", "h1": "k5"}
