"""Streaming ingestion tests — behaviors from ingester/tests/test_ingester.py
and test_storage.py: event dispatch, idempotent at-least-once handling,
latest-table conditional-upsert semantics (incl. out-of-order and equal-start
arrivals), report side-output."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datalake_spark.catalog import Catalog
from datalake_spark.streaming.ingest import StreamingIngester, classify_events


def event(file_id, what="nginx", where="h1", start=1420070400000, end=None,
          name="ObjectCreated:Put", version="2.1", event_time=None, size=10):
    return {
        "event_name": name,
        "event_version": version,
        "bucket_name": "bkt",
        "key_name": f"{file_id}/data",
        "event_time": event_time or start + 500,
        "file_id": file_id,
        "size": size,
        "metadata": {
            "version": 0,
            "start": start,
            "end": end,
            "what": what,
            "where": where,
            "id": file_id,
            "hash": "h" + file_id,
            "path": "/var/log/x",
            "work_id": None,
        },
    }


def write_events(path, events, name="batch.json"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def run_ingest(spark, root, events, name="b1.json"):
    cat = Catalog(spark, os.path.join(root, "cat"))
    ing = StreamingIngester(spark, cat)
    landing = os.path.join(root, "landing")
    write_events(landing, events, name)
    q = ing.start(landing, os.path.join(root, "ckpt"))
    q.awaitTermination(60)
    return cat, ing


class TestClassify:
    def test_dispatch(self, spark):
        evs = [
            event("a"),
            event("b", name="ObjectCreated:Copy"),
            event("c", name="ObjectCreated:CompleteMultipartUpload"),
            event("d", name="ObjectRemoved:Delete"),
            event("e", name="s3:TestEvent"),
            event("f", version="1.0"),
        ]
        df = spark.createDataFrame(evs)
        got = {
            r["file_id"]: r["disposition"]
            for r in classify_events(df).select("file_id", "disposition").collect()
        }
        assert got["a"] == got["b"] == got["c"] == "ok"
        assert got["d"] == "error_unsupported"
        assert got["e"] == "skip"
        assert got["f"] == "error_version"


class TestIngest:
    def test_end_to_end(self, spark, tmp_path):
        cat, ing = run_ingest(
            spark,
            str(tmp_path),
            [event("a1"), event("a2", where="h2"), event("bad", name="Nope:Event")],
        )
        files = cat.files()
        assert {r["id"] for r in files.collect()} == {"a1", "a2"}
        latest = cat.latest_table()
        assert latest.count() == 2
        reports = ing.reports()
        assert reports.count() == 1
        r = reports.collect()[0]
        assert r["status"] == "error" and r["n_records"] == 2 and r["n_errors"] == 1

    def test_duplicate_delivery_idempotent(self, spark, tmp_path):
        # at-least-once: same file_id delivered twice in a batch -> one row
        cat, _ = run_ingest(spark, str(tmp_path), [event("dup"), event("dup")])
        assert cat.files().count() == 1

    def test_latest_upsert_out_of_order(self, spark, tmp_path):
        """Conditional-upsert semantics (storage.py:82): newer start wins;
        an out-of-order older record must NOT displace it; equal start is
        replaced by the later arrival (test_storage.py:117-160)."""
        root = str(tmp_path)
        cat = Catalog(spark, os.path.join(root, "cat"))
        ing = StreamingIngester(spark, cat)
        landing = os.path.join(root, "landing")
        ckpt = os.path.join(root, "ckpt")
        t0 = 1420070400000
        write_events(landing, [event("new", start=t0 + 5000, event_time=t0 + 5100)], "b1.json")
        q = ing.start(landing, ckpt)
        q.awaitTermination(60)
        # out-of-order older record arrives later
        write_events(landing, [event("old", start=t0, event_time=t0 + 9000)], "b2.json")
        q = ing.start(landing, ckpt)
        q.awaitTermination(60)
        latest = {r["what_where_key"]: r["id"] for r in cat.latest_table().collect()}
        assert latest["nginx:h1"] == "new"
        # equal-start, later create_time replaces (ties replace)
        write_events(
            landing,
            [event("tie", start=t0 + 5000, event_time=t0 + 6000)],
            "b3.json",
        )
        q = ing.start(landing, ckpt)
        q.awaitTermination(60)
        latest = {r["what_where_key"]: r["id"] for r in cat.latest_table().collect()}
        assert latest["nginx:h1"] == "tie"
        # files table kept every version (3 rows)
        assert cat.files().count() == 3
