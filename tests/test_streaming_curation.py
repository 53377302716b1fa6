"""Streaming curation: rules + watermarked dedup + shard-layout append."""

import glob
import json
import os

import pytest

from datalake_spark.export import read_training_shard
from datalake_spark.streaming.curation import StreamingCurator

T0 = 1_420_070_400_000


def _doc(i, text, lang="en", ms=None):
    return {"doc_id": i, "text": text, "lang": lang, "ms": ms or (T0 + i)}


def _write(landing, docs, name):
    os.makedirs(landing, exist_ok=True)
    with open(os.path.join(landing, name), "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def _good(i):
    body = " ".join(f"the s{i}w{j} a s{i}v{j}" for j in range(8))
    return f"doc {i} begins the tale here {body}"


class TestStreamingCuration:
    def test_rules_dedup_and_shard_layout(self, spark, tmp_path):
        landing = str(tmp_path / "landing")
        shards = str(tmp_path / "shards")
        ckpt = str(tmp_path / "ckpt")
        docs = [_doc(i, _good(i)) for i in range(20)]
        docs += [
            _doc(100, "the a tiny"),            # fails length band
            _doc(101, _good(5), ms=T0 + 5),     # in-watermark dup of doc 5's text
            _doc(102, _good(7), lang="de"),     # fails language
        ]
        _write(landing, docs, "b1.json")
        cur = StreamingCurator(spark, shards, n_shards=4)
        q = cur.start(landing, ckpt)
        q.awaitTermination(120)

        out = spark.read.parquet(shards)
        ids = sorted(r["doc_id"] for r in out.collect())
        assert ids == list(range(20))  # 100/101/102 all dropped
        # shard dirs exist; membership matches the batch writer's key math
        assert {os.path.basename(p).split("=")[1]
                for p in glob.glob(f"{shards}/shard=*")} <= {"0", "1", "2", "3"}
        total = 0
        for s in range(4):
            rows = read_training_shard(spark, shards, s).collect()
            keys = [r["_skey"] for r in rows]
            assert keys == sorted(keys)
            total += len(rows)
        assert total == 20

    def test_restart_appends_only_new_batches(self, spark, tmp_path):
        landing = str(tmp_path / "landing")
        shards = str(tmp_path / "shards")
        ckpt = str(tmp_path / "ckpt")
        _write(landing, [_doc(i, _good(i)) for i in range(5)], "b1.json")
        cur = StreamingCurator(spark, shards, n_shards=2)
        cur.start(landing, ckpt).awaitTermination(120)
        _write(landing, [_doc(i, _good(i)) for i in range(5, 8)], "b2.json")
        cur.start(landing, ckpt).awaitTermination(120)
        ids = sorted(r["doc_id"] for r in spark.read.parquet(shards).collect())
        assert ids == list(range(8))

    def test_compact_every_bounds_shard_files(self, spark, tmp_path):
        from datalake_spark.export import shard_file_counts

        landing = str(tmp_path / "landing")
        shards = str(tmp_path / "shards")
        ckpt = str(tmp_path / "ckpt")
        cur = StreamingCurator(spark, shards, n_shards=2, compact_every=1,
                               max_files_per_shard=2)
        for b in range(4):
            _write(landing, [_doc(b * 10 + k, _good(b * 10 + k))
                             for k in range(3)], f"b{b}.json")
            cur.start(landing, ckpt).awaitTermination(120)
        assert max(shard_file_counts(shards).values()) <= 2
        ids = sorted(r["doc_id"] for r in spark.read.parquet(shards).collect())
        assert len(ids) == 12


class TestStreamingPiiStage:
    def test_scrub_before_hash_dedups_pii_variants(self, spark, tmp_path):
        """Two docs identical except for their embedded PII must collapse
        to one after the scrub stage (scrub runs BEFORE the content
        hash), and the surviving text carries the typed placeholders."""
        from datalake_spark.streaming.curation import (
            StreamingCurator, curate_stream, doc_stream,
        )

        landing = str(tmp_path / "landing")
        shards = str(tmp_path / "shards")
        ckpt = str(tmp_path / "ckpt")
        base = _good(1)
        docs = [
            _doc(1, base + " mail alice@example.com from 10.0.0.7"),
            _doc(2, base + " mail bob@other.org from 192.168.1.9",
                 ms=T0 + 1),
        ]
        _write(landing, docs, "b1.json")
        cur = StreamingCurator(spark, shards, n_shards=2)
        q = cur.start(landing, ckpt, scrub_pii=True)
        q.awaitTermination(120)
        rows = spark.read.parquet(shards).collect()
        assert len(rows) == 1
        assert "<EMAIL>" in rows[0]["text"] and "<IP>" in rows[0]["text"]
        assert "alice@example.com" not in rows[0]["text"]

    def test_scrub_off_keeps_both(self, spark, tmp_path):
        from datalake_spark.streaming.curation import StreamingCurator

        landing = str(tmp_path / "landing")
        base = _good(2)
        docs = [
            _doc(1, base + " mail alice@example.com now ok"),
            _doc(2, base + " mail bob@other.org now ok", ms=T0 + 1),
        ]
        _write(landing, docs, "b1.json")
        cur = StreamingCurator(spark, str(tmp_path / "s2"), n_shards=2)
        q = cur.start(landing, str(tmp_path / "c2"))
        q.awaitTermination(120)
        assert spark.read.parquet(str(tmp_path / "s2")).count() == 2


class TestStreamingNearDup:
    """Incremental MinHash near-dup inside the streaming curator: each
    micro-batch probes the STANDING signature store (never re-pairing the
    corpus) and survivors extend it."""

    def _curator(self, spark, shards):
        return StreamingCurator(
            spark, shards, n_shards=2, near_dup_threshold=0.5
        )

    def test_cross_batch_near_dup_dropped(self, spark, tmp_path):
        landing = str(tmp_path / "landing")
        shards = str(tmp_path / "shards")
        cur = self._curator(spark, shards)
        # batch 1: distinct docs
        _write(landing, [_doc(i, _good(i)) for i in range(6)], "b1.json")
        q = cur.start(landing, str(tmp_path / "ck"))
        q.awaitTermination(120)
        # batch 2: doc 50 is a light edit of doc 2 (same long body, one
        # appended word -> Jaccard >> 0.5, but a DIFFERENT exact hash, so
        # only the near-dup stage can catch it); doc 51 is fresh
        _write(
            landing,
            [_doc(50, _good(2) + " extraword"), _doc(51, _good(51))],
            "b2.json",
        )
        q = cur.start(landing, str(tmp_path / "ck"))
        q.awaitTermination(120)
        ids = sorted(r["doc_id"] for r in spark.read.parquet(shards).collect())
        assert 51 in ids and 50 not in ids
        assert ids == [0, 1, 2, 3, 4, 5, 51]
        # the signature store grew to exactly the survivors
        sigs = spark.read.parquet(f"{shards}/_signatures")
        assert sorted(r["_id"] for r in sigs.select("_id").collect()) == [
            "0", "1", "2", "3", "4", "5", "51",
        ] or sorted(
            int(r["_id"]) for r in sigs.select("_id").collect()
        ) == [0, 1, 2, 3, 4, 5, 51]

    def test_in_batch_near_dup_keeps_min_id(self, spark, tmp_path):
        landing = str(tmp_path / "landing")
        shards = str(tmp_path / "shards")
        cur = self._curator(spark, shards)
        _write(
            landing,
            [_doc(7, _good(7)), _doc(8, _good(7) + " tailword")],
            "b1.json",
        )
        q = cur.start(landing, str(tmp_path / "ck"))
        q.awaitTermination(120)
        ids = sorted(r["doc_id"] for r in spark.read.parquet(shards).collect())
        assert ids == [7]


class TestEpochReplayIdempotence:
    @pytest.mark.parametrize("scheme", ["plain", "mem"])
    def test_replaying_an_epoch_does_not_duplicate_docs(
        self, spark, tmp_path, scheme
    ):
        """foreachBatch replays the last epoch after a crash between the
        shard write and the checkpoint commit (at-least-once).  The
        staged-overwrite + deterministic copy-promote write must make
        that replay a no-op for shard CONTENTS: same docs, same file
        names, no duplicates — on a local root AND over the fake object
        store (the commit is store COPY + DELETE, never a rename)."""
        import uuid as _uuid

        root = (
            str(tmp_path / "shards")
            if scheme == "plain"
            else f"mem://cur-{_uuid.uuid4().hex[:8]}/shards"
        )
        cur = StreamingCurator(spark, root, n_shards=2)
        shards = cur.shards_path  # Spark-visible data root (both schemes)
        batch = spark.createDataFrame(
            [(i, _good(i), "en", T0 + i) for i in range(6)],
            "doc_id long, text string, lang string, ms long",
        )
        cur._write_batch(batch, epoch=0)
        first = sorted(
            os.path.relpath(p, shards)
            for p in glob.glob(f"{shards}/shard=*/*.parquet")
        )
        ids_first = sorted(
            r["doc_id"] for r in spark.read.parquet(shards).collect()
        )
        cur._write_batch(batch, epoch=0)  # the replay
        second = sorted(
            os.path.relpath(p, shards)
            for p in glob.glob(f"{shards}/shard=*/*.parquet")
        )
        ids_second = sorted(
            r["doc_id"] for r in spark.read.parquet(shards).collect()
        )
        assert first == second              # same deterministic file names
        assert ids_first == ids_second == list(range(6))
        # a NEW epoch appends alongside, old epoch files untouched
        batch2 = spark.createDataFrame(
            [(i, _good(i), "en", T0 + i) for i in range(6, 9)],
            "doc_id long, text string, lang string, ms long",
        )
        cur._write_batch(batch2, epoch=1)
        ids = sorted(r["doc_id"] for r in spark.read.parquet(shards).collect())
        assert ids == list(range(9))
        # staging epoch dirs are cleaned (the empty _staging parent may
        # remain; Spark ignores underscore-prefixed dirs)
        assert glob.glob(os.path.join(shards, "_staging", "epoch-*")) == []
