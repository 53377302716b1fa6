"""Streaming SemDeDup: embedding micro-batches probe the standing
semantic cluster index; survivors extend it (streaming/semantic.py)."""

import json
import os

from datalake_spark.streaming.semantic import SemanticStreamDeduper

T0 = 1_420_070_400_000
DIM = 8


def _vec(i, base, eps=0.0):
    # base direction plus a tiny orthogonal nudge: eps=0 twins are
    # cosine-1.0 duplicates, eps>=0.5 vectors fall well under 0.97
    v = [0.0] * DIM
    v[base % DIM] = 1.0
    v[(base + 1) % DIM] = eps
    return {"vec_id": i, "embedding": v, "ms": T0 + i}


def _write(landing, vecs, name):
    os.makedirs(landing, exist_ok=True)
    with open(os.path.join(landing, name), "w") as f:
        for v in vecs:
            f.write(json.dumps(v) + "\n")


def _ids(spark, out):
    return sorted(
        r["vec_id"] for r in spark.read.parquet(f"{out}/vecs").collect()
    )


class TestSemanticStreamDedup:
    def test_cross_batch_semantic_dup_dropped(self, spark, tmp_path):
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        dd = SemanticStreamDeduper(spark, out, k=2, threshold=0.97)
        # batch 1: four distinct directions
        _write(landing, [_vec(i, base=i, eps=0.0) for i in range(4)],
               "b1.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        assert _ids(spark, out) == [0, 1, 2, 3]
        # batch 2: vec 50 duplicates direction 2 (cosine 1.0 with vec 2,
        # caught only by the standing-index probe); vec 51 is a fresh
        # direction
        _write(landing, [_vec(50, base=2, eps=0.0),
                         _vec(51, base=5, eps=0.5)], "b2.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        assert _ids(spark, out) == [0, 1, 2, 3, 51]
        # the standing index grew to exactly the survivors
        idx = spark.read.parquet(f"{out}/_semindex/norms")
        assert sorted(r["_vid"] for r in idx.collect()) == [0, 1, 2, 3, 51]

    def test_in_batch_dup_keeps_min_id(self, spark, tmp_path):
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        dd = SemanticStreamDeduper(spark, out, k=2, threshold=0.97)
        _write(landing, [_vec(7, base=1), _vec(8, base=1),
                         _vec(9, base=4, eps=0.5)], "b1.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        assert _ids(spark, out) == [7, 9]

    def test_zero_norm_vector_does_not_poison_the_stream(self, spark,
                                                          tmp_path):
        """An all-zero embedding used to ANSI-DIVIDE_BY_ZERO the probe —
        fatal for streaming in particular, because every replay of the
        epoch re-runs the identical crashing plan (r9 advice).  With the
        sentinel guard it survives (cosine -2.0 pairs with nothing) and
        later batches keep working."""
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        dd = SemanticStreamDeduper(spark, out, k=2, threshold=0.97)
        zero = {"vec_id": 5, "embedding": [0.0] * DIM, "ms": T0 + 5}
        _write(landing, [_vec(0, base=0), _vec(1, base=1), zero], "b1.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        assert _ids(spark, out) == [0, 1, 5]
        # a later batch probing the index (which now holds the zero
        # vector's rows) must not crash either
        _write(landing, [_vec(50, base=0, eps=0.0),
                         _vec(51, base=4, eps=0.5)], "b2.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        assert _ids(spark, out) == [0, 1, 5, 51]

    def test_later_epoch_redelivery_keeps_index_unique(self, spark,
                                                       tmp_path):
        """At-least-once sources can re-deliver a SURVIVOR in a later
        epoch: it is anti-joined out of the probe's corpus side (so it
        'survives' again), but the standing index must not gain a second
        copy of its rows — duplicate _vid rows double dot sums and
        duplicate norm-join rows in every future probe of the cluster
        (r9 advice)."""
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        dd = SemanticStreamDeduper(spark, out, k=2, threshold=0.97)
        _write(landing, [_vec(i, base=i, eps=0.0) for i in range(4)],
               "b1.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        # epoch 1 re-delivers survivor 2 alongside a fresh vector
        _write(landing, [_vec(2, base=2, eps=0.0),
                         _vec(51, base=5, eps=0.5)], "b2.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        norms = spark.read.parquet(f"{out}/_semindex/norms")
        vids = sorted(r["_vid"] for r in norms.collect())
        assert vids == [0, 1, 2, 3, 51]  # 2 exactly once
        el = spark.read.parquet(f"{out}/_semindex/elements")
        per_doc = el.groupBy("_vid").count().collect()
        assert all(r["count"] == DIM for r in per_doc), per_doc
        # and a third batch with a duplicate of 2's direction still drops
        _write(landing, [_vec(70, base=2, eps=0.0)], "b3.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        assert 70 not in set(
            r["_vid"] for r in
            spark.read.parquet(f"{out}/_semindex/norms").collect()
        )

    def test_index_layout_is_cluster_partitioned(self, spark, tmp_path):
        """The standing-index design relies on file-level partition
        pruning for the touched-cluster probe: the streaming sink must
        write elements (and norms) partitionBy('cluster') under each
        epoch dir (r9 advice)."""
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        dd = SemanticStreamDeduper(spark, out, k=2, threshold=0.97)
        _write(landing, [_vec(i, base=i, eps=0.0) for i in range(4)],
               "b1.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        epoch_dir = f"{out}/_semindex/elements/epoch=0"
        subdirs = [d for d in os.listdir(epoch_dir)
                   if d.startswith("cluster=")]
        assert subdirs, os.listdir(epoch_dir)
        norm_dir = f"{out}/_semindex/norms/epoch=0"
        assert [d for d in os.listdir(norm_dir)
                if d.startswith("cluster=")]

    def test_legacy_unpartitioned_index_layout_is_preserved(
        self, spark, tmp_path
    ):
        """r10 self-review finding: a standing index written by the
        pre-cluster-partitioned code must keep working — appending
        partitioned epochs under a legacy root would mix directory
        depths and break Spark's partition discovery for the whole
        tree.  _load_index detects the layout and _append_index matches
        it."""
        import shutil

        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        dd = SemanticStreamDeduper(spark, out, k=2, threshold=0.97)
        _write(landing, [_vec(i, base=i, eps=0.0) for i in range(4)],
               "b1.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        # rewrite epoch 0 in the LEGACY layout (cluster as the second
        # data column, no cluster= dirs)
        idx = f"{out}/_semindex"
        for sub, cols in (
            ("elements", ["_vid", "cluster", "_pos", "_val"]),
            ("norms", ["_vid", "cluster", "_norm_sq"]),
        ):
            legacy = str(tmp_path / f"legacy_{sub}")
            spark.read.parquet(f"{idx}/{sub}/epoch=0").select(*cols) \
                .write.parquet(legacy)
            shutil.rmtree(f"{idx}/{sub}/epoch=0")
            shutil.move(legacy, f"{idx}/{sub}/epoch=0")
        # a later batch must append in the SAME legacy layout and the
        # whole tree must stay readable and correct
        _write(landing, [_vec(50, base=2, eps=0.0),
                         _vec(51, base=5, eps=0.5)], "b2.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        assert _ids(spark, out) == [0, 1, 2, 3, 51]
        el = spark.read.parquet(f"{idx}/elements")
        assert el.columns[1] == "cluster", el.columns  # legacy preserved
        assert not [d for d in os.listdir(f"{idx}/elements/epoch=1")
                    if d.startswith("cluster=")]
        vids = sorted(
            r["_vid"] for r in
            spark.read.parquet(f"{idx}/norms").select("_vid").collect()
        )
        assert vids == [0, 1, 2, 3, 51]

    def test_epoch_replay_recomputes_identically(self, spark, tmp_path):
        """A replayed epoch whose index append already landed must see
        the corpus as-if it never ran: re-invoking the sink with the same
        (batch, epoch) after a completed pass produces the same survivor
        set and the same per-epoch index content (the crash-after-append,
        replay-before-commit window)."""
        landing = str(tmp_path / "landing")
        out = str(tmp_path / "out")
        dd = SemanticStreamDeduper(spark, out, k=2, threshold=0.97)
        _write(landing, [_vec(i, base=i, eps=0.0) for i in range(4)],
               "b1.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        _write(landing, [_vec(50, base=2, eps=0.0),
                         _vec(51, base=5, eps=0.5)], "b2.json")
        dd.start(landing, str(tmp_path / "ck")).awaitTermination(120)
        before = _ids(spark, out)
        # simulate the replay: epoch 1's append is in the index; run the
        # identical batch through the sink again with the same epoch id
        batch = spark.createDataFrame(
            [(50, _vec(50, base=2)["embedding"], T0 + 50),
             (51, _vec(51, base=5, eps=0.5)["embedding"], T0 + 51)],
            "vec_id long, embedding array<double>, ms long",
        )
        dd._process_batch(batch, epoch=1)
        assert _ids(spark, out) == before == [0, 1, 2, 3, 51]
        idx = spark.read.parquet(f"{out}/_semindex/norms")
        assert sorted(r["_vid"] for r in idx.collect()) == [0, 1, 2, 3, 51]
