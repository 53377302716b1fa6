"""Standing IVF-PQ index lifecycle: build/append/search under the
marker-CAS commit protocol, epoch-replay idempotence, crash-orphan
invisibility, cross-epoch re-delivery uniqueness, and append-vs-append
commit races."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_spark.operators import similarity
from datalake_spark.operators.ann_index import (
    IndexAlreadyBuilt,
    IndexNotBuilt,
    IvfPqIndex,
)
from datalake_spark.queries import load
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF_DIR, "embeddings").cache()


def _topk(df):
    return {(r["q_id"], r["rk"]): (r["c_id"], r["adc"]) for r in df.collect()}


class TestIvfPqIndexLifecycle:
    def test_build_then_search_equals_one_call(self, spark, emb, tmp_path):
        """A freshly built index must serve exactly what the one-call
        operator computes on the same corpus/params — the standing form
        changes durability, never values."""
        q = emb.filter("vec_id < 3")
        c = emb.filter("vec_id >= 3")
        idx = IvfPqIndex(spark, str(tmp_path / "idx"),
                         num_centroids=8, m=16, ksub=16)
        man = idx.build(c)
        assert man["version"] == 1 and man["epochs"] == [0]
        got = _topk(idx.search(q, k=5, nprobe=3))
        want = _topk(similarity.ivfpq_topk(
            q, c, k=5, num_centroids=8, nprobe=3, m=16, ksub=16))
        assert got == want and got

    def test_search_unbuilt_raises_and_double_build_raises(
            self, spark, emb, tmp_path):
        idx = IvfPqIndex(spark, str(tmp_path / "idx2"))
        with pytest.raises(IndexNotBuilt):
            idx.search(emb.filter("vec_id < 3"))
        with pytest.raises(IndexNotBuilt):
            idx.append(emb.filter("vec_id < 3"), 1)
        idx.build(emb.filter("vec_id >= 3 and vec_id < 50"))
        with pytest.raises(IndexAlreadyBuilt):
            idx.build(emb.filter("vec_id >= 3 and vec_id < 50"))

    def test_append_encodes_against_standing_model(self, spark, emb,
                                                   tmp_path):
        """Appended vectors must be encoded with the BUILD-time
        centroids/codebooks (never retrained) — the manual composition
        with standing artifacts is the value oracle."""
        q = emb.filter("vec_id < 3")
        base = emb.filter("vec_id >= 3 and vec_id < 200")
        extra = emb.filter("vec_id >= 200")
        idx = IvfPqIndex(spark, str(tmp_path / "idx3"),
                         num_centroids=8, m=16, ksub=16)
        idx.build(base)
        man = idx.append(extra, 1)
        assert man["version"] == 2 and man["epochs"] == [0, 1]
        got = _topk(idx.search(q, k=5, nprobe=3))

        # manual composition: train on base only, encode base+extra
        cents, assign = similarity.ivf_index_build(base, 8)
        cb = similarity.pq_train(base, m=16, ksub=16)
        cells_extra = similarity.ivf_assign_cells(extra, cents)
        codes = similarity.pq_encode(
            base, cb, m=16, cells=assign.select("c_id", "cent_id")
        ).unionByName(
            similarity.pq_encode(extra, cb, m=16, cells=cells_extra)
        )
        want = _topk(similarity.ivfpq_search(
            cents, cb, codes, q, k=5, nprobe=3, m=16))
        assert got == want and got

    def test_epoch_replay_is_idempotent(self, spark, emb, tmp_path):
        """The at-least-once contract: replaying a committed epoch is a
        no-op (same manifest version), and a pre-commit crash replay
        (epoch dir written, marker missing) heals into the identical
        committed state."""
        q = emb.filter("vec_id < 3")
        base = emb.filter("vec_id >= 3 and vec_id < 200")
        extra = emb.filter("vec_id >= 200 and vec_id < 300")
        idx = IvfPqIndex(spark, str(tmp_path / "idx4"),
                         num_centroids=8, m=16, ksub=16)
        idx.build(base)

        # pre-commit crash: write the epoch dirs, then "die" before the
        # marker — search must NOT see the orphan epoch
        class _Boom(Exception):
            pass

        def _die():
            raise _Boom()

        with pytest.raises(_Boom):
            idx.append(extra, 1, _race_hook=_die)
        assert idx.manifest()["epochs"] == [0]
        orphan_blind = _topk(idx.search(q, k=5, nprobe=3))
        base_only = _topk(idx.search(q, k=5, nprobe=8))  # full probe
        assert orphan_blind  # sane
        assert all(c >= 3 and c < 200 for (c, _a) in base_only.values())

        # replay: same epoch id, commits this time
        man = idx.append(extra, 1)
        assert man["epochs"] == [0, 1]
        after = _topk(idx.search(q, k=5, nprobe=3))

        # post-commit replay: identical manifest back, values unchanged
        man2 = idx.append(extra, 1)
        assert man2["version"] == man["version"]
        assert _topk(idx.search(q, k=5, nprobe=3)) == after

    def test_cross_epoch_redelivery_keeps_index_unique(self, spark, emb,
                                                       tmp_path):
        """A vector committed in epoch 1 and re-delivered in epoch 2
        must not be indexed twice (duplicate c_id rows would double it
        in every probe of its cell)."""
        base = emb.filter("vec_id >= 3 and vec_id < 100")
        b1 = emb.filter("vec_id >= 100 and vec_id < 150")
        b2 = emb.filter("vec_id >= 100 and vec_id < 200")  # overlaps b1
        idx = IvfPqIndex(spark, str(tmp_path / "idx5"),
                         num_centroids=8, m=16, ksub=16)
        idx.build(base)
        idx.append(b1, 1)
        idx.append(b2, 2)
        man = idx.manifest()
        ids = (
            spark.read.parquet(
                idx._url(man["dir"], IvfPqIndex.IDS))
            .filter(F.col("epoch").isin(man["epochs"]))
        )
        dup = ids.groupBy("c_id").count().filter("count > 1").count()
        assert dup == 0
        assert ids.count() == base.count() + b2.count()  # b1 ⊂ b2

    def test_concurrent_append_race_serializes_on_marker(self, spark, emb,
                                                         tmp_path):
        """Two appenders racing distinct epochs: the loser's marker PUT
        conflicts, it re-resolves the winner's manifest and retries —
        both epochs end up committed (lost-update-free, the catalog
        discipline)."""
        base = emb.filter("vec_id >= 3 and vec_id < 100")
        b1 = emb.filter("vec_id >= 100 and vec_id < 150")
        b2 = emb.filter("vec_id >= 150 and vec_id < 200")
        idx = IvfPqIndex(spark, str(tmp_path / "idx6"),
                         num_centroids=8, m=16, ksub=16)
        idx.build(base)

        # deterministic interleave: appender A commits epoch 2 from
        # inside appender B's race hook, so B's first marker PUT loses
        done: list = []

        def _sneak():
            if not done:
                done.append(1)
                idx.append(b1, 2)

        man = idx.append(b2, 3, _race_hook=_sneak)
        assert sorted(man["epochs"]) == [0, 2, 3]
        assert man["version"] == 3

    def test_streaming_maintenance_appends_epochs(self, spark, emb,
                                                  tmp_path):
        """The foreachBatch maintenance path: landed embedding events
        extend the index as epoch streaming_epoch+1; results match a
        batch append of the same vectors."""
        import json
        import os

        q = emb.filter("vec_id < 3")
        base = emb.filter("vec_id >= 3 and vec_id < 200")
        extra = emb.filter("vec_id >= 200 and vec_id < 260")
        idx = IvfPqIndex(spark, str(tmp_path / "idx7"),
                         num_centroids=8, m=16, ksub=16)
        idx.build(base)

        landing = tmp_path / "landing"
        landing.mkdir()
        rows = [
            {"vec_id": r["vec_id"], "embedding": list(r["embedding"]),
             "ms": 1}
            for r in extra.collect()
        ]
        with open(landing / "batch0.json", "w") as f:
            for row in rows:
                f.write(json.dumps(row) + os.linesep)
        qry = idx.start_stream(str(landing), str(tmp_path / "ckpt"))
        qry.awaitTermination(120)
        man = idx.manifest()
        assert man["epochs"] == [0, 1]
        got = _topk(idx.search(q, k=5, nprobe=3))

        idx2 = IvfPqIndex(spark, str(tmp_path / "idx8"),
                          num_centroids=8, m=16, ksub=16)
        idx2.build(base)
        idx2.append(extra, 1)
        assert got == _topk(idx2.search(q, k=5, nprobe=3)) and got
