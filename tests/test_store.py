"""Store-layer tests: the five verbs on both implementations, plus the
catalog round-trip parameterized over local vs the fake object store —
the proof that the commit protocol never reaches around the store to the
local filesystem (MemStore keeps every control-plane object in memory,
so any ``open()`` bypass fails loudly)."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from datalake_spark.catalog import Catalog
from datalake_spark.metadata import DAY_MS
from datalake_spark.store import LocalStore, MemStore, mem_bucket, open_store
from tests.test_query_engine import T0, make_files_df


@pytest.fixture(params=["local", "mem"])
def store(request, tmp_path):
    if request.param == "local":
        return LocalStore(str(tmp_path / "s"))
    return MemStore(mem_bucket(f"t-{uuid.uuid4().hex[:8]}"), "pre/fix")


class TestStoreVerbs:
    def test_get_put_roundtrip_and_missing(self, store):
        assert store.get("a/b") is None
        store.put("a/b", b"v1")
        assert store.get("a/b") == b"v1"
        store.put("a/b", b"v2")  # last writer wins, whole object
        assert store.get("a/b") == b"v2"

    def test_put_if_absent(self, store):
        assert store.put_if_absent("k", b"first") is True
        assert store.put_if_absent("k", b"second") is False
        assert store.get("k") == b"first"

    def test_delete_idempotent(self, store):
        store.put("d", b"x")
        store.delete("d")
        assert store.get("d") is None
        store.delete("d")  # second delete is a no-op, not an error

    def test_list_is_prefix_boundary_not_string_prefix(self, store):
        store.put("tab/one", b"1")
        store.put("tab/sub/two", b"2")
        store.put("table2/three", b"3")
        assert store.list("tab") == ["tab/one", "tab/sub/two"]
        assert store.list("") == sorted(
            ["tab/one", "tab/sub/two", "table2/three"]
        )
        assert store.list("nope") == []

    def test_copy(self, store):
        store.put("src", b"payload")
        store.copy("src", "deep/dst")
        assert store.get("deep/dst") == b"payload"
        assert store.get("src") == b"payload"

    def test_open_write_atomic_publish_and_abort(self, store):
        w = store.open_write("w/obj")
        w.write(b"part one ")
        assert store.get("w/obj") is None  # nothing visible mid-stream
        w.write(b"part two")
        w.close()
        w.close()  # idempotent
        assert store.get("w/obj") == b"part one part two"
        w2 = store.open_write("w/never")
        w2.write(b"x")
        w2.abort()
        assert store.get("w/never") is None
        with pytest.raises(RuntimeError):
            with store.open_write("w/err") as w3:
                w3.write(b"y")
                raise RuntimeError("mid-stream failure")
        assert store.get("w/err") is None
        assert store.list("w") == ["w/obj"]  # no temp leftovers either

    def test_spark_url_is_writable_data_plane(self, store):
        # Spark executors write through spark_url; the store must then see
        # those objects via list/get/copy/delete (the two-plane contract)
        p = store.spark_url("data/part-0.parquet")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as fh:
            fh.write(b"bytes")
        assert "data/part-0.parquet" in store.list("data")
        assert store.get("data/part-0.parquet") == b"bytes"
        store.copy("data/part-0.parquet", "data2/part-0.parquet")
        assert store.get("data2/part-0.parquet") == b"bytes"
        store.delete("data/part-0.parquet")
        assert store.list("data") == []


class TestMemStoreIsolation:
    def test_control_plane_objects_are_not_files(self):
        """Driver PUTs must not be reachable via open() — this is what
        makes the fake a bypass detector for the commit protocol."""
        s = MemStore(mem_bucket(f"iso-{uuid.uuid4().hex[:8]}"))
        s.put("files/_CURRENT", b"{}")
        assert not os.path.exists(s.spark_url("files/_CURRENT"))
        assert s.get("files/_CURRENT") == b"{}"

    def test_bucket_shared_across_instances(self):
        name = f"shared-{uuid.uuid4().hex[:8]}"
        a = MemStore(mem_bucket(name))
        b = MemStore(mem_bucket(name))
        a.put("k", b"v")
        assert b.get("k") == b"v"  # concurrent writers see each other


class TestOpenStore:
    def test_plain_and_file_url(self, tmp_path):
        for root in [str(tmp_path / "a"), "file://" + str(tmp_path / "a")]:
            s = open_store(root)
            assert isinstance(s, LocalStore)
            assert s.root == str(tmp_path / "a")

    def test_mem_url(self):
        s = open_store("mem://bkt/some/prefix")
        assert isinstance(s, MemStore)
        assert s.base == "some/prefix"

    def test_unregistered_scheme_raises_with_remedy(self):
        with pytest.raises(ValueError, match="store-specific IO"):
            open_store("gs://bucket/prefix")

    def test_s3_scheme_resolves_to_s3store(self):
        pytest.importorskip("boto3")
        from datalake_spark.s3store import S3Store

        s = open_store("s3://some-bucket/lake/cat")
        assert isinstance(s, S3Store)
        assert s.bucket == "some-bucket" and s.base == "lake/cat"
        assert s.spark_url("files/v1/p.parquet") == \
            "s3a://some-bucket/lake/cat/files/v1/p.parquet"


class TestCatalogOverFakeStore:
    """The full catalog lifecycle — append → queries → DML → compact →
    fsck — over the fake object store, proving the commit protocol is
    expressed entirely in store verbs.  The same sequence runs against a
    local root in TestUrlSchemeRoots (test_catalog_commits.py); this
    parameterization is the store-portability half."""

    @pytest.mark.parametrize("scheme", ["plain", "mem"])
    def test_append_query_update_delete_compact_round_trip(
        self, spark, tmp_path, scheme
    ):
        from datalake_spark.query import QueryEngine

        root = (
            str(tmp_path / "cat")
            if scheme == "plain"
            else f"mem://rt-{uuid.uuid4().hex[:8]}/cat"
        )
        cat = Catalog(spark, root)
        rows = [
            {"id": f"u{i}", "what": "nginx", "where": f"h{i % 2}",
             "start": T0 + i * DAY_MS, "end": None,
             "work_id": f"job{i % 3}"}
            for i in range(8)
        ]
        cat.append(make_files_df(spark, rows))
        cat.build_work_id_index(num_buckets=2)
        cat.refresh_latest()
        eng = QueryEngine(cat.files(), work_id_index=cat.work_id_index())
        got = {
            r["id"]
            for r in eng.by_time("nginx", T0, T0 + 3 * DAY_MS).collect()
        }
        assert {"u0", "u1", "u2", "u3"} <= got
        assert [r["id"] for r in eng.by_work_id("job1", "nginx").collect()] \
            == ["u1", "u4", "u7"]
        cat.update_where("id = 'u2'", {"work_id": "'jobZ'"})
        eng = QueryEngine(cat.files(), work_id_index=cat.work_id_index())
        assert [r["id"] for r in eng.by_work_id("jobZ", "nginx").collect()] \
            == ["u2"]
        cat.delete_where("id = 'u3'")
        assert {r["id"] for r in cat.files().collect()} == {
            f"u{i}" for i in range(8)
        } - {"u3"}
        # latest cascaded: the deleted file is nobody's latest
        assert "u3" not in {r["id"] for r in cat.latest_table().collect()}
        cat.compact()
        assert {r["id"] for r in cat.files().collect()} == {
            f"u{i}" for i in range(8)
        } - {"u3"}
        report = cat.fsck(deep=True)
        assert report["ok"], report["problems"]

    def test_compact_gc_deletes_old_versions_on_store(self, spark):
        root = f"mem://gc-{uuid.uuid4().hex[:8]}/cat"
        cat = Catalog(spark, root)
        cat.append(make_files_df(spark, [
            {"id": f"g{i}", "what": "nginx", "where": "h0",
             "start": T0 + i, "end": None, "work_id": None}
            for i in range(4)
        ]))
        cat.compact()
        cat.compact()
        cat.compact()
        # current + previous only: GC ran with store deletes
        vdirs = {
            k.split("/")[1]
            for k in cat.store.list("files")
            if k.split("/")[1].startswith("v")
        }
        assert len(vdirs) <= 2
        assert cat.files().count() == 4

    def test_time_travel_on_store(self, spark):
        root = f"mem://tt-{uuid.uuid4().hex[:8]}/cat"
        cat = Catalog(spark, root, keep_versions=3)
        cat.append(make_files_df(spark, [
            {"id": "a", "what": "nginx", "where": "h0",
             "start": T0, "end": None, "work_id": None}]))
        cat.compact()
        v1 = cat.table_versions()[0]["version"]
        cat.append(make_files_df(spark, [
            {"id": "b", "what": "nginx", "where": "h0",
             "start": T0 + 1, "end": None, "work_id": None}]))
        cat.compact()
        assert {r["id"] for r in cat.files_at(v1).collect()} == {"a", "b"} or \
            {r["id"] for r in cat.files_at(v1).collect()} == {"a"}
        assert {r["id"] for r in cat.files().collect()} == {"a", "b"}

    @pytest.mark.no_fsck  # deliberately corrupts the catalog
    def test_fsck_detects_manifest_pointing_at_gced_dir(self, spark):
        import json

        root = f"mem://fk-{uuid.uuid4().hex[:8]}/cat"
        cat = Catalog(spark, root)
        cat.append(make_files_df(spark, [
            {"id": "x", "what": "nginx", "where": "h0",
             "start": T0, "end": None, "work_id": "j"}]))
        cat.compact()
        m = json.loads(cat.store.get("files/_CURRENT"))
        for k in cat.store.list(f"files/{m['dir']}"):
            cat.store.delete(k)
        report = cat.fsck(deep=False)
        assert not report["ok"]
        assert any("missing dir" in p for p in report["problems"])


class TestStoreEquivalence:
    """Property: LocalStore and MemStore are observably equivalent under
    any verb sequence — same get() results, same list() keys, same
    error on copying a missing object.  This is what licenses proving
    the commit protocol on the fake and deploying it on a real store."""

    def test_random_verb_sequences_agree(self, tmp_path):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        # mixed control-plane (_c/...) and data-plane key universe
        keys = st.sampled_from(
            ["a", "d/a", "d/b", "d/sub/c", "_c/m", "_c/sub/n", "tab/v1/p"]
        )
        vals = st.binary(min_size=0, max_size=8)
        ops = st.lists(
            st.one_of(
                st.tuples(st.just("put"), keys, vals),
                st.tuples(st.just("put_if_absent"), keys, vals),
                st.tuples(st.just("delete"), keys, st.just(b"")),
                st.tuples(st.just("copy"), keys, keys),
            ),
            max_size=12,
        )
        universe = ["a", "d/a", "d/b", "d/sub/c", "_c/m", "_c/sub/n",
                    "tab/v1/p"]
        counter = {"n": 0}

        @settings(max_examples=60, deadline=None)
        @given(ops)
        def run(seq):
            counter["n"] += 1
            local = LocalStore(str(tmp_path / f"eq{counter['n']}"))
            mem = MemStore(mem_bucket(f"eq-{uuid.uuid4().hex[:10]}"))
            for op, k, arg in seq:
                outcomes = []
                for s in (local, mem):
                    try:
                        if op == "put":
                            outcomes.append(("ok", s.put(k, arg)))
                        elif op == "put_if_absent":
                            outcomes.append(("ok", s.put_if_absent(k, arg)))
                        elif op == "delete":
                            outcomes.append(("ok", s.delete(k)))
                        else:
                            outcomes.append(("ok", s.copy(k, arg)))
                    except FileNotFoundError:
                        outcomes.append(("missing", None))
                assert outcomes[0] == outcomes[1], (op, k, arg, outcomes)
            for k in universe:
                assert local.get(k) == mem.get(k), k
            assert local.list("") == mem.list("")
            for prefix in ("", "d", "_c", "tab"):
                assert local.subdirs(prefix) == mem.subdirs(prefix), prefix

        run()
