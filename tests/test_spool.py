"""Spool queue (O20) + crtime (O24) tests, modeled on the reference's
client/test/test_queue.py and client/test/test_crtime.py: enqueue validates
in the user's face, the uploader drains-then-watches, success deletes the
bundle, failure leaves it queued; crtime keeps the injectable-facility
contract."""

from __future__ import annotations

import gzip
import io
import json
import os
import tarfile
import time

import pytest

from datalake_spark.archive import Archive
from datalake_spark.catalog import Catalog
from datalake_spark.conf import InsufficientConfiguration
from datalake_spark.crtime import CreationTimeError, get_crtime
from datalake_spark.metadata import InvalidDatalakeMetadata
from datalake_spark.spool import (
    Enqueuer,
    InvalidDatalakeBundle,
    Uploader,
    read_bundle,
    write_bundle,
)

META = {
    "what": "nginx",
    "where": "web01",
    "start": "2015-03-20T00:00:00Z",
    "end": "2015-03-20T01:00:00Z",
}


@pytest.fixture()
def queue_dir(tmp_path):
    d = tmp_path / "queue"
    d.mkdir()
    return str(d)


@pytest.fixture()
def payload(tmp_path):
    p = tmp_path / "nginx.log"
    p.write_bytes(b"GET / 200\nGET /health 200\n")
    return str(p)


class TestBundle:
    def test_roundtrip(self, tmp_path):
        meta = {"id": "abc"}
        path = str(tmp_path / "b.tar")
        write_bundle(path, meta, b"hello")
        with tarfile.open(path) as t:  # wire format: exactly these members
            assert sorted(m.name for m in t.getmembers()) == [
                "content", "datalake-metadata.json", "version"]

    def test_rejects_non_tar(self, tmp_path):
        p = tmp_path / "x.tar"
        p.write_bytes(b"not a tar at all")
        with pytest.raises(InvalidDatalakeBundle):
            read_bundle(str(p))

    def test_rejects_bad_version(self, tmp_path):
        path = str(tmp_path / "b.tar")
        with tarfile.open(path, "w") as tar:
            for name, data in (("version", b"9"), ("content", b""),
                               ("datalake-metadata.json", b"{}")):
                info = tarfile.TarInfo(name)
                info.size = len(data)
                tar.addfile(info, io.BytesIO(data))
        with pytest.raises(InvalidDatalakeBundle, match="version"):
            read_bundle(path)

    def test_rejects_missing_member(self, tmp_path):
        path = str(tmp_path / "b.tar")
        with tarfile.open(path, "w") as tar:
            info = tarfile.TarInfo("version")
            info.size = 1
            tar.addfile(info, io.BytesIO(b"0"))
        with pytest.raises(InvalidDatalakeBundle, match="content"):
            read_bundle(path)


class TestEnqueuer:
    def test_requires_queue_dir(self, monkeypatch):
        monkeypatch.delenv("DATALAKE_QUEUE_DIR", raising=False)
        with pytest.raises(InsufficientConfiguration):
            Enqueuer()

    def test_env_queue_dir(self, monkeypatch, queue_dir):
        monkeypatch.setenv("DATALAKE_QUEUE_DIR", queue_dir)
        assert Enqueuer().queue_dir == queue_dir

    def test_enqueue_writes_valid_bundle(self, queue_dir, payload):
        meta = Enqueuer(queue_dir).enqueue(payload, **META)
        bundle = os.path.join(queue_dir, meta["id"] + ".tar")
        got, content = read_bundle(bundle)
        assert got == meta
        assert content == open(payload, "rb").read()
        assert got["path"] == payload  # abspath inferred
        assert len(got["hash"]) == 32  # blake2b-16 inferred

    def test_enqueue_compress(self, queue_dir, payload):
        meta = Enqueuer(queue_dir).enqueue(payload, compress=True, **META)
        _, content = read_bundle(os.path.join(queue_dir, meta["id"] + ".tar"))
        assert gzip.decompress(content) == open(payload, "rb").read()

    def test_enqueue_translation(self, queue_dir, tmp_path):
        p = tmp_path / "job88.log"
        p.write_bytes(b"x")
        meta = Enqueuer(queue_dir).enqueue(
            str(p), what="job", where="w1", start="2015-03-20",
            work_id=r".*job(?P<id>[0-9]+)\.log$~job{id}")
        assert meta["work_id"] == "job88"

    def test_enqueue_fails_in_users_face(self, queue_dir, payload):
        with pytest.raises(InvalidDatalakeMetadata):
            Enqueuer(queue_dir).enqueue(payload, what="BAD SLUG!",
                                        where="w", start="2015-03-20")
        assert os.listdir(queue_dir) == []  # nothing spooled


class TestUploader:
    def _uploader(self, spark, queue_dir, tmp_path, **kw):
        store = tmp_path / "store"
        store.mkdir(exist_ok=True)
        archive = Archive(str(store))
        cat = Catalog(spark, str(tmp_path / "catalog"))
        return Uploader(archive, queue_dir, catalog=cat, spark=spark, **kw), \
            archive, cat

    def test_drain_uploads_and_deletes(self, spark, queue_dir, tmp_path,
                                       payload):
        enq = Enqueuer(queue_dir)
        metas = [enq.enqueue(payload, what="nginx", where=f"w{i}",
                             start="2015-03-20") for i in range(3)]
        up, archive, cat = self._uploader(spark, queue_dir, tmp_path)
        assert up.listen(timeout=0) == 3
        assert os.listdir(queue_dir) == []  # deleted on success
        # content round-trips through the archive...
        for m in metas:
            assert archive.fetch(archive.url_from_id(m["id"])).read() == \
                open(payload, "rb").read()
        # ...and the metadata rows landed in the catalog
        assert cat.files().count() == 3

    def test_callback_fires(self, spark, queue_dir, tmp_path, payload):
        Enqueuer(queue_dir).enqueue(payload, what="nginx", where="w1",
                                    start="2015-03-20")
        seen = []
        up, _, _ = self._uploader(spark, queue_dir, tmp_path,
                                  callback=seen.append)
        up.listen(timeout=0)
        assert len(seen) == 1 and seen[0].endswith(".tar")

    def test_bad_bundle_stays_queued(self, spark, queue_dir, tmp_path,
                                     payload):
        (tmp_path / "queue" / "junk.tar").write_bytes(b"garbage")
        Enqueuer(queue_dir).enqueue(payload, what="nginx", where="w1",
                                    start="2015-03-20")
        up, _, cat = self._uploader(spark, queue_dir, tmp_path)
        assert up.listen(timeout=0) == 1
        assert os.listdir(queue_dir) == ["junk.tar"]  # poison file remains
        assert cat.files().count() == 1
        # a second pass does not re-attempt the unchanged poison file
        assert up.listen(timeout=0) == 0

    def test_dotfiles_skipped(self, spark, queue_dir, tmp_path):
        (tmp_path / "queue" / ".partial.tar.tmp").write_bytes(b"torn")
        up, _, _ = self._uploader(spark, queue_dir, tmp_path)
        assert up.listen(timeout=0) == 0
        assert os.listdir(queue_dir) == [".partial.tar.tmp"]

    def test_watch_picks_up_late_arrival(self, spark, queue_dir, tmp_path,
                                         payload):
        """A bundle enqueued after listen() starts is uploaded within the
        timeout window (the inotify-equivalent contract)."""
        import threading

        up, _, cat = self._uploader(spark, queue_dir, tmp_path)

        def _late():
            time.sleep(0.2)
            Enqueuer(queue_dir).enqueue(payload, what="nginx", where="w9",
                                        start="2015-03-20")

        t = threading.Thread(target=_late)
        t.start()
        n = up.listen(timeout=3.0)
        t.join()
        assert n == 1
        assert os.listdir(queue_dir) == []


class TestCliVerbs:
    def test_enqueue_then_uploader(self, spark, tmp_path, payload):
        from datalake_spark.cli import run

        qdir = tmp_path / "q"
        qdir.mkdir()
        store = tmp_path / "store"
        store.mkdir()
        out = io.StringIO()
        rc = run(["enqueue", "--what", "nginx", "--where", "w1",
                  "--start", "2015-03-20", "--queue-dir", str(qdir),
                  payload], spark=spark, out=out)
        assert rc == 0 and "Enqueued" in out.getvalue()
        assert len(os.listdir(qdir)) == 1

        out = io.StringIO()
        rc = run(["--catalog", str(tmp_path / "cat"), "uploader",
                  "--timeout", "0", "--queue-dir", str(qdir),
                  "--storage-url", str(store)], spark=spark, out=out)
        assert rc == 0 and "Uploaded 1" in out.getvalue()
        assert os.listdir(qdir) == []

    def test_enqueue_crtime_start(self, tmp_path, payload, monkeypatch):
        """--start crtime resolves via the crtime facility; with neither
        st_birthtime nor statx btime available the error surfaces (the
        reference's CreationTimeError contract)."""
        from datalake_spark.cli import run

        qdir = tmp_path / "q"
        qdir.mkdir()
        try:
            rc = run(["enqueue", "--what", "nginx", "--where", "w1",
                      "--start", "crtime", "--queue-dir", str(qdir),
                      payload], spark=None, out=io.StringIO())
        except CreationTimeError:
            return  # filesystem cannot answer; contract honored
        assert rc == 0
        meta, _ = read_bundle(
            os.path.join(str(qdir), os.listdir(qdir)[0]))
        # birth time of a file created moments ago is ~now
        assert abs(meta["start"] - int(time.time() * 1000)) < 600_000


    def test_push_crtime_without_path_is_clean_error(self, tmp_path):
        """push --start crtime with no --path must die with a clear message,
        not a TypeError from os.path.exists(None)."""
        from datalake_spark.cli import run

        with pytest.raises(SystemExit, match="crtime requires"):
            run(["--catalog", str(tmp_path / "cat"), "push",
                 "--what", "nginx", "--where", "w1", "--start", "crtime"],
                spark=None, out=io.StringIO())


class TestCrtime:
    def test_injectable_facility(self):
        assert get_crtime("/whatever", crtime_facility=lambda p: 1234.5) \
            == 1234.5

    def test_missing_file_raises(self):
        with pytest.raises((IOError, CreationTimeError)):
            get_crtime("/no/such/file/anywhere")

    def test_real_facility_contract(self, tmp_path):
        """Default facility either answers with a plausible epoch-seconds
        birth time or raises CreationTimeError — never garbage."""
        p = tmp_path / "f"
        p.write_bytes(b"x")
        try:
            t = get_crtime(str(p))
        except CreationTimeError:
            return
        assert isinstance(t, float)
        assert abs(t - time.time()) < 600


class TestThreadedUploader:
    def test_workers_validation(self, queue_dir, tmp_path):
        store = tmp_path / "store"
        store.mkdir()
        up = Uploader(Archive(str(store)), queue_dir)
        with pytest.raises(InsufficientConfiguration):
            up.listen(timeout=0, workers=0)

    def test_threaded_drain(self, queue_dir, tmp_path, payload):
        enq = Enqueuer(queue_dir)
        metas = [enq.enqueue(payload, what="nginx", where=f"w{i}",
                             start="2015-03-20") for i in range(12)]
        store = tmp_path / "store"
        store.mkdir()
        archive = Archive(str(store))
        up = Uploader(archive, queue_dir)
        assert up.listen(timeout=0.5, workers=4) == 12
        assert os.listdir(queue_dir) == []
        for m in metas:
            assert archive.fetch(archive.url_from_id(m["id"])).read() == \
                open(payload, "rb").read()

    def test_threaded_poison_bundle_survives(self, queue_dir, tmp_path,
                                             payload):
        (tmp_path / "queue" / "junk.tar").write_bytes(b"garbage")
        Enqueuer(queue_dir).enqueue(payload, what="nginx", where="w1",
                                    start="2015-03-20")
        store = tmp_path / "store"
        store.mkdir()
        up = Uploader(Archive(str(store)), queue_dir)
        assert up.listen(timeout=0.5, workers=3) == 1
        assert os.listdir(queue_dir) == ["junk.tar"]

    def test_store_error_is_retryable(self, queue_dir, tmp_path, payload):
        """Upload (store) failures are RETRYABLE: the bundle stays queued
        and listen completes normally — it is reattempted when the bundle's
        mtime changes (deliberate divergence from the reference's
        fail-the-process stance for the store path; queue.py:164-167)."""
        Enqueuer(queue_dir).enqueue(payload, what="nginx", where="w1",
                                    start="2015-03-20")

        class Exploding:
            def store(self, *a, **k):
                raise RuntimeError("store blew up")

        up = Uploader(Exploding(), queue_dir)
        assert up.listen(timeout=0.2, workers=2) == 0
        assert len(os.listdir(queue_dir)) == 1

    def test_worker_fault_fails_listen(self, queue_dir, tmp_path, payload):
        """A fault PAST the upload (here: the post-upload callback) is an
        unexpected worker fault and fails the whole listen call, mirroring
        the reference's fail-the-process stance (queue.py:164-167)."""
        Enqueuer(queue_dir).enqueue(payload, what="nginx", where="w1",
                                    start="2015-03-20")

        class OkStore:
            def store(self, *a, **k):
                return "file:///dev/null"

        def bad_callback(path):
            raise RuntimeError("callback blew up")

        up = Uploader(OkStore(), queue_dir, callback=bad_callback)
        with pytest.raises(RuntimeError, match="callback blew up"):
            up.listen(timeout=2.0, workers=2)


class TestPushFile:
    def test_one_call_push(self, spark, tmp_path, payload):
        """push_file = the reference's prepare_metadata_and_push: content
        stored + fetchable, metadata row queryable, blake2b hash inferred."""
        import hashlib

        from datalake_spark.ingest import push_file

        store = tmp_path / "store"
        store.mkdir()
        archive = Archive(str(store))
        cat = Catalog(spark, str(tmp_path / "catalog"))
        url = push_file(spark, cat, archive, payload, what="nginx",
                        where="w1", start="2015-03-20")
        assert archive.fetch(url).read() == open(payload, "rb").read()
        [row] = cat.files().collect()
        assert row.url == url and row.what == "nginx"
        assert row.hash == hashlib.blake2b(
            open(payload, "rb").read(), digest_size=16).hexdigest()

    def test_compress_on_push(self, spark, tmp_path, payload):
        from datalake_spark.ingest import push_file

        store = tmp_path / "store"
        store.mkdir()
        archive = Archive(str(store))
        cat = Catalog(spark, str(tmp_path / "catalog"))
        url = push_file(spark, cat, archive, payload, compress=True,
                        what="nginx", where="w1", start="2015-03-20")
        # gzip round-trips transparently through ArchiveFile's sniffing
        f = archive.fetch(url)
        assert gzip.decompress(f.read()) == open(payload, "rb").read()
