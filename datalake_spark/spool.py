"""Local spool queue + uploader (O20) — enqueue now, upload later.

Reference: client/datalake/queue.py — the queue is a directory; ``Enqueuer``
validates metadata *at enqueue time* ("fails in the user's face instead of
silently behind the user's back", queue.py:20-26) and writes the file+metadata
as a version-0 tar bundle (dlfile.py:238-310: members ``version``,
``content``, ``datalake-metadata.json``); ``Uploader`` watches the directory,
pushes each bundle to the archive, and deletes it on success — a failed
bundle stays queued (queue.py:24-26).

Deltas from the reference, deliberate:

* the watcher is a stdlib **polling scanner** instead of inotify
  (queue.py:46-49 gates the whole feature on ``inotify_simple``; polling
  needs no optional dependency and behaves identically for the
  drain-then-watch contract).  A bundle that failed once is retried only
  when its mtime changes — matching inotify's "retry on next event, don't
  busy-loop a poison file" behavior.
* bundles are written atomically (dot-prefixed temp + ``os.replace``) so a
  half-written tar is never visible to the uploader; the uploader also skips
  dot-files exactly like the reference (queue.py:130-131).
* on upload the content goes through :class:`datalake_spark.archive.Archive`
  and the metadata row lands in the catalog via
  :func:`datalake_spark.ingest.push_metadata` when a catalog is attached —
  the engine's split of the reference's single ``archive.push``.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import time
from typing import Any, Callable

from datalake_spark.conf import InsufficientConfiguration
from datalake_spark.metadata import InvalidDatalakeMetadata, Metadata

BUNDLE_VERSION = "0"


class InvalidDatalakeBundle(Exception):
    pass


# -- version-0 bundle wire format (dlfile.py:238-310) -----------------------

def write_bundle(path: str, metadata: dict, content: bytes) -> str:
    """Write a version-0 bundle atomically: tar members ``version``,
    ``content``, ``datalake-metadata.json``; dot-prefixed temp then rename,
    so a watcher never sees a torn bundle."""
    d, base = os.path.split(os.path.abspath(path))
    tmp = os.path.join(d, "." + base + ".tmp")

    def _member(name: str, data: bytes) -> tuple[tarfile.TarInfo, io.BytesIO]:
        info = tarfile.TarInfo(name)
        info.size = len(data)
        info.mtime = 0
        return info, io.BytesIO(data)

    with tarfile.open(tmp, "w") as tar:
        for name, data in (
            ("version", BUNDLE_VERSION.encode()),
            ("content", content),
            ("datalake-metadata.json", json.dumps(dict(metadata)).encode()),
        ):
            tar.addfile(*_member(name, data))
    os.replace(tmp, path)
    return path


def read_bundle(path: str) -> tuple[Metadata, bytes]:
    """Read + validate a bundle; raises :class:`InvalidDatalakeBundle` on a
    non-tar, wrong version, missing member, bad json, or invalid metadata
    (reference from_bundle, dlfile.py:246-301)."""

    def _get(tar: tarfile.TarFile, name: str) -> bytes:
        try:
            fd = tar.extractfile(name)
        except KeyError:
            fd = None
        if fd is None:
            raise InvalidDatalakeBundle(f"{path} has no {name!r} member")
        return fd.read()

    try:
        tar = tarfile.open(path, "r:")
    except (tarfile.TarError, OSError) as e:
        raise InvalidDatalakeBundle(f"{path} is not a tar bundle: {e}")
    with tar:
        version = _get(tar, "version").decode("utf-8", errors="replace")
        if version != BUNDLE_VERSION:
            raise InvalidDatalakeBundle(
                f"{path} has unsupported bundle version {version!r}"
            )
        content = _get(tar, "content")
        try:
            fields = json.loads(_get(tar, "datalake-metadata.json"))
        except ValueError as e:
            raise InvalidDatalakeBundle(f"{path}: bad metadata json: {e}")
        try:
            return Metadata(**fields), content
        except InvalidDatalakeMetadata as e:
            raise InvalidDatalakeBundle(f"{path}: invalid metadata: {e}")


class _QueueBase:
    """Shared queue-dir resolution (queue.py:65-75): argument, else
    ``DATALAKE_QUEUE_DIR``, else InsufficientConfiguration."""

    def __init__(self, queue_dir: str | None = None):
        queue_dir = queue_dir or os.environ.get("DATALAKE_QUEUE_DIR")
        if queue_dir is None:
            raise InsufficientConfiguration("Please set DATALAKE_QUEUE_DIR")
        self.queue_dir = os.path.abspath(queue_dir)


class Enqueuer(_QueueBase):
    def enqueue(self, filename: str, compress: bool = False,
                **metadata_fields: Any) -> Metadata:
        """Validate metadata now and spool ``filename`` as ``{id}.tar``
        (queue.py:80-104).  Inference is the shared push-path inference
        (ingest.infer_file_metadata): abspath ``path``, blake2b-16 content
        hash, env-default ``where``, inline ``<regex>~<fmt>`` translations
        (dlfile.py:197-219).  Raises InvalidDatalakeMetadata here, in the
        user's face.  Returns the validated Metadata."""
        from datalake_spark.ingest import infer_file_metadata

        meta, content = infer_file_metadata(filename, compress=compress,
                                            **metadata_fields)
        write_bundle(
            os.path.join(self.queue_dir, meta["id"] + ".tar"), meta, content
        )
        return meta


class Uploader(_QueueBase):
    """Drain-then-watch uploader (queue.py:107-236).

    ``archive`` stores content bytes; when ``catalog`` is given the
    validated metadata row is appended there too (needs ``spark``).  The
    ``callback`` fires with the bundle path after each successful upload.
    """

    def __init__(self, archive, queue_dir: str | None = None,
                 catalog=None, spark=None,
                 callback: Callable[[str], None] | None = None):
        super().__init__(queue_dir)
        self._archive = archive
        self._catalog = catalog
        self._spark = spark
        self._callback = callback
        # name -> mtime at last *failed* attempt; retried only on change
        self._failed: dict[str, float] = {}

    def _push(self, path: str) -> bool:
        name = os.path.basename(path)
        if name.startswith("."):
            return False
        try:
            mtime = os.stat(path).st_mtime
        except OSError:
            return False  # raced with another consumer
        if self._failed.get(name) == mtime:
            return False
        try:
            meta, content = read_bundle(path)
        except InvalidDatalakeBundle:
            # reference behavior: log+skip, bundle stays queued
            # (queue.py:137-143); here: remember mtime so polling does not
            # busy-loop the poison file
            self._failed[name] = mtime
            return False
        # Upload failures (store/metadata append) are RETRYABLE: the bundle
        # stays queued and is reattempted when its mtime changes.  Faults
        # past this point (unlink, callback) are unexpected worker faults
        # and propagate — in threaded listen they abort the whole call,
        # mirroring the reference's fail-the-process stance.
        try:
            url = self._archive.store(meta, content)
            if self._catalog is not None:
                from datalake_spark.ingest import push_metadata

                push_metadata(
                    self._spark, self._catalog, [dict(meta)],
                    urls={meta["id"]: url},
                )
        except Exception:
            self._failed[name] = mtime
            return False
        os.unlink(path)
        self._failed.pop(name, None)
        if self._callback is not None:
            self._callback(path)
        return True

    def listen(self, timeout: float | None = None, workers: int = 1,
               poll_interval: float = 0.05) -> int:
        """Upload everything already queued, then watch until ``timeout``
        seconds elapse (None = forever, reference INFINITY, queue.py:207).
        ``workers > 1`` drains through a thread pool (queue.py:151-205);
        a worker's unexpected failure fails the listen call, mirroring the
        reference's fail-the-process stance.  Returns the number of
        bundles uploaded."""
        if workers <= 0:
            raise InsufficientConfiguration(
                "number of upload workers cannot be zero or negative")
        if workers > 1:
            return self._listen_threaded(timeout, workers, poll_interval)
        uploaded = 0
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            # a full scan always drains to completion (existing files are
            # pushed before the watch phase begins, queue.py:195-199)
            for entry in sorted(os.listdir(self.queue_dir)):
                if self._push(os.path.join(self.queue_dir, entry)):
                    uploaded += 1
            if deadline is not None and time.monotonic() >= deadline:
                return uploaded
            time.sleep(
                poll_interval
                if deadline is None
                else min(poll_interval,
                         max(0.0, deadline - time.monotonic()))
            )

    def _listen_threaded(self, timeout: float | None, workers: int,
                         poll_interval: float) -> int:
        import queue as _q
        import threading

        work: _q.Queue[str] = _q.Queue()
        in_flight: set[str] = set()
        lock = threading.Lock()
        done = threading.Event()
        uploaded = [0]
        errors: list[BaseException] = []

        def _worker() -> None:
            while not done.is_set():
                try:
                    name = work.get(timeout=0.05)
                except _q.Empty:
                    continue
                try:
                    if self._push(os.path.join(self.queue_dir, name)):
                        with lock:
                            uploaded[0] += 1
                except BaseException as e:  # fail listen, reference-style
                    errors.append(e)
                    done.set()
                finally:
                    with lock:
                        in_flight.discard(name)
                    work.task_done()

        threads = [threading.Thread(target=_worker, daemon=True)
                   for _ in range(workers)]
        for t in threads:
            t.start()
        deadline = None if timeout is None else time.monotonic() + timeout
        try:
            while not done.is_set():
                for entry in sorted(os.listdir(self.queue_dir)):
                    with lock:
                        if entry in in_flight:
                            continue
                        in_flight.add(entry)
                    work.put(entry)
                if deadline is not None and time.monotonic() >= deadline:
                    # drain submitted work before returning (tasks are
                    # short); a worker error aborts the drain
                    while not done.is_set() and (not work.empty()
                                                 or in_flight):
                        time.sleep(0.01)
                    break
                time.sleep(
                    poll_interval
                    if deadline is None
                    else min(poll_interval,
                             max(0.0, deadline - time.monotonic()))
                )
        finally:
            done.set()
            for t in threads:
                t.join(timeout=5.0)
        if errors:
            raise errors[0]
        return uploaded[0]
