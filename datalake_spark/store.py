"""Minimal object-store abstraction behind the catalog commit protocol.

The catalog's commit protocol (catalog.py) was designed store-shaped from
the start — manifest flip = one atomic small-object PUT, GC = deletes
only, compaction sweeps = server-side copies — but its driver-side IO ran
straight against the local filesystem.  This module is the seam: five
verbs (GET / PUT / PUT-if-absent / LIST / DELETE, plus server-side COPY)
that every store offers, with two implementations:

- :class:`LocalStore` — keys are files under a local root.  PUT is
  tmp-write + ``os.replace`` of a single FILE (the local analog of an
  atomic object PUT; never a directory move).  Existing on-disk catalogs
  keep working unchanged.
- :class:`MemStore` — the in-process fake object store used to prove the
  protocol never cheats.  Driver-side PUTs land in an in-memory dict —
  any code path that bypasses the store and ``open()``s a control object
  (manifest, lock, lease) fails loudly under it.  Data objects written by
  Spark executors (parquet parts) live in a backing directory that stands
  in for the bulk store, exactly as ``s3a://`` paths would via the Hadoop
  connector; LIST/COPY/DELETE see both planes.

A real S3/GCS store implements the same verbs with its SDK (PUT is
natively atomic; PUT-if-absent is ``If-None-Match: *``) and returns
``s3a://bucket/key`` from :meth:`ObjectStore.spark_url`; nothing in the
catalog needs to change.  Reference analog: the reference is s3-native
(client/datalake/archive.py:100-109, record.py:126-149) with DynamoDB
conditional puts for coordination (ingester/datalake_ingester/
storage.py:64-137) — LocalStore/MemStore are the local and test stand-ins
for that deployment model.

Keys are ``/``-separated paths relative to the store root; stores have no
directories, only keys — "a directory exists" is always expressed as
"LIST(prefix) is non-empty" by callers.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import threading
import uuid
from urllib.parse import unquote, urlparse


def join_key(*parts: str) -> str:
    """Join key segments, dropping empties (store keys are POSIX-ish)."""
    return "/".join(p.strip("/") for p in parts if p and p.strip("/"))


class ObjectStore:
    """Store verbs the catalog commit protocol needs.  Subclasses provide
    the five primitives; ``exists_prefix``/``delete_prefix`` derive."""

    url: str  # the root URL this store was opened from (display only)

    def get(self, key: str) -> bytes | None:
        """Object bytes, or None when the key does not exist.  A key that
        exists but holds undecodable content is the CALLER's problem —
        the store never interprets payloads."""
        raise NotImplementedError

    def put(self, key: str, data: bytes) -> None:
        """Atomic whole-object PUT, last writer wins (readers never see a
        torn object — the one primitive object stores make atomic)."""
        raise NotImplementedError

    def put_if_absent(self, key: str, data: bytes) -> bool:
        """Conditional create (S3 ``If-None-Match: *``): True if this call
        created the object, False if it already existed."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """Idempotent single-object delete."""
        raise NotImplementedError

    def list(self, prefix: str) -> list[str]:
        """All keys under ``prefix`` (recursive), sorted.  ``prefix`` is
        treated as a key-path segment boundary, not a string prefix."""
        raise NotImplementedError

    def copy(self, src: str, dst: str) -> None:
        """Server-side copy of one object (compaction straggler sweeps,
        streaming shard promotion)."""
        raise NotImplementedError

    def spark_url(self, key: str) -> str:
        """The URL Spark executors read/write data objects at under
        ``key`` (local path here; ``s3a://bucket/key`` on a real store)."""
        raise NotImplementedError

    def open_read(self, key: str):
        """Binary file-like handle over an object (streaming reads).
        Default materializes via get(); LocalStore streams from disk.
        Returns None when the key does not exist."""
        import io

        data = self.get(key)
        return None if data is None else io.BytesIO(data)

    def open_write(self, key: str, chunk_size: int = 100 * 1024 * 1024):
        """Streaming whole-object writer: a file-like with
        ``write()/tell()/close()/abort()`` (and context-manager support:
        exceptions abort, clean exit closes).  The object appears
        ATOMICALLY at close() — readers never see a torn or partial
        object — and abort() leaves nothing behind.  ``chunk_size`` is
        the flush granularity where the store streams (S3 multipart
        part size, reference ``DATALAKE_CHUNK_SIZE_MB`` analog,
        client/datalake/archive.py:45-48); the default implementation
        buffers in memory and PUTs on close (fine for the MemStore fake;
        LocalStore streams to a temp file, S3Store multipart-uploads)."""
        return _BufferedWriter(self, key)

    # -- derived -------------------------------------------------------------
    def exists_prefix(self, prefix: str) -> bool:
        return bool(self.list(prefix))

    def delete_prefix(self, prefix: str) -> None:
        for key in self.list(prefix):
            self.delete(key)

    def subdirs(self, prefix: str) -> list[str]:
        """Immediate child 'directory' names under ``prefix``.  On a real
        object store directories are purely nominal (derived from keys);
        LocalStore overrides to surface empty directories too, so local
        fsck can flag leftovers a pure key listing cannot see."""
        out = set()
        plen = len(prefix) + 1 if prefix else 0
        for key in self.list(prefix):
            rel = key[plen:]
            if "/" in rel:
                out.add(rel.split("/", 1)[0])
        return sorted(out)


class _BufferedWriter:
    """Default open_write: accumulate, one atomic PUT at close()."""

    def __init__(self, store: "ObjectStore", key: str):
        import io

        self.store = store
        self.key = key
        self.buf = io.BytesIO()
        self.closed = False

    def write(self, b) -> int:
        if self.closed:
            raise ValueError("write to a closed store writer")
        return self.buf.write(b)

    def tell(self) -> int:
        return self.buf.tell()

    def close(self) -> None:
        if self.closed:
            return
        self.closed = True
        self.store.put(self.key, self.buf.getvalue())

    def abort(self) -> None:
        self.closed = True
        self.buf = None

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *a):
        if exc_type is not None:
            self.abort()
        else:
            self.close()


class _LocalStreamWriter:
    """LocalStore open_write: stream to an attempt-unique temp file,
    os.replace into place at close() — the same single-file atomic
    publish as LocalStore.put, without materializing the object."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self.final = path
        self.tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        self.f = open(self.tmp, "wb")
        self.closed = False

    def write(self, b) -> int:
        return self.f.write(b)

    def tell(self) -> int:
        return self.f.tell()

    def close(self) -> None:
        if self.closed:
            return
        self.closed = True
        try:
            self.f.close()  # flushes buffered bytes: can ENOSPC
            os.replace(self.tmp, self.final)
        except Exception:
            # a failed publish must not leak the temp — it would surface
            # as a spurious key in LocalStore.list() forever (the same
            # invariant the S3 writer holds by aborting its upload)
            try:
                os.remove(self.tmp)
            except FileNotFoundError:
                pass
            raise

    def abort(self) -> None:
        if self.closed:
            return
        self.closed = True
        self.f.close()
        try:
            os.remove(self.tmp)
        except FileNotFoundError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *a):
        if exc_type is not None:
            self.abort()
        else:
            self.close()


class LocalStore(ObjectStore):
    """Keys are files under a local root directory."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        self.url = self.root

    def _path(self, key: str) -> str:
        return os.path.join(self.root, *key.split("/")) if key else self.root

    def get(self, key: str) -> bytes | None:
        try:
            with open(self._path(key), "rb") as fh:
                return fh.read()
        except (FileNotFoundError, IsADirectoryError):
            return None

    def put(self, key: str, data: bytes) -> None:
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)  # single-FILE atomic replace == object PUT

    def put_if_absent(self, key: str, data: bytes) -> bool:
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
        return True

    def delete(self, key: str) -> None:
        path = self._path(key)
        try:
            os.remove(path)
        except FileNotFoundError:
            return
        # object stores have no directories; locally, prune the empty
        # parents a deleted object leaves behind so GC'd version dirs
        # actually disappear from listings
        parent = os.path.dirname(path)
        while parent.startswith(self.root) and parent != self.root:
            try:
                os.rmdir(parent)
            except OSError:
                break
            parent = os.path.dirname(parent)

    def list(self, prefix: str) -> list[str]:
        base = self._path(prefix)
        if os.path.isfile(base):
            return [prefix]
        out: list[str] = []
        for dirpath, _dirs, names in os.walk(base):
            rel = os.path.relpath(dirpath, self.root)
            rel = "" if rel == "." else rel.replace(os.sep, "/")
            out += [join_key(rel, n) for n in names]
        return sorted(out)

    def subdirs(self, prefix: str) -> list[str]:
        base = self._path(prefix)
        if not os.path.isdir(base):
            return []
        return sorted(
            e for e in os.listdir(base)
            if os.path.isdir(os.path.join(base, e))
        )

    def copy(self, src: str, dst: str) -> None:
        spath = self._path(src)
        # check the source BEFORE creating the destination's parents — a
        # failed copy must not leave an empty directory behind (the
        # property test caught exactly that local-vs-store divergence)
        if not os.path.isfile(spath):
            raise FileNotFoundError(src)
        dpath = self._path(dst)
        if spath == dpath:
            return  # self-copy succeeds on object stores; keep that here
        os.makedirs(os.path.dirname(dpath), exist_ok=True)
        shutil.copy2(spath, dpath)

    def open_read(self, key: str):
        try:
            return open(self._path(key), "rb")
        except (FileNotFoundError, IsADirectoryError):
            return None

    def open_write(self, key: str, chunk_size: int = 100 * 1024 * 1024):
        return _LocalStreamWriter(self._path(key))

    def spark_url(self, key: str) -> str:
        return self._path(key)


class _MemBucket:
    """Shared state of one named in-memory bucket: the control-plane
    object dict plus the backing directory standing in for the store's
    data plane (where Spark writes parquet)."""

    def __init__(self, name: str):
        self.name = name
        self.objects: dict[str, bytes] = {}
        self.lock = threading.Lock()
        # deterministic per bucket NAME (not mkdtemp): executor worker
        # processes that open the same mem:// bucket resolve the same
        # data plane, exactly as every process sees one real bucket.
        # Tests isolate by unique bucket names.
        self.backing = os.path.join(
            tempfile.gettempdir(), "datalake-memstore", name
        )
        os.makedirs(self.backing, exist_ok=True)


_MEM_BUCKETS: dict[str, _MemBucket] = {}
_MEM_LOCK = threading.Lock()


def mem_bucket(name: str) -> _MemBucket:
    """Get-or-create the process-wide bucket behind ``mem://name/...``."""
    with _MEM_LOCK:
        if name not in _MEM_BUCKETS:
            _MEM_BUCKETS[name] = _MemBucket(name)
        return _MEM_BUCKETS[name]


class MemStore(ObjectStore):
    """Fake object store, two-plane like the reference's deployment model
    (DynamoDB metadata + S3 data): CONTROL-plane PUTs — any key with a
    path segment starting with ``_`` (manifests, locks, leases) — go to
    an in-memory dict (shared per bucket name across instances, so
    concurrent writers in one process see each other; unreachable via
    ``open()``, so a commit-protocol path that bypasses the store fails
    loudly).  DATA-plane PUTs and Spark-written objects live in the
    bucket's backing directory, visible to executor worker processes.
    No renames exist; LIST merges both planes; COPY/DELETE/GET work on
    either."""

    def __init__(self, bucket: _MemBucket, base: str = ""):
        self.bucket = bucket
        self.base = base.strip("/")
        self.url = f"mem://{bucket.name}" + (f"/{self.base}" if self.base else "")

    def _abs(self, key: str) -> str:
        return join_key(self.base, key)

    def _backing_path(self, abskey: str) -> str:
        return os.path.join(self.bucket.backing, *abskey.split("/"))

    @staticmethod
    def _control_plane(abskey: str) -> bool:
        return any(seg.startswith("_") for seg in abskey.split("/"))

    def get(self, key: str) -> bytes | None:
        k = self._abs(key)
        with self.bucket.lock:
            if k in self.bucket.objects:
                return self.bucket.objects[k]
        try:
            with open(self._backing_path(k), "rb") as fh:
                return fh.read()
        except (FileNotFoundError, IsADirectoryError):
            return None

    def put(self, key: str, data: bytes) -> None:
        k = self._abs(key)
        if self._control_plane(k):
            with self.bucket.lock:
                self.bucket.objects[k] = bytes(data)
            return
        path = self._backing_path(k)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        k = self._abs(key)
        with self.bucket.lock:
            if k in self.bucket.objects or os.path.isfile(self._backing_path(k)):
                return False
            if self._control_plane(k):
                self.bucket.objects[k] = bytes(data)
                return True
        # data plane: O_EXCL create under the bucket lock was released —
        # the filesystem's atomic create is the arbiter
        path = self._backing_path(k)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "wb") as fh:
            fh.write(data)
        return True

    def delete(self, key: str) -> None:
        k = self._abs(key)
        with self.bucket.lock:
            self.bucket.objects.pop(k, None)
        path = self._backing_path(k)
        try:
            os.remove(path)
        except FileNotFoundError:
            return
        # an object store has no empty directories: prune what the
        # backing-dir representation leaves behind
        parent = os.path.dirname(path)
        while (parent.startswith(self.bucket.backing)
               and parent != self.bucket.backing):
            try:
                os.rmdir(parent)
            except OSError:
                break
            parent = os.path.dirname(parent)

    def list(self, prefix: str) -> list[str]:
        p = self._abs(prefix)
        boundary = f"{p}/" if p else ""
        with self.bucket.lock:
            keys = {
                k for k in self.bucket.objects
                if not boundary or k == p or k.startswith(boundary)
            }
        base = self._backing_path(p) if p else self.bucket.backing
        if os.path.isfile(base):
            keys.add(p)
        for dirpath, _dirs, names in os.walk(base):
            rel = os.path.relpath(dirpath, self.bucket.backing)
            rel = "" if rel == "." else rel.replace(os.sep, "/")
            keys |= {join_key(rel, n) for n in names}
        strip = len(self.base) + 1 if self.base else 0
        return sorted(k[strip:] for k in keys)

    def copy(self, src: str, dst: str) -> None:
        data = self.get(src)
        if data is None:
            raise FileNotFoundError(src)
        self.put(dst, data)  # plane-aware: dst decides dict vs backing

    def spark_url(self, key: str) -> str:
        return self._backing_path(self._abs(key))


# -- scheme registry ---------------------------------------------------------

def _open_local(url: str) -> ObjectStore:
    return LocalStore(url)


def _open_file(url: str) -> ObjectStore:
    u = urlparse(url)
    if u.netloc not in ("", "localhost"):
        raise ValueError(f"unsupported file:// host in {url!r}")
    return LocalStore(unquote(u.path))


def _open_mem(url: str) -> ObjectStore:
    u = urlparse(url)
    return MemStore(mem_bucket(u.netloc), u.path)


def _open_s3_lazy(url: str) -> ObjectStore:
    # s3store imports this module; resolve lazily so boto3 stays an
    # optional dependency until an s3:// root is actually opened
    try:
        from datalake_spark.s3store import S3Store
    except ImportError as e:
        raise ValueError(
            f"catalog root {url!r} needs the boto3-backed S3Store, but "
            f"its import failed ({e}) — install boto3 or pass a local / "
            "file:// / mem:// path"
        )
    return S3Store.from_url(url)


_SCHEMES: dict[str, object] = {
    "file": _open_file,
    "mem": _open_mem,
    "s3": _open_s3_lazy,
    "s3a": _open_s3_lazy,
}


def register_scheme(scheme: str, factory) -> None:
    """Plug a store for ``scheme://`` roots; ``factory(url) -> ObjectStore``.
    An S3 deployment registers its boto3-backed store here once."""
    _SCHEMES[scheme] = factory


def open_store(root: str) -> ObjectStore:
    """Resolve a catalog root to its store: plain paths and ``file://``
    URLs get :class:`LocalStore`, ``mem://`` the fake, registered schemes
    their factory; anything else raises up front with the remedy."""
    if "://" not in root and not root.startswith("file:"):
        return _open_local(root)
    scheme = root.split(":", 1)[0]
    factory = _SCHEMES.get(scheme)
    if factory is None:
        raise ValueError(
            f"catalog root {root!r}: no store registered for scheme "
            f"{scheme!r} — register_scheme() a store-specific IO layer "
            "(see datalake_spark/store.py), or pass a local / file:// / "
            "mem:// path"
        )
    return factory(root)
