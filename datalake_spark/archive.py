"""Content fetch (O14), content sniffing (O11 content half), and
compression-on-ingest (O21).

Semantics tracked from the reference (cited, not copied):

- ``Archive.fetch`` / ``fetch_to_filename`` + filename templating
  (``{what}``/``{where}``/``{start}``/``{start_iso}``/``{end_iso}``/...):
  client/datalake/archive.py:264-302,317-352,379-403.
- HTTP(S)-scheme fetch — url must start with the configured http base url
  and end in ``/data``; metadata comes from the sibling ``/metadata``
  endpoint; 400/404 surface the API error; ``stream=True`` reads the
  response lazily (client/datalake/archive.py:283-313,418-423,
  ``StreamingHTTPFile`` dlfile.py:128-136).  Implemented over stdlib
  urllib — no third-party HTTP stack.
- content_type / content_encoding sniffing — 1 KiB header peek, gzip magic
  ``1f 8b 08``, mimetypes on the checksum-stripped path:
  api/datalake_api/fetcher.py:26-67.
- gzip compression on ingest: client/datalake/dlfile.py:173-191
  (``File.from_filename_compressed``).

Store layout: ``{storage_url}/{id}/data`` with a JSON metadata sidecar at
``{storage_url}/{id}/metadata`` — the local-filesystem analog of the
reference's S3 object + user-metadata pair (its _KEY_FORMAT is
``{id}/data``, archive.py:440).  The engine performs no network IO itself;
any object store mounted as a filesystem presents the same layout.
"""

from __future__ import annotations

import gzip
import io
import json
import os
import re
from datetime import datetime, timezone
from mimetypes import guess_type
from typing import Iterator


class InvalidDatalakePath(Exception):
    """URL is not fetchable / template is invalid (reference
    client/datalake/errors — same contract)."""


class DatalakeHttpError(Exception):
    """The datalake HTTP API returned an error status (reference
    client/datalake/archive.py:175-184 — 400/404 carry a JSON
    message+code; anything else non-200 is surfaced raw)."""


class NoSuchDatalakeFile(InvalidDatalakePath):
    """No file with the given id exists in the store (the data file or its
    metadata sidecar is absent).  Subclasses InvalidDatalakePath so callers
    catching the broad error (fetch_bulk's per-row error rows, CLI) keep
    working while point callers can distinguish 'missing' from 'malformed
    url'."""


_HEADER_BYTES = 1024
_GZIP_MAGIC = b"\x1f\x8b\x08"

# streaming push granularities, both reference-pinned: content hashes in
# 64 KiB blocks (dlfile.py:221-235 _HASH_BUF_SIZE) and store writers
# flush DATALAKE_CHUNK_SIZE_MB parts (archive.py:45-48 CHUNK_SIZE — the
# S3 multipart sizing, 5 MB minimum / 5 GB single-PUT cap)
_HASH_BUF_SIZE = 65536


def _gzip_bytes(data: bytes) -> bytes:
    """Deterministic gzip (mtime=0, no filename) via GzipFile — the SAME
    primitive the streaming path wraps around its writer, so eager and
    streamed stores of one input are byte-identical and dedup to one
    content hash.  (gzip.compress writes a different OS header byte on
    modern Pythons, which would silently fork the two paths' hashes.)"""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(data)
    return buf.getvalue()


def chunk_size_bytes() -> int:
    return int(float(os.environ.get("DATALAKE_CHUNK_SIZE_MB", 100)) * 1024 * 1024)


class _HashingTee:
    """Pass-through writer that blake2b-16s and counts everything written
    to the underlying store writer — the hash the metadata records is the
    hash of the STORED bytes (post-compression), same as the eager path."""

    def __init__(self, sink):
        import hashlib

        self.sink = sink
        self.h = hashlib.blake2b(digest_size=16)
        self.n = 0

    def write(self, b) -> int:
        self.h.update(b)
        self.n += len(b)
        return self.sink.write(b)

    def tell(self) -> int:
        return self.sink.tell()

    def flush(self) -> None:  # GzipFile calls flush on close
        pass
# a path like name.csv-<32..40 hex> carries a trailing checksum; content type
# is sniffed from the stripped path (api/datalake_api/fetcher.py:35-42)
_TRAILING_CHECKSUM = re.compile(r"(?P<path>.+)-[0-9a-f]{32,40}?")


class ArchiveFile:
    """A fetched file: content stream + metadata + sniffed content type and
    encoding (the reference's ArchiveFile, api/datalake_api/fetcher.py:26-67).
    """

    def __init__(self, fd, metadata: dict):
        self.fd = fd
        self.metadata = dict(metadata)
        self._header = self.fd.read(_HEADER_BYTES)
        self._closed = False

    @property
    def _adjusted_path(self) -> str | None:
        path = self.metadata.get("path")
        if not path:
            return path
        m = _TRAILING_CHECKSUM.match(path)
        return m.group("path") if m else path

    @property
    def content_type(self) -> str | None:
        if not self._adjusted_path:
            return None
        ctype, _encoding = guess_type(self._adjusted_path)
        return ctype

    @property
    def content_encoding(self) -> str | None:
        return "gzip" if self._header.startswith(_GZIP_MAGIC) else None

    def read(self, size: int = -1) -> bytes:
        if self._closed:
            raise ValueError("read on closed file")
        if size is None or size < 0:
            out = self._header + self.fd.read()
            self._header = b""
            return out
        out = self._header[:size]
        self._header = self._header[size:]
        if len(out) < size:
            out += self.fd.read(size - len(out))
        return out

    def iter_content(self, chunk_size: int = 1024) -> Iterator[bytes]:
        while True:
            block = self.read(chunk_size)
            if not block:
                return
            yield block

    def readlines(self) -> list[bytes]:
        return self.read().splitlines(keepends=True)

    def close(self) -> None:
        self._closed = True
        self.fd.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def filename_column(template: str | None, fields: dict):
    """Vectorized filename templating: the Column form of
    ``fetch_to_filename``'s template expansion (reference
    archive.py:379-394), for fetch fan-outs planned in the engine —
    100k-file fetches compute their target names in the scan, not in a
    driver loop.

    ``fields`` maps template variable names to Columns; ``{start_iso}`` /
    ``{end_iso}`` should be provided pre-formatted (ms precision).  Unknown
    variables raise InvalidDatalakePath at plan time, like the driver-side
    path does at call time.  NULL fields render as ``None`` — the same
    string Python's ``str.format`` produces for a missing value.
    """
    from string import Formatter

    from pyspark.sql import functions as F

    if template is None:
        template = "{id}"
    parts = []
    try:
        for literal, field, spec, conv in Formatter().parse(template):
            if literal:
                parts.append(F.lit(literal))
            if field is None:
                continue
            if spec or conv:
                raise InvalidDatalakePath(
                    f"format specs are not supported in {template!r}"
                )
            if field not in fields:
                raise InvalidDatalakePath(
                    f'"{field}" does not appear to be a supported template '
                    "variable."
                )
            parts.append(F.coalesce(fields[field].cast("string"), F.lit("None")))
    except ValueError as e:
        raise InvalidDatalakePath(str(e))
    return F.concat(*parts) if parts else F.lit("")


class Archive:
    """URL-addressed content store + fetch API.

    ``storage_url`` is a directory URL (``file:///path`` or a plain path);
    content lives at ``{storage_url}/{id}/data``.
    """

    _KEY_FORMAT = "{id}/data"
    _ISO_FORMAT_MS = "%Y-%m-%dT%H:%M:%S.%f"

    def __init__(self, storage_url: str, http_url: str | None = None,
                 http_timeout: float | None = None):
        self.storage_url = storage_url.rstrip("/")
        self.http_url = http_url.rstrip("/") if http_url else None
        # env-configurable like the reference's READ_TIMEOUT
        # (archive.py:55-77, DATALAKE_READ_TIMEOUT_S); urllib takes one
        # combined connect+read timeout
        self.http_timeout = (
            http_timeout
            if http_timeout is not None
            else float(os.environ.get("DATALAKE_READ_TIMEOUT_S", 60.0))
        )
        # blob IO goes through the store seam (datalake_spark/store.py):
        # local and file:// roots use LocalStore, mem:// the fake, and an
        # S3/GCS deployment registers its SDK store once — the reference's
        # archive is s3-native (client/datalake/archive.py:100-109) and
        # this is the Spark-repo analog of that dispatch.
        from datalake_spark.store import open_store

        try:
            self._store = open_store(self.storage_url)
        except ValueError as e:
            raise InvalidDatalakePath(str(e))
        # filesystem-visible data root (LocalStore: the directory itself;
        # MemStore: the bucket's backing dir) — for callers that serve or
        # inspect stored blobs as files
        self._root = self._store.spark_url("")

    # -- store side (the content half of push, O12/O21) ---------------------
    def store(self, metadata: dict, content: bytes, compress: bool = False) -> str:
        """Write content + metadata sidecar; returns the fetchable url.

        ``compress=True`` gzips on ingest (reference
        File.from_filename_compressed, dlfile.py:173-191) unless the content
        already carries the gzip magic.  mtime=0 keeps the stream
        deterministic (byte-identical re-ingest ⇒ identical stored object).
        """
        file_id = str(metadata["id"])
        if compress and not content.startswith(_GZIP_MAGIC):
            content = _gzip_bytes(content)
        self._store.put(f"{file_id}/data", content)
        self._store.put(
            f"{file_id}/metadata",
            json.dumps(metadata, sort_keys=True).encode(),
        )
        return self.url_from_id(file_id)

    def store_stream(self, metadata: dict, fileobj,
                     compress: bool = False,
                     chunk_size: int | None = None) -> str:
        """Stream content into the store without ever materializing the
        blob: 64 KiB read blocks (reference dlfile.py:221-235 hash loop),
        blake2b-16 computed on the fly over the STORED bytes, written
        through the store's streaming writer — a temp-file rename
        locally, a multipart upload of ``chunk_size`` parts on S3
        (reference archive.py:45-48 CHUNK_SIZE / DATALAKE_CHUNK_SIZE_MB).
        Peak driver memory is one part, regardless of blob size.

        Produces byte-identical stored objects to :meth:`store` for the
        same input (gzip mtime=0, same magic sniff), so eager and
        streaming pushes of one file dedup to the same content hash.
        Fills ``metadata["hash"]`` (and ``"size"``, the stored byte
        count) when absent, writes the sidecar after the content
        publishes, and returns the fetchable url.  A mid-stream failure
        aborts the store writer — no partial object is ever visible."""
        file_id = str(metadata["id"])
        writer = self._store.open_write(
            f"{file_id}/data", chunk_size or chunk_size_bytes()
        )
        tee = _HashingTee(writer)
        try:
            # the magic sniff must see a FULL prefix: read(n) on pipes /
            # sockets / chunked bodies may return short, and a 1-byte
            # head would false-negative the already-gzipped check and
            # double-compress (forking the hash from the eager path)
            head = b""
            while len(head) < len(_GZIP_MAGIC):
                b = fileobj.read(len(_GZIP_MAGIC) - len(head))
                if not b:
                    break
                head += b
            gz = None
            out = tee
            if compress and not head.startswith(_GZIP_MAGIC):
                gz = gzip.GzipFile(fileobj=tee, mode="wb", mtime=0)
                out = gz
            out.write(head)
            while True:
                block = fileobj.read(_HASH_BUF_SIZE)
                if not block:
                    break
                out.write(block)
            if gz is not None:
                gz.close()  # flush the gzip trailer through the tee
            # close INSIDE the guard: a close-time failure (final part
            # upload, completion call) must abort too — the S3 writer
            # self-aborts its upload and the local writer removes its
            # temp; the follow-up abort() on a closed writer is a no-op
            writer.close()
        except Exception:
            writer.abort()
            raise
        if not metadata.get("hash"):
            metadata["hash"] = tee.h.hexdigest()
        if not metadata.get("size"):
            metadata["size"] = tee.n
        self._store.put(
            f"{file_id}/metadata",
            json.dumps(metadata, sort_keys=True).encode(),
        )
        return self.url_from_id(file_id)

    def url_from_id(self, file_id: str) -> str:
        return f"{self.storage_url}/" + self._KEY_FORMAT.format(id=file_id)

    # -- fetch side (O14) ---------------------------------------------------
    def fetch(self, url: str, stream: bool = False) -> ArchiveFile:
        """Fetch a url as an ArchiveFile.  Store urls and http(s) urls are
        both supported (reference archive.py:264-281: s3 vs http dispatch).
        ``stream`` keeps the underlying handle (file or http response) open
        and lazily read; otherwise content is materialized eagerly — both
        present the same read()/iter_content() surface."""
        if self._is_valid_http_url(url):
            return self._fetch_http(url, stream=stream)
        if url.startswith("http"):
            raise InvalidDatalakePath(
                f"{url} does not appear to be a fetchable url"
            )
        file_id = self._id_from_url(url)
        fh = self._store.open_read(f"{file_id}/data")
        if fh is None:
            raise NoSuchDatalakeFile(f"Failed to find {url} in the datalake.")
        raw_meta = self._store.get(f"{file_id}/metadata")
        if raw_meta is None:
            fh.close()
            raise NoSuchDatalakeFile(
                f"{url} has no metadata sidecar in the datalake."
            )
        try:
            metadata = json.loads(raw_meta)
        except (json.JSONDecodeError, UnicodeDecodeError) as e:
            fh.close()
            raise InvalidDatalakePath(
                f"metadata sidecar for {url} is corrupt: {e}"
            )
        if stream:
            return ArchiveFile(fh, metadata)
        with fh:
            return ArchiveFile(io.BytesIO(fh.read()), metadata)

    def fetch_to_filename(self, url: str, filename_template: str | None = None) -> str:
        """Fetch a url and write it to a templated filename; returns the
        filename written.  Template fields are the metadata fields plus
        ``{start_iso}``/``{end_iso}`` (ms precision); default template is
        ``{id}`` (reference archive.py:317-352,379-394)."""
        f = self.fetch(url, stream=True)
        fname = self._filename_from_template(filename_template, f.metadata)
        dname = os.path.dirname(fname)
        if dname:
            os.makedirs(dname, exist_ok=True)
        with open(fname, "wb") as fh:
            for block in f.iter_content():
                fh.write(block)
        f.close()
        return fname

    # -- http fetch (reference archive.py:283-313) --------------------------
    def _is_valid_http_url(self, url: str) -> bool:
        """Reference _is_valid_http_url (archive.py:280-281): starts with
        'http' and ends with '/data'."""
        return url.startswith("http") and url.endswith("/data")

    def _fetch_http(self, url: str, stream: bool) -> ArchiveFile:
        self._validate_http_url(url)
        metadata = self._get_metadata_from_http_url(url)
        resp = self._http_get(url)
        if stream:
            # lazy: the response object is the fd; ArchiveFile peeks 1 KiB
            # for the sniff header and reads the rest on demand — the
            # StreamingHTTPFile surface (dlfile.py:128-136)
            return ArchiveFile(resp, metadata)
        with resp:
            return ArchiveFile(io.BytesIO(resp.read()), metadata)

    def _validate_http_url(self, url: str) -> None:
        """Reference _validate_fetch_url (archive.py:418-423): an http url
        is only fetchable under the configured http base url."""
        if self.http_url is None or not url.startswith(self.http_url + "/"):
            raise InvalidDatalakePath(
                f"url {url} does not start with the configured http url "
                f"{self.http_url}."
            )

    def _get_metadata_from_http_url(self, url: str) -> dict:
        """GET the sibling /metadata endpoint (archive.py:308-313)."""
        meta_url = url[: -len("/data")] + "/metadata"
        with self._http_get(meta_url) as resp:
            try:
                return json.load(resp)
            except (json.JSONDecodeError, UnicodeDecodeError) as e:
                raise InvalidDatalakePath(
                    f"metadata for {url} is corrupt: {e}"
                )

    def _http_get(self, url: str):
        """GET with the reference's status contract (archive.py:175-184):
        400/404 decode the API's JSON message+code, other non-200s surface
        raw; 404 additionally maps to NoSuchDatalakeFile so http and store
        fetches raise the same 'missing' type."""
        import urllib.error
        import urllib.request

        try:
            return urllib.request.urlopen(url, timeout=self.http_timeout)
        except urllib.error.HTTPError as e:
            body = e.read()
            if e.code in (400, 404):
                try:
                    err = json.loads(body)
                    msg = "{} ({})".format(err["message"], err["code"])
                except Exception:
                    msg = f"Datalake HTTP API failed: {body!r} ({e.code})"
                if e.code == 404:
                    raise NoSuchDatalakeFile(msg)
                raise DatalakeHttpError(msg)
            raise DatalakeHttpError(
                f"Datalake HTTP API failed: {body!r} ({e.code})"
            )

    # -- internals ----------------------------------------------------------
    def _id_from_url(self, url: str) -> str:
        if not url.startswith(self.storage_url + "/"):
            raise InvalidDatalakePath(
                f"url {url} does not start with the configured storage url "
                f"{self.storage_url}."
            )
        rel = url[len(self.storage_url) + 1 :]
        parts = rel.split("/")
        if len(parts) != 2 or parts[1] != "data" or not parts[0]:
            raise InvalidDatalakePath(f"{url} is not a valid datalake url")
        return parts[0]

    def _filename_from_template(self, template: str | None, metadata: dict) -> str:
        template_vars = dict(metadata)
        template_vars.update(
            start_iso=self._ms_to_iso(metadata.get("start")),
            end_iso=self._ms_to_iso(metadata.get("end")),
        )
        if template is None:
            template = "{id}"
        try:
            return template.format(**template_vars)
        except KeyError as e:
            raise InvalidDatalakePath(
                f'"{e}" does not appear to be a supported template variable.'
            )
        except (ValueError, IndexError) as e:
            raise InvalidDatalakePath(str(e))

    def _ms_to_iso(self, ts: int | None) -> str | None:
        if ts is None:
            return None
        d = datetime.fromtimestamp(ts / 1000.0, tz=timezone.utc)
        return d.strftime(self._ISO_FORMAT_MS)[:-3]


def fetch_bulk(urls_df, storage_url: str, url_col: str = "url",
               http_url: str | None = None):
    """Distributed fetch: a frame of store urls → (url, content, n_bytes,
    fetch_error) via mapInPandas — the 100 TB form of O14, where the driver
    plans WHICH files (a metadata query) and executors move the bytes.
    Schemes may be mixed per row (store urls and, with ``http_url``
    configured, http(s) urls); missing/invalid/unreachable urls yield error
    rows, never a failed stage.  Compose with
    operators/sniff.sniff_content for typed content, or with
    filename_column for templated sink paths."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("content", T.BinaryType(), True),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("fetch_error", T.StringType(), True),
        ]
    )

    def run(batches):
        # per-task; cheap, no driver state
        archive = Archive(storage_url, http_url=http_url)
        for pdf in batches:
            out: dict[str, list] = {
                "url": [], "content": [], "n_bytes": [], "fetch_error": [],
            }
            for url in pdf[url_col]:
                out["url"].append(url)
                try:
                    content = archive.fetch(url).read()
                    out["content"].append(content)
                    out["n_bytes"].append(len(content))
                    out["fetch_error"].append(None)
                except (InvalidDatalakePath, DatalakeHttpError, OSError) as e:
                    # OSError covers urllib URLError / socket timeouts —
                    # an unreachable server is an error row, not a dead stage
                    out["content"].append(None)
                    out["n_bytes"].append(None)
                    out["fetch_error"].append(str(e))
            yield pd.DataFrame(out)

    return urls_df.select(url_col).mapInPandas(run, schema=schema)
