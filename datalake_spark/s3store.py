"""boto3-backed :class:`~datalake_spark.store.ObjectStore` — the
reference's native deployment model made real.

The reference is s3-native throughout (client/datalake/archive.py:100-109
stores content at ``s3://bucket/{id}/data``; record.py:126-149 resolves
s3 urls) and coordinates writers with DynamoDB conditional puts
(ingester/datalake_ingester/storage.py:64-137).  This Spark repo folds
both roles into ONE store: data objects land in the bucket, and the
catalog's commit markers use S3's own conditional write
(``If-None-Match: *`` — exactly one creator per key) instead of a second
database.  Everything above the store seam — the catalog commit
protocol, streaming shard promotion, archive blobs — is already
expressed in store verbs (store.py), so this module is the whole
deployment story.

Usage::

    from datalake_spark.catalog import Catalog
    cat = Catalog(spark, "s3://my-bucket/lake/cat")   # scheme pre-registered

Spark executors read and write the data plane through the Hadoop S3A
connector (``spark_url`` returns ``s3a://bucket/key``); driver-side
control IO goes through boto3.  Both resolve the same bucket — the
two-plane split mirrors how the MemStore fake models it (store.py).

The suite proves the store against moto (mock_aws) when available —
verbs, hypothesis local-vs-S3 equivalence, the archive round trip, and
the catalog commit path with marker CAS through the real conditional-PUT
code (tests/test_s3store.py); this is the reference's own test strategy
(api/tests/conftest.py:99-143, ingester/tests/test_ingester.py:27-179).
"""

from __future__ import annotations

import io
import threading
from urllib.parse import urlparse

from datalake_spark.store import ObjectStore, join_key, register_scheme

# S3 multipart constraints: parts except the last must be >= 5 MiB;
# single PUT caps at 5 GiB (reference archive.py:45-48 sizes chunks with
# DATALAKE_CHUNK_SIZE_MB, default 100 MB, for the same reason).
_MIN_PART = 5 * 1024 * 1024


def _client_error_code(e: Exception) -> str:
    return getattr(e, "response", {}).get("Error", {}).get("Code", "")


class S3Store(ObjectStore):
    """The five store verbs (plus COPY and streaming writes) over boto3.

    ``put`` maps to a single PUT — natively atomic, last writer wins,
    readers never see a torn object.  ``put_if_absent`` maps to
    ``If-None-Match: *``: S3 guarantees exactly one of N concurrent
    conditional creators succeeds, which is precisely the arbiter the
    catalog's commit markers need (catalog.py `_commit_version`).  A 409
    ``ConditionalRequestConflict`` (two conditional writers racing the
    SAME key in-flight) is retried until it resolves to created/exists —
    per the S3 conditional-write contract the retry always terminates.
    """

    def __init__(self, bucket: str, base: str = "", client=None,
                 region: str | None = None, spark_scheme: str = "s3a"):
        if client is None:
            import boto3
            from botocore.config import Config

            # adaptive retry mode: client-side rate limiting on 503
            # SlowDown — a 1000-executor fleet hammering one bucket
            # prefix hits S3's per-prefix request ceiling long before
            # any of this code is the bottleneck
            cfg = Config(retries={"mode": "adaptive", "max_attempts": 10})
            client = (
                boto3.client("s3", region_name=region, config=cfg)
                if region else boto3.client("s3", config=cfg)
            )
        self.s3 = client
        self.bucket = bucket
        self.base = base.strip("/")
        self.spark_scheme = spark_scheme
        self.url = f"s3://{bucket}" + (f"/{self.base}" if self.base else "")

    @classmethod
    def from_url(cls, url: str, **kw) -> "S3Store":
        u = urlparse(url)
        if not u.netloc:
            raise ValueError(f"s3 url {url!r} has no bucket")
        return cls(u.netloc, u.path, **kw)

    def _abs(self, key: str) -> str:
        return join_key(self.base, key)

    # -- verbs ----------------------------------------------------------------
    def get(self, key: str) -> bytes | None:
        from botocore.exceptions import ClientError

        try:
            resp = self.s3.get_object(Bucket=self.bucket, Key=self._abs(key))
        except ClientError as e:
            if _client_error_code(e) in ("NoSuchKey", "404"):
                return None
            raise
        with resp["Body"] as body:
            return body.read()

    def put(self, key: str, data: bytes) -> None:
        self.s3.put_object(Bucket=self.bucket, Key=self._abs(key), Body=data)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        from botocore.exceptions import ClientError

        k = self._abs(key)
        while True:
            try:
                self.s3.put_object(
                    Bucket=self.bucket, Key=k, Body=data, IfNoneMatch="*"
                )
                return True
            except ClientError as e:
                code = _client_error_code(e)
                if code == "PreconditionFailed":
                    return False  # somebody (possibly an earlier self) won
                if code == "ConditionalRequestConflict":
                    continue  # racing conditional write in flight: re-ask
                raise

    def delete(self, key: str) -> None:
        # S3 DeleteObject is idempotent: deleting a missing key succeeds
        self.s3.delete_object(Bucket=self.bucket, Key=self._abs(key))

    def list(self, prefix: str) -> list[str]:
        from botocore.exceptions import ClientError

        p = self._abs(prefix)
        out: set[str] = set()
        strip = len(self.base) + 1 if self.base else 0
        paginator = self.s3.get_paginator("list_objects_v2")
        # prefix is a key-path segment BOUNDARY (store.py contract), not a
        # string prefix: list under "p/", plus a HEAD for the exact object
        for page in paginator.paginate(
            Bucket=self.bucket, Prefix=f"{p}/" if p else ""
        ):
            for obj in page.get("Contents", []):
                out.add(obj["Key"][strip:])
        if p:
            try:
                self.s3.head_object(Bucket=self.bucket, Key=p)
                out.add(p[strip:])
            except ClientError as e:
                if _client_error_code(e) not in ("NoSuchKey", "404"):
                    raise
        return sorted(out)

    def exists_prefix(self, prefix: str) -> bool:
        # one MaxKeys=1 page (plus at most one HEAD) instead of the
        # derived full-prefix LIST — "does this table exist" on a table
        # with millions of objects is a constant-cost probe
        from botocore.exceptions import ClientError

        p = self._abs(prefix)
        resp = self.s3.list_objects_v2(
            Bucket=self.bucket, Prefix=f"{p}/" if p else "", MaxKeys=1
        )
        if resp.get("KeyCount", 0) > 0:
            return True
        if not p:
            return False
        try:
            self.s3.head_object(Bucket=self.bucket, Key=p)
            return True
        except ClientError as e:
            if _client_error_code(e) in ("NoSuchKey", "404"):
                return False
            raise

    def delete_prefix(self, prefix: str) -> None:
        # batched DeleteObjects (1000 keys/call) instead of one DELETE
        # per object — GC of a version directory is pages, not objects
        keys = self.list(prefix)
        for i in range(0, len(keys), 1000):
            self.s3.delete_objects(
                Bucket=self.bucket,
                Delete={
                    "Objects": [
                        {"Key": self._abs(k)} for k in keys[i:i + 1000]
                    ],
                    "Quiet": True,
                },
            )

    def subdirs(self, prefix: str) -> list[str]:
        """Immediate child 'directory' names via a DELIMITER listing
        (CommonPrefixes) — one shallow LIST page per ~1000 children, so
        GC/fsck candidate resolution is O(version dirs), never a
        recursive enumeration of the table's data objects."""
        p = self._abs(prefix)
        boundary = f"{p}/" if p else ""
        out: list[str] = []
        paginator = self.s3.get_paginator("list_objects_v2")
        for page in paginator.paginate(
            Bucket=self.bucket, Prefix=boundary, Delimiter="/"
        ):
            for cp in page.get("CommonPrefixes", []):
                out.append(cp["Prefix"][len(boundary):].rstrip("/"))
        return sorted(out)

    # CopyObject rejects sources above 5 GiB with InvalidRequest; larger
    # objects must go through multipart UploadPartCopy.  The part size is
    # an instance attribute so tests inject tiny values and drive the
    # multipart path against moto with MiB-sized objects (moto does not
    # enforce the 5 GiB limit, so tests trigger the fallback by stubbing
    # copy_object to raise the real error).
    copy_part_size = 1024 * 1024 * 1024

    def copy(self, src: str, dst: str) -> None:
        from botocore.exceptions import ClientError

        s, d = self._abs(src), self._abs(dst)
        if s == d:
            # S3 rejects metadata-preserving self-copy; match LocalStore:
            # succeed iff the object exists.  (HEAD of a missing key can
            # surface as 403 when the caller lacks s3:ListBucket — that
            # stays a ClientError rather than FileNotFoundError because
            # 403 on an EXISTING key is a genuine permission failure.)
            try:
                self.s3.head_object(Bucket=self.bucket, Key=s)
            except ClientError as e:
                if _client_error_code(e) in ("NoSuchKey", "404"):
                    raise FileNotFoundError(src) from e
                raise
            return
        # single-shot first: the overwhelmingly common sub-5 GiB copy is
        # then exactly ONE request (stage-and-promote fans hundreds of
        # these out in parallel — an unconditional pre-flight HEAD would
        # double the round-trips on that hot path)
        try:
            self.s3.copy_object(
                Bucket=self.bucket, Key=d,
                CopySource={"Bucket": self.bucket, "Key": s},
            )
            return
        except ClientError as e:
            code = _client_error_code(e)
            if code in ("NoSuchKey", "404"):
                raise FileNotFoundError(src) from e
            if code != "InvalidRequest":
                raise
            # InvalidRequest = "copy source is larger than the maximum
            # allowable size" → fall through to multipart
        size = self.s3.head_object(Bucket=self.bucket, Key=s)[
            "ContentLength"
        ]
        # server-side multipart copy (UploadPartCopy ranges; no bytes
        # transit the driver).  Abort on any failure so no half-uploaded
        # parts accrue storage forever.
        up = self.s3.create_multipart_upload(Bucket=self.bucket, Key=d)[
            "UploadId"
        ]
        try:
            part = max(self.copy_part_size, 1)
            parts, num, off = [], 1, 0
            while off < size:
                end = min(off + part, size) - 1
                resp = self.s3.upload_part_copy(
                    Bucket=self.bucket, Key=d, UploadId=up, PartNumber=num,
                    CopySource={"Bucket": self.bucket, "Key": s},
                    CopySourceRange=f"bytes={off}-{end}",
                )
                parts.append(
                    {"ETag": resp["CopyPartResult"]["ETag"],
                     "PartNumber": num}
                )
                num += 1
                off = end + 1
            self.s3.complete_multipart_upload(
                Bucket=self.bucket, Key=d, UploadId=up,
                MultipartUpload={"Parts": parts},
            )
        except Exception:
            try:
                self.s3.abort_multipart_upload(
                    Bucket=self.bucket, Key=d, UploadId=up
                )
            except Exception:
                pass
            raise

    def open_read(self, key: str):
        from botocore.exceptions import ClientError

        try:
            resp = self.s3.get_object(Bucket=self.bucket, Key=self._abs(key))
        except ClientError as e:
            if _client_error_code(e) in ("NoSuchKey", "404"):
                return None
            raise
        return resp["Body"]  # StreamingBody: read()/close(), never buffers all

    def open_write(self, key: str, chunk_size: int = 100 * 1024 * 1024):
        """Multipart streaming writer: parts of ``chunk_size`` (floored at
        S3's 5 MiB minimum) upload as the caller writes; the object
        appears atomically at close() (CompleteMultipartUpload), abort()
        discards all uploaded parts server-side.  Bounded memory: at most
        one part is buffered."""
        return _S3MultipartWriter(
            self.s3, self.bucket, self._abs(key),
            max(chunk_size, _MIN_PART),
        )

    def spark_url(self, key: str) -> str:
        return f"{self.spark_scheme}://{self.bucket}/{self._abs(key)}"

    def spark_conf(self, endpoint: str | None = None,
                   path_style: bool | None = None,
                   magic_committer: bool = True) -> dict[str, str]:
        """The Hadoop-S3A settings that make Spark's data plane resolve
        the SAME endpoint this store's boto3 client talks to — apply
        with ``spark.conf.set`` / ``--conf spark.hadoop.<k>=<v>`` when
        deploying against a non-AWS endpoint (MinIO, localstack, an
        on-prem gateway).  ``endpoint`` defaults to the boto3 client's;
        ``path_style`` defaults to True whenever a custom endpoint is in
        play (virtual-hosted bucket DNS rarely exists off AWS).

        ``magic_committer`` (default on) emits the S3A magic-committer
        settings: the classic FileOutputCommitter publishes tasks by
        RENAME, which on S3 is a full copy of every byte written — a
        100 TB version-directory write would pay for itself twice and
        leave a non-atomic window besides.  The magic committer
        publishes via multipart-upload completion instead (no copies;
        task commit is the same atomic primitive the store layer's
        open_write uses)."""
        if endpoint is None:
            endpoint = self.s3.meta.endpoint_url
        custom = endpoint and "amazonaws.com" not in endpoint
        if path_style is None:
            path_style = bool(custom)
        conf = {
            "fs.s3a.path.style.access": "true" if path_style else "false",
        }
        if custom:
            conf["fs.s3a.endpoint"] = endpoint
        if magic_committer:
            conf.update({
                "fs.s3a.committer.name": "magic",
                "fs.s3a.committer.magic.enabled": "true",
                "spark.sql.parquet.output.committer.class":
                    "org.apache.spark.internal.io.cloud."
                    "BindingParquetOutputCommitter",
                "spark.sql.sources.commitProtocolClass":
                    "org.apache.spark.internal.io.cloud."
                    "PathOutputCommitProtocol",
            })
        return conf


class _S3MultipartWriter:
    """File-like over CreateMultipartUpload/UploadPart/Complete.

    Objects smaller than one part skip multipart entirely (a single PUT
    at close — cheaper and no 5 MiB floor).  The multipart path starts
    lazily on the first flush so an abort() before any flush costs no
    API calls beyond none."""

    def __init__(self, s3, bucket: str, key: str, chunk_size: int):
        self.s3 = s3
        self.bucket = bucket
        self.key = key
        self.chunk_size = chunk_size
        self.buf = io.BytesIO()
        self.upload_id: str | None = None
        self.parts: list[dict] = []
        self.n = 0
        self.closed = False
        self._lock = threading.Lock()

    def write(self, b) -> int:
        if self.closed:
            raise ValueError("write to a closed store writer")
        self.buf.write(b)
        self.n += len(b)
        if self.buf.tell() >= self.chunk_size:
            self._flush_part()
        return len(b)

    def _flush_part(self) -> None:
        if self.upload_id is None:
            self.upload_id = self.s3.create_multipart_upload(
                Bucket=self.bucket, Key=self.key
            )["UploadId"]
        num = len(self.parts) + 1
        resp = self.s3.upload_part(
            Bucket=self.bucket, Key=self.key, UploadId=self.upload_id,
            PartNumber=num, Body=self.buf.getvalue(),
        )
        self.parts.append({"ETag": resp["ETag"], "PartNumber": num})
        self.buf = io.BytesIO()

    def tell(self) -> int:
        return self.n

    def close(self) -> None:
        with self._lock:
            if self.closed:
                return
            self.closed = True
        try:
            if self.upload_id is None:
                # never crossed one part: plain atomic PUT
                self.s3.put_object(
                    Bucket=self.bucket, Key=self.key, Body=self.buf.getvalue()
                )
                return
            if self.buf.tell():
                self._flush_part()  # the final part may be any size
            self.s3.complete_multipart_upload(
                Bucket=self.bucket, Key=self.key, UploadId=self.upload_id,
                MultipartUpload={"Parts": self.parts},
            )
        except Exception:
            # a close-time failure must not strand the multipart upload:
            # uncompleted parts accrue storage charges forever unless a
            # lifecycle rule exists.  Abort server-side, then surface the
            # original error (the abort itself failing must not mask it).
            if self.upload_id is not None:
                try:
                    self.s3.abort_multipart_upload(
                        Bucket=self.bucket, Key=self.key,
                        UploadId=self.upload_id,
                    )
                except Exception:
                    pass
            raise

    def abort(self) -> None:
        with self._lock:
            if self.closed:
                return
            self.closed = True
        if self.upload_id is not None:
            self.s3.abort_multipart_upload(
                Bucket=self.bucket, Key=self.key, UploadId=self.upload_id
            )
        self.buf = io.BytesIO()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *a):
        if exc_type is not None:
            self.abort()
        else:
            self.close()


def _open_s3(url: str) -> S3Store:
    return S3Store.from_url(url)


def register() -> None:
    """Register ``s3://`` and ``s3a://`` catalog roots (store.py resolves
    them through this factory).  Importing this module registers too."""
    register_scheme("s3", _open_s3)
    register_scheme("s3a", _open_s3)


register()
