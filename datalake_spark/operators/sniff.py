"""Bulk content sniffing: content_type + content_encoding for a frame of
binary content — the distributed form of the reference's per-file sniff
(api/datalake_api/fetcher.py:26-67: 1 KiB header peek, gzip magic
``1f 8b 08``, mimetypes on the checksum-stripped path).

All pure Column expressions (whole-stage codegen): the gzip check is a
3-byte binary prefix compare, and the mimetypes table is materialized as a
literal MapType lookup keyed by lower-cased extension — identical results
to :class:`datalake_spark.archive.ArchiveFile` because the map is built
from the same ``mimetypes`` registry at plan time.  At 100 TB this is a
map-only stage over a ``binaryFile`` (or content-table) scan: no shuffle,
no Python in the hot path.
"""

from __future__ import annotations

import mimetypes
from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Derived at import from the MODULE-LEVEL registries mimetypes.guess_type
# itself consults (init() also folds in system mime.types files — a fresh
# MimeTypes() instance would NOT see those), so the bulk Column path and
# ArchiveFile.content_type can never disagree on which suffixes get
# rewritten/stripped:
# - suffix_map rewrites (.tgz -> .tar.gz, ...) match case-INsensitively,
# - encodings_map strips (.gz/.Z/.bz2/.xz/.br) match case-SENSITIVELY and
#   at most once — exactly guess_type's loop-then-single-strip order.
mimetypes.init()
_SUFFIX_MAP = dict(mimetypes.suffix_map)
_ENCODING_SUFFIXES = dict(mimetypes.encodings_map)


def _mime_map() -> Column:
    """Literal map: lower-cased extension (no dot) -> content type, from the
    module-level STRICT mimetypes table — the same table guess_type's
    default ``strict=True`` consults — so the bulk operator and the point
    API can never disagree."""
    pairs: dict[str, str] = {}
    for ext, ctype in mimetypes.types_map.items():
        pairs[ext.lstrip(".").lower()] = ctype
    return F.create_map(*[F.lit(x) for x in chain.from_iterable(pairs.items())])


def adjusted_path(path: Column | str) -> Column:
    """Strip a trailing ``-<32..40 hex>`` checksum from a path (reference
    fetcher.py:35-42); non-matching paths pass through."""
    c = F.col(path) if isinstance(path, str) else path
    stripped = F.regexp_extract(c, r"^(.+)-[0-9a-f]{32,40}?", 1)
    return F.when(stripped != "", stripped).otherwise(c)


def sniff_content(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
) -> DataFrame:
    """Add ``content_encoding`` (gzip magic on the binary header) and
    ``content_type`` (mimetypes lookup on the checksum-stripped path,
    name-encoding suffixes like ``.gz`` stripped first) columns."""
    adj = adjusted_path(path_col)
    # rewrite compound suffixes (.tgz -> .tar.gz, ...) — guess_type matches
    # these case-insensitively; one pass suffices because no stdlib
    # replacement is itself a suffix_map key
    for suf, repl in _SUFFIX_MAP.items():
        adj = F.when(
            F.lower(adj).endswith(suf.lower()),
            F.concat(
                adj.substr(F.lit(1), F.length(adj) - len(suf)), F.lit(repl)
            ),
        ).otherwise(adj)
    # strip AT MOST ONE trailing encoding suffix, case-sensitively, as
    # guess_type does ('.Z' strips, '.z' does not) — a single when-chain so
    # the first match wins and no second suffix is stripped
    stripped = None
    for suf in _ENCODING_SUFFIXES:
        cond = adj.endswith(suf)
        val = adj.substr(F.lit(1), F.length(adj) - len(suf))
        stripped = F.when(cond, val) if stripped is None else stripped.when(cond, val)
    adj = stripped.otherwise(adj)
    ext = F.lower(F.regexp_extract(adj, r"\.([A-Za-z0-9]+)$", 1))
    is_gzip = F.hex(F.col(content_col).substr(1, 3)) == "1F8B08"
    return df.withColumn(
        "content_encoding", F.when(is_gzip, F.lit("gzip"))
    ).withColumn(
        "content_type",
        F.when(ext != "", F.element_at(_mime_map(), ext)),
    )


def sniff_directory(spark, path: str) -> DataFrame:
    """Sniff every file under a directory via the binaryFile source —
    distributed scan, header-only logic, no Python."""
    files = spark.read.format("binaryFile").load(path)
    return sniff_content(files, content_col="content", path_col="path")
