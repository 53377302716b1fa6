"""Column-expression twins of the metadata time semantics (metadata.py) for
distributed use: the s-vs-ms heuristic, day-bucket math, and ISO-8601
rendering — so bulk ingest normalizes timestamps JVM-side instead of looping
rows through the driver-side ``normalize_date``.

Agreement with the Python implementations is pinned by
tests/test_properties.py::TestColumnTwins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from datalake_spark.metadata import DAY_MS, MS_CUTOFF

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_epoch_col(col: Column | str) -> Column:
    """Numeric input → epoch-ms: values above the 1e11 cutoff are already
    milliseconds, below are seconds (metadata.py:26-28, :196-203)."""
    c = _c(col).cast("double")
    return (
        F.when(c > F.lit(float(MS_CUTOFF)), F.round(c))
        .otherwise(F.round(c * 1000))
        .cast("long")
    )


def time_bucket_col(ms_col: Column | str) -> Column:
    """Day-bucket index (record.py:151-160); floor division in bigint."""
    return (_c(ms_col) / F.lit(DAY_MS)).cast("long")


def bucket_span_col(start_ms: Column | str, end_ms: Column | str) -> Column:
    """Inclusive bucket count of [start, coalesce(end, start)]
    (record.py:184-192)."""
    end = F.coalesce(_c(end_ms), _c(start_ms))
    return (time_bucket_col(end) - time_bucket_col(_c(start_ms)) + 1).cast("int")


def iso8601_col(ms_col: Column | str) -> Column:
    """UTC ISO-8601 with millisecond precision (v0.py:35-63); NULL-safe."""
    c = _c(ms_col)
    return F.when(
        c.isNotNull(), F.date_format(F.timestamp_millis(c), ISO_FMT)
    )
