"""QueryEngine — the reference's four query types as DataFrame builders.

Reference entry points (SURVEY.md §2/§3):
- time-interval query  api/datalake_api/querier.py:240-303   → by_time
- work-id query        api/datalake_api/querier.py:192-215   → by_work_id
- latest               api/datalake_api/querier.py:351-417   → latest
- point lookup by id   api/datalake_api/fetcher.py:70-91     → by_id

Everything is declarative DataFrame logic: Catalyst turns the interval
predicate into parquet row-group skipping plus (when the catalog is
partitioned by bucket_date) partition pruning; the reference's hand-written
bucket walk, cursor machine, and per-page dedup all disappear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datalake_spark.metadata import DAY_MS, InvalidDatalakeMetadata, normalize_date

# querier.py:36-44
DEFAULT_LOOKBACK_DAYS = 14
LATEST_MAX_LOOKFORWARD_MS = 24 * 60 * 60 * 1000
MAX_RESULTS = 100  # querier.py:28-33 (page size; we expose it as default limit)


class InvalidQuery(ValueError):
    """400-class validation error; ``code`` mirrors the reference's error
    contract (api/datalake_api/v0.py:153-177, pinned by
    api/tests/test_bad_queries.py:32-135)."""

    def __init__(self, code: str, message: str) -> None:
        super().__init__(message)
        self.code = code


def validate_query_params(params: dict) -> dict:
    """The reference's files-query validation (v0.py:143-177): ``what`` is
    required; exactly one of ``work_id`` or a (start, end) interval; times
    normalized to epoch-ms; start <= end.  Returns the normalized params.
    Runs driver-side before any plan is built — the engine's analysis-time
    error contract."""
    if not params:
        raise InvalidQuery("NoArgs", "Please provide query parameters.")
    if params.get("what") is None:
        raise InvalidQuery("NoWhat", "You must provide the what parameter.")
    work_id = params.get("work_id")
    start, end = params.get("start"), params.get("end")
    has_interval = start is not None or end is not None
    if work_id is None and not has_interval:
        raise InvalidQuery(
            "NoWorkInterval",
            "You must provide either work_id or start/end",
        )
    if work_id is not None and has_interval:
        raise InvalidQuery(
            "InvalidWorkInterval",
            "You must provide work_id or start/end. Not both.",
        )
    out = dict(params)
    if has_interval:
        if start is None or end is None:
            raise InvalidQuery(
                "NoWorkInterval", "start and end must be provided together"
            )
        try:
            out["start"], out["end"] = normalize_date(start), normalize_date(end)
        except InvalidDatalakeMetadata as e:
            raise InvalidQuery("InvalidTime", str(e)) from e
        if out["start"] > out["end"]:
            raise InvalidQuery("InvalidWorkInterval", "start must be before end")
    page = out.get("page")
    if page is not None and (not isinstance(page, int) or page < 0):
        raise InvalidQuery("InvalidCursor", f"invalid page {page!r}")
    return out


def interval_overlap(qstart, qend) -> F.Column:
    """The reference's overlap predicate incl. NULL-end = instant semantics
    (querier.py:286-303): [start, coalesce(end, start)] ∩ [qstart, qend] ≠ ∅.
    """
    return (F.col("start") <= F.lit(qend)) & (
        F.coalesce(F.col("end"), F.col("start")) >= F.lit(qstart)
    )


def bucket_prune(qstart: int, qend: int) -> F.Column:
    """Partition-prune helper: a file whose interval overlaps [qstart,qend]
    has bucket_date within [qstart_day - MAX_BUCKET_SPAN, qend_day] because
    intervals are bounded at 30 buckets (record.py:162-182).  Catalyst turns
    this into partition pruning on the (what, bucket_date) layout."""
    lo = F.date_sub(F.to_date(F.timestamp_millis(F.lit(qstart))), 30)
    hi = F.to_date(F.timestamp_millis(F.lit(qend)))
    return F.col("bucket_date").between(lo, hi)


class QueryEngine:
    def __init__(self, files: DataFrame, latest_table: DataFrame | None = None):
        self.files_df = files
        self._latest = latest_table
        self._has_bucket_date = "bucket_date" in files.columns

    # -- O1/O3: time-interval query ----------------------------------------
    def by_time(self, what: str, start, end, where: str | None = None) -> DataFrame:
        qstart, qend = normalize_date(start), normalize_date(end)
        df = self.files_df.filter(F.col("what") == what)
        if self._has_bucket_date:
            df = df.filter(bucket_prune(qstart, qend))
        df = df.filter(interval_overlap(qstart, qend))
        if where is not None:
            df = df.filter(F.col("where") == where)
        # global dedup by id — strictly stronger than the reference's
        # page-scoped dedup (querier.py:146-163, caveat v0.py:216-221)
        return df.dropDuplicates(["id"])

    # -- O2: work-id query --------------------------------------------------
    def by_work_id(self, work_id: str, what: str, where: str | None = None) -> DataFrame:
        df = self.files_df.filter(
            (F.col("work_id") == work_id) & (F.col("what") == what)
        )
        if where is not None:
            df = df.filter(F.col("where") == where)
        return df.dropDuplicates(["id"])

    # -- O4/O5: latest ------------------------------------------------------
    def latest(
        self,
        what: str,
        where: str,
        as_of=None,
        lookback_days: int = DEFAULT_LOOKBACK_DAYS,
    ) -> DataFrame:
        """Newest file for (what, where): max by (start, create_time), looking
        back ``lookback_days`` and rejecting records starting more than 24 h
        after ``as_of`` (querier.py:351-417).  Returns a 0-or-1-row frame.

        Fast path (O5, querier.py:355-379): when a materialized latest table
        is attached, probe it first — an O(1) point read of a tiny table —
        and fall back to the full scan only if the row is absent or starts
        beyond the 24 h lookforward cap."""
        now = normalize_date(as_of if as_of is not None else "now")
        if self._latest is not None:
            hit = self._latest.filter(
                (F.col("what_where_key") == f"{what}:{where}")
                & (F.col("start") <= F.lit(now + LATEST_MAX_LOOKFORWARD_MS))
            ).drop("what_where_key")
            if hit.limit(1).count() > 0:
                return hit
        lo = now - lookback_days * DAY_MS
        hi = now + LATEST_MAX_LOOKFORWARD_MS
        df = self.files_df.filter(
            (F.col("what") == what)
            & (F.col("where") == where)
            & (F.col("start") >= F.lit(lo))
            & (F.col("start") <= F.lit(hi))
        )
        cols = [c for c in df.columns]
        return (
            df.groupBy("what", "where")
            .agg(
                F.max_by(
                    F.struct(*cols), F.struct(F.col("start"), F.col("create_time"))
                ).alias("r")
            )
            .select("r.*")
        )

    def latest_all(self, as_of=None, lookback_days: int = DEFAULT_LOOKBACK_DAYS) -> DataFrame:
        """Bulk variant: latest per every (what, where) — the materialized
        latest table's full contents, computed with one shuffle."""
        now = normalize_date(as_of if as_of is not None else "now")
        lo = now - lookback_days * DAY_MS
        hi = now + LATEST_MAX_LOOKFORWARD_MS
        df = self.files_df.filter((F.col("start") >= lo) & (F.col("start") <= hi))
        cols = [c for c in df.columns]
        return (
            df.groupBy("what", "where")
            .agg(
                F.max_by(
                    F.struct(*cols), F.struct(F.col("start"), F.col("create_time"))
                ).alias("r")
            )
            .select("r.*")
        )

    # -- O11: point lookup --------------------------------------------------
    def by_id(self, file_id: str) -> DataFrame:
        return self.files_df.filter(F.col("id") == file_id).dropDuplicates(["id"])

    # -- O6: stable pagination emulation ------------------------------------
    def page(self, df: DataFrame, page: int = 0, page_size: int = MAX_RESULTS) -> DataFrame:
        """Deterministic pagination: row_number over (start, id) — replaces
        the reference's opaque resumable cursor (querier.py:54-143)."""
        w = Window.orderBy(F.col("start"), F.col("id"))
        rn = F.row_number().over(w)
        lo, hi = page * page_size, (page + 1) * page_size
        return (
            df.withColumn("_rn", rn)
            .filter((F.col("_rn") > lo) & (F.col("_rn") <= hi))
            .drop("_rn")
        )

    # -- O8/O9: projection + ISO enrichment ---------------------------------
    @staticmethod
    def unpack(df: DataFrame) -> DataFrame:
        """Response shape {url, metadata…, create_time, size} with ISO fields
        (v0.py:35-63): UTC, millisecond precision."""
        iso = "yyyy-MM-dd'T'HH:mm:ss.SSSXXX"
        return df.select(
            "url",
            "create_time",
            "size",
            "id",
            "what",
            "where",
            "start",
            "end",
            "work_id",
            "path",
            "hash",
            F.date_format(F.timestamp_millis(F.col("start")), iso).alias("start_iso"),
            F.when(
                F.col("end").isNotNull(),
                F.date_format(F.timestamp_millis(F.col("end")), iso),
            ).alias("end_iso"),
        )
