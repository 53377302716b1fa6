"""Datalake catalog-semantics queries (SURVEY.md §2.1 O1-O9) declared for the
oracle gate.

The driver's test tables carry no ``files`` fixture, so both sides derive the
same deterministic file-metadata view from ``events``:

    id          = event_id
    what        = event_type
    site        = 'u' || (user_id % 50)          («where» — SQL keyword)
    start_ms    = epoch-ms(ts)
    end_ms      = NULL when event_type='error' (instant file)
                  else start_ms + floor(value * 60000)   (value minutes)
    work_id     = NULL when k % 3 = 0 else 'w' || (k % 20),  k = props.$.k
    create_time = start_ms + event_id % 1000
    hash        = md5(event_id)

Then the reference's query semantics run against that view through the real
engine code (datalake_spark.query.QueryEngine), so the oracle gate covers the
production operators: interval-overlap incl. NULL-end (querier.py:286-303),
latest-by-(start,create_time) (querier.py:384-395), work-id lookup
(querier.py:192-215), and the day-bucket fan-out (record.py:171-192).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_spark.queries import Q, load
from datalake_spark.query import QueryEngine

_DAY_MS = 86400000

# Shared oracle CTE: must match files_from_events() column-for-column.
FILES_CTE = """
files AS (
  SELECT event_id AS id,
         event_type AS what,
         'u' || CAST(user_id % 50 AS VARCHAR) AS site,
         epoch_ms(ts) AS start_ms,
         CASE WHEN event_type = 'error' THEN NULL
              ELSE epoch_ms(ts) + CAST(FLOOR(value * 60000) AS BIGINT) END AS end_ms,
         CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) % 3 = 0 THEN NULL
              ELSE 'w' || CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 20 AS VARCHAR)
         END AS work_id,
         epoch_ms(ts) + event_id % 1000 AS create_time,
         md5(CAST(event_id AS VARCHAR)) AS hash
  FROM events
)
"""


def files_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        F.col("event_id").alias("id"),
        F.col("event_type").alias("what"),
        F.concat(F.lit("u"), (F.col("user_id") % 50).cast("string")).alias("site"),
        F.col("ts_ms").alias("start_ms"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("long"))
        .otherwise(
            F.col("ts_ms") + F.floor(F.col("value") * 60000).cast("long")
        )
        .alias("end_ms"),
        F.when(k % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("w"), (k % 20).cast("string")))
        .alias("work_id"),
        (F.col("ts_ms") + F.col("event_id") % 1000).alias("create_time"),
        F.md5(F.col("event_id").cast("string")).alias("hash"),
    )


def _engine(spark: SparkSession, sf_dir: str) -> QueryEngine:
    # QueryEngine expects reference column names (start/end/where); the view
    # uses SQL-safe aliases, so rename on the way in and back out.
    df = (
        files_from_events(spark, sf_dir)
        .withColumnRenamed("start_ms", "start")
        .withColumnRenamed("end_ms", "end")
        .withColumnRenamed("site", "where")
    )
    return QueryEngine(df)


def _out(df: DataFrame) -> DataFrame:
    return df.select(
        "id",
        "what",
        F.col("where").alias("site"),
        F.col("start").alias("start_ms"),
        F.col("end").alias("end_ms"),
        "work_id",
        "create_time",
        "hash",
    )


# -- O1/O3: time-interval query with NULL-end overlap semantics -------------
_Q_START = 1704672000000  # 2024-01-08T00:00:00Z
_Q_END = 1705276800000  # 2024-01-15T00:00:00Z


def dl_time_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return _out(eng.by_time("purchase", _Q_START, _Q_END))


DL_TIME_SQL = f"""
WITH {FILES_CTE}
SELECT id, what, site, start_ms, end_ms, work_id, create_time, hash
FROM files
WHERE what = 'purchase'
  AND start_ms <= {_Q_END}
  AND COALESCE(end_ms, start_ms) >= {_Q_START}
"""


def dl_time_interval_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return _out(eng.by_time("error", _Q_START, _Q_END, where="u7"))


DL_TIME_WHERE_SQL = f"""
WITH {FILES_CTE}
SELECT id, what, site, start_ms, end_ms, work_id, create_time, hash
FROM files
WHERE what = 'error' AND site = 'u7'
  AND start_ms <= {_Q_END}
  AND COALESCE(end_ms, start_ms) >= {_Q_START}
"""


# -- O2: work-id query ------------------------------------------------------
def dl_work_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return _out(eng.by_work_id("w7", "click"))


DL_WORK_ID_SQL = f"""
WITH {FILES_CTE}
SELECT id, what, site, start_ms, end_ms, work_id, create_time, hash
FROM files WHERE work_id = 'w7' AND what = 'click'
"""


# -- O4: latest per (what, site) with lookback/lookforward + tie-break ------
_AS_OF = 1706313600000  # 2024-01-27T00:00:00Z — inside the events range


def dl_latest_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return _out(eng.latest_all(as_of=_AS_OF))


# Bucket-walk semantics (querier.py:407-417): records fan out to every day
# bucket their interval spans; the walk goes newest-first from as_of's bucket
# down to the lookback floor, and within the newest non-empty bucket picks
# max (start, create_time).  Rank therefore leads with the newest bucket
# touched, capped at as_of's bucket.
_NOW_BUCKET = _AS_OF // _DAY_MS
_LO_BUCKET = (_AS_OF - 14 * _DAY_MS) // _DAY_MS

DL_LATEST_SQL = f"""
WITH {FILES_CTE}
SELECT id, what, site, start_ms, end_ms, work_id, create_time, hash
FROM (
  SELECT *, ROW_NUMBER() OVER (
            PARTITION BY what, site
            ORDER BY LEAST(COALESCE(end_ms, start_ms) // {_DAY_MS}, {_NOW_BUCKET}) DESC,
                     start_ms DESC, create_time DESC, id DESC) AS rn
  FROM files
  WHERE start_ms < {(_NOW_BUCKET + 1) * _DAY_MS}
    AND COALESCE(end_ms, start_ms) >= {_LO_BUCKET * _DAY_MS}
) WHERE rn = 1
"""


# -- bucket fan-out: the reference's DatalakeRecord explode (record.py:171-192)
def dl_bucket_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = files_from_events(spark, sf_dir)
    exploded = files.withColumn(
        "time_bucket",
        F.explode(
            F.sequence(
                (F.col("start_ms") / _DAY_MS).cast("long"),
                (F.coalesce(F.col("end_ms"), F.col("start_ms")) / _DAY_MS).cast("long"),
            )
        ),
    )
    return (
        exploded.groupBy("time_bucket", "what")
        .agg(F.count(F.lit(1)).alias("n_records"), F.countDistinct("id").alias("n_files"))
        .withColumn(
            "time_index_key",
            F.concat_ws(":", F.col("time_bucket"), F.col("what")),
        )
    )


DL_FANOUT_SQL = f"""
WITH {FILES_CTE},
exploded AS (
  SELECT f.*, CAST(b AS BIGINT) AS time_bucket
  FROM files f, UNNEST(generate_series(start_ms // {_DAY_MS},
                                       COALESCE(end_ms, start_ms) // {_DAY_MS})) AS t(b))
SELECT time_bucket, what, COUNT(*) AS n_records, COUNT(DISTINCT id) AS n_files,
       CAST(time_bucket AS VARCHAR) || ':' || what AS time_index_key
FROM exploded GROUP BY time_bucket, what
"""


# -- O9: ISO-8601 enrichment (v0.py:35-63) ----------------------------------
def dl_iso_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = files_from_events(spark, sf_dir).filter(F.col("what") == "signup")
    iso = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
    return files.select(
        "id",
        "start_ms",
        "end_ms",
        F.date_format(F.timestamp_millis(F.col("start_ms")), iso).alias("start_iso"),
        F.when(
            F.col("end_ms").isNotNull(),
            F.date_format(F.timestamp_millis(F.col("end_ms")), iso),
        ).alias("end_iso"),
    )


DL_ISO_SQL = f"""
WITH {FILES_CTE}
SELECT id, start_ms, end_ms,
       strftime(make_timestamp(start_ms * 1000), '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS start_iso,
       CASE WHEN end_ms IS NOT NULL
            THEN strftime(make_timestamp(end_ms * 1000), '%Y-%m-%dT%H:%M:%S.%g') || 'Z'
       END AS end_iso
FROM files WHERE what = 'signup'
"""


# -- O6: stable pagination emulation (querier.py:54-143 cursor machine) -----
def dl_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    hits = eng.by_time("click", _Q_START, _Q_END)
    return _out(eng.page(hits, page=1, page_size=100))


DL_PAGINATION_SQL = f"""
WITH {FILES_CTE},
hits AS (
  SELECT * FROM files
  WHERE what = 'click'
    AND start_ms <= {_Q_END}
    AND COALESCE(end_ms, start_ms) >= {_Q_START}),
numbered AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY start_ms, id) AS rn FROM hits)
SELECT id, what, site, start_ms, end_ms, work_id, create_time, hash
FROM numbered WHERE rn > 100 AND rn <= 200
"""


# -- O16: translate — regex extract-and-format DSL (translator.py:24-99) ----
_TRANSLATE_EXPR = r".*/(?P<site>[a-z0-9]+)/(?P<what>[a-z]+)-(?P<id>[0-9]+)\.gz$~{what}:{site}:{id}"
_TRANSLATE_RE_SQL = r".*/([a-z0-9]+)/([a-z]+)-([0-9]+)\.gz$"


def dl_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_spark.translator import Translator

    files = files_from_events(spark, sf_dir)
    path = F.concat(
        F.lit("/data/"),
        F.col("site"),
        F.lit("/"),
        F.col("what"),
        F.lit("-"),
        F.col("id").cast("string"),
        F.lit(".gz"),
    )
    t = Translator(_TRANSLATE_EXPR)
    return files.select(
        "id", path.alias("path"), t.column(path).alias("translated")
    )


DL_TRANSLATE_SQL = f"""
WITH {FILES_CTE},
p AS (
  SELECT id,
         '/data/' || site || '/' || what || '-' || CAST(id AS VARCHAR) || '.gz' AS path
  FROM files)
SELECT id, path,
       regexp_extract(path, '{_TRANSLATE_RE_SQL}', 2) || ':' ||
       regexp_extract(path, '{_TRANSLATE_RE_SQL}', 1) || ':' ||
       regexp_extract(path, '{_TRANSLATE_RE_SQL}', 3) AS translated
FROM p
"""


# -- O11: point lookup by id (fetcher.py:70-91) ------------------------------
def dl_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return _out(eng.by_id(42))


DL_POINT_SQL = f"""
WITH {FILES_CTE}
SELECT id, what, site, start_ms, end_ms, work_id, create_time, hash
FROM files WHERE id = 42
"""


# -- O14: fetch filename templating, bulk form (archive.py:317-394) ----------
_FETCH_TEMPLATE = "{what}/{site}/{start_iso}-{id}.log"


def dl_fetch_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch fan-out planning: for every file in a time slice, the storage
    url ({id}/data, archive.py:440) and the templated target filename —
    computed in the plan (filename_column), not a driver loop."""
    from datalake_spark.archive import filename_column

    eng = _engine(spark, sf_dir)
    hits = eng.by_time("purchase", _Q_START, _Q_END)
    iso = F.date_format(F.timestamp_millis(F.col("start")), "yyyy-MM-dd'T'HH:mm:ss.SSS")
    return hits.select(
        "id",
        F.concat(F.lit("file:///store/"), F.col("id").cast("string"), F.lit("/data")).alias("url"),
        filename_column(
            _FETCH_TEMPLATE,
            {
                "what": F.col("what"),
                "site": F.col("where"),
                "start_iso": iso,
                "id": F.col("id"),
            },
        ).alias("filename"),
    )


DL_FETCH_URLS_SQL = f"""
WITH {FILES_CTE}
SELECT id,
       'file:///store/' || CAST(id AS VARCHAR) || '/data' AS url,
       what || '/' || site || '/' ||
       strftime(make_timestamp(start_ms * 1000), '%Y-%m-%dT%H:%M:%S.%g') ||
       '-' || CAST(id AS VARCHAR) || '.log' AS filename
FROM files
WHERE what = 'purchase'
  AND start_ms <= {_Q_END}
  AND COALESCE(end_ms, start_ms) >= {_Q_START}
"""


# -- O11 content half + O21: bulk content-type / gzip sniffing ---------------
# Deterministic binary fixtures derived from doc_id: real magic bytes (gzip,
# png, pdf) and real extension paths, run through the production sniff
# operator; the oracle recomputes type/encoding from the same hex prefixes
# and paths independently in SQL.
_SNIFF_CASES = [
    # (hex-prefix, path suffix)
    ("1F8B0800000000000003", "data/file.json.gz"),
    ("68656C6C6F20776F726C64", "notes.txt"),
    ("3C68746D6C3E", "site/index.html"),
    ("89504E470D0A1A0A", "img/photo.png"),
    ("255044462D312E34", "docs/report.pdf"),
    ("61626364", "report.csv-" + "0123456789abcdef0123456789abcdef01234567"),
    ("1F8B0800000000000003", "blob.bin"),
    ("64617461", "README"),
]


def content_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_spark.operators.sniff import sniff_content

    docs = load(spark, sf_dir, "documents")
    k = F.col("doc_id") % len(_SNIFF_CASES)
    hexpr = F.coalesce(
        *[F.when(k == i, F.lit(h)) for i, (h, _) in enumerate(_SNIFF_CASES)]
    )
    path = F.coalesce(
        *[F.when(k == i, F.lit(p)) for i, (_, p) in enumerate(_SNIFF_CASES)]
    )
    staged = docs.select(
        "doc_id", F.unhex(hexpr).alias("content"), path.alias("path")
    )
    return sniff_content(staged).select(
        "doc_id", "path", "content_type", "content_encoding"
    )


def _sniff_sql_cases() -> str:
    hex_case = " ".join(
        f"WHEN {i} THEN '{h}'" for i, (h, _) in enumerate(_SNIFF_CASES)
    )
    path_case = " ".join(
        f"WHEN {i} THEN '{p}'" for i, (_, p) in enumerate(_SNIFF_CASES)
    )
    return (
        f"CASE doc_id % {len(_SNIFF_CASES)} {hex_case} END AS hex_content,\n"
        f"       CASE doc_id % {len(_SNIFF_CASES)} {path_case} END AS path"
    )


CONTENT_SNIFF_SQL = f"""
WITH staged AS (
  SELECT doc_id,
         {_sniff_sql_cases()}
  FROM documents),
adj AS (
  SELECT doc_id, path, hex_content,
         COALESCE(NULLIF(regexp_extract(path, '^(.+)-[0-9a-f]{{32,40}}?', 1), ''), path) AS apath
  FROM staged),
stripped AS (
  SELECT doc_id, path, hex_content,
         CASE WHEN lower(apath) LIKE '%.gz' THEN left(apath, length(apath) - 3)
              WHEN lower(apath) LIKE '%.bz2' THEN left(apath, length(apath) - 4)
              WHEN lower(apath) LIKE '%.xz' THEN left(apath, length(apath) - 3)
              ELSE apath END AS spath
  FROM adj)
SELECT doc_id, path,
       CASE lower(regexp_extract(spath, '\\.([A-Za-z0-9]+)$', 1))
            WHEN 'json' THEN 'application/json'
            WHEN 'txt' THEN 'text/plain'
            WHEN 'html' THEN 'text/html'
            WHEN 'png' THEN 'image/png'
            WHEN 'pdf' THEN 'application/pdf'
            WHEN 'csv' THEN 'text/csv'
            WHEN 'bin' THEN 'application/octet-stream'
            ELSE NULL END AS content_type,
       CASE WHEN hex_content LIKE '1F8B08%' THEN 'gzip' ELSE NULL END AS content_encoding
FROM stripped
"""


QUERIES = [
    Q("dl_time_interval", dl_time_interval, DL_TIME_SQL, "O1 interval overlap + NULL end"),
    Q("dl_time_interval_where", dl_time_interval_where, DL_TIME_WHERE_SQL, "O1+O3 with where filter"),
    Q("dl_work_id", dl_work_id, DL_WORK_ID_SQL, "O2 work-id lookup"),
    Q("dl_latest_all", dl_latest_all, DL_LATEST_SQL, "O4 latest per (what,where)"),
    Q("dl_bucket_fanout", dl_bucket_fanout, DL_FANOUT_SQL, "record.py bucket fan-out"),
    Q("dl_iso_enrichment", dl_iso_enrichment, DL_ISO_SQL, "O9 ISO timestamps"),
    Q("dl_pagination", dl_pagination, DL_PAGINATION_SQL, "O6 stable page slice"),
    Q("dl_point_lookup", dl_point_lookup, DL_POINT_SQL, "O11 point lookup by id"),
    Q("dl_translate", dl_translate, DL_TRANSLATE_SQL, "O16 regex translate DSL"),
    Q("dl_fetch_urls", dl_fetch_urls, DL_FETCH_URLS_SQL,
      "O14 fetch fan-out: urls + templated filenames in-plan"),
    Q("content_sniff", content_sniff, CONTENT_SNIFF_SQL,
      "O11/O21 bulk content-type + gzip sniffing"),
]


# ---------------------------------------------------------------------------
# dl_freshness — archive operational health: per producer (`what`), file
# counts, the instant-file share, ingest-lag percentiles (create_time -
# start), and work-id coverage.  The report every archive operator watches;
# the reference exposes the raw ingestion reports (README "Datalake
# Ingester Report Format") but leaves aggregation to the reader — here it
# is one exact-percentile agg over the files view, broadcast-free.
# ---------------------------------------------------------------------------
def dl_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    files = files_from_events(spark, sf_dir)
    files.createOrReplaceTempView("dl_files_v")
    return spark.sql(
        """
        SELECT what,
               CAST(COUNT(*) AS BIGINT) AS n_files,
               CAST(SUM(CASE WHEN end_ms IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_instant,
               ROUND(percentile(create_time - start_ms, 0.5), 4) AS p50_lag_ms,
               ROUND(percentile(create_time - start_ms, 0.99), 4) AS p99_lag_ms,
               CAST(MAX(create_time - start_ms) AS BIGINT) AS max_lag_ms,
               CAST(SUM(CASE WHEN work_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS work_id_share
        FROM dl_files_v GROUP BY what
        """
    )


DL_FRESHNESS_SQL = f"""
WITH {FILES_CTE}
SELECT what,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN end_ms IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_instant,
       ROUND(quantile_cont(create_time - start_ms, 0.5), 4) AS p50_lag_ms,
       ROUND(quantile_cont(create_time - start_ms, 0.99), 4) AS p99_lag_ms,
       CAST(MAX(create_time - start_ms) AS BIGINT) AS max_lag_ms,
       CAST(SUM(CASE WHEN work_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS work_id_share
FROM files GROUP BY what
"""
