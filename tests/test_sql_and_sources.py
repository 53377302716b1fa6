"""spark.sql() parity registration (sql.py) and source-format coverage:
CSV and JSON round-trips with explicit schemas, binaryFile ingestion through
the multimodal reader, blake2b/translate/chunker reachable from SQL text."""

from __future__ import annotations

import hashlib
import os

import pytest

from pyspark.sql import functions as F

from datalake_spark import sql as dsql
from datalake_spark.catalog import Catalog
from datalake_spark.ingest import hash_content
from datalake_spark.operators.multimodal import read_binary_dir


class TestSqlRegistration:
    def test_blake2b_from_sql(self, spark):
        dsql.register_functions(spark)
        [row] = spark.sql("SELECT blake2b16('hello') AS h").collect()
        assert row["h"] == hashlib.blake2b(b"hello", digest_size=16).hexdigest()

    def test_translate_from_sql(self, spark):
        dsql.register_functions(spark)
        [row] = spark.sql(
            r"SELECT dl_translate('/x/job-77.log', '.*job-(?P<jid>[0-9]+)\\.log$~job{jid}') AS t"
        ).collect()
        assert row["t"] == "job77"

    def test_chunker_from_sql(self, spark):
        dsql.register_functions(spark)
        rows = spark.sql(
            "SELECT * FROM token_chunker('a b c d e', 2, 0)"
        ).collect()
        assert [r["chunk"] for r in rows] == ["a b", "c d", "e"]

    def test_catalog_views(self, spark, tmp_path):
        from tests.test_query_engine import make_files_df

        cat = Catalog(spark, str(tmp_path))
        cat.append(
            make_files_df(
                spark,
                [{"id": "v1", "what": "nginx", "where": "h1",
                  "start": 1420070400000, "end": 1420070400000 + 86400001}],
            )
        )
        cat.refresh_latest()
        dsql.register_catalog(spark, cat)
        assert spark.sql("SELECT COUNT(*) n FROM files").collect()[0]["n"] == 1
        assert spark.sql("SELECT COUNT(*) n FROM latest").collect()[0]["n"] == 1
        # bucket fan-out view: 2-day span -> 2 rows with composite keys
        rows = spark.sql(
            "SELECT time_index_key, range_key FROM file_buckets ORDER BY time_index_key"
        ).collect()
        assert len(rows) == 2
        assert all(r["range_key"] == "h1:v1" for r in rows)


class TestSources:
    def test_csv_roundtrip(self, spark, tmp_path):
        src = spark.createDataFrame(
            [(1, "a,b", 1.5), (2, None, -3.25)], "id long, s string, v double"
        )
        path = str(tmp_path / "csv")
        src.write.mode("overwrite").option("header", True).csv(path)
        back = (
            spark.read.schema("id long, s string, v double")
            .option("header", True)
            .csv(path)
        )
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))

    def test_json_roundtrip(self, spark, tmp_path):
        src = spark.createDataFrame(
            [(1, {"k": "x"}, [1, 2]), (2, None, [])],
            "id long, m map<string,string>, a array<int>",
        )
        path = str(tmp_path / "json")
        src.write.mode("overwrite").json(path)
        back = spark.read.schema("id long, m map<string,string>, a array<int>").json(path)
        got = {r["id"]: (r["m"], r["a"]) for r in back.collect()}
        assert got[1] == ({"k": "x"}, [1, 2])
        assert got[2] == (None, [])

    def test_orc_roundtrip_with_pushdown(self, spark, tmp_path):
        """ORC is a first-class source: typed roundtrip plus predicate
        pushdown reaching the scan (the same columnar-skipping contract
        the parquet catalog relies on)."""
        src = spark.createDataFrame(
            [(i, f"s{i}", float(i) / 4) for i in range(100)],
            "id long, s string, v double",
        )
        path = str(tmp_path / "orc")
        src.write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
        filtered = back.filter(F.col("id") == 7).select("s")
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(id), EqualTo(id,7)]" in plan
        assert [r["s"] for r in filtered.collect()] == ["s7"]

    def test_binaryfile_ingest_and_hash(self, spark, tmp_path):
        media_dir = tmp_path / "media"
        os.makedirs(media_dir)
        payload = b"\x89PNG fake image bytes"
        (media_dir / "img1.png").write_bytes(payload)
        (media_dir / "img2.png").write_bytes(b"other")
        df = read_binary_dir(spark, str(media_dir), glob="*.png")
        hashed = hash_content(df)
        got = {r["media_id"]: (r["content"], r["hash"]) for r in hashed.collect()}
        assert bytes(got["img1.png"][0]) == payload
        assert got["img1.png"][1] == hashlib.blake2b(payload, digest_size=16).hexdigest()
        assert set(got) == {"img1.png", "img2.png"}

    def test_json_corrupt_records_permissive(self, spark, tmp_path):
        """Malformed JSON rows land in _corrupt_record instead of failing
        the scan — the at-scale contract for dirty landing dirs."""
        p = tmp_path / "dirty"
        os.makedirs(p)
        (p / "a.json").write_text('{"id": 1, "v": "ok"}\n{broken\n{"id": 3}\n')
        df = spark.read.schema(
            "id long, v string, _corrupt_record string"
        ).json(str(p))
        rows = df.collect()
        good = {r["id"]: r["v"] for r in rows if r["_corrupt_record"] is None}
        bad = [r for r in rows if r["_corrupt_record"] is not None]
        assert good == {1: "ok", 3: None}
        assert len(bad) == 1 and "{broken" in bad[0]["_corrupt_record"]

    def test_json_dropmalformed_mode(self, spark, tmp_path):
        p = tmp_path / "dirty2"
        os.makedirs(p)
        (p / "a.json").write_text('{"id": 1}\nnonsense\n{"id": 2}\n')
        df = spark.read.schema("id long").option(
            "mode", "DROPMALFORMED"
        ).json(str(p))
        assert sorted(r["id"] for r in df.collect()) == [1, 2]


class TestZOrder:
    """Z-order clustering (functions/zorder.py): Morton-interleaved
    layout localizes per-file min/max on EVERY participating column."""

    def test_morton_key_matches_model(self, spark):
        from pyspark.sql import functions as F

        from datalake_spark.functions.zorder import morton_key

        rows = [(x, y) for x in range(8) for y in range(8)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {
            (r["x"], r["y"]): r["z"]
            for r in df.select(
                "x", "y",
                morton_key([F.col("x"), F.col("y")], bits=3).alias("z"),
            ).collect()
        }

        def model(x, y, bits=3):
            z = 0
            for b in range(bits):
                z |= ((x >> b) & 1) << (2 * b)
                z |= ((y >> b) & 1) << (2 * b + 1)
            return z

        assert got == {(x, y): model(x, y) for x, y in rows}

    @staticmethod
    def _per_file_span(spark, path, col, lo, hi):
        """Mean fraction of [lo, hi] covered by each parquet part file."""
        import glob

        fracs = []
        for p in sorted(glob.glob(f"{path}/part-*.parquet")):
            r = spark.read.parquet(p).agg(
                {col: "min"}
            ).collect()[0][0], spark.read.parquet(p).agg(
                {col: "max"}
            ).collect()[0][0]
            fracs.append((r[1] - r[0]) / (hi - lo))
        return sum(fracs) / len(fracs)

    def test_layout_localizes_both_dimensions(self, spark, tmp_path):
        import random

        from datalake_spark.functions.zorder import zorder_frame

        rng = random.Random(7)
        rows = [
            (i, rng.randrange(100_000), rng.randrange(100_000))
            for i in range(40_000)
        ]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        naive = str(tmp_path / "naive")
        zpath = str(tmp_path / "zorder")
        # naive: cluster on x only
        df.repartitionByRange(16, "x").sortWithinPartitions("x") \
            .write.parquet(naive)
        zorder_frame(df, ["x", "y"], num_files=16).write.parquet(zpath)
        # same rows survive the rewrite
        assert spark.read.parquet(zpath).count() == 40_000
        a = spark.read.parquet(zpath).agg({"id": "sum"}).collect()[0][0]
        assert a == sum(r[0] for r in rows)
        # naive layout: x localized, y useless (each file spans ~all of y)
        assert self._per_file_span(spark, naive, "x", 0, 100_000) < 0.15
        assert self._per_file_span(spark, naive, "y", 0, 100_000) > 0.9
        # z-order: BOTH dimensions localized — 16 partitions ~= 2 bit
        # levels per dimension, so each file covers ~1/4 of each axis
        zx = self._per_file_span(spark, zpath, "x", 0, 100_000)
        zy = self._per_file_span(spark, zpath, "y", 0, 100_000)
        assert zx < 0.6 and zy < 0.6, (zx, zy)

    def test_key_fits_and_guards(self, spark):
        import pytest as _pytest

        from datalake_spark.functions.zorder import zorder_frame

        df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
        with _pytest.raises(ValueError):
            zorder_frame(df, ["a", "b", "c"], bits=22)
        # constant column (span 0) must not divide by zero
        out = zorder_frame(
            spark.createDataFrame([(5, 1), (5, 2)], "a long, b long"),
            ["a", "b"], num_files=1,
        ).collect()
        assert len(out) == 2


class TestRuntimeFilters:
    """Catalyst's runtime-filter arsenal is ON and firing for the
    engine's plan shapes — these pin the config so a future session
    tweak cannot silently disable 100 TB-critical optimizations."""

    def test_bloom_filter_injected_for_selective_fact_join(self, spark):
        """A selective dim filter on a fact join should inject a runtime
        Bloom filter on the fact side (semi-join reduction before the
        shuffle). Thresholds are lowered in-test: the sf0.01 tables are
        far below the 10 MB/10 GB production defaults."""
        conf = spark.conf
        saved = {
            k: conf.get(k)
            for k in (
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
                "spark.sql.autoBroadcastJoinThreshold",
            )
        }
        try:
            conf.set(
                "spark.sql.optimizer.runtime.bloomFilter."
                "applicationSideScanSizeThreshold", "0")
            # force a shuffle join: broadcast joins don't need the filter
            conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            fact = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
            dim = spark.read.parquet(
                "/root/testdata/sf0.01/orders.parquet"
            ).filter("o_orderpriority = '1-URGENT'")
            plan = (
                fact.join(dim, fact.l_orderkey == dim.o_orderkey)
                ._jdf.queryExecution().optimizedPlan().toString()
            )
            assert "bloom" in plan.lower(), plan[:2000]
        finally:
            for k, v in saved.items():
                conf.set(k, v)

    # NB dynamic partition pruning is enabled in the session (the
    # default), but deliberately NOT plan-pinned here: on gate-sized data
    # Catalyst's pruningHasBenefit heuristic correctly declines to inject
    # the subquery (the fact scan is tiny), and forcing it with conf
    # overrides would pin the override, not the engine.  Static partition
    # pruning — the path the catalog's queries actually ride — is pinned
    # in tests/test_bucketing.py.
