"""CLI parity tests (O13/O22/O23): push → list → latest round-trip through
the real catalog, output formats, env-config cascade, error contract."""

from __future__ import annotations

import io
import json

import pytest

from datalake_spark.cli import run
from datalake_spark.query import InvalidQuery


@pytest.fixture()
def catalog_dir(tmp_path):
    return str(tmp_path / "catalog")


def _run(spark, argv, catalog):
    out = io.StringIO()
    rc = run(["--catalog", catalog, *argv], spark=spark, out=out)
    return rc, out.getvalue().splitlines()


class TestAnnCli:
    """The standing IVF-PQ index operated end-to-end through the CLI:
    build → append → search → rebuild → search, manifests printed as
    JSON, append --epoch required (the idempotency contract)."""

    def test_lifecycle_through_cli(self, spark, catalog_dir, tmp_path):
        from datalake_spark.queries import load

        emb = load(spark, "/root/testdata/sf0.001", "embeddings")
        base = str(tmp_path / "base_vecs")
        extra = str(tmp_path / "extra_vecs")
        queries = str(tmp_path / "q_vecs")
        emb.filter("vec_id >= 3 and vec_id < 200").write.parquet(base)
        emb.filter("vec_id >= 200 and vec_id < 260").write.parquet(extra)
        emb.filter("vec_id < 3").write.parquet(queries)
        root = str(tmp_path / "annidx")

        rc, lines = _run(
            spark,
            ["ann", "build", root, base,
             "--num-centroids", "8", "--m", "16", "--ksub", "16"],
            catalog_dir,
        )
        assert rc == 0
        man = json.loads(lines[0])
        assert man["version"] == 1 and man["epochs"] == [0]
        assert man["m"] == 16 and man["ids_buckets"] == 64

        rc, lines = _run(
            spark, ["ann", "append", root, extra, "--epoch", "1"],
            catalog_dir,
        )
        assert rc == 0
        assert json.loads(lines[0])["epochs"] == [0, 1]

        rc, lines = _run(
            spark,
            ["ann", "search", root, queries, "--k", "3", "--nprobe", "3"],
            catalog_dir,
        )
        assert rc == 0
        hits = [json.loads(ln) for ln in lines]
        assert len(hits) == 9  # 3 queries x k=3
        assert {h["rk"] for h in hits} == {1, 2, 3}

        allv = str(tmp_path / "all_vecs")
        emb.write.parquet(allv)
        rc, lines = _run(spark, ["ann", "rebuild", root, allv], catalog_dir)
        assert rc == 0
        man = json.loads(lines[0])
        assert man["version"] == 3 and man["epochs"] == [0, 1]
        assert man["m"] == 16  # geometry comes from the manifest

        rc, lines = _run(
            spark,
            ["ann", "search", root, queries, "--k", "3", "--nprobe", "3"],
            catalog_dir,
        )
        assert rc == 0 and len(lines) == 9

    def test_append_requires_epoch(self, spark, catalog_dir, tmp_path):
        with pytest.raises(SystemExit) as e:
            _run(spark, ["ann", "append", str(tmp_path / "r"),
                         str(tmp_path / "v")], catalog_dir)
        assert e.value.code == 2

    @pytest.mark.parametrize(
        "argv",
        [
            # --epoch only applies to append
            ["ann", "build", "R", "V", "--epoch", "2"],
            ["ann", "rebuild", "R", "V", "--epoch", "2"],
            ["ann", "search", "R", "V", "--epoch", "2"],
            # probe flags only apply to search
            ["ann", "build", "R", "V", "--k", "3"],
            ["ann", "append", "R", "V", "--epoch", "1", "--nprobe", "2"],
            ["ann", "rebuild", "R", "V", "--k", "3"],
            # geometry follows the manifest on append/search
            ["ann", "append", "R", "V", "--epoch", "1", "--m", "8"],
            ["ann", "search", "R", "V", "--ids-buckets", "8"],
            ["ann", "search", "R", "V", "--residual"],
        ],
    )
    def test_verb_irrelevant_flags_error(
        self, spark, catalog_dir, argv, tmp_path
    ):
        """A flag that only applies to another verb must error, not be
        silently parsed and ignored ('ann build --epoch 2' used to give
        no feedback that the flag did nothing)."""
        argv = [
            str(tmp_path / "r") if a == "R"
            else str(tmp_path / "v") if a == "V" else a
            for a in argv
        ]
        with pytest.raises(SystemExit) as e:
            _run(spark, argv, catalog_dir)
        assert e.value.code == 2


class TestCompactAndVersions:
    def test_compact_then_versions(self, spark, catalog_dir):
        rc, _ = _run(
            spark,
            ["push", "--what", "nginx", "--where", "w1", "--path",
             "/var/log/nginx.log", "--start", "2015-01-01",
             "--end", "2015-01-02"],
            catalog_dir,
        )
        assert rc == 0
        rc, lines = _run(spark, ["compact"], catalog_dir)
        assert rc == 0 and lines[0].startswith("v1 ")
        rc, lines = _run(spark, ["versions"], catalog_dir)
        assert rc == 0 and len(lines) >= 1
        # z-order layout pass commits a new version, rows intact
        rc, lines = _run(spark, ["compact", "--layout", "zorder"], catalog_dir)
        assert rc == 0 and lines[0].startswith("v2 ")
        rc, lines = _run(
            spark,
            ["list", "nginx", "--start", "2015-01-01", "--end", "2015-01-03"],
            catalog_dir,
        )
        assert rc == 0 and len(lines) == 1


class TestCliRoundtrip:
    def test_push_list_latest(self, spark, catalog_dir):
        rc, [fid] = _run(
            spark,
            [
                "push",
                "--what", "nginx",
                "--where", "web01",
                "--start", "2015-01-01",
                "--end", "2015-01-02",
                "--path", "/var/log/nginx/access.log",
            ],
            catalog_dir,
        )
        assert rc == 0 and len(fid) == 32

        rc, lines = _run(
            spark,
            ["list", "nginx", "--start", "2015-01-01", "--end", "2015-01-03"],
            catalog_dir,
        )
        assert rc == 0
        assert lines == [f"s3://datalake/{fid}/data"]

        rc, lines = _run(
            spark, ["latest", "nginx", "web01", "--as-of", "2015-01-05", "--format", "json"], catalog_dir
        )
        assert rc == 0
        rec = json.loads(lines[0])
        assert rec["id"] == fid and rec["start"] == 1420070400000

    def test_push_translation_and_work_id_query(self, spark, catalog_dir):
        rc, [fid] = _run(
            spark,
            [
                "push",
                "--what", "job",
                "--where", "w1",
                "--start", "2015-06-01",
                "--end", "2015-06-01",
                "--path", "/var/log/app/job-4321.log",
                "--translate", r"work_id=.*job-(?P<jid>[0-9]+)\.log$~job{jid}",
            ],
            catalog_dir,
        )
        assert rc == 0
        rc, lines = _run(
            spark,
            ["list", "job", "--work-id", "job4321", "--format", "human"],
            catalog_dir,
        )
        assert rc == 0 and len(lines) == 1
        assert "work_id: job4321" in lines[0]

    def test_latest_empty_archive(self, spark, catalog_dir, tmp_path):
        # push something unrelated so the catalog exists
        _run(
            spark,
            [
                "push", "--what", "a", "--where", "b",
                "--start", "2015-01-01", "--end", "2015-01-01",
                "--path", "/x",
            ],
            catalog_dir,
        )
        rc, lines = _run(spark, ["latest", "nope", "nowhere", "--as-of", "2015-01-05"], catalog_dir)
        assert rc == 1 and lines == ["null"]

    def test_list_error_contract(self, spark, catalog_dir):
        with pytest.raises(InvalidQuery) as e:
            _run(spark, ["list", "nginx"], catalog_dir)
        assert e.value.code == "NoWorkInterval"

    def test_env_default_where(self, spark, catalog_dir, monkeypatch):
        monkeypatch.setenv("DATALAKE_DEFAULT_WHERE", "envhost")
        rc, [fid] = _run(
            spark,
            [
                "push", "--what", "syslog",
                "--start", "2015-02-01", "--end", "2015-02-01",
                "--path", "/var/log/syslog",
            ],
            catalog_dir,
        )
        assert rc == 0
        rc, lines = _run(
            spark, ["latest", "syslog", "envhost", "--as-of", "2015-02-02", "--format", "json"], catalog_dir
        )
        assert rc == 0 and json.loads(lines[0])["id"] == fid


def test_cli_translate(capsys):
    """Reference cli `translate <expression> <file>` — pure string work,
    no SparkSession spin-up."""
    import io

    from datalake_spark.cli import run

    out = io.StringIO()
    rc = run(
        ["translate",
         r".*/(?P<where>.*)/(?P<what>.*)-(?P<num>\d+)\.log~{what}:{where}:{num}",
         "/var/log/web01/nginx-123.log"],
        out=out,
    )
    assert rc == 0
    assert out.getvalue().strip() == "nginx:web01:123"


class TestConditionalCompact:
    def test_if_over_skips_then_runs(self, spark, catalog_dir):
        for i in range(3):
            rc, _ = _run(
                spark,
                ["push", "--what", "nginx", "--where", f"w{i}", "--path",
                 "/var/log/nginx.log", "--start", "2015-01-01"],
                catalog_dir,
            )
            assert rc == 0
        # 3 appends -> 3 files in the partition; threshold 16 skips
        rc, lines = _run(spark, ["compact", "--if-over", "16"], catalog_dir)
        assert rc == 0 and lines[0] == "compacted: False"
        rc, lines = _run(spark, ["compact", "--if-over", "2"], catalog_dir)
        assert rc == 0 and lines[0] == "compacted: True"


class TestCurateCommand:
    def test_curate_writes_shards_and_manifest(self, spark, catalog_dir, tmp_path):
        src = str(tmp_path / "docs")
        outdir = str(tmp_path / "shards")
        rows = []
        for i in range(30):
            body = " ".join(f"the c{i}w{j} a c{i}v{j}" for j in range(8))
            rows.append((i, f"doc {i} starts the piece here {body}", "en"))
        rows.append((99, "the a short", "en"))  # dropped by length band
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).write.parquet(src)
        rc, lines = _run(
            spark,
            ["curate", src, outdir, "--n-shards", "4", "--strategy", "minhash"],
            catalog_dir,
        )
        assert rc == 0
        manifest = json.loads(lines[0])
        assert manifest["curation"]["n_input"] == 31
        assert manifest["curation"]["n_kept"] == 30
        back = spark.read.parquet(outdir)
        assert back.count() == 30
        assert "shard" in back.columns


    def test_curate_semantic_strategy(self, spark, catalog_dir, tmp_path):
        """--strategy semantic + --embeddings: SemDeDup through the CLI —
        docs whose embeddings point the same way dedup, the rest (and
        docs without vectors) survive."""
        src = str(tmp_path / "docs3")
        embp = str(tmp_path / "emb3")
        outdir = str(tmp_path / "shards3")
        rows = []
        for i in range(6):
            body = " ".join(f"the c{i}w{j} a c{i}v{j}" for j in range(8))
            rows.append((i, f"doc {i} starts the piece here {body}", "en"))
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).write.parquet(src)
        # 0 and 2 are exact-direction duplicates; 1 and 3 point well
        # apart; 4, 5 have no vectors at all -> pass through
        spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0]),
             (2, [2.0, 0.0]), (3, [1.0, 1.0])],
            "doc_id long, embedding array<double>",
        ).write.parquet(embp)
        rc, lines = _run(
            spark,
            ["curate", src, outdir, "--n-shards", "2",
             "--strategy", "semantic", "--embeddings", embp,
             "--semantic-k", "2", "--threshold", "0.9999"],
            catalog_dir,
        )
        assert rc == 0
        manifest = json.loads(lines[0])
        assert manifest["curation"]["n_kept"] == 5  # doc 2 deduped onto 0
        back = spark.read.parquet(outdir)
        assert {r["doc_id"] for r in back.collect()} == {0, 1, 3, 4, 5}

    def test_curate_semantic_requires_embeddings(
        self, spark, catalog_dir, tmp_path
    ):
        src = str(tmp_path / "docs4")
        spark.createDataFrame(
            [(0, "a text", "en")], "doc_id long, text string, lang string"
        ).write.parquet(src)
        rc, lines = _run(
            spark,
            ["curate", src, str(tmp_path / "out4"), "--strategy", "semantic"],
            catalog_dir,
        )
        assert rc == 2 and "requires --embeddings" in lines[0]

    def test_curate_with_benchmark_decontaminates(
        self, spark, catalog_dir, tmp_path
    ):
        """--benchmark drops corpus docs sharing an n-gram with the eval
        set and attributes them in the quarantine as 'contaminated'."""
        src = str(tmp_path / "docs2")
        bench = str(tmp_path / "bench")
        outdir = str(tmp_path / "shards2")
        quar = str(tmp_path / "quar2")
        leak = "the alpha a beta the gamma a delta the epsilon"
        rows = []
        for i in range(10):
            body = " ".join(f"the c{i}w{j} a c{i}v{j}" for j in range(8))
            rows.append((i, f"doc {i} starts the piece here {body}", "en"))
        rows.append((50, f"an exam question leaked {leak} into the corpus "
                         "and the a filler words pad the length band here "
                         "nicely today", "en"))
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).write.parquet(src)
        spark.createDataFrame(
            [(0, f"eval prompt {leak} with its answer")],
            "doc_id long, text string",
        ).write.parquet(bench)
        rc, lines = _run(
            spark,
            ["curate", src, outdir, "--n-shards", "2",
             "--benchmark", bench, "--decon-n", "5",
             "--quarantine", quar],
            catalog_dir,
        )
        assert rc == 0
        manifest = json.loads(lines[0])
        assert manifest["curation"]["n_kept"] == 10
        stages = {
            r["doc_id"]: r["drop_stage"]
            for r in spark.read.parquet(quar).collect()
        }
        assert stages[50] == "contaminated"
        back = spark.read.parquet(outdir)
        assert back.filter("doc_id = 50").count() == 0

    def test_curate_lm_quality_threshold(self, spark, catalog_dir,
                                         tmp_path):
        """--quality-lm-threshold + --lm-reference: the CCNet-style LM
        stage drops the OOV-junk doc and attributes it in the quarantine
        as 'low_lm_quality' (r11, operators/lm through the CLI)."""
        from datalake_spark.operators.lm import lm_score, lm_train

        src = str(tmp_path / "docs_lm")
        refp = str(tmp_path / "lmref")
        outdir = str(tmp_path / "shards_lm")
        quar = str(tmp_path / "quar_lm")
        rows = []
        for i in range(10):
            # unique per-doc body REPEATED so its bigrams recur in the
            # reference twin (seen-k-times >> add-1 OOV floor)
            body = " ".join(f"the cat{i} sat on a mat{i}" for _ in range(6))
            rows.append((i, f"doc {i} starts the piece here {body}", "en"))
        # junk: rule-passing length/stopwords, but every bigram is
        # unseen by the reference model -> scores near the OOV floor
        rows.append((50, " ".join(f"the zz{j} a yy{j}" for j in range(6)),
                     "en"))
        corpus = spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )
        corpus.write.parquet(src)
        ref = spark.createDataFrame(
            [(900 + i, t) for (i, t, _l) in rows[:10]],
            "doc_id long, text string",
        )
        ref.write.parquet(refp)
        # e2e with a threshold computed the way a user would: score the
        # corpus against the trained model, split good from junk
        scores = {r["doc_id"]: r["lm_score_micro"]
                  for r in lm_score(corpus, lm_train(ref)).collect()}
        good_floor = min(scores[i] for i in range(10))
        assert scores[50] < good_floor  # the signal exists at all
        thr = (scores[50] + good_floor) // 2
        rc, lines = _run(
            spark,
            ["curate", src, outdir, "--n-shards", "2",
             "--quality-lm-threshold", str(thr),
             "--lm-reference", refp,
             "--quarantine", quar],
            catalog_dir,
        )
        assert rc == 0
        manifest = json.loads(lines[0])
        assert manifest["curation"]["n_kept"] == 10
        stages = {
            r["doc_id"]: r["drop_stage"]
            for r in spark.read.parquet(quar).collect()
        }
        assert stages[50] == "low_lm_quality"
        assert spark.read.parquet(outdir).filter("doc_id = 50").count() == 0

    def test_curate_dsir_selection(self, spark, catalog_dir, tmp_path):
        """--dsir-target + --dsir-top-n: the DSIR importance-selection
        stage keeps the target-like docs and quarantines the rest as
        'dsir_unselected' (r11, operators/dsir through the CLI)."""
        src = str(tmp_path / "docs_dsir")
        tgt = str(tmp_path / "dsir_tgt")
        outdir = str(tmp_path / "shards_dsir")
        quar = str(tmp_path / "quar_dsir")
        rows = []
        for i in range(8):
            body = " ".join(
                f"the science{i} paper a result{i}" for _ in range(6)
            )
            rows.append((i, body, "en"))
        # off-target: rule-passing but feature-disjoint from the target
        # (distinct per doc — identical texts would fall to the
        # canonicality rule before DSIR ever sees them)
        for i in (50, 51):
            rows.append(
                (i, " ".join(f"the spam{i}x{j} a promo{i}x{j}"
                             for j in range(6)),
                 "en"))
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).write.parquet(src)
        spark.createDataFrame(
            [(900 + i, t) for (i, t, _l) in rows[:8]],
            "doc_id long, text string",
        ).write.parquet(tgt)
        rc, lines = _run(
            spark,
            ["curate", src, outdir, "--n-shards", "2",
             "--dsir-target", tgt, "--dsir-top-n", "8",
             "--quarantine", quar],
            catalog_dir,
        )
        assert rc == 0
        manifest = json.loads(lines[0])
        assert manifest["curation"]["n_kept"] == 8
        stages = {
            r["doc_id"]: r["drop_stage"]
            for r in spark.read.parquet(quar).collect()
        }
        assert stages == {50: "dsir_unselected", 51: "dsir_unselected"}
        assert spark.read.parquet(outdir).filter(
            "doc_id >= 50").count() == 0

    def test_curate_dsir_flags_must_pair(self, spark, catalog_dir,
                                         tmp_path):
        """r11 advisor: --dsir-target without --dsir-top-n (or vice
        versa) used to silently skip the stage after reading the target
        parquet — now a parser-level error."""
        import pytest

        src = str(tmp_path / "docs_pair")
        spark.createDataFrame(
            [(1, "the a b c d e", "en")],
            "doc_id long, text string, lang string",
        ).write.parquet(src)
        for extra in (["--dsir-target", src],
                      ["--dsir-top-n", "3"],
                      ["--dsir-after-dedup"]):
            with pytest.raises(SystemExit) as e:
                _run(
                    spark,
                    ["curate", src, str(tmp_path / "out_pair"),
                     "--n-shards", "1"] + extra,
                    catalog_dir,
                )
            assert e.value.code == 2

    def test_curate_webdataset_format(self, spark, catalog_dir, tmp_path):
        from datalake_spark.export import read_webdataset_shard

        src = str(tmp_path / "docs")
        outdir = str(tmp_path / "wds")
        rows = []
        for i in range(20):
            body = " ".join(f"the d{i}w{j} a d{i}v{j}" for j in range(8))
            rows.append((i, f"doc {i} opens the story here {body}", "en"))
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).write.parquet(src)
        rc, lines = _run(
            spark,
            ["curate", src, outdir, "--n-shards", "2",
             "--fmt", "webdataset"],
            catalog_dir,
        )
        assert rc == 0
        manifest = json.loads(lines[0])
        assert manifest["format"] == "webdataset"
        got = set()
        for k in range(2):
            if manifest["rows_per_shard"].get(str(k), 0):
                for _key, _text, meta in read_webdataset_shard(outdir, k):
                    got.add(meta["doc_id"])
        assert got == set(range(20))


class TestMaintenanceCommands:
    def _seed(self, spark, catalog_dir, n=3):
        for i in range(n):
            rc, _ = _run(
                spark,
                ["push", "--what", "nginx", "--where", f"w{i}", "--path",
                 f"/var/log/f{i}.log", "--start", "2015-01-01",
                 "--work-id", f"job{i % 2}"],
                catalog_dir,
            )
            assert rc == 0

    def test_index_then_delete_then_stats(self, spark, catalog_dir):
        self._seed(spark, catalog_dir)
        rc, lines = _run(spark, ["index", "--buckets", "4"], catalog_dir)
        assert rc == 0 and lines[0] == "indexed 3 rows in 4 buckets"
        rc, lines = _run(
            spark, ["delete", "work_id = 'job0'"], catalog_dir
        )
        assert rc == 0 and lines[0] == "deleted 2 rows"
        rc, lines = _run(spark, ["stats"], catalog_dir)
        assert rc == 0
        by_col = dict(ln.split("\t", 1) for ln in lines)
        assert "nulls=0" in by_col["id"] and "what" in by_col


class TestListenCommand:
    """`datalake-spark listen` — the reference's `datalake_tool listen`
    ingester entry point (ingester/datalake_ingester/cli.py:36-39) as a
    Structured Streaming daemon over a landing dir."""

    def test_once_drains_landing_dir(self, spark, tmp_path, catalog_dir):
        from tests.test_streaming import event, write_events

        landing = str(tmp_path / "landing")
        write_events(
            landing,
            [event("f1"), event("f2", where="h2", start=1420070500000)],
        )
        rc, lines = _run(
            spark, ["listen", landing, "--once"], catalog_dir
        )
        assert rc == 0
        assert lines[-1].startswith("ingested 2 records (0 errors)")
        # files + latest + work-id-queryable catalog state
        from datalake_spark.catalog import Catalog

        cat = Catalog(spark, catalog_dir)
        assert {r["id"] for r in cat.files().collect()} == {"f1", "f2"}
        assert cat.latest_table().count() == 2

    def test_once_is_restart_safe(self, spark, tmp_path, catalog_dir):
        """Second run over the same landing dir re-ingests nothing (the
        checkpoint under the catalog root survives across invocations)."""
        from tests.test_streaming import event, write_events

        landing = str(tmp_path / "landing")
        write_events(landing, [event("f1")], "a.json")
        rc, _ = _run(spark, ["listen", landing, "--once"], catalog_dir)
        assert rc == 0
        write_events(landing, [event("f9")], "b.json")
        rc, lines = _run(spark, ["listen", landing, "--once"], catalog_dir)
        assert rc == 0
        from datalake_spark.catalog import Catalog

        cat = Catalog(spark, catalog_dir)
        # f1 appears once: the second drain processed only b.json
        ids = sorted(r["id"] for r in cat.files().collect())
        assert ids == ["f1", "f9"]

    def test_timeout_bounded_daemon(self, spark, tmp_path, catalog_dir):
        """Continuous mode with --timeout: the daemon ingests what lands
        and exits when the clock runs out."""
        from tests.test_streaming import event, write_events

        landing = str(tmp_path / "landing")
        write_events(landing, [event("f1")])
        rc, lines = _run(
            spark,
            ["listen", landing, "--timeout", "20",
             "--interval", "1 seconds"],
            catalog_dir,
        )
        assert rc == 0
        assert lines[-1].startswith("ingested 1 records")


class TestCurateStreamCommand:
    """`datalake-spark curate-stream` — the streaming curation twin as a
    daemon subcommand (landing dir -> rules -> watermark dedup -> training
    shards)."""

    def test_once_curates_into_shards(self, spark, tmp_path, catalog_dir):
        from tests.test_streaming_curation import _doc, _good, _write

        landing = str(tmp_path / "landing")
        shards = str(tmp_path / "shards")
        docs = [_doc(i, _good(i)) for i in range(12)]
        docs.append(_doc(100, "the a tiny"))  # fails the length rule
        _write(landing, docs, "b1.json")
        rc, lines = _run(
            spark,
            ["curate-stream", landing, shards, "--once", "--n-shards", "2"],
            catalog_dir,
        )
        assert rc == 0
        assert lines[-1].startswith("curated shards hold 12 docs")
        out = spark.read.parquet(shards)
        assert sorted(r["doc_id"] for r in out.collect()) == list(range(12))
        # checkpoint defaults under the shard dir and is invisible to the
        # parquet reader (leading underscore)
        import os

        assert os.path.isdir(os.path.join(shards, "_checkpoint"))

    def test_restart_resumes_from_checkpoint(self, spark, tmp_path, catalog_dir):
        from tests.test_streaming_curation import _doc, _good, _write

        landing = str(tmp_path / "landing")
        shards = str(tmp_path / "shards")
        _write(landing, [_doc(1, _good(1))], "a.json")
        rc, _ = _run(
            spark, ["curate-stream", landing, shards, "--once"], catalog_dir
        )
        assert rc == 0
        _write(landing, [_doc(2, _good(2))], "b.json")
        rc, lines = _run(
            spark, ["curate-stream", landing, shards, "--once"], catalog_dir
        )
        assert rc == 0 and lines[-1].startswith("curated shards hold 2 docs")
        out = spark.read.parquet(shards)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]

    def test_lm_quality_stage_through_cli(
        self, spark, tmp_path, catalog_dir
    ):
        """--lm-model/--lm-threshold: stateless CCNet-style filtering
        against a standing pretrained model; one flag alone is a parse
        error."""
        from datalake_spark.operators.lm import lm_score, lm_train
        from tests.test_streaming_curation import T0, _doc, _good, _write

        with pytest.raises(SystemExit) as e:
            _run(spark, ["curate-stream", str(tmp_path / "l"),
                         str(tmp_path / "s"), "--once",
                         "--lm-threshold", "100"], catalog_dir)
        assert e.value.code == 2

        ref = spark.createDataFrame(
            [(i, _good(i)) for i in range(20)],
            "doc_id long, text string",
        )
        model_path = str(tmp_path / "lm_model")
        lm_train(ref).write.parquet(model_path)
        good = _good(50)
        junk = "junk words start here now " + " ".join(
            f"the z{j}qx a w{j}kv" for j in range(8)
        )
        scores = {
            r["doc_id"]: r["lm_score_micro"]
            for r in lm_score(
                spark.createDataFrame(
                    [(50, good), (51, junk)], "doc_id long, text string"
                ),
                spark.read.parquet(model_path),
            ).collect()
        }
        thr = int(scores[51]) + 1
        landing = str(tmp_path / "landing")
        shards = str(tmp_path / "shards")
        _write(landing, [_doc(50, good), _doc(51, junk, ms=T0 + 1)],
               "b1.json")
        rc, lines = _run(
            spark,
            ["curate-stream", landing, shards, "--once",
             "--lm-model", model_path, "--lm-threshold", str(thr)],
            catalog_dir,
        )
        assert rc == 0
        assert lines[-1].startswith("curated shards hold 1 docs")
        ids = [r["doc_id"] for r in spark.read.parquet(shards).collect()]
        assert ids == [50]

    def test_ann_index_composes_curate_and_serve(
        self, spark, tmp_path, catalog_dir
    ):
        """The r13 composed lifecycle as the CLI recipe: 'ann build' a
        standing index, then 'curate-stream --ann-index ROOT' feeds the
        curated survivors' embeddings into it; a restart with the same
        checkpoint replays nothing."""
        from datalake_spark.operators.ann_index import (
            IndexNotBuilt,
            IvfPqIndex,
        )
        from tests.test_streaming_curation import _doc, _good, _write

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        seedp = str(tmp_path / "seed_vecs")
        emb.filter("vec_id >= 300 and vec_id < 380").selectExpr(
            "vec_id AS doc_id", "embedding"
        ).write.parquet(seedp)
        root = str(tmp_path / "annidx")
        rc, _ = _run(
            spark,
            ["ann", "build", root, seedp, "--num-centroids", "8",
             "--m", "16", "--ksub", "16", "--id-col", "doc_id"],
            catalog_dir,
        )
        assert rc == 0
        # an unbuilt root is refused with the build-first recipe
        with pytest.raises(IndexNotBuilt):
            _run(spark, ["curate-stream", str(tmp_path / "l0"),
                         str(tmp_path / "s0"), "--once",
                         "--ann-index", str(tmp_path / "nowhere")],
                 catalog_dir)

        vecs = {
            r["doc_id"]: [float(x) for x in r["embedding"]]
            for r in emb.filter("vec_id < 4").selectExpr(
                "vec_id AS doc_id", "embedding"
            ).collect()
        }
        landing = str(tmp_path / "landing")
        shards = str(tmp_path / "shards")
        docs = []
        for i in range(4):
            d = _doc(i, _good(i))
            d["embedding"] = vecs[i]
            docs.append(d)
        _write(landing, docs, "b1.json")
        rc, lines = _run(
            spark,
            ["curate-stream", landing, shards, "--once",
             "--ann-index", root],
            catalog_dir,
        )
        assert rc == 0
        assert lines[-1].startswith("curated shards hold 4 docs")
        # search through the CLI with one survivor's vector as probe
        probep = str(tmp_path / "probe")
        emb.filter("vec_id < 1").selectExpr(
            "vec_id AS doc_id", "embedding"
        ).write.parquet(probep)
        rc, lines = _run(
            spark,
            ["ann", "search", root, probep, "--k", "2",
             "--id-col", "doc_id"],
            catalog_dir,
        )
        assert rc == 0
        hits = [json.loads(ln) for ln in lines]
        assert len(hits) == 2
        # restart with the same checkpoint: nothing replays, the index
        # version is untouched
        v1 = IvfPqIndex(spark, root, id_col="doc_id").manifest()["version"]
        rc, _ = _run(
            spark,
            ["curate-stream", landing, shards, "--once",
             "--ann-index", root],
            catalog_dir,
        )
        assert rc == 0
        v2 = IvfPqIndex(spark, root, id_col="doc_id").manifest()["version"]
        assert v2 == v1
        # a FRESH checkpoint against the now-ingested index is LEGAL
        # under r14 stream registration: it gets its own epoch base
        # above every committed epoch (restarted batch numbering can no
        # longer silently no-op into the first stream's epochs — the
        # r13 guard refused this case instead), and the re-delivered
        # vectors are anti-joined out by the prior-ids guard, so the
        # index stays duplicate-free.
        rc, _ = _run(
            spark,
            ["curate-stream", landing, shards, "--once",
             "--ann-index", root,
             "--checkpoint", str(tmp_path / "fresh_ck")],
            catalog_dir,
        )
        assert rc == 0
        idx = IvfPqIndex(spark, root, id_col="doc_id")
        man = idx.manifest()
        # the fresh stream's epochs sit above the first stream's
        assert max(int(e) for e in man["epochs"]) >= 2
        ids = spark.read.parquet(idx._url(man["dir"], IvfPqIndex.IDS))
        assert ids.groupBy("c_id").count().filter("count > 1").count() == 0
        # ... but REUSING a registered checkpoint for a different
        # landing dir is refused (one checkpoint binds one stream)
        other_landing = str(tmp_path / "landing2")
        _write(other_landing, [dict(_doc(9, _good(9)),
                                    embedding=vecs[0])], "b9.json")
        with pytest.raises(ValueError, match="registered to landing dir"):
            _run(
                spark,
                ["curate-stream", other_landing, shards, "--once",
                 "--ann-index", root,
                 "--checkpoint", str(tmp_path / "fresh_ck")],
                catalog_dir,
            )


class TestListAtVersion:
    def test_time_travel_list(self, spark, catalog_dir):
        """--at-version reads a retained snapshot: after a delete, the
        previous version still lists the deleted row (bad-delete
        recovery through the ordinary query CLI)."""
        for w in ("w1", "w2"):
            _run(spark, ["push", "--what", "nginx", "--where", w,
                         "--path", f"/var/log/{w}.log",
                         "--start", "2015-01-01"], catalog_dir)
        _run(spark, ["compact"], catalog_dir)            # v1: both rows
        rc, lines = _run(spark, ["delete", "where = 'w2'"], catalog_dir)
        assert rc == 0 and lines[0] == "deleted 1 rows"  # v2: one row
        rc, cur = _run(
            spark, ["list", "nginx", "--start", "2015-01-01",
                    "--end", "2015-01-02"], catalog_dir)
        assert rc == 0 and len(cur) == 1
        rc, old = _run(
            spark, ["list", "nginx", "--start", "2015-01-01",
                    "--end", "2015-01-02", "--at-version", "1"], catalog_dir)
        assert rc == 0 and len(old) == 2

