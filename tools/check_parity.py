"""Local replica of the driver's correctness gate: run each declared query in
Spark AND its DuckDB oracle on the same sf dir, compare row count, column
names/dtypes, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
       python tools/check_parity.py --sf1 [query ...]

``--sf1`` is the fast scale-parity regression harness (r6's one-off
sweep, frozen): it ensures the tiled sf1.0 dataset exists (building it
via tools/make_sfn.py on first use, ~2 min) and runs the six entries r6
identified as sf-SENSITIVE — the ones whose caps/tiebreaks/sketch
verdicts only start binding under 10x duplication (PARITY_sf1.md
findings 1-4): simhash_pairs, fuzzy_join_lev1, dl_latest_all,
hll_distinct_verdict + q_approx_distinct, minhash_lsh_dedup,
dedup_clusters.  Battery SUBS run standalone (their parent batteries
carry sf1.0-hostile siblings like the 20k^2 embedding oracle), each
compared against its own oracle.  A full --sf1 run (no explicit entry
list) finishes with the catalog CONCURRENCY stress: two latest-table
merges of different batches raced against a concurrent work-id-index
rebuild over a catalog built from the tiled files frame — the scale
companion to the toy-catalog race tests (r8).  Budget ~10 min; run
once per round.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from datalake_spark.queries import TABLES  # noqa: E402
from datalake_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values so both engines stringify identically
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<null>"
        if pd.isna(v):
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    out = df.map(canon)
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns {sc} vs {dc}")
        return problems
    # dtype families must agree too (the driver compares schemas; int64 vs
    # float64 or object vs bool would fail there even when values stringify
    # identically)
    def fam(dt):
        k = dt.kind  # b/i/u/f/O/M...
        return {"u": "i"}.get(k, k)

    for c in sc:
        fs, fd = fam(spark_pdf[c].dtype), fam(duck_pdf[c].dtype)
        # an all-NULL spark column arrives as object; don't flag those
        if fs != fd and not (spark_pdf[c].isna().all() or duck_pdf[c].isna().all()):
            problems.append(
                f"dtype {c}: spark {spark_pdf[c].dtype} vs duck {duck_pdf[c].dtype}"
            )
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = list(a.index[neq])[:3]
        for i in idx:
            problems.append(f"row diff @{i}:\n  spark={a.loc[i].to_dict()}\n  duck ={b.loc[i].to_dict()}")
    return problems


SF1_DIR = "/root/repo/.sf1"
SF10_DIR = "/root/repo/.sf10"
# the sf-sensitive set (PARITY_sf1.md findings 1-4 + their guards)
SF1_ENTRIES = [
    "simhash_pairs", "fuzzy_join_lev1", "dl_latest_all",
    "hll_distinct_verdict", "q_approx_distinct", "minhash_lsh_dedup",
    "dedup_clusters",
]
# r12: the LLM-pipeline newcomers that had never run at 100x — the
# ANN/DSIR/LM/semantic families (the r11 sf10 campaign covered only the
# relational/dedup sf-sensitive six).  --sf10 runs SF1_ENTRIES + these.
SF10_EXTRA = [
    "ann_ivfpq_topk", "dsir_select", "lm_quality_score", "semantic_dedup",
    # r13: the curation tier — operators whose caps and windows bind
    # with corpus size (decon's broadcast gram set, span_dedup's
    # min_df, budget_mix's quota prefix sums, weighted_sample's
    # map-side prune) had never run at 100x
    "decontamination", "span_dedup", "budget_mix", "weighted_sample",
    # r13 second wave: the text/retrieval tier — df/idf denominators,
    # posting-list caps, and Heaps-law distinct counts all scale with
    # the corpus
    "tfidf_top_terms", "bm25_topk", "vocab_report", "postings_index",
    # r13 third wave: the event-analytics tier — 60 M events at sf10;
    # per-user windows, 24h funnel frames and the trailing-7-day
    # contribute-explode all scale with event density
    "funnel_analysis", "cohort_retention", "rolling_active_users",
    "event_sequences",
    # r13 fourth wave: the relational core — all 22 TPC-H shapes,
    # window/event-window batteries, sessionize at ~60 M rows
    "q_tpch_battery", "q_window_battery", "q_event_window_battery",
    "sessionize",
    # r13 fifth wave: the remaining battery core.  q_subquery_battery
    # is NOT here: its 180-plan fuzz UNION is sf10-hostile on BOTH
    # sides (Spark needs SPARK_GRAFT_DRIVER_MEM=48g in the one-JVM
    # sandbox; the DuckDB oracle's monolithic spill exceeds the disk) —
    # the same differential runs per-seed via
    # `fuzz_hunt.py START N /root/repo/.sf10` instead (PARITY_sf10.md).
    "q_join_battery", "q_agg_battery", "q_scalar_battery",
    "q_setops_battery",
]


def _sf1_concurrency_stress(spark, sf_dir: str) -> bool:
    """Scale companion to the toy-catalog race tests
    (tests/test_catalog_commits.py TestOptimisticCommits): build a real
    catalog from the sf1.0 events-derived files frame (~10x the bench
    corpus), then race TWO latest-table merges of different batches
    against a CONCURRENT full work-id-index rebuild.  The marker-CAS
    protocol must lose neither batch, the rebuilt index must cover every
    row, and deep fsck must come back clean.  Prints PASS/FAIL like a
    parity entry; ~2-3 min inside the --sf1 budget."""
    import shutil
    import tempfile
    import threading

    from datalake_spark.catalog import Catalog
    from datalake_spark.queries.datalake_q import files_from_events
    from datalake_spark.schema import FILES_SCHEMA

    from pyspark.sql import functions as F

    t0 = time.time()
    root = tempfile.mkdtemp(prefix="sf1-stress-cat-")
    try:
        cat = Catalog(spark, root)
        # files_from_events is the QUERY-side derivation (SQL-safe
        # aliases, no record-level fields); map it onto FILES_SCHEMA the
        # way an ingest would
        ev = files_from_events(spark, sf_dir)
        files = ev.select(
            F.lit(0).cast("int").alias("version"),
            F.col("start_ms").alias("start"),
            F.col("end_ms").alias("end"),
            F.col("what"),
            F.col("site").alias("where"),
            F.col("id").cast("string").alias("id"),
            F.col("hash"),
            F.concat(F.lit("/events/"), F.col("id").cast("string")).alias("path"),
            F.col("work_id"),
            F.concat(F.lit("s3://stress/"), F.col("id").cast("string"),
                     F.lit("/data")).alias("url"),
            F.col("create_time"),
            F.lit(1024).cast("long").alias("size"),
        )
        n_files = files.count()
        cat.append(files)
        cat.build_work_id_index(num_buckets=32)
        cat.refresh_latest()
        base_latest = cat.latest_table().count()

        def batch(host: str):
            row = {
                "version": 0, "start": 4102444800000, "end": None,
                "what": "click", "where": host, "id": f"stress-{host}",
                "hash": "0" * 32, "path": f"/stress/{host}",
                "work_id": f"stress-{host}", "url": f"s3://b/stress-{host}",
                "create_time": 4102444800000, "size": 1,
            }
            return spark.createDataFrame([row], FILES_SCHEMA)

        barrier = threading.Barrier(3)
        errs: list = []

        def merge(host: str):
            # a real ingest writer: rows into files (which also appends
            # the work-id index — racing the concurrent rebuild), then
            # the latest merge
            try:
                barrier.wait(timeout=60)
                b = batch(host)
                cat.append(b)
                cat.refresh_latest(b)
            except Exception as e:
                errs.append(("merge-" + host, e))

        def rebuild():
            try:
                barrier.wait(timeout=60)
                cat.build_work_id_index(num_buckets=16)
            except Exception as e:
                errs.append(("rebuild", e))

        threads = [
            threading.Thread(target=merge, args=("stress-h1",)),
            threading.Thread(target=merge, args=("stress-h2",)),
            threading.Thread(target=rebuild),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        if errs:
            print(f"FAIL sf1_concurrency_stress: {errs}")
            return False
        latest_wheres = {
            r["where"]
            for r in cat.latest_table()
            .filter("where LIKE 'stress-%'")
            .collect()
        }
        problems = []
        if latest_wheres != {"stress-h1", "stress-h2"}:
            problems.append(
                f"lost a racing batch: stress keys {sorted(latest_wheres)}"
            )
        if cat.latest_table().count() != base_latest + 2:
            problems.append("latest-table row count drifted under the race")
        idx = cat.work_id_index()
        n_indexed = (
            idx[0].select("id").distinct().count() if idx else 0
        )
        # corpus rows + the two stress rows (all carry work_ids)
        n_expected = files.filter("work_id IS NOT NULL").count() + 2
        if n_indexed < n_expected:
            problems.append(
                f"index lost rows under concurrent rebuild: "
                f"{n_indexed} < {n_expected}"
            )
        report = cat.fsck(deep=True)
        if not report["ok"]:
            problems.append(f"fsck: {report['problems']}")
        if problems:
            print(f"FAIL sf1_concurrency_stress ({n_files} files):")
            for p in problems:
                print("   ", p)
            return False
        print(
            f"PASS sf1_concurrency_stress: {n_files} files, two merges + "
            f"rebuild raced, fsck clean ({time.time()-t0:.1f}s)"
        )
        return True
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _sf1_composed_soak(spark, sf_dir: str) -> bool:
    """r14: the million-file-concurrency-stress pattern applied to the
    COMPOSED streaming lifecycle (curate + LM filter + near-dup probe +
    shard copy-promote + standing-index epoch append + signature-store
    append in ONE sink).  The r13 e2e proves ONE crash point; this soak
    drives five sf1-volume micro-batches (3k docs each, embeddings
    riding) through the sink with an injected crash at EVERY commit
    boundary — after the staging write, mid-promote (one file copied),
    after promote, after the index append (before signatures), after
    the signature append — replaying each crashed epoch, with a
    concurrent ``rebuild()`` racing one of the replays.  After the
    burn: shard doc_ids are unique, every curated doc's vector is in
    the ids tree exactly once (the silent-drop hazard the epoch-
    provenance work closes), a probe returns k hits, and the manifest's
    epochs/provenance are consistent.  ~2-4 min inside the --sf1
    budget."""
    import shutil
    import tempfile
    import threading

    from pyspark.sql import functions as F

    from datalake_spark.operators.ann_index import IvfPqIndex
    from datalake_spark.operators.lm import lm_train
    from datalake_spark.queries import load
    from datalake_spark.streaming.curation import StreamingCurator

    t0 = time.time()
    root = tempfile.mkdtemp(prefix="sf1-soak-")
    problems: list = []
    try:
        docs = load(spark, sf_dir, "documents")
        emb = load(spark, sf_dir, "embeddings")
        # seed corpus: vec_ids disjoint from the streamed doc_ids
        seed = emb.filter("vec_id >= 15000").selectExpr(
            "vec_id AS doc_id", "embedding"
        )
        idx = IvfPqIndex(
            spark, f"{root}/annidx", num_centroids=8, m=16, ksub=16,
            id_col="doc_id",
        )
        idx.build(seed)
        lm_path = f"{root}/lm_model"
        lm_train(
            docs.filter("doc_id >= 15000 AND doc_id < 20000")
        ).write.parquet(lm_path)
        cur = StreamingCurator(
            spark, f"{root}/shards", n_shards=4,
            near_dup_threshold=0.8, ann_index=idx,
            lm_model_path=lm_path, lm_threshold=1,
        )
        feed = docs.filter("doc_id < 15000").join(
            emb.selectExpr("vec_id AS doc_id", "embedding"), "doc_id"
        ).select(
            "doc_id", "text", "lang",
            F.lit(1_700_000_000_000).alias("ms"), "embedding",
        )

        class _Boom(Exception):
            pass

        def _die():
            raise _Boom()

        crash_at = ["staged", "mid_promote", "promoted", "indexed",
                    "signatures"]
        rebuild_err: list = []
        for ep in range(5):
            batch = feed.filter(
                (F.col("doc_id") >= ep * 3000)
                & (F.col("doc_id") < (ep + 1) * 3000)
            )
            cur._crash_hooks = {crash_at[ep]: _die}
            try:
                cur._write_batch(batch, epoch=ep)
                problems.append(f"epoch {ep}: crash hook never fired")
            except _Boom:
                pass
            cur._crash_hooks = {}
            if ep == 3:
                # race the replay against a retrain-and-swap: rebuild
                # resolves committed ids and retrains while the replay
                # re-encodes — marker CAS serializes them, neither may
                # lose rows
                def _rebuild_target():
                    # the replay's appends are post-commit no-ops, so
                    # the rebuild has no legitimate failure mode here —
                    # capture everything (a bare Thread swallows its
                    # exceptions and the soak would false-pass on the
                    # exact scenario it exists to verify)
                    try:
                        idx.rebuild(
                            emb.selectExpr("vec_id AS doc_id", "embedding")
                        )
                    except Exception as e:  # noqa: BLE001
                        rebuild_err.append(e)

                t = threading.Thread(target=_rebuild_target)
                t.start()
                cur._write_batch(batch, epoch=ep)  # the replay
                t.join(timeout=900)
                if t.is_alive():
                    problems.append("concurrent rebuild hung")
                if rebuild_err:
                    problems.append(
                        f"racing rebuild raised: {rebuild_err[0]!r}"
                    )
            else:
                cur._write_batch(batch, epoch=ep)  # the replay
        # -- invariants after the burn --------------------------------
        shard_ids = [
            r["doc_id"]
            for r in spark.read.parquet(f"{root}/shards").select(
                "doc_id"
            ).collect()
        ]
        if len(shard_ids) != len(set(shard_ids)):
            problems.append(
                f"duplicate docs in shards: {len(shard_ids)} rows over "
                f"{len(set(shard_ids))} ids"
            )
        man = idx.manifest()
        ids = [
            r["c_id"]
            for r in spark.read.parquet(
                idx._url(man["dir"], IvfPqIndex.IDS)
            )
            .filter(
                F.col("epoch").isin([int(e) for e in man["epochs"]])
            )
            .select("c_id").collect()
        ]
        if len(ids) != len(set(ids)):
            problems.append(
                f"duplicate ids in index: {len(ids)} over "
                f"{len(set(ids))}"
            )
        want = set(shard_ids) | {
            r["doc_id"] for r in seed.select("doc_id").collect()
        }
        if set(ids) != want:
            missing = sorted(want - set(ids))[:5]
            extra = sorted(set(ids) - want)[:5]
            problems.append(
                f"index coverage drifted: {len(want)} expected vs "
                f"{len(set(ids))} indexed (missing {missing}, "
                f"extra {extra})"
            )
        srcs = man.get("epoch_src", {})
        bad_src = [
            e for e in man["epochs"]
            if int(e) >= 1 and srcs.get(str(int(e))) != "stream:direct"
        ]
        if bad_src:
            problems.append(f"epoch provenance drifted: {bad_src}")
        probe = emb.filter("vec_id < 2").selectExpr(
            "vec_id AS doc_id", "embedding"
        )
        hits = idx.search(probe, k=3, nprobe=4).collect()
        if len(hits) != 6:
            problems.append(f"probe returned {len(hits)} hits, not 6")
        if problems:
            print("FAIL sf1_composed_soak:")
            for p in problems:
                print("   ", p)
            return False
        print(
            f"PASS sf1_composed_soak: {len(shard_ids)} curated, "
            f"{len(ids)} indexed, 5 crash points + racing rebuild "
            f"healed ({time.time()-t0:.1f}s)"
        )
        return True
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _ensure_sfn(dst: str, k: int, label: str) -> str:
    import os

    if not os.path.isfile(f"{dst}/lineitem.parquet"):
        print(f"building {label} testdata at {dst} (one-time)")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from make_sfn import build

        build("/root/testdata/sf0.1", dst, k)
    return dst


def main() -> int:
    argv = list(sys.argv[1:])
    sf1_mode = "--sf1" in argv
    # r11: --sf10 — the NEXT order of magnitude (100x tiles, ~60 M
    # lineitem rows): same sf-sensitive entry list, no concurrency
    # stress (the sf1 one already covers the protocol; at 100x it would
    # dominate the budget).  One-time build ~15 min + ~6 GB disk.
    sf10_mode = "--sf10" in argv
    if sf1_mode:
        argv.remove("--sf1")
        sf_dir = _ensure_sfn(SF1_DIR, 10, "sf1.0")
        only = set(argv) or set(SF1_ENTRIES)
    elif sf10_mode:
        argv.remove("--sf10")
        sf_dir = _ensure_sfn(SF10_DIR, 100, "sf10")
        only = set(argv) or set(SF1_ENTRIES + SF10_EXTRA)
    else:
        sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
        only = set(argv[1:])
    import __spark_entry__ as entrymod

    qs = dict(entrymod.queries())
    oracles = dict(entrymod.oracle_sql())
    if only:
        # battery subs are addressable by name and run standalone
        # against their own oracles (their parent batteries carry
        # scale-hostile siblings like embedding_near_dup's 20k^2 oracle)
        from datalake_spark.queries import registry
        from datalake_spark.queries.batteries import BATTERY_SUBS

        registry()  # populate BATTERY_SUBS
        for subs in BATTERY_SUBS.values():
            for sub in subs:
                if sub.q.name in only and sub.q.name not in qs:
                    qs[sub.q.name] = sub.q.build
                    if sub.q.oracle:
                        oracles[sub.q.name] = sub.q.oracle
    spark = get_spark("parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_fail = n_rows_only = 0
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = build(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name} ({len(sdf)} vs {len(ddf)} rows):")
            for p in problems:
                print("   ", p)
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    if sf1_mode and not argv:
        # full --sf1 runs (no explicit entry list) append the catalog
        # concurrency stress over the tiled data (r8) and the composed
        # streaming-lifecycle crash soak (r14)
        if _sf1_concurrency_stress(spark, sf_dir):
            n_pass += 1
        else:
            n_fail += 1
        if _sf1_composed_soak(spark, sf_dir):
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
