"""DSIR importance resampling (operators/dsir.py) + the fixed-point
integer log2 it gates through (functions/intmath.py).

The cross-engine value equality of the full composition is the driver
gate's job (dsir_select vs DSIR_SELECT_SQL); these tests pin the local
semantics: log2_fp's accuracy/domain, the model's monotonicity in the
target counts, scoring sentinels, and the deterministic top-n sample.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from datalake_spark.functions.intmath import FBITS, log2_fp, sql_log2_fp_cte
from datalake_spark.operators.dsir import (
    dsir_sample,
    dsir_score,
    dsir_train,
    hashed_features,
)

SCALE = 1 << FBITS


class TestLog2Fp:
    def test_matches_float_log2_to_fixed_point(self, spark):
        vals = [1, 2, 3, 5, 7, 1000, 1048576, 999999937, (1 << 42) - 1]
        rows = (
            spark.createDataFrame([(v,) for v in vals], "v long")
            .select("v", log2_fp("v").alias("fp"))
            .collect()
        )
        for r in rows:
            # the digit recurrence truncates: exact to 2^-20 from below
            assert 0 <= math.log2(r.v) - r.fp / SCALE < 2 ** -18, r

    def test_exact_at_powers_of_two(self, spark):
        rows = (
            spark.range(0, 40)
            .select(log2_fp("CAST(1 AS BIGINT) << id").alias("fp"), "id")
            .collect()
        )
        for r in rows:
            assert r.fp == r.id * SCALE

    def test_domain_violation_raises_in_plan(self, spark):
        with pytest.raises(Exception, match="log2_fp: domain"):
            spark.createDataFrame([(0,)], "v long").select(
                log2_fp("v")
            ).collect()

    def test_duckdb_twin_is_bit_identical(self, spark):
        vals = [1, 2, 3, 5, 7, 1000, 1048576, 999999937, (1 << 42) - 1]
        spark_fp = {
            r.v: r.fp
            for r in spark.createDataFrame([(v,) for v in vals], "v long")
            .select("v", log2_fp("v").alias("fp"))
            .collect()
        }
        vlist = ", ".join(f"({v}::BIGINT)" for v in vals)
        cte = sql_log2_fp_cte(f"SELECT v FROM (VALUES {vlist}) t(v)")
        duck = dict(
            duckdb.connect()
            .execute(f"WITH RECURSIVE {cte} SELECT v, log2fp FROM log2t")
            .fetchall()
        )
        assert spark_fp == duck


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDsir:
    B = 64

    def test_model_shape_and_prior(self, spark):
        target = _docs(spark, [(1, "alpha beta"), (2, "alpha beta")])
        raw = _docs(
            spark, [(1, "alpha beta"), (2, "alpha beta"), (3, "junk junk")]
        )
        m = dsir_train(target, raw, num_buckets=self.B)
        rows = m.collect()
        assert len(rows) == self.B  # full spine, empty buckets included
        by_bucket = {r.bucket: r for r in rows}
        # every bucket untouched by either corpus carries the constant
        # prior llr = log2fp(R+B) - log2fp(T+B) > 0 (raw total > target)
        empties = {r.llr_fp for r in rows if r.c_t == 0 and r.c_r == 0}
        assert len(empties) == 1 and empties.pop() > 0
        # a junk-only bucket scores strictly below a target-heavy one
        feats = hashed_features(raw, num_buckets=self.B).collect()
        junk_buckets = {
            f.bucket for f in feats if f.doc_id == 3
        }
        target_buckets = {
            f.bucket for f in feats if f.doc_id in (1, 2)
        } - junk_buckets
        assert junk_buckets and target_buckets
        assert max(
            by_bucket[b].llr_fp for b in junk_buckets
        ) < min(by_bucket[b].llr_fp for b in target_buckets)

    def test_score_sentinels_and_ranking(self, spark):
        target = _docs(spark, [(1, "clean text here"), (2, "clean text")])
        raw = _docs(
            spark,
            [(1, "clean text here"), (2, "clean text"),
             (3, "zz yy xx"), (4, "zz yy")],
        )
        model = dsir_train(target, raw, num_buckets=self.B)
        scored = {
            r.doc_id: r
            for r in dsir_score(raw, model, num_buckets=self.B).collect()
        }
        # target-like docs outrank junk docs
        assert min(
            scored[1].dsir_logw_fp, scored[2].dsir_logw_fp
        ) > max(scored[3].dsir_logw_fp, scored[4].dsir_logw_fp)
        # n_feats = unigrams + bigrams of the whitespace tokenization
        assert scored[1].n_feats == 3 + 2
        assert scored[4].n_feats == 2 + 1

    def test_sample_is_deterministic_topn(self, spark):
        target = _docs(spark, [(1, "good good good")])
        raw = _docs(
            spark,
            [(1, "good good good"), (2, "good good"), (3, "bad bad"),
             (4, "good bad")],
        )
        model = dsir_train(target, raw, num_buckets=self.B)
        picked = [
            r.doc_id
            for r in dsir_sample(raw, model, 2, num_buckets=self.B)
            .select("doc_id").collect()
        ]
        assert len(picked) == 2
        # the two good-dominated docs win, and a re-run agrees exactly
        assert set(picked) == {1, 2}
        again = [
            r.doc_id
            for r in dsir_sample(raw, model, 2, num_buckets=self.B)
            .select("doc_id").collect()
        ]
        assert sorted(picked) == sorted(again)

    def test_model_roundtrips_through_parquet(self, spark, tmp_path):
        target = _docs(spark, [(1, "alpha beta gamma")])
        raw = _docs(spark, [(1, "alpha beta gamma"), (2, "delta junk")])
        model = dsir_train(target, raw, num_buckets=self.B)
        path = str(tmp_path / "dsir_model")
        model.write.parquet(path)
        reloaded = spark.read.parquet(path)
        direct = sorted(
            dsir_score(raw, model, num_buckets=self.B).collect()
        )
        via_disk = sorted(
            dsir_score(raw, reloaded, num_buckets=self.B).collect()
        )
        assert direct == via_disk
