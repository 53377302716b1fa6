"""Skew/scale stress fixtures: degenerate corpora that blow up quadratically
the moment any cap is removed.

The r1/r2 hazards (uncapped LSH buckets, uncapped posting lists, unsalted
hot keys) are correctness-tested elsewhere; these tests pin the COST.  The
teeth are deterministic output/partition-size bounds derived from the cap
math — delete a cap and the counts explode past them — plus a generous
wall-clock ceiling per operator as a backstop (generous because co-tenant
load swings ±20%; the count pins are the precise guard).
"""

import time

import pytest
from pyspark.sql import functions as F

from datalake_spark.operators import dedup
from datalake_spark.operators.skew import salted_join

N_DOCS = 1000
CAP = 50


@pytest.fixture(scope="module")
def identical_docs(spark):
    """1000 byte-identical documents — every LSH bucket, simhash band and
    shingle posting list collapses onto one key."""
    text = "the quick brown fox jumps over the lazy dog again and again " * 3
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    )


@pytest.fixture(scope="module")
def hot_events(spark):
    """100k-row events table where 99% of rows share one key."""
    hot = spark.range(99_000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(1_000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") + 1_000_000).alias("v"),
    )
    return hot.union(cold)


def _timed(df):
    t0 = time.monotonic()
    n = df.count()
    return n, time.monotonic() - t0


class TestDegenerateCorpusCaps:
    def test_minhash_bucket_cap_bounds_pairs(self, identical_docs):
        """Identical docs share every band bucket: capped prefix ->
        ≤ C(CAP,2) verified pairs; uncapped would emit C(1000,2)=499500."""
        n, secs = _timed(
            dedup.minhash_lsh_pairs(identical_docs, max_bucket=CAP)
        )
        assert 0 < n <= CAP * (CAP - 1) // 2
        assert secs < 90
        # and the truncation is detectable, same surface as simhash's:
        # all 64 bands collapse to one over-full bucket each
        trunc = dedup.minhash_truncated_buckets(
            identical_docs, max_bucket=CAP
        ).collect()
        assert len(trunc) == 64
        assert all(r.bucket_size == N_DOCS for r in trunc)
        assert (
            dedup.minhash_truncated_buckets(
                identical_docs, max_bucket=N_DOCS
            ).count()
            == 0
        )

    def test_trunc_out_rides_pairs_agg_and_matches_standalone(
        self, identical_docs
    ):
        """The folded sentinel (trunc_out on minhash_lsh_pairs) must report
        exactly what the standalone second-groupBy form reports — same
        buckets, same sizes — while sharing the pairs' aggregation."""
        frames: list = []
        pairs = dedup.minhash_lsh_pairs(
            identical_docs, max_bucket=CAP, trunc_out=frames
        )
        assert pairs.count() > 0  # pairs path unaffected
        got = {
            (r.band, r.band_hash): r.bucket_size for r in frames[0].collect()
        }
        want = {
            (r.band, r.band_hash): r.bucket_size
            for r in dedup.minhash_truncated_buckets(
                identical_docs, max_bucket=CAP
            ).collect()
        }
        assert got == want and len(got) == 64
        # non-binding cap -> empty sentinel
        frames2: list = []
        dedup.minhash_lsh_pairs(
            identical_docs, max_bucket=N_DOCS, trunc_out=frames2
        ).count()
        assert frames2[0].count() == 0

    def test_simhash_bucket_cap_bounds_pairs(self, identical_docs):
        """Identical simhashes collapse all 4 bands into one bucket each."""
        n, secs = _timed(dedup.simhash_pairs(identical_docs, max_bucket=CAP))
        assert 0 < n <= CAP * (CAP - 1) // 2
        assert secs < 90
        # and the truncation IS detectable (exactness disclaimer holds)
        assert (
            dedup.simhash_truncated_buckets(
                identical_docs, max_bucket=CAP
            ).count()
            == 4
        )

    def test_jaccard_posting_cap_kills_stop_shingles(self, identical_docs):
        """Every shingle's posting list holds all 1000 docs; max_df=CAP must
        drop them all BEFORE pair expansion — zero pairs, zero blowup
        (uncapped: ~n_shingles × C(1000,2) intermediate rows)."""
        n, secs = _timed(
            dedup.ngram_jaccard_pairs(identical_docs, max_df=CAP)
        )
        assert n == 0
        assert secs < 90

    def test_caps_do_not_perturb_clean_corpora(self, spark):
        """The stress caps must be inert off the degenerate path: a corpus
        with small duplicate groups yields identical pairs with tiny and
        huge caps."""
        docs = spark.range(60).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("distinct prefix words number "),
                (F.col("id") % 20).cast("string"),
                F.lit(" shared suffix tokens here to shingle on repeatedly"),
            ).alias("text"),
        )
        small = dedup.minhash_lsh_pairs(docs, max_bucket=CAP)
        large = dedup.minhash_lsh_pairs(docs, max_bucket=100_000)
        assert sorted(map(tuple, small.collect())) == sorted(
            map(tuple, large.collect())
        )


class TestHotKeySalting:
    def test_salt_spreads_the_hot_key(self, hot_events, spark):
        """After salting, no (key, salt) reducer group may hold more than a
        small multiple of N/salt — delete the salt and the hot key's 99k
        rows land on ONE reducer (this assertion then fails at 99000)."""
        salt = 16
        salted = hot_events.withColumn(
            "_salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in hot_events.columns]),
                F.lit(salt),
            ),
        )
        sizes = (
            salted.groupBy("k", "_salt")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        assert sizes <= 2 * 99_000 // salt

    def test_salted_join_completes_and_matches(self, hot_events, spark):
        dim = spark.createDataFrame(
            [("hot", "HOT")] + [(f"c{i}", f"C{i}") for i in range(50)],
            "k string, label string",
        )
        t0 = time.monotonic()
        n = salted_join(hot_events, dim, ["k"], salt=16).count()
        assert n == 100_000
        assert time.monotonic() - t0 < 90


class TestFuzzyBlockCap:
    def test_identical_names_bounded_by_cap(self, spark):
        """1000 identical strings share every deletion variant: uncapped
        blocking would expand ~n^2/2 candidates; the cap bounds it at
        C(cap,2) and the detector reports every over-full block."""
        from datalake_spark.operators.dedup import (
            fuzzy_pairs_lev1,
            fuzzy_truncated_blocks,
        )

        df = spark.createDataFrame(
            [(i, "same-name") for i in range(1000)], "id long, name string"
        )
        pairs = fuzzy_pairs_lev1(df, "name", "id", max_block=40)
        n = pairs.count()
        assert 0 < n <= 40 * 39 // 2
        trunc = fuzzy_truncated_blocks(df, "name", "id", max_block=40)
        # original + len("same-name") deletions, all blocks of 1000
        rows = trunc.collect()
        assert len(rows) == len("same-name") + 1
        assert all(r["block_size"] == 1000 for r in rows)

    def test_natural_keys_cap_never_binds(self, spark):
        """Unique-ish names: the detector is empty, so the capped pairs
        are PROVEN exact (the driver gate separately hash-matches them
        against the brute-force oracle)."""
        from datalake_spark.operators.dedup import fuzzy_truncated_blocks

        df = spark.createDataFrame(
            [(i, f"item#{i:06d}") for i in range(500)], "id long, name string"
        )
        assert fuzzy_truncated_blocks(df, "name", "id", max_block=64).count() == 0
