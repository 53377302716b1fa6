"""Deduplication operators for a 100 TB training-data pipeline.

Four tiers, cheapest first:
1. exact_dedup          — hash-groupBy on content hash (one shuffle)
2. fingerprint_dedup    — rolling-hash fingerprint groupBy (near-exact)
3. minhash_lsh_pairs    — banded MinHash LSH: candidate pairs WITHOUT the
                          all-pairs shingle self-join; exact Jaccard verify
                          on candidates only
4. simhash_pairs        — 64-bit SimHash with banded collision buckets

Scale design: every tier is map-stage signature computation (pure Column
exprs, codegen) + ONE shuffle on a bucket key + within-bucket pair expansion.
Bucket sizes are bounded (huge buckets are degenerate shingles — capped and
logged rather than exploded).  No driver-side loops, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datalake_spark.functions.hashing import minhash_signature
from datalake_spark.functions.text import doc_fingerprint, tokenize


def shingles(text_col, n: int = 3) -> F.Column:
    """Distinct n-word shingles of a text column (array<string>)."""
    words = tokenize(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )


def exact_dedup(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per exact content hash (min id wins). One shuffle."""
    h = F.md5(F.col(content_col))
    w = df.withColumn("_h", h)
    keep = w.groupBy("_h").agg(F.min(id_col).alias(id_col))
    return w.join(keep, [ "_h", id_col ], "left_semi").drop("_h")


def fingerprint_dedup(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Near-exact dedup on the rolling-hash fingerprint (whitespace-robust)."""
    w = df.withColumn("_fp", doc_fingerprint(content_col))
    keep = w.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return w.join(keep, ["_fp", id_col], "left_semi").drop("_fp")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 64,
    band_rows: int = 2,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs with Jaccard >= threshold via banded MinHash LSH.

    Plan shape (the scale path):
      map:    shingle set -> 64 minhashes (xxhash64, codegen) -> b bands
      shuffle #1: explode bands, groupBy (band_id, band_hash) -> tiny buckets
      pairs:  within-bucket id×id (bucket size capped), distinct
      verify: exact Jaccard on candidate pairs only (shuffle #2 on shingle)

    With r=2, b=32: P(candidate | J) = 1-(1-J^2)^32 -> .986 at J=0.5, so the
    verified output equals the all-pairs answer w.p. ~1 per pair while doing
    |buckets|×k² work instead of |shingle join| work.
    """
    bands = num_hashes // band_rows
    par = df.sparkSession.sparkContext.defaultParallelism
    # flat distinct-shingle frame — the ONE pass every stage reuses.  The
    # repartition matters: a small parquet input arrives as 1-2 partitions
    # and the whole operator would otherwise run on one core.
    sh_flat = (
        df.repartition(par, id_col)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(shingles(F.col(text_col), shingle_n)).alias("_s"),
        )
        # double-hashing MinHash family g_i = h1 + i*h2 (Kirsch-Mitzenmacher):
        # 2 string hashes per shingle instead of num_hashes, then 64 cheap
        # integer mins in one aggregation pass.  Both bases are reduced to
        # 31-bit space so i*h2 stays far below 2^63 under ANSI arithmetic.
        .withColumn("_h1", F.pmod(F.xxhash64("_s", F.lit(1)), F.lit(2147483647)))
        .withColumn("_h2", F.pmod(F.xxhash64("_s", F.lit(2)), F.lit(2147483647)) + 1)
    )
    sig = sh_flat.groupBy("_id").agg(
        *[
            F.min(F.col("_h1") + F.lit(i) * F.col("_h2")).alias(f"_m{i}")
            for i in range(num_hashes)
        ],
        F.count(F.lit(1)).alias("_n_sh"),
    )
    # band frame carries ONLY (_id, band, bandhash)
    banded = sig.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col(f"_m{b * band_rows + r}").cast("string")
                                for r in range(band_rows)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bh"),
    )
    # candidate pairs: same (band, bandhash) bucket; cap degenerate buckets
    buckets = banded.groupBy("_band", "_bh").agg(
        F.slice(F.sort_array(F.collect_list("_id")), 1, max_bucket).alias("_ids")
    )
    pairs = (
        buckets.filter(F.size("_ids") > 1)
        .select(F.explode(F.expr(
            "flatten(transform(_ids, (x, i) -> transform(slice(_ids, i + 2, size(_ids)), y -> struct(x as a, y as b))))"
        )).alias("p"))
        .select(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .distinct()
    )
    # exact verify on candidates only: count common shingles via equi-join on
    # the flat frame (no arrays shuffled, no recompute of a per-doc array)
    a_flat = sh_flat.select(F.col("_id").alias("doc_a"), "_s")
    b_flat = sh_flat.select(F.col("_id").alias("doc_b"), "_s")
    common = (
        pairs.join(a_flat, "doc_a")
        .join(b_flat, ["doc_b", "_s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sig.select("_id", "_n_sh")
    sa = sizes.select(F.col("_id").alias("doc_a"), F.col("_n_sh").alias("_n_a"))
    sb = sizes.select(F.col("_id").alias("doc_b"), F.col("_n_sh").alias("_n_b"))
    verified = (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("_n_a") + F.col("_n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    return verified


def simhash_frame(df: DataFrame, text_col: str, id_col: str, num_bits: int = 64) -> DataFrame:
    """(_id, _sh) frame: 64-bit SimHash of each row's token multiset.

    Implementation is explode → one aggregation pass with 64 conditional-sum
    columns, then a projection folding signs into one bigint bitmask.  (A
    fold-per-bit Column expression is semantically identical but generates a
    64-lambda codegen blob whose compile time dominates; the exploded groupBy
    is a single vectorized pass and one shuffle on id.)"""
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(tokenize(F.col(text_col))).alias("_t")
    ).withColumn("_h", F.xxhash64("_t"))
    votes = toks.groupBy("_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"_v{i}")
            for i in range(num_bits)
        ]
    )
    mask = F.lit(0).cast("bigint")
    for i in range(num_bits):
        bit = F.when(F.col(f"_v{i}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        mask = mask + bit * F.lit(2**i if i < 63 else -(2**63)).cast("bigint")
    return votes.select("_id", mask.alias("_sh"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs by SimHash banding (pigeonhole: hamming <= 3
    over 4 x 16-bit bands guarantees one identical band), verified by exact
    Hamming distance."""
    bits = 64
    band_bits = bits // num_bands
    w = simhash_frame(df, text_col, id_col, bits)
    banded = w.select(
        "_id",
        "_sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("_sh"), i * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    for i in range(num_bands)
                ]
            )
        ).alias("_band", "_bh"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bh") == F.col("b._bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("doc_a"),
            F.col("b._id").alias("doc_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
