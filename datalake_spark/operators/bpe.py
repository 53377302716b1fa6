"""BPE tokenizer training on a Spark corpus — learn the merge table, not
just count tokens.

Classic byte-pair-encoding training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the reference archive has no
analog — LLM-brief item): repeatedly find the most frequent adjacent symbol
pair over the word-frequency dictionary and fuse it into a new symbol.  The
scale structure mirrors the original algorithm's: ONE corpus-wide shuffle
builds the word-frequency dict, and every merge round after that operates on
the VOCABULARY (Heaps-sublinear in corpus size), so training cost is
dominated by a single pass over the data no matter how many merges follow.

Determinism/portability discipline:
- ties broken (count desc, left asc, right asc) via min(struct(-cnt, a, b))
  — no window over the pair table;
- the top pair stays IN-PLAN (1-row broadcast cross join), never collected;
- merge application is plain string replace of " a b " inside the
  space-padded symbol sequence, iterated a fixed ``replace_passes`` times:
  both engines' replace() fuses non-overlapping occurrences left-to-right,
  and repeating it to fixpoint reproduces the canonical merge-all
  application (a run of m repeated symbols converges in <= ceil(m/2)
  passes, so passes = half the longest word is exact).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def _pairs_of(syms_col: str):
    """Adjacent symbol pairs of a pre-split symbol ARRAY column (guarded:
    1-symbol words yield no pairs, not a descending sequence() error).
    Takes the array, not the string — element_at(split(..)) inside the
    lambda would re-split the sequence per position."""
    return F.explode(
        F.when(
            F.size(F.col(syms_col)) >= 2,
            F.expr(
                f"transform(sequence(1, size({syms_col}) - 1), "
                f"i -> struct(element_at({syms_col}, i) as a, "
                f"element_at({syms_col}, i + 1) as b))"
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    replace_passes: int = 10,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merge rules over the corpus.

    Returns (rank, left, right, pair_count): rank-r is the r-th merge,
    pair_count its corpus frequency (weighted by word frequency) at the
    moment it was chosen.  ``replace_passes`` bounds merge application per
    round; it must be >= half the longest word's length for exactness
    (10 covers words up to 20 chars — raise for longer-tailed corpora).
    """
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
    )
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    seq = wc.select(
        "freq", F.concat_ws(" ", F.split(F.col("w"), "")).alias("seq")
    ).persist()
    merges = []
    for r in range(1, n_merges + 1):
        pair_cnt = (
            seq.select("freq", F.split(F.col("seq"), " ").alias("_syms"))
            .select("freq", _pairs_of("_syms").alias("p"))
            .select("freq", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pair_cnt.agg(
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("nc"),
                    F.col("a").alias("ta"),
                    F.col("b").alias("tb"),
                )
            ).alias("m")
        ).select(
            F.col("m.ta").alias("ta"),
            F.col("m.tb").alias("tb"),
            (-F.col("m.nc")).alias("tcnt"),
        )
        merges.append(
            top.select(
                F.lit(r).cast("int").alias("rank"),
                F.col("ta").alias("left"),
                F.col("tb").alias("right"),
                F.col("tcnt").cast("bigint").alias("pair_count"),
            )
        )
        pat = F.concat(F.lit(" "), F.col("ta"), F.lit(" "), F.col("tb"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("ta"), F.col("tb"), F.lit(" "))
        fused = F.concat(F.lit(" "), F.col("seq"), F.lit(" "))
        for _ in range(replace_passes):
            fused = F.replace(fused, pat, rep)
        seq = (
            seq.crossJoin(F.broadcast(top))
            .select("freq", F.trim(fused).alias("seq"))
            .persist()
        )
    return reduce(DataFrame.unionByName, merges)


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    replace_passes: int = 10,
) -> DataFrame:
    """Apply a learned merge table to a corpus: adds ``bpe_seq`` (the
    space-joined symbol sequence of the WHOLE text, words separated by the
    literal symbol ``▁``) and ``n_bpe_symbols``.  Merge rules apply in
    rank order with the trainer's replace-to-fixpoint semantics, so
    segmentation is exactly what the trained tokenizer would emit."""
    spaced = F.concat_ws(
        " ▁ ", F.transform(
            F.split(F.col(text_col), " "),
            lambda w: F.concat_ws(" ", F.split(w, "")),
        )
    )
    fused = F.concat(F.lit(" "), spaced, F.lit(" "))
    for left, right in merges:
        pat = F.lit(f" {left} {right} ")
        rep = F.lit(f" {left}{right} ")
        for _ in range(replace_passes):
            fused = F.replace(fused, pat, rep)
    out = F.trim(fused)
    return df.withColumn("bpe_seq", out).withColumn(
        "n_bpe_symbols", F.size(F.split(out, " ")).cast("bigint")
    )
