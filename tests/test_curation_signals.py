"""Model-based checks for the r4 curation signals: seeded random corpora
(repetitive by construction) are scored by pure-Python reference models and
must match the Spark operators exactly — including the degenerate docs
(empty text, single word) that exercise the guard branches the fixed
testdata never hits."""

import random
from collections import Counter

import pytest

from datalake_spark.queries.pipeline_q import (
    chargram_commonness,
    repetition_signals,
)


def _corpus(seed, n_docs=40):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → heavy repetition
    rows = []
    for i in range(n_docs):
        n = rng.randint(0, 60)
        text = " ".join(rng.choice(vocab) for _ in range(n))  # "" when n=0
        rows.append((i, text))
    rows.append((n_docs, ""))        # empty text
    rows.append((n_docs + 1, "solo"))  # single word, no bigrams
    return rows


def _write(spark, tmp_path, rows, name):
    sf_dir = str(tmp_path / name)
    spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' as lang", "'s' as source",
        "length(text) as n_chars",
    ).write.parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def _model_repetition(rows):
    out = {}
    for doc_id, text in rows:
        w = text.split(" ")
        bi = Counter(tuple(w[i:i + 2]) for i in range(len(w) - 1))
        tri = Counter(tuple(w[i:i + 3]) for i in range(len(w) - 2))
        n_bi, n_tri = sum(bi.values()), sum(tri.values())
        dup_tri = sum(c for c in tri.values() if c > 1)
        out[doc_id] = (
            len(w), len(set(w)),
            (len(w) - len(set(w))) / len(w),
            max(bi.values()) if bi else 0,
            (max(bi.values()) / n_bi) if n_bi else 0.0,
            dup_tri,
            (dup_tri / n_tri) if n_tri else 0.0,
        )
    return out


def _model_chargram(rows):
    grams = {d: [t[i:i + 2] for i in range(len(t) - 1)]
             for d, t in rows if len(t) >= 2}
    corpus = Counter(g for gs in grams.values() for g in gs)
    return {
        d: (len(gs), sum(corpus[g] for g in gs),
            (sum(corpus[g] for g in gs) * 1000000) // len(gs))
        for d, gs in grams.items()
    }


@pytest.mark.parametrize("seed", [7, 23, 91])
class TestSignalModels:
    def test_repetition_signals_match_model(self, spark, tmp_path, seed):
        rows = _corpus(seed)
        sf_dir = _write(spark, tmp_path, rows, f"rep{seed}")
        model = _model_repetition(rows)
        got = {r["doc_id"]: r for r in repetition_signals(spark, sf_dir).collect()}
        assert set(got) == set(model)
        for d, (nw, nu, dwf, tbc, tbf, dto, dtf) in model.items():
            r = got[d]
            assert (r["n_words"], r["n_uniq_words"]) == (nw, nu), d
            assert r["top_bigram_cnt"] == tbc and r["dup_tri_occ"] == dto, d
            assert r["dup_word_frac"] == pytest.approx(dwf, abs=0), d
            assert r["top_bigram_frac"] == pytest.approx(tbf, abs=0), d
            assert r["dup_tri_frac"] == pytest.approx(dtf, abs=0), d

    def test_chargram_commonness_matches_model(self, spark, tmp_path, seed):
        rows = _corpus(seed)
        sf_dir = _write(spark, tmp_path, rows, f"cg{seed}")
        model = _model_chargram(rows)
        got = {r["doc_id"]: r for r in chargram_commonness(spark, sf_dir).collect()}
        assert set(got) == set(model)  # len<2 docs excluded on both sides
        for d, (n, s, micro) in model.items():
            r = got[d]
            assert (r["n_grams"], r["sum_cnt"], r["commonness_micro"]) == (
                n, s, micro), d
