"""Digest batteries: fold several oracle-checked sub-queries into ONE
registry entry without losing value-level verification.

Why: the driver's correctness gate samples the first N registry entries, so
the declared surface must fit inside it.  Each battery returns one row per
sub-query — (subq, n_rows, digest) — where the digest is an order-insensitive
exact hash of the sub-query's full result set, computed identically by Spark
and DuckDB:

    row_str  = concat_ws(US, canon(col) for col in sorted(columns))
    row_hash = bigint(first 15 hex chars of md5(row_str))   # 60 bits
    digest   = SUM(row_hash) as DECIMAL(38,0) → string      # multiset-exact

SUM (not XOR) so duplicate-row multiplicity matters; DECIMAL(38,0) so neither
engine overflows.  A mismatch still localizes: each sub-query keeps its own
digest row.  The aggregation is map-side combinable — the digest adds one
narrow global agg on top of each sub-plan, no collect, scale-safe.

Canonicalization (cross-engine string equality):
- 'v'  verbatim CAST(x AS STRING): ints, strings, booleans, decimals — all
  render identically in Spark and DuckDB.
- 'd'  FLOOR(x·10⁶ + 0.5) as a BIGINT → string, for double/float columns of
  magnitude < ~1e12.  Raw double→string formatting differs between engines
  ("1.0E-7" vs "1e-07"), and decimal-correct ROUND diverges too: Spark
  rounds the double's EXACT binary expansion (BigDecimal) while DuckDB
  multiplies by 10^s in floats, so values near a .5 boundary at the 6th
  decimal split (observed at |x| ≈ 6e7 in a 10k-value stress test).  The
  canon doesn't need decimal-correct rounding — it needs the SAME
  deterministic function of the input double on both sides, and
  FLOOR(x·10⁶ + 0.5) is pure IEEE double arithmetic: multiply, add, floor
  are each bit-deterministic and engine-independent, so the quantized
  integer is identical everywhere, ties and all.
- 'd4' CAST(x AS DECIMAL(28,4)) for money-sum columns already ROUND(x, 4)-ed
  in the sub-query (magnitudes up to 1e10): 4-decimal grid points are never
  ties of a scale-4 cast (a/10^4 = odd/32 has no solution), and a 1e9-scale
  sum would overflow the 16 integer digits of 'd'.

NULLs map to a \\x01-sentinel; the \\x1f column separator cannot collide with
TPC-H/documents content.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_spark.queries import Q

_SEP = "\x1f"
_NULL = "\x01N"


@dataclass(frozen=True)
class Sub:
    """One battery member: the underlying Q plus its declared output schema
    as {column: kind} with kind ∈ {'v', 'd', 'd4'}.  The declaration feeds
    the DuckDB side (which cannot inspect a DataFrame schema); a unit test
    asserts it matches the Spark schema exactly."""

    q: Q
    cols: dict[str, str]


def _canon_spark(c: str, kind: str) -> F.Column:
    col = F.col(c)
    if kind == "d":
        e = F.floor(col * F.lit(1000000.0) + F.lit(0.5)).cast("string")
    elif kind == "d4":
        e = col.cast("decimal(28,4)").cast("string")
    else:
        e = col.cast("string")
    return F.coalesce(e, F.lit(_NULL))


def _canon_sql(c: str, kind: str) -> str:
    q = f'"{c}"'
    if kind == "d":
        e = f"CAST(CAST(FLOOR({q} * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR)"
    elif kind == "d4":
        e = f"CAST(CAST({q} AS DECIMAL(28,4)) AS VARCHAR)"
    else:
        e = f"CAST({q} AS VARCHAR)"
    return f"COALESCE({e}, chr(1) || 'N')"


def digest_df(df: DataFrame, name: str, cols: dict[str, str]) -> DataFrame:
    row = F.concat_ws(_SEP, *[_canon_spark(c, cols[c]) for c in sorted(cols)])
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("bigint")
    return (
        df.select(h.alias("_h"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.sum(F.col("_h").cast("decimal(38,0)")).cast("string"), F.lit("0")
            ).alias("digest"),
        )
        .select(F.lit(name).alias("subq"), "n_rows", "digest")
    )


def digest_sql(name: str, sub_sql: str, cols: dict[str, str]) -> str:
    row = "CONCAT_WS(chr(31), " + ", ".join(
        _canon_sql(c, cols[c]) for c in sorted(cols)
    ) + ")"
    return (
        f"SELECT '{name}' AS subq, COUNT(*) AS n_rows,\n"
        f"  COALESCE(CAST(SUM(CAST(CAST(CONCAT('0x', SUBSTR(md5({row}), 1, 15)) AS BIGINT)"
        f" AS DECIMAL(38,0))) AS VARCHAR), '0') AS digest\n"
        f"FROM (\n{sub_sql}\n) _sub"
    )


def battery(name: str, subs: list[Sub], doc: str) -> Q:
    def build(spark: SparkSession, sf_dir: str) -> DataFrame:
        dfs = [digest_df(s.q.build(spark, sf_dir), s.q.name, s.cols) for s in subs]
        return reduce(DataFrame.unionByName, dfs)

    oracle = "\nUNION ALL\n".join(
        digest_sql(s.q.name, s.q.oracle, s.cols) for s in subs
    )
    BATTERY_SUBS[name] = subs
    return Q(name, build, oracle, doc)


# ---------------------------------------------------------------------------
# Battery declarations.  Sub-query builders/SQL live in their home modules;
# only the registry entry is folded.
# ---------------------------------------------------------------------------
def _mk() -> list[Q]:
    from datalake_spark.queries import relational as r1
    from datalake_spark.queries import relational2 as r2
    from datalake_spark.queries import ops_q as ops
    from datalake_spark.queries import streaming_q as sq
    from datalake_spark.queries import windows_q as wq

    def q(mod, name, fn_name, sql_name):
        return Q(name, getattr(mod, fn_name), getattr(mod, sql_name), "")

    from datalake_spark.queries import datalake_q as dq
    from datalake_spark.queries import fuzz_q as fq
    from datalake_spark.queries import pipeline_q as pq

    joins = [
        Sub(q(r1, "q_semi_join", "q_semi_join", "Q_SEMI_SQL"),
            {"c_mktsegment": "v", "n_customers_with_orders": "v"}),
        Sub(q(r1, "q_anti_join", "q_anti_join", "Q_ANTI_SQL"),
            {"c_mktsegment": "v", "n_customers_without_orders": "v", "avg_acctbal": "d"}),
        Sub(q(r2, "q_left_outer", "q_left_outer", "Q_LEFT_OUTER_SQL"),
            {"o_orderpriority": "v", "n_orders": "v", "n_late_items": "v", "n_orders_no_late": "v"}),
        Sub(q(r2, "q_full_outer", "q_full_outer", "Q_FULL_OUTER_SQL"),
            {"nationkey": "v", "n_neg_customers": "v", "n_neg_suppliers": "v"}),
        Sub(q(ops, "q_cross_join", "q_cross_join", "Q_CROSS_SQL"),
            {"r_name": "v", "n_name": "v", "pair": "v"}),
        Sub(q(sq, "stream_band_join_batch", "stream_band_join_batch",
              "STREAM_BAND_JOIN_SQL"),
            {"user_id": "v", "imp_id": "v", "click_id": "v"}),
        Sub(q(r2, "q_disjunctive_join", "q_disjunctive_join", "Q_DISJUNCTIVE_SQL"),
            {"revenue": "d4", "n_rows": "v"}),
        Sub(q(pq, "fuzzy_join_lev1", "fuzzy_join_lev1", "FUZZY_JOIN_SQL"),
            {"s_a": "v", "s_b": "v", "dist": "v"}),
    ]
    aggs = [
        Sub(q(r1, "q_rollup", "q_rollup", "Q_ROLLUP_SQL"),
            {"l_returnflag": "v", "l_linestatus": "v", "n": "v", "sum_qty": "d4"}),
        Sub(q(r1, "q_cube", "q_cube", "Q_CUBE_SQL"),
            {"o_orderstatus": "v", "o_orderpriority": "v", "n": "v", "sum_price": "d4"}),
        Sub(q(ops, "q_grouping_sets", "q_grouping_sets", "_GROUPING_SETS_SQL"),
            {"l_returnflag": "v", "l_linestatus": "v", "n": "v", "sum_qty": "d4"}),
        Sub(q(r2, "q_having", "q_having", "Q_HAVING_SQL"),
            {"n_name": "v", "n_customers": "v", "avg_bal": "d"}),
        Sub(q(r2, "q_string_agg", "q_string_agg", "Q_STRING_AGG_SQL"),
            {"n_name": "v", "n_suppliers": "v", "supplier_names": "v"}),
        Sub(q(ops, "q_percentiles", "q_percentiles", "Q_PERCENTILES_SQL"),
            {"o_orderstatus": "v", "p50": "d", "p90": "d", "p99": "d"}),
        Sub(q(pq, "hll_distinct_verdict", "hll_distinct_verdict",
              "HLL_DISTINCT_SQL"),
            {"segment": "v", "n_exact": "v", "within_2pct": "v"}),
        Sub(q(pq, "q_moments", "q_moments", "Q_MOMENTS_SQL"),
            {"o_orderpriority": "v", "n": "v", "stddev_price": "d",
             "corr_xy": "d", "regr_slope": "d"}),
        Sub(q(pq, "q_quantile_verdict", "q_quantile_verdict",
              "Q_QUANTILE_VERDICT_SQL"),
            {"o_orderstatus": "v", "n": "v", "p50_exact": "d",
             "p90_exact": "d", "p50_in_bounds": "v", "p90_in_bounds": "v"}),
        Sub(q(pq, "q_corr_matrix", "q_corr_matrix", "Q_CORR_MATRIX_SQL"),
            {"col_a": "v", "col_b": "v", "n": "v", "corr": "d"}),
    ]
    windows = [
        Sub(q(r1, "q_window_running", "q_window_running", "Q_RUNNING_SQL"),
            {"l_suppkey": "v", "l_orderkey": "v", "l_linenumber": "v",
             "running_qty": "d", "prev_qty": "d", "next_qty": "d"}),
        Sub(q(r2, "q_window_analytic", "q_window_analytic", "Q_WINDOW_ANALYTIC_SQL"),
            {"o_orderkey": "v", "o_orderpriority": "v", "o_totalprice": "d",
             "quartile": "v", "pct_rank": "d", "cume": "d", "rnk": "v", "drnk": "v"}),
        Sub(q(r2, "q_range_frame", "q_range_frame", "Q_RANGE_FRAME_SQL"),
            {"c_custkey": "v", "nationkey": "v", "bal_cents": "v",
             "n_near": "v", "sum_near_cents": "v"}),
        Sub(q(wq, "q_value_navigation", "q_value_navigation", "Q_VALUE_NAV_SQL"),
            {"o_orderkey": "v", "o_orderpriority": "v", "o_totalprice": "d",
             "cheapest": "d", "priciest": "d", "third_cheapest": "d"}),
        Sub(q(wq, "q_moving_avg", "q_moving_avg", "Q_MOVING_AVG_SQL"),
            {"event_id": "v", "user_id": "v", "n_in_frame": "v", "moving_avg": "d"}),
    ]
    scalars = [
        Sub(q(r1, "q_scalar_string", "q_scalar_string", "Q_STRING_SQL"),
            {"p_partkey": "v", "brand_upper": "v", "name_lower": "v", "type_prefix": "v",
             "name_len": "v", "brand_type": "v", "brand_num": "v", "type_snake": "v",
             "brand_rev": "v", "key_padded": "v"}),
        Sub(q(r2, "q_math_funcs", "q_math_funcs", "Q_MATH_SQL"),
            {"p_partkey": "v", "abs_off": "v", "price_ceil": "v", "price_floor": "v",
             "price_r1": "d", "size_sqrt": "d", "price_ln": "d", "price_log10": "d",
             "size_sq": "d", "size_sign": "v", "size_hi": "v", "size_lo": "v",
             "size_mod7": "v"}),
        Sub(q(r1, "q_conditional", "q_conditional", "Q_CONDITIONAL_SQL"),
            {"disc_band": "v", "l_returnflag": "v", "n": "v", "n_taxed": "v",
             "discount_value": "d4"}),
        Sub(q(r2, "q_null_safe_eq", "q_null_safe_eq", "Q_NULL_SAFE_SQL"),
            {"cat": "v", "n": "v", "is_null_group": "v"}),
        Sub(q(r1, "q_scalar_datetime", "q_scalar_datetime", "Q_DATETIME_SQL"),
            {"o_orderkey": "v", "order_year": "v", "order_month": "v", "order_day": "v",
             "order_quarter": "v", "order_date": "v", "month_start": "v",
             "days_to_2002": "v", "due_date": "v"}),
    ]
    semistruct = [
        Sub(q(r2, "q_map_funcs", "q_map_funcs", "Q_MAP_SQL"),
            {"event_id": "v", "m_type": "v", "m_uid": "v", "m_missing": "v",
             "m_size": "v", "m_keys": "v"}),
        Sub(q(ops, "q_json", "q_json", "Q_JSON_SQL"),
            {"k_mod": "v", "n": "v", "k_min": "v", "k_max": "v"}),
        Sub(q(ops, "q_array_funcs", "q_array_funcs", "Q_ARRAY_SQL"),
            {"doc_id": "v", "first_tok": "v", "last_tok": "v", "has_spark": "v",
             "top3_sorted": "v", "n_non_the": "v"}),
        Sub(q(r2, "q_explode_pos", "q_explode_pos", "Q_EXPLODE_SQL"),
            {"vec_id": "v", "pos": "v", "val": "d"}),
        Sub(q(r2, "q_unpivot", "q_unpivot", "Q_UNPIVOT_SQL"),
            {"p_partkey": "v", "attr": "v", "val": "d"}),
    ]
    setops = [
        Sub(q(r1, "q_setops", "q_setops", "Q_SETOPS_SQL"),
            {"side": "v", "nationkey": "v"}),
        Sub(q(r2, "q_setops_all", "q_setops_all", "Q_SETOPS_ALL_SQL"),
            {"op": "v", "nationkey": "v", "multiplicity": "v"}),
        Sub(q(r2, "q_union_stats", "q_union_stats", "Q_UNION_STATS_SQL"),
            {"side": "v", "nationkey": "v", "n": "v", "avg_bal": "d"}),
        Sub(q(r2, "q_nulls_ordering", "q_nulls_ordering", "Q_NULLS_ORDERING_SQL"),
            {"event_id": "v", "val": "d"}),
    ]
    subqueries = [
        Sub(q(r2, "q_correlated_exists", "q_correlated_exists", "Q_CORR_EXISTS_SQL"),
            {"o_orderpriority": "v", "n_slow_orders": "v"}),
        Sub(q(r2, "q_scalar_subquery", "q_scalar_subquery", "Q_SCALAR_SUB_SQL"),
            {"below_avg_price": "d4", "n_rows": "v"}),
        Sub(q(r2, "q_sql_subqueries", "q_sql_subqueries", "_SUBQ_SQL"),
            {"c_mktsegment": "v", "n_customers": "v"}),
        Sub(q(fq, "fuzz_plans", "fuzz_plans", "FUZZ_PLANS_SQL"),
            {"seed": "v", "n_rows": "v", "vhash": "v"}),
    ]
    text = [
        Sub(q(pq, "text_stats", "text_stats", "TEXT_STATS_SQL"),
            {"doc_id": "v", "lang": "v", "n_chars_computed": "v", "n_tokens": "v",
             "n_stopwords": "v", "stop_ratio": "d", "n_unique_tokens": "v",
             "uniq_ratio": "d"}),
        Sub(q(pq, "text_quality", "text_quality", "TEXT_QUALITY_SQL"),
            {"doc_id": "v", "source": "v", "quality_score": "d", "keep": "v"}),
        Sub(q(pq, "text_normalize", "text_normalize", "TEXT_NORMALIZE_SQL"),
            {"doc_id": "v", "norm_text": "v", "norm_len": "v", "norm_hash": "v"}),
        Sub(q(pq, "token_bpe_count", "token_bpe_count", "TOKEN_BPE_SQL"),
            {"doc_id": "v", "source": "v", "n_bpe_tokens": "v", "n_word_tokens": "v",
             "chars_per_token": "d"}),
        Sub(q(ops, "lang_id_quality", "lang_id_quality", "LANG_ID_SQL"),
            {"doc_id": "v", "lang": "v", "lang_pred": "v", "quality_r": "d"}),
        Sub(q(pq, "tfidf_top_terms", "tfidf_top_terms", "TFIDF_SQL"),
            {"doc_id": "v", "rnk": "v", "term": "v", "tf": "v", "df": "v",
             "score_micro": "v"}),
        Sub(q(pq, "pii_scrub", "pii_scrub", "PII_SCRUB_SQL"),
            {"doc_id": "v", "n_emails": "v", "n_ips": "v", "n_phones": "v",
             "scrubbed": "v"}),
        Sub(q(pq, "corpus_report", "corpus_report", "CORPUS_REPORT_SQL"),
            {"source": "v", "n_docs": "v", "n_unique_texts": "v",
             "dup_ratio": "d", "total_chars": "v", "total_tokens": "v",
             "n_en": "v"}),
        Sub(q(pq, "repetition_signals", "repetition_signals",
              "REPETITION_SIGNALS_SQL"),
            {"doc_id": "v", "n_words": "v", "n_uniq_words": "v",
             "dup_word_frac": "d", "top_bigram_cnt": "v",
             "top_bigram_frac": "d", "dup_tri_occ": "v", "dup_tri_frac": "d"}),
        Sub(q(pq, "chargram_commonness", "chargram_commonness",
              "CHARGRAM_COMMONNESS_SQL"),
            {"doc_id": "v", "n_grams": "v", "sum_cnt": "v",
             "commonness_micro": "v"}),
        Sub(q(pq, "c4_filter_cascade", "c4_filter_cascade", "C4_FILTER_SQL"),
            {"doc_id": "v", "len_ok": "v", "stop_ok": "v", "lang_ok": "v",
             "is_canonical": "v", "keep": "v"}),
        Sub(q(pq, "ngram_novelty", "ngram_novelty", "NGRAM_NOVELTY_SQL"),
            {"doc_id": "v", "n_shingles": "v", "n_novel": "v",
             "novelty": "d"}),
        Sub(q(pq, "vocab_report", "vocab_report", "VOCAB_REPORT_SQL"),
            {"source": "v", "n_tokens": "v", "n_terms": "v", "n_hapax": "v",
             "top_term": "v", "top_cnt": "v", "top_share": "d"}),
        Sub(q(pq, "postings_index", "postings_index", "POSTINGS_INDEX_SQL"),
            {"term": "v", "df": "v", "n_stored": "v", "posting": "v"}),
        Sub(q(pq, "pmi_collocations", "pmi_collocations", "PMI_SQL"),
            {"l": "v", "r": "v", "c_xy": "v", "pmi_micro": "v"}),
        Sub(q(pq, "quality_classifier", "quality_classifier",
              "QUALITY_CLASSIFIER_SQL"),
            {"doc_id": "v", "n_terms": "v", "score_micro": "v",
             "label": "v"}),
        Sub(q(pq, "quality_classifier_weighted", "quality_classifier_weighted",
              "QUALITY_CLASSIFIER_WEIGHTED_SQL"),
            {"doc_id": "v", "n_terms": "v", "score_micro": "v",
             "label": "v"}),
        Sub(q(pq, "bm25_topk", "bm25_topk", "BM25_TOPK_SQL"),
            {"doc_id": "v", "score_micro": "v"}),
        Sub(q(pq, "skeleton_dedup", "skeleton_dedup", "SKELETON_DEDUP_SQL"),
            {"doc_id": "v", "skel_key": "v", "n_twins": "v",
             "canonical": "v"}),
        Sub(q(pq, "bpe_merges", "bpe_merges", "BPE_MERGES_SQL"),
            {"rank": "v", "left": "v", "right": "v", "pair_count": "v"}),
        Sub(q(pq, "bpe_segment_corpus", "bpe_segment_corpus",
              "BPE_SEGMENT_SQL"),
            {"doc_id": "v", "n_char_syms": "v", "n_bpe_syms": "v",
             "saved_micro": "v"}),
        Sub(q(pq, "length_histogram", "length_histogram",
              "LENGTH_HISTOGRAM_SQL"),
            {"source": "v", "bin": "v", "bin_lo": "v", "n_docs": "v"}),
    ]
    from datalake_spark.queries import tpch2

    tpch = [
        Sub(q(tpch2, "q12_priority_shipping", "q12_priority_shipping", "Q12_SQL"),
            {"l_returnflag": "v", "high_line_count": "v", "low_line_count": "v"}),
        Sub(q(tpch2, "q13_customer_distribution", "q13_customer_distribution", "Q13_SQL"),
            {"c_count": "v", "custdist": "v"}),
        Sub(q(tpch2, "q14_promo_share", "q14_promo_share", "Q14_SQL"),
            {"promo_revenue": "d4", "total_revenue": "d4", "promo_share_pct": "d"}),
        Sub(q(tpch2, "q22_dormant_customers", "q22_dormant_customers", "Q22_SQL"),
            {"cntrycode": "v", "numcust": "v", "totacctbal": "d4"}),
        Sub(q(tpch2, "q2_min_cost_supplier", "q2_min_cost_supplier", "Q2_SQL"),
            {"p_partkey": "v", "s_name": "v", "n_name": "v",
             "s_acctbal": "d", "cost": "d"}),
        Sub(q(tpch2, "q4_order_priority", "q4_order_priority", "Q4_SQL"),
            {"o_orderpriority": "v", "order_count": "v"}),
        Sub(q(tpch2, "q21_waiting_supplier", "q21_waiting_supplier", "Q21_SQL"),
            {"s_name": "v", "numwait": "v"}),
        Sub(q(tpch2, "q15_top_supplier", "q15_top_supplier", "Q15_SQL"),
            {"s_suppkey": "v", "s_name": "v", "total_revenue": "d4"}),
        Sub(q(tpch2, "q16_supplier_cnt", "q16_supplier_cnt", "Q16_SQL"),
            {"p_brand": "v", "p_type": "v", "p_size": "v",
             "supplier_cnt": "v"}),
        Sub(q(tpch2, "q20_excess_suppliers", "q20_excess_suppliers", "Q20_SQL"),
            {"s_suppkey": "v", "s_name": "v"}),
        Sub(q(tpch2, "q8_market_share", "q8_market_share", "Q8_SQL"),
            {"o_year": "v", "mkt_share": "d"}),
        Sub(q(tpch2, "q9_product_profit", "q9_product_profit", "Q9_SQL"),
            {"nation": "v", "o_year": "v", "sum_profit": "d4"}),
        Sub(q(tpch2, "q11_important_stock", "q11_important_stock", "Q11_SQL"),
            {"l_partkey": "v", "part_value": "d4"}),
    ]
    pipeline = [
        Sub(q(ops, "image_roundtrip", "image_roundtrip", "IMAGE_ROUNDTRIP_SQL"),
            {"doc_id": "v", "width": "v", "height": "v", "format": "v"}),
        Sub(q(ops, "jpeg_roundtrip", "jpeg_roundtrip", "JPEG_ROUNDTRIP_SQL"),
            {"doc_id": "v", "width": "v", "height": "v", "channels": "v",
             "mean_px": "d", "px_std": "d", "px_grad": "d"}),
        Sub(q(ops, "jpeg_gradient", "jpeg_gradient", "JPEG_GRADIENT_SQL"),
            {"doc_id": "v", "px": "v", "cnt": "v"}),
        Sub(q(ops, "audio_roundtrip", "audio_roundtrip", "AUDIO_ROUNDTRIP_SQL"),
            {"doc_id": "v", "channels": "v", "sample_rate": "v",
             "duration_ms": "v", "rms": "d", "peak": "d", "zcr": "d"}),
        Sub(q(ops, "audio_sniff_roundtrip", "audio_sniff_roundtrip",
              "AUDIO_SNIFF_SQL"),
            {"doc_id": "v", "container": "v", "channels": "v",
             "sample_rate": "v", "flac_duration_ms": "v"}),
        Sub(q(ops, "video_sniff_roundtrip", "video_sniff_roundtrip",
              "VIDEO_SNIFF_SQL"),
            {"doc_id": "v", "container": "v", "duration_ms": "v",
             "n_tracks": "v", "n_video": "v", "n_audio": "v",
             "width": "v", "height": "v"}),
        Sub(q(ops, "video_real_roundtrip", "video_real_roundtrip",
              "VIDEO_REAL_ROUNDTRIP_SQL"),
            {"doc_id": "v", "frame_idx": "v", "frame_ms": "v",
             "px": "v", "cnt": "v"}),
        Sub(q(ops, "video_roundtrip", "video_roundtrip", "VIDEO_ROUNDTRIP_SQL"),
            {"doc_id": "v", "frame_idx": "v", "frame_ms": "v", "width": "v",
             "height": "v", "mean_px": "d"}),
        Sub(q(pq, "embedding_centroids", "embedding_centroids", "EMBEDDING_CENTROIDS_SQL"),
            {"label": "v", "pos": "v", "centroid_r": "d", "n_vectors": "v"}),
        Sub(q(pq, "dataset_split", "dataset_split", "DATASET_SPLIT_SQL"),
            {"source": "v", "split": "v", "n_docs": "v", "min_doc_id": "v"}),
        Sub(q(pq, "embedding_near_dup", "embedding_near_dup", "EMBEDDING_NEAR_DUP_SQL"),
            {"id_a": "v", "id_b": "v", "cosine_r": "d"}),
        Sub(q(pq, "token_packing", "token_packing", "TOKEN_PACKING_SQL"),
            {"source": "v", "bin": "v", "n_docs": "v", "sum_tokens": "v",
             "first_doc": "v"}),
        Sub(q(pq, "contamination", "contamination", "CONTAMINATION_SQL"),
            {"corpus_id": "v", "probe_id": "v", "n_common": "v",
             "containment": "d"}),
        Sub(q(ops, "dedup_clusters", "dedup_clusters", "DEDUP_CLUSTERS_SQL"),
            {"doc_id": "v", "cluster_id": "v", "cluster_size": "v",
             "keep": "v"}),
        Sub(q(pq, "stratified_sample", "stratified_sample",
              "STRATIFIED_SAMPLE_SQL"),
            {"source": "v", "doc_id": "v", "sample_rank": "v"}),
        Sub(q(pq, "embedding_dedup_clusters", "embedding_dedup_clusters",
              "EMBEDDING_DEDUP_CLUSTERS_SQL"),
            {"vec_id": "v", "cluster_id": "v"}),
        Sub(q(pq, "semantic_dedup", "semantic_dedup_q", "SEMANTIC_DEDUP_SQL"),
            {"vec_id": "v", "cluster": "v", "canonical": "v", "keep": "v"}),
        Sub(q(pq, "semantic_incremental", "semantic_incremental",
              "SEMANTIC_INCREMENTAL_SQL"),
            {"doc_a": "v", "doc_b": "v", "cosine": "d"}),
        Sub(q(pq, "kmeans_2iter", "kmeans_2iter", "KMEANS_SQL"),
            {"vec_id": "v", "cluster": "v", "dist_sq": "d"}),
        Sub(q(pq, "deterministic_shuffle", "deterministic_shuffle",
              "DETERMINISTIC_SHUFFLE_SQL"),
            {"shard": "v", "pos": "v", "doc_id": "v", "skey": "v"}),
        Sub(q(pq, "shard_stats", "shard_stats", "SHARD_STATS_SQL"),
            {"shard": "v", "n_docs": "v", "total_chars": "v",
             "min_doc": "v", "max_doc": "v"}),
        # r9 additions: PQ-ADC ANN + mixture-building + profiling
        Sub(q(ops, "ann_pq_topk", "ann_pq_topk", "ANN_PQ_SQL"),
            {"q_id": "v", "c_id": "v", "adc": "v", "rk": "v"}),
        # r10: the IVF-PQ serving composition (coarse cells prune WHICH
        # codes are read, PQ compresses WHAT is read)
        Sub(q(ops, "ann_ivfpq_topk", "ann_ivfpq_topk", "ANN_IVFPQ_SQL"),
            {"q_id": "v", "c_id": "v", "adc": "v", "rk": "v"}),
        # r11: the STANDING index — build/append under the marker-CAS
        # commit protocol, probed through a reloaded handle; r12 adds
        # the rebuild (retrain-and-swap) verb and a post-rebuild probe
        Sub(q(ops, "ann_index_lifecycle", "ann_index_lifecycle",
              "ANN_INDEX_LIFECYCLE_SQL"),
            {"q_id": "v", "c_id": "v", "adc": "v", "rk": "v",
             "stage": "v"}),
        # r11: in-plan recall verdict — brute-force truth vs ivfpq in
        # one plan, per-query hit counts value-gated in both engines
        Sub(q(ops, "ann_recall_verdict", "ann_recall_verdict",
              "ANN_RECALL_SQL"),
            {"q_id": "v", "n_hits": "v", "denom": "v"}),
        # r12: the two ANN design claims as gated numbers — trained-vs-
        # coreset on the isotropic embeddings, residual-vs-raw on a
        # synthesized 64-cluster mixture (more clusters than codewords,
        # the IVFADC regime); per-query hits + per-config totals
        Sub(q(ops, "ann_clustered_recall", "ann_clustered_recall",
              "ANN_CLUSTERED_RECALL_SQL"),
            {"config": "v", "q_id": "v", "n_hits": "v", "denom": "v"}),
        # r11: perceptual-hash image near-dup — real PNG codec + integer
        # DCT pHash + pigeonhole banding, oracle replays the arithmetic
        # codec-free (pixel formula -> cos-table DCT -> threshold ->
        # bands -> XOR popcount)
        Sub(q(ops, "image_phash_pairs", "image_phash_pairs",
              "IMAGE_PHASH_SQL"),
            {"doc_a": "v", "doc_b": "v", "hamming": "v"}),
        # r10: CCNet-style LM-likelihood quality scoring (exact integer
        # mean token probability — no float log-sums)
        Sub(q(pq, "lm_quality_score", "lm_quality_score", "LM_QUALITY_SQL"),
            {"doc_id": "v", "n_bigrams": "v", "oov_contexts": "v",
             "lm_score_micro": "v"}),
        # r11: DSIR importance weighting (Xie et al. 2023) — the weights
        # are genuine log-ratios, gated exactly via the fixed-point
        # integer log2 (functions/intmath.py)
        Sub(q(pq, "dsir_select", "dsir_select", "DSIR_SELECT_SQL"),
            {"doc_id": "v", "n_feats": "v", "dsir_logw_fp": "v"}),
        Sub(q(pq, "weighted_sample", "weighted_sample",
              "WEIGHTED_SAMPLE_SQL"),
            {"source": "v", "doc_id": "v", "weight": "v", "priority": "v",
             "sample_rank": "v"}),
        Sub(q(pq, "budget_mix", "budget_mix", "BUDGET_MIX_SQL"),
            {"source": "v", "doc_id": "v", "cum_chars": "v", "budget": "v"}),
        Sub(q(pq, "table_profile", "table_profile", "TABLE_PROFILE_SQL"),
            {"col_name": "v", "n_rows": "v", "n_null": "v", "n_distinct": "v",
             "min_v": "v", "max_v": "v"}),
        # r10: the documented 100 TB swap (approx_count_distinct) as
        # verified code — HLL verdict vs the exact counts per column
        Sub(q(pq, "table_profile_approx", "table_profile_approx",
              "TABLE_PROFILE_APPROX_SQL"),
            {"col_name": "v", "n_distinct": "v", "approx_ok": "v"}),
        Sub(q(pq, "embedding_quantize", "embedding_quantize",
              "EMBEDDING_QUANTIZE_SQL"),
            {"vec_id": "v", "n_dims": "v", "sum_q": "v", "sum_abs_q": "v",
             "max_abs_q": "v"}),
        Sub(q(pq, "near_dup_triangles", "near_dup_triangles",
              "NEAR_DUP_TRIANGLES_SQL"),
            {"v1": "v", "v2": "v", "v3": "v"}),
        Sub(q(pq, "span_dedup", "span_dedup", "SPAN_DEDUP_SQL"),
            {"doc_id": "v", "n_tokens": "v", "n_dup_starts": "v",
             "n_removed": "v", "cleaned_md5": "v"}),
        Sub(q(pq, "domain_mix_sample", "domain_mix_sample", "DOMAIN_MIX_SQL"),
            {"source": "v", "doc_id": "v", "bucket": "v"}),
        Sub(q(pq, "minhash_incremental", "minhash_incremental",
              "MINHASH_INCREMENTAL_SQL"),
            {"doc_a": "v", "doc_b": "v", "n_common": "v", "jaccard": "d"}),
        Sub(q(pq, "pagerank_2iter", "pagerank_2iter", "PAGERANK_SQL"),
            {"node": "v", "rank_micro": "v"}),
        Sub(q(pq, "k_anonymize", "k_anonymize", "K_ANONYMIZE_SQL"),
            {"doc_id": "v", "lang_out": "v", "source_out": "v",
             "band_out": "v", "gen_level": "v"}),
        Sub(q(pq, "curriculum_interleave", "curriculum_interleave",
              "CURRICULUM_INTERLEAVE_SQL"),
            {"doc_id": "v", "source": "v", "band": "v",
             "rank_in_source": "v", "pos": "v"}),
        Sub(q(pq, "decontamination", "decontamination",
              "DECONTAMINATION_SQL"),
            {"doc_id": "v", "n_grams": "v", "n_contaminated": "v",
             "contaminated": "v"}),
        Sub(q(pq, "sequence_packing", "sequence_packing",
              "SEQUENCE_PACKING_SQL"),
            {"doc_id": "v", "shard": "v", "n_tokens": "v", "seq_id": "v",
             "offset_tokens": "v"}),
    ]
    event_windows = [
        Sub(q(wq, "q_tumbling_window", "q_tumbling_window", "Q_TUMBLING_SQL"),
            {"w_start_ms": "v", "event_type": "v", "n_events": "v", "sum_value": "d4"}),
        Sub(q(wq, "q_sliding_window", "q_sliding_window", "Q_SLIDING_SQL"),
            {"w_start_ms": "v", "w_end_ms": "v", "n_events": "v", "sum_value": "d4"}),
        Sub(q(wq, "q_session_window", "q_session_window", "Q_SESSION_WINDOW_SQL"),
            {"user_id": "v", "session_start_ms": "v", "session_end_ms": "v",
             "n_events": "v", "sum_value": "d4"}),
        Sub(q(pq, "funnel_analysis", "funnel_analysis", "FUNNEL_SQL"),
            {"user_id": "v", "stage": "v", "t1_ms": "v", "t2_ms": "v",
             "t3_ms": "v"}),
        Sub(q(pq, "cohort_retention", "cohort_retention",
              "COHORT_RETENTION_SQL"),
            {"cohort_week": "v", "week_offset": "v", "n_active": "v",
             "n_cohort": "v", "retention": "d"}),
        Sub(q(dq, "dl_freshness", "dl_freshness", "DL_FRESHNESS_SQL"),
            {"what": "v", "n_files": "v", "n_instant": "v",
             "p50_lag_ms": "d", "p99_lag_ms": "d", "max_lag_ms": "v",
             "work_id_share": "d"}),
        Sub(q(pq, "rolling_active_users", "rolling_active_users",
              "ROLLING_ACTIVE_SQL"),
            {"day": "v", "dau": "v", "wau": "v", "stickiness": "d"}),
        Sub(q(pq, "event_sequences", "event_sequences",
              "EVENT_SEQUENCES_SQL"),
            {"t1": "v", "t2": "v", "t3": "v", "n_occurrences": "v"}),
    ]

    return [
        battery("q_join_battery", joins,
                "semi/anti/left/full-outer/cross/disjunctive joins, digest-verified"),
        battery("q_agg_battery", aggs,
                "rollup/cube/grouping sets/having/string_agg/percentiles, digest-verified"),
        battery("q_window_battery", windows,
                "running/analytic/RANGE frame/value-nav/moving-avg windows, digest-verified"),
        battery("q_scalar_battery", scalars,
                "string/math/conditional/null-safe/datetime scalar fns, digest-verified"),
        battery("q_semistruct_battery", semistruct,
                "map/JSON/array/posexplode/unpivot, digest-verified"),
        battery("q_setops_battery", setops,
                "EXCEPT/INTERSECT/UNION (+ALL) + NULLS FIRST/OFFSET, digest-verified"),
        battery("q_subquery_battery", subqueries,
                "correlated EXISTS / scalar / IN+NOT IN subqueries, digest-verified"),
        battery("text_battery", text,
                "text stats/quality/normalize/BPE-count/lang-id, digest-verified"),
        battery("q_event_window_battery", event_windows,
                "tumbling/sliding/session event-time windows, digest-verified"),
        battery("q_tpch_battery", tpch,
                "TPC-H Q12/Q13/Q14/Q22 shapes, digest-verified"),
        battery("pipeline_battery", pipeline,
                "embedding centroids / dataset split / embedding near-dup, digest-verified"),
    ]


BATTERY_SUBS: dict[str, list[Sub]] = {}


def queries() -> list[Q]:
    return _mk()


def folded_names() -> frozenset[str]:
    """Names of the sub-queries absorbed into batteries (to drop from the
    flat registry)."""
    _mk()  # populate BATTERY_SUBS
    return frozenset(s.q.name for subs in BATTERY_SUBS.values() for s in subs)
