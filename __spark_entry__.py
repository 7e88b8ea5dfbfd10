"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual query surface lives in
``databricks_delta_lake_migration_spark.queries`` — one registration per
operator family from SURVEY.md §2 (+ [EXT] LLM-pipeline tier), each
carrying its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from databricks_delta_lake_migration_spark.queries import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: 6-way star join + grouped revenue aggregate
    (q05) on sf0.001."""
    q = all_queries()["q05_nation_revenue"]
    return q.fn(spark, "/root/testdata/sf0.001")


# The driver hash-checks the first 50 registrations; ordering is
# coverage policy. Cumulative driver-green state entering round 8:
# 194 of 199 round-7 registrations driver-green in some round; never
# checked are exactly q196–q200 (newer than the r7 window). ROUND 8
# WINDOW (below), per VERDICT r7 next-step #1:
#   - first-time rows for the 5 round-7 stragglers (q196 column
#     profile, q197 Benford, q198 skew profile, q199 bucketed join,
#     q200 prefix-Jaccard join)
#   - first-time rows for the 18 round-8 additions (q201 ExactSubstr
#     profile, q202 table diff, q203 RFM, q204 triangle count, q205
#     touch attribution, q206 EXISTS semi-join, q207 HOF vector
#     stats, q208 rolling distinct, q209 Gopher repetition, q210
#     conversion lag, q211 event throttle, q212 ordered string_agg,
#     q213 true debounce, q214 Pareto/ABC, q215 group-consistent
#     split, q216 stepped-decay engagement, q217 winsorize audit,
#     q218 HLL overlap)
#   - the 8 keeper anchors (one per signature tier: MERGE, time
#     travel, streaming CDC, medallion, cosine top-k, MinHash-LSH,
#     grouped agg, star join) — cross-round regression sentinels
#   - the 19 re-confirms whose only driver rows are r3/r4 (q30–q32,
#     q34, q35, q37, q43, q45, q46, q48–q50, q53, q77–q80, q83, q84)
#   (the r5-only re-confirms q02/q07/q09/q10/q16 rotate to round 9:
#   new registrations beat re-confirms, and 18 additions fill the
#   window exactly)
# 5 + 18 + 8 + 19 = 50. pytest's local DuckDB oracle-parity twin
# still exercises every registration every round.
_PRIORITY = [
    # first-timers: round-7 stragglers
    "q196_column_profile", "q197_benford_audit", "q198_skew_profile",
    "q199_bucketed_join", "q200_prefix_jaccard_join",
    # first-timers: round-8 additions
    "q201_exact_substring_profile", "q202_table_diff",
    "q203_rfm_segments", "q204_triangle_count",
    "q205_touch_attribution", "q206_semi_join_exists",
    "q207_vector_stats_hof", "q208_rolling_distinct",
    "q209_gopher_repetition", "q210_conversion_lag",
    "q211_event_throttle", "q212_ordered_string_agg",
    "q213_debounce_exact", "q214_pareto_abc",
    "q215_group_split_audit", "q216_decayed_engagement",
    "q217_winsorize_audit", "q218_hll_overlap",
    # keepers: one anchor per signature tier
    "q60_merge_upsert", "q63_time_travel_diff", "q92_streaming_cdc_apply",
    "q70_medallion_gold", "q40_cosine_topk", "q36_minhash_lsh_pairs",
    "q01_pricing_summary", "q05_nation_revenue",
    # re-confirms: r3/r4-only driver rows
    "q30_token_stats", "q31_language_profile", "q32_quality_scores",
    "q34_exact_dedup", "q35_jaccard_pairs", "q37_simhash",
    "q43_approx_distinct", "q45_salted_skew_agg", "q46_cosine_near_dup",
    "q48_ivf_topk", "q49_chunk_dedup", "q50_multimodal_features",
    "q53_pandas_udf_norm", "q77_word_entropy", "q78_near_dup_clusters",
    "q79_pii_redaction", "q80_sql_passthrough", "q83_top_tokens",
    "q84_medallion_tx_analytics",
]


def _ordered():
    qs = all_queries()
    ordered = {n: qs[n] for n in _PRIORITY if n in qs}
    ordered.update((n, q) for n, q in qs.items() if n not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
