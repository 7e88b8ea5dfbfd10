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
# coverage policy. Cumulative state entering round 9: all 217
# registrations driver-green at their latest check (zero failures
# ever); 83 queries' NEWEST row is r4/r5. ROUND 9 WINDOW (below), per
# VERDICT r8 next-step #1 ("freshness rotation — retire the r4
# tail"): round 9 ships NO new registrations (a consolidation round —
# ADVICE fixes, table_diff/avro/winsorize semantics, bench artifact),
# so the window is exactly the verdict's prescription:
#   - the 8 keeper anchors (one per signature tier: MERGE, time
#     travel, streaming CDC, medallion, cosine top-k, MinHash-LSH,
#     grouped agg, star join) — cross-round regression sentinels
#   - the 42 re-confirms whose NEWEST driver row is r4 (q03, q04,
#     q06, q11–q14, q17, q20–q24, q26–q29, q33, q38, q39, q42, q44,
#     q47, q51, q52, q54–q59, q67, q74, q75, q81, q82, q85–q87,
#     q89–q91)
# 8 + 42 = 50. Done-criterion: CORRECTNESS_r09 50/50 green and no
# query's newest row older than r5. The r5-only tail (41 queries,
# incl. q02/q07/q09/q10/q16) rotates to round 10. pytest's local
# DuckDB oracle-parity twin still exercises every registration every
# round. NOTE: q203 (RFM NULLS pin) and q202 (null-safe key join)
# changed semantics this round ONLY for inputs the sf fixtures don't
# contain (NULL amounts / NULL keys); their r8 rows stay valid and
# both are re-verified by the pytest twin + new unit tests.
_PRIORITY = [
    # keepers: one anchor per signature tier
    "q60_merge_upsert", "q63_time_travel_diff", "q92_streaming_cdc_apply",
    "q70_medallion_gold", "q40_cosine_topk", "q36_minhash_lsh_pairs",
    "q01_pricing_summary", "q05_nation_revenue",
    # re-confirms: the r4 tail (newest driver row is r4)
    "q03_segment_daily_revenue", "q04_order_priority_late_ship",
    "q06_revenue_forecast", "q11_top_parts_per_brand",
    "q12_daily_revenue_delta", "q13_rolling_7day_revenue",
    "q14_nation_set_algebra", "q17_events_hourly_rollup",
    "q20_daily_transaction_analytics", "q21_customer_ltv",
    "q22_cohort_retention", "q23_currency_normalization",
    "q24_row_fingerprint", "q26_json_map_access",
    "q27_rollup_revenue", "q28_asof_last_purchase",
    "q29_range_join_ship_lag", "q33_dedup_stats",
    "q38_chargram_jaccard", "q39_winnow_fingerprints",
    "q42_embedding_stats", "q44_batch_topk",
    "q47_lsh_near_dup", "q51_frame_sample_plan",
    "q52_media_chunks", "q54_group_percentiles",
    "q55_pivot_quantity", "q56_cube_revenue",
    "q57_nation_balance_full_outer", "q58_balance_distribution",
    "q59_quiet_customers", "q67_maintenance_metrics",
    "q74_summary_stats", "q75_range_frame_revenue",
    "q81_price_histogram", "q82_multi_path_union",
    "q85_medallion_user_ltv", "q86_medallion_cohorts",
    "q87_medallion_daily_kpis", "q89_catalog_named_table",
    "q90_bpe_pretokens", "q91_corpus_filter",
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
