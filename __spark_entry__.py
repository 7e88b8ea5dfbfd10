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


# The driver hash-checks the first 50 registrations; with 110 queries
# registered, ordering is coverage policy. Rounds 1–3 accumulated green
# driver rows for 50 queries; round 4 rotates the window to the 41
# queries that have never had a driver row (plus q39, red in r3 on a
# comparator encoding issue, now CSV-encoded). Round 5 should rotate in
# the remaining never-checked registrations — q93–q101 (curation, PQ,
# expectations, DV) and q102–q111 (IVM, streaming window agg/interval
# join/ingest-dedup, generated/identity columns, column mapping,
# semantic dedup, SQL time travel) — all already green under the local sf0.01 driver
# simulation this round. Eight keeper anchors — one per signature tier
# (MERGE, time travel, streaming CDC, medallion, cosine top-k,
# MinHash-LSH, grouped agg, star join) — stay in-window as cross-round
# regression sentinels. pytest's local DuckDB oracle-parity twin still
# exercises all 110 every round.
_PRIORITY = [
    # never-checked: relational / window / join / agg variants
    "q03_segment_daily_revenue", "q04_order_priority_late_ship",
    "q06_revenue_forecast", "q11_top_parts_per_brand",
    "q12_daily_revenue_delta", "q13_rolling_7day_revenue",
    "q14_nation_set_algebra", "q17_events_hourly_rollup",
    "q20_daily_transaction_analytics", "q21_customer_ltv",
    "q22_cohort_retention", "q23_currency_normalization",
    "q24_row_fingerprint", "q26_json_map_access", "q27_rollup_revenue",
    "q28_asof_last_purchase", "q29_range_join_ship_lag",
    "q54_group_percentiles", "q55_pivot_quantity", "q56_cube_revenue",
    "q57_nation_balance_full_outer", "q58_balance_distribution",
    "q59_quiet_customers", "q74_summary_stats",
    "q75_range_frame_revenue", "q81_price_histogram",
    "q82_multi_path_union",
    # never-checked: catalog + maintenance lifecycle (incl. RESTORE verdict)
    "q89_catalog_named_table", "q67_maintenance_metrics",
    # never-checked: gold medallion products
    "q85_medallion_user_ltv", "q86_medallion_cohorts",
    "q87_medallion_daily_kpis",
    # never-checked: LLM-pipeline text/dedup/similarity/multimodal variants
    "q33_dedup_stats", "q38_chargram_jaccard", "q42_embedding_stats",
    "q44_batch_topk", "q47_lsh_near_dup", "q51_frame_sample_plan",
    "q52_media_chunks", "q90_bpe_pretokens", "q91_corpus_filter",
    # red in r3 (driver comparator couldn't sort an array column) —
    # now CSV-encoded like q19; must land green this round
    "q39_winnow_fingerprints",
    # keepers: one anchor per signature tier
    "q60_merge_upsert", "q63_time_travel_diff", "q92_streaming_cdc_apply",
    "q70_medallion_gold", "q40_cosine_topk", "q36_minhash_lsh_pairs",
    "q01_pricing_summary", "q05_nation_revenue",
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
