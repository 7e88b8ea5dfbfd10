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
# coverage policy. Cumulative state entering round 10: all 218
# registrations (217 + q219, new this round) driver-green at their
# latest check (zero failures ever); 41 queries' NEWEST row is r5.
# ROUND 10 WINDOW (below), per VERDICT r9 next-step #1 ("freshness
# rotation — retire the r5 tail"); new registrations take slots
# first, exactly one this round:
#   - the 8 keeper anchors (one per signature tier: MERGE, time
#     travel, streaming CDC, medallion, cosine top-k, MinHash-LSH,
#     grouped agg, star join) — cross-round regression sentinels
#   - q219 (FIRST-TIMER: Auto Loader schema inference parity —
#     schema-less start pins the inferred schema under the
#     checkpoint, restart reuses it, type drift raises naming the
#     column; VERDICT r9 #5)
#   - the 41 re-confirms whose NEWEST driver row is r5 (q02,
#     q07–q10, q15, q16, q18, q19, q25, q41, q61, q62, q64–q66,
#     q68, q71–q73, q76, q88, q93–q111)
# 8 + 1 + 41 = 50. Done-criterion: CORRECTNESS_r10 50/50 green and
# no query's newest row older than r6. pytest's local DuckDB
# oracle-parity twin still exercises every registration every round.
# NOTE: q36/q47/q114 (LSH bucket_cap, default 128) and q217
# (hint-free winsorize bounds join) changed PLANS this round but not
# results on the fixtures (max LSH bucket there is 9 ≪ 128; measured
# via the oracle's own banding in DuckDB) — q36 is a keeper anchor
# and all four are re-proven by the pytest twin this round.
_PRIORITY = [
    # keepers: one anchor per signature tier
    "q60_merge_upsert", "q63_time_travel_diff", "q92_streaming_cdc_apply",
    "q70_medallion_gold", "q40_cosine_topk", "q36_minhash_lsh_pairs",
    "q01_pricing_summary", "q05_nation_revenue",
    # first-timer (round 10)
    "q219_stream_schema_inference",
    # re-confirms: the r5 tail (newest driver row is r5)
    "q02_top_orders_by_revenue", "q07_conditional_agg",
    "q08_distinct_counts", "q09_null_profile",
    "q10_latest_event_per_user", "q15_customers_without_orders",
    "q16_global_kpis", "q18_sessionization",
    "q19_daily_user_activity", "q25_quality_report",
    "q41_ann_lsh_topk", "q61_merge_conditional",
    "q62_update_delete", "q64_cdf_summary",
    "q65_replace_where", "q66_scd2_dimension",
    "q68_cdc_mirror", "q71_bronze_stamping",
    "q72_windowed_event_counts", "q73_session_windows",
    "q76_history_rollup", "q88_scd2_users_state",
    "q93_sequence_packing", "q94_data_mixture",
    "q95_decontamination", "q96_pq_topk",
    "q97_ivfpq_topk", "q98_corpus_pipeline",
    "q99_expectations_gate", "q100_stratified_sample",
    "q101_dv_delete", "q102_incremental_gold",
    "q103_stream_windowed_agg", "q104_generated_columns",
    "q105_rename_drop_column", "q106_identity_column",
    "q107_semantic_dedup", "q108_stream_interval_join",
    "q109_stream_ingest_dedup", "q110_sql_time_travel",
    "q111_convert_to_delta",
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
