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
# coverage policy. Cumulative state entering round 11: all 219
# registrations (218 + q220, new this round) driver-green at their
# latest check (zero failures ever); the oldest freshness tier is the
# 42-query r6 tail (q112–q153). ROUND 11 WINDOW (below), per VERDICT
# r10 next-step #1 ("freshness rotation — retire the r6 tail, leading
# with the plan-changed strays"); new registrations take slots first,
# exactly one this round:
#   - the 8 keeper anchors (one per signature tier: MERGE, time
#     travel, streaming CDC, medallion, cosine top-k, MinHash-LSH,
#     grouped agg, star join) — cross-round regression sentinels
#   - q220 (FIRST-TIMER: Auto Loader useNotifications parity —
#     notification-queue file discovery that never lists the data
#     directory: decoy invisible, duplicate notification a no-op;
#     VERDICT r10 #5)
#   - the r10 plan-changed strays without a ≥r10 driver row: q114
#     (incremental-LSH salt cap, in the r6 tail anyway — run FIRST),
#     q217 (hint-free winsorize bounds join, newest row r8), q47
#     (LSH cap default, newest row r9)
#   - 38 more of the r6 tail in order (q112, q113, q115–q150)
# 8 + 1 + 3 + 38 = 50. q151/q152/q153 roll to r12 with the r7 tail
# (the one-new-registration slot displacement VERDICT r10 #1
# anticipates: "new registrations take slots first as usual").
# Done-criterion: CORRECTNESS_r11 50/50 green; every r10 plan-changed
# query has a driver row ≥ r10. pytest's local DuckDB oracle-parity
# twin still exercises every registration every round.
_PRIORITY = [
    # keepers: one anchor per signature tier
    "q60_merge_upsert", "q63_time_travel_diff", "q92_streaming_cdc_apply",
    "q70_medallion_gold", "q40_cosine_topk", "q36_minhash_lsh_pairs",
    "q01_pricing_summary", "q05_nation_revenue",
    # first-timer (round 11)
    "q220_notification_discovery",
    # r10 plan-changed strays, led by q114
    "q114_incremental_lsh", "q217_winsorize_audit", "q47_lsh_near_dup",
    # re-confirms: the r6 tail (newest driver row is r6)
    "q112_bloom_index_skipping", "q113_copy_into",
    "q115_persisted_ivf_index", "q116_chunk_documents",
    "q117_contamination_scores", "q118_show_partitions",
    "q119_write_tuning", "q120_schema_metadata",
    "q121_shard_shuffle", "q122_quality_top_fraction",
    "q123_boilerplate_strip", "q124_type_widening",
    "q125_liquid_clustering", "q126_log_retention",
    "q127_unigram_logprob", "q128_vacuum_lite",
    "q129_column_defaults", "q130_row_tracking",
    "q131_commit_annotations", "q132_tfidf_top_terms",
    "q133_sq8_topk", "q134_catalog_views",
    "q135_stream_enrich", "q136_protocol_features",
    "q137_intradoc_dedup", "q138_classifier_filter",
    "q139_text_normalization", "q140_bq_topk",
    "q141_stream_outer_interval_join", "q142_stream_session_windows",
    "q143_binned_range_join", "q144_stateful_running_totals",
    "q145_table_stream_source", "q146_stream_change_feed",
    "q147_cdc_replication_pipeline", "q148_quarantine_routing",
    "q149_sample_k_per_group", "q150_pca_embeddings",
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
