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
# coverage policy. Cumulative state entering round 12: all 219
# registrations driver-green at their latest check (zero failures
# ever); freshness floor is r6 for exactly q151/q152/q153, then the
# 42-query r7 tail (q154–q195 by number). ROUND 12 WINDOW (below), per
# VERDICT r11 next-step #1 ("retire the r7 tail; run q175/q193 early —
# r11 plan changes without a driver re-hash"), adjusted for THIS
# round's optimization work — every query whose executed plan changed
# in r12 runs early so the driver re-hashes it first:
#   - the 8 keeper anchors (one per signature tier: MERGE, time
#     travel, streaming CDC, medallion, cosine top-k, MinHash-LSH,
#     grouped agg, star join) — cross-round regression sentinels
#   - the r12 plan-changed queries: q169 (CMS sketch derived from
#     token counts), q175 (fused planes + undirected scoring), q188
#     (single-tokenize BM25), q193 (n_nodes literal + broadcast deg),
#     q209 (min_by mode aggregate), q204 (explode tally + broadcast
#     degrees) — q175/q193 are also VERDICT r11's early-run strays;
#     all but q209/q204 are r7-tail members anyway
#   - q151/q152/q153 (the r6 freshness floor, oldest rows in the corpus)
#   - 33 more of the r7 tail in registration order
# 8 + 6 + 3 + 33 = 50. q209's and q204's slots (r8-tail members
# promoted for their r12 plan changes) displace two tail slots vs
# VERDICT's 39-of-42 arithmetic, so FIVE r7 queries roll to r13 with
# the r8 tail (q185/q186/q187/q191/q195 — the registration-order
# tail, none of them r12-changed). Done-criterion: CORRECTNESS_r12
# 50/50 green; every
# r12 plan-changed query has a driver row ≥ r12; freshness floor
# rises to r7 except the five roll-overs. pytest's local DuckDB
# oracle-parity twin still exercises every registration every round.
_PRIORITY = [
    # keepers: one anchor per signature tier
    "q60_merge_upsert", "q63_time_travel_diff", "q92_streaming_cdc_apply",
    "q70_medallion_gold", "q40_cosine_topk", "q36_minhash_lsh_pairs",
    "q01_pricing_summary", "q05_nation_revenue",
    # r12 plan-changed (optimization round): driver re-hash FIRST
    "q169_cms_heavy_hitters", "q175_knn_graph", "q188_bm25_search",
    "q193_pagerank", "q209_gopher_repetition", "q204_triangle_count",
    # the r6 freshness floor
    "q151_conversion_funnel", "q152_card_redaction",
    "q153_approx_percentiles",
    # re-confirms: the r7 tail in registration order (newest row r7)
    "q154_part_cooccurrence", "q155_salted_skew_join",
    "q156_resample_gap_fill", "q157_variant_extraction",
    "q158_hll_sketch_union", "q162_correlation_matrix",
    "q163_referential_integrity", "q164_asof_join",
    "q181_rollup_subtotals", "q182_pivot_status_matrix",
    "q183_unpivot_metrics", "q184_set_operations",
    "q170_bigram_logprob", "q189_fuzzy_pairs",
    "q165_mmr_diversify", "q192_hard_negatives",
    "q161_right_to_be_forgotten", "q167_fsck_repair",
    "q168_symlink_manifest", "q172_informational_fk_audit",
    "q174_avro_migration", "q176_informational_pk_audit",
    "q159_stateful_timeout_sessions", "q160_state_store_introspection",
    "q171_stream_scd2_apply", "q173_stream_pit_enrich",
    "q166_robust_outliers", "q190_weighted_sample",
    "q177_sessionize", "q178_funnel",
    "q179_cohort_retention", "q180_event_transitions",
    "q194_merge_intervals",
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
