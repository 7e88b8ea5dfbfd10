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
# coverage policy. Cumulative driver-green state entering round 7:
# 152 of 175 registrations have a green CORRECTNESS_r*.json row in
# some round; the 23 never-checked rows are exactly q154–q176.
# ROUND 7 WINDOW (below) retires ALL remaining rotation debt:
#   - the 10 round-5 tail registrations (q154 part co-occurrence,
#     q155 salted skew join, q156 resample gap-fill, q157 VARIANT
#     extraction, q158 HLL sketch union, q159 stateful timeout
#     sessions, q160 state-store introspection, q161
#     right-to-be-forgotten, q162 correlation matrix, q163
#     referential-integrity audit)
#   - the 13 round-6 additions (q164 as-of join, q165 MMR, q166
#     robust outliers, q167 FSCK REPAIR, q168 symlink manifest,
#     q169 count-min heavy hitters, q170 bigram LM scoring, q171
#     streaming SCD2 apply, q172 informational FK audit, q173
#     streaming point-in-time enrichment, q174 pure-python avro
#     migration, q175 approximate k-NN graph, q176 informational PK
#     audit)
#   - the 8 keeper anchors (one per signature tier: MERGE, time
#     travel, streaming CDC, medallion, cosine top-k, MinHash-LSH,
#     grouped agg, star join) that stay in-window every round as
#     cross-round regression sentinels
#   - 19 of the 21 round-7 additions (q177 sessionize, q178 funnel,
#     q179 cohort retention, q180 event transitions, q181 ROLLUP,
#     q182 PIVOT, q183 UNPIVOT, q184 INTERSECT/EXCEPT, q185 rolling
#     z-score, q186 grouped OLS trend, q187 equi-depth histogram,
#     q188 BM25 search, q189 fuzzy entity pairs, q190 weighted
#     sample, q191 quantile profile, q192 hard-negative mining,
#     q193 PageRank, q194 interval merge, q195 TWAP) — first-time
#     rows beat re-confirming rows that are already ever-green
#   - Deferred to the round-8 window (pytest-parity-checked every
#     round meanwhile): the two newest additions (q196 column
#     profile, q197 Benford audit) and the r3/r4-only re-confirms
#     (q30-q32, q34, q35, q37, q43, q45, q46, q48-q50, q53, q77,
#     q78-q80, q83, q84).
# 23 + 8 + 19 = 50. pytest's local DuckDB oracle-parity twin still
# exercises every registration every round.
_PRIORITY = [
    # never-checked: round-5 tail
    "q154_part_cooccurrence", "q155_salted_skew_join",
    "q156_resample_gap_fill", "q157_variant_extraction",
    "q158_hll_sketch_union", "q159_stateful_timeout_sessions",
    "q160_state_store_introspection", "q161_right_to_be_forgotten",
    "q162_correlation_matrix", "q163_referential_integrity",
    # never-checked: round-6 additions
    "q164_asof_join", "q165_mmr_diversify", "q166_robust_outliers",
    "q167_fsck_repair", "q168_symlink_manifest",
    "q169_cms_heavy_hitters", "q170_bigram_logprob",
    "q171_stream_scd2_apply", "q172_informational_fk_audit",
    "q173_stream_pit_enrich", "q174_avro_migration", "q175_knn_graph",
    "q176_informational_pk_audit",
    # keepers: one anchor per signature tier
    "q60_merge_upsert", "q63_time_travel_diff", "q92_streaming_cdc_apply",
    "q70_medallion_gold", "q40_cosine_topk", "q36_minhash_lsh_pairs",
    "q01_pricing_summary", "q05_nation_revenue",
    # never-checked: round-7 additions
    "q177_sessionize", "q178_funnel", "q179_cohort_retention",
    "q180_event_transitions", "q181_rollup_subtotals",
    "q182_pivot_status_matrix", "q183_unpivot_metrics",
    "q184_set_operations", "q185_rolling_zscore", "q186_group_trend",
    "q187_equidepth_histogram", "q188_bm25_search", "q189_fuzzy_pairs",
    "q190_weighted_sample", "q191_quantile_profile",
    "q192_hard_negatives", "q193_pagerank", "q194_merge_intervals",
    "q195_time_weighted_average",
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
