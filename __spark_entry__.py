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


# The driver hash-checks the first 50 registrations; with queries
# numbered to q163 (q69 unused), ordering is
# coverage policy (162 registered). Rounds 1-4 accumulated green driver rows for 91
# distinct queries; round 5 rotates in the 19 round-4 registrations
# (q93–q111: curation, PQ/IVF-PQ, expectations/sampling, deletion
# vectors, incremental gold, the three streaming hard oracles,
# generated/identity columns, column mapping, semantic dedup, SQL time
# travel, CONVERT TO DELTA) — with these green every one of the 110
# pre-round-5 registrations has a hard driver row in some round. Eight
# keeper anchors — one per signature tier (MERGE, time travel,
# streaming CDC, medallion, cosine top-k, MinHash-LSH, grouped agg,
# star join) — stay in-window as cross-round regression sentinels; the
# remaining 23 slots re-confirm rows whose only green driver row is
# from rounds 1–3. pytest's local DuckDB oracle-parity twin still
# exercises all 162 every round.
# ROUNDS 6-7 MUST rotate in the 52 round-5 registrations (two windows'
# worth — split roughly q112–q137 then q138–q163, keeping the eight
# anchors), all green under the local sf0.01 driver simulation this
# round: q112 bloom index,
# q113 COPY INTO, q114 incremental LSH, q115 persisted IVF index,
# q116 chunking, q117 contamination scoring, q118 SHOW PARTITIONS,
# q119 write tuning, q120 schema metadata, q121 shard shuffle,
# q122 quality top-fraction, q123 boilerplate strip, q124 type
# widening, q125 liquid clustering, q126 log retention, q127 unigram
# logprob, q128 VACUUM LITE, q129 column DEFAULTs, q130 row tracking,
# q131 commit annotations, q132 tf-idf top terms, q133 SQ8 ANN,
# q134 catalog views, q135 stream-static enrichment, q136 protocol
# table-features lifecycle, q137 intra-document repetition removal,
# q138 hashed-classifier quality filter, q139 unicode text
# normalization, q140 binary-quantization ANN, q141 stream-stream
# left-outer interval join, q142 streaming append-mode session
# windows, q143 binned no-equi-key range join, q144 stateful
# running totals (applyInPandasWithState), q145 log table as a
# streaming source (readStream-from-table), q146 streaming change
# data feed, q147 CDC replication pipeline (feed -> MERGE-apply),
# q148 expectation quarantine routing, q149 exactly-k-per-group
# deterministic sampling, q150 PCA embedding compression,
# q151 ordered conversion funnel, q152 Luhn-validated card
# redaction, q153 approx-percentile sketch verdict, q154
# market-basket pair co-occurrence, q155 salted skew join, q156
# resample gap-fill, q157 VARIANT semi-structured extraction,
# q158 mergeable HLL sketch rollup, q159 custom-state sessions
# with event-time timeouts, q160 state-store introspection,
# q161 GDPR right-to-be-forgotten (delete+vacuum erasure proof),
# q162 one-pass correlation profiling, q163 referential-integrity
# audit.
_PRIORITY = [
    # never-checked: curation tier
    "q93_sequence_packing", "q94_data_mixture", "q95_decontamination",
    "q98_corpus_pipeline", "q99_expectations_gate",
    "q100_stratified_sample",
    # never-checked: PQ ANN + semantic dedup
    "q96_pq_topk", "q97_ivfpq_topk", "q107_semantic_dedup",
    # never-checked: table-format extensions
    "q101_dv_delete", "q102_incremental_gold", "q104_generated_columns",
    "q105_rename_drop_column", "q106_identity_column",
    "q110_sql_time_travel", "q111_convert_to_delta",
    # never-checked: streaming hard oracles
    "q103_stream_windowed_agg", "q108_stream_interval_join",
    "q109_stream_ingest_dedup",
    # keepers: one anchor per signature tier
    "q60_merge_upsert", "q63_time_travel_diff", "q92_streaming_cdc_apply",
    "q70_medallion_gold", "q40_cosine_topk", "q36_minhash_lsh_pairs",
    "q01_pricing_summary", "q05_nation_revenue",
    # re-confirm: last green driver row is r1–r3
    "q02_top_orders_by_revenue", "q07_conditional_agg",
    "q08_distinct_counts", "q09_null_profile",
    "q10_latest_event_per_user", "q15_customers_without_orders",
    "q16_global_kpis", "q18_sessionization", "q19_daily_user_activity",
    "q25_quality_report", "q41_ann_lsh_topk", "q61_merge_conditional",
    "q62_update_delete", "q64_cdf_summary", "q65_replace_where",
    "q66_scd2_dimension", "q68_cdc_mirror", "q71_bronze_stamping",
    "q72_windowed_event_counts", "q73_session_windows",
    "q84_medallion_tx_analytics", "q88_scd2_users_state",
    "q76_history_rollup",
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
