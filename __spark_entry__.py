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
# coverage policy (162+ registered, q69 unused). Rounds 1-5
# accumulated green driver rows for all 110 pre-round-5 registrations
# (r5 closed q93–q111); the 52 round-5 registrations (q112–q163) had
# only local-oracle green rows entering round 6. ROUND 6 window
# (below): q112–q153 — 42 of the 52 — plus the eight keeper anchors
# (one per signature tier: MERGE, time travel, streaming CDC,
# medallion, cosine top-k, MinHash-LSH, grouped agg, star join) that
# stay in-window every round as cross-round regression sentinels.
# ROUND 7 MUST rotate in the remaining 10 (q154 part co-occurrence,
# q155 salted skew join, q156 resample gap-fill, q157 VARIANT
# extraction, q158 HLL sketch union, q159 stateful timeout sessions,
# q160 state-store introspection, q161 right-to-be-forgotten,
# q162 correlation matrix, q163 referential-integrity audit) plus the
# round-6 additions (q164 as-of join, q165 MMR diversification,
# q166 robust outliers, q167 FSCK REPAIR, q168 symlink manifest,
# q169 count-min heavy hitters, q170 bigram LM scoring, q171
# streaming SCD2 apply, q172 informational PK/FK + catalog audit,
# q173 streaming point-in-time enrichment, q174 pure-python avro
# migration, q175 approximate k-NN graph, q176 informational PK
# audit — all green
# under the local sf0.01 driver simulation this round),
# the anchors, and re-confirms of rows whose only
# green driver row is from rounds 1–3 (q02/q07/q08/q09/q10/q15/q16/
# q18/q19/q25/q41/q61/q62/q64/q65/q66/q68/q71/q72/q73/q76/q84/q88).
# pytest's local DuckDB oracle-parity twin still exercises every
# registration every round.
_PRIORITY = [
    # ROUND 6 WINDOW: first 42 of the 52 never-driver-checked round-5
    # registrations (q112–q153) + the 8 keeper anchors = 50. This
    # retires the rotation debt faster than the original two-even-
    # windows plan; ROUND 7 rotates in the remaining 10 (q154–q163)
    # plus anchors and re-confirms.
    # never-checked: table-format extensions (bloom, COPY INTO, type
    # widening, liquid clustering, log retention, DEFAULTs, row
    # tracking, annotations, protocol features, VACUUM LITE, views,
    # schema-metadata SQL, SHOW PARTITIONS, write tuning)
    "q112_bloom_index_skipping", "q113_copy_into", "q118_show_partitions",
    "q119_write_tuning", "q120_schema_metadata", "q124_type_widening",
    "q125_liquid_clustering", "q126_log_retention", "q128_vacuum_lite",
    "q129_column_defaults", "q130_row_tracking", "q131_commit_annotations",
    "q134_catalog_views", "q136_protocol_features",
    # never-checked: ANN / embedding tier
    "q114_incremental_lsh", "q115_persisted_ivf_index", "q133_sq8_topk",
    "q140_bq_topk", "q150_pca_embeddings",
    # never-checked: curation / text tier
    "q116_chunk_documents", "q117_contamination_scores",
    "q121_shard_shuffle", "q122_quality_top_fraction",
    "q123_boilerplate_strip", "q127_unigram_logprob",
    "q132_tfidf_top_terms", "q137_intradoc_dedup",
    "q138_classifier_filter", "q139_text_normalization",
    "q148_quarantine_routing", "q149_sample_k_per_group",
    "q152_card_redaction",
    # never-checked: streaming tier
    "q135_stream_enrich", "q141_stream_outer_interval_join",
    "q142_stream_session_windows", "q144_stateful_running_totals",
    "q145_table_stream_source", "q146_stream_change_feed",
    "q147_cdc_replication_pipeline",
    # never-checked: relational extensions
    "q143_binned_range_join", "q151_conversion_funnel",
    "q153_approx_percentiles",
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
