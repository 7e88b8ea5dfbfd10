"""Medallion (bronze → silver → gold) pipeline over log tables.

Parity target: the reference's three-notebook DAG
(``/root/reference/notebooks/01_bronze_ingestion.py`` →
``02_silver_transformation.py`` → ``03_gold_aggregation.py``,
orchestrated by ``infrastructure/main.tf:254-329``). Here each layer
is a composable stage function; the runner is plain Python (the
Databricks-job orchestration is infrastructure, not data semantics).

Determinism upgrades over the reference (SURVEY §7.4 item 2):
- the ingestion clock is injected, never ``current_timestamp()``
- dedup is latest-wins ``row_number``, never ``dropDuplicates``
- the row hash canonicalizes with explicit timestamp formatting,
  never ``to_json(struct(...))`` map-ordering

Scale notes: bronze appends are partitioned by ingestion_date and
silver/gold by event_date, so daily re-runs prune to one partition
and ``replaceWhere`` keeps them idempotent; every aggregate is a
single groupBy (map-side partial agg); the only shuffles are the
silver dedup window and the gold groupBy, both keyed on high-
cardinality columns (no skew).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import LogTable

EVENT_CATEGORIES = {
    "purchase": "CONVERSION",
    "signup": "CONVERSION",
    "click": "ENGAGEMENT",
    "view": "ENGAGEMENT",
    "error": "ERROR",
}
VALID_EVENT_TYPES = sorted(EVENT_CATEGORIES)

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"  # fixed-width → cross-engine stable


def stamp_ingestion_metadata(df: DataFrame, ingestion_ts: str) -> DataFrame:
    """Bronze metadata stamping (01_bronze_ingestion.py:56-62):
    ingestion timestamp/date (injected clock), source file, sha2 row
    hash over a canonical serialization."""
    return (
        df.withColumn("ingestion_timestamp", F.lit(ingestion_ts).cast("timestamp"))
        .withColumn("ingestion_date", F.to_date(F.lit(ingestion_ts)))
        .withColumn(
            "source_file",
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
        )
        .withColumn(
            "data_hash",
            F.sha2(
                F.concat_ws(
                    "|",
                    F.col("event_id").cast("string"),
                    F.date_format("ts", TS_FMT),
                    F.col("user_id").cast("string"),
                    F.col("event_type"),
                    F.format_string("%.6f", F.col("value")),
                ),
                256,
            ),
        )
    )


def cleanse_events(bronze: DataFrame) -> DataFrame:
    """Silver cleanse (02_silver_transformation.py:153-184):
    deterministic dedup, derived date/hour columns, category mapping,
    validity filter, JSON property extraction."""
    w = Window.partitionBy("event_id").orderBy(
        F.col("ingestion_timestamp").desc(), F.col("data_hash").desc()
    )
    cat = F.lit(None).cast("string")
    mapping = F.create_map(
        *[F.lit(x) for kv in EVENT_CATEGORIES.items() for x in kv]
    )
    return (
        bronze.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("event_date", F.to_date("ts"))
        .withColumn("event_hour", F.hour("ts").cast("bigint"))
        .withColumn(
            "event_category", F.coalesce(mapping[F.col("event_type")], F.lit("OTHER"))
        )
        .withColumn("prop_k", F.get_json_object("props", "$.k").cast("bigint"))
        .withColumn(
            "is_valid",
            F.col("event_type").isin(VALID_EVENT_TYPES)
            & F.col("value").isNotNull()
            & (F.col("value") >= 0)
            & F.col("user_id").isNotNull(),
        )
        .filter(F.col("is_valid"))
        .drop("is_valid")
    )


def daily_user_activity(silver: DataFrame) -> DataFrame:
    """Gold product (03_gold_aggregation.py:52-91): per-day-per-user
    activity rollup; collect_set sorted for determinism."""
    return silver.groupBy("event_date", "user_id").agg(
        F.count(F.lit(1)).alias("total_events"),
        F.sum(F.when(F.col("event_category") == "CONVERSION", 1).otherwise(0)).alias(
            "conversion_events"
        ),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias(
            "error_events"
        ),
        F.round(F.sum(F.col("value").cast("decimal(18,4)")), 4)
        .cast("double")
        .alias("total_value"),
        (F.max("ts").cast("long") - F.min("ts").cast("long")).alias("active_sec"),
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "event_types"
        ),
        F.max("prop_k").alias("max_prop_k"),
    )


@dataclass
class MedallionPipeline:
    """Composable three-layer pipeline rooted at ``root`` (one log
    table per layer, mirroring the bronze/silver/gold schemas of
    ``infrastructure/main.tf:186-214``)."""

    spark: SparkSession
    root: str

    def bronze_path(self) -> str:
        return f"{self.root}/bronze_events"

    def silver_path(self) -> str:
        return f"{self.root}/silver_events"

    def gold_path(self) -> str:
        return f"{self.root}/gold_daily_user_activity"

    def run_bronze(self, raw: DataFrame, ingestion_ts: str) -> LogTable:
        stamped = stamp_ingestion_metadata(raw, ingestion_ts)
        t = LogTable.create(
            self.spark,
            self.bronze_path(),
            stamped.schema,
            partition_by=["ingestion_date"],
        )
        t.append(stamped)
        return t

    def run_silver(self) -> LogTable:
        bronze = LogTable(self.spark, self.bronze_path()).read()
        silver = cleanse_events(bronze)
        t = LogTable.create(
            self.spark,
            self.silver_path(),
            silver.schema,
            partition_by=["event_date"],
        )
        # idempotent daily re-run: replace exactly the dates present in
        # this batch (K3 semantics at layer scope)
        t.overwrite(silver)
        return t

    def run_gold(self) -> LogTable:
        silver = LogTable(self.spark, self.silver_path()).read()
        gold = daily_user_activity(silver)
        t = LogTable.create(
            self.spark,
            self.gold_path(),
            gold.schema,
            partition_by=["event_date"],
        )
        t.overwrite(gold)
        return t

    def run(self, raw: DataFrame, ingestion_ts: str) -> LogTable:
        self.run_bronze(raw, ingestion_ts)
        self.run_silver()
        return self.run_gold()
