"""Medallion pipeline query surface: run bronze→silver→gold on the
``events`` fixture against scratch log tables; oracles reproduce the
full pipeline declaratively (SURVEY §3.1)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..plans.medallion import MedallionPipeline
from ..tables import LogTable
from .registry import load_table, query

_INGEST_TS = "2024-03-01 00:00:00"

# DuckDB twin of the silver layer (dedup omitted: event_id is unique in
# the fixture AND bronze is a single snapshot, so row_number()=1 is the
# identity; validity filter spelled out in full).
_SQL_SILVER = """
    SELECT event_id, ts, user_id, event_type, value, props,
           CAST(ts AS DATE) AS event_date,
           CAST(EXTRACT(hour FROM ts) AS BIGINT) AS event_hour,
           CASE event_type
                WHEN 'purchase' THEN 'CONVERSION' WHEN 'signup' THEN 'CONVERSION'
                WHEN 'click' THEN 'ENGAGEMENT' WHEN 'view' THEN 'ENGAGEMENT'
                WHEN 'error' THEN 'ERROR' ELSE 'OTHER' END AS event_category,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE event_type IN ('click','error','purchase','signup','view')
      AND value IS NOT NULL AND value >= 0 AND user_id IS NOT NULL
"""


@query(
    "q70_medallion_gold",
    oracle=f"""
    WITH silver AS ({_SQL_SILVER})
    SELECT event_date, user_id,
           COUNT(*) AS total_events,
           CAST(SUM(CASE WHEN event_category = 'CONVERSION' THEN 1 ELSE 0 END) AS BIGINT) AS conversion_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_value,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS active_sec,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
           MAX(prop_k) AS max_prop_k
    FROM silver
    GROUP BY event_date, user_id
    """,
)
def q70_medallion_gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full bronze→silver→gold pipeline (SURVEY §3.1) on scratch log
    tables with a pinned ingestion clock; returns the gold
    daily_user_activity product read back from its table."""
    raw = load_table(spark, sf_dir, "events")
    pipe = MedallionPipeline(spark, tempfile.mkdtemp(prefix="medallion-"))
    gold = pipe.run(raw, _INGEST_TS)
    return gold.read()


@query(
    "q71_bronze_stamping",
    oracle=f"""
    SELECT event_id,
           'events.parquet' AS source_file,
           DATE '2024-03-01' AS ingestion_date,
           sha256(concat_ws('|',
               CAST(event_id AS VARCHAR),
               strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S.%f'),
               CAST(user_id AS VARCHAR),
               event_type,
               printf('%.6f', value))) AS data_hash
    FROM events
    WHERE event_id % 10 = 0
    """,
)
def q71_bronze_stamping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bronze ingestion metadata stamping (01_bronze_ingestion.py:56-62):
    injected clock, real source_file from the scan's _metadata, and the
    canonical sha2 row fingerprint — cross-engine reproducible."""
    from pyspark.sql import functions as F

    raw = load_table(spark, sf_dir, "events")
    pipe = MedallionPipeline(spark, tempfile.mkdtemp(prefix="bronze-"))
    bronze = pipe.run_bronze(raw, _INGEST_TS)
    return (
        bronze.read()
        .filter(F.col("event_id") % 10 == 0)
        .select("event_id", "source_file", "ingestion_date", "data_hash")
    )


@query(
    "q72_windowed_event_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
           time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q72_windowed_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows with watermark (T-tier [EXT],
    SURVEY §2.11): the same windowed_counts operator that runs on
    streams, executed in batch mode (identical semantics — Spark
    window aggregation is mode-agnostic)."""
    from ..streaming import windowed_counts

    e = load_table(spark, sf_dir, "events")
    return windowed_counts(
        e, ts_col="ts", window_duration="10 minutes", group_cols=["event_type"]
    )


@query(
    "q73_session_windows",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), islands AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_value
    FROM islands GROUP BY user_id, session_no
    """,
)
def q73_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native gap-based session windows (F.session_window — the
    streaming-capable sessionization), hash-matched against the SQL
    gaps-and-islands formulation: session_end = last event + gap in
    both. Unlike the q18 lag-over-global-sort pattern, this operator
    runs incrementally on streams with state cleanup via watermark."""
    from ..streaming import session_windowed_counts

    e = load_table(spark, sf_dir, "events")
    return session_windowed_counts(
        e, ts_col="ts", gap="30 minutes", group_cols=["user_id"]
    ).select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )
