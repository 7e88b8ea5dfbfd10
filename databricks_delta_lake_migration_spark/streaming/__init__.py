"""Structured-Streaming ingestion into log tables."""

from .ingest import (  # noqa: F401
    SchemaDriftError,
    infer_stream_schema,
    interval_join,
    notify_files,
    purge_consumed_notifications,
    session_windowed_counts,
    stream_dedup_to_table,
    stream_enrich_to_table,
    stream_files_to_table,
    stream_near_dup_ingest,
    stream_notified_files_to_table,
    stream_pit_enrich,
    stream_scd2_apply,
    stream_upsert_to_table,
    stream_windowed_agg_to_table,
    windowed_counts,
)
from .stateful import running_totals, timeout_sessions  # noqa: F401
from .table_source import (  # noqa: F401
    LogTableStreamDataSource,
    read_table_stream,
)
