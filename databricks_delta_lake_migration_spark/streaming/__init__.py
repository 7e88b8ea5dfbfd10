"""Structured-Streaming ingestion into log tables."""

from .ingest import stream_files_to_table, windowed_counts  # noqa: F401
from .stateful import running_totals  # noqa: F401
