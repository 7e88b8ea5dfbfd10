"""ACID log-structured table format (Delta-semantics on Parquet)."""

from .logtable import LogTable, MergeBuilder  # noqa: F401
