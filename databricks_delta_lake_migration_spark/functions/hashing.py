"""Portable row/text hashing.

The reference fingerprints rows with ``sha2(to_json(struct(*cols)), 256)``
(``/root/reference/notebooks/01_bronze_ingestion.py:62``,
``02_silver_transformation.py:75-81``). JSON serialization is not stable
across engines (key order, float formatting), so this engine
canonicalizes to a pipe-joined string of explicitly-cast columns —
same semantics (change detection), deterministic everywhere.

All functions are JVM-side Catalyst expressions (whole-stage codegen,
no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unit separator is a safe join delimiter for text that may contain '|'.
_SEP = "|"


def row_fingerprint(*cols: Column) -> Column:
    """sha2-256 hex digest over a canonical column serialization.

    Callers must pre-cast floats to a fixed-scale decimal and
    timestamps to date/ISO strings to keep the digest engine-portable.
    """
    return F.sha2(F.concat_ws(_SEP, *cols), 256)


def norm_text_hash(text: Column) -> Column:
    """Canonical text hash for exact dedup: lowercase, collapse
    whitespace, sha2. (Exact-dedup operator, SURVEY §2.14.)"""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.sha2(normalized, 256)


def cheap_hash64(col: Column) -> Column:
    """xxhash64 — the cheap non-cryptographic engine-internal hash
    (SURVEY §2.9 [EXT]); not oracle-portable, used for salting /
    bucketing only."""
    return F.xxhash64(col)
