"""Data-quality validators (SURVEY §2.13, Q1–Q3 — reference
``src/data_processor.py:346-405``).

Design difference vs the reference: the reference runs one Spark action
per check (completeness, uniqueness, range each re-scan the table —
``data_processor.py:356-405``). At 100 TB that is N full scans; this
engine folds every requested check into ONE aggregate pass
(:func:`quality_report`) and also offers the per-check API for parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_report(
    df: DataFrame,
    key_expr: Column | None = None,
    null_checks: dict[str, str] | None = None,
    range_checks: dict[str, tuple[str, float, float]] | None = None,
    null_pct: dict[str, str] | None = None,
) -> DataFrame:
    """Single-pass quality aggregate → 1-row DataFrame."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    if key_expr is not None:
        aggs.append(F.countDistinct(key_expr).alias("n_distinct_keys"))
    for alias, col in (null_checks or {}).items():
        aggs.append(F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(alias))
    for alias, (col, lo, hi) in (range_checks or {}).items():
        aggs.append(
            F.sum(
                F.when((F.col(col) < lo) | (F.col(col) > hi), 1).otherwise(0)
            ).alias(alias)
        )
    for alias, col in (null_pct or {}).items():
        aggs.append(
            F.round(
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)) * 100.0
                / F.count(F.lit(1)),
                4,
            ).alias(alias)
        )
    return df.agg(*aggs)


def validate_all(
    df: DataFrame,
    required: list[str] | None = None,
    key_columns: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> dict:
    """Q1+Q2+Q3 fused: every requested check folded into ONE aggregate
    → ONE Spark action. The reference re-scans the table per check
    (``data_processor.py:356-405``); at 100 TB the difference between
    one scan and three is the whole job. Returns
    ``{"completeness": …, "uniqueness": …, "ranges": …}`` (keys present
    only for requested checks)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    if required:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}")
            for c in required
        ]
    if key_columns:
        aggs.append(
            F.countDistinct(*[F.col(c) for c in key_columns]).alias("__distinct")
        )
    if ranges:
        aggs += [
            F.sum(
                F.when((F.col(c) < lo) | (F.col(c) > hi), 1).otherwise(0)
            ).alias(f"__range_{c}")
            for c, (lo, hi) in ranges.items()
        ]
    row = df.agg(*aggs).collect()[0]
    n = row["__n"]
    out: dict = {"total_rows": n}
    if required:
        safe_n = n or 1
        out["completeness"] = {
            c: {
                "null_count": row[f"__null_{c}"],
                "null_pct": round(100.0 * row[f"__null_{c}"] / safe_n, 4),
            }
            for c in required
        }
    if key_columns:
        d = row["__distinct"]
        out["uniqueness"] = {
            "total_rows": n,
            "distinct_keys": d,
            "duplicates": n - d,
            "is_unique": n == d,
        }
    if ranges:
        out["ranges"] = {c: {"out_of_range": row[f"__range_{c}"]} for c in ranges}
    return out


def check_completeness(df: DataFrame, required: list[str]) -> dict[str, dict]:
    """Q1 — null count + pct per required column (one pass for all)."""
    return validate_all(df, required=required)["completeness"]


def check_uniqueness(df: DataFrame, key_columns: list[str]) -> dict:
    """Q2 — distinct-key count vs row count (single aggregate)."""
    return validate_all(df, key_columns=key_columns)["uniqueness"]


def check_ranges(df: DataFrame, ranges: dict[str, tuple[float, float]]) -> dict:
    """Q3 — out-of-range count per column (one pass for all)."""
    return validate_all(df, ranges=ranges)["ranges"]


def validate_migration(source: DataFrame, target: DataFrame, ignore_cols: list[str] | None = None) -> dict:
    """Q4 — row-count + schema match (migrate_from_rdbms.py:263-327)."""
    ignore = set(ignore_cols or [])
    s_cols = {c for c in source.columns if c not in ignore}
    t_cols = {c for c in target.columns if c not in ignore}
    return {
        "source_count": source.count(),
        "target_count": target.count(),
        "missing_columns": sorted(s_cols - t_cols),
        "extra_columns": sorted(t_cols - s_cols),
        "schema_match": s_cols == t_cols,
    }
