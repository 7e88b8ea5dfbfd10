"""Data-quality validators (SURVEY §2.13, Q1–Q3 — reference
``src/data_processor.py:346-405``).

Design difference vs the reference: the reference runs one Spark action
per check (completeness, uniqueness, range each re-scan the table —
``data_processor.py:356-405``). At 100 TB that is N full scans; this
engine folds every requested check into ONE aggregate pass
(:func:`quality_report`) and also offers the per-check API for parity.
"""

from __future__ import annotations

from dataclasses import dataclass

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


# ---- expectations (declarative pipeline gates) ---------------------------
#
# The reference validates after the fact (Q1–Q3 report dicts); production
# Delta pipelines gate rows mid-flight with declarative expectations
# (warn / drop / fail per rule). Same single-pass posture as
# :func:`quality_report`: the gate itself is a row-local predicate (no
# shuffle), and ALL rule metrics come from one aggregate over one scan —
# never one action per rule.


class ExpectationFailed(Exception):
    """A ``fail``-action expectation observed violations."""


@dataclass(frozen=True)
class Expectation:
    """One declarative rule: ``constraint`` is a SQL boolean expression
    over the input columns; a NULL result counts as a violation (SQL
    CHECK semantics inverted — gates must be affirmatively true).

    ``action``: ``"warn"`` counts violations but keeps rows, ``"drop"``
    removes violating rows, ``"fail"`` aborts the write when any row
    violates."""

    name: str
    constraint: str
    action: str = "warn"

    def __post_init__(self) -> None:
        if self.action not in ("warn", "drop", "fail"):
            raise ValueError(f"unknown expectation action: {self.action}")

    def passes(self) -> Column:
        return F.coalesce(F.expr(self.constraint), F.lit(False))


def expectations_report(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Per-rule violation metrics in ONE aggregate pass: one output row
    per rule — ``(rule, action, n_rows, violations, violation_pct)``.

    Scale design: a single map-side-combined global aggregate; the
    unpivot to one-row-per-rule happens on a 1-row intermediate."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for r in rules:
        aggs.append(
            F.sum(F.when(r.passes(), 0).otherwise(1)).alias(f"__v_{r.name}")
        )
    wide = df.agg(*aggs)
    pairs: list[Column] = []
    for r in rules:
        pairs.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                F.lit(r.action).alias("action"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v_{r.name}").alias("violations"),
                F.round(
                    F.col(f"__v_{r.name}") * 100.0
                    / F.greatest(F.col("__n"), F.lit(1)),
                    4,
                ).alias("violation_pct"),
            )
        )
    return wide.select(F.explode(F.array(*pairs)).alias("m")).select("m.*")


def apply_expectations(
    df: DataFrame, rules: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Gate ``df`` through ``rules`` → ``(clean_df, metrics_df)``.

    ``clean_df`` drops rows violating any drop-rule (warn rules pass
    everything through); it is lazily defined — no action is triggered
    here. ``metrics_df`` is :func:`expectations_report` over the input.
    Callers enforcing fail-rules run :func:`enforce_expectations`, which
    collects the (metadata-sized) metrics row set once."""
    gate = F.lit(True)
    for r in rules:
        if r.action in ("drop", "fail"):
            gate = gate & r.passes()
    return df.filter(gate), expectations_report(df, rules)


def enforce_expectations(
    df: DataFrame, rules: list[Expectation]
) -> tuple[DataFrame, list[dict]]:
    """Strict gate: raises :class:`ExpectationFailed` if any
    ``fail``-action rule has violations; returns the gated DataFrame and
    the collected per-rule metrics (list of dicts, one per rule)."""
    clean, metrics = apply_expectations(df, rules)
    rows = [r.asDict() for r in metrics.collect()]
    failed = [
        r for r in rows if r["action"] == "fail" and r["violations"] > 0
    ]
    if failed:
        detail = ", ".join(f"{r['rule']}={r['violations']}" for r in failed)
        raise ExpectationFailed(f"fail-action expectations violated: {detail}")
    return clean, rows


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


def quarantine_expectations(
    df: DataFrame, rules: list[Expectation]
) -> DataFrame:
    """DLT-style quarantine routing [EXT]: instead of silently dropping
    violating rows (``apply_expectations``), annotate EVERY row with
    ``quarantined`` (violates any drop/fail rule) and
    ``violated_rules`` (sorted CSV of the rule names it fails, warn
    rules included) — so bad rows land in a quarantine table with their
    reasons for triage/replay instead of disappearing.

    Row-local: one chained expression per rule, zero shuffles and a
    single scan whether the caller routes both halves or only one."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~r.passes(), F.lit(r.name)).otherwise(F.lit(None))
                for r in rules
            ]
        )
    )
    gate = F.lit(False)
    for r in rules:
        if r.action in ("drop", "fail"):
            gate = gate | ~r.passes()
    return df.withColumn(
        "violated_rules", F.array_join(F.array_sort(failed), ",")
    ).withColumn("quarantined", gate)


def table_diff(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    include_identical: bool = False,
) -> DataFrame:
    """Row-level migration reconciliation [EXT]: classify every key as
    ``missing_in_target`` / ``extra_in_target`` / ``changed`` (with the
    sorted list of differing columns) — the row-granular successor to
    :func:`~.sources.files.validate_migration`'s count+schema check
    (reference ``migration/migrate_from_hdfs.py:305-354`` stops at
    counts; a count match hides offsetting insert/delete pairs and
    every in-place value drift).

    Returns ``(*key_cols, status, changed_cols)`` — ``changed_cols``
    is a comma-joined sorted column list, empty for presence-only
    statuses. Identical rows are dropped unless ``include_identical``
    (at 100 TB the diff output should be the exceptions, not a copy of
    the table).

    Scale: ONE full-outer join hash-partitioned on the key — full
    outer is semantically required (both sides' unmatched rows must
    survive), so neither side can broadcast. Column comparison is
    row-local null-safe equality (`eqNullSafe` — NULL vs value drift
    is a real change, NULL vs NULL is not).

    KEY matching is null-safe too (VERDICT r8 #3): a NULL key is one
    key value, so a NULL-key row present on both sides reconciles as
    ``identical``/``changed`` instead of drifting into a spurious
    ``missing_in_target`` + ``extra_in_target`` pair. `<=>` keys stay
    hash-partitionable (Catalyst repartitions on ``coalesce(key),
    isnull(key)``), so the ONE-shuffle shape is unchanged — but that
    rewritten distribution is one a ``bucketBy(key)`` layout cannot
    satisfy, so when EVERY key field is non-nullable on both sides
    (NULL keys impossible → ``=`` and ``<=>`` coincide) the join uses
    plain equality, keeping bucketed tables (q199's layout)
    exchange-free for the recurring-diff case. As with any duplicated
    key value, MULTIPLE NULL-key rows per side compare many-to-many —
    ``key_cols`` is assumed to be a key."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    comp = compare_cols or [
        c for c in source.columns if c in set(target.columns) and c not in key_cols
    ]
    s = source.select(
        *[F.col(k).alias(f"__ks_{k}") for k in key_cols],
        *[F.col(c).alias(f"__s_{c}") for c in comp],
        F.lit(1).alias("__in_s"),
    )
    t = target.select(
        *[F.col(k).alias(f"__kt_{k}") for k in key_cols],
        *[F.col(c).alias(f"__t_{c}") for c in comp],
        F.lit(1).alias("__in_t"),
    )
    keys_nonnull = all(
        not source.schema[k].nullable and not target.schema[k].nullable
        for k in key_cols
    )
    key_eq = None
    for k in key_cols:
        a, b = F.col(f"__ks_{k}"), F.col(f"__kt_{k}")
        eq = (a == b) if keys_nonnull else a.eqNullSafe(b)
        key_eq = eq if key_eq is None else (key_eq & eq)
    j = s.join(t, key_eq, "full_outer")
    changed = F.array_sort(
        F.array_compact(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__s_{c}").eqNullSafe(F.col(f"__t_{c}")),
                        F.lit(c),
                    )
                    for c in comp
                ]
            )
        )
    )
    status = (
        F.when(F.col("__in_t").isNull(), F.lit("missing_in_target"))
        .when(F.col("__in_s").isNull(), F.lit("extra_in_target"))
        .when(F.size(changed) > 0, F.lit("changed"))
        .otherwise(F.lit("identical"))
    )
    out = j.select(
        # coalesce is NULL-correct here: an unmatched NULL-key row has
        # NULL on both sides, so the output key stays NULL as it should
        *[
            F.coalesce(F.col(f"__ks_{k}"), F.col(f"__kt_{k}")).alias(k)
            for k in key_cols
        ],
        status.alias("status"),
        F.when(
            status == "changed", F.array_join(changed, ",")
        ).otherwise(F.lit("")).alias("changed_cols"),
    )
    return out if include_identical else out.filter(F.col("status") != "identical")
