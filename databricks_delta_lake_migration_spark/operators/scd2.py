"""Slowly-Changing-Dimension Type 2 upsert over a log table.

Parity target: the reference's ``upsert_scd_type2``
(``/root/reference/notebooks/02_silver_transformation.py:83-135``),
which runs a MERGE that closes changed rows, then a second SQL pass
re-inserting new versions joined on ``effective_end_date =
processed_timestamp`` — fragile timestamp-equality coupling
(SURVEY.md §7.4 item 1). We implement the standard *staged-union
single MERGE* instead, with an injectable clock, and define
correctness as final-state equality:

- unchanged keys → untouched open row
- changed keys   → old row closed (``is_current=false``,
  ``effective_end_date=now``) AND a new open row inserted
- brand-new keys → new open row inserted

The staging trick: each source row appears once with ``__merge_key =
key`` (matches the open target row → close it if the hash changed) and
— only for rows whose hash changed or key is new — once with
``__merge_key = NULL`` (never matches → insert clause fires). One
MERGE, no second pass, deterministic under any clock.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import LogTable

SCD2_COLS = ["effective_start_date", "effective_end_date", "is_current", "record_hash"]


def record_hash(cols: list[str]) -> F.Column:
    """Portable change-detection hash over tracked columns
    (02_silver_transformation.py:75-81 uses sha2(to_json(struct));
    we canonicalize with pipe-joined strings — SURVEY §7.4 item 2)."""
    return F.sha2(
        F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit("∅")) for c in cols]),
        256,
    )


def with_scd2_columns(df: DataFrame, key_cols: list[str], now: str) -> DataFrame:
    """Stamp a source snapshot with SCD2 bookkeeping columns
    (02_silver_transformation.py:58-63)."""
    tracked = [c for c in df.columns if c not in key_cols]
    return (
        df.withColumn("effective_start_date", F.lit(now).cast("timestamp"))
        .withColumn("effective_end_date", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
        .withColumn("record_hash", record_hash(tracked))
    )


def scd2_upsert(
    table: LogTable, source: DataFrame, key_cols: list[str], now: str
) -> dict:
    """Apply one source snapshot to an SCD2 dimension table.

    ``source`` carries only business columns (keys + tracked);
    bookkeeping columns are derived here. ``now`` is the injected
    effective timestamp (ISO string) — deterministic, test-pinnable.
    """
    tracked = [c for c in source.columns if c not in key_cols]
    staged_new = with_scd2_columns(source, key_cols, now)

    current = table.read().filter(F.col("is_current"))
    # changed = source rows whose hash differs from the open row;
    # new = source keys absent from the open set
    src_h = staged_new.alias("s")
    cur = current.alias("c")
    key_eq = reduce(
        lambda a, b: a & b, [F.col(f"s.{k}") == F.col(f"c.{k}") for k in key_cols]
    )
    joined = src_h.join(cur, key_eq, "left")
    # ONLY changed existing keys get the extra NULL-key staging row: a
    # brand-new key's match-row is already unmatched and inserts once —
    # staging it twice would duplicate it.
    changed = joined.filter(
        F.col("c.record_hash").isNotNull()
        & (F.col("s.record_hash") != F.col("c.record_hash"))
    ).select("s.*")

    # stage: every source row matches (to maybe close); changed rows
    # additionally staged with NULL merge keys (to insert the new version)
    match_rows = staged_new.select(
        *[F.col(k).alias(f"__mk_{k}") for k in key_cols], "*"
    )
    insert_rows = changed.select(
        *[F.lit(None).cast(staged_new.schema[k].dataType).alias(f"__mk_{k}") for k in key_cols],
        "*",
    )
    staged = match_rows.unionByName(insert_rows)

    cond = " AND ".join(
        [f"target.{k} = source.__mk_{k}" for k in key_cols]
        + ["target.is_current = true"]
    )
    all_cols = key_cols + tracked + SCD2_COLS
    res = (
        table.merge(staged, cond)
        .when_matched_update(
            condition="target.record_hash <> source.record_hash",
            set={
                "is_current": "false",
                "effective_end_date": f"CAST('{now}' AS TIMESTAMP)",
            },
        )
        .when_not_matched_insert(values={c: f"source.{c}" for c in all_cols})
        .execute()
    )
    return res
