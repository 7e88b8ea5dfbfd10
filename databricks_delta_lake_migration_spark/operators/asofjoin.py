"""As-of join [EXT]: enrich each left row with the LATEST right row at
or before its timestamp, per key — the time-series point-in-time join
(quotes→trades, feature snapshots→training events) that Spark has no
built-in operator for and a naive range join turns into a row-expanding
disaster.

Spark-first shape — NO join at all: tag both sides, ``unionByName``
them (row-local), and run ONE window per key ordered by (ts,
side-order) carrying ``last(right_payload, ignorenulls=true)`` over
``rows unbounded preceding``. Each left row picks up exactly the most
recent right payload without ever materializing candidate pairs:

- ONE shuffle total (the window's hash partition on the key) — the
  same exchange a sort-merge join would need, minus the join and minus
  any interval explosion;
- zero row expansion at any skew: a key with 10M left rows and 10M
  right rows stays 20M rows, never 100T pairs;
- the right payload travels as ONE struct column, so a genuinely-NULL
  right attribute can't make ``last(ignorenulls)`` skip past its row
  to an older match (the struct itself is non-null per right row).

Reference surface: the reference engine exposes point-in-time lookups
only as plain SQL windows (see delta_utils.py history/versioning
helpers); this operator generalizes them to two-table as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_MATCH_TS = "__asof_match_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    tolerance=None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row, enriched with the payload
    columns of the latest ``right`` row having ``right_ts <= left_ts``
    within the same ``on`` key (inclusive, "backward" direction —
    pandas ``merge_asof`` default). Unmatched left rows keep NULL
    payloads (left-outer semantics).

    ``tolerance`` (optional, seconds or a Column interval in the ts
    unit): matches older than ``left_ts - tolerance`` are discarded —
    the staleness bound a feature-store lookup needs.

    ``right_tiebreak`` (optional column name): when several right rows
    share (key, ts), the one with the GREATEST tiebreak value wins —
    making the result deterministic instead of partition-order-lucky.
    The tiebreak compares as DOUBLE (the union needs one type), so
    values must be distinguishable within 53 bits — true of any
    realistic sequence number; pre-rank to small ints if yours aren't.

    Columns: all of ``left``, plus every non-key, non-ts column of
    ``right`` (name collisions with left are the caller's to resolve
    first, same contract as an equi join).
    """
    rts = right_ts or left_ts
    # internal scratch names (ADVICE r6): a caller column with one of
    # these names would collide with the tagged union — refuse loudly
    # up front, mirroring the payload-overlap check below.  The right
    # side also must not already carry `left_ts` under a different
    # role, since its ts column is re-aliased to that name.
    reserved = {_SIDE, _PAYLOAD, "__asof_tb"}
    taken = (set(left.columns) | set(right.columns)) & reserved
    if taken:
        raise ValueError(
            f"column(s) {sorted(taken)} are reserved by asof_join — "
            "rename them before joining"
        )
    if rts != left_ts and left_ts in right.columns:
        raise ValueError(
            f"right side already has a column named {left_ts!r}, which "
            "asof_join uses as the unified timestamp name — rename it "
            "or pass it as right_ts"
        )
    payload_cols = [
        c for c in right.columns if c not in set(on) | {rts}
    ]
    if not payload_cols:
        raise ValueError("right side has no payload columns to carry")
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload column(s) {sorted(overlap)} collide with "
            "left columns — rename before joining"
        )

    r = right.select(
        *on,
        F.col(rts).alias(left_ts),
        F.struct(
            *[F.col(c) for c in payload_cols],
            F.col(rts).alias(_MATCH_TS),
        ).alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0))
        .cast("double").alias("__asof_tb"),
    )
    l = left.select(
        "*",
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(1).alias(_SIDE),
        F.lit(0).cast("double").alias("__asof_tb"),
    )
    both = l.unionByName(r, allowMissingColumns=True)

    # right rows sort BEFORE left rows at the same ts (inclusive
    # backward match); among right ties, greatest tiebreak sorts last
    # so `last()` picks it
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(left_ts).asc(), F.col(_SIDE).asc(),
                 F.col("__asof_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = both.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    if tolerance is not None:
        # integral ts domains subtract as exact longs (epoch-micro
        # values past 2^53 would round under a double cast — the same
        # trap as range-join bin ids); timestamps diff in seconds
        if left.schema[left_ts].dataType.typeName() in (
            "timestamp", "timestamp_ntz",
        ):
            age = (
                F.col(left_ts).cast("double")
                - F.col(_PAYLOAD)[_MATCH_TS].cast("double")
            )
        else:
            age = F.col(left_ts) - F.col(_PAYLOAD)[_MATCH_TS]
        matched = matched.withColumn(
            _PAYLOAD,
            F.when(age > tolerance, F.lit(None)).otherwise(F.col(_PAYLOAD)),
        )

    out_cols = [c for c in left.columns] + [
        F.col(_PAYLOAD)[c].alias(c) for c in payload_cols
    ]
    return matched.select(*out_cols)
