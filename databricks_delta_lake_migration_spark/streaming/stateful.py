"""[EXT] Custom stateful streaming operators via
``applyInPandasWithState`` (SURVEY §2.11 — beyond the reference's
ingest-only streaming surface, which has no stateful operators).

Pattern: state lives in Spark's per-key state store (checkpointed,
partitioned by the grouping key), the update function sees Arrow
batches of new rows for its key, and emits incremental results in
``update`` output mode. At 100 TB / high key cardinality the state
store shards across executors with the shuffle partitioning — no
driver-side state, no collect.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running event count + value sum, maintained across
    micro-batches (and across restarts via the checkpointed state
    store). Emits one updated row per key per micro-batch that touched
    it — the building block for live per-entity counters that a plain
    windowed aggregation can't express (no window: totals are
    all-time).

    Works only on streaming DataFrames; for the batch equivalent use a
    plain ``groupBy().agg()``.
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def timeout_sessions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Custom gap-session tracker with EVENT-TIME TIMEOUTS [EXT]: the
    state-store mode nothing else exercises — a session closes either
    when a later event for the SAME key proves the gap elapsed, or,
    crucially, when the WATERMARK passes ``last_event + gap`` with no
    further data for that key at all (``state.hasTimedOut`` — the only
    way an abandoned key's session ever emits; ``session_window``
    handles this internally, this operator shows the raw
    ``applyInPandasWithState`` contract for session logic the built-in
    can't express, e.g. per-session custom payloads).

    Emits one row per CLOSED session: key, session_start, session_end
    (last event + gap), n_events. State per key is a single 3-tuple —
    bounded, checkpointed, sharded by the grouping key."""
    gap_us = gap_minutes * 60 * 1_000_000

    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def _emit(key, start_us, last_us, n):
        import datetime as _dt

        tz = _dt.timezone.utc
        # the grouping key tuple carries the PRE-cast value even when
        # the groupBy expression casts (observed: long keys arrive as
        # Python ints despite .cast("string")) — stringify here so the
        # Arrow writer always sees the declared string type
        return pd.DataFrame(
            {
                key_col: [str(key)],
                "session_start": [
                    _dt.datetime.fromtimestamp(start_us / 1e6, tz)
                ],
                "session_end": [
                    _dt.datetime.fromtimestamp((last_us + gap_us) / 1e6, tz)
                ],
                "n_events": [n],
            }
        )

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _emit(key[0], start_us, last_us, n)
            return
        ts_us = []
        for pdf in pdfs:
            ts_us.extend(
                int(v.value // 1000) for v in pd.to_datetime(pdf[ts_col])
            )
        ts_us.sort()
        start_us, last_us, n = (
            state.get if state.exists else (None, None, 0)
        )
        for t in ts_us:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                yield _emit(key[0], start_us, last_us, n)
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = max(last_us, t), n + 1
        state.update((start_us, last_us, n))
        # the abandoned-key path: when the watermark passes this
        # timestamp with no new data, hasTimedOut fires and the open
        # session finally emits. Clamped above the current watermark:
        # applyInPandasWithState does NOT pre-filter late rows, so a
        # key whose only events are older than watermark-gap would
        # otherwise compute a timeout <= watermark, which Spark rejects
        # with IllegalArgumentException and fails the whole query.
        state.setTimeoutTimestamp(
            max((last_us + gap_us) // 1000,
                state.getCurrentWatermarkMs() + 1)
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col).cast("string").alias(key_col))
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
