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
