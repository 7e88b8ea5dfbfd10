"""Property-based differential test: MERGE (all three clause
families) against a pure-Python model of Delta's clause semantics,
over hypothesis-generated target/source states.

The unit tests pin known cases; this pins the *semantics* — first
clause whose condition holds wins, per row, for arbitrary inputs.
"""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from databricks_delta_lake_migration_spark.tables import LogTable

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("val", T.LongType()),
    ]
)

# unique-id row sets: MERGE forbids multi-match sources when matched
# clauses exist, and the model assumes keyed rows
row_sets = st.dictionaries(
    st.integers(min_value=0, max_value=7), st.integers(min_value=0, max_value=99),
    max_size=6,
)


def _model(target: dict, source: dict, t_del: int, t_stale: int) -> dict:
    """Pure-Python twin of the MERGE program below."""
    out = {}
    for k, v in target.items():
        if k in source:
            if v < t_del:
                continue  # first matched clause: delete
            out[k] = source[k]  # second matched clause: update
        elif v >= t_stale:
            out[k] = -1  # NMBS update
        else:
            out[k] = v  # untouched
    for k, v in source.items():
        if k not in target:
            out[k] = v  # insert
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=row_sets, source=row_sets, t_del=st.integers(0, 100), t_stale=st.integers(0, 100))
def test_merge_matches_python_model(spark, target, source, t_del, t_stale):
    root = tempfile.mkdtemp(prefix="merge-prop-")
    try:
        t = LogTable.create(spark, f"{root}/t", SCHEMA)
        if target:
            t.append(spark.createDataFrame(list(target.items()), SCHEMA))
        src = spark.createDataFrame(list(source.items()) or [], SCHEMA)
        (
            t.merge(src, "target.id = source.id")
            .when_matched_delete(condition=f"target.val < {t_del}")
            .when_matched_update(set={"val": "source.val"})
            .when_not_matched_insert_all()
            .when_not_matched_by_source_update(
                set={"val": "-1"}, condition=f"target.val >= {t_stale}"
            )
            .execute()
        )
        got = {r.id: r.val for r in t.read().collect()}
        assert got == _model(target, source, t_del, t_stale)
    finally:
        shutil.rmtree(root, ignore_errors=True)
