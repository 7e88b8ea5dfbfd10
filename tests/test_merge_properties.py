"""Property-based differential test: MERGE (all three clause
families) against a pure-Python model of Delta's clause semantics,
over hypothesis-generated target/source states.

The unit tests pin known cases; this pins the *semantics* — first
clause whose condition holds wins, per row, for arbitrary inputs.
"""

from __future__ import annotations

import pytest

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
@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# SCD2 property: arbitrary snapshot sequences vs a pure-Python dimension
# model (final-state equality — the semantics contract from SURVEY §7.4)
# ---------------------------------------------------------------------------

snapshots = st.lists(
    st.dictionaries(
        st.integers(min_value=0, max_value=4),
        st.integers(min_value=0, max_value=3),
        min_size=1,
        max_size=5,
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(snaps=snapshots)
@pytest.mark.slow
def test_scd2_matches_python_model(spark, snaps):
    """Replay random snapshot sequences through scd2_upsert and through
    a trivial Python SCD2 model; open rows, closed-row counts, and
    per-key current values must agree."""
    from databricks_delta_lake_migration_spark.operators.scd2 import (
        scd2_upsert,
        with_scd2_columns,
    )

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
    )
    root = tempfile.mkdtemp(prefix="scd2-prop-")
    try:
        # model state: key -> current value; closed counts per key
        current: dict = {}
        n_closed = 0
        t = None
        for i, snap in enumerate(snaps):
            now = f"2024-03-{i + 1:02d} 00:00:00"
            df = spark.createDataFrame(sorted(snap.items()), schema)
            if t is None:
                t = LogTable.create(
                    spark,
                    f"{root}/dim",
                    with_scd2_columns(df, ["k"], now).schema,
                )
                t.append(with_scd2_columns(df, ["k"], now))
            else:
                scd2_upsert(t, df, ["k"], now)
            for k, v in snap.items():
                if k in current and current[k] != v:
                    n_closed += 1
                current[k] = v
        got = t.read()
        open_rows = {
            (r["k"], r["v"])
            for r in got.filter("is_current").select("k", "v").collect()
        }
        assert open_rows == set(current.items())
        assert got.filter("NOT is_current").count() == n_closed
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Data-skipping property: for arbitrary AND/OR predicates over a table
# with partitions (incl. hive-NULL), nullable columns, and a
# bloom-indexed column, the skip-aware read path must equal the plain
# filter, and the prune accounting must be internally consistent.
# Pins the conjunct parser + min/max + null-count + numeric-partition
# + bloom pruning against the one semantics that matters: same rows.
# ---------------------------------------------------------------------------

_SKIP_TBL: dict = {}


def _skip_table(spark):
    if "t" not in _SKIP_TBL:
        from pyspark.sql import types as T2

        from databricks_delta_lake_migration_spark.tables.logtable import BLOOM_PROP

        schema = T2.StructType(
            [
                T2.StructField("k", T2.LongType()),
                T2.StructField("s", T2.StringType()),
                T2.StructField("b", T2.StringType()),
                T2.StructField("day", T2.StringType()),
            ]
        )
        root = tempfile.mkdtemp(prefix="skip-prop-")
        t = LogTable.create(
            spark,
            f"{root}/t",
            schema,
            partition_by=["day"],
            properties={BLOOM_PROP: '["b"]'},
        )
        rows = []
        for i in range(60):
            day = [None, "d1", "d2"][i % 3]
            s = None if i % 5 == 0 else f"s{i % 7}"
            rows.append((i, s, f"b{i}", day))
        df = spark.createDataFrame(rows, schema)
        # three appends → multiple files per partition, varied ranges
        t.append(df.filter("k < 20").repartition(2))
        t.append(df.filter("k >= 20 AND k < 40").repartition(2))
        t.append(df.filter("k >= 40").repartition(2))
        _SKIP_TBL["t"] = t
    return _SKIP_TBL["t"]


_atoms = st.sampled_from(
    [
        lambda n, m: f"k = {n}",
        lambda n, m: f"k > {n}",
        lambda n, m: f"k <= {n}",
        lambda n, m: f"k BETWEEN {min(n, m)} AND {max(n, m)}",
        lambda n, m: f"k IN ({n}, {m}, {n + m})",
        lambda n, m: f"s = 's{n % 9}'",
        lambda n, m: "s IS NULL",
        lambda n, m: "s IS NOT NULL",
        lambda n, m: f"b = 'b{n}'",
        lambda n, m: f"b IN ('b{n}', 'b{m}', 'nope')",
        lambda n, m: f"day = 'd{1 + n % 3}'",
        lambda n, m: f"day IN ('d1', 'd{1 + m % 4}')",
        lambda n, m: "day IS NULL",
        lambda n, m: "day IS NOT NULL",
    ]
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    atoms=st.lists(st.tuples(_atoms, st.integers(0, 70), st.integers(0, 70)),
                   min_size=1, max_size=3),
    use_or=st.booleans(),
)
def test_skipping_equals_plain_filter(spark, atoms, use_or):
    from pyspark.sql import functions as F2

    t = _skip_table(spark)
    parts = [a(n, m) for a, n, m in atoms]
    joiner = " OR " if use_or and len(parts) > 1 else " AND "
    pred = joiner.join(parts)
    got = {tuple(r) for r in t.read(where=pred).collect()}
    want = {tuple(r) for r in t.read().filter(F2.expr(pred)).collect()}
    assert got == want, pred
    ps = t.prune_stats(pred)
    assert ps["files_read"] + ps["files_skipped"] == ps["files_total"], pred
