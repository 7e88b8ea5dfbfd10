"""Optimistic concurrency control: Delta-style conflict resolution.

The reference gets multi-writer safety from delta-spark's transaction
protocol (conflict detection documented for
``/root/reference/notebooks/04_acid_operations.py``'s MERGE/UPDATE
workloads); our log format implements the same WriteSerializable
matrix: blind appends commute and rebase onto a new head, disjoint
file rewrites compose, overlapping rewrites raise
``ConcurrentDeleteError``, and metadata changes raise
``MetadataChangedError``.

The deterministic tests inject a competing committer inside
``put_if_absent`` — the only point where a real race can be observed —
so every conflict branch is exercised without sleeps or flaky timing.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from databricks_delta_lake_migration_spark.tables.logtable import (
    ConcurrentDeleteError,
    ConcurrentWriteError,
    LogTable,
    MetadataChangedError,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("part", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _rows(spark, ids, part="a", val=1.0):
    # one file per append: conflict tests below reason about file overlap
    return spark.createDataFrame(
        [(i, part, val) for i in ids], SCHEMA
    ).coalesce(1)


class _RacyFS:
    """Delegating FS wrapper that runs ``interloper()`` once, right
    before the first commit attempt — a deterministic lost race."""

    def __init__(self, inner, interloper):
        self._inner = inner
        self._interloper = interloper
        self._fired = False

    def put_if_absent(self, path, text):
        if not self._fired:
            self._fired = True
            self._interloper()
        return self._inner.put_if_absent(path, text)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _make(spark, tmp_path, name="t", partition_by=None):
    path = str(tmp_path / name)
    t = LogTable.create(spark, path, SCHEMA, partition_by=partition_by)
    return t, path


def test_append_rebases_over_concurrent_append(spark, tmp_path):
    t, path = _make(spark, tmp_path)
    t.append(_rows(spark, [1, 2]))
    other = LogTable(spark, path)
    t.fs = _RacyFS(t.fs, lambda: other.append(_rows(spark, [100])))
    t.append(_rows(spark, [3, 4]))  # loses the race at v2, lands at v3
    assert sorted(r.id for r in t.read().collect()) == [1, 2, 3, 4, 100]
    assert t.version() == 3
    ops = [c.operation for c in t.commits()]
    assert ops == ["CREATE TABLE", "WRITE", "WRITE", "WRITE"]


def test_append_rebases_over_concurrent_delete(spark, tmp_path):
    # blind append commutes with a rewrite (WriteSerializable)
    t, path = _make(spark, tmp_path)
    t.append(_rows(spark, [1, 2, 3]))
    other = LogTable(spark, path)
    t.fs = _RacyFS(t.fs, lambda: other.delete("id = 2"))
    t.append(_rows(spark, [4]))
    assert sorted(r.id for r in t.read().collect()) == [1, 3, 4]


def test_disjoint_rewrites_compose(spark, tmp_path):
    # UPDATE on partition a vs concurrent UPDATE on partition b:
    # remove-sets are disjoint files, so the loser rebases and both land.
    t, path = _make(spark, tmp_path, partition_by=["part"])
    t.append(_rows(spark, [1], part="a"))
    t.append(_rows(spark, [2], part="b"))
    other = LogTable(spark, path)
    t.fs = _RacyFS(
        t.fs, lambda: other.update("part = 'b'", {"val": "9.0"})
    )
    t.update("part = 'a'", {"val": "5.0"})
    got = {r.part: r.val for r in t.read().collect()}
    assert got == {"a": 5.0, "b": 9.0}


def test_overlapping_rewrites_conflict(spark, tmp_path):
    t, path = _make(spark, tmp_path)
    t.append(_rows(spark, [1, 2, 3]))
    other = LogTable(spark, path)
    t.fs = _RacyFS(t.fs, lambda: other.update("id = 1", {"val": "9.0"}))
    with pytest.raises(ConcurrentDeleteError):
        t.update("id = 3", {"val": "5.0"})  # same single file rewritten
    # the winner's update survives untouched
    assert {r.id: r.val for r in t.read().collect()}[1] == 9.0


def test_concurrent_metadata_change_conflicts(spark, tmp_path):
    t, path = _make(spark, tmp_path)
    t.append(_rows(spark, [1]))
    other = LogTable(spark, path)
    t.fs = _RacyFS(
        t.fs,
        lambda: other.add_columns([T.StructField("extra", T.StringType())]),
    )
    with pytest.raises(MetadataChangedError):
        t.append(_rows(spark, [2]))


def test_losing_metadata_change_conflicts(spark, tmp_path):
    t, path = _make(spark, tmp_path)
    t.append(_rows(spark, [1]))
    other = LogTable(spark, path)
    t.fs = _RacyFS(t.fs, lambda: other.append(_rows(spark, [2])))
    with pytest.raises(MetadataChangedError):
        t.add_columns([T.StructField("extra", T.StringType())])


def test_commit_tx_gives_up_after_repeated_races(spark, tmp_path):
    t, path = _make(spark, tmp_path)
    t.append(_rows(spark, [1]))
    other = LogTable(spark, path)

    class _AlwaysLosingFS(_RacyFS):
        def put_if_absent(self, path, text):
            other.append(_rows(spark, [99]))  # steal every version
            return self._inner.put_if_absent(path, text)

    t.fs = _AlwaysLosingFS(t.fs, lambda: None)
    # the contract under test is the GIVING UP (bounded retries +
    # consistent table), not the production retry budget: 3 lost races
    # exercise the same loop as the default 15 at 1/5 the wall time
    # (each lost race pays a full stealing append + replay)
    t._commit_tx = lambda commit: LogTable._commit_tx(t, commit, attempts=3)
    with pytest.raises(ConcurrentWriteError):
        t.append(_rows(spark, [2]), )
    # table stays consistent: only the winners' commits are visible
    fresh = LogTable(spark, path)
    assert fresh.version() == len(fresh.commits()) - 1


def test_threaded_appends_all_land(spark, tmp_path):
    t, path = _make(spark, tmp_path)
    n, errs = 6, []
    barrier = threading.Barrier(n)

    def work(i):
        try:
            barrier.wait()
            LogTable(spark, path).append(_rows(spark, [i]))
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert sorted(r.id for r in t.read().collect()) == list(range(n))
    assert t.version() == n  # contiguous versions, no gaps


def test_cdf_version_follows_rebase(spark, tmp_path):
    # the CDF files must be stamped with the version the commit LANDED
    # at, not the version it first proposed.
    t, path = _make(spark, tmp_path)
    t.set_properties({"enableChangeDataFeed": "true"})
    t.append(_rows(spark, [1]))
    other = LogTable(spark, path)
    t.fs = _RacyFS(t.fs, lambda: other.append(_rows(spark, [50])))
    t.append(_rows(spark, [2]))  # proposed v3, lands v4... (v2 stolen)
    landed = t.version()
    cdf = t.read_changes(starting_version=landed).filter(
        F.col("_change_type") == "insert"
    )
    got = {(r.id, r._commit_version) for r in cdf.collect()}
    assert (2, landed) in got


def test_racing_copy_into_same_source_conflicts_not_duplicates(spark, tmp_path):
    """Two COPY INTOs of the same landing dir racing: the loser must
    raise ConcurrentTransactionError (rebasing would double-load the
    winner's files) and a re-run then loads nothing."""
    from databricks_delta_lake_migration_spark.tables.logtable import (
        ConcurrentTransactionError,
    )

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    src = str(tmp_path / "land")
    spark.createDataFrame([(i, f"v{i}") for i in range(5)], schema).coalesce(
        1
    ).write.parquet(src)
    t1 = LogTable.create(spark, str(tmp_path / "t"), schema)
    t2 = LogTable(spark, t1.path)

    orig = LogTable._commit
    fired = {"done": False}

    def racing(self, commit):
        if not fired["done"] and commit.operation == "COPY INTO":
            fired["done"] = True
            t2.copy_into(src)  # the winner lands first
        return orig(self, commit)

    LogTable._commit = racing
    try:
        with pytest.raises(ConcurrentTransactionError, match="COPY INTO"):
            t1.copy_into(src)
    finally:
        LogTable._commit = orig
    # no duplicates; the loser's re-run is a clean no-op
    assert t1.read().count() == 5
    assert t1.copy_into(src)["numLoadedFiles"] == 0
