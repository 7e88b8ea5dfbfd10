"""RDBMS migration orchestration (reference
migrate_from_rdbms.py:60-260): full copy, resumable incremental HWM
loop, and config-driven batch — driven through an injected reader so no
live database is needed; the injected reader still receives the exact
JDBC option dict production would use."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_migration_spark.sources import (
    JdbcSourceConfig,
    RdbmsMigrator,
    TableMigration,
)
from databricks_delta_lake_migration_spark.tables import LogTable

CFG = JdbcSourceConfig(
    engine="postgresql", host="db", port=5432, database="appdb", user="u"
)


@pytest.fixture()
def source(spark):
    """Fake RDBMS: rows keyed by id with a sequence column; the reader
    interprets the pushdown subquery the way the database would."""
    state = {"rows": [(i, f"v{i}", i) for i in range(1, 101)]}  # (id, val, seq)

    def reader(options):
        dbtable = options["dbtable"]
        df = spark.createDataFrame(state["rows"], ["id", "val", "seq"])
        if "WHERE seq >" in dbtable:
            last = int(dbtable.split("WHERE seq > '")[1].split("'")[0])
            df = df.filter(F.col("seq") > last)
        reader.calls.append(options)
        return df

    reader.calls = []
    return state, reader


def test_full_migration_stamps_and_overwrites(spark, tmp_path, source):
    state, reader = source
    mig = RdbmsMigrator(spark, CFG, clock=lambda: 1700000000.0, reader=reader)
    m = TableMigration("public.users", str(tmp_path / "users"))
    metrics = mig.full_migration(m)
    assert metrics["rows_migrated"] == 100
    t = LogTable(spark, str(tmp_path / "users"))
    got = t.read()
    assert got.count() == 100
    row = got.filter(F.col("id") == 1).first()
    assert row["source_system"] == "postgresql"
    assert row["source_table"] == "public.users"
    # the reader received real JDBC options (url/driver/fetchsize)
    opts = reader.calls[0]
    assert opts["url"] == "jdbc:postgresql://db:5432/appdb"
    assert opts["driver"] == "org.postgresql.Driver"


def test_incremental_hwm_loop_is_resumable_and_idempotent(spark, tmp_path, source):
    state, reader = source
    mig = RdbmsMigrator(spark, CFG, clock=lambda: 1700000000.0, reader=reader)
    m = TableMigration(
        "public.users",
        str(tmp_path / "users"),
        key_columns=("id",),
        incremental_column="seq",
    )
    # initial load: no cursor → full extract
    m1 = mig.incremental_migration(m)
    assert m1["rows_migrated"] == 100
    assert m1["max_incremental_value"] == "100"
    t = LogTable(spark, str(tmp_path / "users"))
    assert t.properties()["migration.hwm.seq"] == "100"

    # no new rows → no-op, cursor unchanged
    m2 = mig.incremental_migration(m)
    assert m2["rows_migrated"] == 0
    assert m2["max_incremental_value"] == "100"

    # source gains 5 new rows + 1 update re-sequenced past the HWM
    state["rows"] += [(i, f"v{i}", i) for i in range(101, 106)]
    state["rows"] = [
        (1, "v1-updated", 106) if r[0] == 1 else r for r in state["rows"]
    ]
    m3 = mig.incremental_migration(m)
    assert m3["rows_migrated"] == 6
    assert m3["max_incremental_value"] == "106"
    got = t.read()
    assert got.count() == 105  # 5 inserts, 1 update (not duplicated)
    assert got.filter(F.col("id") == 1).first()["val"] == "v1-updated"
    # the pushdown subquery actually reached the reader
    assert any("WHERE seq > '100'" in o["dbtable"] for o in reader.calls)


def test_batch_dispatches_by_config(spark, tmp_path, source):
    _, reader = source
    mig = RdbmsMigrator(spark, CFG, clock=lambda: 1700000000.0, reader=reader)
    out = mig.batch(
        [
            TableMigration("public.a", str(tmp_path / "a")),
            TableMigration(
                "public.b",
                str(tmp_path / "b"),
                key_columns=("id",),
                incremental_column="seq",
            ),
        ]
    )
    assert [m["mode"] for m in out] == ["full", "incremental"]
    assert all(m["rows_migrated"] == 100 for m in out)
