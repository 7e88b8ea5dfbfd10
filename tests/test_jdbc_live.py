"""LIVE JDBC transport tests (S5/S6) against embedded Derby — the JDBC
engine Spark ships in its own jars — so the partitioned parallel scan,
the pushdown subquery, and the full/incremental migration orchestration
run through Spark's real JDBC source, not an injected fake.

Derby folds unquoted identifiers to UPPER CASE while Spark's JDBC
writer quotes the DataFrame's column names verbatim; the fixtures use
upper-case columns so the orchestrator's unquoted SQL (pushdown WHERE,
MERGE conditions) resolves. The incremental column is a VARCHAR
timestamp because Derby will not compare a quoted string literal
against a numeric column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_migration_spark.sources.jdbc import (
    JdbcSourceConfig,
    jdbc_reader_options,
    read_jdbc,
)
from databricks_delta_lake_migration_spark.sources.migration import (
    RdbmsMigrator,
    TableMigration,
)
from databricks_delta_lake_migration_spark.tables import LogTable


@pytest.fixture()
def derby(spark, tmp_path):
    cfg = JdbcSourceConfig(
        engine="derby", host="", port=0, database=str(tmp_path / "db")
    )
    props = {"driver": cfg.driver()}

    def src_rows(lo, hi, day):
        return spark.range(lo, hi).select(
            F.col("id").alias("ID"),
            (F.col("id") % 5).cast("string").alias("GRP"),
            (F.col("id") * 1.5).alias("AMOUNT"),
            F.lit(day).alias("UPDATED"),
        )

    def write_src(df, table):
        # Spark's JDBC writer maps StringType to Derby CLOB, which is
        # not comparable against string literals — pin VARCHAR
        (
            df.write.format("jdbc")
            .option("url", cfg.url())
            .option("dbtable", table)
            .option("driver", cfg.driver())
            .option(
                "createTableColumnTypes",
                "GRP VARCHAR(10), UPDATED VARCHAR(10)",
            )
            .mode("overwrite")
            .save()
        )

    write_src(src_rows(0, 500, "2024-01-01"), "APP.SRC")
    return cfg, props, src_rows, write_src


@pytest.mark.slow
def test_partitioned_parallel_scan_live(spark, derby):
    cfg, _, _, _ = derby
    opts = jdbc_reader_options(
        cfg, "APP.SRC", partition_column="ID",
        num_partitions=4, lower_bound=0, upper_bound=500,
    )
    df = read_jdbc(spark, opts)
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 4


@pytest.mark.slow
def test_full_migration_live(spark, derby, tmp_path):
    cfg, _, _, _ = derby
    mig = RdbmsMigrator(spark, cfg, clock=lambda: 1700000000.0)
    res = mig.full_migration(
        TableMigration(
            source_table="APP.SRC",
            target_path=str(tmp_path / "t_full"),
            partition_column="ID",
            num_partitions=4,
            lower_bound=0,
            upper_bound=500,
        )
    )
    assert res["rows_migrated"] == 500
    got = LogTable(spark, str(tmp_path / "t_full")).read()
    assert got.count() == 500
    row = got.filter(F.col("ID") == 7).first()
    assert row["AMOUNT"] == 10.5
    assert row["source_system"] == "derby"
    assert row["source_table"] == "APP.SRC"


@pytest.mark.slow
def test_incremental_migration_live_hwm_loop(spark, derby, tmp_path):
    cfg, props, src_rows, write_src = derby
    mig = RdbmsMigrator(spark, cfg, clock=lambda: 1700000000.0)
    m = TableMigration(
        source_table="APP.SRC",
        target_path=str(tmp_path / "t_inc"),
        key_columns=("ID",),
        incremental_column="UPDATED",
    )
    r1 = mig.incremental_migration(m)
    assert r1["rows_migrated"] == 500
    assert r1["max_incremental_value"] == "2024-01-01"

    # replay with no new source rows: pushdown WHERE filters in Derby,
    # nothing crosses the wire, cursor unchanged
    r2 = mig.incremental_migration(m)
    assert r2["rows_migrated"] == 0
    assert r2["max_incremental_value"] == "2024-01-01"

    # day 2: 100 new rows + 50 updates land in the source
    write_src(src_rows(450, 600, "2024-01-02"), "APP.SRC2")
    # Derby has no UPSERT; stage day-2 rows in a second table and point
    # the migration at a union view of both days
    m2 = TableMigration(
        source_table="(SELECT * FROM APP.SRC WHERE ID < 450 "
        "UNION ALL SELECT * FROM APP.SRC2) u",
        target_path=str(tmp_path / "t_inc"),
        key_columns=("ID",),
        incremental_column="UPDATED",
    )
    r3 = mig.incremental_migration(m2)
    assert r3["rows_migrated"] == 150
    assert r3["max_incremental_value"] == "2024-01-02"

    t = LogTable(spark, str(tmp_path / "t_inc"))
    assert t.read().count() == 600  # 500 + 100 inserts, 50 updated in place
    assert t.read().filter(F.col("UPDATED") == "2024-01-02").count() == 150
    assert t.properties()["migration.hwm.UPDATED"] == "2024-01-02"
