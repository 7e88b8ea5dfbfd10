"""RDBMS → log-table migration orchestration (reference
``migration/migrate_from_rdbms.py:60-260``).

Composes the pure JDBC option builders (:mod:`.jdbc`) with
:class:`~..tables.LogTable` writes:

- :meth:`RdbmsMigrator.full_migration` — snapshot copy with metadata
  stamping and overwrite semantics (``migrate_from_rdbms.py:60-124``).
- :meth:`RdbmsMigrator.incremental_migration` — high-water-mark loop
  (``migrate_from_rdbms.py:126-208``): pushdown ``WHERE hwm > last``
  subquery, MERGE upsert on the key columns, cursor persisted in the
  TARGET TABLE's properties (``migration.hwm.<column>``) so the loop
  is resumable from the table alone — the reference hands the cursor
  back to the caller, which loses it on crash.
- :meth:`RdbmsMigrator.batch` — config-driven multi-table run
  (``migrate_from_rdbms.py:210-260``).

Exactly-once story: the cursor commit follows the MERGE commit; a
crash between them re-extracts the last window, and the MERGE upsert
makes the replay idempotent.

The JDBC read is injectable (``reader=``) so the orchestration is
testable without a live database / driver jar; production uses the
default (Spark's built-in JDBC source — partitioned parallel scans,
predicate pushdown).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import LogTable
from .jdbc import JdbcSourceConfig, incremental_query, jdbc_reader_options, read_jdbc

HWM_PROP = "migration.hwm.{col}"


@dataclass(frozen=True)
class TableMigration:
    """One table's migration config (reference config.py:102-135)."""

    source_table: str
    target_path: str
    key_columns: tuple[str, ...] = ()
    incremental_column: str | None = None
    partition_column: str | None = None
    num_partitions: int = 8
    lower_bound: int | None = None
    upper_bound: int | None = None


@dataclass
class RdbmsMigrator:
    spark: SparkSession
    cfg: JdbcSourceConfig
    clock: Callable[[], float] = time.time
    reader: Callable[[dict], DataFrame] | None = None

    def _read(self, options: dict) -> DataFrame:
        if self.reader is not None:
            return self.reader(options)
        return read_jdbc(self.spark, options)

    def _stamp(self, df: DataFrame, source_table: str) -> DataFrame:
        ts = self.clock()
        return (
            df.withColumn(
                "migration_timestamp", F.timestamp_seconds(F.lit(ts))
            )
            .withColumn("source_system", F.lit(self.cfg.engine))
            .withColumn("source_table", F.lit(source_table))
        )

    # ------------------------------------------------------------------

    def full_migration(self, m: TableMigration) -> dict:
        """Snapshot copy: (optionally partitioned) parallel scan →
        stamped overwrite of the target log table."""
        t0 = time.perf_counter()
        opts = jdbc_reader_options(
            self.cfg,
            m.source_table,
            partition_column=m.partition_column,
            num_partitions=m.num_partitions,
            lower_bound=m.lower_bound,
            upper_bound=m.upper_bound,
        )
        df = self._stamp(self._read(opts), m.source_table)
        t = LogTable.create(self.spark, m.target_path, df.schema)
        t.overwrite(df, overwrite_schema=True)
        n = t.read().count()
        dur = time.perf_counter() - t0
        return {
            "source_table": m.source_table,
            "target_path": t.path,
            "mode": "full",
            "rows_migrated": n,
            "duration_seconds": round(dur, 3),
            "rows_per_second": round(n / dur) if dur > 0 else 0,
        }

    def incremental_migration(self, m: TableMigration) -> dict:
        """One high-water-mark increment: extract rows past the stored
        cursor (pushdown subquery), MERGE-upsert them, advance the
        cursor in table properties."""
        if not m.key_columns or m.incremental_column is None:
            raise ValueError(
                "incremental migration needs key_columns and incremental_column"
            )
        t0 = time.perf_counter()
        prop = HWM_PROP.format(col=m.incremental_column)
        t = LogTable(self.spark, m.target_path)
        last = t.properties().get(prop) if t.exists() else None

        opts = jdbc_reader_options(self.cfg, m.source_table)
        opts["dbtable"] = incremental_query(
            m.source_table, m.incremental_column, last
        )
        df = self._stamp(self._read(opts), m.source_table)
        # the batch is consumed twice (cursor aggregate + merge); cache
        # it so the remote extract crosses the wire once
        df.persist()

        # ONE tiny aggregate: batch size + next cursor together
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.max(m.incremental_column).cast("string").alias("hwm"),
        ).first()
        n, hwm = row["n"], row["hwm"]
        try:
            if n == 0:
                return {
                    "source_table": m.source_table,
                    "mode": "incremental",
                    "rows_migrated": 0,
                    "max_incremental_value": last,
                }

            if not t.exists():
                t = LogTable.create(self.spark, m.target_path, df.schema)
            cond = " AND ".join(
                f"target.{k} = source.{k}" for k in m.key_columns
            )
            (
                t.merge(df, cond)
                .when_matched_update_all()
                .when_not_matched_insert_all()
                .execute()
            )
            t.set_properties({prop: hwm})
        finally:
            df.unpersist()
        dur = time.perf_counter() - t0
        return {
            "source_table": m.source_table,
            "target_path": t.path,
            "mode": "incremental",
            "rows_migrated": n,
            "max_incremental_value": hwm,
            "duration_seconds": round(dur, 3),
            "rows_per_second": round(n / dur) if dur > 0 else 0,
        }

    def batch(self, tables: list[TableMigration]) -> list[dict]:
        """Config-driven multi-table run (migrate_from_rdbms.py:210-260).
        Sequential by design on a shared SparkSession: each table's scan
        already parallelizes across executors via partitioned JDBC
        reads — thread-level fan-out on the driver adds contention, not
        throughput, at cluster scale."""
        out = []
        for m in tables:
            if m.incremental_column:
                out.append(self.incremental_migration(m))
            else:
                out.append(self.full_migration(m))
        return out
