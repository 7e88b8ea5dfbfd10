"""File-system migration source (S1-S4, U1, Q4 — reference
``migration/migrate_from_hdfs.py`` / ``migrate_from_s3.py``).

Multi-format readers, multi-path union consolidation, full and
incremental (date-partitioned) migration into a log table, and
row-count/schema validation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import LogTable

SUPPORTED_FORMATS = ("parquet", "csv", "json", "orc", "avro")


def avro_available(spark: SparkSession) -> bool:
    """The avro DataSource lives in the separate ``spark-avro`` module
    (not bundled with pyspark). Probe the datasource REGISTRY, not the
    classpath — stray avro-* util jars make a Class.forName probe lie —
    so callers fail up-front with guidance instead of deep inside a job.
    A missing-path error from the probe means the datasource resolved."""
    try:
        spark.read.format("avro").schema("__probe int").load(
            "/__avro_datasource_probe__"
        )
        return True
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source" not in str(e)


def read_files(
    spark: SparkSession,
    path: str,
    file_format: str = "parquet",
    schema: T.StructType | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Format-dispatched batch read (migrate_from_hdfs.py:94-134).
    CSV defaults to header+inferSchema when no schema is given
    (migrate_from_hdfs.py:130-132); parquet gets recursive lookup +
    glob filtering like the bronze ingester
    (01_bronze_ingestion.py:158-164)."""
    if file_format not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {file_format!r}")
    if file_format == "avro" and not avro_available(spark):
        # the JVM spark-avro connector is not bundled with pyspark;
        # fall back to the from-scratch pure-Python OCF DataSource
        # (sources/avro_py.py — Spark 4 Python DataSource, one
        # partition per file, executor-side decode)
        from .avro_py import read_avro

        return read_avro(spark, path, schema=schema)
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    opts = dict(options or {})
    if file_format == "csv":
        opts.setdefault("header", "true")
        if schema is None:
            opts.setdefault("inferSchema", "true")
    if file_format == "parquet":
        opts.setdefault("recursiveFileLookup", "true")
        opts.setdefault("pathGlobFilter", "*.parquet")
    return r.options(**opts).format(file_format).load(path)


def union_paths(
    spark: SparkSession,
    paths: list[str],
    file_format: str = "parquet",
    schema: T.StructType | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Multi-path consolidation (U1 — migrate_from_s3.py:286-295).
    One reader call with all paths: Spark builds a single FileIndex, so
    Catalyst sees one scan (the reference's Python-loop-of-unions
    builds N plans for no reason)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.options(**(options or {})).format(file_format).load(paths)


@dataclass
class MigrationReport:
    """Validation result (Q4 — migrate_from_rdbms.py:263-327)."""

    source_rows: int
    target_rows: int
    rows_match: bool
    missing_columns: list[str]
    extra_columns: list[str]
    type_mismatches: list[str]

    @property
    def passed(self) -> bool:
        return self.rows_match and not self.missing_columns and not self.type_mismatches


METADATA_COLS = {"ingestion_timestamp", "ingestion_date", "source_file", "data_hash"}


def validate_migration(source: DataFrame, target: DataFrame) -> MigrationReport:
    """Row-count + schema validation, ignoring engine-added metadata
    columns (migrate_from_hdfs.py:305-354). One count per side — no
    per-column actions."""
    s_fields = {f.name: f.dataType.simpleString() for f in source.schema.fields}
    t_fields = {
        f.name: f.dataType.simpleString()
        for f in target.schema.fields
        if f.name not in METADATA_COLS
    }
    missing = sorted(set(s_fields) - set(t_fields))
    extra = sorted(set(t_fields) - set(s_fields))
    mismatched = sorted(
        n for n in set(s_fields) & set(t_fields) if s_fields[n] != t_fields[n]
    )
    s_rows, t_rows = source.count(), target.count()
    return MigrationReport(
        source_rows=s_rows,
        target_rows=t_rows,
        rows_match=s_rows == t_rows,
        missing_columns=missing,
        extra_columns=extra,
        type_mismatches=mismatched,
    )


def migrate_directory(
    spark: SparkSession,
    source_path: str,
    table_path: str,
    file_format: str = "parquet",
    schema: T.StructType | None = None,
    mode: str = "full",
    partition_template: str = "date={d}",
    dates: list[str] | None = None,
    partition_by: list[str] | None = None,
    transform=None,
) -> MigrationReport:
    """Migrate a directory tree into a log table
    (migrate_from_hdfs.py:137-273).

    ``mode='full'`` overwrites from the whole tree; ``mode='incremental'``
    reads only ``partition_template``-shaped subdirs for ``dates`` and
    appends them idempotently via replaceWhere on ``migration_date``.
    ``transform`` is the reference's ``transformation_func`` hook
    (migrate_from_hdfs.py:245-273): DataFrame → DataFrame between read
    and write.
    """
    if mode == "full":
        df = read_files(spark, source_path, file_format, schema)
        if transform is not None:
            df = transform(df)
        t = LogTable.create(spark, table_path, df.schema, partition_by=partition_by or [])
        t.overwrite(df)
        return validate_migration(df, t.read())
    if mode != "incremental":
        raise ValueError(f"unknown mode {mode!r}")
    if not dates:
        raise ValueError("incremental mode needs dates")
    parts = []
    for d in dates:
        sub = os.path.join(source_path, partition_template.format(d=d))
        part = read_files(spark, sub, file_format, schema).withColumn(
            "migration_date", F.lit(d)
        )
        parts.append(part)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    if transform is not None:
        df = transform(df)
    t = LogTable.create(
        spark, table_path, df.schema, partition_by=["migration_date"]
    )
    quoted = ", ".join(f"'{d}'" for d in dates)
    t.overwrite(df, replace_where=f"migration_date IN ({quoted})")
    expected = df
    return validate_migration(
        expected, t.read().filter(F.col("migration_date").isin(dates))
    )
