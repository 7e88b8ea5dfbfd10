"""PySpark-native analytics engine with the capability surface of
``mjtpena/databricks-delta-lake-migration`` (see /root/repo/SURVEY.md).

Brand-new implementation — idiomatic Spark DataFrame/SQL throughout.
Because no delta-spark jars ship in this environment, the ACID table
layer (MERGE / time travel / CDF / OPTIMIZE / VACUUM / CLONE / RESTORE)
is provided by our own transaction-log table format
(:mod:`.tables.logtable`) built on Parquet + a JSON commit log, with
the same user-facing semantics as Delta Lake OSS.

Sub-packages
------------
- ``tables``    — log-structured ACID table format + DML (MERGE/UPDATE/DELETE),
                  time travel, CDF, maintenance (OPTIMIZE/ZORDER/VACUUM +
                  config-driven scheduler), 3-level named-table catalog with
                  a Delta-dialect SQL router, filesystem seam for object
                  stores.
- ``sources``   — batch readers (parquet/csv/json/orc), JDBC query builders,
                  RDBMS migration orchestration (full + incremental HWM).
- ``operators`` — relational/gold aggregates, SCD2, dedup family,
                  similarity search, text analysis, multimodal plumbing.
- ``functions`` — scalar helpers (portable row hashing, FX normalization).
- ``plans``     — composed medallion DAG (bronze→silver→gold incl. SCD2
                  users and five gold products).
- ``streaming`` — checkpointed file-source ingestion into log tables.
- ``queries``   — the declared query surface + DuckDB oracle SQL
                  (driver correctness gate).

Quick start::

    from databricks_delta_lake_migration_spark.session import build_session
    from databricks_delta_lake_migration_spark.tables import Catalog

    spark = build_session()
    cat = Catalog(spark, "/data/lake")
    t = cat.create_table("lake.silver.users", schema, partition_by=["day"])
    t.append(df)
    cat.sql("OPTIMIZE silver.users ZORDER BY (user_id)")
    cat.bind()                      # plain spark.table("silver.users") works
"""

__version__ = "0.1.0"
