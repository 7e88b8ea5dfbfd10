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
                  time travel, CDF, maintenance (OPTIMIZE/ZORDER/VACUUM).
- ``sources``   — batch readers (parquet/csv/json/orc), JDBC query builders.
- ``operators`` — relational/gold aggregates, SCD2, dedup family,
                  similarity search, text analysis, multimodal plumbing.
- ``functions`` — scalar helpers (portable row hashing, FX normalization).
- ``plans``     — medallion (bronze→silver→gold) pipeline runner.
- ``streaming`` — checkpointed file-source ingestion into log tables.
- ``queries``   — the declared query surface + DuckDB oracle SQL
                  (driver correctness gate).
"""

__version__ = "0.1.0"
