"""JDBC migration source (S5/S6 — reference
``migration/migrate_from_rdbms.py``).

The query-builder layer is pure (no SparkSession, no database), so it
is unit-testable offline (SURVEY §7.4 item 7); ``read_jdbc`` applies
the built options to ``spark.read.format("jdbc")`` — Spark's built-in
source then does predicate pushdown and partitioned parallel reads.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# driver class per engine (migrate_from_rdbms.py:329-340); derby is the
# embedded engine Spark ships with (its metastore backend), so the whole
# JDBC transport is live-testable without an external server — see
# tests/test_jdbc_live.py
JDBC_DRIVERS = {
    "postgresql": "org.postgresql.Driver",
    "mysql": "com.mysql.cj.jdbc.Driver",
    "sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "oracle": "oracle.jdbc.driver.OracleDriver",
    "sqlite": "org.sqlite.JDBC",
    "derby": "org.apache.derby.jdbc.EmbeddedDriver",
}


@dataclass(frozen=True)
class JdbcSourceConfig:
    """Connection + parallelism config (migrate_from_rdbms.py:35-96)."""

    engine: str
    host: str
    port: int
    database: str
    user: str = ""
    password: str = ""
    fetch_size: int = 10000
    extra: dict[str, str] = field(default_factory=dict)

    def url(self) -> str:
        """JDBC URL (migrate_from_rdbms.py:35-51)."""
        if self.engine == "sqlserver":
            return f"jdbc:sqlserver://{self.host}:{self.port};databaseName={self.database}"
        if self.engine == "oracle":
            return f"jdbc:oracle:thin:@{self.host}:{self.port}:{self.database}"
        if self.engine == "derby":
            # embedded: database is a filesystem path, no host/port
            return f"jdbc:derby:{self.database};create=true"
        return f"jdbc:{self.engine}://{self.host}:{self.port}/{self.database}"

    def driver(self) -> str:
        return JDBC_DRIVERS[self.engine]


def jdbc_reader_options(
    cfg: JdbcSourceConfig,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> dict[str, str]:
    """Option dict for a (possibly partitioned) parallel scan
    (migrate_from_rdbms.py:77-96). With a partition column, Spark
    issues ``num_partitions`` range-sliced queries concurrently — the
    scale path for big source tables."""
    opts = {
        "url": cfg.url(),
        "dbtable": table,
        "user": cfg.user,
        "password": cfg.password,
        "driver": cfg.driver(),
        "fetchsize": str(cfg.fetch_size),
        **cfg.extra,
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower_bound and upper_bound")
        opts.update(
            {
                "partitionColumn": partition_column,
                "numPartitions": str(num_partitions),
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
            }
        )
    return opts


def incremental_query(table: str, incremental_column: str, last_value: str | None) -> str:
    """Pushdown subquery for incremental extraction
    (migrate_from_rdbms.py:152-166): the WHERE clause executes in the
    source database, so only new rows cross the wire."""
    if last_value is None:
        return table
    return (
        f"(SELECT * FROM {table} WHERE {incremental_column} > '{last_value}') "
        f"AS incremental_extract"
    )


def sample_query(table: str, n: int = 100) -> str:
    """Pushdown sampling subquery (migrate_from_rdbms.py:296-305)."""
    return f"(SELECT * FROM {table} LIMIT {n}) AS sample_extract"


def count_query(table: str) -> str:
    """Source-side row count (migrate_from_rdbms.py:283-294)."""
    return f"(SELECT COUNT(*) AS cnt FROM {table}) AS count_extract"


def read_jdbc(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    """Materialize the configured scan (built-in JDBC source; needs the
    engine's driver jar on the classpath at deploy time)."""
    return spark.read.format("jdbc").options(**options).load()
