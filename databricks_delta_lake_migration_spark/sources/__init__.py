"""Migration connectors: JDBC (RDBMS), files (HDFS/S3-style), Hive."""

from .jdbc import JdbcSourceConfig, incremental_query, jdbc_reader_options, sample_query  # noqa: F401
from .migration import RdbmsMigrator, TableMigration  # noqa: F401
from .files import (  # noqa: F401
    MigrationReport,
    migrate_directory,
    read_files,
    union_paths,
    validate_migration,
)
