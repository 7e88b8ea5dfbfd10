"""ACID log-structured table format (Delta-semantics on Parquet)."""

from .catalog import Catalog  # noqa: F401
from .logtable import (  # noqa: F401
    ConcurrentDeleteError,
    ConcurrentTransactionError,
    ConcurrentWriteError,
    ConstraintViolationError,
    LogTable,
    MergeBuilder,
    MetadataChangedError,
)
from .maintenance import (  # noqa: F401
    MaintenanceConfig,
    run_maintenance,
    run_maintenance_batch,
    table_stats_advisor,
)
from .schema_utils import (  # noqa: F401
    evolution_plan,
    schema_diff,
    schema_from_ddl,
    schema_from_json_sample,
    schema_to_ddl,
)
