"""ACID log-structured table format (Delta-semantics on Parquet)."""

from .catalog import Catalog  # noqa: F401
from .logtable import LogTable, MergeBuilder  # noqa: F401
from .schema_utils import (  # noqa: F401
    evolution_plan,
    schema_diff,
    schema_from_ddl,
    schema_from_json_sample,
    schema_to_ddl,
)
