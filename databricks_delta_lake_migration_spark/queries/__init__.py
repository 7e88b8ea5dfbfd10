"""Declared query surface of the engine.

Every operator family from SURVEY.md §2 is exercised by at least one
registered query; each registration carries the equivalent DuckDB
oracle SQL (or ``None`` for genuinely non-SQL-expressible operators,
which get a rows-only check from the driver).
"""

from .registry import REGISTRY, Query, load_table, query  # noqa: F401

# Import modules for registration side effects.
from . import relational  # noqa: F401, E402
from . import text  # noqa: F401, E402
from . import similarity  # noqa: F401, E402
from . import acid  # noqa: F401, E402
from . import medallion  # noqa: F401, E402
from . import curation  # noqa: F401, E402
from . import behavior  # noqa: F401, E402
from . import stats  # noqa: F401, E402
from . import graph  # noqa: F401, E402


def all_queries():
    return dict(REGISTRY)
