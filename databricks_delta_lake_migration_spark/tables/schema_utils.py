"""Schema utilities (SURVEY §1.2 / M1): compare, infer, and render
DataFrame schemas.

Reference parity:
- schema diff — ``/root/reference/src/delta_utils.py:203-231``
- schema from a JSON sample — ``delta_utils.py:234-240``
- schema → DDL column list — ``delta_utils.py:242-256``

All driver-side metadata work on ``StructType`` objects — no jobs, no
data reads — so the helpers cost the same at 100 TB as in a unit test.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def schema_diff(source: T.StructType, target: T.StructType) -> dict:
    """Field-level difference between two schemas.

    Returns ``{"missing_in_target": [...], "missing_in_source": [...],
    "type_mismatches": [{"column", "source_type", "target_type"}, ...],
    "compatible": bool}`` — compatible means the source can append into
    the target without evolution (every source field exists in the
    target with the same type).
    """
    s_fields = {f.name: f.dataType for f in source.fields}
    t_fields = {f.name: f.dataType for f in target.fields}
    missing_in_target = sorted(set(s_fields) - set(t_fields))
    missing_in_source = sorted(set(t_fields) - set(s_fields))
    mismatches = [
        {
            "column": name,
            "source_type": s_fields[name].simpleString(),
            "target_type": t_fields[name].simpleString(),
        }
        for name in sorted(set(s_fields) & set(t_fields))
        if s_fields[name] != t_fields[name]
    ]
    return {
        "missing_in_target": missing_in_target,
        "missing_in_source": missing_in_source,
        "type_mismatches": mismatches,
        "compatible": not missing_in_target and not mismatches,
    }


def schema_from_json_sample(spark: SparkSession, sample: str | list[str]) -> T.StructType:
    """Infer a schema from JSON sample document(s) — the OSS stand-in
    for Auto Loader's ``inferColumnTypes`` (explicit and auditable: the
    sample is versioned with the pipeline, not discovered at runtime).
    """
    docs = [sample] if isinstance(sample, str) else list(sample)
    return spark.read.json(spark.sparkContext.parallelize(docs)).schema


def schema_to_ddl(schema: T.StructType, comments: dict[str, str] | None = None) -> str:
    """Render a schema as a DDL column list (``name TYPE [COMMENT '…']``,
    newline-joined) suitable for ``CREATE TABLE (…)`` statements."""
    comments = comments or {}
    lines = []
    for f in schema.fields:
        line = f"{f.name} {f.dataType.simpleString().upper()}"
        if not f.nullable:
            line += " NOT NULL"
        c = comments.get(f.name) or (f.metadata or {}).get("comment")
        if c:
            line += " COMMENT '" + str(c).replace("'", "''") + "'"
        lines.append(line)
    return ",\n".join(lines)


def schema_from_ddl(ddl: str) -> T.StructType:
    """Parse a DDL column list back into a StructType (round-trip of
    :func:`schema_to_ddl`) via Spark's own DDL parser."""
    return T._parse_datatype_string(ddl)  # noqa: SLF001 — public-in-practice


def evolution_plan(source: T.StructType, target: T.StructType) -> list[str]:
    """ALTER TABLE statements (ADD COLUMNS) that would make ``target``
    accept ``source`` — the additive half of mergeSchema. Type changes
    and drops are intentionally NOT planned (they require overwrite
    semantics; delta refuses them on append too)."""
    d = schema_diff(source, target)
    s_fields = {f.name: f for f in source.fields}
    stmts = []
    if d["missing_in_target"]:
        cols = ", ".join(
            f"{n} {s_fields[n].dataType.simpleString().upper()}"
            for n in d["missing_in_target"]
        )
        stmts.append(f"ALTER TABLE {{table}} ADD COLUMNS ({cols})")
    return stmts
