"""Query registry: name → (spark callable, DuckDB oracle SQL).

Cross-engine determinism rules (SURVEY.md §7.4 item 5):

- Floating-point SUMs are accumulated in ``DECIMAL(18,4)`` (exact,
  order-independent) and cast back to DOUBLE for output — Spark's
  partial-aggregation order then cannot perturb the value vs DuckDB.
- Averages/ratios divide two exact quantities in DOUBLE (IEEE — same
  result in both engines) and round.
- Timestamps are compared in UTC (session timezone pinned in
  :mod:`..session`).
- Arrays are rendered ``concat_ws(',')`` after ``array_sort`` so that
  collect_set's nondeterministic ordering can't leak into hashes.
"""

from __future__ import annotations

import os
import threading
import uuid
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


# Numbering note (audit aid): q69 is intentionally UNUSED. The ACID
# tier ended at q68_cdc_mirror and the medallion tier that landed next
# started at the round number q70 (commit b98688d); the slot was never
# backfilled. Registrations are keyed by NAME — the gap is cosmetic,
# kept so historical CORRECTNESS_r*.json rows stay aligned.
REGISTRY: dict[str, Query] = {}

_SHIPPED: set[int] = set()
_SHIP_LOCK = threading.Lock()


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    Queries using mapInPandas / pandas_udf pickle closures that
    reference package-module globals; workers then need the package
    importable. When the driver process runs outside the repo (the
    round driver, a notebook), the workers' sys.path won't have it —
    a zipped copy shipped through the Spark files mechanism works in
    every deployment mode, local or cluster."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    # Serialized + atomic: concurrent driver threads (guide §2.6 job
    # overlap — e.g. the threaded oracle-parity harness) both passing
    # the _SHIPPED check used to race the zip build; one thread could
    # addPyFile a HALF-WRITTEN zip while another was still writing it,
    # after which every executor fetch fails with "exists and does not
    # match contents" and the session is wedged. The lock serializes
    # shippers; the write-to-temp + os.replace makes the zip appear
    # atomically, so a reader process can never observe a partial file.
    with _SHIP_LOCK:
        if key in _SHIPPED:
            return
        import tempfile
        import zipfile

        pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        pkg_name = os.path.basename(pkg_dir)
        zpath = os.path.join(
            tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
        )
        if not os.path.exists(zpath):
            tmp = f"{zpath}.tmp-{uuid.uuid4().hex}"
            with zipfile.ZipFile(tmp, "w") as z:
                for root, _, names in os.walk(pkg_dir):
                    for n in names:
                        if n.endswith(".py"):
                            full = os.path.join(root, n)
                            z.write(
                                full,
                                os.path.join(
                                    pkg_name, os.path.relpath(full, pkg_dir)
                                ),
                            )
            os.replace(tmp, zpath)
        spark.sparkContext.addPyFile(zpath)
        _SHIPPED.add(key)


def query(name: str, oracle: str | None = None):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_package_shipped(spark)
            # the driver may hand us a session built without our
            # factory; pin the runtime-settable determinism confs the
            # oracles depend on (timestamps render in session TZ — a
            # non-UTC session would shift every collected timestamp
            # against the DuckDB oracle)
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "")
        return wrapped

    return deco


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema-preserving parquet scan of one driver fixture table (S1).

    ``events.parquet`` carries TIMESTAMP(NANOS) which the Spark parquet
    reader rejects; we read nanos as long (dynamic legacy conf) and
    truncate to microsecond timestamps — the same truncation DuckDB
    applies, so oracles stay aligned.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_kind = df.schema["ts"].dataType.simpleString()
        if ts_kind == "bigint":
            # integer div, NOT `/`: nano epoch values exceed 2^53, so
            # double division rounds the last microsecond digit.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_kind == "timestamp_ntz":
            # Spark 4.x reads TIMESTAMP(NANOS) as TIMESTAMP_NTZ (ignoring
            # nanosAsLong) and forbids NTZ→BIGINT casts downstream.
            # Re-type to session-TZ timestamp: the session is pinned UTC,
            # so the wall-clock reinterpretation is epoch-identical to the
            # naive-as-UTC value DuckDB sees — and epoch arithmetic
            # (cast("long"), unix_timestamp) works again.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---- portable exact-aggregation helpers (Spark side) ----------------------

# NB: every exact decimal sum is ROUND(…, 4)-snapped BEFORE the double
# cast. Two reasons, both empirically verified against DuckDB 1.x:
# (1) DuckDB's wide-decimal→DOUBLE cast is int128→double→÷10^scale (two
#     lossy steps, 1-ULP off for unscaled values > 2^53) while Spark's
#     BigDecimal→double is correctly rounded — snapping to scale 4 keeps
#     the unscaled value far inside 2^53 where both are exact.
# (2) DuckDB's decimal→decimal CAST *truncates*; ROUND() is
#     half-away-from-zero, which matches Spark's HALF_UP.

def dsum(col, alias: str, scale: int = 4):
    """Order-independent SUM of a double column: exact decimal accumulate,
    round to 4 dp, DOUBLE out. SQL twin: :func:`sql_dsum`."""
    return (
        F.round(F.sum(F.col(col).cast(f"decimal(18,{scale})")), 4)
        .cast("double")
        .alias(alias)
    )


def dsum_expr(expr, alias: str, scale: int = 4):
    """Like :func:`dsum` for a computed column expression. The expression is
    evaluated per-row in DOUBLE (IEEE-deterministic), snapped to decimal,
    then summed exactly."""
    return (
        F.round(F.sum(expr.cast(f"decimal(18,{scale})")), 4)
        .cast("double")
        .alias(alias)
    )


def sql_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,{scale}))), 4) AS DOUBLE)"


# ---- exact decimal products -----------------------------------------------
# A double→decimal cast of a per-row PRODUCT lands exactly on the
# rounding boundary whenever the inputs have fixed decimal scales
# (price has 2 dp, so price*(1-disc) has exactly 4 dp) — and Spark
# (BigDecimal HALF_UP) and DuckDB disagree on boundary rounding. The
# portable pattern: snap each FACTOR to decimal (far from boundaries),
# multiply exactly in decimal, sum exactly, cast DOUBLE at the end.

def dfactor(col, scale: int = 4):
    """Snap one multiplicand to decimal (exact for fixed-scale inputs)."""
    return col.cast(f"decimal(18,{scale})")


def dprod_sum(a, b, alias: str):
    """SUM(dec(a) * dec(b)) rounded to 4 dp as double — order-independent
    & portable. ``b`` should be the small factor (rate/multiplier),
    snapped at decimal(8,4)."""
    return (
        F.round(F.sum(a.cast("decimal(18,4)") * b.cast("decimal(8,4)")), 4)
        .cast("double")
        .alias(alias)
    )


def sql_dprod_sum(a: str, b: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({a} AS DECIMAL(18,4)) * CAST({b} AS DECIMAL(8,4))), 4)"
        " AS DOUBLE)"
    )
