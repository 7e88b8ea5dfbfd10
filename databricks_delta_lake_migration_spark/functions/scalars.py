"""Scalar helper expressions (SURVEY §2.9)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference FX semantics (02_silver_transformation.py:231-237) —
# hard-coded rates preserved for parity; table-driven override below.
DEFAULT_FX = {"USD": 1.0, "EUR": 1.1, "GBP": 1.25}


def amount_usd(amount: Column, currency: Column, rates: dict[str, float] | None = None) -> Column:
    """Currency normalization when-chain; rates table-drivable."""
    rates = rates or DEFAULT_FX
    expr = None
    for cur, rate in rates.items():
        cond = currency == cur
        expr = F.when(cond, amount * rate) if expr is None else expr.when(cond, amount * rate)
    return expr.otherwise(amount)


def bucketize(col: Column, edges: list[float], labels: list[str]) -> Column:
    """CASE bucket chain (gold LTV segments, 03_gold_aggregation.py:199-214)."""
    assert len(labels) == len(edges) + 1
    expr = F.when(col <= edges[0], labels[0])
    for i in range(1, len(edges)):
        expr = expr.when(col <= edges[i], labels[i])
    return expr.otherwise(labels[-1])


def salted_grouped_sum(
    df, group_cols: list[str], value_col: str, n_salts: int = 16, alias: str = "total"
):
    """Two-stage salted aggregation for skewed group keys [EXT]:
    stage 1 aggregates on (key, salt) — spreading a hot key over
    ``n_salts`` reducers — stage 2 merges the partials. Value-identical
    to a direct groupBy-sum (decimal accumulation is associative);
    use when one key holds a disproportionate share of rows and AQE
    skew handling isn't available (e.g. pre-3.0 clusters or
    non-join aggregations)."""
    from pyspark.sql import functions as F

    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    partial = salted.groupBy(*group_cols, "__salt").agg(
        F.sum(F.col(value_col).cast("decimal(18,4)")).alias("__partial")
    )
    return (
        partial.groupBy(*group_cols)
        .agg(F.round(F.sum("__partial"), 4).cast("double").alias(alias))
    )
