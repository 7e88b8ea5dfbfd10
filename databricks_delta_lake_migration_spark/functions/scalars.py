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
