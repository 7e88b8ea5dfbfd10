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


def salted_join(
    fact,
    dim,
    key_cols: list[str],
    n_salts: int = 8,
    fact_salt_cols: list[str] | None = None,
    how: str = "inner",
):
    """Salted shuffle join for skewed join keys [EXT]: the dimension
    side replicates ``n_salts``× (one copy per salt — row-local
    explode, no shuffle to build), the fact side stamps a
    deterministic per-row salt (xxhash64 of ``fact_salt_cols``,
    default: the key columns plus every other fact column), and the
    join shuffles on (key, salt) — a hot key's rows spread over
    ``n_salts`` reducers instead of melting one. Result-identical to
    the unsalted join; use when the dim is too big to broadcast and
    AQE skew-join isn't available (or its per-partition split can't
    help, e.g. a single hot KEY inside one huge partition).

    Replication cost is |dim| × n_salts rows — pick n_salts from the
    observed hot-key share, not a big default.

    Only fact-preserving join types are supported: because the dim
    side is replicated per salt, ``right``/``full`` outer joins would
    emit every unmatched dim row ``n_salts`` times (and the replicas
    of matched dim rows that land on other salts as extra
    null-extended rows) — a silent correctness bug, so those ``how``
    values raise instead."""
    from pyspark.sql import functions as F

    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join does not support how={how!r}: the dim side is "
            f"replicated per salt, so right/full outer joins would emit "
            f"unmatched dim rows n_salts times. Supported: inner, left, "
            f"left_semi, left_anti."
        )
    salt_src = fact_salt_cols or [c for c in fact.columns]
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts))
    )
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    joined = f.join(d, key_cols + ["__salt"], how)
    return joined.drop("__salt")
