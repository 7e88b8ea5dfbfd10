"""Binned range join [EXT]: the scale pattern for range joins with NO
equi key (SURVEY §2.8 extension).

A pure range predicate (``point BETWEEN start AND end``) gives Catalyst
nothing to hash on, so it plans a BroadcastNestedLoopJoin (small side)
or a cartesian product (both sides big) — O(n·m) comparisons, the
classic 100 TB range-join cliff. The standard fix (Databricks' range
join optimization, implemented here from first principles with public
operators only): quantize the domain into fixed-width bins, explode
each interval across the bins it overlaps, map each point to the one
bin containing it, hash-join on the bin id, and re-check the exact
predicate. Work drops from n·m to the true overlap density times a
small bin-spill factor; the shuffle is an ordinary equi shuffle.

A point lands in exactly ONE bin, and an interval copy exists in every
bin it overlaps — so every qualifying (point, interval) pair meets in
exactly one bin and the join emits no duplicates by construction (no
dedup pass needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BIN_COL = "__range_bin"


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start <= point < end`` via bin-bucketed equi join.

    ``point_col`` / ``start_col`` / ``end_col`` must be integral (cast
    dates/timestamps to days or epoch seconds first — keeps the
    operator domain-agnostic). ``bin_width`` should be on the order of
    the typical interval length: each interval explodes into
    ``len/bin_width + 1`` copies, so a too-small width inflates the
    build side while a too-large width degrades pruning.

    Returns the joined rows (all columns from both inputs). Empty
    intervals (start >= end) match nothing, like the raw predicate.

    Scale design: ONE equi shuffle on the bin id (hash-partitioned,
    AQE-skew-eligible); interval explosion is a row-local
    ``sequence``+``explode``; the exact range re-check is a post-join
    filter. Never a cartesian, never a nested loop — plan-gated in
    ``tests/test_plans.py``.
    """
    # floor (not cast-truncate): negative domains (pre-epoch days)
    # must bin downward or boundary points land one bin off. Exact
    # INTEGER floor division — (c - pmod(c, w)) div w — never
    # float `/`: doubles hold only 53 mantissa bits, so epoch-micro
    # domains past 2^53 would round and land points one bin off,
    # silently dropping qualifying matches. pmod is non-negative for a
    # positive modulus, so the subtraction floors (not truncates) on
    # negative domains, and `div` of the exactly-divisible numerator
    # is exact long arithmetic end to end.
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")

    def _bin(expr: str):
        c = f"CAST(({expr}) AS BIGINT)"
        return F.expr(f"(({c}) - pmod({c}, {bin_width})) div {bin_width}")

    p = points.withColumn(BIN_COL, _bin(point_col))
    iv = intervals.withColumn(
        BIN_COL,
        # end is exclusive: the last overlapped bin is the one holding
        # end - 1. Empty intervals (start >= end) must be guarded OUT —
        # Spark's sequence(5, 3) counts DOWN rather than yielding [],
        # which would resurrect them into spurious bins.
        F.explode(
            F.when(
                F.col(start_col) < F.col(end_col),
                F.sequence(
                    _bin(start_col),
                    _bin(f"({end_col}) - 1"),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    return (
        p.join(iv, BIN_COL)
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop(BIN_COL)
    )
