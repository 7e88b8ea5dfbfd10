"""Distributed statistics operators [EXT]: rolling anomaly scores,
grouped least-squares trends, and equi-depth histograms — the
profiling / monitoring tier a warehouse runs over its fact tables
(reference surface: the reference stops at describe()-style summaries,
``src/data_processor.py`` summary helpers; these add ordered and
model-fitting statistics).

Cross-engine determinism doctrine (shared with the registry's dsum
family): every SUFFICIENT STATISTIC is accumulated EXACTLY — integer
counts, whole-unit integer sums, or decimal(38,0) product sums — and
floating point enters only in the final closed-form arithmetic, where
both engines execute the identical IEEE expression on identical
inputs. Never sum doubles across partitions (order-dependent), never
cast wide decimals to double before the math is done.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rolling_zscore(
    df: DataFrame,
    order_col: str,
    value_col: str,
    window_rows: int = 7,
    partition_cols: list[str] | None = None,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Rolling z-score anomaly detection: each row's ``value_col``
    (an exact INTEGER series — pre-round currency to whole units)
    scored against the trailing ``window_rows``-row mean/stddev within
    its partition. Emits ``mean_w``, ``sd_w``, ``z`` (4 dp) and
    ``is_anomaly`` (|z| > threshold); rows whose trailing window has
    zero variance get NULL z.

    The frame sums (n, Σx, Σx²) are exact integer window aggregates —
    map-ordered, engine-portable; mean/sd/z are then closed-form
    doubles on identical integers. Σx² accumulates x·x with x cast to
    decimal(19,0) so the product can't overflow int64 at warehouse
    magnitudes (decimal(38,0) sums stay exact in both Spark and any
    int128-backed engine).

    Scale: ONE shuffle — the partitioned window sort. With
    ``partition_cols`` the sort is per-key (the 100 TB shape: score
    each series independently); without, the series is assumed to be
    an already-aggregated rollup (days, hours — aggregate-sized), not
    a raw fact table.
    """
    parts = partition_cols or []
    w = (
        Window.partitionBy(*parts).orderBy(F.col(order_col).asc())
        if parts
        else Window.orderBy(F.col(order_col).asc())
    ).rowsBetween(-(window_rows - 1), Window.currentRow)
    x = F.col(value_col).cast("long")
    xx = x.cast("decimal(19,0)") * x.cast("decimal(19,0)")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(x).over(w)
    ss = F.sum(xx).over(w)
    mean = s.cast("double") / n
    var = (
        (ss.cast("double") - s.cast("double") * s.cast("double") / n)
        / (n - 1)
    )
    sd = F.sqrt(var)
    z = F.when(
        (n > 1) & (var > 0), F.round((x - mean) / sd, 4)
    )
    return df.select(
        *parts,
        order_col,
        value_col,
        F.round(mean, 4).alias("mean_w"),
        F.when((n > 1) & (var > 0), F.round(sd, 4)).alias("sd_w"),
        z.alias("z"),
        (F.abs(z) > z_threshold).alias("is_anomaly"),
    )


def _trend_stats(x: Column, y: Column) -> list[Column]:
    """Exact sufficient statistics of a least-squares fit: n, Σx, Σy
    as int64; Σxy, Σx², Σy² as decimal(38,0) (overflow-proof exact)."""
    xd = x.cast("decimal(19,0)")
    yd = y.cast("decimal(19,0)")
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("long")).alias("sx"),
        F.sum(y.cast("long")).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    ]


def group_trend(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line fitted distributively
    from sufficient statistics: ``slope``, ``intercept``, ``r2`` (all
    6 dp) and ``n`` per group. ``x_col``/``y_col`` must be exact
    integer series (epoch days/months, whole-unit amounts).

    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²); intercept = (Σy − m·Σx)/n;
    r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²)).

    Scale: the six statistics are ONE grouped aggregate — map-side
    partial sums shrink every partition to one row per group before
    the single shuffle; the closed form is per-group O(1). This is how
    regression fits 100 TB without a solver: ship sums, not rows.
    (Spark's regr_slope/regr_r2 built-ins accumulate in DOUBLE —
    partial-order-dependent, so cross-engine hash checks would flap;
    the exact-integer statistics are portable.)
    """
    agg = df.groupBy(*group_cols).agg(
        *_trend_stats(F.col(x_col), F.col(y_col))
    )
    n = F.col("n")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = num / den
    return agg.select(
        *group_cols,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round((num * num) / (den * (n * syy - sy * sy)), 6).alias("r2"),
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 8,
    partition_cols: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram: rows are ntile'd into
    ``n_buckets`` by ``value_col`` and each bucket reports its row
    count and [lo, hi] value range — the skew-revealing complement of
    the equi-width histogram (a hot key shows up as a bucket whose
    range collapses to a point).

    ntile semantics are standard SQL (first ``n mod k`` buckets get
    the extra row) — integer-exact and engine-portable; ties order by
    ``tiebreak_col`` so bucket membership is deterministic.

    Scale: with ``partition_cols`` the sort is per-group — thousands
    of independent per-segment histograms is the 100 TB shape. An
    UN-partitioned call funnels the whole relation through one window
    partition; for global histograms at scale use the table's
    data-skipping stats or approx percentiles instead (D23/A8) — this
    operator is for exact, auditable profiles.
    """
    parts = partition_cols or []
    order = [F.col(value_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = (
        Window.partitionBy(*parts).orderBy(*order)
        if parts
        else Window.orderBy(*order)
    )
    return (
        df.withColumn("bucket", F.ntile(n_buckets).over(w))
        .groupBy(*parts, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
    )
