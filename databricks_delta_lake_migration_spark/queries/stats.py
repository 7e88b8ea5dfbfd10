"""Statistics-tier registrations [EXT] (``operators.stats``): rolling
z-score anomalies, grouped least-squares trends, equi-depth
histograms. Oracles mirror the exact-integer sufficient-statistics
formulation so cross-engine hashes can't flap on float accumulation
order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load_table, query

# exact whole-dollar daily/monthly revenue: decimal-accumulated,
# rounded to integer units, BIGINT out (always < 2^53, so every
# engine's int->double conversion is exact)
_REV = "CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS BIGINT)"

_VAR = "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)"
_MEAN = "CAST(s AS DOUBLE) / n"
_Z = f"ROUND((rev - {_MEAN}) / sqrt({_VAR}), 4)"


@query(
    "q185_rolling_zscore",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, {_REV} AS rev
        FROM orders GROUP BY 1
    ), st AS (
        SELECT day, rev,
               COUNT(*) OVER w AS n,
               SUM(rev) OVER w AS s,
               SUM(CAST(rev AS DECIMAL(19,0)) * CAST(rev AS DECIMAL(19,0)))
                   OVER w AS ss
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ), scored AS (
        SELECT day, rev,
               ROUND({_MEAN}, 4) AS mean_w,
               CASE WHEN n > 1 AND {_VAR} > 0
                    THEN ROUND(sqrt({_VAR}), 4) END AS sd_w,
               CASE WHEN n > 1 AND {_VAR} > 0 THEN {_Z} END AS z
        FROM st
    )
    SELECT day, rev, mean_w, sd_w, z, abs(z) > 2.0 AS is_anomaly
    FROM scored
    """,
)
def q185_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day z-score over daily order revenue [EXT] —
    ``operators.stats.rolling_zscore``. The trailing-frame sufficient
    statistics (n, Σx, Σx²) are exact integer/decimal window sums;
    mean/sd/z are closed-form doubles on identical inputs, so the
    oracle hash can't flap on accumulation order. The daily rollup is
    map-side-combined before its one shuffle; the series window runs
    over the aggregate-sized result."""
    from ..operators.stats import rolling_zscore

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 0)
        .cast("long")
        .alias("rev")
    )
    return rolling_zscore(daily, "day", "rev", window_rows=7)


_SX, _SY = "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)"
_SXY, _SXX, _SYY = (
    "CAST(sxy AS DOUBLE)",
    "CAST(sxx AS DOUBLE)",
    "CAST(syy AS DOUBLE)",
)
_NUM = f"(n * {_SXY} - {_SX} * {_SY})"
_DEN = f"(n * {_SXX} - {_SX} * {_SX})"
_DENY = f"(n * {_SYY} - {_SY} * {_SY})"
# degenerate groups are explicitly NULL in both engines (mirrors the
# F.when guard in operators.stats.group_trend)
_SLOPE = f"(CASE WHEN {_DEN} <> 0 THEN {_NUM} / {_DEN} END)"
_R2 = (
    f"(CASE WHEN {_DEN} <> 0 AND {_DENY} <> 0 "
    f"THEN ({_NUM} * {_NUM}) / ({_DEN} * {_DENY}) END)"
)


@query(
    "q186_group_trend",
    oracle=f"""
    WITH monthly AS (
        SELECT o_orderpriority,
               year(o_orderdate) * 12 + month(o_orderdate) - 1 AS x,
               {_REV} AS y
        FROM orders GROUP BY 1, 2
    ), stats AS (
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(x AS BIGINT)) AS sx,
               SUM(CAST(y AS BIGINT)) AS sy,
               SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
               SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
               SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy
        FROM monthly GROUP BY 1
    )
    SELECT o_orderpriority, n,
           ROUND({_SLOPE}, 6) AS slope,
           ROUND(({_SY} - {_SLOPE} * {_SX}) / n, 6) AS intercept,
           ROUND({_R2}, 6) AS r2
    FROM stats
    """,
)
def q186_group_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority revenue trend fitted by distributed least squares
    [EXT] — ``operators.stats.group_trend``. Regression over 100 TB =
    shipping six exact sufficient statistics through one map-side-
    combined aggregate, never rows into a solver; slope/intercept/r²
    are per-group O(1) closed forms. Spark's regr_* built-ins
    accumulate in double (order-dependent), so the exact-integer
    statistics are what make the cross-engine hash stable."""
    from ..operators.stats import group_trend

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("x"),
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 0)
        .cast("long")
        .alias("y")
    )
    return group_trend(monthly, ["o_orderpriority"], "x", "y")


@query(
    "q187_equidepth_histogram",
    oracle="""
    WITH b AS (
        SELECT o_orderpriority, o_totalprice,
               ntile(8) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS bucket
        FROM orders
    )
    SELECT o_orderpriority, CAST(bucket AS INTEGER) AS bucket,
           COUNT(*) AS n_rows,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM b GROUP BY 1, 2
    """,
)
def q187_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority equi-depth order-value histogram [EXT] —
    ``operators.stats.equidepth_histogram``. ntile's integer
    first-buckets-get-the-remainder semantics are engine-portable, and
    the (value, key) tiebreak makes bucket membership deterministic.
    Partitioned by priority the sort is per-group — the scalable
    shape; the docstring routes global profiles to data-skipping
    stats instead."""
    from ..operators.stats import equidepth_histogram

    o = load_table(spark, sf_dir, "orders")
    return equidepth_histogram(
        o,
        "o_totalprice",
        n_buckets=8,
        partition_cols=["o_orderpriority"],
        tiebreak_col="o_orderkey",
    )


@query(
    "q191_quantile_profile",
    oracle="""
    SELECT c_mktsegment, n_orders,
           ROUND(q[1], 4) AS p25, ROUND(q[2], 4) AS p50,
           ROUND(q[3], 4) AS p75, ROUND(q[4], 4) AS p95
    FROM (
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               quantile_cont(o_totalprice, [0.25, 0.5, 0.75, 0.95]) AS q
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    )
    """,
)
def q191_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantile profile of order values per market
    segment [EXT]: ``percentile(col, array(...))`` — ONE grouped
    aggregate computing all four quantiles together (never one job per
    percentile), over a broadcast customer-dimension join. Exact
    percentile semantics (linear interpolation) are identical to
    DuckDB's quantile_cont — verified cross-engine, where the
    approximate sketch (``approx_percentile``, the 100 TB default;
    see A8/D23) could not be hash-compared."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o.o_custkey == c.c_custkey,
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "percentile(o_totalprice, array(0.25, 0.5, 0.75, 0.95))"
            ).alias("q"),
        )
        .select(
            "c_mktsegment",
            "n_orders",
            F.round(F.element_at("q", 1), 4).alias("p25"),
            F.round(F.element_at("q", 2), 4).alias("p50"),
            F.round(F.element_at("q", 3), 4).alias("p75"),
            F.round(F.element_at("q", 4), 4).alias("p95"),
        )
    )


@query(
    "q195_time_weighted_average",
    oracle="""
    WITH seq AS (
        SELECT user_id, value,
               lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) - epoch_us(ts) AS dur
        FROM events
    ), weighted AS (
        SELECT user_id,
               CAST(ROUND(value * (dur / 1000000.0), 4)
                    AS DECIMAL(28,4)) AS prod,
               dur
        FROM seq WHERE dur IS NOT NULL
    )
    SELECT user_id, COUNT(*) AS n_obs,
           ROUND(SUM(dur) / 1000000.0, 6) AS total_sec,
           ROUND(CAST(SUM(prod) AS DOUBLE) / (SUM(dur) / 1000000.0), 6)
               AS twap
    FROM weighted GROUP BY 1
    """,
)
def q195_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average event value per user [EXT] —
    ``operators.stats.time_weighted_average``: each observation
    weighted by how long it stayed current (duration to the next
    event). Durations are exact epoch-micro longs; value·duration
    products snap to DECIMAL(28,4) before the exact per-key sum —
    the plain AVG would silently misweight uneven spacing. ONE
    user-keyed lead window + one rollup."""
    from ..operators.stats import time_weighted_average

    e = load_table(spark, sf_dir, "events")
    return time_weighted_average(
        e, ["user_id"], "ts", "value", tiebreak_col="event_id"
    )


@query(
    "q196_column_profile",
    oracle="""
    WITH long AS (
        SELECT 'c_nationkey' AS "column",
               CAST(c_nationkey AS VARCHAR) AS value FROM customer
        UNION ALL
        SELECT 'c_mktsegment', c_mktsegment FROM customer
        UNION ALL
        SELECT 'c_acctbal', CAST(c_acctbal AS VARCHAR) FROM customer
    ), vc AS (
        SELECT "column", value, COUNT(*) AS n FROM long GROUP BY 1, 2
    ), per_col AS (
        SELECT "column", CAST(SUM(n) AS BIGINT) AS n_rows,
               CAST(COALESCE(SUM(CASE WHEN value IS NULL THEN n END), 0)
                    AS BIGINT) AS n_nulls,
               COUNT(CASE WHEN value IS NOT NULL THEN 1 END) AS n_distinct
        FROM vc GROUP BY 1
    ), ent AS (
        SELECT "column",
               CAST(ROUND(SUM(CAST(ROUND(
                   -(n * 1.0 / tot) * log2(n * 1.0 / tot), 12)
                   AS DECIMAL(28,12))), 6) AS DOUBLE) AS entropy
        FROM (
            SELECT "column", n,
                   SUM(n) OVER (PARTITION BY "column") AS tot
            FROM vc WHERE value IS NOT NULL
        ) GROUP BY 1
    )
    SELECT p."column", p.n_rows, p.n_nulls,
           ROUND(p.n_nulls * 1.0 / p.n_rows, 6) AS null_frac,
           p.n_distinct, COALESCE(e.entropy, 0.0) AS entropy
    FROM per_col p LEFT JOIN ent e USING ("column")
    """,
)
def q196_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic column profiler [EXT] — ``operators.stats.column_profile``
    over three customer columns: null fraction, distinct count, and
    Shannon entropy per column from ONE unpivot scan + one
    (column, value) aggregate (the whole profile is two shuffles
    regardless of column count — never a per-column job loop, the A7
    upgrade). Values compare as strings; distinctness and counts are
    representation-independent."""
    from ..operators.stats import column_profile

    c = load_table(spark, sf_dir, "customer")
    return column_profile(c, ["c_nationkey", "c_mktsegment", "c_acctbal"])


@query(
    "q197_benford_audit",
    oracle="""
    WITH obs AS (
        SELECT CAST(substring(regexp_replace(
                   CAST(CAST(o_totalprice AS DECIMAL(38,18)) AS VARCHAR),
                   '^[-0.]+', ''), 1, 1) AS INTEGER) AS digit,
               COUNT(*) AS n_obs
        FROM orders
        WHERE CAST(o_totalprice AS DECIMAL(38,18)) > 0 GROUP BY 1
    ), c AS (
        SELECT CAST(r.range AS INTEGER) AS digit,
               COALESCE(obs.n_obs, 0) AS n_obs
        FROM range(1, 10) r LEFT JOIN obs ON r.range = obs.digit
    ), terms AS (
        SELECT digit, n_obs,
               ROUND(n_obs * 1.0 / SUM(n_obs) OVER (), 6) AS obs_frac,
               ROUND(log10(1.0 + 1.0 / digit), 6) AS expected_frac,
               ROUND((n_obs - SUM(n_obs) OVER () * log10(1.0 + 1.0 / digit))
                     * (n_obs - SUM(n_obs) OVER () * log10(1.0 + 1.0 / digit))
                     / (SUM(n_obs) OVER () * log10(1.0 + 1.0 / digit)), 4)
                   AS chi2_term
        FROM c
    )
    SELECT digit, n_obs, obs_frac, expected_frac, chi2_term,
           CAST(ROUND(SUM(CAST(chi2_term AS DECIMAL(18,4))) OVER (), 4)
                AS DOUBLE) AS chi2_total
    FROM terms
    """,
)
def q197_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order amounts [EXT] —
    ``operators.stats.benford_audit``: observed vs expected
    log10(1+1/d) leading-digit fractions with per-digit and total
    chi-square. Digit extraction is string-based over DECIMAL(18,2)
    (identical text in any engine — no log10-of-double float edges);
    the 9-term chi-square total sums in exact decimal. ONE 9-bucket
    aggregate over a pushed positive-amount filter."""
    from ..operators.stats import benford_audit

    o = load_table(spark, sf_dir, "orders")
    return benford_audit(o, "o_totalprice")


@query(
    "q198_skew_profile",
    oracle="""
    WITH counts AS (
        SELECT l_suppkey, COUNT(*) AS n_rows FROM lineitem GROUP BY 1
    ), tot AS (
        SELECT SUM(n_rows) AS total_rows, COUNT(*) AS n_keys FROM counts
    ), top AS (
        SELECT * FROM counts, tot
        ORDER BY n_rows DESC, l_suppkey ASC LIMIT 10
    )
    SELECT l_suppkey, n_rows, n_keys,
           ROUND(n_rows * 1.0 / total_rows, 6) AS share,
           ROUND(SUM(n_rows) OVER (ORDER BY n_rows DESC, l_suppkey ASC
                                   ROWS UNBOUNDED PRECEDING)
                 * 1.0 / total_rows, 6) AS cum_share,
           ROUND(n_rows * 1.0 / total_rows * n_keys, 4) AS skew_factor
    FROM top
    """,
)
def q198_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic [EXT] — ``operators.stats.skew_profile``
    over lineitem's supplier key: hottest keys, shares, cumulative
    share, and the skew factor (share × n_keys; 1.0 = uniform) that
    says whether a join on this key needs salting (q45/J6) or AQE
    skew-join BEFORE the cluster run discovers it. One map-side-
    combined groupBy; window math touches only the top-n rows."""
    from ..operators.stats import skew_profile

    li = load_table(spark, sf_dir, "lineitem")
    return skew_profile(li, ["l_suppkey"], top_n=10)


@query(
    "q208_rolling_distinct",
    oracle="""
    WITH daily AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (
        SELECT day, COUNT(*) AS n_daily FROM daily GROUP BY 1
    )
    SELECT d.day, d.n_daily,
           (SELECT COUNT(DISTINCT u.user_id) FROM daily u
            WHERE u.day BETWEEN d.day - 6 AND d.day) AS n_rolling
    FROM days d
    """,
)
def q208_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users [EXT] —
    ``operators.stats.rolling_distinct``: Spark lacks COUNT(DISTINCT)
    OVER, so per-day entity sets are flattened+deduped over a RANGE
    frame — exact, and the window runs over the calendar-bounded
    per-day relation, not the fact table (whose only pass is the one
    (day, user) distinct shuffle). The 100 TB escape hatch when daily
    cardinality outgrows a set is the HLL sketch union (q158)."""
    from ..operators.stats import rolling_distinct

    ev = load_table(spark, sf_dir, "events")
    return rolling_distinct(ev, "ts", "user_id", window_days=7)


@query(
    "q214_pareto_abc",
    oracle="""
    WITH ent AS (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4)))
               AS val
        FROM lineitem GROUP BY 1
    ), ranked AS (
        SELECT l_partkey,
               CAST(val AS DOUBLE) AS vald,
               CAST(SUM(val) OVER (ORDER BY val DESC, l_partkey ASC
                    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cumd,
               CAST(SUM(val) OVER () AS DOUBLE) AS totd
        FROM ent
    )
    SELECT l_partkey, vald AS value,
           ROUND(vald / totd, 6) AS share,
           ROUND(cumd / totd, 6) AS cum_share,
           CASE WHEN (cumd - vald) / totd < 0.8 THEN 'A'
                WHEN (cumd - vald) / totd < 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def q214_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC revenue triage over parts [EXT] —
    ``operators.stats.pareto_classification``: exact decimal entity
    rollup (one map-side-combined shuffle), ranking window over the
    ENTITY relation only; every ratio divides in double on identical
    exact inputs so class boundaries can't flap cross-engine. Class
    uses the previous row's cumulative share, so classes are contiguous
    and the top entity is always A."""
    from ..operators.stats import pareto_classification

    li = load_table(spark, sf_dir, "lineitem")
    return pareto_classification(li, ["l_partkey"], "l_extendedprice")


@query(
    "q216_decayed_engagement",
    oracle="""
    WITH h AS (SELECT MAX(CAST(ts AS DATE)) AS hd FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(ROUND(SUM(CAST(value * pow(2.0,
                    -CAST(floor(date_diff('day', CAST(ts AS DATE), hd)
                                / 7) AS DOUBLE))
                AS DECIMAL(18,6))), 6) AS DOUBLE) AS decayed_sum
    FROM events, h
    GROUP BY 1
    """,
)
def q216_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life-decayed per-user engagement score [EXT] —
    ``operators.stats.stepped_decay_sum`` at a 7-day half life: weights
    are exact powers of two (stepped decay), so the weighted products
    are exact double scalings and the decimal-snapped sum is
    engine-portable — the deliberate alternative to exp(−λΔt), whose
    last-ulp libm differences hang cross-engine hashes. ONE entity
    aggregate after broadcasting the 1-row horizon."""
    from ..operators.stats import stepped_decay_sum

    ev = load_table(spark, sf_dir, "events")
    return stepped_decay_sum(ev, "user_id", "ts", "value", half_life_days=7)
