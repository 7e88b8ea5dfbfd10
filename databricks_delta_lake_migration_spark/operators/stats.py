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
    den_y = n * syy - sy * sy
    # degenerate groups (n=1 or constant x / constant y) have no
    # defined fit: make them EXPLICITLY NULL in both engines — Spark's
    # non-ANSI x/0 is NULL but DuckDB's double division yields
    # ±Inf/NaN, so an unguarded division flaps the cross-engine hash
    slope = F.when(den != 0, num / den)
    return agg.select(
        *group_cols,
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            F.when((den != 0) & (den_y != 0), (num * num) / (den * den_y)),
            6,
        ).alias("r2"),
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


def time_weighted_average(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted average (TWAP): each observation's value is
    weighted by how long it was the CURRENT value — the duration until
    the key's next observation. The last observation per key has no
    successor and carries zero weight (standard left-closed TWAP; pass
    a sentinel end-of-horizon row to include it). The feature-store /
    market-data summary a plain AVG silently gets wrong whenever
    observation spacing is uneven.

    Determinism: durations are exact epoch-micro longs; each
    value·duration product snaps to DECIMAL(28,4) before the exact
    per-key sum; the final division is one double op on identical
    inputs. ONE key-partitioned window shuffle (lead) + one rollup.
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    dur = F.lead(us).over(w) - us
    weighted = df.withColumn("__dur", dur).filter(
        F.col("__dur").isNotNull()
    )
    prod = F.round(
        F.col(value_col) * (F.col("__dur") / F.lit(1_000_000.0)), 4
    ).cast("decimal(28,4)")
    return (
        weighted.groupBy(*key_cols)
        .agg(
            F.sum(prod).alias("__sp"),
            F.sum(F.col("__dur")).alias("__sw"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(
            *key_cols,
            "n_obs",
            F.round(F.col("__sw") / F.lit(1_000_000.0), 6).alias(
                "total_sec"
            ),
            F.round(
                F.col("__sp").cast("double")
                / (F.col("__sw") / F.lit(1_000_000.0)),
                6,
            ).alias("twap"),
        )
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Generic column profiler: per column — row count, null count,
    null fraction, distinct non-null values, and Shannon entropy of
    the value distribution (bits, NULLs excluded) — the schema-
    discovery / join-key-triage pass a migration runs before anything
    else (upgrades the reference's single-table null profile, A7).

    Shape: every column melts to (column, value-as-string) via ONE
    unpivot scan (Expand), then one (column, value) aggregate feeds
    both the per-column rollup and the entropy terms — the whole
    profile is two shuffles regardless of column count. Entropy terms
    snap to DECIMAL(28,12) (the word-entropy posture) so the sum is
    order-independent.
    """
    long = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols]
    ).unpivot(ids=[], values=cols, variableColumnName="column",
              valueColumnName="value")
    vc = long.groupBy("column", "value").agg(
        F.count(F.lit(1)).alias("n")
    )
    per_col = vc.groupBy("column").agg(
        F.sum("n").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("n"))).alias("__nn"),
        F.count(F.when(F.col("value").isNotNull(), F.lit(1))).alias(
            "n_distinct"
        ),
    )
    nonnull = vc.filter(F.col("value").isNotNull())
    tot = Window.partitionBy("column")
    p = F.col("n") / F.sum("n").over(tot)
    ent_terms = nonnull.select(
        "column",
        F.round(-p * F.log2(p), 12).cast("decimal(28,12)").alias("t"),
    )
    entropy = ent_terms.groupBy("column").agg(
        F.round(F.sum("t"), 6).cast("double").alias("entropy")
    )
    return (
        per_col.join(entropy, "column", "left")
        .select(
            "column",
            "n_rows",
            F.coalesce(F.col("__nn"), F.lit(0)).alias("n_nulls"),
            F.round(
                F.coalesce(F.col("__nn"), F.lit(0)) / F.col("n_rows"), 6
            ).alias("null_frac"),
            "n_distinct",
            F.coalesce(F.col("entropy"), F.lit(0.0)).alias("entropy"),
        )
    )


def benford_audit(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford's-law first-digit audit: the leading significant digit
    of naturally-occurring amounts follows ``P(d) = log10(1 + 1/d)``;
    fabricated or constrained data doesn't — the classic
    fraud/synthetic-data screen (Benford 1938, public formulation).
    Emits one row per digit 1–9 with observed/expected fractions, the
    per-digit chi-square contribution, and the total chi-square
    repeated on every row (compare to the 15.507 critical value at
    8 df / 5%).

    Digit extraction is string-based over DECIMAL(38,18) (identical
    plain-notation text in any engine — no log10-of-double edge
    cases). Domain: amounts in [1e-18, 1e20); zero, negative, and
    out-of-range amounts (which the decimal cast NULLs) are excluded
    by the NULL-safe ``dec > 0`` filter — never silently miscounted
    as a digit. ONE 9-bucket aggregate; every fraction derives from
    exact integer counts.
    """
    dec = F.col(value_col).cast("decimal(38,18)")
    d = F.substring(
        F.regexp_replace(dec.cast("string"), r"^[-0.]+", ""),
        1, 1,
    ).cast("int")
    observed = (
        df.filter(dec > 0)
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    # all 9 cells, INCLUDING zero-count digits: a missing digit
    # contributes n·p(d) to chi-square — dropping empty cells would
    # understate the statistic exactly when the data is most skewed
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    counts = spine.join(F.broadcast(observed), "digit", "left").select(
        "digit", F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs")
    )
    tot = Window.partitionBy()
    n = F.sum("n_obs").over(tot)
    expected_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    chi_term = (
        (F.col("n_obs") - n * expected_p)
        * (F.col("n_obs") - n * expected_p)
        / (n * expected_p)
    )
    with_terms = counts.select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs") / n, 6).alias("obs_frac"),
        F.round(expected_p, 6).alias("expected_frac"),
        F.round(chi_term, 4).alias("chi2_term"),
    )
    total = Window.partitionBy()
    # the 9 rounded terms sum exactly in decimal (a raw double window
    # sum would be partial-order-dependent)
    return with_terms.withColumn(
        "chi2_total",
        F.round(
            F.sum(F.col("chi2_term").cast("decimal(18,4)")).over(total), 4
        ).cast("double"),
    )


def skew_profile(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Join/shuffle-key skew diagnostic: the ``top_n`` hottest key
    values with their row share, plus the cumulative share of the top
    keys — the number that tells you whether a shuffle on this key
    needs salting (q45) or AQE skew-join before you burn a cluster run
    discovering it. A healthy key shows shares near 1/n_keys; a 0.3
    top-1 share is a guaranteed straggler.

    ONE map-side-combined groupBy (the same cost as the shuffle being
    diagnosed, on purpose: the profile IS the dry run), then window
    math over the top-n rows only. Exact integer counts; shares round
    to 6 dp.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total_agg = counts.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    order = [F.col("n_rows").desc()] + [F.col(c).asc() for c in key_cols]
    top = (
        counts.orderBy(*order)
        .limit(top_n)
        .crossJoin(F.broadcast(total_agg))
    )
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return top.select(
        *key_cols,
        "n_rows",
        "n_keys",
        F.round(F.col("n_rows") / F.col("total_rows"), 6).alias("share"),
        F.round(F.sum("n_rows").over(w) / F.col("total_rows"), 6).alias(
            "cum_share"
        ),
        # divide BEFORE multiplying (share × n_keys in double): the
        # int64 product n_rows × n_keys wraps silently under non-ANSI
        # Spark once hot-key rows × key cardinality exceeds 2^63 — the
        # exact regime this diagnostic exists for
        F.round(
            F.col("n_rows") / F.col("total_rows") * F.col("n_keys"), 4
        ).alias("skew_factor"),
    )


def rolling_distinct(
    df: DataFrame,
    ts_col: str,
    entity_col: str,
    window_days: int = 7,
    approx: bool = False,
    hll_lg_k: int = 14,
) -> DataFrame:
    """Trailing-window distinct count (rolling N-day active entities)
    [EXT]: per calendar day, the distinct-entity count over the last
    ``window_days`` days — the DAU/WAU family. Spark has no
    ``COUNT(DISTINCT) OVER`` window; the composition is the idiomatic
    replacement: distinct (day, entity) → per-day entity sets →
    flatten+array_distinct over a RANGE frame keyed on the day number.
    Returns ``(day, n_daily, n_rolling)``.

    ``approx=True`` is the ≥10⁸-daily-entities path: per-day HLL
    sketches (``hll_sketch_agg``, KB-sized regardless of entity
    cardinality) replace ``collect_set``, and the same RANGE frame
    unions sketches (``hll_union_agg``) instead of flattening arrays.
    ``n_daily`` stays EXACT either way (it's a count over the already-
    distinct (day, entity) relation — no extra work); ``n_rolling``
    gets HLL's ~1.04/√2^``hll_lg_k`` relative error (~0.8% at the
    default lg_k=14), clamped to ≥ ``n_daily`` so the daily-subset-of-
    rolling invariant survives an HLL underestimate.

    Scale: the heavy work is the ONE (day, entity) distinct shuffle
    over the fact table; everything after operates on the per-day
    relation, whose cardinality is calendar-bounded (a year is 365
    rows), so the un-partitioned range window is over a metadata-sized
    relation — exact mode's per-day sets carry the full daily entity
    cardinality each (what bounds exact applicability and what
    ``approx`` removes)."""
    daily = df.select(
        F.to_date(ts_col).alias("day"),
        F.col(entity_col).alias("e"),
    ).distinct()
    w = Window.orderBy("day_num").rangeBetween(-(window_days - 1), 0)
    if approx:
        # count("e"), not count(*): NULL entities must stay excluded
        # exactly as exact mode's collect_set (and the sketch) exclude
        # them — count(*) would let n_daily exceed n_rolling on days
        # with NULL entities (review r9)
        sk = daily.groupBy("day").agg(
            F.count("e").alias("nd"),
            F.hll_sketch_agg(F.col("e").cast("string"), F.lit(hll_lg_k)).alias("sk"),
        ).withColumn("day_num", F.datediff("day", F.lit("1970-01-01")))
        # clamp to n_daily: the day's entities are a SUBSET of the
        # trailing window's, so n_daily <= n_rolling is an invariant
        # downstream checks may assert — an HLL underestimate of the
        # union must not be allowed to invert it (ADVICE r9)
        return sk.select(
            "day",
            F.col("nd").cast("long").alias("n_daily"),
            F.greatest(
                F.col("nd").cast("long"),
                F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
                .cast("long"),
            ).alias("n_rolling"),
        )
    sets = daily.groupBy("day").agg(
        F.collect_set("e").alias("es")
    ).withColumn("day_num", F.datediff("day", F.lit("1970-01-01")))
    return sets.select(
        "day",
        F.size("es").cast("long").alias("n_daily"),
        F.size(
            F.array_distinct(F.flatten(F.collect_list("es").over(w)))
        ).cast("long").alias("n_rolling"),
    )


def pareto_classification(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    a_cut: float = 0.8,
    b_cut: float = 0.95,
) -> DataFrame:
    """Pareto / ABC contribution analysis [EXT]: entities ranked by
    exact decimal value, with share, cumulative share, and the classic
    A (≤ ``a_cut`` of cumulative value) / B (≤ ``b_cut``) / C class —
    the 80/20 inventory-and-revenue triage. Ties rank deterministically
    by key. Class boundaries use the PREVIOUS row's cumulative share
    (an entity is 'A' if it's needed to REACH the A mass), so the
    first entity is always A and classes are contiguous.

    Scale: ONE map-side-combined aggregate reduces the fact table to
    the entity relation; the ranking window runs over that aggregate —
    entity cardinality is the operator's documented bound (millions of
    parts sort fine; for billions, bucket by the leading share digits
    via data-skipping stats first)."""
    ent = df.groupBy(*key_cols).agg(
        F.sum(F.col(value_col).cast("decimal(18,4)")).alias("val")
    )
    order = [F.col("val").desc()] + [F.col(c).asc() for c in key_cols]
    w = Window.orderBy(*order)
    total = Window.partitionBy()
    # sums stay exact decimal; every RATIO divides in double (Spark's
    # decimal/decimal division and DuckDB's differ in scale handling —
    # identical IEEE double division doesn't). Values here fit double
    # exactly (≤ 2^53 at 4 dp), so the decimal→double casts are exact
    # in both engines.
    cum = F.sum("val").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ).cast("double")
    tot = F.sum("val").over(total).cast("double")
    vald = F.col("val").cast("double")
    prev_cum_share = (cum - vald) / tot
    cls = (
        F.when(prev_cum_share < a_cut, "A")
        .when(prev_cum_share < b_cut, "B")
        .otherwise("C")
    )
    return ent.select(
        *key_cols,
        vald.alias("value"),
        F.round(vald / tot, 6).alias("share"),
        F.round(cum / tot, 6).alias("cum_share"),
        cls.alias("abc_class"),
    )


def stepped_decay_sum(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    half_life_days: int,
    horizon_col: str = "__horizon",
) -> DataFrame:
    """Half-life-decayed engagement score [EXT]: per entity,
    ``Σ value · 2^(−⌊Δdays / half_life⌋)`` against the corpus max date
    — the recency-weighted rollup feature stores keep per user. The
    decay is STEPPED (integer half-life buckets) on purpose: the
    weight is then an exact power of two, multiplication by it is
    EXACT in binary floating point, and the whole score is
    engine-portable — a continuous ``exp(−λΔt)`` hangs the cross-engine
    hash on the last ulp of each engine's libm. Returns ``(entity,
    n_events, decayed_sum)``.

    ONE entity-keyed aggregate after a broadcast of the 1-row horizon;
    weights are row-local."""
    horizon = df.agg(F.max(F.to_date(ts_col)).alias(horizon_col))
    steps = F.floor(
        F.datediff(F.col(horizon_col), F.to_date(ts_col))
        / F.lit(int(half_life_days))
    )
    weight = F.pow(F.lit(2.0), -steps.cast("double"))
    weighted = (F.col(value_col) * weight).cast("decimal(18,6)")
    return (
        df.crossJoin(F.broadcast(horizon))
        .groupBy(F.col(entity_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(weighted), 6).cast("double").alias("decayed_sum"),
        )
    )
