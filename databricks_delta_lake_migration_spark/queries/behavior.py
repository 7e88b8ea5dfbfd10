"""Behavioral-analytics registrations [EXT]: sessionization, funnels,
cohort retention, transition matrices (``operators.behavior``). Each
carries a DuckDB oracle running the identical windowed SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import load_table, query


@query(
    "q177_sessionize",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         > 1800 * 1000000
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sid AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM tagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           ROUND((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0, 6)
               AS duration_sec
    FROM sid GROUP BY 1, 2
    """,
)
def q177_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization [EXT]: one row per (user, session)
    where a >30-min silence starts a new session —
    ``operators.behavior.sessionize``. Session boundaries come from a
    lag + running-sum pair sharing ONE user-keyed window sort; gaps
    compare in exact epoch micros (no double-rounded timestamps).
    Reference surface: the reference aggregates events only per fixed
    time bucket (src/data_processor.py aggregate_data); gap sessions
    are the stateful generalization every product-analytics user asks
    for first."""
    from ..operators.behavior import sessionize

    e = load_table(spark, sf_dir, "events")
    return sessionize(e, gap_seconds=1800)


@query(
    "q178_funnel",
    oracle="""
    WITH u1 AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0
        FROM events GROUP BY 1
    ), u2 AS (
        SELECT u1.user_id, u1.t0,
               MIN(CASE WHEN e.event_type = 'click' AND e.ts >= u1.t0
                        THEN e.ts END) AS t1
        FROM u1 JOIN events e USING (user_id) GROUP BY 1, 2
    ), u3 AS (
        SELECT u2.user_id, u2.t0, u2.t1,
               MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= u2.t1
                        THEN e.ts END) AS t2
        FROM u2 JOIN events e USING (user_id) GROUP BY 1, 2, 3
    ), c AS (
        SELECT COUNT(t0) AS n0, COUNT(t1) AS n1, COUNT(t2) AS n2 FROM u3
    )
    SELECT 1 AS step, 'view' AS step_name, n0 AS n_users,
           ROUND(n0 * 1.0 / n0, 4) AS conversion_pct FROM c
    UNION ALL
    SELECT 2, 'click', n1, ROUND(n1 * 1.0 / n0, 4) FROM c
    UNION ALL
    SELECT 3, 'purchase', n2, ROUND(n2 * 1.0 / n0, 4) FROM c
    """,
)
def q178_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion [EXT]: view → click-at-or-after-view →
    purchase-at-or-after-click, counted per user —
    ``operators.behavior.funnel``. The k per-step "first qualifying
    timestamp" columns are stacked unbounded min-windows over ONE
    user-keyed exchange (never k self-joins of the fact table; the
    oracle uses the join formulation to prove equivalence)."""
    from ..operators.behavior import funnel

    e = load_table(spark, sf_dir, "events")
    return funnel(e, steps=["view", "click", "purchase"])


@query(
    "q179_cohort_retention",
    oracle="""
    WITH c AS (
        SELECT o_custkey, year(o_orderdate) AS p,
               MIN(year(o_orderdate)) OVER (PARTITION BY o_custkey)
                   AS cohort
        FROM orders
    ), cells AS (
        SELECT cohort, p - cohort AS period_offset,
               COUNT(DISTINCT o_custkey) AS n_active
        FROM c GROUP BY 1, 2
    )
    SELECT CAST(cohort AS INTEGER) AS cohort,
           CAST(period_offset AS INTEGER) AS period_offset, n_active,
           ROUND(n_active * 1.0 /
                 MAX(CASE WHEN period_offset = 0 THEN n_active END)
                     OVER (PARTITION BY cohort), 4) AS retention_pct
    FROM cells
    """,
)
def q179_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix [EXT]: customers cohorted by first-order
    year; each cell = distinct customers still ordering k years later,
    normalized by cohort size — ``operators.behavior.cohort_retention``.
    ONE fact-table shuffle (per-user min-window cohort assignment);
    the normalizer is a window over the already-tiny matrix, never a
    join back to the facts."""
    from ..operators.behavior import cohort_retention

    o = load_table(spark, sf_dir, "orders")
    return cohort_retention(o, user_col="o_custkey", ts_col="o_orderdate")


@query(
    "q180_event_transitions",
    oracle="""
    WITH nxt AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS to_type
        FROM events
    ), pairs AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 6)
               AS prob
    FROM pairs
    """,
)
def q180_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream [EXT]:
    P(next event type | current type) per user timeline —
    ``operators.behavior.event_transitions``. ONE user-keyed lead
    window, then a k×k aggregate whose row normalizer is a window over
    the matrix itself."""
    from ..operators.behavior import event_transitions

    e = load_table(spark, sf_dir, "events")
    return event_transitions(e)


@query(
    "q194_merge_intervals",
    oracle="""
    WITH iv AS (
        SELECT user_id, ts AS s, ts + INTERVAL 10 MINUTE AS e
        FROM events
    ), flags AS (
        SELECT user_id, s, e,
               CASE WHEN max(epoch_us(e)) OVER prevw IS NULL
                      OR epoch_us(s) > max(epoch_us(e)) OVER prevw
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
        WINDOW prevw AS (PARTITION BY user_id ORDER BY s, e
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING)
    ), isl AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (
                   PARTITION BY user_id ORDER BY s, e
                   ROWS UNBOUNDED PRECEDING) AS island
        FROM flags
    )
    SELECT user_id, CAST(island AS BIGINT) AS island,
           MIN(s) AS island_start, MAX(e) AS island_end,
           COUNT(*) AS n_intervals
    FROM isl GROUP BY 1, 2
    """,
)
def q194_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merge [EXT] —
    ``operators.behavior.merge_intervals``: each event opens a 10-min
    activity window per user; overlapping windows collapse into
    maximal coverage islands via the running-MAX-of-ends flag (not
    lag-of-end — an early long interval must swallow later short
    ones). ONE user-keyed window sort + one island rollup, exact
    epoch-micro comparisons."""
    from pyspark.sql import functions as F

    from ..operators.behavior import merge_intervals

    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
    )
    return merge_intervals(iv, ["user_id"], "s", "e")


@query(
    "q203_rfm_segments",
    oracle="""
    WITH ent AS (
        SELECT user_id,
               MAX(CAST(ts AS DATE)) AS last_day,
               COUNT(*) AS frequency,
               SUM(CAST(value AS DECIMAL(18,4))) AS monetary_d
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), h AS (SELECT MAX(last_day) AS hd FROM ent),
    scored AS (
        SELECT user_id,
               CAST(date_diff('day', last_day, hd) AS BIGINT)
                   AS recency_days,
               frequency,
               CAST(ROUND(monetary_d, 4) AS DOUBLE) AS monetary,
               ntile(4) OVER (ORDER BY date_diff('day', last_day, hd)
                              DESC NULLS FIRST, user_id ASC) AS r_score,
               ntile(4) OVER (ORDER BY frequency ASC, user_id ASC)
                   AS f_score,
               ntile(4) OVER (ORDER BY monetary_d ASC NULLS FIRST,
                              user_id ASC) AS m_score
        FROM ent, h
    )
    SELECT user_id, recency_days, frequency, monetary,
           CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           r_score || '' || f_score || '' || m_score AS segment
    FROM scored
    """,
)
def q203_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer-value segmentation [EXT] —
    ``operators.behavior.rfm_segments`` over purchase events: exact
    per-user recency/frequency/monetary rollup (ONE map-side-combined
    aggregate over the event table), then quartile scores via three
    ntile windows over the ENTITY relation — thousands of times
    smaller than the events; ties break on user_id so segment
    membership is deterministic in both engines."""
    from ..operators.behavior import rfm_segments

    ev = load_table(spark, sf_dir, "events").filter(
        "event_type = 'purchase'"
    )
    return rfm_segments(ev, "user_id", "ts", "value", n_tiles=4)


@query(
    "q205_touch_attribution",
    oracle="""
    WITH conv AS (
        SELECT COALESCE(first_value(
                   CASE WHEN event_type <> 'purchase' THEN event_type END
                   IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               'direct') AS first_ch,
               COALESCE(last_value(
                   CASE WHEN event_type <> 'purchase' THEN event_type END
                   IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               'direct') AS last_ch,
               CAST(value AS DECIMAL(18,4)) AS v,
               event_type
        FROM events
    ), p AS (SELECT * FROM conv WHERE event_type = 'purchase'),
    ft AS (
        SELECT first_ch AS channel, COUNT(*) AS n_first,
               CAST(ROUND(SUM(v), 4) AS DOUBLE) AS first_touch_rev
        FROM p GROUP BY 1
    ), lt AS (
        SELECT last_ch AS channel, COUNT(*) AS n_last,
               CAST(ROUND(SUM(v), 4) AS DOUBLE) AS last_touch_rev
        FROM p GROUP BY 1
    )
    SELECT COALESCE(ft.channel, lt.channel) AS channel,
           COALESCE(n_first, 0) AS n_first,
           COALESCE(first_touch_rev, 0.0) AS first_touch_rev,
           COALESCE(n_last, 0) AS n_last,
           COALESCE(last_touch_rev, 0.0) AS last_touch_rev
    FROM ft FULL OUTER JOIN lt ON ft.channel = lt.channel
    """,
)
def q205_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-/last-touch purchase attribution [EXT] —
    ``operators.behavior.touch_attribution``: each purchase credits
    the user's earliest and latest PRIOR non-purchase event type (or
    'direct'). Both bookends are ignore-nulls first/last windows over
    ONE user-keyed sort (running state — never a per-conversion
    lookback self-join); the channel rollups aggregate only the
    purchase-sized relation with exact decimal revenue."""
    from ..operators.behavior import touch_attribution

    ev = load_table(spark, sf_dir, "events")
    return touch_attribution(
        ev, "user_id", "ts", "event_type", "value",
        conversion_type="purchase", tiebreak_col="event_id",
    )


@query(
    "q210_conversion_lag",
    oracle="""
    WITH pe AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
               MIN(CASE WHEN event_type = 'purchase'
                        AND ts >= (SELECT MIN(ts) FROM events e2
                                   WHERE e2.user_id = e.user_id
                                     AND e2.event_type = 'signup')
                   THEN ts END) AS t1
        FROM events e GROUP BY user_id
    )
    SELECT CASE WHEN t1 IS NOT NULL
                THEN CAST(floor(date_diff('microsecond', t0, t1)
                                / 86400000000.0) AS BIGINT)
                ELSE -1 END AS lag_days,
           COUNT(*) AS n_entities
    FROM pe WHERE t0 IS NOT NULL
    GROUP BY 1
    """,
)
def q210_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase activation-lag distribution [EXT] —
    ``operators.behavior.conversion_lag``: first signup and first
    subsequent purchase are conditional min-windows over ONE
    entity-keyed exchange; never-converted users are an explicit -1
    bucket. Exact epoch-micro arithmetic floor-bucketed to days."""
    from ..operators.behavior import conversion_lag

    ev = load_table(spark, sf_dir, "events")
    return conversion_lag(
        ev, "user_id", "ts", "event_type",
        from_type="signup", to_type="purchase",
    )


@query(
    "q211_event_throttle",
    oracle="""
    WITH g AS (
        SELECT event_type,
               date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts ASC, event_id ASC),
                   ts) AS gap_us
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(CASE WHEN gap_us < 600000000 THEN 1 END) AS n_throttled
    FROM g GROUP BY 1
    """,
)
def q211_event_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry-storm suppression audit [EXT] —
    ``operators.behavior.throttle_events`` at a 600 s minimum gap per
    (user, type): lag over ONE (entity, type)-keyed window in exact
    epoch micros, then a per-type rollup of throttle counts. True
    last-KEPT-event debounce is running state → the stateful streaming
    path (q159), documented in the operator."""
    from ..operators.behavior import throttle_events

    ev = load_table(spark, sf_dir, "events")
    flagged = throttle_events(
        ev, "user_id", "event_type", "ts",
        min_gap_seconds=600, tiebreak_col="event_id",
    )
    from pyspark.sql import functions as F

    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("is_throttled"), 1)).alias("n_throttled"),
    )


@query(
    "q213_debounce_exact",
    oracle="""
    WITH RECURSIVE ordered AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts ASC, event_id ASC) AS rn
        FROM events
    ),
    keep AS (
        SELECT user_id, event_type, rn, ts AS last_kept, TRUE AS kept
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.user_id, o.event_type, o.rn,
               CASE WHEN date_diff('microsecond', k.last_kept, o.ts)
                         >= 600000000
                    THEN o.ts ELSE k.last_kept END,
               date_diff('microsecond', k.last_kept, o.ts) >= 600000000
        FROM ordered o
        JOIN keep k ON o.user_id = k.user_id
                   AND o.event_type = k.event_type
                   AND o.rn = k.rn + 1
    )
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(CASE WHEN kept THEN 1 END) AS n_kept
    FROM keep GROUP BY 1
    """,
)
def q213_debounce_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True last-KEPT-event debounce [EXT] —
    ``operators.behavior.debounce_events`` at 600 s per (user, type):
    the sequential recurrence runs as ONE applyInPandas over the
    entity grouping (Arrow-batched; parallel across groups, sequential
    only along each group's own timeline — §7.3's legitimate Pandas
    case). The oracle is a DuckDB RECURSIVE CTE stepping rn→rn+1 —
    the declarative restatement of the same recurrence. Compare
    q211 (lag-window throttle): same fixture, provably different
    semantics (a burst's second event resets the lag clock but not
    the debounce clock)."""
    from pyspark.sql import functions as F

    from ..operators.behavior import debounce_events

    ev = load_table(spark, sf_dir, "events")
    flagged = debounce_events(
        ev, ["user_id", "event_type"], "ts",
        min_gap_seconds=600, tiebreak_col="event_id",
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(F.col("kept"), 1)).alias("n_kept"),
    )
