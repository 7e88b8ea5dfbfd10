"""Unit tests for operators.behavior with hand-checked fixtures."""

import pytest

from pyspark.sql import functions as F  # noqa: F401

from databricks_delta_lake_migration_spark.operators.behavior import (
    cohort_retention,
    event_transitions,
    funnel,
    sessionize,
)


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_sessionize_gap_boundaries(spark):
    """Events 30:00 apart stay in one session (gap must EXCEED);
    30:01 starts a new one; ties within a ts order by event_id."""
    rows = [
        (1, 10, _ts("2024-01-01 00:00:00"), "a"),
        (2, 10, _ts("2024-01-01 00:30:00"), "a"),   # exactly gap -> same
        (3, 10, _ts("2024-01-01 01:00:01"), "a"),   # 30:01 -> new session
        (4, 20, _ts("2024-01-01 00:00:00"), "a"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {
        (r.user_id, r.session_id): (r.n_events, r.duration_sec)
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    assert out[(10, 1)] == (2, 1800.0)
    assert out[(10, 2)] == (1, 0.0)
    assert out[(20, 1)] == (1, 0.0)


def test_funnel_ordered_semantics(spark):
    """A click BEFORE the first view does not convert; one at the same
    ts does (inclusive >=)."""
    rows = [
        (1, 1, _ts("2024-01-01 00:05:00"), "view"),
        (2, 1, _ts("2024-01-01 00:04:00"), "click"),   # before view: no
        (3, 2, _ts("2024-01-01 00:00:00"), "view"),
        (4, 2, _ts("2024-01-01 00:00:00"), "click"),   # same ts: yes
        (5, 2, _ts("2024-01-01 00:01:00"), "purchase"),
        (6, 3, _ts("2024-01-01 00:00:00"), "click"),   # never viewed
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {
        r.step_name: (r.n_users, r.conversion_pct)
        for r in funnel(df, ["view", "click", "purchase"]).collect()
    }
    assert out["view"] == (2, 1.0)
    assert out["click"] == (1, 0.5)
    assert out["purchase"] == (1, 0.5)


def test_cohort_retention_matrix(spark):
    """2 users cohorted 2020 (one returns 2021), 1 user cohorted 2021."""
    rows = [
        (1, _ts("2020-03-01")), (1, _ts("2021-07-01")),
        (2, _ts("2020-05-01")),
        (3, _ts("2021-01-01")),
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp")
    out = {
        (r.cohort, r.period_offset): (r.n_active, r.retention_pct)
        for r in cohort_retention(df, "uid", "ts").collect()
    }
    assert out[(2020, 0)] == (2, 1.0)
    assert out[(2020, 1)] == (1, 0.5)
    assert out[(2021, 0)] == (1, 1.0)


def test_event_transitions_probabilities(spark):
    """view->click twice, view->buy once: P=2/3 and 1/3; last events
    have no successor."""
    rows = [
        (1, 1, _ts("2024-01-01 00:00:00"), "view"),
        (2, 1, _ts("2024-01-01 00:01:00"), "click"),
        (3, 1, _ts("2024-01-01 00:02:00"), "view"),
        (4, 1, _ts("2024-01-01 00:03:00"), "buy"),
        (5, 2, _ts("2024-01-01 00:00:00"), "view"),
        (6, 2, _ts("2024-01-01 00:01:00"), "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {
        (r.from_type, r.to_type): (r.n, r.prob)
        for r in event_transitions(df).collect()
    }
    assert out[("view", "click")] == (2, round(2 / 3, 6))
    assert out[("view", "buy")] == (1, round(1 / 3, 6))
    assert out[("click", "view")] == (1, 1.0)
    assert sum(n for n, _ in out.values()) == 4


@pytest.mark.slow
def test_sessionize_matches_reference_hypothesis(spark):
    """Property test: sessionize equals the brute-force gap-splitting
    reference for arbitrary integer-second event layouts (dup
    timestamps included — tiebreak by event id)."""
    from hypothesis import given, settings, strategies as st

    events = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 120)),
        min_size=1, max_size=14,
    )

    @settings(max_examples=12, deadline=None)
    @given(events)
    def run(evs):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        rows = [
            (i, u, base + datetime.timedelta(seconds=s))
            for i, (u, s) in enumerate(evs)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp"
        )
        got = {
            (r.user_id, r.session_id): (
                r.n_events, r.session_start, r.session_end
            )
            for r in sessionize(df, gap_seconds=30).collect()
        }
        # brute force: sort per user by (ts, event_id), split on gap>30s
        ref = {}
        for u in {u for _, (u, _) in enumerate(evs)}:
            seq = sorted(
                (t, i) for i, (uu, s) in enumerate(evs)
                if uu == u
                for t in [base + datetime.timedelta(seconds=s)]
            )
            sid, start = 0, None
            groups = []
            for t, i in seq:
                if start is None or (t - prev).total_seconds() > 30:
                    groups.append([])
                    start = t
                groups[-1].append(t)
                prev = t
            for k, g in enumerate(groups, 1):
                ref[(u, k)] = (len(g), g[0], g[-1])
        assert got == ref

    run()


@pytest.mark.slow
def test_merge_intervals_matches_reference_hypothesis(spark):
    """Property test: merge_intervals equals brute-force sweep-line
    merging for arbitrary integer interval sets."""
    from hypothesis import given, settings, strategies as st

    ivs = st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 15)),
        min_size=1, max_size=12,
    )

    @settings(max_examples=12, deadline=None)
    @given(ivs)
    def run(raw):
        from databricks_delta_lake_migration_spark.operators.behavior import (
            merge_intervals,
        )

        rows = [("k", s, s + w) for s, w in raw]
        df = spark.createDataFrame(rows, "k string, s long, e long")
        got = sorted(
            (r.island_start, r.island_end, r.n_intervals)
            for r in merge_intervals(df, ["k"], "s", "e").collect()
        )
        # brute force sweep
        sor = sorted((s, s + w) for s, w in raw)
        ref = []
        for s, e in sor:
            if ref and s <= ref[-1][1]:
                ref[-1] = (ref[-1][0], max(ref[-1][1], e), ref[-1][2] + 1)
            else:
                ref.append((s, e, 1))
        assert got == [tuple(r) for r in ref]

    run()


def test_rfm_segments_hand_checked(spark):
    """4 users, 2 tiles: inverted R polarity (most recent = high
    score), exact decimal monetary, deterministic tie-break."""
    from databricks_delta_lake_migration_spark.operators.behavior import (
        rfm_segments,
    )

    rows = [
        (1, "2024-01-10 00:00:00", 10.0),  # recent, 1 event, small
        (2, "2024-01-01 00:00:00", 100.0),  # old, 2 events, big
        (2, "2024-01-02 00:00:00", 100.0),
        (3, "2024-01-08 00:00:00", 50.0),
        (3, "2024-01-09 00:00:00", 5.0),
        (4, "2024-01-03 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    out = {r.user_id: r for r in rfm_segments(df, "user_id", "ts", "value", n_tiles=2).collect()}
    assert out[1].recency_days == 0 and out[1].r_score == 2
    assert out[2].recency_days == 8 and out[2].r_score == 1
    assert out[2].monetary == 200.0 and out[2].m_score == 2
    assert out[1].frequency == 1 and out[2].frequency == 2
    assert out[2].f_score == 2
    assert out[4].segment == "111"
    # tie-break on user_id: users 1 and 4 both have frequency 1;
    # ascending id order puts user 1 in the low tile deterministically
    assert out[1].f_score == 1


def test_rfm_segments_null_amounts_pinned(spark):
    """ADVICE r8 + review r9: an entity whose every amount is NULL has
    NULL monetary and must land in the WORST m-tile deterministically
    (NULLS FIRST pin on the ASC sort); an entity whose every ts is
    NULL has NULL recency and must land in the WORST r-tile (NULLS
    FIRST on the inverted-R DESC sort — nulls_last would have scored
    the never-seen customer BEST). Both match the DuckDB oracle's
    explicit pins, not either engine's divergent default."""
    import duckdb
    from databricks_delta_lake_migration_spark.operators.behavior import (
        rfm_segments,
    )

    rows = [
        (1, "2024-01-10 00:00:00", None),   # all-NULL amounts
        (1, "2024-01-11 00:00:00", None),
        (2, "2024-01-05 00:00:00", 100.0),
        (3, "2024-01-08 00:00:00", 50.0),
        (4, "2024-01-03 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    out = {
        r.user_id: r
        for r in rfm_segments(df, "user_id", "ts", "value", n_tiles=2).collect()
    }
    assert out[1].monetary is None
    assert out[1].m_score == 1  # NULL = worst tile, not engine-dependent
    assert out[2].m_score == 2
    # cross-engine: the DuckDB twin with the same NULLS FIRST pin agrees
    ora = duckdb.sql(
        """
        WITH ent AS (SELECT * FROM (VALUES
            (1, NULL), (2, 100.0), (3, 50.0), (4, 1.0))
            t(user_id, monetary))
        SELECT user_id, ntile(2) OVER (ORDER BY monetary ASC NULLS FIRST,
                                       user_id ASC) AS m_score
        FROM ent
        """
    ).fetchall()
    assert {u: m for u, m in ora} == {
        u: r.m_score for u, r in out.items()
    }
    # all-NULL ts entity: NULL recency = never seen = WORST r-tile
    rows_r = [
        (1, None, 5.0),
        (2, "2024-01-05 00:00:00", 100.0),
        (3, "2024-01-08 00:00:00", 50.0),
        (4, "2024-01-10 00:00:00", 1.0),
    ]
    dfr = spark.createDataFrame(
        rows_r, "user_id long, ts string, value double"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
    outr = {
        r.user_id: r
        for r in rfm_segments(dfr, "user_id", "ts", "value", n_tiles=2).collect()
    }
    assert outr[1].recency_days is None
    assert outr[1].r_score == 1   # worst tile
    assert outr[4].r_score == 2   # most recent = best


def test_touch_attribution_hand_checked(spark):
    """First purchase of u1 credits view(first)/click(last); its
    second purchase (after a signup) credits view/signup — purchases
    never self-credit; u2's cold purchase goes to 'direct'."""
    from databricks_delta_lake_migration_spark.operators.behavior import (
        touch_attribution,
    )

    rows = [
        (1, 1, "2024-01-01 10:00:00", "view", 0.0),
        (2, 1, "2024-01-01 10:05:00", "click", 0.0),
        (3, 1, "2024-01-01 10:10:00", "purchase", 10.0),
        (4, 1, "2024-01-01 10:20:00", "signup", 0.0),
        (5, 1, "2024-01-01 10:30:00", "purchase", 5.0),
        (6, 2, "2024-01-02 09:00:00", "purchase", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.channel: (r.n_first, r.first_touch_rev, r.n_last, r.last_touch_rev)
        for r in touch_attribution(
            df, "user_id", "ts", "event_type", "value",
            conversion_type="purchase", tiebreak_col="event_id",
        ).collect()
    }
    assert out["view"] == (2, 15.0, 0, 0.0)
    assert out["click"] == (0, 0.0, 1, 10.0)
    assert out["signup"] == (0, 0.0, 1, 5.0)
    assert out["direct"] == (1, 7.0, 1, 7.0)
    assert "purchase" not in out


def test_conversion_lag_and_throttle_hand_checked(spark):
    """conversion_lag: pre-signup purchases don't count, never-converted
    users land in -1; throttle: only sub-gap repeats of the same
    (user, type) flag."""
    from databricks_delta_lake_migration_spark.operators.behavior import (
        conversion_lag,
        throttle_events,
    )

    rows = [
        (1, 1, "2024-01-01 00:00:00", "purchase"),  # BEFORE signup
        (2, 1, "2024-01-02 00:00:00", "signup"),
        (3, 1, "2024-01-04 12:00:00", "purchase"),  # lag 2.5d -> 2
        (4, 2, "2024-01-01 00:00:00", "signup"),    # never converts
        (5, 3, "2024-01-01 00:00:00", "signup"),
        (6, 3, "2024-01-01 00:00:30", "purchase"),  # lag 0
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    lags = {
        r.lag_days: r.n_entities
        for r in conversion_lag(
            df, "user_id", "ts", "event_type", "signup", "purchase"
        ).collect()
    }
    assert lags == {2: 1, -1: 1, 0: 1}

    t = {
        r.event_id: r.is_throttled
        for r in throttle_events(
            df, "user_id", "event_type", "ts",
            min_gap_seconds=60, tiebreak_col="event_id",
        ).collect()
    }
    # user 3's purchase is 30s after its signup — DIFFERENT type, not
    # throttled; no same-type pair is within 60s
    assert t == {i: False for i in range(1, 7)}
    t2 = {
        r.event_id: r.is_throttled
        for r in throttle_events(
            df.withColumn("event_type", F.lit("x")),
            "user_id", "event_type", "ts",
            min_gap_seconds=60, tiebreak_col="event_id",
        ).collect()
    }
    assert t2[6] is True and t2[5] is False  # same type now: 30s gap flags


def test_debounce_vs_throttle_semantics(spark):
    """The defining case: events at t=0s, 40s, 70s with a 60s gap.
    Throttle (lag-based) drops only t=40 (70-40=30 < 60 resets on the
    RAW predecessor... 70-40=30 <60 so t=70 drops too); debounce keeps
    t=70 because the last KEPT event is t=0 and 70-0 >= 60."""
    from databricks_delta_lake_migration_spark.operators.behavior import (
        debounce_events,
        throttle_events,
    )

    rows = [
        (1, 1, "2024-01-01 00:00:00", "x"),
        (2, 1, "2024-01-01 00:00:40", "x"),
        (3, 1, "2024-01-01 00:01:10", "x"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    deb = {
        r.event_id: r.kept
        for r in debounce_events(
            df, ["user_id", "event_type"], "ts", 60, "event_id"
        ).collect()
    }
    assert deb == {1: True, 2: False, 3: True}
    thr = {
        r.event_id: r.is_throttled
        for r in throttle_events(
            df, "user_id", "event_type", "ts", 60, "event_id"
        ).collect()
    }
    assert thr == {1: False, 2: True, 3: True}  # lag clock resets at t=40


def test_debounce_null_entity_keys_share_state(spark):
    """Review r8: NULL entity keys form ONE entity (Arrow hands them to
    pandas as NaN; NaN != NaN must not reset the last-kept state every
    row)."""
    from databricks_delta_lake_migration_spark.operators.behavior import (
        debounce_events,
    )

    rows = [
        (1, None, "2024-01-01 00:00:00", "x"),
        (2, None, "2024-01-01 00:00:10", "x"),  # 10s after kept -> drop
        (3, None, "2024-01-01 00:02:00", "x"),  # 120s -> keep
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r.event_id: r.kept
        for r in debounce_events(
            df, ["user_id", "event_type"], "ts", 60, "event_id"
        ).collect()
    }
    assert got == {1: True, 2: False, 3: True}
