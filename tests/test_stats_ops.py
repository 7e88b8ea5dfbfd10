"""Unit tests for operators.stats with hand-computed references."""

import pytest

from databricks_delta_lake_migration_spark.operators.stats import (
    equidepth_histogram,
    group_trend,
    rolling_zscore,
)


def test_rolling_zscore_hand_checked(spark):
    """[10,10,10,100] window 3: zero-variance frames yield NULL z; the
    spike scores (100-40)/sqrt(2700) = 1.1547."""
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 100)], "t int, v long"
    )
    rows = {r.t: r for r in rolling_zscore(df, "t", "v", 3).collect()}
    assert rows[1].z is None and rows[2].z is None and rows[3].z is None
    assert rows[4].mean_w == 40.0
    assert rows[4].z == 1.1547
    assert rows[4].is_anomaly is False
    assert rows[2].sd_w is None  # zero variance, not 0.0


def test_group_trend_exact_fit_and_noisy_fit(spark):
    """Perfect line slope 2 r2 1; noisy line hits the closed form."""
    rows = (
        [("a", 1, 2), ("a", 2, 4), ("a", 3, 6)]
        + [("b", 0, 1), ("b", 1, 1), ("b", 2, 3)]
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r for r in group_trend(df, ["g"], "x", "y").collect()}
    assert (out["a"].slope, out["a"].intercept, out["a"].r2) == (2.0, 0.0, 1.0)
    assert out["b"].slope == 1.0
    assert out["b"].intercept == 0.666667
    assert out["b"].r2 == 0.75


def test_group_trend_degenerate_groups_explicit_null(spark):
    """n=1, constant-x, and constant-y groups yield NULL (not
    Inf/NaN-in-one-engine): the den/den_y guards fire."""
    rows = (
        [("single", 5, 7)]                             # n=1 → den=0
        + [("flat_x", 3, 1), ("flat_x", 3, 9)]          # den=0
        + [("flat_y", 1, 4), ("flat_y", 2, 4)]          # den_y=0 → r2 NULL
    )
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r for r in group_trend(df, ["g"], "x", "y").collect()}
    for g in ("single", "flat_x"):
        assert out[g].slope is None
        assert out[g].intercept is None
        assert out[g].r2 is None
    assert out["flat_y"].slope == 0.0
    assert out["flat_y"].intercept == 4.0
    assert out["flat_y"].r2 is None


def test_equidepth_histogram_remainder_buckets(spark):
    """10 rows into 3 buckets: sizes 4/3/3, ranges [1,4][5,7][8,10]."""
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 11)], "k long, v double"
    )
    out = {
        r.bucket: (r.n_rows, r.lo, r.hi)
        for r in equidepth_histogram(
            df, "v", n_buckets=3, tiebreak_col="k"
        ).collect()
    }
    assert out[1] == (4, 1.0, 4.0)
    assert out[2] == (3, 5.0, 7.0)
    assert out[3] == (3, 8.0, 10.0)


def test_merge_intervals_islands_and_long_swallow(spark):
    """Overlap chains collapse; an early LONG interval swallows later
    short ones (running-max, not lag); integer bounds path."""
    from databricks_delta_lake_migration_spark.operators.behavior import (
        merge_intervals,
    )

    rows = [
        ("a", 1, 100), ("a", 2, 3), ("a", 50, 60), ("a", 101, 102),
        ("b", 1, 5), ("b", 3, 8), ("b", 10, 12),
    ]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = {
        (r.k, r.island): (r.island_start, r.island_end, r.n_intervals)
        for r in merge_intervals(df, ["k"], "s", "e").collect()
    }
    assert out[("a", 1)] == (1, 100, 3)
    assert out[("a", 2)] == (101, 102, 1)
    assert out[("b", 1)] == (1, 8, 2)
    assert out[("b", 2)] == (10, 12, 1)


def test_time_weighted_average_hand_checked(spark):
    """(0s,10),(10s,20),(30s,5): durations 10s/20s, last obs dropped;
    twap = (10*10 + 20*20)/30 = 16.666667."""
    import datetime

    from databricks_delta_lake_migration_spark.operators.stats import (
        time_weighted_average,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, base, 10.0),
        (2, 1, base + datetime.timedelta(seconds=10), 20.0),
        (3, 1, base + datetime.timedelta(seconds=30), 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = time_weighted_average(
        df, ["user_id"], "ts", "value", tiebreak_col="event_id"
    ).collect()
    assert len(out) == 1
    assert out[0].n_obs == 2
    assert out[0].total_sec == 30.0
    assert out[0].twap == 16.666667


def test_column_profile_nulls_distinct_entropy(spark):
    """Mixed-null column profiles: entropy of {2/3, 1/3} = 0.918296;
    a constant column has entropy 0."""
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (None, "x")], "a int, b string"
    )
    from databricks_delta_lake_migration_spark.operators.stats import (
        column_profile,
    )

    out = {r.column: r for r in column_profile(df, ["a", "b"]).collect()}
    assert (out["a"].n_rows, out["a"].n_nulls, out["a"].n_distinct) == (4, 1, 2)
    assert out["a"].null_frac == 0.25
    assert out["a"].entropy == 0.918296
    assert (out["b"].n_nulls, out["b"].n_distinct, out["b"].entropy) == (0, 1, 0.0)


def test_benford_audit_digit_extraction_and_uniform_reject(spark):
    """Sub-1 amounts extract their first significant digit; a corpus of
    all-leading-1 amounts concentrates obs_frac at digit 1 with a large
    chi-square."""
    from databricks_delta_lake_migration_spark.operators.stats import (
        benford_audit,
    )

    df = spark.createDataFrame(
        [(0.05,), (0.004,), (0.19,), (10.0,), (12.5,), (199.0,), (1.0,)]
        + [(1.5,)] * 4,
        "v double",
    )
    out = {r.digit: r for r in benford_audit(df, "v").collect()}
    assert set(out) == set(range(1, 10))  # zero-count cells included
    assert out[5].n_obs == 1  # 0.05 -> leading digit 5
    assert out[4].n_obs == 1  # sub-cent 0.004 counted, not dropped
    assert out[1].n_obs == 9
    assert out[2].n_obs == 0
    assert out[1].obs_frac == round(9 / 11, 6)
    # a zero cell still contributes n*p(d) to the statistic
    assert out[2].chi2_term == round(11 * 0.17609125905568124, 4)
    assert out[1].chi2_total == out[5].chi2_total  # total repeated per row
    assert out[1].chi2_total > 15.507  # rejects Benford at 5%


def test_skew_profile_flags_hot_key(spark):
    """A planted 50% hot key reports share 0.5 and skew_factor n/2."""
    from databricks_delta_lake_migration_spark.operators.stats import (
        skew_profile,
    )

    rows = [("hot",)] * 50 + [(f"k{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, "k string")
    out = skew_profile(df, ["k"], top_n=3).collect()
    assert out[0].k == "hot"
    assert out[0].share == 0.5
    assert out[0].n_keys == 51
    assert out[0].skew_factor == round(50 * 51 / 100, 4)
    assert out[0].cum_share == 0.5
    assert out[2].cum_share == 0.52


def test_rolling_distinct_hand_checked(spark):
    """3-day window over 4 days: daily counts vs trailing unions; a
    calendar gap narrows the effective window (RANGE, not ROWS)."""
    from databricks_delta_lake_migration_spark.operators.stats import (
        rolling_distinct,
    )

    rows = [
        ("2024-01-01 01:00:00", 1), ("2024-01-01 02:00:00", 2),
        ("2024-01-02 01:00:00", 2), ("2024-01-02 02:00:00", 3),
        ("2024-01-03 01:00:00", 1),
        ("2024-01-06 01:00:00", 9),  # 3-day gap
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "user_id"
    )
    out = {
        str(r.day): (r.n_daily, r.n_rolling)
        for r in rolling_distinct(df, "ts", "user_id", window_days=3).collect()
    }
    assert out == {
        "2024-01-01": (2, 2),
        "2024-01-02": (2, 3),   # {1,2,3}
        "2024-01-03": (1, 3),   # {1,2,3}
        "2024-01-06": (1, 1),   # gap: only itself in range
    }


def test_rolling_distinct_approx_hll_tolerance(spark):
    """approx=True (the >=1e8-daily-entities path): per-day HLL
    sketches + window hll_union_agg replace collect_set. n_daily stays
    EXACT; n_rolling lands within HLL's error envelope (~0.8% at
    lg_k=14; assert 5%); no collect_set in the plan."""
    from databricks_delta_lake_migration_spark.operators.stats import (
        rolling_distinct,
    )

    # 10 days x 3000 entities with 40% day-over-day overlap
    rows = [
        (f"2024-02-{d:02d} 01:00:00", d * 1800 + e)
        for d in range(1, 11)
        for e in range(3000)
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "user_id"
    )
    exact = {
        str(r.day): (r.n_daily, r.n_rolling)
        for r in rolling_distinct(df, "ts", "user_id", window_days=7).collect()
    }
    appr = rolling_distinct(df, "ts", "user_id", window_days=7, approx=True)
    assert "collect_set" not in appr._jdf.queryExecution().executedPlan().toString()
    got = {str(r.day): (r.n_daily, r.n_rolling) for r in appr.collect()}
    assert set(got) == set(exact)
    for day, (nd, nr) in got.items():
        assert nd == exact[day][0]                     # daily stays exact
        assert abs(nr - exact[day][1]) <= 0.05 * exact[day][1]


def test_rolling_distinct_approx_never_below_daily(spark):
    """ADVICE r9: n_daily is exact but n_rolling is HLL-estimated, so
    an underestimate could report n_rolling < n_daily — inverting the
    daily-subset-of-rolling invariant. The clamp
    (greatest(n_daily, estimate)) must hold it for every day even at
    the sketch's coarsest setting (lg_k=4, ~26% error)."""
    from databricks_delta_lake_migration_spark.operators.stats import (
        rolling_distinct,
    )

    rows = [
        (f"2024-04-{d:02d} 01:00:00", d * 977 + e)
        for d in range(1, 11)
        for e in range(4000)
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "user_id"
    )
    out = rolling_distinct(
        df, "ts", "user_id", window_days=1, approx=True, hll_lg_k=4
    ).collect()
    assert len(out) == 10
    for r in out:
        assert r.n_daily == 4000
        assert r.n_rolling >= r.n_daily


def test_rolling_distinct_approx_null_entities_match_exact(spark):
    """Review r9: NULL entities are excluded from n_daily in BOTH
    modes (count('e'), matching collect_set/sketch semantics) — a day
    whose only entity is NULL reports 0/0 in both."""
    from databricks_delta_lake_migration_spark.operators.stats import (
        rolling_distinct,
    )

    rows = [
        ("2024-03-01 01:00:00", None),
        ("2024-03-01 02:00:00", "a"),
        ("2024-03-02 01:00:00", None),   # NULL-only day
        ("2024-03-03 01:00:00", "b"),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id string").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "user_id"
    )
    exact = {
        str(r.day): (r.n_daily, r.n_rolling)
        for r in rolling_distinct(df, "ts", "user_id", window_days=2).collect()
    }
    appr = {
        str(r.day): (r.n_daily, r.n_rolling)
        for r in rolling_distinct(
            df, "ts", "user_id", window_days=2, approx=True
        ).collect()
    }
    assert exact == appr == {
        "2024-03-01": (1, 1),
        "2024-03-02": (0, 1),   # trailing window still sees 'a'
        "2024-03-03": (1, 1),
    }


def test_pareto_classification_hand_checked(spark):
    """Values 50/30/15/5: A covers {50,30} (prev-cum 0, .5), B {15}
    (prev-cum .8 < .95), C {5}; shares exact."""
    from databricks_delta_lake_migration_spark.operators.stats import (
        pareto_classification,
    )

    rows = [("a", 50.0), ("b", 30.0), ("c", 15.0), ("d", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r.k: r for r in pareto_classification(df, ["k"], "v").collect()}
    assert out["a"].abc_class == "A" and out["a"].cum_share == 0.5
    assert out["b"].abc_class == "A" and out["b"].cum_share == 0.8
    assert out["c"].abc_class == "B" and out["c"].cum_share == 0.95
    assert out["d"].abc_class == "C" and out["d"].cum_share == 1.0
    assert out["a"].share == 0.5 and out["d"].value == 5.0


def test_stepped_decay_sum_exact_halving(spark):
    """Events 0/7/14 days before the horizon at half-life 7 weigh
    1, 1/2, 1/4 exactly; within-bucket days don't decay."""
    from pyspark.sql import functions as F

    from databricks_delta_lake_migration_spark.operators.stats import (
        stepped_decay_sum,
    )

    rows = [
        (1, "2024-01-15 12:00:00", 8.0),   # horizon day: weight 1
        (1, "2024-01-08 00:00:00", 8.0),   # 7 days: weight 1/2
        (1, "2024-01-01 00:00:00", 8.0),   # 14 days: weight 1/4
        (2, "2024-01-10 00:00:00", 4.0),   # 5 days: same bucket as 0
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {
        r.user_id: (r.n_events, r.decayed_sum)
        for r in stepped_decay_sum(df, "user_id", "ts", "value", 7).collect()
    }
    assert out[1] == (3, 8.0 + 4.0 + 2.0)
    assert out[2] == (1, 4.0)


@pytest.mark.slow
def test_pareto_classification_matches_brute_force_hypothesis(spark):
    """Property test: classes/shares equal a brute-force Python
    computation (sum per key, sort by value desc then key, prev-cum
    thresholds) for arbitrary non-negative multisets including ties
    and zero values (contribution analysis presumes a positive total;
    an all-zero corpus is out of the operator's domain)."""
    from hypothesis import assume, given, settings, strategies as st

    from databricks_delta_lake_migration_spark.operators.stats import (
        pareto_classification,
    )

    rows_strategy = st.lists(
        st.tuples(st.sampled_from("abcdefg"),
                  st.decimals(min_value=0, max_value=100, places=2)),
        min_size=1, max_size=25,
    )

    @settings(max_examples=8, deadline=None)
    @given(rows_strategy)
    def run(rows):
        from collections import defaultdict

        agg = defaultdict(float)
        for k, v in rows:
            agg[k] += float(v)
        assume(sum(agg.values()) > 0)
        order = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(agg.values())
        ref, cum = {}, 0.0
        for k, v in order:
            prev = cum / total
            cum += v
            ref[k] = ("A" if prev < 0.8 else "B" if prev < 0.95 else "C",
                      round(v / total, 6), round(cum / total, 6))
        df = spark.createDataFrame(
            [(k, float(v)) for k, v in rows], "k string, v double"
        )
        got = {
            r.k: (r.abc_class, r.share, r.cum_share)
            for r in pareto_classification(df, ["k"], "v").collect()
        }
        assert set(got) == set(ref)
        for k in ref:
            assert got[k][0] == ref[k][0], (k, got[k], ref[k], order)
            assert abs(got[k][1] - ref[k][1]) <= 1e-6
            assert abs(got[k][2] - ref[k][2]) <= 1e-6

    run()


@pytest.mark.slow
def test_rolling_distinct_matches_brute_force_hypothesis(spark):
    """Property test: exact rolling_distinct equals a brute-force
    per-day set union over the trailing RANGE window for arbitrary
    (day, entity) multisets with gaps and NULL entities."""
    from hypothesis import given, settings, strategies as st

    from databricks_delta_lake_migration_spark.operators.stats import (
        rolling_distinct,
    )

    rows_strategy = st.lists(
        st.tuples(st.integers(1, 12),
                  st.one_of(st.none(), st.integers(0, 6))),
        min_size=1, max_size=30,
    )

    @settings(max_examples=8, deadline=None)
    @given(rows_strategy)
    def run(rows):
        from collections import defaultdict

        w = 3
        daysets = defaultdict(set)
        present = set()
        for d, e in rows:
            present.add(d)
            if e is not None:
                daysets[d].add(e)
        ref = {}
        for d in present:
            trailing = set()
            for back in range(w):
                trailing |= daysets.get(d - back, set())
            ref[d] = (len(daysets.get(d, set())), len(trailing))
        df = spark.createDataFrame(
            [(f"2024-01-{d:02d} 03:00:00",
              str(e) if e is not None else None) for d, e in rows],
            "ts string, user_id string",
        ).selectExpr("CAST(ts AS TIMESTAMP) AS ts", "user_id")
        got = {
            int(str(r.day)[8:10]): (r.n_daily, r.n_rolling)
            for r in rolling_distinct(df, "ts", "user_id", window_days=w).collect()
        }
        assert got == ref

    run()
