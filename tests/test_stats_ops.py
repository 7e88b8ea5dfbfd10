"""Unit tests for operators.stats with hand-computed references."""

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
