"""Golden semantics for winsorize_by_group (per-group percentile clip)."""

from __future__ import annotations

from aidc_2018_timeseries_spark.operators.normalize import winsorize_by_group


def test_clips_tails_only_within_each_group(spark):
    # group A: 1..9 plus a wild outlier 1000; group B: all equal
    rows = [("A", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    rows += [("B", 100 + i, 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, "g string, id long, value double")
    out = {
        (r.g, r.id): (r.value_winsorized, r.is_clipped)
        for r in winsorize_by_group(df, "g", "value", 0.1, 0.9).collect()
    }
    # A's p10/p90 over [1..9,1000] (linear interp, n=10): 1.9 and 108.1
    assert out[("A", 0)] == (1.9, 1)          # 1 -> clipped up
    assert out[("A", 9)] == (108.1, 1)        # 1000 -> clipped down
    assert out[("A", 4)] == (5.0, 0)          # middle untouched
    # B is constant: bounds collapse to 5, nothing clips
    assert all(out[("B", 100 + i)] == (5.0, 0) for i in range(4))


def test_outlier_barely_moves_bounds(spark):
    # the order-statistic property: the 1000 outlier doesn't drag p90 far
    rows = [("A", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])]
    df1 = spark.createDataFrame(rows, "g string, id long, value double")
    rows[9] = ("A", 9, 1000.0)
    df2 = spark.createDataFrame(rows, "g string, id long, value double")
    hi1 = winsorize_by_group(df1, "g", "value", 0.1, 0.9).select("p_hi").first()[0]
    hi2 = winsorize_by_group(df2, "g", "value", 0.1, 0.9).select("p_hi").first()[0]
    assert hi1 == 9.1
    # p90 with outlier: 9 + 0.1*(1000-9) = 108.1 — bounded by the next
    # order statistic's interpolation, not dragged to ~900 like a mean+3σ
    assert hi2 == 108.1
