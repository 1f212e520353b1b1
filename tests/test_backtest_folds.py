"""Golden semantics for backtest_folds (expanding-window time-series CV)."""

from __future__ import annotations

import pytest

from aidc_2018_timeseries_spark.operators.split import backtest_folds


def test_persistence_scoring_matches_hand_computation(spark):
    # one series, 6 points, 3 folds of 2: values chosen for easy arithmetic
    vals = [1.0, 3.0, 5.0, 7.0, 2.0, 4.0]
    rows = [(1, t, t, v) for t, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(rows, "k long, t_us long, id long, value double")
    got = {
        r.fold: (r.n_points, r.fold_mean, r.train_last, r.mse_persistence)
        for r in backtest_folds(df, "k", "t_us", "id", "value", n_folds=3).collect()
    }
    # fold 1: no train -> NULL prediction and MSE
    assert got[1] == (2, 2.0, None, None)
    # fold 2 (5,7) scored against fold 1's last value 3:
    # mse = ((5-3)^2 + (7-3)^2)/2 = 10
    assert got[2] == (2, 6.0, 3.0, 10.0)
    # fold 3 (2,4) against fold 2's last value 7: ((2-7)^2+(4-7)^2)/2 = 17
    assert got[3] == (2, 3.0, 7.0, 17.0)


def test_fold_assignment_is_time_ordered_per_series(spark):
    # two series with interleaved timestamps; folds are per-series, by time
    rows = [(k, t, 10 * k + t, float(t)) for k in (1, 2) for t in range(1, 11)]
    df = spark.createDataFrame(rows, "k long, t_us long, id long, value double")
    out = backtest_folds(df, "k", "t_us", "id", "value", n_folds=5).collect()
    assert len(out) == 10  # 2 series x 5 folds
    for r in out:
        assert r.n_points == 2
        # values ARE timestamps, so fold means recover the time order
        assert r.fold_mean == pytest.approx(2 * r.fold - 0.5)
