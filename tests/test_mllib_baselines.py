"""MLlib degenerate-baseline test (SURVEY §7.7): Affine + A5 == linear
regression, trained distributedly on window features; it must beat the
predict-the-mean naive RMSE (window stats genuinely predict RUL since
late-life windows sit near the series end)."""

from __future__ import annotations

from aidc_2018_timeseries_spark.ml.baselines import (
    rul_feature_frame,
    train_rul_linear_baseline,
)
from aidc_2018_timeseries_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_linear_rul_baseline_beats_naive(spark):
    ev = load_table(spark, SF_DIR, "events")
    feats = rul_feature_frame(ev, "user_id", ["ts", "event_id"], "value", seq_len=20, cap=60)
    res = train_rul_linear_baseline(feats)
    assert res.test_rmse > 0.0
    # the cycle feature carries real signal (rul = L - t capped); the
    # fit must clearly beat predict-the-mean or the feature/label join is
    # silently broken
    assert res.test_rmse < 0.8 * res.naive_test_rmse, (
        res.test_rmse,
        res.naive_test_rmse,
    )
    assert abs(res.train_rmse - res.test_rmse) < 0.5 * res.naive_test_rmse


def test_logistic_alarm_baseline_beats_chance(spark):
    from aidc_2018_timeseries_spark.ml.baselines import (
        train_rul_alarm_logistic_baseline,
    )

    ev = load_table(spark, SF_DIR, "events")
    feats = rul_feature_frame(ev, "user_id", ["ts", "event_id"], "value", seq_len=20, cap=60)
    model, auc, pos_rate = train_rul_alarm_logistic_baseline(feats, rul_threshold=30.0)
    assert 0.0 < pos_rate < 1.0  # both classes present or the test is vacuous
    # the cycle feature makes RUL<30 highly separable; 0.7 still leaves
    # headroom for split variance while catching a broken label join
    assert auc > 0.7, (auc, pos_rate)
