"""MLlib degenerate baselines (SURVEY §7.7).

The reference's readout layer is Affine(+activation) over the last
timepoint (``turbofan_with_tcn.py:80``, ``recurrent_model.py:16-19``);
with the TCN stack removed, Affine + squared-L2 loss (A5) IS linear
regression and Logistic output + binary cross-entropy (A6) IS logistic
regression. MLlib trains both distributedly, which makes them the honest
"no deep model" baselines every RUL experiment should report — and the
only training path in this engine (SURVEY §7.7: no distributed backprop).

Features come from the same lazy pipeline as the TCN stage: trailing
window aggregates per (series, t), assembled JVM-side. Training is one
MLlib job; inference is a pure plan transform (model.transform).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression, LinearRegressionModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.labels import rul_label
from aidc_2018_timeseries_spark.operators.windowing import rolling_window_agg


@dataclass
class RulBaselineResult:
    model: LinearRegressionModel
    train_rmse: float
    test_rmse: float
    naive_test_rmse: float  # predict the global mean — the sanity floor


def rul_feature_frame(
    df: DataFrame,
    key: str,
    order: list[str],
    value_col: str,
    seq_len: int = 20,
    cap: int = 130,
) -> DataFrame:
    """Feature frame for the linear RUL baseline: trailing window mean /
    std / min / max / last of the signal, plus the capped RUL label.
    One shuffle on the series key, same as the TCN feature path."""
    feats = rolling_window_agg(
        df,
        key,
        order,
        {
            "f_mean": F.avg(F.col(value_col)),
            "f_std": F.stddev_samp(F.col(value_col)),
            "f_min": F.min(F.col(value_col)),
            "f_max": F.max(F.col(value_col)),
        },
        seq_len=seq_len,
    )
    feats = feats.withColumn("f_last", F.col(value_col))
    # cycle position — the dominant RUL predictor on CMAPSS-like data
    # (rul = L - t; the model learns the fleet-average L)
    feats = feats.withColumn("f_cycle", F.col("rn").cast("double"))
    labeled = rul_label(feats, key, order, cap=cap)
    return labeled.select(
        key, "rn", "f_mean", "f_std", "f_min", "f_max", "f_last", "f_cycle",
        F.col("rul").cast("double").alias("label"),
    ).na.fill(0.0, ["f_std"])


FEATURE_COLS = ["f_mean", "f_std", "f_min", "f_max", "f_last", "f_cycle"]


def _deterministic_split(features: DataFrame, train_ratio: float):
    """Shared hash split on the non-feature key columns: both baselines
    MUST use the identical membership rule (the docstrings promise it).
    pmod, not abs(hash) % 100 — abs(Integer.MIN_VALUE) overflows (throws
    under ANSI mode, stays negative otherwise); round, not int-truncate —
    0.29*100 is 28.999999999999996 in binary."""
    assembled = VectorAssembler(inputCols=FEATURE_COLS, outputCol="features").transform(
        features
    )
    frac = int(round(train_ratio * 100))
    # exclude derived label columns too: the split key must be identical
    # across both baselines for the same input rows
    key_cols = [c for c in features.columns if c not in (*FEATURE_COLS, "label", "alarm")]
    is_train = (
        F.pmod(F.hash(F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])), 100)
    ) < frac
    return assembled.filter(is_train), assembled.filter(~is_train)


def train_rul_linear_baseline(
    features: DataFrame, train_ratio: float = 0.8, seed: int = 42
) -> RulBaselineResult:
    """Train Affine+A5 (= LinearRegression) on the window features.

    Split is a deterministic hash split on (key, rn) so reruns and engines
    agree on membership. Returns train/test RMSE plus the predict-the-mean
    naive RMSE the model must beat for the pipeline to be non-broken.
    """
    train, test = _deterministic_split(features, train_ratio)
    train = train.cache()
    test = test.cache()

    lr = LinearRegression(featuresCol="features", labelCol="label", regParam=0.01)
    model = lr.fit(train)
    ev = RegressionEvaluator(labelCol="label", predictionCol="prediction", metricName="rmse")
    train_rmse = ev.evaluate(model.transform(train))
    test_rmse = ev.evaluate(model.transform(test))

    mean_label = train.agg(F.avg("label")).first()[0]
    naive = test.withColumn("prediction", F.lit(mean_label))
    naive_rmse = ev.evaluate(naive)
    train.unpersist()
    test.unpersist()
    return RulBaselineResult(model, train_rmse, test_rmse, naive_rmse)


def train_rul_alarm_logistic_baseline(
    features: DataFrame, rul_threshold: float = 30.0, train_ratio: float = 0.8
):
    """Logistic output + binary cross-entropy (A6) == logistic regression:
    the 'failure imminent' alarm (RUL < threshold) every PHM deployment
    runs next to the regressor. Same features, same deterministic split;
    returns (model, test_auc, positive_rate)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    labeled = features.withColumn(
        "alarm", (F.col("label") < rul_threshold).cast("double")
    )
    train, test = _deterministic_split(labeled, train_ratio)
    test = test.cache()
    lr = LogisticRegression(featuresCol="features", labelCol="alarm", regParam=0.01)
    model = lr.fit(train)
    ev = BinaryClassificationEvaluator(
        labelCol="alarm", rawPredictionCol="rawPrediction", metricName="areaUnderROC"
    )
    auc = ev.evaluate(model.transform(test))
    pos_rate = test.agg(F.avg("alarm")).first()[0]
    test.unpersist()
    return model, auc, pos_rate
