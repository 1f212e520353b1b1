"""Generic forecasting dataset pipeline — the reference's ``TimeSeries``
base class (``datasets/timeseries.py:25-81``) re-expressed as lazy plans.

Two modes, matching the constructor surface ``TimeSeries(train_ratio,
seq_len, predict_seq, look_ahead)``:

- ``predict_seq=False``: W1 rolling windows of length seq_len+1 → X = the
  first seq_len points, y = the final point (next-point target).
- ``predict_seq=True``: W7 tumbling windows with a look_ahead-shifted
  sequence target.

Both apply the P4 zero-window filter and the W13 time-ordered split.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.filters import drop_zero_windows
from aidc_2018_timeseries_spark.operators.split import per_key_time_split
from aidc_2018_timeseries_spark.operators.windowing import (
    rolling_window_arrays,
    tumbling_windows_with_lookahead,
)


def next_point_dataset(
    df: DataFrame,
    key: str,
    order: str | Sequence[str],
    feature_cols: Sequence[str],
    seq_len: int,
    train_ratio: float = 0.8,
) -> DataFrame:
    """Rolling (T+1)-windows → (X: array of T feature-structs, y: the
    (T+1)-th point), zero-filtered, split by time order.

    Output: (key, rn, x, y, split).
    """
    win = rolling_window_arrays(df, key, order, feature_cols, seq_len + 1)
    x = F.slice(F.col("window"), 1, seq_len)
    y = F.element_at(F.col("window"), -1)
    out = win.select(key, "rn", x.alias("x"), y.alias("y"))
    flat = F.flatten(
        F.transform("x", lambda s: F.array(*[s[c].cast("double") for c in feature_cols]))
    )
    out = out.withColumn("_flat", flat)
    out = drop_zero_windows(out.withColumn("_nested", F.array("_flat")), "_nested").drop(
        "_nested", "_flat"
    )
    # per-series time split: key-partitioned windows only, no global sort
    # (the 100 TB-clean W13 form; leaf op time_ordered_split remains the
    # single-stream global variant)
    return per_key_time_split(out, key, "rn", train_ratio)


def sequence_forecast_dataset(
    df: DataFrame,
    key: str,
    order: str | Sequence[str],
    value_col: str,
    seq_len: int,
    look_ahead: int,
    train_ratio: float = 0.8,
) -> DataFrame:
    """W7 tumbling windows with look-ahead target, split by time order.

    Long-format output: (key, window_id, t_in_window, x, y, split); the
    split is assigned per WINDOW (the reference splits over the window
    axis, ``timeseries.py:71-81``).
    """
    win = tumbling_windows_with_lookahead(df, key, order, value_col, seq_len, look_ahead)
    keys = win.select(key, "window_id").distinct()
    keys = per_key_time_split(keys, key, "window_id", train_ratio)
    return win.join(keys, [key, "window_id"])
