"""The turbofan RUL dataset pipeline as one composed Spark plan.

Reference chain (``datasets/turbofan.py:28-83``, traced in SURVEY §3.1):
load → per-trajectory max scaling (A1) → strided sliding windows (W2) →
RUL labels capped (W3+P5) → per-window normalization (A2) → shuffle (O2).

Spark-first: the whole chain is ONE logical plan with ONE hash shuffle on
the series key — every step is a window function over the same partition
spec, so Catalyst collapses them into a single sort+window stage. At 100 TB
(≈ millions of engines × long histories) this scales linearly: no series
ever crosses an executor boundary, and nothing materializes windows until
the optional array step at the very end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.normalize import per_key_max_scale
from aidc_2018_timeseries_spark.operators.padding import pad_short_series_front_repeat_long
from aidc_2018_timeseries_spark.operators.windowing import last_window, rolling_window_arrays


def rul_window_features(
    df: DataFrame,
    key: str,
    order: str | Sequence[str],
    value_col: str,
    seq_len: int = 20,
    skip: int = 5,
    cap: int = 130,
) -> DataFrame:
    """Scaled strided-window features + capped RUL label per window.

    Output: (key, event id columns preserved by caller via select, win_mean
    rounded 6dp, rul). The label attaches to the window's END row, exactly
    like the reference's ``y = L - T - arange(...)*skip`` arithmetic
    (``turbofan.py:142-157``) re-expressed as count-remaining.
    """
    order_names = [order] if isinstance(order, str) else list(order)
    order_cols = [F.col(c) for c in order_names]

    df = per_key_max_scale(df, key, [value_col], order=order_names)
    scaled = F.col(value_col + "_scaled")

    w = Window.partitionBy(key).orderBy(*order_cols)
    frame = w.rowsBetween(-(seq_len - 1), Window.currentRow)
    whole = Window.partitionBy(key)

    out = (
        df.withColumn("rn", F.row_number().over(w))
        .withColumn("series_len", F.count(F.lit(1)).over(whole))
        .withColumn("win_mean", F.round(F.avg(scaled).over(frame), 6))
        .filter((F.col("rn") >= seq_len) & (((F.col("rn") - seq_len) % skip) == 0))
        .withColumn(
            "rul", F.least(F.col("series_len") - F.col("rn"), F.lit(cap)).cast("long")
        )
    )
    return out


def turbofan_train_windows(
    df: DataFrame,
    feature_cols: Sequence[str],
    seq_len: int = 50,
    skip: int = 1,
    cap: int = 130,
    key: str = "trajectory_id",
    order: str = "t",
    scale: bool = True,
) -> DataFrame:
    """Full-fidelity reference train pipeline on CMAPSS long format:
    A1 scale → W5 pad short series to T*skip → W2 strided windows →
    W3 capped RUL labels.

    Output: (key, rn, window array<struct<features>>, rul). Window count
    per series = ceil((L_padded - T + 1) / skip); labels follow
    ``y = L - T - k*skip`` capped (reference ``turbofan.py:118-163``).
    """
    if scale:
        df = per_key_max_scale(df, key, list(feature_cols), suffix="")
    df = df.select(key, order, *feature_cols)
    df = pad_short_series_front_repeat_long(df, key, order, feature_cols, seq_len * skip)
    windows = rolling_window_arrays(df, key, order, feature_cols, seq_len)
    # label of each window's END row is a function of (series_len, rn);
    # max(rn) over the series == series length, so no re-join is needed
    from pyspark.sql import Window as W

    windows = windows.withColumn("_sl", F.max("rn").over(W.partitionBy(key)))
    return (
        windows.filter(((F.col("rn") - seq_len) % skip) == 0)
        .withColumn("rul", F.least(F.col("_sl") - F.col("rn"), F.lit(cap)).cast("long"))
        .drop("_sl")
    )


def turbofan_val_windows(
    df: DataFrame,
    rul_df: DataFrame,
    feature_cols: Sequence[str],
    seq_len: int = 50,
    cap: int = 130,
    key: str = "trajectory_id",
    order: str = "t",
    ordinal_col: str = "trajectory_ordinal",
    scale: bool = True,
) -> DataFrame:
    """Validation mode (``augment_test_data=False``): the LAST seq_len rows
    of each trajectory form ONE window; its label is the file-provided base
    RUL (positional join made explicit via the trajectory ordinal), capped.

    Short trajectories are front-padded by repeating the first row
    (reference pads to T*skip with skip=1 here).
    """
    if scale:
        df = per_key_max_scale(df, key, list(feature_cols), suffix="")
    df = df.select(key, order, *feature_cols)
    df = pad_short_series_front_repeat_long(df, key, order, feature_cols, seq_len)
    tail = last_window(df, key, order, seq_len)
    windows = (
        tail.groupBy(key)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct(order, *feature_cols))),
                lambda s: F.struct(*[s[c].alias(c) for c in feature_cols]),
            ).alias("window")
        )
    )
    # trajectory ordinal = rank of the key in file order (keys ascend)
    from pyspark.sql import Window as W

    ordinals = df.select(key).distinct().withColumn(
        ordinal_col, F.row_number().over(W.orderBy(F.col(key)))
    )
    windows = windows.join(F.broadcast(ordinals), key)
    labeled = windows.join(F.broadcast(rul_df), ordinal_col)
    return labeled.withColumn(
        "rul", F.least(F.col("base_rul"), F.lit(cap)).cast("long")
    ).select(key, "window", "rul")
