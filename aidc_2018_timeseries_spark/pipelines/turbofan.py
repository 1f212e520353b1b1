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

    df = per_key_max_scale(df, key, [value_col])
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
