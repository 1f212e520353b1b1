"""Train/test splitting and shuffling (SURVEY §2.3 W13, §2.5 O2).

RNG parity with NumPy is impossible (SURVEY §7); the shuffle uses Spark's
``rand(seed)`` and tests compare set-equality, not order.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_ordered_split(
    df: DataFrame,
    order: str | Sequence[str],
    train_ratio: float,
    out: str = "split",
) -> DataFrame:
    """W13: first round(ratio*N) rows (global time order) are 'train', the
    rest 'test' (reference ``timeseries.py:52-63``: split over the window
    axis, time-ordered, no shuffle before the split).

    round() matches NumPy's ``int(round(ratio * N))``. Global row_number is
    a single-partition window — fine for split bookkeeping at any scale if
    applied to window COUNTS; for row-level assignment at 100 TB prefer
    :func:`time_threshold_split` (no global sort).
    """
    order_names = [order] if isinstance(order, str) else list(order)
    w = Window.orderBy(*[F.col(n) for n in order_names])
    n = df.count()
    cutoff = int(round(train_ratio * n))
    return df.withColumn("_rn", F.row_number().over(w)).withColumn(
        out, F.when(F.col("_rn") <= cutoff, F.lit("train")).otherwise(F.lit("test"))
    ).drop("_rn")


def time_threshold_split(
    df: DataFrame, time_col: str, threshold, out: str = "split"
) -> DataFrame:
    """Scale-path W13: split on a time threshold — embarrassingly parallel,
    no global sort. The threshold is typically a precomputed approximate
    quantile of the time column."""
    return df.withColumn(
        out, F.when(F.col(time_col) <= F.lit(threshold), F.lit("train")).otherwise(F.lit("test"))
    )


def seeded_shuffle(df: DataFrame, seed: int = 42) -> DataFrame:
    """O2: random permutation (reference ``turbofan.py:266-271``); X and y
    stay aligned because they are columns of one row."""
    return df.orderBy(F.rand(seed))
