"""RUL-style label generation (SURVEY §2.3 W3, §2.2 P5).

Reference semantics (``datasets/turbofan.py:142-157``): a trajectory fails
at its last row; the label of a window is the number of cycles remaining
after the window's END row, capped at ``max_rul_predictable``. Validation
trajectories are truncated before failure and carry an externally-given
base RUL for their final row (positional file join,
``turbofan.py:100-104``) — every earlier row adds its distance from the
end.

Spark-first: both variants are one window aggregate over the series
partition (no extra shuffle after the series hash-partitioning), the cap is
``least``. The positional label-file join becomes an explicit broadcast
equi-join on the series key (the RUL table is tiny relative to the series
data — at 100 TB of sensor rows it is one row per engine).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order: str | Sequence[str]) -> list[Column]:
    names = [order] if isinstance(order, str) else list(order)
    return [F.col(n) for n in names]


def rul_label(
    df: DataFrame,
    key: str,
    order: str | Sequence[str],
    cap: int | None = 130,
    out: str = "rul",
) -> DataFrame:
    """Training labels: rows remaining after this row, capped.

    rul(row) = count(later rows in series), i.e. max(rn) - rn.
    Cap default 130 matches the entry scripts (``turbofan_with_tcn.py:55``;
    class default is 200, ``turbofan.py:28``).
    """
    w = Window.partitionBy(key)
    rank = Window.partitionBy(key).orderBy(*_order_cols(order))
    rn = F.row_number().over(rank)
    remaining = F.count(F.lit(1)).over(w) - rn
    label = remaining if cap is None else F.least(remaining, F.lit(cap))
    return df.withColumn(out, label.cast("long"))


def rul_label_with_base(
    df: DataFrame,
    rul_df: DataFrame,
    key: str,
    order: str | Sequence[str],
    base_col: str = "base_rul",
    cap: int | None = 130,
    out: str = "rul",
) -> DataFrame:
    """Validation labels: external base RUL (at series end) + distance from
    end, capped. ``rul_df`` must have (key, base_col); joined broadcast.
    """
    w = Window.partitionBy(key)
    rank = Window.partitionBy(key).orderBy(*_order_cols(order))
    rn = F.row_number().over(rank)
    remaining = F.count(F.lit(1)).over(w) - rn
    df = df.join(F.broadcast(rul_df), on=key, how="inner")
    label = F.col(base_col) + remaining
    if cap is not None:
        label = F.least(label, F.lit(cap))
    return df.withColumn(out, label.cast("long"))


def cap_label(col: Column | str, cap: float) -> Column:
    """P5: ``y[y > cap] = cap`` (reference ``turbofan.py:157``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.least(c, F.lit(cap))
