"""Loss / metric aggregations (SURVEY §2.4 A5-A9).

The reference computes these inside the ngraph graph (squared_L2,
cross_entropy_binary, means); here they are plain Catalyst aggregates.
Deviation (SURVEY §7): the reference's eval loss is a mean of per-batch
means (short last batch weighted equally, ``timeseries_trainer.py:92-100``);
we compute the GLOBAL mean.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mse(pred: Column | str, y: Column | str) -> Column:
    """A5: mean squared error aggregate expression."""
    p = F.col(pred) if isinstance(pred, str) else pred
    t = F.col(y) if isinstance(y, str) else y
    return F.avg(F.pow(p.cast("double") - t.cast("double"), 2))


def binary_cross_entropy(pred: Column | str, y: Column | str, eps: float = 1e-12) -> Column:
    """A6: mean BCE; pred clamped to (eps, 1-eps) for log safety."""
    p0 = F.col(pred) if isinstance(pred, str) else pred
    t = F.col(y) if isinstance(y, str) else y
    p = F.least(F.greatest(p0.cast("double"), F.lit(eps)), F.lit(1.0 - eps))
    return F.avg(-(t * F.log(p) + (1 - t) * F.log(1 - p)))


def trailing_mean(
    df: DataFrame, order: str | Sequence[str], value_col: str, k: int, out: str = "trailing_mean"
) -> DataFrame:
    """A8: mean of the last k values in sequence order (reference
    ``np.mean(train_losses[-log_interval:])``)."""
    order_names = [order] if isinstance(order, str) else list(order)
    w = Window.orderBy(*[F.col(n) for n in order_names]).rowsBetween(-(k - 1), Window.currentRow)
    return df.withColumn(out, F.avg(F.col(value_col)).over(w))


def ewma_final(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
) -> DataFrame:
    """Per-key final EWMA via an in-order array fold — the oracle-checkable
    face of the streaming EWMA recurrence (streaming/stateful.py uses the
    identical update mean += alpha*(x - mean), initialized to the first
    value; tests pin the two equal).

    One shuffle (groupBy key); the fold runs JVM-side over each key's
    sorted value array, so per-key memory is the series length — the same
    bound every per-series windowing operator here already carries. Both
    engines fold left-to-right over identically-ordered lists, so the
    double arithmetic is bit-identical before the final rounding.
    """
    arr = F.array_sort(
        F.collect_list(F.struct(*[F.col(c) for c in order_cols], F.col(value_col).alias("v")))
    )
    vals = F.transform(arr, lambda s: s["v"])
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc + F.lit(alpha) * (x - acc),
    )
    return df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(folded, 6).alias("ewma"),
    )
