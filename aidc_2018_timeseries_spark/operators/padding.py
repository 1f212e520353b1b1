"""Array pad / truncate operators (SURVEY §2.3 W5, W6).

The two pad rules are intentionally DIFFERENT (SURVEY §7 trap):
- turbofan W5 left-pads by REPEATING THE FIRST ROW to a target length
  (reference ``turbofan.py:133-138``),
- music W6 left-pads with ZEROS / left-TRUNCATES to exactly seq_len+1
  (reference ``music.py:37-45``).

Both are pure higher-order array expressions — no UDF, no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pad_front_repeat_first(arr: Column | str, target_len: int) -> Column:
    """W5: if len(arr) < target_len, prepend copies of arr[0]; else keep.

    Reference: ``np.pad(..., mode='edge')`` on the time axis
    (``turbofan.py:133-138``, triggered when L < seq_len * skip).
    """
    a = _c(arr)
    pad_n = F.greatest(F.lit(target_len) - F.size(a), F.lit(0))
    pad = F.transform(F.sequence(F.lit(1), pad_n), lambda _: F.element_at(a, 1))
    return F.when(F.size(a) >= target_len, a).otherwise(F.concat(pad, a))


def pad_short_series_front_repeat_long(
    df: DataFrame,
    key: str,
    order: str,
    value_cols: Sequence[str],
    target_len: int,
) -> DataFrame:
    """W5 in LONG format: series shorter than ``target_len`` get synthetic
    leading rows that copy the series' first row (reference
    ``turbofan.py:133-138`` pads to T*skip before windowing).

    ``df`` must contain exactly (key, order, value_cols); ``order`` must be
    numeric — pad rows take order values min(order) - 1 .. min(order) - n,
    so they sort strictly before the real rows.

    Scale: one window pass to find per-series length/first-row, pad rows
    are generated from one row per short series (explode of a sequence) —
    no shuffle beyond the series partitioning, and the union is free
    (narrow).
    """
    cols = [key, order, *value_cols]
    w = Window.partitionBy(key)
    first_w = Window.partitionBy(key).orderBy(F.col(order))
    annotated = (
        df.select(*cols)
        .withColumn("_len", F.count(F.lit(1)).over(w))
        .withColumn("_rn", F.row_number().over(first_w))
    )
    firsts = annotated.filter((F.col("_rn") == 1) & (F.col("_len") < target_len))
    pads = firsts.select(
        key,
        F.explode(F.sequence(F.lit(1), F.lit(target_len) - F.col("_len"))).alias("_j"),
        F.col(order).alias("_first_order"),
        *value_cols,
    ).select(
        key,
        (F.col("_first_order") - F.col("_j")).alias(order),
        *value_cols,
    )
    return df.select(*cols).unionByName(pads)


def pad_or_truncate_front_zero(arr: Column | str, target_len: int, zero: Column | None = None) -> Column:
    """W6: force length exactly target_len — longer keeps the LAST rows,
    shorter zero-pads at the FRONT (reference ``music.py:37-45``).

    ``zero`` is the fill element (default 0.0d; pass e.g. an
    ``array_repeat(lit(0.0), 88)`` for piano-roll rows).
    """
    a = _c(arr)
    z = F.lit(0.0) if zero is None else zero
    tail = F.slice(a, -target_len, target_len)  # last target_len elements
    pad_n = F.lit(target_len) - F.size(a)
    pad = F.transform(F.sequence(F.lit(1), pad_n), lambda _: z)
    return F.when(F.size(a) >= target_len, tail).otherwise(F.concat(pad, a))
