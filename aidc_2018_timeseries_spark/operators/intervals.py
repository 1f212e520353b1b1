"""Interval algebra via sweep-line: concurrency from point events.

The classic "how many things were active at once" question (concurrent
sessions, overlapping maintenance windows, active RUL test cells) answered
WITHOUT an interval self-join: each interval contributes a +1 boundary at
its start and a -1 at its end; a running sum over the time-ordered
boundary stream IS the concurrency curve. O(n log n) sort instead of the
O(n²) overlap join, and the only shuffle is the per-key sort partition —
the same shape as every W-family series window.

Cross-engine determinism: boundaries order by (t, delta, id) with ends
(-1) before starts (+1) at equal timestamps — half-open [start, end)
semantics — and the running sum is exact ±1 integer arithmetic.

Scale note: per-key sweep is embarrassingly parallel over keys. A GLOBAL
(un-keyed) sweep at 100 TB is two passes: per-partition partial sums +
a driver-size prefix fixup over partition boundaries — same technique,
documented here because the face keys by event_type and never needs it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def concurrency_sweep(
    df: DataFrame,
    key: str,
    start_us_col: str,
    end_us_col: str,
    id_col: str,
) -> DataFrame:
    """Per key: (max_concurrent, first_peak_t_us) — the peak of the
    concurrency curve and the earliest boundary time at which it is
    reached."""
    starts = df.select(
        F.col(key),
        F.col(start_us_col).alias("t_us"),
        F.lit(1).alias("delta"),
        F.col(id_col).alias("_id"),
    )
    ends = df.select(
        F.col(key),
        F.col(end_us_col).alias("t_us"),
        F.lit(-1).alias("delta"),
        F.col(id_col).alias("_id"),
    )
    bounds = starts.unionByName(ends)
    w = (
        Window.partitionBy(key)
        .orderBy("t_us", "delta", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = bounds.withColumn("conc", F.sum("delta").over(w))
    peak = curve.groupBy(key).agg(F.max("conc").alias("max_concurrent"))
    return (
        curve.join(peak, key)
        .filter(F.col("conc") == F.col("max_concurrent"))
        .groupBy(key, "max_concurrent")
        .agg(F.min("t_us").alias("first_peak_t_us"))
    )
