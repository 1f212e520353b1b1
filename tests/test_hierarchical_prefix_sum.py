"""hierarchical_running_sum == one global ordered window, with the
single-partition work confined to the buckets-total relation."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.intervals import (
    concurrency_curve_global,
    hierarchical_running_sum,
)


def _bounds(spark, n=500):
    # deterministic pseudo-random boundary stream spanning many buckets
    rows = [(((i * 2654435761) % 97) * 10 + i % 7, 1 if i % 2 else -1, i) for i in range(n)]
    return spark.createDataFrame(rows, "t long, delta int, bid long")


def test_matches_naive_global_window(spark):
    df = _bounds(spark)
    got = hierarchical_running_sum(
        df.withColumn("bucket", F.col("t") - F.col("t") % 100),
        "bucket",
        ["t", "delta", "bid"],
        "delta",
        out_col="cum",
    )
    w = Window.orderBy("t", "delta", "bid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("delta").over(w))
    a = sorted((r.t, r.delta, r.bid, r.cum) for r in got.collect())
    b = sorted((r.t, r.delta, r.bid, r.cum) for r in want.collect())
    assert a == b


def test_single_bucket_degenerates_to_global(spark):
    df = _bounds(spark, n=50).withColumn("bucket", F.lit(0))
    got = hierarchical_running_sum(df, "bucket", ["t", "delta", "bid"], "delta")
    # last row of the prefix sum is the grand total
    total = df.agg(F.sum("delta")).first()[0]
    last = got.orderBy(F.desc("t"), F.desc("delta"), F.desc("bid")).first()
    assert last.running_sum == total


def test_plan_keeps_big_window_partitioned(spark):
    """The only unpartitioned (single-partition) window must consume the
    per-bucket AGGREGATE, never the raw boundary stream."""
    df = _bounds(spark).withColumn("bucket", F.col("t") - F.col("t") % 100)
    out = hierarchical_running_sum(df, "bucket", ["t", "delta", "bid"], "delta")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "bucket#" not in line.split("partitionBy")[0]:
            # unpartitioned window: its ordering must be over the bucket
            # totals (sum(delta) aggregate), not the row-level stream
            if "windowspecdefinition(t#" in line:
                raise AssertionError(f"raw-stream global window found: {line}")


def test_curve_ends_at_zero_and_never_negative(spark):
    rows = [(i, 100 + (i % 13) * 5, 100 + (i % 13) * 5 + 30) for i in range(200)]
    iv = spark.createDataFrame(rows, "id long, s long, e long")
    curve = concurrency_curve_global(iv, "s", "e", "id", bucket_us=50).collect()
    concs = [r.conc for r in sorted(curve, key=lambda r: (r.t_us, r.delta, r.bid))]
    assert concs[-1] == 0  # every interval that opens eventually closes
    assert min(concs) >= 0
