"""Resample / gap-fill: irregular event streams onto a fixed time grid.

The reference's pipelines assume regularly-sampled series (its windowing
ops index by position — e.g. ``utils/dataloaders.py`` strided windows);
real telemetry arrives irregularly. This operator is the bridge: bucket
each series to a fixed grid (last observation per bucket wins),
densify the grid between each series' first and last observation, and
forward-fill the gaps — after which every position-indexed windowing
operator (W1/W2/W7...) applies.

Scale shape: one shuffle keyed by (series, bucket) for the
last-observation pick, one per-series aggregate for the grid bounds,
``sequence``+``explode`` to densify (rows generated executor-side,
proportional to output), a join back keyed by (series, bucket), and one
per-series ordered window for the fill. No global windows, no driver
materialization; per-series grid length is bounded by the series' own
time span over the bucket width.

All time arithmetic runs in the µs domain with integer ``div`` (ns
epochs exceed double's 2^53 mantissa; DuckDB's parquet reader floors ns
to µs — see spark-duckdb-parity-gotchas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_linear_interp(
    df: DataFrame,
    key_col: str,
    ts_ns_col: str,
    value_col: str,
    bucket_us: int,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key fixed-grid resample with LINEAR interpolation between the
    surrounding observed buckets (the hypertable ``time_bucket_gapfill``
    + ``interpolate()`` pattern; forward-fill's sibling for continuous
    signals).

    Same grid construction as :func:`resample_ffill`; a gap bucket gets
    ``prev + (next - prev) * (b - b_prev) / (b_next - b_prev)`` where
    prev/next are the nearest observed buckets either side. By
    construction the grid is bounded by each key's first/last OBSERVED
    bucket, so both neighbours always exist. All terms are exact
    integers or single IEEE double ops in a fixed order — bit-identical
    cross-engine, emitted unrounded.

    Scale shape: identical to resample_ffill plus one extra ordered
    window pass per direction (still the same per-key partitioning; no
    new shuffle — Catalyst reuses the (key, bucket) sort for all four
    window extractions).
    """
    t_us = F.expr(f"{ts_ns_col} div 1000")
    based = df.select(
        F.col(key_col).alias("key"),
        (t_us - (t_us % F.lit(bucket_us))).alias("bucket_start_us"),
        t_us.alias("t_us"),
        F.col(tiebreak_col).alias("tb"),
        F.col(value_col).alias("v"),
    )
    pick = Window.partitionBy("key", "bucket_start_us").orderBy(
        F.desc("t_us"), F.desc("tb")
    )
    last_per_bucket = (
        based.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select("key", "bucket_start_us", "v")
    )
    bounds = based.groupBy("key").agg(
        F.min("bucket_start_us").alias("b0"), F.max("bucket_start_us").alias("b1")
    )
    grid = bounds.select(
        "key",
        F.explode(
            F.sequence(F.col("b0"), F.col("b1"), F.lit(bucket_us))
        ).alias("bucket_start_us"),
    )
    joined = grid.join(last_per_bucket, ["key", "bucket_start_us"], "left")
    back = Window.partitionBy("key").orderBy("bucket_start_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    fwd = Window.partitionBy("key").orderBy("bucket_start_us").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    obs_b = F.when(F.col("v").isNotNull(), F.col("bucket_start_us"))
    prev_v = F.last("v", ignorenulls=True).over(back)
    prev_b = F.last(obs_b, ignorenulls=True).over(back)
    next_v = F.first("v", ignorenulls=True).over(fwd)
    next_b = F.first(obs_b, ignorenulls=True).over(fwd)
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        prev_v
        + (next_v - prev_v)
        * (
            (F.col("bucket_start_us") - prev_b).cast("double")
            / (next_b - prev_b).cast("double")
        )
    )
    return joined.select(
        F.col("key").alias(key_col),
        "bucket_start_us",
        interp.alias("value"),
        F.when(F.col("v").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("is_observed"),
    )


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_ns_col: str,
    value_col: str,
    bucket_us: int,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key fixed-grid resample with forward fill.

    ``ts_ns_col`` is an int64 nanosecond epoch; ``bucket_us`` the grid
    step in microseconds. Within a bucket the LAST observation wins,
    ordered by (µs timestamp, tiebreak_col) so same-µs rows resolve
    deterministically. Returns
    (key, bucket_start_us, value, is_observed) for every grid step
    between each key's first and last observation.
    """
    t_us = F.expr(f"{ts_ns_col} div 1000")
    based = df.select(
        F.col(key_col).alias("key"),
        (t_us - (t_us % F.lit(bucket_us))).alias("bucket_start_us"),
        t_us.alias("t_us"),
        F.col(tiebreak_col).alias("tb"),
        F.col(value_col).alias("v"),
    )
    pick = Window.partitionBy("key", "bucket_start_us").orderBy(
        F.desc("t_us"), F.desc("tb")
    )
    last_per_bucket = (
        based.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select("key", "bucket_start_us", "v")
    )
    bounds = based.groupBy("key").agg(
        F.min("bucket_start_us").alias("b0"), F.max("bucket_start_us").alias("b1")
    )
    grid = bounds.select(
        "key",
        F.explode(
            F.sequence(F.col("b0"), F.col("b1"), F.lit(bucket_us))
        ).alias("bucket_start_us"),
    )
    ffill = Window.partitionBy("key").orderBy("bucket_start_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = grid.join(last_per_bucket, ["key", "bucket_start_us"], "left")
    return joined.select(
        F.col("key").alias(key_col),
        "bucket_start_us",
        F.last("v", ignorenulls=True).over(ffill).alias("value"),
        F.when(F.col("v").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("is_observed"),
    )


def downsample_maxdev(
    df: DataFrame,
    key: str,
    ts_us_col: str,
    val_col: str,
    id_col: str,
    n_buckets: int = 12,
) -> DataFrame:
    """Shape-preserving per-series downsampling (the LTTB family, à la
    Steinarsson 2013): split each ordered series into ``n_buckets``
    equal-count buckets, keep the single most INFORMATIVE point per bucket
    — the one deviating most from its bucket mean — plus both endpoints,
    so peaks/troughs survive while flat stretches collapse. This is the
    storage/visualization rollup of every telemetry hypertable (downsample
    raw points before long-retention storage).

    Determinism across engines: bucket assignment is ``ntile`` over the
    exact ``(t_us, id)`` order; the per-bucket pick orders by the deviation
    ROUNDED to 6 dp (so summation-order ulp noise in the bucket mean cannot
    flip the argmax) with ``(t_us, id)`` as the tie-break.

    Scale: one shuffle keyed by the series, then per-series window work —
    identical shape to W1/W2 windowing (a series fits a task; the 100 TB
    path partitions by series id, never globally). Output is ~``n_buckets
    + 2`` rows per series regardless of input length.
    """
    w_order = Window.partitionBy(key).orderBy(ts_us_col, id_col)
    wb = Window.partitionBy(key, "bucket")
    pts = (
        df.withColumn("bucket", F.ntile(n_buckets).over(w_order).cast("long"))
        .withColumn("pos", F.row_number().over(w_order))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(key)))
        .withColumn(
            "dev", F.round(F.abs(F.col(val_col) - F.avg(val_col).over(wb)), 6)
        )
    )
    w_pick = Window.partitionBy(key, "bucket").orderBy(
        F.col("dev").desc(), F.col(ts_us_col), F.col(id_col)
    )
    pts = pts.withColumn("rn", F.row_number().over(w_pick))
    endpoint = (F.col("pos") == 1) | (F.col("pos") == F.col("n"))
    return pts.filter((F.col("rn") == 1) | endpoint).select(
        key,
        ts_us_col,
        id_col,
        val_col,
        "bucket",
        endpoint.cast("int").alias("is_endpoint"),
    )
