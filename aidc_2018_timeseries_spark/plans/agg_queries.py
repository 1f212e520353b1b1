"""Catalog queries: distribution aggregates (percentiles, histograms,
sketch-based distinct counts).

The 100 TB rationale: exact global percentiles need a full sort or
distributable interpolation (Spark's ``percentile`` aggregates per group
map-side); histograms reduce a column to fixed-width bucket counts in one
scan; HyperLogLog (``approx_count_distinct``) replaces a count-distinct
shuffle with a mergeable 2^p-register sketch — the only one of the three
that is approximate, so its catalog entry is rows-only and its error
bound is pinned in tests/test_agg_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.plans.catalog import register
from aidc_2018_timeseries_spark.sources.tables import load_table


@register(
    "agg_value_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    doc="exact interpolated percentiles per event type (Spark percentile == "
    "DuckDB quantile_cont, both linear interpolation)",
)
def agg_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5, 0.9, 0.99))")
    return ev.groupBy("event_type").agg(
        F.round(pct[0], 6).alias("p50"),
        F.round(pct[1], 6).alias("p90"),
        F.round(pct[2], 6).alias("p99"),
    )


@register(
    "agg_value_histogram",
    """
    WITH b AS (
      SELECT event_type,
             CAST(CASE WHEN value < 0.0 THEN 0
                       WHEN value >= 100.0 THEN 11
                       ELSE CAST(FLOOR(value / 10.0) AS INT) + 1 END
                  AS BIGINT) AS bucket
      FROM events)
    SELECT event_type, bucket, COUNT(*) AS n
    FROM b GROUP BY event_type, bucket
    """,
    doc="fixed-width histogram via width_bucket (bucket 0/11 = out of "
    "range; DuckDB has no width_bucket — oracle restates the Postgres "
    "semantics arithmetically) — one scan, one shuffle on (type, bucket)",
)
def agg_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.expr("width_bucket(value, 0.0D, 100.0D, 10)"), F.lit(0)),
        F.lit(11),
    ).alias("bucket")
    return ev.select("event_type", bucket).groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_approx_distinct_users",
    None,  # HLL sketch: engine-specific estimates can't hash-match an oracle
    doc="HyperLogLog distinct users per event type (rows-only; relative "
    "error vs exact pinned in tests)",
)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users")
    )
