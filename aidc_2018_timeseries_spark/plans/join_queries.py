"""Catalog queries for time-series joins (as-of, range) over ``events``.

DuckDB has native ``ASOF JOIN``; Spark does not — our union-merge
formulation (operators/joins.py) is the scale path and DuckDB's native
operator is the independent oracle, which makes these the strongest
cross-checks in the catalog (two genuinely different algorithms).

Precision: Spark reads events.ts as exact bigint NANOseconds, but DuckDB's
parquet scan coerces TIMESTAMP(NANOS) to a microsecond TIMESTAMP — so every
time comparison and gap here is computed in the MICROsecond domain on both
sides (Spark: floor(ts/1000); DuckDB: epoch_us). Comparing at mixed
precision would flip matches whenever two events share a microsecond.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.joins import (
    asof_join,
    range_join_points_to_intervals,
)
from aidc_2018_timeseries_spark.plans.catalog import register
from aidc_2018_timeseries_spark.sources.tables import load_table

_TEN_MIN_US = 600 * 10**6


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "asof_join_click_error",
    """
    WITH c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
         e AS (SELECT user_id, MIN(event_id) AS error_event_id, ts FROM events
               WHERE event_type = 'error' GROUP BY user_id, ts)
    SELECT c.user_id, c.event_id, e.error_event_id,
           epoch_us(c.ts) - epoch_us(e.ts) AS gap_us
    FROM c ASOF LEFT JOIN e ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
    doc="as-of join: most recent prior error per click, per user "
    "(union-merge Spark plan vs DuckDB native ASOF JOIN)",
)
def asof_join_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ts_us = F.expr("ts div 1000").alias("ts_us")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", ts_us)
    # dedupe right-side (user, ts) ties to min event_id: asof_join matches
    # ties arbitrarily (documented), so determinism is this caller's job
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select("user_id", "event_id", ts_us)
        .groupBy("user_id", "ts_us")
        .agg(F.min("event_id").alias("error_event_id"))
    )
    out = asof_join(
        clicks,
        errors,
        on="user_id",
        left_ts="ts_us",
        right_cols=["error_event_id"],
        matched_ts_col="error_ts_us",
    )
    return out.select(
        "user_id",
        "event_id",
        "error_event_id",
        (F.col("ts_us") - F.col("error_ts_us")).alias("gap_us"),
    )


@register(
    "asof_join_purchase_signup_tol",
    """
    WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
         s AS (SELECT user_id, value AS signup_value, ts FROM events
               WHERE event_type = 'signup')
    SELECT p.user_id, p.event_id,
           CASE WHEN epoch_us(p.ts) - epoch_us(s.ts) <= 86400000000
                THEN s.signup_value END AS signup_value
    FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="as-of join with 24h tolerance: signup value attached to purchases "
    "(tolerance nulls the match, rows are kept — pandas merge_asof semantics)",
)
def asof_join_purchase_signup_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ts_us = F.expr("ts div 1000").alias("ts_us")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", ts_us
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("value").alias("signup_value"), ts_us
    )
    out = asof_join(
        purchases,
        signups,
        on="user_id",
        left_ts="ts_us",
        right_cols=["signup_value"],
        tolerance=24 * 3600 * 10**6,
    )
    return out.select("user_id", "event_id", "signup_value")


@register(
    "range_join_error_followups",
    """
    WITH e AS (SELECT user_id, event_id AS error_event_id, ts FROM events
               WHERE event_type = 'error'),
         c AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
    SELECT e.error_event_id, COUNT(*) AS n_clicks,
           ROUND(SUM(c.value), 6) AS click_value
    FROM e JOIN c ON c.user_id = e.user_id
       AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 10 MINUTE
    GROUP BY e.error_event_id
    """,
    doc="range join (bucketed equi-join plan): clicks within 10min after "
    "each error, aggregated per error",
)
def range_join_error_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    ts_us = F.expr("ts div 1000")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_event_id"),
        ts_us.alias("t_start"),
        (ts_us + F.lit(_TEN_MIN_US)).alias("t_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", ts_us.alias("ts_us"), "value"
    )
    joined = range_join_points_to_intervals(
        clicks,
        errors,
        point_col="ts_us",
        start_col="t_start",
        end_col="t_end",
        on="user_id",
        bucket_width=_TEN_MIN_US,
        closed="left",
    )
    return joined.groupBy("error_event_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.round(F.sum("value"), 6).alias("click_value"),
    )


@register(
    "join_salted_per_supplier",
    """
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_lines,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                     * 1000000) AS HUGEINT)) AS DOUBLE)
                 / 1000000.0, 4) AS revenue
    FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY s.s_suppkey, s.s_name
    """,
    doc="salted skew-resistant join (operators/joins.py:salted_join): the "
    "big side's keys scatter across 16 salt sub-keys and the small side "
    "replicates per salt, so one hot supplier can never pin a whole "
    "reducer. The oracle is the PLAIN join + aggregate — salting must be "
    "row-identical to the unsalted join (the salt never leaks out). "
    "Per-line revenue is quantized to integer micro-units before the sum "
    "(round-6 skew audit: salted vs plain accumulate in different orders "
    "by construction, and on a Zipf decade the double-sum ulps crossed "
    "the 4-dp round on hot suppliers — exact bigint sums make "
    "salted == plain an identity, not a rounding accident)",
)
def join_salted_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_suppkey", "s_suppkey"
    )
    s = load_table(spark, sf_dir, "supplier")
    joined = salted_join(li, s, on="s_suppkey", n_salts=16, how="inner")
    rev_u = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000, 0
    ).cast("decimal(38,0)")
    return joined.groupBy("s_suppkey", "s_name").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(
            F.sum(rev_u).cast("double") / F.lit(1_000_000.0), 4
        ).alias("revenue"),
    )


# --- Arrow cogrouped-map API (groupBy().cogroup().applyInPandas) ---
def _norm_by_max_click(left, right):
    """Per-user kernel: purchases normalized by the user's max click value.

    Runs once per user with BOTH sides' rows as pandas frames. max() is
    order-insensitive, and the normalization is a single IEEE division of
    raw parquet doubles — bit-identical to the SQL oracle, so the face
    stays hash-checkable even though it crosses into Python.
    """
    if len(left) == 0 or len(right) == 0:
        return left.iloc[0:0][["event_id", "user_id"]].assign(norm_value=0.0)
    m = right["click_value"].max()
    out = left[["event_id", "user_id"]].copy()
    out["norm_value"] = left["value"] / m
    return out


@register(
    "cogroup_purchase_vs_click_norm",
    """
    WITH mx AS (
      SELECT user_id, MAX(value) AS mclick
      FROM events WHERE event_type = 'click' GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.value / mx.mclick AS norm_value
    FROM events e JOIN mx USING (user_id)
    WHERE e.event_type = 'purchase'
    """,
    doc="cogrouped-map API face (groupBy().cogroup().applyInPandas -- the "
    "Arrow path for per-key logic that needs BOTH sides materialized, "
    "e.g. custom alignment/model scoring): each user's purchases "
    "normalized by their max click value. Both sides shuffle once on "
    "user_id and pair per key; per-key state is bounded by one user's "
    "events. The kernel is deterministic (order-insensitive max, single "
    "IEEE division), so unlike typical Python crossings this one is "
    "exact-oracle-checked against the equivalent join in DuckDB",
)
def cogroup_purchase_vs_click_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )
    # The rename is load-bearing, not cosmetic: both sides come from the
    # same events scan, so an un-aliased `value` on the right shares the
    # left's attribute ID and FlatMapCoGroupsInPandas' attribute
    # de-duplication silently drops it from the right-side Arrow batch.
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("value").alias("click_value")
    )
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            _norm_by_max_click, "event_id long, user_id long, norm_value double"
        )
    )
