"""Storage-layout faces: the PLAN claims, not just the rows.

`bucketed_join_colocated`'s whole point is a shuffle-free fact-fact join;
`layout_range_cluster`'s is file/row-group skipping via a pushed range
predicate on clustered data. Row correctness is the driver oracle's job —
these tests pin the physical-plan properties the docstrings promise.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all
from aidc_2018_timeseries_spark.plans.layout_queries import (
    bucketed_join_frames,
    range_clustered_events,
)
from tests.conftest import SF_DIR

load_all()


def _formatted(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    """With broadcast off (forcing the worst case — the fact-fact SMJ), a
    join of two co-bucketed tables must contain ZERO Exchange below the
    join: the bucket layout IS the join partitioning."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, orders = bucketed_join_frames(spark, SF_DIR)
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "o_orderstatus", "l_quantity"
        )
        plan = _formatted(joined)
        assert "SortMergeJoin" in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
        # and the scans really are bucket-aware
        assert re.search(r"SelectedBucketsCount|Bucketed: true", plan), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark):
    """Bucketing is pure layout: the catalog face must be row-identical to
    the plain join over raw parquet."""
    from aidc_2018_timeseries_spark.sources.tables import load_table

    face = CATALOG["bucketed_join_colocated"].spark_fn(spark, SF_DIR)
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )
    got = {tuple(r) for r in face.collect()}
    want = {tuple(r) for r in plain.collect()}
    assert got == want


def test_range_cluster_filter_pushed_to_scan(spark):
    """The user_id range predicate on the clustered read-back must reach
    the parquet scan (PushedFilters) — that is what lets row-group min/max
    stats skip IO on clustered files."""
    back = range_clustered_events(spark, SF_DIR)
    plan = _formatted(back.where(F.col("user_id").between(100, 199)))
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(user_id,100\)", plan), plan
    assert re.search(r"PushedFilters:.*LessThanOrEqual\(user_id,199\)", plan), plan


def test_range_cluster_files_have_disjoint_ranges(spark):
    """Each written file must own a contiguous, non-overlapping user_id
    range (that disjointness is exactly why min/max skipping prunes to
    ~1/N of files for an equality/range probe)."""
    back = range_clustered_events(spark, SF_DIR)
    per_file = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    assert len(spans) > 1, "expected multiple range-partitioned files"
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_dpp_join_prunes_fact_partitions(spark):
    """The dim-side tier filter must reach the partitioned fact scan as a
    DYNAMIC partition filter (dynamicpruningexpression) — the query never
    names the surviving event_types, the runtime does."""
    from aidc_2018_timeseries_spark.plans.layout_queries import (
        partitioned_events_with_dim,
    )

    fact, dim = partitioned_events_with_dim(spark, SF_DIR)
    joined = (
        fact.join(F.broadcast(dim), "event_type")
        .where(F.col("tier") == "active")
        .select("event_id")
    )
    plan = _formatted(joined)
    assert "dynamicpruningexpression" in plan.lower(), plan


def test_zorder_files_prune_on_both_dimensions(spark):
    """Z-order's whole point vs single-key clustering: per-file min/max
    stats must be selective on BOTH interleaved dimensions. For the face's
    2-D probe (user_id 100-199, value 40-60), a nontrivial number of files
    must be skippable by the user_id stats AND a nontrivial number by the
    value stats — single-key clustering on user_id gives ~zero value-side
    pruning (every file spans the full value range)."""
    from aidc_2018_timeseries_spark.plans.layout_queries import (
        range_clustered_events,
        zorder_clustered_events,
    )

    zback = zorder_clustered_events(spark, SF_DIR)
    per_file = (
        zback.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
            F.min("value").alias("vlo"), F.max("value").alias("vhi"),
        )
        .collect()
    )
    assert len(per_file) > 4, "expected multiple z-range files"
    u_skipped = sum(1 for r in per_file if r.uhi < 100 or r.ulo > 199)
    v_skipped = sum(1 for r in per_file if r.vhi < 40.0 or r.vlo > 60.0)
    assert u_skipped > 0, "no file skippable on user_id stats"
    assert v_skipped > 0, "no file skippable on value stats"

    # contrast: the single-key user_id clustering spans the full value
    # range in (almost) every file -> no value-side pruning
    rback = range_clustered_events(spark, SF_DIR)
    r_files = (
        rback.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("value").alias("vlo"), F.max("value").alias("vhi"))
        .collect()
    )
    r_v_skipped = sum(1 for r in r_files if r.vhi < 40.0 or r.vlo > 60.0)
    assert v_skipped > r_v_skipped


def test_zorder_both_filters_pushed_to_scan(spark):
    from aidc_2018_timeseries_spark.plans.layout_queries import (
        zorder_clustered_events,
    )

    back = zorder_clustered_events(spark, SF_DIR)
    plan = _formatted(
        back.where(
            F.col("user_id").between(100, 199) & F.col("value").between(40.0, 60.0)
        )
    )
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(user_id,100\)", plan), plan
    assert re.search(r"PushedFilters:.*GreaterThanOrEqual\(value,40\.0\)", plan), plan
