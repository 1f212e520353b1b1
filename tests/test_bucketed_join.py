"""Bucketing = the co-located join strategy (brief: "bucketing for
co-located joins"). Writing both sides bucketed by the join key lets the
join run with NO Exchange on either side — at 100 TB that's the
difference between re-shuffling the fact table per query and never
shuffling it again after ingest.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse dir is a static conf; explicit per-table paths keep the
    # data in tmp while only tiny metastore entries use the default dir
    wh = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    for df, name, key in [(li, "li_bucketed", "l_orderkey"), (o, "o_bucketed", "o_orderkey")]:
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(wh / name))
            .saveAsTable(name)
        )
    return "li_bucketed", "o_bucketed"


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    o = spark.table(o_t)
    # hint("merge"): at test scale Catalyst would broadcast the small side
    # (which also avoids the exchange, but doesn't demonstrate bucketing);
    # at 100 TB neither side broadcasts and SMJ-over-buckets is the plan
    joined = li.hint("merge").join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
        "o_orderpriority"
    ).agg(F.round(F.sum("l_extendedprice"), 4).alias("rev"))

    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    # the JOIN itself must be exchange-free: both sides arrive bucketed on
    # the join key (the groupBy on a different key may still shuffle)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    import re

    join_ids = [int(m.group(1)) for m in re.finditer(r"\((\d+)\) (?:SortMergeJoin|ShuffledHashJoin)", plan)]
    scan_ids = [int(m.group(1)) for m in re.finditer(r"\((\d+)\) Scan", plan)]
    exch_ids = [int(m.group(1)) for m in re.finditer(r"\((\d+)\) Exchange", plan)]
    assert join_ids and scan_ids
    # formatted plans number nodes bottom-up per branch: any exchange with
    # an id below the join id would be feeding the join
    feeding = [e for e in exch_ids if e < max(join_ids)]
    assert not feeding, plan


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    got = {
        r["o_orderpriority"]: r["rev"]
        for r in spark.table(li_t)
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"))
        .collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    o = load_table(spark, SF_DIR, "orders")
    want = {
        r["o_orderpriority"]: r["rev"]
        for r in li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"))
        .collect()
    }
    # relative tolerance, not exact equality: the two plans accumulate
    # doubles in different orders (8-bucket SMJ vs AQE-planned)
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) <= 1e-9 * max(abs(want[k]), 1.0), k
