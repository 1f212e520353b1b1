"""Error-bound tests for the approximate aggregates (the catalog checks
the exact ones against DuckDB; sketches need tolerance assertions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF_DIR, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r["approx"] - r["exact"]) / max(r["exact"], 1)
        # rsd=0.02 is one standard deviation; 5x is a generous determinism-
        # safe bound that still catches a broken sketch (order-of-magnitude
        # errors)
        assert rel_err <= 0.10, (r["event_type"], r["approx"], r["exact"])


def test_percentile_approx_close_to_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    r = ev.agg(
        F.percentile_approx("value", 0.5, 10000).alias("approx"),
        F.expr("percentile(value, 0.5)").alias("exact"),
    ).first()
    # percentile_approx with high accuracy parameter lands on an actual
    # data value adjacent to the interpolated exact result
    assert abs(r["approx"] - r["exact"]) <= max(0.05 * abs(r["exact"]), 0.5)


def test_approx_percentiles_face_close_to_exact(spark):
    """The catalog face's sketch percentiles must track the exact ones."""
    from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all
    from tests.conftest import SF_DIR

    load_all()
    # scalar (event_type, pct, approx_value) rows — the face posexplodes
    # its sketch array so the driver canonicalizer can sort/hash the cells
    rows = CATALOG["agg_approx_percentiles"].spark_fn(spark, SF_DIR).collect()
    approx = {(r["event_type"], r["pct"]): r["approx_value"] for r in rows}
    pcts = [0.5, 0.95, 0.99]
    ev = load_table(spark, SF_DIR, "events")
    # reference: the same order-statistic semantics at maximum accuracy
    # (rank error 0) — comparing against the INTERPOLATED percentile would
    # conflate sketch error with data-point-vs-interpolation distance,
    # which dominates on sparse group tails
    exact = {
        (r["event_type"], p): x
        for r in ev.groupBy("event_type")
        .agg(F.percentile_approx("value", pcts, 2147483647).alias("ex"))
        .collect()
        for p, x in zip(pcts, r["ex"])
    }
    assert set(approx) == set(exact)
    for key, a in approx.items():
        x = exact[key]
        assert abs(a - x) <= max(0.02 * abs(x), 0.5), (key, a, x)


def test_hll_rollup_merge_lossless_and_bounded(spark):
    """The rollup face's union-of-bucket-sketches must (a) equal the
    estimate of one directly-built per-type sketch — HLL union is lossless
    at equal lgConfigK — and (b) track the exact distinct count."""
    from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all

    load_all()
    via_rollup = {
        r["event_type"]: r["approx_users"]
        for r in CATALOG["agg_hll_sketch_rollup"].spark_fn(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    direct = {
        r["event_type"]: (r["direct"], r["exact"])
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(12))
            ).alias("direct"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    }
    assert set(via_rollup) == set(direct)
    for t, est in via_rollup.items():
        d, exact = direct[t]
        assert est == d, (t, est, d)  # merge must be lossless
        assert abs(est - exact) / max(exact, 1) <= 0.10, (t, est, exact)
