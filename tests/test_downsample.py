"""Golden semantics for downsample_maxdev (LTTB-family rollup)."""

from __future__ import annotations

from aidc_2018_timeseries_spark.operators.resample import downsample_maxdev


def test_keeps_peak_and_endpoints(spark):
    # one series, 9 points, 3 buckets of 3; values flat except a spike
    rows = [
        (1, t, t, float(v))
        for t, v in zip(range(1, 10), [5, 5, 5, 5, 50, 5, 5, 5, 5])
    ]
    df = spark.createDataFrame(rows, "k long, t_us long, id long, value double")
    got = {
        (r.t_us, r.bucket, r.is_endpoint)
        for r in downsample_maxdev(df, "k", "t_us", "value", "id", n_buckets=3).collect()
    }
    # bucket 2 must pick the spike at t=5; endpoints t=1 and t=9 always kept
    assert (5, 2, 0) in got
    assert (1, 1, 1) in got and (9, 3, 1) in got
    # bucket 1's flat pick IS the endpoint t=1; bucket 3 picks t=7 -> 4 rows
    assert sorted(t for t, _, _ in got) == [1, 5, 7, 9]


def test_tie_breaks_to_earliest_point(spark):
    # all values equal -> dev 0 everywhere; earliest (t_us, id) per bucket wins
    rows = [(1, t, t, 7.0) for t in range(1, 7)]
    df = spark.createDataFrame(rows, "k long, t_us long, id long, value double")
    got = sorted(
        r.t_us
        for r in downsample_maxdev(df, "k", "t_us", "value", "id", n_buckets=2).collect()
    )
    # bucket picks: t=1, t=4; endpoints: t=1 (dedup'd by filter OR), t=6
    assert got == [1, 4, 6]


def test_output_bounded_by_buckets(spark):
    rows = [(k, t, t, float((t * 37) % 11)) for k in (1, 2) for t in range(1, 101)]
    df = spark.createDataFrame(rows, "k long, t_us long, id long, value double")
    out = downsample_maxdev(df, "k", "t_us", "value", "id", n_buckets=10)
    per_key = {r.k: r.cnt for r in out.groupBy("k").count().withColumnRenamed("count", "cnt").collect()}
    assert all(10 <= c <= 12 for c in per_key.values())
