"""Golden semantics for concurrency_sweep (interval sweep-line)."""

from __future__ import annotations

from aidc_2018_timeseries_spark.operators.intervals import concurrency_sweep


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, id long, s long, e long")


def test_peak_and_first_peak_time(spark):
    # intervals: [0,10) [5,15) [8,12) -> concurrency peaks at 3 from t=8
    rows = [("a", 1, 0, 10), ("a", 2, 5, 15), ("a", 3, 8, 12)]
    got = concurrency_sweep(_df(spark, rows), "k", "s", "e", "id").collect()
    assert [(r.k, r.max_concurrent, r.first_peak_t_us) for r in got] == [("a", 3, 8)]


def test_half_open_touching_intervals_do_not_overlap(spark):
    # [0,10) and [10,20): end processed before start at t=10 -> peak 1
    rows = [("a", 1, 0, 10), ("a", 2, 10, 20)]
    got = concurrency_sweep(_df(spark, rows), "k", "s", "e", "id").collect()
    assert got[0].max_concurrent == 1
    assert got[0].first_peak_t_us == 0  # first time concurrency hits 1


def test_keys_are_independent(spark):
    rows = [("a", 1, 0, 10), ("a", 2, 0, 10), ("b", 3, 0, 10)]
    got = {
        r.k: (r.max_concurrent, r.first_peak_t_us)
        for r in concurrency_sweep(_df(spark, rows), "k", "s", "e", "id").collect()
    }
    assert got == {"a": (2, 0), "b": (1, 0)}
