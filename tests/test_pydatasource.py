"""Custom Python Data Source: the source-API adding-problem generator must
equal the expression-based S5 form row-for-row (two independent
implementations of the same md5-derived scheme), and generation must be
partition-parallel.
"""

from __future__ import annotations

from aidc_2018_timeseries_spark.sources import pydatasource
from aidc_2018_timeseries_spark.sources.synthetic import adding_problem


def _read(spark, n=1000, t=50, parts=8):
    pydatasource.register(spark)
    return (
        spark.read.format("adding_problem_py")
        .option("n", str(n))
        .option("seq_len", str(t))
        .option("numPartitions", str(parts))
        .load()
    )


def test_source_equals_expression_form(spark):
    via_source = sorted(map(tuple, _read(spark).collect()))
    via_expr = sorted(
        map(
            tuple,
            adding_problem(spark, n_samples=1000, seq_len=50)
            .select("sample_id", "pos1", "pos2", "label")
            .collect(),
        )
    )
    assert via_source == via_expr


def test_partition_parallel_generation(spark):
    df = _read(spark, n=100, parts=5)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100
    # disjoint slices: no sample id generated twice
    assert df.select("sample_id").distinct().count() == 100
