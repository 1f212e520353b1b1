"""AQE skew-join: the engine-native answer to hot keys, next to the
explicit `salted_join` operator (operators/joins.py).

The brief's scale posture names both levers — "salting for skew, AQE for
runtime re-plan". `join_salted_per_supplier` proves the salting path;
this proves the AQE path actually ENGAGES on a hot-key join: a 95%-skewed
build side forces a sort-merge join whose hot partition AQE splits at
runtime (`SortMergeJoin(skew=true)` + `AQEShuffleRead ... skewed` in the
executed plan), with results identical to the unskewed golden. At 100 TB
the same runtime re-plan splits a hot reducer into advisory-sized chunks
without any query rewrite.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

_SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ worst case
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # local-scale thresholds so a ~MB hot partition counts as skewed
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
}


@contextmanager
def _confs(spark, kv):
    old = {k: spark.conf.get(k) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    with _confs(spark, _SKEW_CONFS):
        # 95% of the big side lands on key 7 — one reducer would own it
        big = spark.range(1_000_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        small = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = big.join(small, "k").groupBy().agg(
            F.sum("v").alias("sv"), F.sum("w").alias("sw"), F.count(F.lit(1)).alias("n")
        )
        got = j.collect()[0]
        plan = j._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
    assert "skewed" in plan, plan

    # golden: the same join with broadcast allowed (no skew handling needed)
    bj = big.join(F.broadcast(small), "k").groupBy().agg(
        F.sum("v").alias("sv"), F.sum("w").alias("sw"), F.count(F.lit(1)).alias("n")
    )
    want = bj.collect()[0]
    assert tuple(got) == tuple(want)
