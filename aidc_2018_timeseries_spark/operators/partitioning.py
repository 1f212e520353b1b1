"""Shared partitioning helpers for compute-bound operators.

One implementation of the "spread" gate (previously duplicated in
operators/dedup.py and operators/similarity.py) so the gating policy
can be fixed in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Spark's default for spark.sql.files.maxPartitionBytes (128 MiB).
_DEFAULT_MAX_SPLIT = 134217728


def _max_partition_bytes(df: DataFrame) -> int:
    raw = str(
        df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", str(_DEFAULT_MAX_SPLIT)
        )
    )
    digits = "".join(ch for ch in raw if ch.isdigit())
    return int(digits) if digits else _DEFAULT_MAX_SPLIT


def spread_for_compute(df: DataFrame, col: str) -> DataFrame:
    """Repartition to an EXPLICIT core-count partition count before
    compute-heavy per-row work (md5 shingle hashing, fold dot products,
    GEMM batches). A small-file corpus otherwise arrives as ONE scan task
    (the sf0.1 embeddings table is 0.8 MB) and runs the CPU-bound stage
    serially; the count must be explicit because AQE sizes partitions by
    BYTES, which is the wrong currency when downstream compute is the
    cost.

    CONDITIONAL, gated on the OPTIMIZED-PLAN size estimate — a pure
    driver-side statistic (parquet scans report file bytes), so the gate
    forces neither physical planning nor RDD conversion (the previous
    ``df.rdd.getNumPartitions()`` gate built the physical plan on every
    call). An input whose estimated size reaches core-count ×
    ``spark.sql.files.maxPartitionBytes`` already produces at least
    core-count scan splits by construction — the 100 TB case — and the
    repartition would be a pure full-corpus shuffle of row bodies with
    nothing to fix, so it is skipped. This byte gate also closes the old
    gate's skew hole for SMALL inputs: a tiny corpus pre-split into many
    skewed partitions used to skip the spread on partition count alone;
    by bytes it is spread. Large-but-skewed inputs remain out of scope
    here by design — at that size the hash repartition would shuffle the
    full corpus, and AQE skew handling (enabled session-wide) owns that
    regime. Unknown/absent statistics (no ``_jdf`` under Spark Connect,
    stats defaulting to Long.Max on exotic plans) degrade to skipping,
    i.e. never force a shuffle on a possibly-huge input.
    """
    sess = df.sparkSession
    n = sess.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # Spark Connect / plan without stats: see docstring
        size = None
    if size is not None and 0 <= size < n * _max_partition_bytes(df):
        return df.repartition(n, F.col(col))
    return df
