"""Sinks (SURVEY §2.1 S7-S8).

The reference dumps training metrics to JSON (``timeseries_trainer.py:
114-118``) and checkpoints models; the engine equivalents are partitioned
columnar writes plus a small-JSON metrics sink. Plots/TensorBoard (S9-S10)
are driver-side visualization, out of engine scope.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def write_metrics_json(metrics: dict, path: str) -> None:
    """S7: driver-side metrics dump — metrics are tiny by construction."""
    with open(path, "w") as fh:
        json.dump(metrics, fh, indent=2, sort_keys=True)


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite"
) -> None:
    """Columnar sink for derived datasets (windows, signatures, features).

    At 100 TB: partition by the downstream join/filter key so later reads
    prune files; writers scale with input partitions — no driver funnel.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_parquet(
    spark, src_path: str, dst_path: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a parquet dataset into
    ``ceil(total_bytes / target_bytes)`` files of ~target size.

    The sizing reads FILE METADATA only (a driver-side listing, the same
    class of bookkeeping a real compactor's planning phase does — no data
    rows cross the driver); the rewrite itself is one distributed
    repartition + write. At 100 TB this is the maintenance job that keeps
    streaming/incremental sinks queryable: thousands of per-trigger
    files → scan-sized files, so later reads pay one footer+row-group per
    ~target_bytes instead of per micro-batch. Returns the output file
    count. Round-robin repartition (not coalesce): coalesce would chain
    input partitions and skew output sizes; compaction wants even files.
    """
    import math
    import os

    total = 0
    for root, _, files in os.walk(src_path):
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_path).repartition(n_out).write.mode("overwrite").parquet(
        dst_path
    )
    return n_out


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Bucketed external-table sink: pre-hash-partition rows into
    ``n_buckets`` files per task keyed on ``bucket_by``, sorted within each
    bucket, registered in the session catalog at an explicit ``path``.

    This is the storage-layout half of a co-located join: two tables
    bucketed on the same key with the same bucket count join WITHOUT a
    shuffle — the Exchange that normally dominates a fact-fact join at
    100 TB is paid once at write time and amortized over every subsequent
    join/aggregation on that key. Spark requires ``saveAsTable`` (catalog
    metadata carries the bucket spec; plain ``.parquet()`` writes lose it).
    """
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_by)
        .sortBy(bucket_by)
        .option("path", path)
        .saveAsTable(table)
    )
