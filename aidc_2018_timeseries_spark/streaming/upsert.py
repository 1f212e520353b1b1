"""Streaming upsert sink: latest-row-per-key materialization via
``foreachBatch`` (the MERGE INTO sink pattern).

scd2 (operators/scd.py) is the batch face of change capture; this is the
streaming sink side: each micro-batch merges into a keyed parquet state
so the table always holds every key's latest observation. ``foreachBatch``
is Spark's idiomatic escape hatch for sinks with merge semantics the
built-in file sink lacks (append-only). The merge itself is pure
DataFrame code — no per-row Python.

Idempotence / recovery: the merge is latest-wins keyed by a total
(ts, tiebreak) order, so replaying a micro-batch after a checkpoint
restart converges to the same state — reprocessing can't double-apply.
The restart test (tests/test_streaming_upsert.py) kills the query midway
and resumes from the checkpoint.

Scale posture: rewriting full state per batch is the demo simplification
— at 100 TB the same foreachBatch body targets a MERGE-capable table
format (partition overwrite / Delta-style MERGE) keyed identically; the
semantics demonstrated here (keyed latest-wins, idempotent re-apply) are
the contract those formats implement efficiently.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, key_cols: list[str], order_cols: list[str]) -> DataFrame:
    """One row per key: the greatest (order_cols) row, deterministically."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_writer(
    spark: SparkSession,
    state_path: str,
    key_cols: list[str],
    order_cols: list[str],
):
    """foreachBatch body: merge the micro-batch into the parquet state."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        fresh = latest_per_key(batch_df, key_cols, order_cols)
        if os.path.exists(state_path):
            current = spark.read.parquet(state_path)
            merged = latest_per_key(
                current.unionByName(fresh), key_cols, order_cols
            )
        else:
            merged = fresh
        # overwrite-in-place would lazily read the dir being replaced;
        # write-new-then-swap keeps the merge executor-side (no driver
        # materialization) and the swap is a metadata rename
        tmp = f"{state_path}.tmp-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(state_path):
            shutil.rmtree(state_path)
        os.rename(tmp, state_path)

    return merge


def start_upsert_stream(
    stream: DataFrame,
    spark: SparkSession,
    state_path: str,
    checkpoint_path: str,
    key_cols: list[str],
    order_cols: list[str],
    query_name: str = "upsert",
):
    """Run the stream through the upsert sink with a recovery checkpoint."""
    return (
        stream.writeStream.foreachBatch(
            upsert_writer(spark, state_path, key_cols, order_cols)
        )
        .option("checkpointLocation", checkpoint_path)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
