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
