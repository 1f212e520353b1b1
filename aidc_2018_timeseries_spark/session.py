"""SparkSession construction and per-session configuration.

The reference selects its execution backend with an argparse ``-b`` flag
(reference ``utils/arguments.py:6``); here the equivalent is session
configuration. All confs that MUST hold on any session that touches the
driver's testdata (nanosecond parquet timestamps, UTC, Arrow) are applied
by :func:`configure_session`, which is safe to call on an
externally-provided session (the driver passes us one).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs required to read the driver's testdata and to keep
# results deterministic / DuckDB-comparable.
_RUNTIME_CONFS = {
    # events.parquet stores TIMESTAMP(NANOS) which Spark cannot represent;
    # read it as raw nanosecond longs and convert explicitly (sources/tables.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas UDF / toPandas paths (similarity, multimodal, ML stage).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs needed by this engine to an existing session."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be static on some builds; reads that need it will
            # raise a clear error of their own.
            pass
    return spark


def get_spark(
    app_name: str = "aidc_2018_timeseries_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local session sized for this container.

    On a real cluster the same engine code runs unchanged — only
    master/partition confs differ. Shuffle-partition count follows core
    count (local) but the operators themselves are written for the
    1000-executor case: partition-local window work keyed by series id,
    broadcast dimension joins, AQE enabled for runtime re-planning.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    shuffle = shuffle_partitions or max(cpus, 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure_session(spark)
