"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). The actual engine lives in ``aidc_2018_timeseries_spark/``;
this module only exposes its query catalog.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all  # noqa: E402

load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the turbofan RUL feature
    pipeline (scale → strided windows → capped labels) on the events table."""
    return CATALOG["turbofan_rul_pipeline"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the LLM-data
    -pipeline extensions). Each callable takes (spark, sf_dir)."""
    return {name: q.spark_fn for name, q in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops (approximate
    IVF search, streaming, seeded shuffle) are omitted → rows-only check."""
    return {name: q.oracle for name, q in CATALOG.items() if q.oracle is not None}
