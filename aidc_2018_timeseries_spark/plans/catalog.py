"""Query catalog: named (Spark plan, DuckDB oracle) pairs.

Every operator claimed in SURVEY.md §2 registers here; __spark_entry__.py
exposes the catalog to the driver. Conventions (driver contract):

- each Spark callable takes (spark, sf_dir) and returns a DataFrame;
- oracle SQL runs in DuckDB against views named after the testdata tables;
- output column NAMES and order-insensitive VALUES must match — every
  computed column is aliased identically on both sides;
- float-accumulating outputs are rounded (typically 6 dp) ON BOTH SIDES so
  engine-internal summation-order ulp noise cannot flip the value hash;
- timestamps are never emitted raw (ns vs µs physical types differ across
  engines) — queries emit epoch nanos (exact bigints) or formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


CATALOG: dict[str, CatalogQuery] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a (spark_fn, oracle) pair to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        CATALOG[name] = CatalogQuery(name=name, spark_fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers catalog queries."""
    # Imports deferred so `import aidc_2018_timeseries_spark` stays cheap.
    from aidc_2018_timeseries_spark.plans import (  # noqa: F401
        series_queries,
        relational_queries,
        dedup_queries,
        text_queries,
        similarity_queries,
        pipeline_queries,
        multimodal_queries,
        join_queries,
        streaming_queries,
        agg_queries,
        cmapss_queries,
        sink_queries,
        layout_queries,
    )
