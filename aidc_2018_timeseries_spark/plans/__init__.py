from aidc_2018_timeseries_spark.plans.catalog import CATALOG, CatalogQuery, register

__all__ = ["CATALOG", "CatalogQuery", "register"]
