"""One-pass data-quality observation (``DataFrame.observe``).

dq_audit_constraints runs quality checks as their own query; this is the
zero-extra-scan alternative: ``observe`` attaches named aggregate metrics
to a DataFrame, computed DURING whatever action next executes the plan —
row counts, null counts, bounds — without a second pass over the data.
At 100 TB a pipeline cannot afford to re-scan its input just to count
nulls; observation metrics ride the scan the pipeline already pays for.

The reference's closest relative is its inline assert guards
(``datasets/turbofan.py:140,159-161`` — NaN / negativity checks executed
eagerly on materialized arrays); here the guards are declarative and
collected from the executed plan via ``Observation``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame, value_col: str, name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach standard quality metrics for ``value_col``; returns the
    instrumented frame and the Observation to read after an action.

    Metrics: n_rows, n_null, n_nan, n_negative, min/max (of non-null).
    """
    obs = Observation(name)
    v = F.col(value_col)
    instrumented = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when(F.isnan(v), 1).otherwise(0)).alias("n_nan"),
        F.sum(F.when(v < 0, 1).otherwise(0)).alias("n_negative"),
        F.min(v).alias("v_min"),
        F.max(v).alias("v_max"),
    )
    return instrumented, obs
