"""W14: autoregressive sequence generation (reference
``utils/inference.py:18-105``).

Inherently sequential per series (each prediction feeds the next window),
so it cannot be set-based — but it IS embarrassingly parallel ACROSS
series. applyInPandas gives each series to one Python worker: the driver
never sees the data, memory is bounded by one series, and 10^6 series
fan out across executors. This is the documented non-SQL operator
(rows-only driver check; SURVEY §7).

Semantics (mirroring the reference loop):
- seed the window with the first ``seq_len`` points of each series' tail
  segment of length seq_len + n_steps;
- repeatedly predict the next point, slide the window by one, append the
  prediction (generated points feed later windows);
- emit (key, step, generated, actual) so callers can compute the
  generated-vs-truth comparison the reference plots.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def trailing_mean_predictor(window: np.ndarray) -> float:
    """Default next-point predictor: mean of the window (deterministic,
    dependency-free). Swap in tcn.tcn_forward for model-based generation.

    Summed as an explicit LEFT FOLD, not np.mean: numpy's pairwise
    summation has a different op order, and the W14 oracle reproduces
    this mean bit-for-bit in DuckDB via list_reduce (sequential
    left-to-right, and fold-from-first == fold-from-0.0 since
    0.0 + x == x exactly)."""
    total = 0.0
    for v in window:
        total += float(v)
    return total / window.shape[0]


def tcn_predictor(weights) -> Callable[[np.ndarray], float]:
    """Adapt a TCN (ml/tcn.py) to the autoregressive predictor contract —
    the reference generates with the TRAINED MODEL, not a summary statistic
    (``utils/inference.py:61`` calls the model inside the loop; topology at
    ``topologies/temporal_convolutional_network.py:51-65``). The 1-D value
    window becomes a (T, 1) feature matrix for ``tcn_forward``.

    Returned closure is cloudpickle-shipped to executors with the weights
    captured — each series' generation loop runs model inference worker-side.
    """
    from aidc_2018_timeseries_spark.ml.tcn import tcn_forward

    def predict(window: np.ndarray) -> float:
        return tcn_forward(window.reshape(-1, 1), weights)

    return predict


def autoregressive_generate(
    df: DataFrame,
    key: str,
    order: str | Sequence[str],
    value_col: str,
    seq_len: int,
    n_steps: int,
    predictor: Callable[[np.ndarray], float] = trailing_mean_predictor,
) -> DataFrame:
    """Generate ``n_steps`` points per series from a ``seq_len`` seed.

    Output: (key, step 1..n_steps, generated double, actual double) —
    ``actual`` is the ground-truth point at the same position (NaN when
    the series is too short to supply it).
    """
    order_names = [order] if isinstance(order, str) else list(order)
    out_schema = T.StructType(
        [
            df.schema[key],
            T.StructField("step", T.IntegerType()),
            T.StructField("generated", T.DoubleType()),
            T.StructField("actual", T.DoubleType()),
        ]
    )

    def gen(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_names)
        series = pdf[value_col].to_numpy(dtype=float)
        kval = pdf[key].iloc[0]
        tail = series[-(seq_len + n_steps) :]
        if tail.shape[0] < seq_len + 1:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        window = tail[:seq_len].copy()
        rows = []
        for step in range(1, n_steps + 1):
            pred = predictor(window)
            actual_idx = seq_len + step - 1
            actual = float(tail[actual_idx]) if actual_idx < tail.shape[0] else float("nan")
            rows.append((kval, step, pred, actual))
            window = np.append(window[1:], pred)  # slide by 1, feed prediction
        return pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(key, *order_names, value_col).groupBy(key).applyInPandas(
        gen, schema=out_schema
    )
