"""TCN inference stage (SURVEY §2.6 M1-M5, M10) — NumPy forward pass
distributed with mapInPandas.

The reference declares these as ngraph graph ops
(``topologies/custom_neon_classes.py:43-139`` dilated causal conv with
weight normalization, ``temporal_convolutional_network.py:7-65`` temporal
blocks / residual blocks / dilation-2^i stacking, Affine readout at
``turbofan_with_tcn.py:80``); execution happened in the ngraph
transformer. Here the forward pass is plain NumPy over Arrow record
batches — the Spark plan stays scan-shaped: windows stream through Python
workers partition-by-partition, nothing collects to the driver, so 100 TB
of windows is just more partitions.

Training is out of scope by design (SURVEY §7.7): no distributed backprop.
Weights are deterministic (seeded) or caller-provided; inference parity
with a reference-shaped NumPy implementation is what the tests pin.

Dropout note: inference mode only — the reference's Dropout2D multiplies
by keep-prob at inference (``custom_neon_classes.py:32-33``), which is a
deterministic scale and is folded into the conv weights here as the
identity (keep=1.0 default).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

WEIGHT_NORM_EPS = 1e-3  # reference custom_neon_classes.py:86


def weight_normalized(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    """W = g * v / sqrt(mean(v^2) + eps) (reference
    ``custom_neon_classes.py:81-88``; mean over all non-output axes)."""
    denom = np.sqrt((v**2).mean(axis=(0, 1), keepdims=True) + WEIGHT_NORM_EPS)
    return g * v / denom


def causal_dilated_conv(x: np.ndarray, w: np.ndarray, b: np.ndarray, dilation: int) -> np.ndarray:
    """Causal 1-D convolution: out[t] uses x[t - j*dilation] only (left
    zero-padding of (k-1)*dilation — the 'causal' padding flag at
    ``temporal_convolutional_network.py:13``).

    x: (T, C_in); w: (k, C_in, C_out); b: (C_out,) → (T, C_out)
    """
    k = w.shape[0]
    t_len = x.shape[0]
    pad = (k - 1) * dilation
    xp = np.concatenate([np.zeros((pad, x.shape[1])), x], axis=0)
    out = np.zeros((t_len, w.shape[2]))
    for j in range(k):
        # tap j looks back (k-1-j)*dilation steps
        seg = xp[j * dilation : j * dilation + t_len, :]
        out += seg @ w[j]
    return out + b


def relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def spatial_dropout_mask(
    n_channels: int, keep: float, seed: int, block_idx: int, layer_idx: int
) -> np.ndarray:
    """Per-CHANNEL Bernoulli(keep) mask — SURVEY §2 M2 (Dropout2D at
    reference ``custom_neon_classes.py:20-33``): spatial dropout zeroes a
    feature map across ALL timepoints, not individual activations.
    Deterministic from (seed, block, layer) via a SeedSequence, so a
    distributed training step applies the identical mask on every
    partition with no mask broadcast."""
    rng = np.random.default_rng(
        np.random.SeedSequence([seed, block_idx, layer_idx])
    )
    return (rng.random(n_channels) < keep).astype(float)


def apply_spatial_dropout(
    h: np.ndarray,
    keep: float,
    training: bool,
    seed: int = 0,
    block_idx: int = 0,
    layer_idx: int = 0,
) -> np.ndarray:
    """Reference (non-inverted) dropout semantics
    (``custom_neon_classes.py:28-33``): TRAINING multiplies by the binary
    channel mask at full value; INFERENCE multiplies by the keep
    probability — the deterministic expectation, which is why the
    long-standing inference fold (keep=1.0 default → identity) was exact
    rather than an approximation. h: (T, C)."""
    if keep >= 1.0:
        return h
    if training:
        return h * spatial_dropout_mask(h.shape[1], keep, seed, block_idx, layer_idx)
    return h * keep


@dataclass
class TCNWeights:
    """Deterministic TCN parameters: levels residual blocks, dilation 2^i,
    each block = (conv → relu) × 2 + residual (1×1 conv when widths differ),
    then a linear readout on the LAST timepoint (W12 + Affine)."""

    n_features: int
    n_hidden: int = 8
    levels: int = 2
    kernel_size: int = 3
    seed: int = 42
    blocks: list = field(default_factory=list)
    readout: tuple = None  # (w, b)

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        c_in = self.n_features
        for _ in range(self.levels):
            mk = lambda *s: rng.normal(0, 0.1, size=s)
            v1, g1 = mk(self.kernel_size, c_in, self.n_hidden), mk(1, 1, self.n_hidden)
            v2, g2 = mk(self.kernel_size, self.n_hidden, self.n_hidden), mk(1, 1, self.n_hidden)
            b1, b2 = mk(self.n_hidden), mk(self.n_hidden)
            side = mk(1, c_in, self.n_hidden) if c_in != self.n_hidden else None
            self.blocks.append((v1, g1, b1, v2, g2, b2, side))
            c_in = self.n_hidden
        self.readout = (rng.normal(0, 0.1, size=(self.n_hidden, 1)), rng.normal(0, 0.1, size=1))


def tcn_forward(
    x: np.ndarray,
    weights: TCNWeights,
    *,
    keep: float = 1.0,
    training: bool = False,
    dropout_seed: int = 0,
) -> float:
    """Forward pass for one (T, F) window → scalar prediction.

    ``keep``/``training``/``dropout_seed`` wire M2 spatial dropout after
    each conv+relu, matching the reference block layout
    (``temporal_convolutional_network.py:7-30``: conv → relu → dropout,
    twice per temporal block). Defaults preserve the inference identity
    (keep=1.0) the catalog faces were verified under.
    """
    h = x
    for i, (v1, g1, b1, v2, g2, b2, side) in enumerate(weights.blocks):
        dilation = 2**i  # temporal_convolutional_network.py:51-65
        main = relu(causal_dilated_conv(h, weight_normalized(v1, g1), b1, dilation))
        main = apply_spatial_dropout(main, keep, training, dropout_seed, i, 0)
        main = relu(causal_dilated_conv(main, weight_normalized(v2, g2), b2, dilation))
        main = apply_spatial_dropout(main, keep, training, dropout_seed, i, 1)
        res = h if side is None else causal_dilated_conv(h, side, np.zeros(side.shape[2]), 1)
        h = relu(main + res)
    w, b = weights.readout
    return float((h[-1] @ w + b)[0])  # last timepoint (W12) + Affine (M10)


def predict_windows(
    df: DataFrame,
    weights: TCNWeights,
    window_col: str = "window",
    feature_cols: list[str] | None = None,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed inference: mapInPandas over Arrow batches of windows.

    Input rows carry ``window`` = array<struct<features>>; output keeps
    ``id_cols`` plus a double ``pred``. The UDF touches only its partition
    — bounded memory, no shuffle, linear scale-out.
    """
    id_cols = id_cols or [c for c in df.columns if c != window_col]
    feature_names = feature_cols or [
        f.name for f in df.schema[window_col].dataType.elementType.fields
    ]
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols] + [T.StructField("pred", T.DoubleType())]
    )

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            preds = []
            for win in pdf[window_col]:
                x = np.array([[row[f] for f in feature_names] for row in win])
                preds.append(tcn_forward(x, weights))
            res = pdf[id_cols].copy()
            res["pred"] = preds
            yield res

    return df.mapInPandas(infer, schema=out_schema)
