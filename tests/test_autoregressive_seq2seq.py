"""Tests for W14 autoregressive generation and the seq2seq stage."""

from __future__ import annotations

import numpy as np
import pytest

from aidc_2018_timeseries_spark.ml.autoregressive import (
    autoregressive_generate,
    trailing_mean_predictor,
)
from aidc_2018_timeseries_spark.ml.seq2seq import (
    Seq2SeqWeights,
    decode,
    encode,
    reconstruct,
)


def test_autoregressive_matches_local_loop(spark):
    rng = np.random.default_rng(11)
    data = {sid: rng.uniform(0, 10, size=30) for sid in (1, 2, 3)}
    rows = [
        (sid, t, float(v)) for sid, vals in data.items() for t, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "series_id int, t int, v double")
    seq_len, n_steps = 8, 4
    got = {}
    for r in autoregressive_generate(df, "series_id", "t", "v", seq_len, n_steps).collect():
        got[(r["series_id"], r["step"])] = (r["generated"], r["actual"])

    for sid, vals in data.items():
        tail = vals[-(seq_len + n_steps):]
        window = tail[:seq_len].copy()
        for step in range(1, n_steps + 1):
            pred = trailing_mean_predictor(window)
            g, a = got[(sid, step)]
            assert g == pytest.approx(pred, rel=1e-12)
            assert a == pytest.approx(float(tail[seq_len + step - 1]), rel=1e-12)
            window = np.append(window[1:], pred)


def test_autoregressive_with_tcn_predictor(spark):
    """Distributed model-in-the-loop generation == a local NumPy replay of
    the same loop (reference utils/inference.py:61 generates with the
    trained model; same seeded weights on both sides)."""
    from aidc_2018_timeseries_spark.ml.autoregressive import tcn_predictor
    from aidc_2018_timeseries_spark.ml.tcn import TCNWeights, tcn_forward

    rng = np.random.default_rng(23)
    data = {sid: rng.uniform(-1, 1, size=25) for sid in (1, 2)}
    rows = [
        (sid, t, float(v)) for sid, vals in data.items() for t, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "series_id int, t int, v double")
    seq_len, n_steps = 10, 5
    weights = TCNWeights(n_features=1, seed=42)
    got = {}
    gen = autoregressive_generate(
        df, "series_id", "t", "v", seq_len, n_steps, predictor=tcn_predictor(weights)
    )
    for r in gen.collect():
        got[(r["series_id"], r["step"])] = (r["generated"], r["actual"])
    assert len(got) == len(data) * n_steps

    local_weights = TCNWeights(n_features=1, seed=42)  # fresh instance: same seed
    for sid, vals in data.items():
        tail = vals[-(seq_len + n_steps):]
        window = tail[:seq_len].copy()
        for step in range(1, n_steps + 1):
            pred = tcn_forward(window.reshape(-1, 1), local_weights)
            g, a = got[(sid, step)]
            assert g == pytest.approx(pred, rel=1e-12)
            assert a == pytest.approx(float(tail[seq_len + step - 1]), rel=1e-12)
            window = np.append(window[1:], pred)


def test_autoregressive_short_series_emits_nothing(spark):
    df = spark.createDataFrame(
        [(1, t, float(t)) for t in range(5)], "series_id int, t int, v double"
    )
    out = autoregressive_generate(df, "series_id", "t", "v", seq_len=8, n_steps=3)
    assert out.count() == 0


def test_seq2seq_shapes_and_determinism():
    w = Seq2SeqWeights(n_features=3, hidden_sizes=(6, 5))
    x = np.random.default_rng(2).normal(size=(12, 3))
    states = encode(x, w)
    assert [s[0].shape[0] for s in states] == [6, 5]
    y1 = decode(states, 7, w, np.zeros(3))
    y2 = decode(states, 7, w, np.zeros(3))
    assert y1.shape == (7, 3)
    np.testing.assert_array_equal(y1, y2)
    # autoregressive feedback: step k+1 depends on step k
    recon = reconstruct(x, w, reverse_target=True)
    assert recon.shape == x.shape
    # reversal (W11): reconstruct without reversal is the flipped sequence
    np.testing.assert_allclose(reconstruct(x, w, reverse_target=False), recon[::-1])


def test_encoder_final_state_depends_on_whole_sequence():
    w = Seq2SeqWeights(n_features=2, hidden_sizes=(4,))
    rng = np.random.default_rng(3)
    x = rng.normal(size=(10, 2))
    s1 = encode(x, w)
    x2 = x.copy()
    x2[0] += 5.0  # perturb the FIRST timestep — must reach the final state
    s2 = encode(x2, w)
    assert not np.allclose(s1[0][0], s2[0][0])
