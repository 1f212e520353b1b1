"""NumPy-oracle golden tests (SURVEY §5.2): pin the reference's exact
windowing/label/pad semantics on synthetic trajectories.

The oracles below re-state the reference's documented behavior
(window count ceil((L-T+1)/skip), pad-to-T*skip repeating the first row,
label L-T-k*skip capped, music zero-pad keeping LAST rows, tumbling
reshape with look-ahead) in plain slicing — independently written, then
compared elementwise against the Spark operators.

Reference anchors: datasets/turbofan.py:118-163, datasets/timeseries.py:
90-152, datasets/music.py:37-45.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.normalize import (
    array_window_zscore,
    per_key_max_scale,
)
from aidc_2018_timeseries_spark.operators.padding import (
    pad_or_truncate_front_zero,
    pad_short_series_front_repeat_long,
)
from aidc_2018_timeseries_spark.operators.windowing import (
    rolling_window_arrays,
    strided_rolling_window_agg,
    tumbling_windows_with_lookahead,
)

T, SKIP, CAP = 10, 3, 25
LENGTHS = {1: 60, 2: 25, 3: 12, 4: 3}  # 25/12/3 < T*SKIP=30 → pad path
N_FEATURES = 2


@pytest.fixture(scope="module")
def trajectories():
    rng = np.random.default_rng(42)
    return {
        tid: rng.uniform(1.0, 100.0, size=(length, N_FEATURES)).round(4)
        for tid, length in LENGTHS.items()
    }


@pytest.fixture(scope="module")
def long_df(spark, trajectories):
    rows = [
        (tid, t, float(a[t, 0]), float(a[t, 1]))
        for tid, a in trajectories.items()
        for t in range(a.shape[0])
    ]
    return spark.createDataFrame(rows, "series_id int, t int, f0 double, f1 double")


# ---------- NumPy oracles (independent restatement of the semantics) ----------

def np_pad_front_repeat(a: np.ndarray, target: int) -> np.ndarray:
    if a.shape[0] >= target:
        return a
    pad = np.repeat(a[:1, :], target - a.shape[0], axis=0)
    return np.concatenate([pad, a], axis=0)


def np_strided_windows_with_labels(a: np.ndarray, t: int, skip: int, cap: int):
    """windows[k] = a[k*skip : k*skip+t], label[k] = L - t - k*skip capped."""
    a = np_pad_front_repeat(a, t * skip)
    length = a.shape[0]
    n_windows = math.ceil((length - t + 1) / skip)
    windows = [a[k * skip : k * skip + t] for k in range(n_windows)]
    labels = [min(length - t - k * skip, cap) for k in range(n_windows)]
    return windows, labels


def np_rolling_windows(a: np.ndarray, t: int):
    if a.shape[0] < t:
        return []
    return [a[i : i + t] for i in range(a.shape[0] - t + 1)]


def np_tumbling_lookahead(a: np.ndarray, t: int, look_ahead: int):
    n = ((a.shape[0] - look_ahead) // t) * t
    x = a[:n].reshape(-1, t, a.shape[1])
    y = a[look_ahead : look_ahead + n].reshape(-1, t, a.shape[1])
    return x, y


def np_music_pad(a: np.ndarray, target: int) -> np.ndarray:
    out = np.zeros((target, a.shape[1]))
    if a.shape[0] >= target:
        out[:, :] = a[-target:, :]
    else:
        out[-a.shape[0] :, :] = a
    return out


# ---------------------------- tests ----------------------------

def test_w5_w2_w3_padded_strided_windows_and_labels(spark, long_df, trajectories):
    """Full-fidelity turbofan train windowing: pad → stride → label."""
    padded = pad_short_series_front_repeat_long(
        long_df, "series_id", "t", ["f0", "f1"], target_len=T * SKIP
    )
    arrays = rolling_window_arrays(padded, "series_id", "t", ["f0", "f1"], seq_len=T)
    strided = arrays.filter(((F.col("rn") - T) % SKIP) == 0)
    # rul label over the padded series
    from aidc_2018_timeseries_spark.operators.labels import rul_label

    labeled = rul_label(padded, "series_id", "t", cap=CAP).select("series_id", "t", "rul")
    got = {}
    for row in strided.collect():
        win = np.array([[e["f0"], e["f1"]] for e in row["window"]])
        got.setdefault(row["series_id"], []).append((row["rn"], win))
    rul_map = {(r["series_id"], r["t"]): r["rul"] for r in labeled.collect()}

    for tid, a in trajectories.items():
        want_windows, want_labels = np_strided_windows_with_labels(a, T, SKIP, CAP)
        got_wins = sorted(got.get(tid, []), key=lambda p: p[0])
        assert len(got_wins) == len(want_windows), f"series {tid} window count"
        padded_a = np_pad_front_repeat(a, T * SKIP)
        min_t = 0 - (padded_a.shape[0] - a.shape[0])  # pad rows get t < 0
        for k, (rn, win) in enumerate(got_wins):
            np.testing.assert_allclose(win, want_windows[k], rtol=1e-12)
            # label parity: window END row t = min_t + rn - 1
            end_t = min_t + rn - 1
            assert rul_map[(tid, end_t)] == want_labels[k], (tid, k)


def test_w1_rolling_window_count_and_contents(spark, long_df, trajectories):
    arrays = rolling_window_arrays(long_df, "series_id", "t", ["f0"], seq_len=T)
    got = {}
    for row in arrays.collect():
        win = np.array([e["f0"] for e in row["window"]])
        got.setdefault(row["series_id"], []).append((row["rn"], win))
    for tid, a in trajectories.items():
        want = np_rolling_windows(a[:, :1], T)
        wins = sorted(got.get(tid, []), key=lambda p: p[0])
        assert len(wins) == len(want), f"series {tid}: short series must emit none"
        for (rn, win), w in zip(wins, want):
            np.testing.assert_allclose(win, w.ravel(), rtol=1e-12)


def test_w2_window_count_formula(spark, long_df, trajectories):
    """ceil((L-T+1)/skip) without padding (series >= T only)."""
    strided = strided_rolling_window_agg(
        long_df, "series_id", "t", {"m": F.avg("f0")}, seq_len=T, skip=SKIP
    )
    counts = {r["series_id"]: r["n"] for r in strided.groupBy("series_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    for tid, length in LENGTHS.items():
        if length < T:
            assert tid not in counts
        else:
            assert counts[tid] == math.ceil((length - T + 1) / SKIP), tid


def test_w7_tumbling_lookahead(spark, long_df, trajectories):
    look = 4
    res = tumbling_windows_with_lookahead(
        long_df, "series_id", "t", "f0", seq_len=T, look_ahead=look
    )
    got = {}
    for r in res.collect():
        got.setdefault(r["series_id"], {}).setdefault(r["window_id"], {})[r["t_in_window"]] = (
            r["x"],
            r["y"],
        )
    for tid, a in trajectories.items():
        x, y = np_tumbling_lookahead(a[:, :1], T, look)
        if x.shape[0] == 0:
            assert tid not in got
            continue
        assert len(got[tid]) == x.shape[0], f"series {tid} window count"
        for wid in range(x.shape[0]):
            for ti in range(T):
                gx, gy = got[tid][wid][ti]
                assert gx == pytest.approx(x[wid, ti, 0], rel=1e-12)
                assert gy == pytest.approx(y[wid, ti, 0], rel=1e-12)


def test_w6_music_pad(spark, long_df, trajectories):
    target = 15
    arr = long_df.groupBy("series_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("t", "f0"))), lambda s: s["f0"]
        ).alias("a")
    )
    padded = arr.select(
        "series_id", pad_or_truncate_front_zero("a", target).alias("pa")
    ).collect()
    for row in padded:
        a = trajectories[row["series_id"]][:, :1]
        want = np_music_pad(a, target)
        np.testing.assert_allclose(np.array(row["pa"]), want.ravel(), rtol=1e-12)


def test_a1_per_key_max_scale(spark, long_df, trajectories):
    scaled = per_key_max_scale(long_df, "series_id", ["f0"]).collect()
    maxes = {tid: a[:, 0].max() for tid, a in trajectories.items()}
    for r in scaled:
        want = trajectories[r["series_id"]][r["t"], 0] / maxes[r["series_id"]]
        assert r["f0_scaled"] == pytest.approx(want, rel=1e-12)


def test_a2_array_window_zscore(spark, long_df, trajectories):
    arrays = rolling_window_arrays(long_df, "series_id", "t", ["f0"], seq_len=T)
    z = arrays.select(
        "series_id",
        "rn",
        array_window_zscore(F.transform("window", lambda s: s["f0"])).alias("z"),
    ).collect()
    for row in z:
        tid, rn = row["series_id"], row["rn"]
        win = trajectories[tid][rn - T : rn, 0]
        sigma = win.std()  # population, ddof=0 — matches reference np.std
        want = (win - win.mean()) / (1.0 if sigma <= 1e-9 else sigma)
        np.testing.assert_allclose(np.array(row["z"]), want, rtol=1e-9)


def test_constant_sensor_sigma_guard(spark):
    """σ ≤ eps → divide by 1 (reference turbofan.py:240)."""
    df = spark.createDataFrame(
        [(1, t, 7.5) for t in range(12)], "series_id int, t int, f0 double"
    )
    arrays = rolling_window_arrays(df, "series_id", "t", ["f0"], seq_len=T)
    z = arrays.select(
        array_window_zscore(F.transform("window", lambda s: s["f0"])).alias("z")
    ).collect()
    for row in z:
        assert all(v == 0.0 for v in row["z"])
