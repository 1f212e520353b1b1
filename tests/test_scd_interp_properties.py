"""Property-based tests (hypothesis) for the SCD2 compaction and the
linear-interpolation resample — invariants that must hold for ANY input,
beyond the fixed-corpus oracle parity:

SCD2: intervals tile each key's observed timeline — valid_from strictly
increasing, valid_to equals the next valid_from (NULL only on the last),
consecutive intervals never share an attribute, and n_obs sums to the
key's row count.

Interpolation: observed buckets keep their exact value; every gap bucket
lies strictly between its neighbouring observed buckets in time and
within [min, max] of their values (a linear blend can't overshoot).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aidc_2018_timeseries_spark.operators.resample import resample_linear_interp
from aidc_2018_timeseries_spark.operators.scd import scd2_compact

_BUCKET_US = 1000


@st.composite
def change_stream(draw):
    n_keys = draw(st.integers(1, 3))
    rows = []
    for k in range(n_keys):
        n = draw(st.integers(1, 12))
        ts = sorted(
            draw(
                st.lists(
                    st.integers(0, 10_000), min_size=n, max_size=n, unique=True
                )
            )
        )
        for i, t in enumerate(ts):
            attr = draw(st.sampled_from(["a", "b", "c"]))
            rows.append((k, t, i, attr))
    return rows


@given(change_stream())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_intervals_tile_the_timeline(spark, rows):
    df = spark.createDataFrame(rows, "key long, t long, tb long, attr string")
    out = scd2_compact(df, "key", "t", "attr", "tb").collect()
    per_key: dict[int, list] = {}
    for r in out:
        per_key.setdefault(r["key"], []).append(r)
    raw_counts: dict[int, int] = {}
    for k, _t, _tb, _a in rows:
        raw_counts[k] = raw_counts.get(k, 0) + 1
    assert set(per_key) == set(raw_counts)
    for k, ivs in per_key.items():
        ivs.sort(key=lambda r: r["run_id"])
        assert [r["run_id"] for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(r["n_obs"] for r in ivs) == raw_counts[k]
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]  # tiling, no gaps
            assert a["valid_from"] < b["valid_from"]
            assert a["attr"] != b["attr"]  # runs are maximal
        assert ivs[-1]["valid_to"] is None


@st.composite
def sparse_series(draw):
    n_keys = draw(st.integers(1, 2))
    rows = []
    for k in range(n_keys):
        n = draw(st.integers(1, 8))
        # ns timestamps; spread so gap buckets actually occur
        ts = sorted(
            draw(
                st.lists(
                    st.integers(0, 40).map(lambda b: b * _BUCKET_US * 1000),
                    min_size=n,
                    max_size=n,
                    unique=True,
                )
            )
        )
        for i, t in enumerate(ts):
            v = draw(st.floats(-100, 100, allow_nan=False, width=32))
            rows.append((k, t, i, float(v)))
    return rows


@given(sparse_series())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interp_bounded_by_neighbours(spark, rows):
    df = spark.createDataFrame(rows, "key long, ts long, tb long, v double")
    out = resample_linear_interp(df, "key", "ts", "v", _BUCKET_US, "tb").collect()
    # exact value at observed buckets (last observation in bucket wins)
    observed: dict[tuple, float] = {}
    for k, t, tb, v in rows:
        b = (t // 1000) - ((t // 1000) % _BUCKET_US)
        cur = observed.get((k, b))
        if cur is None or (t, tb) > cur[0]:
            observed[(k, b)] = ((t, tb), v)
    per_key: dict[int, list] = {}
    for r in out:
        per_key.setdefault(r["key"], []).append(r)
    for k, grid in per_key.items():
        grid.sort(key=lambda r: r["bucket_start_us"])
        obs_pts = [
            (r["bucket_start_us"], r["value"]) for r in grid if r["is_observed"] == 1
        ]
        for r in grid:
            key = (k, r["bucket_start_us"])
            if r["is_observed"] == 1:
                assert r["value"] == observed[key][1]
            else:
                prev = max(p for p in obs_pts if p[0] < r["bucket_start_us"])
                nxt = min(p for p in obs_pts if p[0] > r["bucket_start_us"])
                lo, hi = min(prev[1], nxt[1]), max(prev[1], nxt[1])
                assert lo - 1e-9 <= r["value"] <= hi + 1e-9
