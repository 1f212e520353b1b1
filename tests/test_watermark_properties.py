"""Property-based check of the watermark recurrence (hypothesis): for ANY
arrival-batch assignment, event times, delay, and filter lag, the
distributed restatement must equal a driver-side fold of the definition.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aidc_2018_timeseries_spark.streaming.watermark import flag_late_events

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # t (µs, small domain)
        st.integers(min_value=0, max_value=5),  # arrival batch
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None)
@given(rows=_rows, delay=st.integers(min_value=0, max_value=5_000), lag=st.integers(0, 2))
def test_flag_late_matches_definition(spark, rows, delay, lag):
    df = spark.createDataFrame(
        [(i, t, b) for i, (t, b) in enumerate(rows)],
        "event_id long, t_us long, arrival_batch long",
    )
    got = {
        r.event_id: (r.watermark_us, r.is_late)
        for r in flag_late_events(df, "t_us", delay, filter_lag=lag).collect()
    }

    # definition: wm(b) = max t over batches < b - lag, minus delay
    batch_max: dict[int, int] = {}
    for t, b in rows:
        batch_max[b] = max(batch_max.get(b, t), t)
    want = {}
    for i, (t, b) in enumerate(rows):
        prior = [m for bb, m in batch_max.items() if bb <= b - 1 - lag]
        wm = (max(prior) - delay) if prior else None
        want[i] = (wm, wm is not None and t < wm)
    assert got == want
