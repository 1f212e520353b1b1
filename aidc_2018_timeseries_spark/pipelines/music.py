"""Polyphonic-music dataset pipeline (``datasets/music.py``).

Input: long-format piano rolls (song_id, t, keys array<double> of 88
binary values). The reference pads/truncates every song to exactly
seq_len+1 timesteps (zeros at the FRONT, keep the LAST rows —
``music.py:37-45``) and emits teacher-forcing pairs X = rows[:T],
y = rows[1:T+1] (``music.py:22-28``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.padding import pad_or_truncate_front_zero


def music_dataset(
    df: DataFrame,
    key: str = "song_id",
    order: str = "t",
    keys_col: str = "keys",
    seq_len: int = 100,
    n_keys: int = 88,
) -> DataFrame:
    """One row per song: x = (T, n_keys) window, y = x shifted by one step.

    Output: (key, x array<array<double>>, y array<array<double>>), each of
    length exactly seq_len.
    """
    zero_row = F.array_repeat(F.lit(0.0), n_keys)
    per_song = df.groupBy(key).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(order, keys_col))), lambda s: s[keys_col]
        ).alias("rows")
    )
    padded = per_song.select(
        key, pad_or_truncate_front_zero("rows", seq_len + 1, zero=zero_row).alias("p")
    )
    return padded.select(
        key,
        F.slice("p", 1, seq_len).alias("x"),
        F.slice("p", 2, seq_len).alias("y"),
    )
