"""Array pad / truncate operators (SURVEY §2.3 W5, W6).

The two pad rules are intentionally DIFFERENT (SURVEY §7 trap):
- turbofan W5 left-pads by REPEATING THE FIRST ROW to a target length
  (reference ``turbofan.py:133-138``),
- music W6 left-pads with ZEROS / left-TRUNCATES to exactly seq_len+1
  (reference ``music.py:37-45``).

Both are pure higher-order array expressions — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pad_front_repeat_first(arr: Column | str, target_len: int) -> Column:
    """W5: if len(arr) < target_len, prepend copies of arr[0]; else keep.

    Reference: ``np.pad(..., mode='edge')`` on the time axis
    (``turbofan.py:133-138``, triggered when L < seq_len * skip).
    """
    a = _c(arr)
    pad_n = F.greatest(F.lit(target_len) - F.size(a), F.lit(0))
    pad = F.transform(F.sequence(F.lit(1), pad_n), lambda _: F.element_at(a, 1))
    return F.when(F.size(a) >= target_len, a).otherwise(F.concat(pad, a))


def pad_or_truncate_front_zero(arr: Column | str, target_len: int, zero: Column | None = None) -> Column:
    """W6: force length exactly target_len — longer keeps the LAST rows,
    shorter zero-pads at the FRONT (reference ``music.py:37-45``).

    ``zero`` is the fill element (default 0.0d; pass e.g. an
    ``array_repeat(lit(0.0), 88)`` for piano-roll rows).
    """
    a = _c(arr)
    z = F.lit(0.0) if zero is None else zero
    tail = F.slice(a, -target_len, target_len)  # last target_len elements
    pad_n = F.lit(target_len) - F.size(a)
    pad = F.transform(F.sequence(F.lit(1), pad_n), lambda _: z)
    return F.when(F.size(a) >= target_len, tail).otherwise(F.concat(pad, a))
