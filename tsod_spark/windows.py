"""Row-count window builders with pandas-exact edge semantics.

Centralizes the offsets verified in SURVEY.md §4.2(1) so every
detector agrees with pandas:

- centered window of size ``n`` spans ``[i - n//2, i + n - n//2 - 1]``
  (even windows lean left, verified against ``pandas.rolling(center=True)``);
- trailing window of size ``n`` spans ``[i - (n-1), i]``;
- pandas ``min_periods`` defaults to the window size for fixed windows
  and counts *non-NaN* observations — emulated with a ``count(value)``
  guard over the same frame (NaN was normalized to NULL on ingest, and
  SQL ``count(col)`` skips NULLs).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def centered_bounds(n: int) -> tuple[int, int]:
    """Frame offsets for ``pandas.rolling(n, center=True)``."""
    return (-(n // 2), n - n // 2 - 1)


def trailing_bounds(n: int) -> tuple[int, int]:
    """Frame offsets for ``pandas.rolling(n)`` (trailing)."""
    return (-(n - 1), 0)


def framed(w: WindowSpec, bounds: tuple[int, int]) -> WindowSpec:
    return w.rowsBetween(bounds[0], bounds[1])


def rolling_agg(
    agg: Column,
    value: Column,
    w: WindowSpec,
    bounds: tuple[int, int],
    min_periods: int,
) -> Column:
    """``agg`` over the frame, NULL unless >= min_periods non-NULL values.

    ``agg`` must already be windowed over ``framed(w, bounds)``; this
    wraps it with the pandas min_periods guard.
    """
    fw = framed(w, bounds)
    return F.when(F.count(value).over(fw) >= F.lit(min_periods), agg).otherwise(
        F.lit(None)
    )


def rolling(
    fn,
    value: Column,
    w: WindowSpec,
    n: int,
    center: bool = False,
    min_periods: int | None = None,
) -> Column:
    """pandas ``value.rolling(n, center=center).fn()`` as a Column.

    ``fn`` is a pyspark aggregate (e.g. ``F.stddev_samp``, ``F.max``).
    ``min_periods`` defaults to ``n`` like pandas fixed windows.
    """
    bounds = centered_bounds(n) if center else trailing_bounds(n)
    mp = n if min_periods is None else min_periods
    fw = framed(w, bounds)
    return rolling_agg(fn(value).over(fw), value, w, bounds, mp)
