"""Expression builders shared by every detector.

These encode the two semantics traps identified in SURVEY.md §1.3 /
§4.2:

1. **NaN vs NULL.** The reference's kernels are numpy/pandas where a
   comparison against NaN is False, so NaN points are never flagged
   (/root/reference/tests/test_detectors.py:43-45). In Spark SQL,
   ``NaN > x`` is TRUE (NaN sorts greatest) — a naive translation flags
   every NaN as a range anomaly. We therefore normalize NaN -> NULL on
   ingest and wrap every anomaly predicate in ``coalesce(pred, FALSE)``.

2. **Gradient time deltas.** ``pandas .diff().dt.total_seconds()``
   (/root/reference/tsod/base.py:85) becomes exact integer microsecond
   arithmetic divided by 1e6 so Spark and any SQL oracle produce
   bit-identical doubles.

Everything here is pure Column algebra — JVM-side, whole-stage
codegen-friendly, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nan_to_null(col: Column | str) -> Column:
    """Normalize floating NaN to NULL (SURVEY §1.3 trap #1)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.isnan(c), F.lit(None)).otherwise(c)


def as_pred(col: Column) -> Column:
    """NULL-safe anomaly predicate: missing data is never an anomaly.

    Reproduces numpy's ``NaN <op> x == False`` semantics
    (/root/reference/tests/test_detectors.py:43-45).
    """
    return F.coalesce(col, F.lit(False))


def seconds_between(ts: Column, prev_ts: Column) -> Column:
    """Elapsed seconds as an exact double: (micros - micros)/1e6.

    Matches ``index.to_series().diff().dt.total_seconds()``
    (/root/reference/tsod/base.py:85) bit-for-bit for microsecond
    timestamps.
    """
    return (F.unix_micros(ts) - F.unix_micros(prev_ts)) / F.lit(1000000.0)


def guarded_dt(dt: Column, strict: bool) -> Column:
    """Optionally raise when timestamps are non-increasing.

    The reference raises ``ValueError("Index must be monotonically
    increasing")`` when any dt < 1e-15 (/root/reference/tsod/base.py:86-87).
    Implemented as an inline CASE WHEN + raise_error so validation costs
    no extra pass over the data.
    """
    if not strict:
        return dt
    return F.when(
        dt < F.lit(1e-15),
        F.raise_error(F.lit("Index must be monotonically increasing")).cast("double"),
    ).otherwise(dt)


def array_median(sorted_arr: Column) -> Column:
    """Exact median of an already-sorted DOUBLE array (NULL-free).

    Linear interpolation between the two middle elements for even
    sizes — identical to ``np.nanmedian`` on the non-NaN values
    (/root/reference/tsod/hampel.py:52-53) and to SQL ``median``/
    ``quantile_cont(0.5)``.
    """
    n = F.size(sorted_arr)
    mid = (n / 2).cast("int")
    odd = F.element_at(sorted_arr, ((n + 1) / 2).cast("int"))
    even = (F.element_at(sorted_arr, mid) + F.element_at(sorted_arr, mid + 1)) / 2.0
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        F.when(n % 2 == 1, odd).otherwise(even)
    )
