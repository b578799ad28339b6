"""Feature transforms — lag matrices and windowed training tensors.

Reference: /root/reference/tsod/features.py. These feed MLlib models
(the reference's "advanced detectors" vision, README.md:43).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .detectors.base import as_tsf


def lag_time_series(data, lags) -> DataFrame:
    """One column per lag, named str(lag) (features.py:5-23).

    pandas ``shift(k)`` pulls the value k rows back -> ``F.lag(v, k)``;
    negative lags pull from the future -> ``F.lead``.
    """
    tsf = as_tsf(data)
    w = tsf.w()
    cols = list(tsf.df.columns)
    for k in lags:
        shifted = F.lag(tsf.value, k).over(w) if k >= 0 else F.lead(tsf.value, -k).over(w)
        cols.append(shifted.alias(str(k)))
    return tsf.df.select(*cols)


def create_dataset(data, time_steps: int = 1, y_col: str | None = None) -> DataFrame:
    """Sliding-window tensorize (features.py:26-32).

    pandas: ``Xs[i] = X[i : i+T]``, ``ys[i] = y[i+T]``. Re-indexed on the
    target row j = i+T: ``X = values[j-T .. j-1]`` (trailing exclusive
    window), ``y = y[j]`` — so the whole tensorization is one
    ``collect_list`` over ``rowsBetween(-T, -1)`` plus a completeness
    filter, returning an ArrayType(Double) feature column ready for
    MLlib. Deliberate delta vs the reference: windows containing missing
    values are dropped by the completeness filter (the reference emits
    NaN-bearing tensors, which no downstream model can consume anyway).
    """
    tsf = as_tsf(data)
    w = tsf.w()
    y = F.col(y_col) if y_col else tsf.value
    df = tsf.df.withColumn(
        "features", F.collect_list(tsf.value).over(w.rowsBetween(-time_steps, -1))
    ).withColumn("y", y)
    return df.where(F.size("features") == time_steps)
