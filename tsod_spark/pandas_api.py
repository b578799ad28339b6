"""pandas drop-in adapter — the reference's ``pd.Series`` workflow on Spark.

Reference usage (/root/reference/docs/getting_started.rst:20-36):

    detector = RangeDetector(min_value=0, max_value=50)
    detector.fit(normal_series)          # pd.Series in
    anomalies = detector.detect(series)  # boolean pd.Series out

``PandasDetectorAdapter`` gives any :class:`~tsod_spark.detectors.base.
SparkDetector` that exact surface, so a reference user can switch
engines without rewriting call sites. This is deliberately the
reference-parity *small-data mode*: a ``pd.Series`` fits in driver
memory by construction, so shipping it to Spark and collecting ONE
boolean column back is bounded by the input the caller already holds.
Anything bigger should use the native API (``TimeSeriesFrame`` +
``detector.detect``) and stay lazy/distributed end-to-end.

Semantics preserved from the reference:

- input must be a ``pandas.Series`` (``WrongInputDataTypeError``
  otherwise, /root/reference/tsod/base.py:74-80);
- NaN values are never flagged (normalized to NULL at wrap time,
  /root/reference/tests/test_detectors.py:43-45);
- the result is a boolean Series aligned 1:1 on the input's own index
  (/root/reference/tsod/base.py:56-58) — alignment rides an explicit
  row-id column, not a re-sort, so ties and exotic indexes round-trip.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .exceptions import WrongInputDataTypeError
from .frame import TimeSeriesFrame

_RID = "__pdadapter_rid"


def series_to_frame(spark: SparkSession, series) -> TimeSeriesFrame:
    """Wrap a ``pd.Series`` as a TimeSeriesFrame (with a row-id column).

    A ``DatetimeIndex`` becomes the ``ts`` column. Any other index gets
    synthetic 1-second-spaced timestamps in input order — positional
    semantics, matching how the reference's non-gradient detectors
    treat a value-only series.
    """
    import pandas as pd

    if not isinstance(series, pd.Series):
        raise WrongInputDataTypeError()
    if isinstance(series.index, pd.DatetimeIndex):
        idx = series.index
        if idx.tz is not None:
            idx = idx.tz_convert("UTC").tz_localize(None)
        stamps = [ts.to_pydatetime() for ts in idx]
    else:
        epoch = _dt.datetime(2000, 1, 1)
        stamps = [epoch + _dt.timedelta(seconds=i) for i in range(len(series))]
    rows = [
        (i, ts, float(v)) for i, (ts, v) in enumerate(zip(stamps, series.to_numpy()))
    ]
    df = spark.createDataFrame(rows, f"{_RID} bigint, ts timestamp, value double")
    return TimeSeriesFrame(df, tiebreak=[_RID])


class PandasDetectorAdapter:
    """fit/detect over ``pd.Series``, executing on the Spark engine."""

    def __init__(self, detector, spark: SparkSession | None = None):
        self.detector = detector
        self.spark = spark or SparkSession.getActiveSession()
        if self.spark is None:
            raise ValueError("no active SparkSession; pass one explicitly")

    def fit(self, series) -> "PandasDetectorAdapter":
        self.detector.fit(series_to_frame(self.spark, series))
        return self

    def detect(self, series, out_col: str = "is_anomaly"):
        import pandas as pd

        tsf = series_to_frame(self.spark, series)
        rows = (
            self.detector.detect(tsf, out_col=out_col)
            .select(_RID, out_col)
            .collect()
        )
        flags = [False] * len(series)
        for r in rows:
            flags[r[_RID]] = bool(r[out_col]) if r[out_col] is not None else False
        return pd.Series(flags, index=series.index, name=out_col)

    def fit_detect(self, series, out_col: str = "is_anomaly"):
        return self.fit(series).detect(series, out_col=out_col)

    def __str__(self):
        return f"PandasDetectorAdapter({self.detector})"
