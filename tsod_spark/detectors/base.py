"""Detector base class — the Spark replacement for the reference ABC.

Reference template (/root/reference/tsod/base.py:25-104):
``fit = validate -> _fit`` and ``detect = validate -> _detect ->
_postprocess``. Here the same template produces *lazy plans*:

- ``fit(tsf)`` runs a tiny aggregation job and stores 1-2 scalars per
  series (the reference's learned state, SURVEY §1.1). With a ``series``
  key the params live in a small DataFrame that detect() broadcast-joins
  back — never a shuffle of the big side.
- ``detect(tsf)`` appends an ``is_anomaly BOOLEAN`` column to a lazy
  DataFrame; nothing executes until the caller acts. All detectors window
  over the same ``partitionBy(series).orderBy(ts)`` spec, so Catalyst
  plans exactly one Exchange+Sort no matter how many detectors compose.
- ``fit_detect(tsf)`` is the single-pass variant (threshold as a
  whole-partition window aggregate) for fit-and-detect-on-same-data,
  which is also what the SQL oracle can express directly.
"""

from __future__ import annotations

import abc
import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..exceptions import WrongInputDataTypeError
from ..frame import TimeSeriesFrame

_ids = itertools.count()


def as_tsf(data) -> TimeSeriesFrame:
    """Input gate, mirroring Detector.validate (/root/reference/tsod/base.py:74-80)."""
    if isinstance(data, TimeSeriesFrame):
        return data
    if isinstance(data, DataFrame):
        return TimeSeriesFrame(data)
    raise WrongInputDataTypeError()


class SparkDetector(abc.ABC):
    """Abstract base for all detectors (cf. /root/reference/tsod/base.py:25)."""

    def __init__(self):
        self._uid = f"d{next(_ids)}"
        self._params: dict[str, float] | None = None
        self._params_df: DataFrame | None = None

    # -- naming ---------------------------------------------------------
    def tmp(self, name: str) -> str:
        return f"__{self._uid}_{name}"

    def p(self, name: str) -> Column:
        """Fitted-parameter accessor: literal (global fit) or joined column
        (per-series fit)."""
        if self._params_df is not None:
            return F.col(self.tmp(name))
        if self._params is not None and name in self._params:
            return F.lit(self._params[name])
        raise KeyError(name)

    # -- public template ------------------------------------------------
    def fit(self, data) -> "SparkDetector":
        """Learn parameters from normal data (cf. base.py:31-41).

        With a series key, parameters are learned per series and kept in
        a small params DataFrame; otherwise collected to driver scalars.
        """
        tsf = as_tsf(data)
        self._fit(tsf)
        return self

    def _fit(self, tsf: TimeSeriesFrame) -> None:
        # Default is a no-op, like /root/reference/tsod/base.py:43-45.
        return None

    def detect(self, data, out_col: str = "is_anomaly") -> DataFrame:
        """Append a boolean anomaly column; True == anomaly (base.py:47-63)."""
        tsf = as_tsf(data)
        keep = set(tsf.df.columns) | {out_col}
        if self._params_df is not None:
            joined = tsf.df.join(F.broadcast(self._params_df), on=tsf.series, how="left")
            tsf = tsf.with_df(joined)
        out = self._attach(tsf, out_col)
        out = out.drop(*[c for c in out.columns if c not in keep])
        return self._postprocess(out, out_col)

    def _postprocess(self, df: DataFrame, out_col: str) -> DataFrame:
        # Hook kept from base.py:65-67 (a no-op TODO in the reference).
        return df

    @abc.abstractmethod
    def _attach(self, tsf: TimeSeriesFrame, out_col: str) -> DataFrame:
        """Build the lazy plan appending ``out_col`` (temps allowed)."""

    # -- per-series fit plumbing ----------------------------------------
    def _store_fit(self, tsf: TimeSeriesFrame, aggs: dict[str, Column]) -> None:
        """Run the fit aggregation; store scalars (no series) or a small
        per-series params DataFrame (broadcast at detect time)."""
        named = [v.alias(self.tmp(k)) for k, v in aggs.items()]
        if tsf.series:
            self._params_df = tsf.df.groupBy(*tsf.series).agg(*named)
            self._params = None
        else:
            row = tsf.df.agg(*named).first()
            self._params = {k: row[self.tmp(k)] for k in aggs}
            self._params_df = None

    # -- misc -----------------------------------------------------------
    def __str__(self):
        return self.__class__.__name__
