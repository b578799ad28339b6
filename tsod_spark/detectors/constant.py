"""ConstantValueDetector & ConstantGradientDetector.

Reference: /root/reference/tsod/detectors.py:222-279. The pipeline
(detect kernel :237-251) is:

1. centered rolling nanmax/nanmin over ``window_size`` rows, pandas
   min_periods semantics (NaN-bearing windows -> not flagged, verified
   against the F-CONSTVAL golden);
2. core flag: ``|max - min| < threshold``;
3. first/last row of the series forced False (:241-242);
4. **dilation** by one position each way (:243-249) — done *after* the
   edge masking, so dilation may legitimately re-flag row 0 / row n-1.

ConstantGradientDetector (:257-276) runs the same pipeline on the
gradient computed with periods=+1 and periods=-1 and ORs the results —
flagging stretches of linear interpolation.

Scale notes: everything is lag/lead/min/max over the one shared
per-series sort; no extra shuffle beyond the series partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..expressions import as_pred
from ..frame import TimeSeriesFrame
from ..windows import rolling
from .base import SparkDetector, as_tsf
from .gradient import gradient_col


def constant_run_flag(
    tsf: TimeSeriesFrame, value: Column, window_size: int, threshold: float
) -> tuple[Column, Column]:
    """Steps 1-3 above as (core_masked, needs_second_projection_marker).

    Returns the edge-masked core flag; the ±1 dilation needs lag/lead of
    this flag, i.e. a second window projection — see the detector.
    """
    w = tsf.w()
    mx = rolling(F.max, value, w, window_size, center=True)
    mn = rolling(F.min, value, w, window_size, center=True)
    core = as_pred(F.abs(mx - mn) < F.lit(float(threshold)))
    rn = F.row_number().over(w)
    cnt = F.count(F.lit(1)).over(tsf.w_all())
    return core & (rn != 1) & (rn != cnt), rn


def dilate(flag: Column, w) -> Column:
    """±1-row dilation: flag OR lag(flag) OR lead(flag) (detectors.py:243-249)."""
    return as_pred(flag | F.lag(flag).over(w) | F.lead(flag).over(w))


class ConstantValueDetector(SparkDetector):
    def __init__(self, window_size: int = 3, threshold: float = 1e-7):
        super().__init__()
        self._window_size = window_size
        self._threshold = threshold

    def _attach(self, tsf: TimeSeriesFrame, out_col: str) -> DataFrame:
        core_col = self.tmp("core")
        core, _ = constant_run_flag(tsf, tsf.value, self._window_size, self._threshold)
        df = tsf.df.withColumn(core_col, core)
        tsf2 = tsf.with_df(df)
        return df.withColumn(out_col, dilate(F.col(core_col), tsf2.w()))

    def __str__(self):
        return f"{self.__class__.__name__}({self._window_size}, {self._threshold})"


class ConstantGradientDetector(ConstantValueDetector):
    """Constant-*gradient* runs: linear interpolation artifacts."""

    def __init__(self, window_size: int = 3):
        super().__init__(window_size=window_size)

    def _attach(self, tsf: TimeSeriesFrame, out_col: str) -> DataFrame:
        gf_col, gb_col = self.tmp("gf"), self.tmp("gb")
        cf_col, cb_col = self.tmp("cf"), self.tmp("cb")
        df = tsf.df.withColumn(gf_col, gradient_col(tsf, periods=1)).withColumn(
            gb_col, gradient_col(tsf, periods=-1)
        )
        tsf2 = tsf.with_df(df)
        core_f, _ = constant_run_flag(tsf2, F.col(gf_col), self._window_size, self._threshold)
        core_b, _ = constant_run_flag(tsf2, F.col(gb_col), self._window_size, self._threshold)
        df = df.withColumn(cf_col, core_f).withColumn(cb_col, core_b)
        tsf3 = tsf2.with_df(df)
        w = tsf3.w()
        return df.withColumn(out_col, dilate(F.col(cf_col), w) | dilate(F.col(cb_col), w))

    def __str__(self):
        return f"{self.__class__.__name__}({self._window_size})"
