"""CombinedDetector — boolean-OR composition of detectors.

Reference: /root/reference/tsod/detectors.py:10-55. Where the reference
loops detectors sequentially (N full passes over the series,
detectors.py:43-49), this builds ONE lazy plan: every child appends its
flag column over the same per-series sort, then the flags OR-fold.
Catalyst collapses the shared scan and the identical window specs, so N
detectors cost one shuffle + one sort regardless of N — the headline
"declare the plan, let the optimizer fuse it" win (SURVEY §2.1 D8).

Implements the Sequence protocol like the reference (indexable, len).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..frame import TimeSeriesFrame
from .base import SparkDetector, as_tsf


class CombinedDetector(SparkDetector, Sequence):
    def __init__(self, detectors):
        super().__init__()
        for detector in detectors:
            if not isinstance(detector, SparkDetector):
                # message mirrors detectors.py:31-34
                raise ValueError(
                    f"{detector} is not a Detector. Did you forget to create "
                    "an instance, e.g. ConstantValueDetector()?"
                )
        self._detectors = list(detectors)

    def fit(self, data):
        tsf = as_tsf(data)
        for detector in self._detectors:  # fan-out, detectors.py:38-41
            detector.fit(tsf)
        return self

    def _attach(self, tsf: TimeSeriesFrame, out_col: str) -> DataFrame:
        flag_cols = []
        df = tsf.df
        for i, det in enumerate(self._detectors):
            c = self.tmp(f"flag{i}")
            df = det.detect(tsf.with_df(df), out_col=c)
            flag_cols.append(c)
        combined = reduce(lambda a, b: a | b, [F.col(c) for c in flag_cols])
        return df.withColumn(out_col, combined)

    # Sequence protocol (detectors.py:51-55)
    def __getitem__(self, index):
        return self._detectors[index]

    def __len__(self):
        return len(self._detectors)
