"""Differential tests for the pandas drop-in adapter: the reference's
own fit/detect-on-pd.Series call sites, executed through
``PandasDetectorAdapter`` on the Spark engine, must produce the exact
boolean Series the reference library produces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.test_differential_reference import make_pairs, random_series, ref_tsod  # noqa: F401


def ref_flags(ref_det, series):
    out = ref_det.detect(series)
    return [bool(v) for v in np.asarray(out)]


@pytest.mark.parametrize("seed", [7, 42])
def test_adapter_matches_reference(spark, ref_tsod, seed):  # noqa: F811
    from tsod_spark import PandasDetectorAdapter

    series = random_series(seed)
    for name, ref_det, our_det in make_pairs(ref_tsod):
        ours = PandasDetectorAdapter(our_det, spark).detect(series)
        assert isinstance(ours, pd.Series) and ours.dtype == bool
        assert list(ours.index) == list(series.index)
        assert ours.tolist() == ref_flags(ref_det, series), name


def test_adapter_fit_then_detect(spark, ref_tsod):  # noqa: F811
    """fit on one series, detect on another — the reference's two-phase
    workflow (docs/getting_started.rst:20-36) through the adapter."""
    from tsod_spark import DiffDetector, PandasDetectorAdapter

    train = random_series(11, n=50, nan_frac=0.05)
    test = random_series(12, n=50, nan_frac=0.05)
    ref_det = ref_tsod.DiffDetector().fit(train)
    ours = PandasDetectorAdapter(DiffDetector(), spark).fit(train).detect(test)
    assert ours.tolist() == ref_flags(ref_det, test)


def test_adapter_positional_index(spark):
    """A non-datetime index is positional: synthetic uniform timestamps,
    result aligned on the caller's own index."""
    from tsod_spark import PandasDetectorAdapter, RangeDetector

    s = pd.Series([1.0, 99.0, np.nan, 5.0], index=["a", "b", "c", "d"])
    out = PandasDetectorAdapter(RangeDetector(0.0, 10.0), spark).detect(s)
    assert list(out.index) == ["a", "b", "c", "d"]
    # NaN never flagged, out-of-range flagged
    assert out.tolist() == [False, True, False, False]


def test_adapter_rejects_non_series(spark):
    from tsod_spark import PandasDetectorAdapter, RangeDetector
    from tsod_spark.exceptions import WrongInputDataTypeError

    with pytest.raises(WrongInputDataTypeError):
        PandasDetectorAdapter(RangeDetector(0.0, 1.0), spark).detect([1, 2, 3])
