"""DIFFERENTIAL tests: run the actual reference library (imported
read-only from /root/reference with its missing optional deps stubbed)
and our Spark engine on the same random series, and assert identical
anomaly flags.

This is ground truth — not our reading of the reference, the reference
itself. joblib (persistence-only) and numba (@jit wrapper around a
pure-python kernel) are replaced with inert stubs; neither affects
detection semantics.
"""

from __future__ import annotations

import datetime as dt
import sys
import types

import numpy as np
import pytest


@pytest.fixture(scope="module")
def ref_tsod():
    if "joblib" not in sys.modules:
        jb = types.ModuleType("joblib")
        jb.dump = lambda *a, **k: None
        jb.load = lambda *a, **k: None
        sys.modules["joblib"] = jb
    if "numba" not in sys.modules:
        nb = types.ModuleType("numba")

        def jit(*a, **k):
            def deco(f):
                return f

            return deco

        nb.jit = jit
        nb.prange = range
        sys.modules["numba"] = nb
    sys.path.insert(0, "/root/reference")
    import tsod

    return tsod


def random_series(seed: int, n: int = 60, nan_frac: float = 0.1):
    import pandas as pd

    rng = np.random.default_rng(seed)
    vals = rng.normal(10, 5, n).round(3)
    vals[rng.random(n) < 0.1] += rng.choice([-60, 60])  # planted jumps
    run = rng.integers(5, n - 10)
    vals[run : run + 5] = vals[run]  # planted constant run
    vals[rng.random(n) < nan_frac] = np.nan
    # irregular but strictly increasing timestamps (exercises gradients)
    steps = rng.integers(1, 120, n).cumsum()
    idx = pd.to_datetime("2020-01-01") + pd.to_timedelta(steps, unit="m")
    return pd.Series(vals, index=idx)


def spark_flags(spark, det, series):
    from tsod_spark.frame import TimeSeriesFrame

    rows = [
        (ts.to_pydatetime(), float(v)) for ts, v in series.items()
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = det.detect(TimeSeriesFrame(df)).orderBy("ts").select("is_anomaly").collect()
    return [bool(r[0]) for r in out]


def _ref_hampel(ref):
    # not exported from tsod/__init__ (reference keeps it in tsod.hampel)
    from tsod.hampel import HampelDetector

    return HampelDetector


def make_pairs(ref):
    import tsod_spark as ours

    return [
        ("range", ref.RangeDetector(2.0, 25.0), ours.RangeDetector(2.0, 25.0)),
        ("diff", ref.DiffDetector(30.0), ours.DiffDetector(30.0)),
        ("gradient", ref.GradientDetector(0.05), ours.GradientDetector(0.05)),
        (
            "rolling_std",
            ref.RollingStandardDeviationDetector(10, 12.0),
            ours.RollingStandardDeviationDetector(10, 12.0),
        ),
        (
            "constant_value",
            ref.ConstantValueDetector(3, 0.01),
            ours.ConstantValueDetector(3, 0.01),
        ),
        (
            "constant_gradient",
            ref.ConstantGradientDetector(3),
            ours.ConstantGradientDetector(3),
        ),
        ("hampel", _ref_hampel(ref)(5, 3), ours.HampelDetector(5, 3)),
        (
            "combined",
            ref.CombinedDetector(
                [ref.RangeDetector(2.0, 25.0), ref.DiffDetector(30.0)]
            ),
            ours.CombinedDetector(
                [ours.RangeDetector(2.0, 25.0), ours.DiffDetector(30.0)]
            ),
        ),
    ]


def spark_fit_detect(spark, det, train, test):
    from tsod_spark.frame import TimeSeriesFrame

    def tsf(series):
        rows = [(ts.to_pydatetime(), float(v)) for ts, v in series.items()]
        return TimeSeriesFrame(
            spark.createDataFrame(rows, "ts timestamp, value double")
        )

    det = det.fit(tsf(train))
    out = det.detect(tsf(test)).orderBy("ts").select("is_anomaly").collect()
    return [bool(r[0]) for r in out]


@pytest.mark.parametrize("seed", [3, 99])
def test_fit_detect_chains_match_reference(spark, ref_tsod, seed):
    """fit() semantics have the reference's quirks baked in (signed max
    diff, trailing fit window vs centered detect window, nanquantile
    bounds) — differential-test the whole fit->detect chain."""
    import tsod_spark as ours

    train = random_series(seed, n=50, nan_frac=0.05)
    test = random_series(seed + 1, n=50, nan_frac=0.05)
    pairs = [
        (
            "range_quantile_fit",
            ref_tsod.RangeDetector(quantiles=[0.05, 0.95]),
            ours.RangeDetector(quantiles=[0.05, 0.95]),
        ),
        ("diff_fit", ref_tsod.DiffDetector(), ours.DiffDetector()),
        ("gradient_fit", ref_tsod.GradientDetector(), ours.GradientDetector()),
        (
            "rolling_std_fit",
            ref_tsod.RollingStandardDeviationDetector(10),
            ours.RollingStandardDeviationDetector(10),
        ),
    ]
    failures = []
    for name, ref_det, our_det in pairs:
        expected = np.asarray(ref_det.fit(train).detect(test), dtype=bool).tolist()
        got = spark_fit_detect(spark, our_det, train, test)
        if expected != got:
            diffs = [i for i, (e, g) in enumerate(zip(expected, got)) if e != g]
            failures.append(f"{name}: {len(diffs)} diffs at {diffs[:5]}")
    assert not failures, f"seed={seed}: " + "; ".join(failures)


def test_degenerate_series_match_reference(spark, ref_tsod):
    """Edge profiles: all-constant, heavy-NaN, shorter than the window."""
    import pandas as pd

    import tsod_spark as ours

    profiles = {
        "constant": pd.Series(
            [5.0] * 12, index=pd.date_range("2020-01-01", periods=12, freq="h")
        ),
        "mostly_nan": pd.Series(
            [np.nan, 1.0, np.nan, np.nan, 2.0, np.nan, np.nan, np.nan],
            index=pd.date_range("2020-01-01", periods=8, freq="h"),
        ),
        "short": pd.Series(
            [1.0, 100.0, 1.0], index=pd.date_range("2020-01-01", periods=3, freq="h")
        ),
    }
    failures = []
    for pname, series in profiles.items():
        for name, ref_det, our_det in make_pairs(ref_tsod):
            expected = np.asarray(ref_det.detect(series), dtype=bool).tolist()
            got = spark_flags(spark, our_det, series)
            if expected != got:
                failures.append(f"{pname}/{name}")
    assert not failures, failures


@pytest.mark.parametrize("seed", [7, 42, 1234])
def test_all_detectors_match_reference(spark, ref_tsod, seed):
    series = random_series(seed)
    failures = []
    for name, ref_det, our_det in make_pairs(ref_tsod):
        expected = np.asarray(ref_det.detect(series), dtype=bool).tolist()
        got = spark_flags(spark, our_det, series)
        if expected != got:
            diffs = [i for i, (e, g) in enumerate(zip(expected, got)) if e != g]
            failures.append(f"{name}: {len(diffs)} diffs at {diffs[:5]}")
    assert not failures, f"seed={seed}: " + "; ".join(failures)
