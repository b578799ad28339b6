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
