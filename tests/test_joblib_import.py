"""One-way joblib import: reference-era saved detectors migrate in.

The reference persists whole detector objects with joblib
(/root/reference/tsod/base.py:95-104; golden fixture
tests/data/combined.joblib round-tripped in its test_persistence.py).
Our engine refuses to execute pickles: ``import_joblib`` decodes them
with a restricted unpickler (tsod classes become inert attribute bags,
only numpy scalar reconstruction is whitelisted) and rebuilds the
equivalent Spark detectors.
"""

import pickle
import sys
import types

import numpy as np
import pandas as pd
import pytest

from tsod_spark.persistence import import_joblib, save, load

GOLDEN = "/root/reference/tests/data/combined.joblib"


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


def test_golden_fixture_imports():
    """The reference repo's own committed .joblib loads into our
    detector classes with its exact parameters."""
    det = import_joblib(GOLDEN)
    from tsod_spark.detectors import (
        CombinedDetector,
        ConstantValueDetector,
        RangeDetector,
    )

    assert isinstance(det, CombinedDetector)
    kids = list(det)
    assert isinstance(kids[0], ConstantValueDetector)
    assert kids[0]._window_size == 5 and kids[0]._threshold == pytest.approx(1e-7)
    assert isinstance(kids[1], RangeDetector)
    assert kids[1]._min == -np.inf and kids[1]._max == 2.0


def test_golden_import_detects(spark):
    """Imported golden detector actually runs: values above 2.0 flag."""
    from tests.conftest import detected_mask, hourly_series

    det = import_joblib(GOLDEN)
    tsf_df = hourly_series(spark, [1.0, 1.5, 3.0, 1.0])
    from tsod_spark.frame import TimeSeriesFrame

    out = det.detect(TimeSeriesFrame(tsf_df))
    assert detected_mask(out, 4) == [False, False, True, False]


def test_fitted_reference_detector_roundtrip(ref_tsod, tmp_path):
    """A detector FITTED by the actual reference library (numpy-scalar
    thresholds in the pickle) imports with identical learned params."""
    ts = pd.date_range("2021-01-01", periods=200, freq="h")
    rng = np.random.RandomState(3)
    series = pd.Series(np.cumsum(rng.normal(0, 0.5, 200)), index=ts)

    ref = ref_tsod.DiffDetector(direction="both").fit(series)
    p = tmp_path / "ref_diff.joblib"
    p.write_bytes(pickle.dumps(ref, protocol=4))  # what joblib.dump writes

    ours = import_joblib(p)
    from tsod_spark.detectors import DiffDetector

    assert isinstance(ours, DiffDetector)
    assert ours._max_diff == pytest.approx(float(ref._max_diff))
    assert isinstance(ours._max_diff, float)  # numpy scalar coerced


def test_import_then_save_json(ref_tsod, tmp_path):
    """Migration path: joblib in, JSON out, reload equal."""
    combined = ref_tsod.CombinedDetector(
        [ref_tsod.ConstantValueDetector(), ref_tsod.RangeDetector(max_value=2.0)]
    )
    p = tmp_path / "combined.joblib"
    p.write_bytes(pickle.dumps(combined, protocol=4))
    det = import_joblib(p)
    out = tmp_path / "combined.json"
    save(det, out)
    re = load(out)
    assert [type(c).__name__ for c in re] == [
        "ConstantValueDetector",
        "RangeDetector",
    ]
    assert list(re)[1]._max == 2.0


def test_arbitrary_pickled_code_refused(tmp_path):
    """The security property: a pickle naming anything outside the
    tsod detector namespace (e.g. os.system) must be rejected, not
    executed."""
    evil = b"cos\nsystem\n(S'true'\ntR."  # classic pickle RCE payload
    p = tmp_path / "evil.joblib"
    p.write_bytes(evil)
    with pytest.raises(pickle.UnpicklingError, match="refusing os.system"):
        import_joblib(p)


def test_compressed_variants(tmp_path):
    import gzip
    import zlib

    raw = open(GOLDEN, "rb").read()
    g = tmp_path / "g.joblib"
    g.write_bytes(gzip.compress(raw))
    z = tmp_path / "z.joblib"
    z.write_bytes(zlib.compress(raw))
    assert type(import_joblib(g)).__name__ == "CombinedDetector"
    assert type(import_joblib(z)).__name__ == "CombinedDetector"
