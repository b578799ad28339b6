"""Golden-fixture tests reproducing the reference test suite.

Each case cites the reference test it mirrors
(/root/reference/tests/test_detectors.py) via FIXTURES.md. NaN inputs
must never be flagged (test_detectors.py:43-45).
"""

import math

import pytest

from tsod_spark import (
    CombinedDetector,
    ConstantGradientDetector,
    ConstantValueDetector,
    DiffDetector,
    GradientDetector,
    HampelDetector,
    RangeDetector,
    RollingStandardDeviationDetector,
)

from .conftest import detected_mask, hourly_series

NaN = None  # hourly_series turns None into NaN

RANGE_NORMAL = [0.0, NaN, 1.0, 0.0, 2.0, NaN, 3.14, 4.0]
RANGE_ABNORMAL = [-1.0, NaN, 2.0, NaN, 1.0, 0.0, 4.1, 10.0]
RANGE_EXPECTED = [True, False, False, False, False, False, True, True]


# ---- F-RANGE (test_detectors.py:41-58,95-122) -------------------------


def test_range_detector_fixed_bounds(spark):
    # test_detectors.py:95-103: RangeDetector(0, 2) on abnormal
    df = hourly_series(spark, RANGE_ABNORMAL)
    mask = detected_mask(RangeDetector(0, 2).detect(df), 8)
    assert mask == [True, False, False, False, False, False, True, True]
    assert sum(mask) == 3


def test_range_detector_one_sided(spark):
    # test_detectors.py:106-113
    df = hourly_series(spark, RANGE_ABNORMAL)
    mask_min = detected_mask(RangeDetector(min_value=3.0, max_value=None).detect(df), 8)
    assert sum(mask_min) == 4  # -1, 2, 1, 0 are < 3 (NaN never flagged)
    mask_max = detected_mask(RangeDetector(min_value=None, max_value=3.0).detect(df), 8)
    assert sum(mask_max) == 2  # 4.1, 10


def test_range_detector_fit(spark):
    # test_detectors.py:155-156 style: fit on normal, detect on abnormal
    normal = hourly_series(spark, RANGE_NORMAL)
    abnormal = hourly_series(spark, RANGE_ABNORMAL)
    det = RangeDetector().fit(normal)
    assert det._min == 0.0 and det._max == 4.0
    mask = detected_mask(det.detect(abnormal), 8)
    assert mask == RANGE_EXPECTED


def test_combined_detector(spark):
    # test_detectors.py:116-122
    normal = hourly_series(spark, RANGE_NORMAL)
    abnormal = hourly_series(spark, RANGE_ABNORMAL)
    det = CombinedDetector([ConstantValueDetector(), RangeDetector()]).fit(normal)
    mask = detected_mask(det.detect(abnormal), 8)
    assert mask == RANGE_EXPECTED


def test_combined_detector_type_check(spark):
    # test_detectors.py:125-127
    with pytest.raises(ValueError):
        CombinedDetector([ConstantValueDetector(), RangeDetector])


def test_combined_detector_sequence_protocol(spark):
    # test_detectors.py:130-137
    cd = CombinedDetector([ConstantValueDetector(), RangeDetector()])
    assert len(cd) == 2
    assert isinstance(cd[0], ConstantValueDetector)
    assert isinstance(cd[1], RangeDetector)


# ---- F-CONSTVAL (test_detectors.py:74-84,238-251) ---------------------


def test_constant_value_good(spark):
    good = hourly_series(spark, [0.0, NaN, 1.0, 1.1, 1.4, 1.5555, 3.14, 4.0])
    mask = detected_mask(ConstantValueDetector(2, 0.0001).detect(good), 8)
    assert sum(mask) == 0


def test_constant_value_abnormal(spark):
    abnormal = hourly_series(spark, [-1.0, NaN, 1.0, 1.0, 1.0, 1.0, 4.0, 10.0])
    mask = detected_mask(ConstantValueDetector(3, 0.0001).detect(abnormal), 8)
    assert sum(mask) == 4  # run of four 1s incl. ±1 dilation
    assert mask == [False, False, True, True, True, True, False, False]


# ---- F-CONSTGRAD (test_detectors.py:61-71,254-267) --------------------


def test_constant_gradient_good(spark):
    good = hourly_series(spark, [0.0, NaN, 1.0, 1.1, 1.4, 1.5555, 3.14, 4.0])
    mask = detected_mask(ConstantGradientDetector(3).detect(good), 8)
    assert sum(mask) == 0


def test_constant_gradient_abnormal(spark):
    abnormal = hourly_series(spark, [-1.0, 2.0, 2.1, 2.2, 2.3, 2.4, 4.0, 10.0])
    mask = detected_mask(ConstantGradientDetector(3).detect(abnormal), 8)
    assert mask == [False, True, True, True, True, True, False, False]


def test_gradient_good(spark):
    good = hourly_series(spark, [0.0, NaN, 1.0, 1.1, 1.4, 1.5555, 3.14, 4.0])
    mask = detected_mask(GradientDetector(1.0).detect(good), 8)
    assert sum(mask) == 0


# ---- F-GRADJUMP (test_detectors.py:280-351) ---------------------------

GRAD_NORMAL = [-0.5, -0.6, 0.6, 0.6, 0.1, 0.6, 0.4, 0.8, 0.7, 1.5,
               1.6, 1.1, 0.3, 2.1, 0.7, 0.3, -1.7, -0.3, 0.0, -1.0]
GRAD_ABNORMAL = list(GRAD_NORMAL)
GRAD_ABNORMAL[1], GRAD_ABNORMAL[2] = -1.5, 1.5


def test_gradient_unfitted_inf(spark):
    df = hourly_series(spark, GRAD_ABNORMAL)
    assert sum(detected_mask(GradientDetector().detect(df), 20)) == 0


def test_gradient_fit_detect(spark):
    normal = hourly_series(spark, GRAD_NORMAL)
    abnormal = hourly_series(spark, GRAD_ABNORMAL)
    det = GradientDetector().fit(normal)
    mask = detected_mask(det.detect(abnormal), 20)
    assert sum(mask) == 1
    assert mask[2]  # the 3.0 jump in one hour lands at row 2


# ---- DiffDetector (test_detectors.py:169-174) -------------------------


def test_diff_fit_detect(spark):
    normal = hourly_series(spark, RANGE_NORMAL)
    abnormal = hourly_series(spark, RANGE_ABNORMAL)
    det = DiffDetector().fit(normal)
    assert det._max_diff == 2.0  # max *signed* diff on normal (NaN-skipping)
    mask = detected_mask(det.detect(abnormal), 8)
    assert sum(mask) == 2


def test_diff_direction_validation(spark):
    with pytest.raises(ValueError):
        DiffDetector(direction="sideways")


# ---- F-ROLLSTD (test_detectors.py:197-224) ----------------------------


def test_rolling_std(spark):
    # exact generator of test_detectors.py:197-205
    import numpy as np

    np.random.seed(42)
    normal = np.random.normal(scale=1.0, size=1000) + 10.0 * np.sin(
        np.linspace(0, 10, num=1000)
    )
    abnormal = np.random.normal(scale=2.0, size=100)
    normal_df = hourly_series(spark, normal.tolist())
    all_df = hourly_series(spark, normal.tolist() + abnormal.tolist())

    det = RollingStandardDeviationDetector(max_std=2.0)
    assert sum(detected_mask(det.detect(normal_df), 1000)) == 0
    assert sum(detected_mask(det.detect(all_df), 1100)) > 0

    fitted = RollingStandardDeviationDetector().fit(normal_df)
    assert sum(detected_mask(fitted.detect(normal_df), 1000)) == 0
    assert sum(detected_mask(fitted.detect(all_df), 1100)) > 0


# ---- F-QUANTILE (test_detectors.py:140-166) ---------------------------


def test_range_quantile_fit(spark):
    # exact generator of test_detectors.py:140-150 (legacy seed API)
    import numpy as np

    np.random.seed(42)
    train = np.random.normal(size=1000)
    test = np.random.normal(size=1000)
    train[42] = -6.5
    train[560] = 10.5
    test[142] = -4.5
    test[960] = 5.5
    train_df = hourly_series(spark, train.tolist())
    test_df = hourly_series(spark, test.tolist())

    plain = RangeDetector().fit(train_df)
    assert sum(detected_mask(plain.detect(test_df), 1000)) == 0

    q = RangeDetector(quantiles=[0.001, 0.999]).fit(train_df)
    assert sum(detected_mask(q.detect(test_df), 1000)) == 2
    assert q._min > train.min() and q._max < train.max()


# ---- F-RANDWALK / Hampel (test_detectors.py:227-234) ------------------


def _random_walk_with_outliers(n_steps=100, outlier_fraction=0.1, outlier_scale=10):
    # Reproduces /root/reference/tests/data_generation.py:4-46 (seed 42).
    import numpy as np

    np.random.seed(42)
    possible_steps = [-1, 1]
    steps = np.random.choice(possible_steps, size=n_steps)
    random_walk = np.append(0, steps[:-1]).cumsum(0)
    n_outliers = int(n_steps * outlier_fraction)
    outlier_idx = np.random.randint(0, n_steps, n_outliers)
    dirty = random_walk.astype(float).copy()
    dirty[outlier_idx] += np.random.choice(possible_steps, n_outliers) * outlier_scale
    return dirty, sorted(set(outlier_idx.tolist()))


def test_hampel_subset_of_planted(spark):
    dirty, planted = _random_walk_with_outliers()
    df = hourly_series(spark, dirty.tolist())
    mask = detected_mask(HampelDetector().detect(df), 100)
    detected = {i for i, m in enumerate(mask) if m}
    assert detected, "should detect something"
    assert detected <= set(planted)  # subset containment, test_detectors.py:231-234


def test_hampel_argument_validation(spark):
    from tsod_spark import InvalidArgumentError, NotIntegerError

    with pytest.raises(NotIntegerError):
        HampelDetector(window_size=2.5)
    with pytest.raises(InvalidArgumentError):
        HampelDetector(window_size=-1)
    with pytest.raises(InvalidArgumentError):
        HampelDetector(threshold=-5)


def test_hampel_rejects_oversized_window():
    """The O(w)-per-row memory contract is code, not a docstring: a
    window above MAX_WINDOW_SIZE raises at construction."""
    import pytest as _pytest

    from tsod_spark.detectors.hampel import MAX_WINDOW_SIZE, HampelDetector
    from tsod_spark.exceptions import InvalidArgumentError

    HampelDetector(MAX_WINDOW_SIZE, 3)  # boundary accepted
    with _pytest.raises(InvalidArgumentError):
        HampelDetector(MAX_WINDOW_SIZE + 1, 3)
