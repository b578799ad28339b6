"""Detector evaluation harness — scored against the REAL QC labels of
the reference's CMEMS fixture (the quantitative version of the
cmems.ipynb visual validation)."""

import pytest
from pyspark.sql import functions as F

from tsod_spark.detectors import CombinedDetector, ConstantValueDetector, RangeDetector
from tsod_spark.evaluation import confusion, evaluate_detector, evaluate_many
from tsod_spark.frame import TimeSeriesFrame

REF_NC = "/root/reference/tests/data/BO_TS_MO_FINO2.nc"


def test_confusion_counts(spark):
    rows = [
        (True, True), (True, True),            # tp
        (True, False),                          # fp
        (False, True), (False, True), (False, True),  # fn
        (False, False),                         # tn
        (None, None),                           # nulls -> negatives
    ]
    df = spark.createDataFrame(rows, "is_anomaly boolean, label boolean")
    r = confusion(df, "label").collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (2, 1, 3, 2)
    assert r.precision == pytest.approx(2 / 3, abs=1e-6)
    assert r.recall == pytest.approx(2 / 5, abs=1e-6)
    assert r.f1 == pytest.approx(2 * (2/3) * (2/5) / (2/3 + 2/5), abs=1e-6)


@pytest.fixture(scope="module")
def fino2(spark):
    from tsod_spark.sources import read_netcdf_fleet

    df = (
        read_netcdf_fleet(spark, REF_NC, variable="PSAL")
        .where("value IS NOT NULL AND NOT isnan(value)")
        .withColumn("label", F.col("qc").isin(3, 4))  # suspect/bad flags
        .withColumn("station", F.lit("FINO2"))
    )
    return TimeSeriesFrame(df, series=["station"])


def test_range_detector_scores_against_qc(spark, fino2):
    """Score a quantile-envelope range detector against the station's
    QC labels. Real-data note baked into the assertions: FINO2's
    suspect/bad flags (3/4) mark reviewer-identified drift periods
    whose VALUES lie inside the good-data range, so threshold
    detectors recover only the extreme tail — the harness must report
    that honestly (small tp, nonzero fp), with exact accounting."""
    good = fino2.df.where(~F.col("label"))
    lo, hi = good.agg(
        F.percentile("value", 0.001), F.percentile("value", 0.999)
    ).first()
    det = RangeDetector(min_value=lo, max_value=hi)
    r = evaluate_detector(det, fino2, "label").collect()[0]
    n = fino2.df.count()
    n_pos = fino2.df.where("label").count()
    assert r.tp + r.fn == n_pos
    assert r.tp + r.fp + r.fn + r.tn == n
    assert r.tp >= 1  # the tail of the flagged drift IS caught
    assert r.fp > 0 and r.recall < 0.05  # and the limitation is visible


def test_evaluate_many_sweep(spark, fino2):
    out = evaluate_many(
        {
            "range_tight": RangeDetector(7.0, 10.0),
            "range_loose": RangeDetector(0.0, 20.0),
            "constant": ConstantValueDetector(3, 0.001),
            "combined": CombinedDetector([RangeDetector(7.0, 10.0),
                                          ConstantValueDetector(3, 0.001)]),
        },
        fino2,
        "label",
    ).collect()
    by = {r.detector: r for r in out}
    assert len(by) == 4
    # loose range flags nothing real -> recall 0; tight flags some
    assert (by["range_loose"].tp, by["range_loose"].fp) == (0, 0)
    assert by["range_tight"].tp > 0
    # OR-combination can only grow predictions vs each member
    assert by["combined"].tp >= by["range_tight"].tp
    assert by["combined"].fp >= by["range_tight"].fp
