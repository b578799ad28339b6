"""SeasonalResidualDetector: fit/detect lifecycle equals the one-pass
seasonal_anomaly operator, in both per-series and global-fit modes."""

import pytest
from pyspark.sql import functions as F

from tsod_spark import SeasonalResidualDetector
from tsod_spark.analytics import temporal
from tsod_spark.frame import TimeSeriesFrame
from tsod_spark.registry import table

SF = "/root/testdata/sf0.001"


def test_fit_detect_matches_one_pass_operator(spark):
    df = table(spark, SF, "events")
    tsf = TimeSeriesFrame(df, series=["user_id"], tiebreak=["event_id"])
    det = SeasonalResidualDetector().fit(tsf)
    got = {
        (r["user_id"], r["ts"]): r["is_anomaly"]
        for r in det.detect(tsf).select("user_id", "ts", "is_anomaly").collect()
    }
    exp = {
        (r["user_id"], r["ts"]): r["is_anomaly"]
        for r in temporal.seasonal_anomaly(df)
        .select("user_id", "ts", "is_anomaly")
        .collect()
    }
    assert got == exp
    assert sum(got.values()) > 0  # flags something


def test_global_fit_single_series(spark):
    df = table(spark, SF, "events")
    uid = df.select("user_id").first()[0]
    one = df.where(F.col("user_id") == uid)
    tsf = TimeSeriesFrame(one, series=[], tiebreak=["event_id"])
    det = SeasonalResidualDetector().fit(tsf)
    out = det.detect(tsf)
    assert out.count() == one.count()
    assert "is_anomaly" in out.columns


def test_detect_unfitted_raises(spark):
    from tsod_spark.exceptions import NotFittedError

    df = table(spark, SF, "events")
    tsf = TimeSeriesFrame(df.where(F.col("user_id") == 0), series=[], tiebreak=["event_id"])
    with pytest.raises(NotFittedError):
        SeasonalResidualDetector().detect(tsf)


def test_save_load_roundtrip(spark, tmp_path):
    from tsod_spark import persistence

    df = table(spark, SF, "events")
    tsf = TimeSeriesFrame(df, series=["user_id"], tiebreak=["event_id"])
    det = SeasonalResidualDetector(trend_window=6, quantile=0.98).fit(tsf)
    p = str(tmp_path / "det.json")
    persistence.save(det, p)
    det2 = persistence.load(p, spark=spark)
    a = {(r["user_id"], r["ts"]): r["is_anomaly"]
         for r in det.detect(tsf).select("user_id", "ts", "is_anomaly").collect()}
    b = {(r["user_id"], r["ts"]): r["is_anomaly"]
         for r in det2.detect(tsf).select("user_id", "ts", "is_anomaly").collect()}
    assert a == b

    # global-fit roundtrip (scalar params ride the JSON)
    uid = df.select("user_id").first()[0]
    one = TimeSeriesFrame(df.where(F.col("user_id") == uid), series=[], tiebreak=["event_id"])
    g = SeasonalResidualDetector().fit(one)
    pg = str(tmp_path / "det_g.json")
    persistence.save(g, pg)
    g2 = persistence.load(pg, spark=spark)
    ga = {r["ts"]: r["is_anomaly"] for r in g.detect(one).select("ts", "is_anomaly").collect()}
    gb = {r["ts"]: r["is_anomaly"] for r in g2.detect(one).select("ts", "is_anomaly").collect()}
    assert ga == gb


def test_per_series_regression_fit_detect(spark):
    """per_series=True fits one small numpy ridge per series inside
    applyInPandas; detect joins the broadcast params and scores with a
    fold that matches the streaming kernel's accumulation order."""
    from tsod_spark.detectors.mllib import RegressionResidualDetector

    df = table(spark, SF, "events")
    tsf = TimeSeriesFrame(df, series=["user_id"], tiebreak=["event_id"])
    det = RegressionResidualDetector(time_steps=3, per_series=True).fit(tsf)
    assert det._params_df is not None
    out = det.detect(tsf)
    rows = out.select("user_id", "ts", "is_anomaly").collect()
    assert len(rows) > 0
    assert all(r["is_anomaly"] in (True, False) for r in rows)
    # the fitted frame holds one row per series with a T-vector
    params = det._params_df.collect()
    n_series = df.select("user_id").distinct().count()
    assert len(params) == n_series
    fitted = [p for p in params if p[det.tmp("coef")] is not None]
    assert len(fitted) > 0
    assert all(len(p[det.tmp("coef")]) == 3 for p in fitted)


def test_dow_phase_matches_operator(spark):
    df = table(spark, SF, "events")
    tsf = TimeSeriesFrame(df, series=["user_id"], tiebreak=["event_id"])
    det = SeasonalResidualDetector(phase_unit="dow").fit(tsf)
    got = {
        (r["user_id"], r["ts"]): r["is_anomaly"]
        for r in det.detect(tsf).select("user_id", "ts", "is_anomaly").collect()
    }
    exp = {
        (r["user_id"], r["ts"]): r["is_anomaly"]
        for r in temporal.seasonal_anomaly(df, phase_unit="dow")
        .select("user_id", "ts", "is_anomaly")
        .collect()
    }
    assert got == exp
    # 7-slot profile, not 24
    p = det._params_df.first()
    assert len(p[det.tmp("seasonal")]) == 7


def test_bad_phase_unit_rejected(spark):
    with pytest.raises(ValueError):
        SeasonalResidualDetector(phase_unit="month")
