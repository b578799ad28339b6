"""Unit tests for the temporal operators (as-of join, resample)."""

from __future__ import annotations

import datetime as dt

from tsod_spark.analytics.temporal import asof_join, resample


def T(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_join_backward_with_ties_and_misses(spark):
    left = spark.createDataFrame(
        [(1, T(1), "a"), (1, T(3), "b"), (1, T(5), "c"), (2, T(2), "d")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, T(0), 10.0), (1, T(3), 30.0), (1, T(4), 40.0), (3, T(0), 99.0)],
        "k int, ts timestamp, value double",
    )
    out = {
        r["tag"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, ["k"]).collect()
    }
    assert out["a"] == (T(0), 10.0)
    assert out["b"] == (T(3), 30.0)  # equal timestamp matches (>= semantics)
    assert out["c"] == (T(4), 40.0)
    assert out["d"] == (None, None)  # left outer: key with no right rows


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        [(1, T(1), "a"), (1, T(3), "b"), (1, T(6), "c")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, T(3), 30.0), (1, T(5), 50.0)], "k int, ts timestamp, value double"
    )
    out = {
        r["tag"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(left, right, ["k"], direction="forward").collect()
    }
    assert out["a"] == (T(3), 30.0)  # next right row
    assert out["b"] == (T(3), 30.0)  # equal timestamp matches
    assert out["c"] == (None, None)  # nothing after -> NULL


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, T(1), "a"), (1, T(5), "b"), (1, T(5, 30), "c")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, T(0, 30), 5.0), (1, T(5), 50.0)], "k int, ts timestamp, value double"
    )
    out = {
        r["tag"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(
            left, right, ["k"], tolerance="1 HOUR"
        ).collect()
    }
    assert out["a"] == (T(0, 30), 5.0)   # 30 min back: inside tolerance
    assert out["b"] == (T(5), 50.0)      # exact match
    assert out["c"] == (T(5), 50.0)      # 30 min back: inside
    # now shrink the tolerance: 'a' and 'c' matches fall outside
    out15 = {
        r["tag"]: (r["asof_ts"], r["asof_value"])
        for r in asof_join(
            left, right, ["k"], tolerance="15 MINUTES"
        ).collect()
    }
    assert out15["a"] == (None, None)
    assert out15["b"] == (T(5), 50.0)
    assert out15["c"] == (None, None)


def test_asof_join_preserves_left_row_count(spark):
    left = spark.range(100).selectExpr(
        "id % 7 AS k", "timestamp_micros(CAST(id * 1000000 AS LONG)) AS ts", "id AS payload"
    )
    right = spark.range(10).selectExpr(
        "id % 7 AS k", "timestamp_micros(CAST(id * 9000000 AS LONG)) AS ts", "CAST(id AS DOUBLE) AS value"
    )
    assert asof_join(left, right, ["k"]).count() == 100


def test_resample_fills_gaps_with_locf_and_lerp(spark):
    # One series: values at hours 0 and 4, gap at 1..3.
    rows = [(1, T(0, 30), 10.0), (1, T(4, 15), 50.0)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {r["bucket"].hour: r for r in resample(df).collect()}
    assert sorted(out) == [0, 1, 2, 3, 4]
    assert out[0]["v_avg"] == 10.0 and not out[0]["is_gap"]
    assert out[4]["v_avg"] == 50.0
    for h in (1, 2, 3):
        assert out[h]["is_gap"] and out[h]["n_events"] == 0
        assert out[h]["v_locf"] == 10.0
        assert abs(out[h]["v_lerp"] - (10.0 + 40.0 * h / 4)) < 1e-9


def test_resample_nan_bucket_is_gap_for_fill(spark):
    rows = [(1, T(0), 10.0), (1, T(1), float("nan")), (1, T(2), 30.0)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = {r["bucket"].hour: r for r in resample(df).collect()}
    assert out[1]["n_events"] == 1  # the NaN row is counted
    assert out[1]["v_avg"] is None  # but contributes no value
    assert out[1]["v_locf"] == 10.0
    assert abs(out[1]["v_lerp"] - 20.0) < 1e-9


def test_ewma_recurrence_and_null_carry(spark):
    """y_t = 0.75*y_{t-1} + 0.25*x_t over non-nulls; NaN rows carry the
    previous smoothed value; leading NaN stays null."""
    import math

    from tsod_spark.analytics.temporal import ewma

    rows = [
        (1, "2021-01-01 00:00:00", 1, float("nan")),
        (1, "2021-01-01 01:00:00", 2, 4.0),
        (1, "2021-01-01 02:00:00", 3, 8.0),
        (1, "2021-01-01 03:00:00", 4, float("nan")),
        (1, "2021-01-01 04:00:00", 5, 0.0),
        (2, "2021-01-01 00:00:00", 6, 10.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_id long, value double"
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) ts", "event_id", "value")
    out = {r.event_id: r.ewma for r in ewma(df).collect()}
    assert out[1] is None or math.isnan(out[1])  # no observation yet
    assert out[2] == 4.0
    assert out[3] == 0.75 * 4.0 + 0.25 * 8.0  # 5.0
    assert out[4] == out[3]  # carry-forward across the gap
    assert out[5] == 0.75 * 5.0 + 0.25 * 0.0  # gap invisible to recurrence
    assert out[6] == 10.0  # independent series
