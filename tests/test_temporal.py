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


def test_holt_recurrence_and_null_carry(spark):
    """level/trend follow Holt's two-state recurrence over non-nulls;
    NaN rows carry both states; first obs seeds (level=y, trend=0)."""
    import math

    from tsod_spark.analytics.temporal import holt

    rows = [
        (1, "2021-01-01 00:00:00", 1, float("nan")),
        (1, "2021-01-01 01:00:00", 2, 4.0),
        (1, "2021-01-01 02:00:00", 3, 8.0),
        (1, "2021-01-01 03:00:00", 4, float("nan")),
        (1, "2021-01-01 04:00:00", 5, 6.0),
        (2, "2021-01-01 00:00:00", 6, 10.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_id long, value double"
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) ts", "event_id", "value")
    out = {r.event_id: (r.level, r.trend) for r in holt(df).collect()}
    lvl, trd = out[1]
    assert lvl is None or math.isnan(lvl)  # no obs yet (Arrow NaN -> NULL)
    assert trd is None or math.isnan(trd)
    assert out[2] == (4.0, 0.0)  # seed
    # step at y=8: nl = 0.5*8 + 0.5*(4+0) = 6; nt = 0.25*(6-4) + 0.75*0 = 0.5
    assert out[3] == (6.0, 0.5)
    assert out[4] == out[3]  # NaN carries both states
    # step at y=6: nl = 0.5*6 + 0.5*(6+0.5) = 6.25; nt = 0.25*0.25 + 0.75*0.5
    assert out[5] == (6.25, 0.25 * 0.25 + 0.75 * 0.5)
    assert out[6] == (10.0, 0.0)  # independent series


def test_table_diff_statuses(spark):
    """added/removed/changed classification; unchanged keys dropped;
    null-safe comparison counts NULL<->value as a change."""
    from tsod_spark.analytics.olap import table_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (4, None), (5, 50.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(2, 21.0), (3, 30.0), (4, 40.0), (5, 50.0)], "k long, v double"
    )
    out = {
        r.k: (r.status, r.old_v, r.new_v)
        for r in table_diff(old, new, keys=("k",), compare_cols=("v",)).collect()
    }
    assert out[1] == ("removed", 10.0, None)
    assert out[2] == ("changed", 20.0, 21.0)
    assert out[3] == ("added", None, 30.0)
    assert out[4] == ("changed", None, 40.0)  # NULL -> value is a change
    assert 5 not in out  # unchanged dropped


def test_range_join_bucketized_matches_naive(spark):
    """The bucketized equi-join decomposition must produce exactly the
    pairs of the naive BETWEEN predicate, across bucket sizes."""
    import datetime as dt

    from tsod_spark.analytics.temporal import range_join

    t0 = dt.datetime(2021, 1, 1)
    events = spark.createDataFrame(
        [(u, i, t0 + dt.timedelta(minutes=7 * i + u)) for u in (1, 2) for i in range(60)],
        "user_id long, event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (1, 100, t0 + dt.timedelta(minutes=30), t0 + dt.timedelta(minutes=90)),
            (1, 101, t0 + dt.timedelta(minutes=85), t0 + dt.timedelta(minutes=86)),
            (2, 102, t0 - dt.timedelta(minutes=60), t0),  # boundary-inclusive
        ],
        "user_id long, iv_id long, start_ts timestamp, end_ts timestamp",
    )
    naive = {
        (r.event_id, r.iv_id)
        for r in events.join(
            iv,
            (events.user_id == iv.user_id)
            & (events.ts >= iv.start_ts)
            & (events.ts <= iv.end_ts),
        ).collect()
    }
    assert naive  # sanity: overlaps exist, including an exact boundary
    for bsec in (600, 3600, 7200):
        got = {
            (r.event_id, r.iv_id)
            for r in range_join(
                events, iv, ["user_id"], bucket_seconds=bsec
            ).collect()
        }
        assert got == naive, f"bucket={bsec}"


def test_rollup_hierarchy_levels_consistent(spark):
    """Day-level partials re-aggregated from hour level must equal a
    direct day aggregation; the raw frame is scanned once."""
    from tsod_spark import registry
    from tsod_spark.analytics.temporal import rollup_hierarchy

    df = registry.table(spark, "/root/testdata/sf0.001", "events")
    out = rollup_hierarchy(df, keys=("event_type",), levels=("hour", "day"))
    rows = out.collect()
    hours = [r for r in rows if r.level == "hour"]
    days = [r for r in rows if r.level == "day"]
    assert hours and days
    # per (event_type, day): sum of hour-level n equals day-level n
    from collections import defaultdict

    agg = defaultdict(int)
    for r in hours:
        agg[(r.event_type, r.bucket.date())] += r.n
    for r in days:
        assert agg[(r.event_type, r.bucket.date())] == r.n
    # one raw scan total: every level consumer (the output union AND
    # the next level's aggregation) reads the previous level's cached
    # materialization, never raw. (Textual parquet-scan counting is
    # meaningless here: InMemoryRelation nodes embed their build plan.)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("InMemoryTableScan") >= 3
    spark.catalog.clearCache()


def test_interval_overlap_join_matches_naive(spark):
    """Bucketized interval-overlap must equal the naive predicate,
    emitting each overlapping pair exactly once across bucket sizes."""
    import datetime as dt

    from tsod_spark.analytics.temporal import interval_overlap_join

    t0 = dt.datetime(2021, 1, 1)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [
            (u, i, t0 + dt.timedelta(minutes=s), t0 + dt.timedelta(minutes=e))
            for u, i, s, e in rows
        ],
        "user_id long, iv_id long, start_ts timestamp, end_ts timestamp",
    )
    a = mk([(1, 1, 0, 120), (1, 2, 200, 260), (2, 3, 0, 30)])
    b = mk([(1, 10, 60, 300), (1, 11, 119, 121), (1, 12, 500, 600), (2, 13, 30, 40)])
    naive = {
        (ra.iv_id, rb.iv_id)
        for ra in a.collect()
        for rb in b.collect()
        if ra.user_id == rb.user_id
        and ra.start_ts <= rb.end_ts
        and rb.start_ts <= ra.end_ts
    }
    # (2, 12): same user, disjoint in time — must NOT pair
    assert (2, 13) not in naive and (1, 10) in naive and (2, 12) not in naive
    assert (3, 13) in naive  # boundary touch counts (inclusive)
    for bsec in (600, 3600, 86400):
        rows = interval_overlap_join(a, b, ["user_id"], bucket_seconds=bsec).collect()
        got = [(r.iv_id, r.iv_id_b) for r in rows]
        assert sorted(got) == sorted(naive), f"bucket={bsec}"  # exactly-once


def test_profile_table_counts(spark):
    from tsod_spark.analytics import olap

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "id long, s string"
    )
    rows = {r["col_name"]: r for r in olap.profile_table(df).collect()}
    assert rows["id"]["n_rows"] == 3 and rows["id"]["n_null"] == 0
    assert rows["id"]["n_distinct"] == 2
    assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["id"]["min_value"] == "1" and rows["id"]["max_value"] == "2"


def test_histogram_drift_identical_is_zero_and_disjoint_is_two(spark):
    from tsod_spark.analytics import olap

    a = spark.createDataFrame(
        [("k", float(v)) for v in (1, 2, 11, 12)], "event_type string, value double"
    )
    same = olap.histogram_drift(a, a).collect()
    assert all(r["l1_drift"] == 0.0 for r in same)
    # fully disjoint histograms: L1 of normalized distributions = 2
    b = spark.createDataFrame(
        [("k", float(v)) for v in (101, 102, 111)], "event_type string, value double"
    )
    dis = olap.histogram_drift(a, b).collect()
    assert dis[0]["l1_drift"] == 2.0


def test_benchmark_corr_bounds(spark):
    from tsod_spark.analytics import temporal
    from tsod_spark.registry import table

    out = temporal.benchmark_correlation(
        table(spark, "/root/testdata/sf0.001", "events")
    ).collect()
    assert len(out) > 0
    for r in out:
        if r["benchmark_corr"] is not None:
            assert -1.0 <= r["benchmark_corr"] <= 1.0


def test_changepoint_localizes_planted_mean_shift(spark):
    """A series of 40 values at 10.0 then 30 at 25.0 must put the
    changepoint exactly after row 40, with the pre/post means exact;
    a constant series has a well-defined (degenerate) argmax but a
    zero-shift gstat of 0."""
    import datetime as dtm

    from tsod_spark.analytics.temporal import changepoint_mean_shift

    rows = []
    for i in range(70):
        val = 10.0 if i < 40 else 25.0
        rows.append((1, i, dtm.datetime(2024, 1, 1) + dtm.timedelta(hours=i), val))
        rows.append((2, i, dtm.datetime(2024, 1, 1) + dtm.timedelta(hours=i), 7.0))
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    out = {r.user_id: r for r in changepoint_mean_shift(df).collect()}
    cp = out[1]
    assert cp.k_pre == 40 and cp.n_rows == 70
    assert cp.pre_mean == 10.0 and cp.post_mean == 25.0
    assert cp.gstat > 0
    assert out[2].gstat == 0  # constant series: no shift signal


def test_changepoint_ignores_null_rows_and_single_row_series(spark):
    """NULL values carry no level information (dropped before
    positions are assigned); a 1-observation series emits nothing."""
    import datetime as dtm

    from tsod_spark.analytics.temporal import changepoint_mean_shift

    base = dtm.datetime(2024, 1, 1)
    rows = [
        (1, 0, base, 10.0),
        (1, 1, base + dtm.timedelta(hours=1), None),
        (1, 2, base + dtm.timedelta(hours=2), 10.0),
        (1, 3, base + dtm.timedelta(hours=3), 50.0),
        (2, 0, base, 3.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    out = {r.user_id: r for r in changepoint_mean_shift(df).collect()}
    assert out[1].n_rows == 3  # NULL row not counted
    assert out[1].k_pre == 2 and out[1].post_mean == 50.0
    assert 2 not in out  # single-observation series emits nothing


def test_binseg_recovers_two_planted_shifts(spark):
    """Three-level series (30x10.0, 30x25.0, 30x40.0): level 1 finds
    one of the two true breaks; level 2 finds the other inside the
    longer segment. Both true breakpoints (k=30 and k=60) must appear
    among the emitted global positions with correct segment-local
    means."""
    import datetime as dtm

    from tsod_spark.analytics.temporal import changepoint_binseg

    rows = []
    for i in range(90):
        val = 10.0 if i < 30 else (25.0 if i < 60 else 40.0)
        rows.append((1, i, dtm.datetime(2024, 1, 1) + dtm.timedelta(hours=i), val))
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    out = changepoint_binseg(df, depth=2).collect()
    spark.catalog.clearCache()
    found = {r.k_pre for r in out}
    assert {30, 60} <= found, found
    by_k = {r.k_pre: r for r in out}
    # whichever level found k=30, its segment-local means are exact
    assert by_k[30].pre_mean == 10.0
    assert by_k[60].post_mean == 40.0
    # level-1 rows cover the full series; level-2 rows are sub-segments
    levels = {r.level for r in out}
    assert levels == {1, 2}
