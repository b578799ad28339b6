"""Round-5 operators: Gopher quality gate, LTTB downsampling,
time-weighted average, winsorization."""

import datetime as dt

from pyspark.sql import functions as F


def _ts(minute, second=0):
    return dt.datetime(2021, 1, 1, 0, minute, second)


def test_gopher_filter_bounds_and_signals(spark):
    """Word-count floor, symbol ratio, bullet lines, stopword floor,
    and the empty-doc NULL-ratio path all gate pass_gopher."""
    from tsod_spark.pipeline.text import gopher_filter

    good = "the cat sat of the mat and it is that " * 3  # 30 words, stopword-rich
    rows = [
        (1, good),
        (2, "short doc"),  # < min_words
        (3, ("# " * 15) + good),  # symbol ratio 15/60 > 0.1
        (4, "\n".join(["- bullet line the a of and to in is it that"] * 30)),
        (5, ""),  # empty: ratios NULL -> pass False
        (6, " ".join(["zz"] * 30)),  # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_filter(df).collect()}
    assert out[1].pass_gopher
    assert not out[2].pass_gopher and out[2].n_words == 2
    assert not out[3].pass_gopher and out[3].symbol_word_ratio > 0.1
    # doc 4: every line is a bullet -> bullet_line_frac 1.0 > 0.9
    assert not out[4].pass_gopher and out[4].bullet_line_frac == 1.0
    assert not out[5].pass_gopher and out[5].mean_word_len is None
    assert not out[6].pass_gopher and out[6].n_stopword_hits == 0


def test_lttb_pins_endpoints_and_picks_max_area(spark):
    """First/last points always kept; the middle bucket keeps the
    point farthest from the neighbor-anchor chord (the spike)."""
    from tsod_spark.analytics.temporal import lttb_downsample

    # 9 points, n_out=3 -> buckets of 3. Middle bucket has a spike at
    # event 5 that dominates any triangle area.
    rows = [(1, _ts(i), i + 1, [1.0, 1.0, 1.0, 1.0, 50.0, 1.0, 1.0, 1.0, 1.0][i]) for i in range(9)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    out = sorted(
        (r.event_id, r.bucket) for r in lttb_downsample(df, n_out=3).collect()
    )
    assert [e for e, _ in out] == [1, 5, 9]
    assert [b for _, b in out] == [0, 1, 2]


def test_lttb_null_values_dropped_and_small_series_kept(spark):
    """NaN/NULL rows never become candidates; a series shorter than
    n_out keeps every point."""
    from tsod_spark.analytics.temporal import lttb_downsample

    rows = [
        (1, _ts(0), 1, 5.0),
        (1, _ts(1), 2, float("nan")),
        (1, _ts(2), 3, 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    out = sorted(r.event_id for r in lttb_downsample(df, n_out=20).collect())
    assert out == [1, 3]


def test_time_weighted_avg_burst_and_single_obs(spark):
    """A burst of readings weighs by holding time, not row count; a
    single-observation bucket falls back to the plain mean."""
    from tsod_spark.analytics.temporal import time_weighted_avg

    rows = [
        # hour 0: v=10 held 0:00->0:54 (3240s), then v=0 burst at
        # 0:54..0:59 (5 x 60s), last obs zero-weight
        (1, _ts(0), 1, 10.0),
        *[(1, _ts(54 + i), 2 + i, 0.0) for i in range(6)],
        # hour 1 (user 2): single obs
        (2, dt.datetime(2021, 1, 1, 1, 30), 100, 42.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    out = {(r.user_id, r.bucket.hour): r for r in time_weighted_avg(df).collect()}
    # weights: 10.0 for 3240s, 0.0 for 300s (last obs 0 weight)
    assert out[(1, 0)].time_weighted_avg == round(10.0 * 3240 / 3540, 6)
    assert out[(1, 0)].n_events == 7
    assert out[(2, 1)].time_weighted_avg == 42.0


def test_winsorize_clips_and_ignores_nulls(spark):
    """Values outside [p05, p95] clip to the band; NULL/NaN rows pass
    through unclipped with is_clipped False."""
    from tsod_spark.analytics.temporal import winsorize

    vals = [float(i) for i in range(1, 20)] + [1000.0, float("nan")]
    rows = [(1, _ts(i), i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    out = {r.event_id: r for r in winsorize(df).collect()}
    clipped = [e for e, r in out.items() if r.is_clipped]
    # the 1000.0 outlier and the low tail clip; NaN row untouched
    assert out[20].is_clipped and out[20].value_winsorized < 1000.0
    assert out[21].value is None and out[21].value_winsorized is None
    assert not out[21].is_clipped
    assert out[10].value_winsorized == out[10].value  # mid-band unchanged
    assert len(clipped) >= 2


def test_ivf_assign_expr_matches_mllib(spark):
    """The serve-time Column-expression cell assignment reproduces the
    MLlib predictor row-for-row (incl. lowest-index tie-breaking), on
    batch AND through a streaming micro-batch."""
    import shutil
    import tempfile

    from tsod_spark.pipeline.similarity import (
        ivf_assign_expr,
        ivf_index,
        stream_ivf_assign,
    )
    from tsod_spark.registry import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    assigned, centroids = ivf_index(emb)
    expected = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}

    got = {
        r.vec_id: r.cell
        for r in emb.withColumn("cell", ivf_assign_expr(centroids))
        .select("vec_id", "cell")
        .collect()
    }
    assert got == expected and len(got) == 500

    tmp = tempfile.mkdtemp(prefix="ivf_stream_")
    try:
        emb.write.parquet(f"{tmp}/src", mode="overwrite")
        src = spark.readStream.schema(emb.schema).parquet(f"{tmp}/src")
        q = (
            stream_ivf_assign(src, centroids)
            .select("vec_id", "cell")
            .writeStream.format("memory")
            .queryName("ivf_assign_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        streamed = {
            r.vec_id: r.cell
            for r in spark.sql("SELECT * FROM ivf_assign_stream").collect()
        }
        assert streamed == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_merge_upsert_update_insert_carry(spark):
    """update-wins per key; unmatched updates insert; untouched target
    rows carry over; duplicate update rows compact to last-writer."""
    from tsod_spark.analytics.olap import merge_upsert

    target = spark.createDataFrame(
        [(1, 10, _ts(0), 1.0), (2, 20, _ts(0), 2.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    updates = spark.createDataFrame(
        [
            (1, 30, _ts(5), 10.0),
            (1, 31, _ts(6), 11.0),  # later: wins among the dup updates
            (3, 40, _ts(7), 30.0),  # new key: insert
        ],
        "user_id long, event_id long, ts timestamp, value double",
    )
    out = {r.user_id: (r.event_id, r.value) for r in merge_upsert(target, updates).collect()}
    assert out == {1: (31, 11.0), 2: (20, 2.0), 3: (40, 30.0)}


def test_esd_peels_masked_outlier(spark):
    """Two outliers where one masks the other for a plain z-score:
    round 1 peels the huge spike, round 2 re-estimates sigma without
    it and catches the second; inliers stay unflagged."""
    from tsod_spark.analytics.temporal import esd_anomalies

    vals = [10.0, 11.0, 9.0, 10.0, 10.5, 9.5, 10.0, 11.0, 9.0, 10.0,
            10.0, 11.0, 9.0, 10.0, 10.5, 9.5, 10.0, 11.0, 9.0, 10.0,
            1000.0, 60.0]
    rows = [(1, i + 1, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    out = {r.event_id: r.is_anomaly for r in esd_anomalies(df).collect()}
    assert out[21] and out[22]
    assert sum(out.values()) == 2
    # plain one-round peeling misses the masked 60.0
    one = {r.event_id: r.is_anomaly for r in esd_anomalies(df, rounds=1).collect()}
    assert one[21] and not one[22]


def test_dq_checks_detects_violations(spark):
    """Each constraint fails on exactly the data that violates it and
    the metric reports the conforming fraction."""
    from tsod_spark.analytics.olap import dq_checks, referential_check

    df = spark.createDataFrame(
        [(1, 5.0), (1, None), (2, 50.0), (3, 7.0)],  # dup key, null, oob
        "event_id long, value double",
    )
    out = {
        r.check: (r.metric, r.passed)
        for r in dq_checks(df, bounds={"value": (0, 10)}).collect()
    }
    assert out["row_count"] == (4.0, True)
    assert out["completeness(value)"] == (0.75, False)
    assert out["uniqueness(event_id)"] == (0.75, False)
    assert out["bounds(value)"] == (0.5, False)  # null and 50.0 fail

    child = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    fk = referential_check(child, parent, "k", "p").collect()[0]
    assert fk.check == "fk(k->p)" and fk.metric == round(2 / 3, 6) and not fk.passed


def test_chunk_split_windows_and_tail(spark):
    """Stride windows cover every token; the tail chunk is short;
    overlap = chunk - stride; empty docs emit nothing."""
    from tsod_spark.pipeline.text import chunk_split

    text10 = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text10), (2, "a b"), (3, "")], "doc_id long, text string"
    )
    out = chunk_split(df, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.start_token for r in c1] == [1, 4, 7, 10]
    assert [r.n_tokens for r in c1] == [4, 4, 4, 1]
    assert c1[0].chunk_text == "w0 w1 w2 w3"
    assert c1[1].chunk_text == "w3 w4 w5 w6"  # 1-token overlap
    assert c1[3].chunk_text == "w9"
    assert [r.n_tokens for r in by_doc[2]] == [2]
    assert 3 not in by_doc


def test_rag_search_ranks_matching_chunk_first(spark):
    """The chunk containing the query tokens must outrank unrelated
    chunks; scores are unit-cosine in [0, 1]."""
    from tsod_spark.pipeline.text import rag_search

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta " * 20),
            (2, "the quick brown fox " * 20),
            (3, "needle haystack retrieval target " * 20),
        ],
        "doc_id long, text string",
    )
    out = rag_search(df, "needle haystack retrieval", k=3).collect()
    assert out[0].doc_id == 3
    assert all(0.0 <= r.cos_sim <= 1.000001 for r in out)
    assert out[0].cos_sim > out[-1].cos_sim


def test_shesd_catches_seasonal_masked_anomaly(spark):
    """A spike that is small relative to raw variance but large
    relative to the residual variance: plain ESD on raw values misses
    it (the seasonal swing inflates sigma); S-H-ESD flags it."""
    import datetime as dt

    from tsod_spark.analytics.temporal import esd_anomalies, seasonal_decompose
    from pyspark.sql import functions as F

    t0 = dt.datetime(2021, 1, 1)
    rows = []
    eid = 0
    for day in range(6):
        for hour in range(24):
            eid += 1
            import math as _m

            base = 50.0 + 40.0 * _m.sin(hour * _m.pi / 12)  # smooth diurnal
            v = round(base, 2) + (8.0 if (day == 3 and hour == 3) else 0.0)
            rows.append((1, eid, t0 + dt.timedelta(days=day, hours=hour), v))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    spike_id = 3 * 24 + 4  # day 3, hour 3

    raw = {r.event_id: r.is_anomaly for r in esd_anomalies(df).collect()}
    assert not raw[spike_id]  # masked by the diurnal swing

    dec = seasonal_decompose(df)
    rc = F.when(
        F.col("resid") >= 0, F.floor(F.col("resid") * 100 + 0.5)
    ).otherwise(-F.floor(-F.col("resid") * 100 + 0.5))
    d = dec.where(F.col("resid").isNotNull()).select(
        "user_id", "event_id", rc.cast("long").alias("rc")
    )
    sh = {
        r.event_id: r.is_anomaly
        for r in esd_anomalies(d, value_col="rc", precomputed_cents=True).collect()
    }
    assert sh[spike_id]
