"""Property-based cross-validation for the round-5 operators: each
Spark Column/window plan is checked against an INDEPENDENT pure-python
reference implementation on random NaN-bearing series (same net as
test_property_kernels.py — a bug must appear identically in two
formulations to survive)."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

values_strategy = st.lists(
    st.one_of(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=16),
        st.just(float("nan")),
        st.sampled_from([0.0, 10.0, 10.0]),
    ),
    min_size=2,
    max_size=30,
)

# irregular but strictly increasing minute offsets
offsets_strategy = st.lists(
    st.integers(min_value=1, max_value=90), min_size=2, max_size=30
)


def _frame(spark, values, offsets):
    n = min(len(values), len(offsets))
    t0 = dt.datetime(2020, 1, 1)
    ts, acc = [], 0
    for o in offsets[:n]:
        acc += o
        ts.append(t0 + dt.timedelta(minutes=acc))
    rows = [(1, i + 1, ts[i], float(values[i])) for i in range(n)]
    return (
        spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, value double"
        ),
        ts,
        [float(v) for v in values[:n]],
    )


def _cents(v: float) -> int:
    scaled = v * 100
    return -int(-scaled + 0.5) if scaled < 0 else int(scaled + 0.5)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=values_strategy, offsets=offsets_strategy)
def test_twa_matches_pure_python(spark, values, offsets):
    from tsod_spark.analytics.temporal import time_weighted_avg

    df, ts, vals = _frame(spark, values, offsets)
    got = {
        r.bucket: (r.n_events, r.time_weighted_avg)
        for r in time_weighted_avg(df).collect()
    }

    # independent reference: per hour bucket, weight = micros to next
    # obs in bucket (0 for the last), fallback plain mean
    obs = [
        (t, _cents(v)) for t, v in zip(ts, vals) if not math.isnan(v)
    ]
    buckets: dict = {}
    for t, c in obs:
        buckets.setdefault(t.replace(minute=0, second=0, microsecond=0), []).append(
            (t, c)
        )
    for bk, rows in buckets.items():
        sw = scw = 0
        for (t, c), (t2, _) in zip(rows, rows[1:]):
            w = int((t2 - t).total_seconds() * 1_000_000)
            sw += w
            scw += c * w
        if sw > 0:
            want = scw / float(sw) / 100.0
        else:
            want = sum(c for _, c in rows) / float(len(rows)) / 100.0
        n, twa = got[bk]
        assert n == len(rows)
        assert abs(twa - want) <= 1.1e-6, (bk, twa, want)
    assert len(got) == len(buckets)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=values_strategy, offsets=offsets_strategy, n_out=st.integers(2, 8))
def test_lttb_matches_pure_python(spark, values, offsets, n_out):
    from tsod_spark.analytics.temporal import lttb_downsample

    df, ts, vals = _frame(spark, values, offsets)
    got = sorted(r.event_id for r in lttb_downsample(df, n_out=n_out).collect())

    obs = [
        (i + 1, ts[i], vals[i]) for i in range(len(vals)) if not math.isnan(vals[i])
    ]
    if not obs:
        assert got == []
        return
    t0_us = int((obs[0][1] - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
    pts = [
        (
            eid,
            int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1e6) - t0_us,
            v,
        )
        for eid, t, v in obs
    ]
    cnt = len(pts)
    by_bucket: dict = {}
    for rn, (eid, x, y) in enumerate(pts, start=1):
        bk = math.floor((rn - 1) * n_out / cnt)
        by_bucket.setdefault(bk, []).append((rn, eid, x, y))
    bks = sorted(by_bucket)
    anchors = {}
    for bk in bks:
        rows = by_bucket[bk]
        sx = sum(x for _, _, x, _ in rows)
        scents = sum(_cents(y) for _, _, _, y in rows)
        anchors[bk] = (sx / len(rows), scents / len(rows) / 100.0)
    want = []
    for i, bk in enumerate(bks):
        rows = by_bucket[bk]
        if i == 0:
            want.append(min(rows)[1])
        elif i == len(bks) - 1:
            want.append(max(rows)[1])
        else:
            pax, pay = anchors[bks[i - 1]]
            nax, nay = anchors[bks[i + 1]]
            best = min(
                rows,
                key=lambda r: (
                    -abs((pax - nax) * (r[3] - pay) - (pax - r[2]) * (nay - pay)),
                    r[0],
                ),
            )
            want.append(best[1])
    assert got == sorted(want)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=values_strategy)
def test_esd_matches_pure_python(spark, values):
    from tsod_spark.analytics.temporal import esd_anomalies

    rows = [(1, i + 1, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    got = {r.event_id: r.is_anomaly for r in esd_anomalies(df).collect()}

    cents = {
        i + 1: _cents(float(v))
        for i, v in enumerate(values)
        if not math.isnan(float(v))
    }
    flagged: set = set()
    for _ in range(3):
        live = {e: c for e, c in cents.items() if e not in flagged}
        n = len(live)
        if n == 0:
            break
        s = sum(live.values())
        q = sum(c * c for c in live.values())
        cand = min(live, key=lambda e: (-((n * live[e] - s) ** 2), e))
        dev2 = (n * live[cand] - s) ** 2
        if dev2 * (n - 1) > 9 * n * (n * q - s * s):
            flagged.add(cand)
    want = {
        i + 1: (i + 1) in flagged for i in range(len(values))
    }
    assert got == want
