"""Round-7 closers: hour-of-day ANOVA, Markov transition matrix, OLS
trend fit, inter-arrival profile.  Each cross-validated against a pure
python / numpy re-implementation on synthetic event frames (the
differential strategy of the other round suites).
"""

import datetime
import math
import random

import pytest
from pyspark.sql import functions as F

from tsod_spark.analytics import stattests
from tsod_spark.queries.round7 import (
    interarrival_profile,
    markov_matrix,
    ols_fit,
)


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


# ---------------------------------------------------------------------------
# hour-of-day one-way ANOVA


def test_hour_anova_matches_pure_python(spark):
    """F statistic and eta-squared vs a textbook double-precision ANOVA
    on the cents-quantized values; the strongly seasonal user flags,
    and flags agree with the python side for every user."""
    rng = random.Random(11)
    rows, eid = [], 0
    base = datetime.datetime(2024, 3, 1)
    for day in range(6):
        for h in range(24):
            ts = base + datetime.timedelta(days=day, hours=h)
            # user 1: strong daily cycle; user 2: flat noise
            rows.append((eid, 1, ts, "a", 10.0 + 5.0 * math.sin(h / 24 * 2 * math.pi) + rng.uniform(-0.2, 0.2)))
            eid += 1
            rows.append((eid, 2, ts, "a", 10.0 + rng.uniform(-0.5, 0.5)))
            eid += 1
    out = {r.user_id: r for r in stattests.hour_anova(_events_df(spark, rows)).collect()}

    # pure-python ANOVA per user on cents
    by_user: dict = {}
    for _, u, ts, _t, v in rows:
        by_user.setdefault(u, {}).setdefault(ts.hour, []).append(int(round(v * 100)))
    for u, cells in by_user.items():
        allv = [x for xs in cells.values() for x in xs]
        n, k = len(allv), len(cells)
        mean = sum(allv) / n
        ssb = sum(len(xs) * (sum(xs) / len(xs) - mean) ** 2 for xs in cells.values())
        sst = sum((x - mean) ** 2 for x in allv)
        ssw = sst - ssb
        f = (ssb / (k - 1)) / (ssw / (n - k))
        r = out[u]
        assert r.n_obs == n and r.k_hours == k
        assert r.f_stat == pytest.approx(round(f, 6), abs=1e-5)
        assert r.eta_sq == pytest.approx(round(ssb / sst, 6), abs=1e-6)
        assert r.seasonal_flag == (f > 1.52)
    assert out[1].seasonal_flag
    assert out[1].eta_sq > out[2].eta_sq


def test_hour_anova_degenerate_single_hour(spark):
    """One hour bin only -> k=1 -> F undefined (null), flag False."""
    rows = [
        (i, 1, datetime.datetime(2024, 1, 1, 9, i), "a", float(i))
        for i in range(5)
    ]
    r = stattests.hour_anova(_events_df(spark, rows)).collect()[0]
    assert r.k_hours == 1 and r.f_stat is None and not r.seasonal_flag


# ---------------------------------------------------------------------------
# Markov transition matrix


def test_markov_matrix_known_sequences(spark):
    """Transitions/prob/lift vs hand-counted values on two small
    per-user sequences, including a timestamp tie broken by event_id."""
    t0 = datetime.datetime(2024, 1, 1)
    seq1 = ["a", "b", "a", "b", "c"]  # a->b x2, b->a, b->c
    seq2 = ["a", "a", "b"]  # a->a, a->b
    rows = []
    for i, et in enumerate(seq1):
        rows.append((i, 1, t0 + datetime.timedelta(minutes=i), et, 1.0))
    # user 2: identical timestamps -> order must come from event_id
    for i, et in enumerate(seq2):
        rows.append((100 + i, 2, t0, et, 1.0))
    out = {(r.from_type, r.to_type): r for r in markov_matrix(_events_df(spark, rows)).collect()}

    trans = {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1, ("a", "a"): 1}
    assert {k: v.transitions for k, v in out.items()} == trans
    grand = sum(trans.values())
    row_tot: dict = {}
    col_tot: dict = {}
    for (f_, t_), c in trans.items():
        row_tot[f_] = row_tot.get(f_, 0) + c
        col_tot[t_] = col_tot.get(t_, 0) + c
    for (f_, t_), c in trans.items():
        r = out[(f_, t_)]
        assert r.prob == pytest.approx(round(c / row_tot[f_], 6), abs=1e-9)
        assert r.lift == pytest.approx(
            round(c * grand / (row_tot[f_] * col_tot[t_]), 6), abs=1e-9
        )
    # conditional rows sum to 1
    for f_ in row_tot:
        s = sum(r.prob for (ff, _), r in out.items() if ff == f_)
        assert s == pytest.approx(1.0, abs=1e-5)


# ---------------------------------------------------------------------------
# OLS trend fit


def test_ols_fit_matches_numpy(spark):
    """Slope/intercept/R2/RMSE vs numpy least squares on the hourly
    cents totals, x rebased to hours-since-first-bucket."""
    import numpy as np

    rng = random.Random(3)
    rows, eid = [], 0
    base = datetime.datetime(2024, 5, 1)
    for u, (slope, inter) in enumerate([(0.5, 100.0), (-1.25, 50.0)], start=1):
        for hx in range(0, 60, 3):  # sparse, uneven coverage is fine
            ts = base + datetime.timedelta(hours=hx, minutes=17)
            v = inter + slope * hx + rng.uniform(-2, 2)
            rows.append((eid, u, ts, "a", v))
            eid += 1
    out = {r.user_id: r for r in ols_fit(_events_df(spark, rows)).collect()}

    by_user: dict = {}
    for _, u, ts, _t, v in rows:
        hb = int(ts.replace(minute=0, second=0).timestamp() // 3600)
        by_user.setdefault(u, {}).setdefault(hb, 0)
        by_user[u][hb] += int(round(v * 100))
    for u, buckets in by_user.items():
        hbs = sorted(buckets)
        x = np.array([hb - hbs[0] for hb in hbs], dtype=float)
        y = np.array([buckets[hb] for hb in hbs], dtype=float)
        sl, ic = np.polyfit(x, y, 1)
        resid = y - (sl * x + ic)
        sse = float(resid @ resid)
        sst = float(((y - y.mean()) ** 2).sum())
        r = out[u]
        assert r.n_buckets == len(hbs)
        assert r.slope_cents_per_hour == pytest.approx(sl, abs=1e-4)
        assert r.intercept_cents == pytest.approx(ic, abs=1e-3)
        assert r.r2 == pytest.approx(1 - sse / sst, abs=1e-6)
        assert r.rmse_cents == pytest.approx(math.sqrt(sse / len(x)), abs=1e-4)


def test_ols_fit_degenerate_one_bucket(spark):
    """A single bucket has dx=0 -> slope/intercept/r2 all null."""
    rows = [(0, 1, datetime.datetime(2024, 1, 1, 9, 5), "a", 3.0),
            (1, 1, datetime.datetime(2024, 1, 1, 9, 40), "a", 4.0)]
    r = ols_fit(_events_df(spark, rows)).collect()[0]
    assert r.n_buckets == 1
    assert r.slope_cents_per_hour is None and r.r2 is None


# ---------------------------------------------------------------------------
# inter-arrival profile


def test_interarrival_periodic_and_bursty(spark):
    """Perfectly periodic arrivals give std 0, cv 0, burstiness -1;
    an irregular series matches the pure-python moments."""
    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for i in range(10):  # user 1: exact 60s period
        rows.append((eid, 1, t0 + datetime.timedelta(seconds=60 * i), "a", 1.0))
        eid += 1
    gaps2 = [1, 1, 1, 1, 300, 2, 1, 400, 1]  # user 2: bursty
    t = t0
    rows.append((eid, 2, t, "a", 1.0)); eid += 1
    for g in gaps2:
        t = t + datetime.timedelta(seconds=g)
        rows.append((eid, 2, t, "a", 1.0)); eid += 1
    out = {r.user_id: r for r in interarrival_profile(_events_df(spark, rows)).collect()}

    r1 = out[1]
    assert r1.n_gaps == 9
    assert r1.mean_gap_s == 60.0 and r1.std_gap_s == 0.0
    assert r1.cv == 0.0 and r1.burstiness == -1.0

    n = len(gaps2)
    mu = sum(gaps2) / n
    var = sum(g * g for g in gaps2) / n - mu * mu
    sd = math.sqrt(max(var, 0.0))
    r2 = out[2]
    assert r2.n_gaps == n
    assert r2.mean_gap_s == pytest.approx(round(mu, 6), abs=1e-9)
    assert r2.std_gap_s == pytest.approx(sd, abs=1e-6)
    assert r2.cv == pytest.approx(sd / mu, abs=1e-6)
    assert r2.burstiness == pytest.approx((sd - mu) / (sd + mu), abs=1e-6)
    assert r2.burstiness > 0.25  # clearly on the bursty side of Poisson
