"""Property-based cross-validation for the round-8 operators against
independent pure-python references on hypothesis-generated data (same
net as test_property_round5/6/7 — a bug must appear identically in two
formulations to survive)."""

from __future__ import annotations

import datetime
import math

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_BASE = datetime.datetime(2024, 1, 1)

# (hour offset, value in exact cents/100) pairs on a sparse grid
series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=-5000, max_value=5000).map(lambda c: c / 100.0),
    ),
    min_size=1,
    max_size=30,
)


def _events(spark, pts, user=1):
    rows = [
        (i, user, _BASE + datetime.timedelta(hours=h, minutes=i % 60), "a", v)
        for i, (h, v) in enumerate(pts)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=series_strategy)
def test_haar_energy_property(spark, pts):
    """Exact int64 Haar energies per level match a pure-python
    transform on the hour-bucketed cent sums, for arbitrary sparse
    grids (multiple events per hour sum into one bucket)."""
    from tsod_spark.queries.round8 import haar_energy

    buckets: dict = {}
    for h, v in pts:
        buckets[h] = buckets.get(h, 0) + int(round(v * 100))
    lo = min(buckets)
    rb = {h - lo: y for h, y in buckets.items()}
    expect = {}
    for l, half, width in ((1, 1, 2), (2, 2, 4), (3, 4, 8), (4, 8, 16)):
        det: dict = {}
        for r, y in rb.items():
            s = y if (r // half) % 2 == 0 else -y
            det[r // width] = det.get(r // width, 0) + s
        expect[l] = (len(det), sum(d * d for d in det.values()))

    out = {r.level: r for r in haar_energy(_events(spark, pts)).collect()}
    assert set(out) == set(expect)
    for l, (nb, en) in expect.items():
        assert (out[l].n_blocks, out[l].energy) == (nb, en), (pts, l)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=series_strategy)
def test_dispersion_property(spark, pts):
    """Index of dispersion over the span-with-zeros matches pure
    python for arbitrary arrival patterns."""
    from tsod_spark.queries.round8 import dispersion_profile

    r = dispersion_profile(_events(spark, pts)).collect()[0]
    hours = [h for h, _ in pts]
    span = max(hours) - min(hours) + 1
    counts: dict = {}
    for h in hours:
        counts[h] = counts.get(h, 0) + 1
    t = len(hours)
    q = sum(c * c for c in counts.values())
    assert r.n_buckets == span and r.n_events == t
    d = (span * q - t * t) / (span * t)
    assert abs(r.dispersion - round(d, 6)) < 1e-9, pts


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=series_strategy)
def test_record_stats_property(spark, pts):
    """Record high/low counts match a pure-python scan in the same
    (ts, event_id) order, ties excluded."""
    from tsod_spark.queries.round8 import record_stats

    # replicate the operator's ordering: ts asc, event_id asc;
    # event_id is the list index, ts derives from (h, i % 60)
    seq = sorted(
        (
            (_BASE + datetime.timedelta(hours=h, minutes=i % 60), i, int(round(v * 100)))
            for i, (h, v) in enumerate(pts)
        )
    )
    hi = lo = 0
    mx = mn = None
    for _, _, c in seq:
        if mx is None or c > mx:
            hi += 1
        if mn is None or c < mn:
            lo += 1
        mx = c if mx is None else max(mx, c)
        mn = c if mn is None else min(mn, c)
    r = record_stats(_events(spark, pts)).collect()[0]
    assert (r.n_obs, r.hi_records, r.lo_records) == (len(pts), hi, lo), pts


gap_strategy = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=25
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(gaps=gap_strategy)
def test_interarrival_property(spark, gaps):
    """Moment identities of the inter-arrival profile hold for
    arbitrary whole-second gap sequences (incl. zero gaps, where the
    event_id tiebreak fixes the order)."""
    from tsod_spark.queries.round7 import interarrival_profile

    t = _BASE
    rows = [(0, 1, t, "a", 1.0)]
    for i, g in enumerate(gaps, start=1):
        t = t + datetime.timedelta(seconds=g)
        rows.append((i, 1, t, "a", 1.0))
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    r = interarrival_profile(df).collect()[0]
    n = len(gaps)
    tt = sum(gaps)
    q = sum(g * g for g in gaps)
    assert r.n_gaps == n
    assert abs(r.mean_gap_s - round(tt / n, 6)) < 1e-9
    sd = math.sqrt(n * q - tt * tt) / n
    assert abs(r.std_gap_s - sd) < 1e-6
    if tt > 0:
        assert abs(r.cv - sd * n / tt) < 1e-6
        b = (sd * n - tt) / (sd * n + tt)  # (sigma - mu)/(sigma + mu)
        assert abs(r.burstiness - b) < 1e-6, gaps
    else:
        assert r.cv is None


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    prices=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=400),  # price cents
            st.integers(min_value=1, max_value=12),   # size
        ),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_property(spark, prices):
    """Skyline membership equals the O(n^2) dominance definition for
    arbitrary (price, size) clouds with heavy tie collisions."""
    from tsod_spark.queries.round8 import skyline_2d

    rows = [
        (i, "B", "t", sz, pc / 100.0) for i, (pc, sz) in enumerate(prices)
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    got = {r.p_partkey for r in skyline_2d(df).collect()}
    pts = {i: (pc, sz) for i, (pc, sz) in enumerate(prices)}
    expect = {
        k
        for k, (pc, sz) in pts.items()
        if not any(
            (pc2 < pc and sz2 >= sz) or (pc2 <= pc and sz2 > sz)
            for k2, (pc2, sz2) in pts.items()
            if k2 != k
        )
    }
    assert got == expect, prices


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    durs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # duration days
            st.booleans(),                            # event vs censored
        ),
        min_size=1,
        max_size=25,
    )
)
def test_km_survival_table_property(spark, durs):
    """The KM table (risk set, hazards, product-limit curve) matches a
    pure-python estimator for arbitrary event/censor mixtures.  The
    duration multiset is realized as customers whose two orders are
    'dur' apart for events, or whose single order sits 'dur' before
    the horizon for censored entries; a horizon-pinning customer keeps
    the censor times exact."""
    from tsod_spark.queries.round8 import km_survival

    horizon = 120
    rows = []
    ok = 0
    for ck, (dur, is_event) in enumerate(durs, start=1):
        if is_event:
            # two orders dur apart, the second AT the horizon so its
            # own censored tail is 0 days
            rows.append((ok, ck, "O", 1.0, _BASE + datetime.timedelta(days=horizon - dur), "x")); ok += 1
            rows.append((ok, ck, "O", 1.0, _BASE + datetime.timedelta(days=horizon), "x")); ok += 1
        else:
            rows.append((ok, ck, "O", 1.0, _BASE + datetime.timedelta(days=horizon - dur), "x")); ok += 1
    # pin the horizon so censored durations are exactly 'dur'
    rows.append((ok, 9999, "O", 1.0, _BASE + datetime.timedelta(days=horizon), "x"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {r.dur_days: r for r in km_survival(df).collect()}

    # expected duration multiset: per event-customer ALSO a 0-day
    # censored tail from its second order; the pin adds one 0-censor
    expected_durs = []
    for dur, is_event in durs:
        if is_event:
            expected_durs.append((dur, True))
            expected_durs.append((0, False))
        else:
            expected_durs.append((dur, False))
    expected_durs.append((0, False))

    from collections import defaultdict

    d: dict = defaultdict(int)
    c: dict = defaultdict(int)
    for dur, ev in expected_durs:
        (d if ev else c)[dur] += 1
    grid = sorted(set(d) | set(c))
    total = len(expected_durs)
    seen = 0
    surv = 1.0
    for t in grid:
        n_risk = total - seen
        de, ce = d.get(t, 0), c.get(t, 0)
        r = out[t]
        assert (r.n_risk, r.d_event, r.c_censored) == (n_risk, de, ce), durs
        if de > 0:
            surv = 0.0 if de >= n_risk else surv * (n_risk - de) / n_risk
        assert abs((r.survival or 0.0) - round(surv, 6)) < 2e-6, (durs, t)
        seen += de + ce
    assert set(out) == set(grid)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=series_strategy)
def test_holt_winters_property(spark, pts):
    """The HW triple recurrence (level/trend/season/forecast) matches
    a pure-python implementation BIT-FOR-BIT on arbitrary sparse
    hourly grids — multiple events per hour sum into one bucket,
    gaps skip slots without shifting the calendar anchor."""
    from tsod_spark.analytics.temporal import holt_winters

    rows = [
        (i, 1, _BASE + datetime.timedelta(hours=h, minutes=i % 60), "a", v)
        for i, (h, v) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    out = {r.hour_bucket: r for r in holt_winters(df).collect()}

    buckets: dict = {}
    for h, v in pts:
        buckets[h] = buckets.get(h, 0) + int(round(v * 100))
    base_hb = int(_BASE.timestamp() // 3600)
    hbs = sorted(buckets)
    s = [0.0] * 24
    l, t = float(buckets[hbs[0]]), 0.0
    h0 = (base_hb + hbs[0]) % 24
    s[h0] = 0.25 * (float(buckets[hbs[0]]) - l) + 0.75 * s[h0]
    expect = {hbs[0]: (l, t, s[h0], None)}
    for h in hbs[1:]:
        hh = (base_hb + h) % 24
        y = float(buckets[h])
        f = (l + t) + s[hh]
        nl = 0.5 * (y - s[hh]) + 0.5 * (l + t)
        t = 0.25 * (nl - l) + 0.75 * t
        s[hh] = 0.25 * (y - nl) + 0.75 * s[hh]
        l = nl
        expect[h] = (l, t, s[hh], f)
    assert len(out) == len(expect)
    for h, (el, et, es, ef) in expect.items():
        r = out[base_hb + h]
        assert (r.level, r.trend, r.season) == (el, et, es), (pts, h)
        if ef is None:
            assert r.forecast is None or math.isnan(r.forecast)
        else:
            assert r.forecast == ef, (pts, h)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    prices=st.lists(
        st.integers(min_value=1, max_value=500), min_size=12, max_size=60
    ),
    k=st.integers(min_value=2, max_value=8),
    salt=st.sampled_from([1, 3, 16, 64]),
)
def test_hill_topk_salt_invariance_property(spark, prices, k, salt):
    """The salted two-stage exact top-k threshold equals the true
    (k+1)-th order statistic for ANY salt width, including heavy
    duplicate-price collisions."""
    from tsod_spark.queries.round8 import hill_tail

    rows = [
        (i, i % 5, "O", float(p), _BASE, "P") for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    got = hill_tail(df, k_top=k, salt=salt).collect()
    if len(prices) < k + 1:
        assert got == []
        return
    ranked = sorted(
        ((float(p), i) for i, p in enumerate(prices)),
        key=lambda t: (-t[0], -t[1]),
    )
    thr = ranked[k][0]
    assert len(got) == 1
    r = got[0]
    assert r.threshold == thr, (prices, k, salt)
    slog = sum(math.log(x / thr) for x, _ in ranked[:k])
    if slog > 0:
        assert r.alpha == pytest.approx(round(k / slog, 6), abs=1e-5)
    else:
        assert r.alpha is None  # degenerate constant tail


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    seqs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_markov_matrix_property(spark, seqs):
    """Transition counts / conditional probabilities / lift match a
    pure-python count over arbitrary per-user sequences, including
    users with zero or one event (no transitions)."""
    from tsod_spark.queries.round7 import markov_matrix

    rows, eid = [], 0
    for u, seq in enumerate(seqs, start=1):
        for i, et in enumerate(seq):
            rows.append(
                (eid, u, _BASE + datetime.timedelta(minutes=i), et, 1.0)
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    got = {(r.from_type, r.to_type): r for r in markov_matrix(df).collect()}

    from collections import Counter

    trans = Counter()
    for seq in seqs:
        for x, y in zip(seq, seq[1:]):
            trans[(x, y)] += 1
    assert set(got) == set(trans), seqs
    if not trans:
        return
    row_t = Counter()
    col_t = Counter()
    for (x, y), c in trans.items():
        row_t[x] += c
        col_t[y] += c
    grand = sum(trans.values())
    def round6_half_up(v: float) -> float:
        # Spark F.round = Java BigDecimal HALF_UP on the double's
        # shortest decimal repr; Python round() is banker's half-even
        # and disagrees on exact halves (hypothesis found the dyadic
        # lift 81/128 = 0.6328125 -> .632813 vs .632812)
        from decimal import ROUND_HALF_UP, Decimal

        return float(
            Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    for (x, y), c in trans.items():
        r = got[(x, y)]
        assert r.transitions == c
        assert abs(r.prob - round6_half_up(c / row_t[x])) < 1e-9
        assert abs(r.lift - round6_half_up(c * grand / (row_t[x] * col_t[y]))) < 1e-9
