"""Round-8 operators (Haar energy, dispersion, entropy, Kaplan-Meier,
Hill tail index) cross-validated against pure-python / numpy
re-implementations on synthetic frames.
"""

import datetime
import math
import random

import pytest

from tsod_spark.queries.round8 import (
    dispersion_profile,
    haar_energy,
    hill_tail,
    km_survival,
    type_entropy,
)


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


def _orders_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


# ---------------------------------------------------------------------------
# Haar energy


def _haar_python(series):
    """series: dict hour_index -> cents value (missing = 0)."""
    if not series:
        return {}
    lo = min(series)
    rb = {h - lo: y for h, y in series.items()}
    out = {}
    for l, half, width in ((1, 1, 2), (2, 2, 4), (3, 4, 8), (4, 8, 16)):
        det: dict = {}
        for r, y in rb.items():
            s = y if (r // half) % 2 == 0 else -y
            det[r // width] = det.get(r // width, 0) + s
        out[l] = (len(det), sum(d * d for d in det.values()))
    return out


def test_haar_energy_matches_pure_python(spark):
    rng = random.Random(5)
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    series: dict = {1: {}, 2: {}}
    # user 1: alternating high/low every hour (level-1 energy dominates)
    for h in range(0, 48):
        v = 10.0 if h % 2 == 0 else 0.0
        rows.append((eid, 1, base + datetime.timedelta(hours=h), "a", v)); eid += 1
        series[1][h] = series[1].get(h, 0) + int(round(v * 100))
    # user 2: random values on a gappy grid (some hours missing)
    for h in range(0, 80):
        if rng.random() < 0.4:
            continue
        v = rng.uniform(-5, 5)
        rows.append((eid, 2, base + datetime.timedelta(hours=h), "a", v)); eid += 1
        series[2][h] = series[2].get(h, 0) + int(round(v * 100))
    out: dict = {}
    for r in haar_energy(_events_df(spark, rows)).collect():
        out[(r.user_id, r.level)] = r
    for u, s in series.items():
        py = _haar_python(s)
        tot = sum(e for _, e in py.values())
        for l, (nb, en) in py.items():
            r = out[(u, l)]
            assert r.n_blocks == nb and r.energy == en
            if tot > 0:
                assert r.energy_share == pytest.approx(round(en / tot, 6), abs=1e-9)
    # the alternating square wave concentrates energy at level 1
    assert out[(1, 1)].energy_share > 0.9


# ---------------------------------------------------------------------------
# dispersion


def test_dispersion_poisson_vs_clustered(spark):
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # user 1: exactly one event every hour for 100 hours -> D = 0
    for h in range(100):
        rows.append((eid, 1, base + datetime.timedelta(hours=h), "a", 1.0)); eid += 1
    # user 2: 100 events all in hour 0, then one in hour 99 (clustered)
    for _ in range(100):
        rows.append((eid, 2, base + datetime.timedelta(minutes=1), "a", 1.0)); eid += 1
    rows.append((eid, 2, base + datetime.timedelta(hours=99), "a", 1.0)); eid += 1
    out = {r.user_id: r for r in dispersion_profile(_events_df(spark, rows)).collect()}

    r1 = out[1]
    assert r1.n_buckets == 100 and r1.n_events == 100
    assert r1.mean_per_hour == 1.0
    assert r1.dispersion == 0.0 and not r1.overdispersed

    # pure-python check for user 2 (zeros over the span included)
    counts = [0] * 100
    counts[0] = 100
    counts[99] = 1
    n = len(counts)
    t = sum(counts)
    mean = t / n
    var = sum(c * c for c in counts) / n - mean * mean
    r2 = out[2]
    assert r2.n_buckets == 100 and r2.n_events == 101
    assert r2.dispersion == pytest.approx(round(var / mean, 6), abs=1e-6)
    assert r2.overdispersed


# ---------------------------------------------------------------------------
# entropy


def test_type_entropy_matches_pure_python(spark):
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    mixes = {1: {"a": 10, "b": 10, "c": 10, "d": 10},  # uniform
             2: {"a": 97, "b": 1, "c": 1, "d": 1},      # near-degenerate
             3: {"a": 40}}                                # single type
    for u, mix in mixes.items():
        for t, c in mix.items():
            for i in range(c):
                rows.append((eid, u, base + datetime.timedelta(minutes=eid), t, 1.0)); eid += 1
    out = {r.user_id: r for r in type_entropy(_events_df(spark, rows)).collect()}
    for u, mix in mixes.items():
        n = sum(mix.values())
        h = math.log(n) - sum(c * math.log(c) for c in mix.values()) / n
        r = out[u]
        assert r.n_events == n and r.k_types == len(mix)
        assert r.entropy_nats == pytest.approx(round(h, 6), abs=1e-9)
        assert r.perplexity == pytest.approx(round(math.exp(h), 6), abs=1e-6)
        if len(mix) > 1:
            assert r.entropy_norm == pytest.approx(round(h / math.log(len(mix)), 6), abs=1e-6)
        else:
            assert r.entropy_norm is None
    assert out[1].entropy_norm == pytest.approx(1.0)
    assert out[3].entropy_nats == 0.0 and out[3].perplexity == 1.0
    assert out[1].entropy_nats > out[2].entropy_nats


# ---------------------------------------------------------------------------
# Kaplan-Meier


def _km_python(durations):
    """durations: list of (dur, event_bool). Returns rows keyed by dur."""
    from collections import defaultdict

    d = defaultdict(int)
    c = defaultdict(int)
    for dur, ev in durations:
        (d if ev else c)[dur] += 1
    grid = sorted(set(d) | set(c))
    total = len(durations)
    seen = 0
    surv = 1.0
    rows = {}
    for t in grid:
        n_risk = total - seen
        de, ce = d.get(t, 0), c.get(t, 0)
        if de > 0:
            surv *= (n_risk - de) / n_risk
        rows[t] = (n_risk, de, ce, (de / n_risk) if de else None, surv)
        seen += de + ce
    return rows


def test_km_survival_matches_pure_python(spark):
    """Three customers with known order dates; the censored tail from
    each last order to the global max date must enter the risk set."""
    d0 = datetime.datetime(2024, 1, 1)

    def day(i):
        return d0 + datetime.timedelta(days=i)

    # cust 1 orders at days 0,10,30 -> gaps 10,20; censored 70 (to day 100)
    # cust 2 orders at days 0,20    -> gap 20; censored 80
    # cust 3 orders at day 100 only -> censored 0
    orders = [(1, 1, day(0)), (2, 1, day(10)), (3, 1, day(30)),
              (4, 2, day(0)), (5, 2, day(20)), (6, 3, day(100))]
    rows = [(ok, ck, "O", 100.0, ts, "1-URGENT") for ok, ck, ts in orders]
    out = {r.dur_days: r for r in km_survival(_orders_df(spark, rows)).collect()}

    py = _km_python([(10, True), (20, True), (20, True),
                     (70, False), (80, False), (0, False)])
    assert set(out) == set(py)
    for t, (n_risk, de, ce, hz, surv) in py.items():
        r = out[t]
        assert (r.n_risk, r.d_event, r.c_censored) == (n_risk, de, ce)
        if hz is None:
            assert r.hazard is None
        else:
            assert r.hazard == pytest.approx(round(hz, 6), abs=1e-9)
        assert r.survival == pytest.approx(round(surv, 6), abs=1e-6)
    # spot-check the known curve: the day-0 censoring leaves the risk
    # set before t=10, so S(10) = 4/5 and S(20) = 4/5 * 2/4 = 0.4
    assert out[10].survival == pytest.approx(0.8, abs=1e-6)
    assert out[20].survival == pytest.approx(0.4, abs=1e-6)


def test_km_survival_curve_hits_zero(spark):
    """If the largest duration is an event (no censored tail beyond
    it), survival must be exactly 0 there, not exp(-inf) noise."""
    d0 = datetime.datetime(2024, 1, 1)
    # one customer, two orders: gap 5 is an event; censored tail is 0
    # days (last order = max date), so at t=5 the risk set is exhausted
    # by the event... build 2 customers to get d=n at the last time.
    rows = [(1, 1, "O", 1.0, d0, "x"),
            (2, 1, "O", 1.0, d0 + datetime.timedelta(days=5), "x"),
            (3, 2, "O", 1.0, d0, "x"),
            (4, 2, "O", 1.0, d0 + datetime.timedelta(days=5), "x")]
    out = {r.dur_days: r for r in km_survival(_orders_df(spark, rows)).collect()}
    # durations: events {5:2}, censored {0:2}; at t=5 n_risk=2=d -> S=0
    assert out[5].survival == 0.0
    assert out[0].survival == 1.0


# ---------------------------------------------------------------------------
# Hill tail index


def test_hill_tail_matches_pure_python_pareto(spark):
    """On exact Pareto(alpha) samples (inverse-CDF on a deterministic
    grid) the Hill estimate recovers alpha closely, and it matches the
    pure-python formula exactly."""
    rows = []
    okey = 0
    for pname, alpha in (("A", 1.5), ("B", 3.0)):
        for i in range(1, 402):  # 401 values, need >= 101
            u = i / 402.0
            x = (1.0 - u) ** (-1.0 / alpha)  # Pareto(1, alpha)
            rows.append((okey, okey % 7, "O", x * 100.0,
                         datetime.datetime(2024, 1, 1), pname))
            okey += 1
    out = {r.o_orderpriority: r for r in hill_tail(_orders_df(spark, rows)).collect()}

    by_p: dict = {}
    for r in rows:
        by_p.setdefault(r[5], []).append((r[3], r[0]))
    for pname, alpha in (("A", 1.5), ("B", 3.0)):
        xs = sorted(by_p[pname], key=lambda t: (-t[0], -t[1]))
        thr = xs[100][0]
        slog = sum(math.log(x / thr) for x, _ in xs[:100])
        est = 100.0 / slog
        r = out[pname]
        assert r.k_top == 100
        assert r.threshold == pytest.approx(thr, abs=1e-9)
        assert r.alpha == pytest.approx(round(est, 6), abs=1e-5)
        assert r.alpha == pytest.approx(alpha, rel=0.25)  # estimator sanity
    # heavier tail -> smaller alpha
    assert out["A"].alpha < out["B"].alpha


def test_hill_tail_salt_invariance(spark):
    """The salted two-stage top-k must give identical output for any
    salt width (correctness never depends on the hash)."""
    rng = random.Random(9)
    rows = [(i, i % 11, "O", rng.uniform(1, 1e6),
             datetime.datetime(2024, 1, 1), "P") for i in range(300)]
    df = _orders_df(spark, rows)
    a = hill_tail(df, k_top=50, salt=1).collect()
    b = hill_tail(df, k_top=50, salt=64).collect()
    c = hill_tail(df, k_top=50, salt=7).collect()
    assert a == b == c
    # groups smaller than k+1 drop out entirely
    assert hill_tail(df, k_top=400).collect() == []


# ---------------------------------------------------------------------------
# AR(1) fit


def test_ar1_recovers_known_process(spark):
    """A synthetic AR(1) series (phi=0.6) on a dense hourly grid: the
    fitted phi matches numpy's lstsq on the same (lagged, current)
    cent pairs, and half-life follows -ln2/ln(phi)."""
    import numpy as np

    rng = random.Random(21)
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    vals = {}
    y = 0.0
    for h in range(400):
        y = 0.6 * y + rng.gauss(0, 5)
        v = 100.0 + y
        rows.append((eid, 1, base + datetime.timedelta(hours=h), "a", v)); eid += 1
        vals[h] = int(round(v * 100))
    # user 2: a 3-hour gap breaks pairs (only consecutive hours pair)
    for h in (0, 1, 2, 6, 7):
        rows.append((eid, 2, base + datetime.timedelta(hours=h), "a", float(h))); eid += 1
    from tsod_spark.queries.round8 import ar1_fit

    out = {r.user_id: r for r in ar1_fit(_events_df(spark, rows)).collect()}

    xs = np.array([vals[h - 1] for h in range(1, 400)], dtype=float)
    ys = np.array([vals[h] for h in range(1, 400)], dtype=float)
    phi, c = np.polyfit(xs, ys, 1)
    r1 = out[1]
    assert r1.n_pairs == 399
    assert r1.phi == pytest.approx(phi, abs=1e-4)
    assert r1.half_life_hours == pytest.approx(-math.log(2) / math.log(r1.phi), abs=1e-4)
    assert r1.longrun_mean_cents == pytest.approx(c / (1 - phi), abs=1.0)
    assert 0.4 < r1.phi < 0.8  # recovers the generating coefficient

    # user 2: pairs are (0,1),(1,2),(6,7) -> 3 pairs, gap rows excluded
    assert out[2].n_pairs == 3


def test_ar1_degenerate_constant_series(spark):
    """Constant values give dx=0 -> phi and friends all null (and the
    plan must not raise ANSI divide-by-zero evaluating the guards)."""
    base = datetime.datetime(2024, 1, 1)
    rows = [(i, 1, base + datetime.timedelta(hours=i), "a", 5.0) for i in range(4)]
    from tsod_spark.queries.round8 import ar1_fit

    r = ar1_fit(_events_df(spark, rows)).collect()[0]
    assert r.n_pairs == 3
    assert r.phi is None and r.half_life_hours is None
    assert r.longrun_mean_cents is None


# ---------------------------------------------------------------------------
# skyline


def test_skyline_matches_brute_force(spark):
    """Random (price, size) clouds vs the O(n^2) dominance definition,
    including exact ties on both objectives."""
    from tsod_spark.queries.round8 import skyline_2d

    rng = random.Random(13)
    rows = []
    for i in range(200):
        price = round(rng.uniform(1, 50), 2)
        size = rng.randint(1, 30)
        rows.append((i, f"B{i % 5}", f"t", size, price))
    # exact tie pair: identical (price, size) -> both survive or both die
    rows.append((900, "B1", "t", 25, 2.5))
    rows.append((901, "B2", "t", 25, 2.5))
    df = spark.createDataFrame(
        rows, "p_partkey long, p_brand string, p_type string, "
              "p_size int, p_retailprice double"
    )
    got = {r.p_partkey for r in skyline_2d(df).collect()}

    pts = {k: (int(round(p * 100)), s) for k, _, _, s, p in rows}
    expect = set()
    for k, (pc, sz) in pts.items():
        dominated = any(
            (pc2 < pc and sz2 >= sz) or (pc2 <= pc and sz2 > sz)
            for k2, (pc2, sz2) in pts.items() if k2 != k
        )
        if not dominated:
            expect.add(k)
    assert got == expect
    # ties: 900/901 share fate
    assert (900 in got) == (901 in got)


# ---------------------------------------------------------------------------
# Zipf fit


def test_zipf_fit_exact_power_law(spark):
    """A corpus built so token t_r appears exactly round(C / r^s) times
    recovers s with tight R^2; moments match a numpy lstsq on the same
    (ln rank, ln count) points."""
    import numpy as np

    from tsod_spark.queries.round8 import zipf_fit

    s_true, C, V = 1.0, 2000, 60
    words = []
    counts = {}
    for r in range(1, V + 1):
        c = max(1, int(round(C / r ** s_true)))
        counts[f"w{r:04d}"] = c
        words.extend([f"w{r:04d}"] * c)
    rng = random.Random(3)
    rng.shuffle(words)
    # split into 20 documents
    docs = []
    step = len(words) // 20 + 1
    for i in range(20):
        chunk = words[i * step:(i + 1) * step]
        if chunk:
            docs.append((i, " ".join(chunk), "src"))
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    row = zipf_fit(df, k_fit=50).collect()[0]

    assert row.total_tokens == sum(counts.values())
    assert row.vocab_size == V
    assert row.k_fit == 50
    # top-50 by (count desc, token desc) — the engines' tie order
    ranked = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]), reverse=True)
    top = ranked[:50]
    x = np.log(np.arange(1, 51, dtype=float))
    y = np.log(np.array([c for _, c in top], dtype=float))
    slope, _ = np.polyfit(x, y, 1)
    assert row.zipf_s == pytest.approx(-slope, abs=1e-4)
    assert row.zipf_s == pytest.approx(s_true, abs=0.15)
    assert row.r2 > 0.97


# ---------------------------------------------------------------------------
# Welch t-test


def test_welch_ttest_matches_scipy_formula(spark):
    """Each type-vs-rest t and Welch df matches a pure-python Welch
    computation on the cents values; a shifted group flags."""
    rng = random.Random(17)
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    vals: dict = {"a": [], "b": [], "c": []}
    for t, mu in (("a", 100.0), ("b", 100.0), ("c", 130.0)):  # c shifted
        for _ in range(80):
            v = mu + rng.gauss(0, 10)
            rows.append((eid, eid % 7, base + datetime.timedelta(minutes=eid), t, v))
            vals[t].append(int(round(v * 100)))
            eid += 1
    from tsod_spark.queries.round8 import welch_ttest

    out = {r.event_type: r for r in welch_ttest(_events_df(spark, rows)).collect()}

    def welch(g, rest):
        n1, n2 = len(g), len(rest)
        m1, m2 = sum(g) / n1, sum(rest) / n2
        v1 = sum((x - m1) ** 2 for x in g) / (n1 - 1)
        v2 = sum((x - m2) ** 2 for x in rest) / (n2 - 1)
        se2 = v1 / n1 + v2 / n2
        t = (m1 - m2) / math.sqrt(se2)
        df = se2 ** 2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
        return t, df

    for t in ("a", "b", "c"):
        rest = [x for k, xs in vals.items() if k != t for x in xs]
        tt, df = welch(vals[t], rest)
        r = out[t]
        assert r.n_group == len(vals[t])
        assert r.t_stat == pytest.approx(tt, abs=1e-4)
        assert r.welch_df == pytest.approx(df, rel=1e-4)
        assert r.mean_shift_flag == (abs(tt) > 1.96)
    # the deliberately shifted group flags (note: vs-REST testing also
    # flags the unshifted groups here, since their rest pool CONTAINS
    # the shifted group — that asymmetry is inherent to one-vs-rest)
    assert out["c"].mean_shift_flag


# ---------------------------------------------------------------------------
# cross-type correlation


def test_type_corr_matches_numpy(spark):
    """Pairwise Pearson on hourly totals vs numpy.corrcoef, including a
    constructed anti-correlated pair."""
    import numpy as np

    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    rng = random.Random(23)
    xs = [rng.uniform(10, 50) for _ in range(60)]
    series = {"a": xs, "b": [60 - x + rng.uniform(-1, 1) for x in xs],
              "c": [rng.uniform(10, 50) for _ in range(60)]}
    for h in range(60):
        for t, v in series.items():
            rows.append((eid, 1, base + datetime.timedelta(hours=h), t, v[h])); eid += 1
    from tsod_spark.queries.round8 import type_corr

    out = {(r.type_a, r.type_b): r for r in type_corr(_events_df(spark, rows)).collect()}
    cents = {t: np.array([int(round(v * 100)) for v in vs], dtype=float)
             for t, vs in series.items()}
    for (ta, tb), r in out.items():
        expect = float(np.corrcoef(cents[ta], cents[tb])[0, 1])
        assert r.n_hours == 60
        assert r.pearson_r == pytest.approx(expect, abs=1e-6)
    assert out[("a", "b")].pearson_r < -0.9
    assert abs(out[("a", "c")].pearson_r) < 0.5


# ---------------------------------------------------------------------------
# record statistics


def test_record_stats_known_sequences(spark):
    """Hand-counted records: a strictly increasing series has n high
    records and 1 low record; ties are not records; the expected-count
    formula matches the harmonic approximation."""
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    inc = [1.0, 2.0, 3.0, 4.0, 5.0]           # user 1: all highs
    tie = [5.0, 5.0, 5.0]                     # user 2: ties never count
    mix = [3.0, 1.0, 4.0, 1.0, 5.0, 2.0]      # user 3: hand-counted
    for u, seq in ((1, inc), (2, tie), (3, mix)):
        for i, v in enumerate(seq):
            rows.append((eid, u, base + datetime.timedelta(minutes=i), "a", v)); eid += 1
    from tsod_spark.queries.round8 import record_stats

    out = {r.user_id: r for r in record_stats(_events_df(spark, rows)).collect()}
    assert (out[1].hi_records, out[1].lo_records) == (5, 1)
    assert (out[2].hi_records, out[2].lo_records) == (1, 1)
    # mix: highs at 3,4,5 -> 3; lows at 3,1 -> 2
    assert (out[3].hi_records, out[3].lo_records) == (3, 2)
    gamma = 0.5772156649015329
    for u, seq in ((1, inc), (2, tie), (3, mix)):
        n = len(seq)
        exp = math.log(n) + gamma + 1 / (2 * n)
        assert out[u].expected_records == pytest.approx(round(exp, 6), abs=1e-9)
        assert out[u].hi_ratio == pytest.approx(out[u].hi_records / exp, abs=1e-5)


# ---------------------------------------------------------------------------
# lexical diversity


def test_lexical_diversity_matches_pure_python(spark):
    from tsod_spark.queries.round8 import lexical_diversity

    docs = [
        (1, "the cat sat on the mat", "natural"),
        (2, "a dog ran past the cat quickly", "natural"),
        (3, "buy now buy now buy now buy now", "spam"),
        (4, "buy now buy now limited offer", "spam"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = {r.source: r for r in lexical_diversity(df).collect()}

    from collections import Counter

    for src in ("natural", "spam"):
        toks = [w for d, t, s in docs if s == src for w in t.lower().split()]
        cnt = Counter(toks)
        n, v = len(toks), len(cnt)
        hapax = sum(1 for c in cnt.values() if c == 1)
        r = out[src]
        assert (r.n_tokens, r.vocab, r.hapax) == (n, v, hapax)
        assert r.ttr == pytest.approx(round(v / n, 6), abs=1e-9)
        assert r.hapax_share == pytest.approx(round(hapax / v, 6), abs=1e-9)
        assert r.herdan_c == pytest.approx(round(math.log(v) / math.log(n), 6), abs=1e-9)
    # natural text is more diverse than template spam on every metric
    assert out["natural"].ttr > out["spam"].ttr
    assert out["natural"].hapax_share > out["spam"].hapax_share


# ---------------------------------------------------------------------------
# in-flight backlog (sweep line)


def test_orders_in_flight_known_intervals(spark):
    """Hand-built intervals: the running open count must equal the
    number of (orderdate <= day < shipdate]-style coverage implied by
    the +1/-1 sweep at every grid day."""
    d0 = datetime.datetime(2024, 1, 1)

    def day(i):
        return d0 + datetime.timedelta(days=i)

    # (orderkey, orderdate_day, [shipdate_days...]) — one lineitem per ship
    spec = [(1, 0, [2, 5]), (2, 1, [2]), (3, 4, [9]), (4, 4, [4])]
    orders, lineitems, lk = [], [], 0
    for ok, od, ships in spec:
        orders.append((ok, 1, "O", 10.0, day(od), "x"))
        for sd in ships:
            lineitems.append((ok, 1, 1, lk, 1.0, 1.0, 0.0, 0.0, "N", "O", day(sd)))
            lk += 1
    odf = spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    ldf = spark.createDataFrame(
        lineitems,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    from tsod_spark.queries.round8 import in_flight

    out = {r.day.isoformat(): (r.starts, r.ends, r.open_items)
           for r in in_flight(ldf, odf).collect()}

    # pure-python sweep over the same deltas
    from collections import defaultdict

    deltas: dict = defaultdict(lambda: [0, 0])
    for ok, od, ships in spec:
        for sd in ships:
            deltas[od][0] += 1
            deltas[sd][1] += 1
    run = 0
    for dd in sorted(deltas):
        s, e = deltas[dd]
        run += s - e
        key = day(dd).date().isoformat()
        assert out[key] == (s, e, run), (spec, dd)
    assert set(out) == {day(dd).date().isoformat() for dd in deltas}
    # the +1/-1 sweep conserves: final open count is zero
    assert run == 0


# ---------------------------------------------------------------------------
# inverted-index jaccard engine


def test_jaccard_index_matches_allpairs_engine(spark):
    """jaccard_pairs_index must produce exactly the all-pairs engine's
    Jaccard for every pair sharing >= 1 gram, and omit only
    zero-overlap pairs."""
    from tsod_spark.pipeline.dedup import jaccard_pairs, jaccard_pairs_index

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(40):
        n = rng.randint(2, 12)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n)),
                     f"s{i % 3}"))
    # plus an exact duplicate pair and a disjoint-vocabulary doc
    docs.append((100, docs[0][1], "s0"))
    docs.append((101, "zz yy xx ww vv", "s0"))
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")

    full = {(r.doc_a, r.doc_b): r.jaccard
            for r in jaccard_pairs(df, top_n=None).collect()}
    idx = {(r.doc_a, r.doc_b): r.jaccard
           for r in jaccard_pairs_index(df).collect()}

    # every indexed pair matches the all-pairs value exactly
    for k, v in idx.items():
        assert full[k] == v, k
    # pairs missing from the index are exactly the zero-overlap ones
    for k, v in full.items():
        if k not in idx:
            assert v == 0.0, k
    # the exact duplicate registers at 1.0
    assert idx[(0, 100)] == 1.0


def test_jaccard_index_hot_gram_cap(spark):
    """With max_gram_docs, grams owned by more docs than the cap are
    dropped whole: intersection counts shrink only by those grams, and
    below-cap behavior is bit-identical to the uncapped engine."""
    from tsod_spark.pipeline.dedup import jaccard_pairs_index

    # 5 docs all share the word pair "aa bb"; docs 1 and 2 also share
    # a rare pair "cc dd"
    docs = [
        (1, "aa bb cc dd", "s"),
        (2, "aa bb cc dd", "s"),
        (3, "aa bb xx yy", "s"),
        (4, "aa bb zz qq", "s"),
        (5, "aa bb pp rr", "s"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    uncapped = {(r.doc_a, r.doc_b): r.jaccard
                for r in jaccard_pairs_index(df).collect()}
    capped = {(r.doc_a, r.doc_b): r.jaccard
              for r in jaccard_pairs_index(df, max_gram_docs=3).collect()}
    # uncapped: every pair shares "aa bb"; (1,2) shares all 3 bigrams
    assert uncapped[(1, 2)] == 1.0
    assert len(uncapped) == 10
    # capped at 3: the "aa bb" bigram (5 owners) is dropped whole;
    # only (1,2) still intersects (via "bb cc", "cc dd")
    assert set(capped) == {(1, 2)}
    # the surviving pair's intersection shrank by exactly the capped
    # gram: 2 shared of (3 + 3 - 2) = 0.5
    assert capped[(1, 2)] == 0.5


# ---------------------------------------------------------------------------
# contingency residuals


def test_contingency_residuals_match_pure_python(spark):
    """Standardized Pearson residuals vs a hand-computed contingency
    table, including a month with a deliberately skewed mix."""
    rng = random.Random(41)
    rows, ok = [], 0
    prios = ["1-URGENT", "2-HIGH", "3-LOW"]
    for m in range(1, 4):  # three months, balanced
        for p in prios:
            for _ in range(30):
                rows.append((ok, ok % 9, "O", 10.0,
                             datetime.datetime(2024, m, 1 + rng.randint(0, 27)), p))
                ok += 1
    for _ in range(60):  # month 4: all urgent
        rows.append((ok, ok % 9, "O", 10.0,
                     datetime.datetime(2024, 4, 1 + rng.randint(0, 27)), "1-URGENT"))
        ok += 1
    from tsod_spark.queries.round8 import contingency_residuals

    df = _orders_df(spark, rows)
    out = {(r.ym, r.prio): r for r in contingency_residuals(df).collect()}

    from collections import Counter

    cells = Counter()
    for _, _, _, _, ts, p in rows:
        cells[(f"2024-{ts.month:02d}", p)] += 1
    row_t = Counter()
    col_t = Counter()
    for (ym, p), n in cells.items():
        row_t[ym] += n
        col_t[p] += n
    grand = sum(cells.values())
    for (ym, p), n in cells.items():
        e = row_t[ym] * col_t[p] / grand
        resid = (n - e) / math.sqrt(e)
        r = out[(ym, p)]
        assert r.n_orders == n
        assert r.expected == pytest.approx(round(e, 6), abs=1e-9)
        assert r.std_residual == pytest.approx(resid, abs=1e-5)
        assert r.cell_flag == (abs(resid) > 3.0)
    # the skewed month flags its urgent cell upward
    assert out[("2024-04", "1-URGENT")].std_residual > 3.0


# ---------------------------------------------------------------------------
# Holt-Winters


def test_holt_winters_matches_pure_python_and_learns_season(spark):
    """The triple recurrence matches a pure-python implementation
    bit-for-bit (dyadic constants), stays calendar-anchored across a
    gap, and on a clean daily cycle the learned seasonals separate the
    high and low hours."""
    from tsod_spark.analytics.temporal import holt_winters

    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    hbs = []
    for h in range(120):
        if 50 <= h < 74:  # a full missing day
            continue
        v = 100.0 + (25.0 if (h % 24) in (9, 10, 11) else 0.0)
        rows.append((eid, 1, base + datetime.timedelta(hours=h), "a", v))
        hbs.append((h, int(round(v * 100))))
        eid += 1
    out = {r.hour_bucket: r for r in holt_winters(_events_df(spark, rows)).collect()}

    base_hb = int(base.timestamp() // 3600)
    s = [0.0] * 24
    l, t = float(hbs[0][1]), 0.0
    expect = {hbs[0][0]: (l, t, 0.0)}
    for h, yc in hbs[1:]:
        hh = (base_hb + h) % 24
        y = float(yc)
        nl = 0.5 * (y - s[hh]) + 0.5 * (l + t)
        t = 0.25 * (nl - l) + 0.75 * t
        s[hh] = 0.25 * (y - nl) + 0.75 * s[hh]
        l = nl
        expect[h] = (l, t, s[hh])
    assert len(out) == len(expect)
    for h, (el, et, es) in expect.items():
        r = out[base_hb + h]
        assert r.level == el and r.trend == et and r.season == es, h
    # after several days the 9-11h slots carry clearly positive season,
    # separated from every other slot (alpha=0.5 absorbs much of the
    # spike into level, so magnitudes stay modest — separation is the
    # robust claim)
    last_s = s
    hi = [(base_hb + 9) % 24, (base_hb + 10) % 24, (base_hb + 11) % 24]
    others = [x for i, x in enumerate(last_s) if i not in hi]
    # (slots right AFTER the spike legitimately learn NEGATIVE season
    # — the elevated level overshoots them — so compare signed values:
    # the high hours must be the most positive slots)
    assert min(last_s[i] for i in hi) > 100
    assert min(last_s[i] for i in hi) > max(others)


def test_hw_anomaly_flags_off_cycle_burst(spark):
    """A value that is NORMAL for hour 9 but appears at hour 3 breaks
    the seasonal forecast and flags, even though a raw range/zscore
    screen would pass it; the same value at hour 9 does not flag."""
    from tsod_spark.queries._base import table as _t  # noqa: F401
    from tsod_spark.analytics.temporal import holt_winters
    from pyspark.sql import functions as F, Window

    rng = random.Random(8)
    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)
    burst_h = None
    # small noise keeps the MAD realistic; 16 days let the gamma=0.25
    # seasonal converge before the burst
    for h in range(24 * 16):
        v = 100.0 + (50.0 if (h % 24) == 9 else 0.0) + rng.uniform(-2, 2)
        if h == 24 * 14 + 3:  # day 15, 03:00 — inject the 9am-sized value
            v = 150.0
            burst_h = h
        rows.append((eid, 1, base + datetime.timedelta(hours=h), "a", v)); eid += 1

    hw = holt_winters(_events_df(spark, rows))
    rr = hw.where(F.col("forecast").isNotNull()).select(
        "user_id", "hour_bucket", "bucket_cents", "forecast",
        (F.col("bucket_cents") - F.col("forecast")).alias("resid"))
    w = Window.partitionBy("user_id")
    r2 = rr.withColumn("mad", F.expr("percentile(abs(resid), 0.5)").over(w))
    out = {r.hour_bucket: r for r in r2.collect()}
    base_hb = int(base.timestamp() // 3600)

    def flagged(h):
        r = out[base_hb + h]
        return abs(r.resid) > 5 * r.mad if r.mad > 0 else abs(r.resid) > 0

    assert flagged(burst_h)                       # off-cycle burst
    # BEFORE the burst, the same 150 value at its proper 9am slot does
    # not flag, and the steady-state day flags nothing (post-burst
    # hours legitimately flag during the level/trend recovery
    # transient — a real property of forecast-residual detection)
    assert not flagged(24 * 13 + 9)
    assert not any(flagged(h) for h in range(24 * 13, 24 * 14))


def test_peaks_known_shapes(spark):
    """Hand-built series: an isolated spike is a peak, a dip is a
    valley, a two-bucket tie kills both candidates, and a spike too
    close to a larger one is suppressed."""
    from tsod_spark.queries.round8 import peaks

    rows, eid = [], 0
    base = datetime.datetime(2024, 1, 1)

    def put(u, h, v):
        nonlocal eid
        rows.append((eid, u, base + datetime.timedelta(hours=h), "a", v))
        eid += 1

    # user 1: flat 10, spike 40 at h=10, dip -20 at h=20
    for h in range(30):
        put(1, h, {10: 40.0, 20: -20.0}.get(h, 10.0))
    # user 2: equal twin spikes 2h apart (tie within the +-3 frame)
    for h in range(30):
        put(2, h, 40.0 if h in (10, 12) else 10.0)
    # user 3: spike 30 at h=10 right next to larger spike 50 at h=12
    for h in range(30):
        put(3, h, {10: 30.0, 12: 50.0}.get(h, 10.0))

    out = {(r.user_id, r.hour_bucket % 1000000): r
           for r in peaks(_events_df(spark, rows)).collect()}
    bb = int(base.timestamp() // 3600) % 1000000
    kinds = {(u, h - bb): r.kind for (u, h), r in out.items()}

    assert kinds.get((1, 10)) == "peak"
    assert kinds.get((1, 20)) == "valley"
    # tie: neither twin is a unique max
    assert not any(u == 2 for (u, _h) in kinds)
    # user 3: only the larger spike survives; the smaller is in its
    # +-3 shadow (not its window's max)
    assert kinds.get((3, 12)) == "peak"
    assert (3, 10) not in kinds


# ---------------------------------------------------------------------------
# centroid silhouette


def test_label_silhouette_separated_vs_overlapping(spark):
    """Well-separated clusters score near 1, overlapping clusters near
    0; values match a pure-python centroid-silhouette on the same
    quantized centroids."""
    from tsod_spark.queries.similarity import emb_label_silhouette
    import tsod_spark.queries._base as _b

    rng = random.Random(51)
    rows = []
    vid = 0
    # labels 0/1: far apart; labels 2/3: same region (overlap)
    centers = {0: [0.0, 0.0, 0.0, 0.0], 1: [1.0, 1.0, 1.0, 1.0],
               2: [0.5, 0.5, 0.5, 0.5], 3: [0.52, 0.48, 0.5, 0.5]}
    spread = {0: 0.02, 1: 0.02, 2: 0.3, 3: 0.3}
    for lab, c in centers.items():
        for _ in range(40):
            v = [x + rng.uniform(-spread[lab], spread[lab]) for x in c]
            rows.append((vid, [float(x) for x in v], lab)); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    import tsod_spark.queries.similarity as simq
    orig = _b.table
    try:
        _b.table = lambda *_a, **_k: df
        simq.table = _b.table
        out = {r.label: r for r in emb_label_silhouette(spark, "x").collect()}
    finally:
        _b.table = orig
        simq.table = orig

    # pure python on float32-cast vectors with 1e-6-quantized centroids
    import numpy as np

    vecs = {lab: [] for lab in centers}
    for _vid, v, lab in rows:
        vecs[lab].append(np.array(v, dtype="float32").astype("float64"))
    cents = {}
    for lab, vs in vecs.items():
        xm = np.round(np.array(vs) * 1e6)
        cents[lab] = np.round(xm.sum(0) / (1e6 * len(vs)), 6)
    sils = {lab: [] for lab in centers}
    for lab, vs in vecs.items():
        for v in vs:
            dists = {l2: math.sqrt(((v - c) ** 2).sum()) for l2, c in cents.items()}
            a = dists[lab]
            b = min(d for l2, d in dists.items() if l2 != lab)
            sils[lab].append((b - a) / max(a, b) if max(a, b) > 0 else 0.0)
    for lab in centers:
        assert out[lab].n_vecs == 40
        assert out[lab].silhouette == pytest.approx(
            round(sum(sils[lab]) / 40, 6), abs=1e-5), lab
    assert out[0].silhouette > 0.9 and out[1].silhouette > 0.9
    assert out[2].silhouette < 0.3 and out[3].silhouette < 0.3


def test_km_segment_summary_matches_pure_python(spark):
    """Median and RMST per segment vs a pure-python KM summary on
    hand-built order histories with censoring."""
    from tsod_spark.queries.round8 import km_segment_summary

    d0 = datetime.datetime(2024, 1, 1)

    def day(i):
        return d0 + datetime.timedelta(days=i)

    # segment A: fast re-orderers; segment B: one slow + one censored
    orders = [
        (1, 1, day(0)), (2, 1, day(5)), (3, 1, day(10)),      # A: gaps 5,5
        (4, 2, day(0)), (5, 2, day(7)),                        # A: gap 7
        (6, 3, day(0)), (7, 3, day(60)),                       # B: gap 60
        (8, 4, day(20)),                                       # B: censored 80
        (9, 5, day(100)),                                      # A: pins horizon
    ]
    seg = {1: "A", 2: "A", 3: "B", 4: "B", 5: "A"}
    odf = _orders_df(spark, [(ok, ck, "O", 1.0, ts, "x") for ok, ck, ts in orders])
    cdf = spark.createDataFrame(
        [(ck, f"c{ck}", 0, 0.0, s) for ck, s in seg.items()],
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    out = {r.c_mktsegment: r for r in km_segment_summary(odf, cdf).collect()}

    def km_summary(durs):
        rows = _km_python(durs)
        med = min((t for t, (_n, de, _c, _h, sv) in rows.items() if sv <= 0.5),
                  default=None)
        rmst, pd_, ps = 0.0, 0, 1.0
        for t in sorted(rows):
            rmst += ps * (t - pd_)
            pd_, ps = t, rows[t][4]
        return (sum(1 for _d, e in durs if e),
                sum(1 for _d, e in durs if not e), med, rmst)

    # A durations: events 5,5,7 + censored tails 90 (cust1), 93
    # (cust2), 0 (cust5)
    a = [(5, True), (5, True), (7, True),
         (90, False), (93, False), (0, False)]
    # B: event 60 + censored 40 (cust3 tail), 80 (cust4)
    b = [(60, True), (40, False), (80, False)]
    for segname, durs in (("A", a), ("B", b)):
        ne, nc, med, rmst = km_summary(durs)
        r = out[segname]
        assert (r.n_events, r.n_censored) == (ne, nc), segname
        assert r.median_gap_days == med, segname
        assert r.rmst_days == pytest.approx(round(rmst, 6), abs=1e-5), segname
