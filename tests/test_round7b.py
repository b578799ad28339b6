"""Round-7 late additions: frequent-pattern mining, theta set algebra,
rank statistics.  Cross-validated against pure-python/pandas
re-implementations (the differential strategy of the property suites).
"""

import datetime
import math
import random

import pytest
from pyspark.sql import functions as F

from tsod_spark.analytics import sketches, temporal
from tsod_spark.pipeline import frequent


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters


def test_mg_fold_invariants_random():
    """MG summary invariants vs exact counts under random folds:
    stored count is a lower bound; any absent item's true count is at
    most N/(k+1); state never exceeds k counters."""
    rng = random.Random(7)
    for trial in range(50):
        k = rng.choice([2, 4, 8])
        vocab = [f"w{i}" for i in range(rng.randint(1, 40))]
        stream = [rng.choice(vocab) for _ in range(rng.randint(0, 500))]
        exact: dict = {}
        for it in stream:
            exact[it] = exact.get(it, 0) + 1
        cnt: dict = {}
        i = 0
        while i < len(stream):
            step = rng.randint(1, 50)
            batch = stream[i : i + step]
            bc: dict = {}
            for it in batch:
                bc[it] = bc.get(it, 0) + 1
            cnt = frequent.mg_fold(cnt, bc, k)
            i += step
        assert len(cnt) <= k
        n = len(stream)
        for it, c in cnt.items():
            assert c <= exact[it]
            assert exact[it] - c <= n / (k + 1)
        for it, c in exact.items():
            if it not in cnt:
                assert c <= n / (k + 1)


def test_heavy_hitters_eviction_exact(spark):
    """End-to-end with k SMALLER than the vocabulary (real eviction
    pressure): the two-pass output still equals the exact GROUP BY /
    HAVING result, because pass 2 re-counts candidates exactly."""
    rng = random.Random(42)
    heavy = [f"h{i}" for i in range(3)]
    rare = [f"r{i}" for i in range(60)]
    items = heavy * 100 + [rng.choice(rare) for _ in range(100)]
    rng.shuffle(items)
    df = spark.createDataFrame([(it,) for it in items], "item string").repartition(4)
    phi = 0.2  # > 1/(k+1) with k=8
    out = frequent.heavy_hitters(df, "item", k=8, phi=phi).collect()
    n = len(items)
    thr = math.ceil(phi * n)
    exact = {}
    for it in items:
        exact[it] = exact.get(it, 0) + 1
    expected = sorted(
        [(it, c) for it, c in exact.items() if c >= thr],
        key=lambda t: (-t[1], t[0]),
    )
    assert [(r.item, r.cnt) for r in out] == expected
    for r in out:
        assert r.support == pytest.approx(
            math.floor(abs(r.cnt / n) * 1e6 + 0.5) / 1e6, abs=0
        )


def test_heavy_hitters_phi_guard(spark):
    df = spark.range(2).select(F.lit("a").alias("item"))
    with pytest.raises(ValueError, match="Misra-Gries"):
        frequent.heavy_hitters(df, "item", k=4, phi=0.1)


# ---------------------------------------------------------------------------
# theta sketch set algebra


def test_theta_set_ops_exact_and_certified(spark):
    rows = []
    for u in range(40):
        rows.append((u, "a"))
        if u % 2 == 0:
            rows.append((u, "b"))
        if u % 3 == 0:
            rows.append((u, "c"))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {
        (r.type_a, r.type_b): r
        for r in sketches.theta_set_ops(df).collect()
    }
    ab = out[("a", "b")]
    assert (ab.exact_intersect, ab.exact_a_not_b, ab.exact_b_not_a) == (20, 20, 0)
    ac = out[("a", "c")]
    assert (ac.exact_intersect, ac.exact_a_not_b, ac.exact_b_not_a) == (14, 26, 0)
    bc = out[("b", "c")]
    assert (bc.exact_intersect, bc.exact_b_not_a) == (7, 7)
    for r in out.values():
        assert r.a_not_b_within_tol and r.b_not_a_within_tol and r.intersect_within_tol


# ---------------------------------------------------------------------------
# association rules


def test_cooccurrence_rules_values(spark):
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"), (2, "y"),  # duplicate event collapses
        (3, "x"),
        (4, "z"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {(r.type_a, r.type_b): r for r in frequent.cooccurrence_rules(df).collect()}
    assert set(out) == {("x", "y"), ("x", "z"), ("y", "z")}
    xy = out[("x", "y")]
    # 4 users total; x:{1,2,3} y:{1,2} both:{1,2}
    assert xy.pair_users == 2
    assert xy.support_pair == pytest.approx(0.5)
    assert xy.conf_a_to_b == pytest.approx(round(2 / 3, 6))
    assert xy.conf_b_to_a == pytest.approx(1.0)
    assert xy.lift == pytest.approx(round(2 * 4 / (3 * 2), 6))
    xz = out[("x", "z")]
    assert xz.pair_users == 0 and xz.lift == 0.0


# ---------------------------------------------------------------------------
# rank statistics


def _mk_events(spark, triples):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (int(i), int(u), t0 + datetime.timedelta(hours=int(h)), float(v))
        for i, (u, h, v) in enumerate(triples)
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def _spearman(xs, ys):
    def avg_ranks(v):
        order = sorted(range(len(v)), key=lambda i: v[i])
        r = [0.0] * len(v)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and v[order[j + 1]] == v[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for t in range(i, j + 1):
                r[order[t]] = avg
            i = j + 1
        return r

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = math.sqrt(sum((a - mx) ** 2 for a in rx)) * math.sqrt(
        sum((b - my) ** 2 for b in ry)
    )
    return num / den


def test_spearman_matches_pure_python(spark):
    rng = random.Random(3)
    triples = []
    for u in (1, 2):
        for h in range(12):
            triples.append((u, h, round(rng.uniform(-5, 5), 2)))
    df = _mk_events(spark, triples)
    out = {r.user_id: r for r in temporal.benchmark_spearman(df).collect()}
    # reconstruct the bucket series in cents exactly as the operator does
    for u in (1, 2):
        xs, ys = [], []
        for h in range(12):
            x = sum(
                int(round(v * 100))
                for (uu, hh, v) in triples
                if uu == u and hh == h
            )
            y = sum(int(round(v * 100)) for (_, hh, v) in triples if hh == h)
            xs.append(x)
            ys.append(y)
        assert out[u].n_buckets == 12
        assert out[u].spearman == pytest.approx(_spearman(xs, ys), abs=1e-6)


def test_runs_test_known_sequence(spark):
    # values alternate far above/below median -> maximal runs
    vals = [10.0, -10.0] * 8  # median 0 interpolated, no ties
    triples = [(1, h, v) for h, v in enumerate(vals)]
    df = _mk_events(spark, triples)
    r = temporal.runs_test(df).collect()[0]
    n1 = n2 = 8
    n = n1 + n2
    runs = 16
    e = 1 + 2 * n1 * n2 / n
    v = (2 * n1 * n2 * (2 * n1 * n2 - n)) / (n * n * (n - 1))
    assert (r.n_pos, r.n_neg, r.runs) == (n1, n2, runs)
    assert r.runs_z == pytest.approx(round((runs - e) / math.sqrt(v), 6), abs=1e-9)


def test_runs_test_excludes_median_ties(spark):
    vals = [1.0, 1.0, 1.0, 5.0, -3.0]  # median 1.0 -> three excluded ties
    triples = [(1, h, v) for h, v in enumerate(vals)]
    df = _mk_events(spark, triples)
    r = temporal.runs_test(df).collect()[0]
    assert (r.n_pos, r.n_neg, r.runs) == (1, 1, 2)


# ---------------------------------------------------------------------------
# distribution drift tests


def test_ks_drift_matches_pure_python(spark):
    from tsod_spark.analytics import stattests

    rng = random.Random(11)
    rows = []
    for i in range(200):
        rows.append((i, 1, datetime.datetime(2024, 1, 1), "a", rng.gauss(0, 1)))
    for i in range(150):
        rows.append((1000 + i, 1, datetime.datetime(2024, 1, 1), "b", rng.gauss(1.0, 1)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {r.event_type: r for r in stattests.ks_drift(df).collect()}

    cents = [(t, int(round(v * 100))) for (_, _, _, t, v) in rows]

    def ecdf_gap(group):
        xs = sorted({c for _, c in cents})
        n1 = sum(1 for t, _ in cents if t == group)
        n2 = len(cents) - n1
        best, best_at = -1.0, None
        c1 = c2 = 0
        for x in xs:
            c1 += sum(1 for t, c in cents if t == group and c == x)
            c2 += sum(1 for t, c in cents if t != group and c == x)
            d = abs(c1 / n1 - c2 / n2)
            if d > best:
                best, best_at = d, x
        return n1, best, best_at

    for grp in ("a", "b"):
        n1, best, best_at = ecdf_gap(grp)
        assert out[grp].n_group == n1
        assert out[grp].ks == pytest.approx(round(best, 6), abs=1e-9)
        assert out[grp].ks_at_cent == best_at
        # a 1-sigma mean shift on 200-vs-150 must reject at alpha=0.05
        assert out[grp].drift_flag


def test_mann_whitney_matches_pure_python(spark):
    from tsod_spark.analytics import stattests

    rng = random.Random(5)
    rows = []
    for i in range(120):
        rows.append((i, 1, datetime.datetime(2024, 1, 1), "a", rng.gauss(0, 1)))
    for i in range(80):
        rows.append((500 + i, 1, datetime.datetime(2024, 1, 1), "b", rng.gauss(0.8, 1)))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {r.event_type: r for r in stattests.mann_whitney(df).collect()}

    cents = [(t, int(round(v * 100))) for (_, _, _, t, v) in rows]
    pooled = sorted(c for _, c in cents)
    n = len(pooled)

    def avg_rank(x):
        lo = sum(1 for c in pooled if c < x)
        t = sum(1 for c in pooled if c == x)
        return lo + (t + 1) / 2

    from collections import Counter

    ties = Counter(pooled)
    big_t = sum(t**3 - t for t in ties.values())
    for grp in ("a", "b"):
        n1 = sum(1 for t, _ in cents if t == grp)
        n2 = n - n1
        r1 = sum(avg_rank(c) for t, c in cents if t == grp)
        u1 = r1 - n1 * (n1 + 1) / 2
        mu = n1 * n2 / 2
        var = n1 * n2 / 12 * ((n + 1) - big_t / (n * (n - 1)))
        z = (u1 - mu) / math.sqrt(var)
        assert out[grp].u2 == int(2 * u1)
        assert out[grp].mw_z == pytest.approx(round(z, 6), abs=1e-6)
        assert out[grp].shift_flag == (abs(z) > 1.96)


def test_theil_sen_matches_pure_python(spark):
    from tsod_spark.analytics import temporal as T

    rng = random.Random(9)
    # user 1: upward trend + noise; user 2: flat with an outlier spike
    triples = []
    for d in range(10):
        triples.append((1, 24 * d, 1.0 * d + rng.uniform(-0.1, 0.1)))
        triples.append((2, 24 * d, 5.0 if d == 4 else 1.0))
    df = _mk_events(spark, triples)
    out = {r.user_id: r for r in T.robust_trend(df).collect()}

    for u in (1, 2):
        daily = {}
        for uu, h, v in triples:
            if uu == u:
                daily[h // 24] = daily.get(h // 24, 0) + int(round(v * 100))
        ds = sorted(daily)
        slopes, s = [], 0
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                dx, dy = ds[j] - ds[i], daily[ds[j]] - daily[ds[i]]
                slopes.append(dy / dx)
                s += (dy > 0) - (dy < 0)
        slopes.sort()
        n = len(slopes)
        h = 0.5 * (n - 1)
        lo = int(h)
        sen = slopes[lo] + (slopes[lo + 1] - slopes[lo]) * (h - lo) if lo + 1 < n else slopes[lo]
        r = out[u]
        assert r.n_days == len(ds)
        assert r.mk_s == s
        assert r.sen_slope == pytest.approx(round(sen, 6), abs=1e-9)
    # the trend user must flag, the outlier-only user must not
    assert out[1].trend_flag
    assert not out[2].trend_flag
    # outlier immunity: user 2's Sen slope is 0 despite the spike
    assert out[2].sen_slope == 0.0


# ---------------------------------------------------------------------------
# classic analytics: Gini + Benford kernels


def test_gini_rank_formula_pure_python(spark):
    """The rank-formula Gini matches the textbook mean-absolute-
    difference definition on a known distribution."""
    import itertools

    # equal distribution -> gini 0; one-holder -> (n-1)/n
    xs_equal = [100, 100, 100, 100]
    xs_skew = [0, 0, 0, 400]

    def gini_rank(xs):
        xs = sorted(xs)
        n = len(xs)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
        return num / (n * sum(xs))

    def gini_mad(xs):
        n = len(xs)
        mu = sum(xs) / n
        mad = sum(abs(a - b) for a, b in itertools.product(xs, xs)) / (n * n)
        return mad / (2 * mu)

    for xs in (xs_equal, xs_skew, [10, 20, 30, 40, 500]):
        assert gini_rank(xs) == pytest.approx(gini_mad(xs), abs=1e-12)
    assert gini_rank(xs_equal) == 0.0
    assert gini_rank(xs_skew) == pytest.approx(0.75)


def test_benford_chi2_conforming_and_violating(spark):
    from tsod_spark.queries.round7 import _BENFORD_P, benford_screen

    # Benford-conforming sample: magnitudes spread log-uniformly
    rng = random.Random(2)
    conforming = [10 ** rng.uniform(0, 3) for _ in range(3000)]
    violating = [5.0 + rng.uniform(0, 0.4) for _ in range(3000)]  # all lead with 5
    rows = []
    for i, v in enumerate(conforming):
        rows.append((i, 1, datetime.datetime(2024, 1, 1), "ok", v))
    for i, v in enumerate(violating):
        rows.append((10_000 + i, 1, datetime.datetime(2024, 1, 1), "bad", v))
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {r.event_type: r for r in benford_screen(df).collect()}
    assert not out["ok"].benford_flag, f"log-uniform sample flagged: chi2={out['ok'].chi2}"
    assert out["bad"].benford_flag
    # chi2 cross-check vs pure python for the violating group
    cents = [int(round(v * 100)) for v in violating]
    digs = [int(str(abs(c))[0]) for c in cents if c != 0]
    n = len(digs)
    chi2 = sum(
        (digs.count(d) - n * p) ** 2 / (n * p)
        for d, p in zip(range(1, 10), _BENFORD_P)
    )
    assert out["bad"].chi2 == pytest.approx(round(chi2, 6), abs=1e-6)
