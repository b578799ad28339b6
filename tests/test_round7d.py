"""Differential tests for the round-7 closers that previously relied
on oracle parity alone (backtest, cohort LTV): synthetic parquet
fixtures are written to a temp sf_dir and driven through the FULL
registered query path (table() ingest included), then cross-checked
against pure-python implementations.
"""

import datetime
import random
import shutil
import tempfile

import pytest

from tsod_spark.queries.round7 import orders_cohort_ltv, ts_backtest_snaive


@pytest.fixture()
def sf_dir(spark):
    d = tempfile.mkdtemp(prefix="r7d_sf_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_backtest_snaive_matches_pure_python(spark, sf_dir):
    """MAE/MASE per series vs a dict-based seasonal-naive backtest,
    with gaps that kill some t-24h lookups (the join must skip them,
    not lag over them)."""
    rng = random.Random(77)
    base = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    series: dict = {1: {}, 2: {}}
    for u in (1, 2):
        for h in range(120):
            if u == 2 and h % 7 == 3:   # punch gaps in user 2
                continue
            v = 50.0 + 10.0 * ((h % 24) / 24.0) + rng.uniform(-1, 1)
            rows.append((eid, u, base + datetime.timedelta(hours=h), "a", v))
            series[u][h] = series[u].get(h, 0) + int(round(v * 100))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    ).write.parquet(f"{sf_dir}/events.parquet")

    out = {r.user_id: r for r in ts_backtest_snaive(spark, sf_dir).collect()}
    for u, buckets in series.items():
        es = [abs(buckets[h] - buckets[h - 24]) for h in buckets if h - 24 in buckets]
        ep = [abs(buckets[h] - buckets[h - 1]) for h in buckets if h - 1 in buckets]
        r = out[u]
        assert r.n_scored == len(es)
        assert r.mae_cents == pytest.approx(round(sum(es) / len(es), 6), abs=1e-6)
        mase = (sum(es) * len(ep)) / (len(es) * sum(ep))
        assert r.mase == pytest.approx(round(mase, 6), abs=1e-6)
    # the seasonal-naive should beat persistence on a daily-cycle
    # series: MASE < 1
    assert out[1].mase < 1.0


def test_cohort_ltv_matches_pure_python(spark, sf_dir):
    """Cohort matrix (sizes, revenue by age, cumulative LTV per
    customer) vs a dict-based roll-up, with customers whose first
    order defines the cohort and revenue landing in later months."""
    d = datetime.datetime
    # (orderkey, custkey, price, date)
    orders = [
        (1, 1, 100.00, d(2024, 1, 5)),   # cust 1: cohort 2024-01
        (2, 1, 50.00, d(2024, 2, 9)),
        (3, 1, 25.50, d(2024, 4, 1)),
        (4, 2, 10.00, d(2024, 1, 20)),   # cust 2: cohort 2024-01
        (5, 2, 10.00, d(2024, 1, 25)),
        (6, 3, 99.99, d(2024, 3, 2)),    # cust 3: cohort 2024-03
        (7, 3, 0.01, d(2024, 5, 30)),
    ]
    spark.createDataFrame(
        [(ok, ck, "O", p, ts, "x") for ok, ck, p, ts in orders],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{sf_dir}/orders.parquet")

    out = {(r.cohort_ym, r.age_months): r
           for r in orders_cohort_ltv(spark, sf_dir).collect()}

    from collections import defaultdict

    ym = lambda ts: ts.year * 12 + ts.month  # noqa: E731
    first: dict = {}
    for _, ck, _, ts in orders:
        first[ck] = min(first.get(ck, 10**9), ym(ts))
    sizes = defaultdict(int)
    for ck, c0 in first.items():
        sizes[c0] += 1
    cells = defaultdict(lambda: [0, 0])
    for _, ck, p, ts in orders:
        key = (first[ck], ym(ts) - first[ck])
        cells[key][0] += 1
        cells[key][1] += int(round(p * 100))
    assert set(out) == set(cells)
    cum = defaultdict(int)
    for (c0, age) in sorted(cells):
        n, rev = cells[(c0, age)]
        cum[c0] += rev
        r = out[(c0, age)]
        assert (r.n_orders, r.revenue_cents, r.cum_revenue_cents) == (n, rev, cum[c0])
        assert r.ltv_cents_per_customer == pytest.approx(
            round(cum[c0] / sizes[c0], 6), abs=1e-9)
    # spot: 2024-01 cohort has 2 customers; age-0 revenue 100+10+10
    c0 = 2024 * 12 + 1
    assert out[(c0, 0)].revenue_cents == 12000
    assert out[(c0, 0)].ltv_cents_per_customer == 6000.0
