"""Datasketches operators: KLL quantile certificates and HLL-union
audience overlap, validated against exact computations on the driver
fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from tsod_spark.analytics import sketches
from tsod_spark.registry import table

SF = "/root/testdata/sf0.001"


def test_kll_quantiles_certificates_hold_and_match_exact(spark):
    """Every in-band boolean must be TRUE (KLL k=200 rank error ~1.65%
    vs the 5%-wide certificate band) and the exact columns must equal
    an independently computed percentile."""
    e = table(spark, SF, "events")
    out = sketches.kll_quantiles(e).collect()
    assert len(out) > 0
    for r in out:
        for p in (50, 95, 99):
            assert r[f"kll_p{p}_in_band"], (r["event_type"], p)
    expect = {
        r["event_type"]: r["x"]
        for r in e.groupBy("event_type")
        .agg(F.round(F.percentile(F.col("value"), F.lit(0.95)), 6).alias("x"))
        .collect()
    }
    for r in out:
        assert r["exact_p95"] == expect[r["event_type"]]


def test_kll_production_projection_estimates_in_band(spark):
    """The sketch-only projection (with_exact=False — what actually
    runs at 100 TB) must estimate within the exact 5% rank band."""
    e = table(spark, SF, "events")
    est = {r["event_type"]: r["kll_p95"] for r in
           sketches.kll_quantiles(e, with_exact=False, probs=(0.95,)).collect()}
    bands = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in e.groupBy("event_type")
        .agg(
            F.percentile(F.col("value"), F.lit(0.90)).alias("lo"),
            F.percentile(F.col("value"), F.lit(1.0)).alias("hi"),
        )
        .collect()
    }
    for t, v in est.items():
        lo, hi = bands[t]
        assert lo <= v <= hi, (t, v, lo, hi)


def test_hll_overlap_certified_and_exact_counts_correct(spark):
    """exact_overlap must equal an independent exact intersection per
    pair; every tolerance certificate must hold (sketches are in
    sparse/exact mode at fixture cardinality)."""
    e = table(spark, SF, "events")
    out = sketches.hll_audience_overlap(e).collect()
    assert len(out) > 0
    d = e.select("event_type", "user_id").distinct().collect()
    by_type: dict[str, set] = {}
    for r in d:
        by_type.setdefault(r.event_type, set()).add(r.user_id)
    for r in out:
        want = len(by_type[r.type_a] & by_type[r.type_b])
        assert r.exact_overlap == want, (r.type_a, r.type_b)
        assert r.overlap_within_tol, (r.type_a, r.type_b)
    # every overlapping unordered pair is present exactly once
    types = sorted(by_type)
    expected_pairs = {
        (a, b)
        for i, a in enumerate(types)
        for b in types[i + 1 :]
        if by_type[a] & by_type[b]
    }
    assert {(r.type_a, r.type_b) for r in out} == expected_pairs
