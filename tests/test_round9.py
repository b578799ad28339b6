"""Round-9 operator tests: PPJoin prefix observability + the
half-up streaming emission helper."""

import math

import pytest
from pyspark.sql import functions as F

from tsod_spark.pipeline import dedup
from tsod_spark.util import py_round6


def test_ppjoin_prefix_stats_adversarial_identical_block(spark):
    """A block of IDENTICAL docs is the prefix filter's worst case:
    every gram has document frequency B, so the df-asc order cannot
    push anything into suffixes and each of the plen prefix grams owns
    a bucket of size B (candidate contribution B^2). The stats frame
    must surface exactly that — and ppjoin_pairs must still return the
    full (exact, output-bound) pair set unchanged."""
    B = 40
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, "src", text) for i in range(B)],
        "doc_id long, source string, text string",
    )
    st = dedup.ppjoin_prefix_stats(docs, thr_pct=90, shingle_n=1).collect()[0]
    # ng = 10 -> plen = 10 - ceil(9.0) + 1 = 2 prefix grams per doc
    assert st.total_buckets == 2
    assert st.total_rows == 2 * B
    assert st.max_bucket_rows == B
    assert st.max_bucket_frac == pytest.approx(0.5)
    # the exact pair output is unaffected by the degenerate prefixes
    pairs = dedup.ppjoin_pairs(docs, thr_pct=90, shingle_n=1).collect()
    assert len(pairs) == B * (B - 1) // 2
    assert all(r.jaccard == 1.0 for r in pairs)


def test_ppjoin_prefix_stats_mixed_corpus(spark):
    """On a corpus with unique grams the buckets stay size ~1 and
    total_rows equals the sum of int64-exact prefix lengths."""
    rows = []
    for i in range(30):
        # each doc: 8 unique grams + 2 shared boilerplate grams
        uniq = " ".join(f"w{i}_{j}" for j in range(8))
        rows.append((i, "s", uniq + " the and"))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    st = dedup.ppjoin_prefix_stats(docs, thr_pct=90, shingle_n=1).collect()[0]
    # ng = 10 -> plen = 2; df-asc puts the two prefix slots on unique
    # grams (df=1), never on "the"/"and" (df=30)
    assert st.total_rows == 60
    assert st.max_bucket_rows == 1
    assert st.total_buckets == 60


def test_ppjoin_pairs_invariant_under_string_tiebreak(spark):
    """r9 changed the prefix tie-break from gram hash to gram string;
    the pair output must equal the plain inverted-index filter at the
    same cut (result-invariance, re-pinned)."""
    rows = []
    for i in range(40):
        base = [f"tok{j}" for j in range(10)]
        if i % 4 == 0:
            base[i % 10] = f"var{i}"
        rows.append((i, "s" if i % 2 else "t", " ".join(base)))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    for pct in (60, 80, 90, 100):
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.ppjoin_pairs(
                docs, thr_pct=pct, shingle_n=1
            ).collect()
        )
        exp = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.jaccard_pairs_index(docs, shingle_n=1).collect()
            if 100 * r.jaccard >= pct - 1e-9
        )
        assert got == exp, pct


def test_py_round6_matches_spark_round(spark):
    """py_round6 must agree with F.round(col, 6) everywhere, including
    the exact decimal halves where builtin round() goes banker's."""
    vals = [
        81.0 / 128.0,  # 0.6328125 — the ADVICE r8 counterexample
        0.0000005,
        -0.0000005,
        1.0000015,
        0.1 + 0.2,
        2.675,
        -81.0 / 128.0,
        123456.789012345,
        1e-7,
        0.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    expected = [
        r.r for r in df.select(F.round("v", 6).alias("r")).collect()
    ]
    got = [py_round6(v) for v in vals]
    assert got == expected
    # builtin round() must actually disagree somewhere in this list,
    # or the regression test is vacuous
    assert [round(v, 6) for v in vals] != expected
    # passthroughs
    assert py_round6(None) is None
    assert math.isnan(py_round6(float("nan")))
    assert py_round6(float("inf")) == float("inf")


def test_ppjoin_bigram_realistic_corpus(spark):
    """Bigram-mode PPJoin on a realistic templated-rewrite corpus:
    docs sharing vocabulary but NOT phrasing must fall below the
    bigram threshold even where their unigram Jaccard is high, and
    the prefix-filtered result must equal the plain bigram filter."""
    template = (
        "order {} shipped from warehouse {} on schedule with full "
        "tracking enabled for the customer account"
    )
    scrambled = (
        "warehouse {} on order shipped {} the from schedule full with "
        "account customer for enabled tracking"
    )
    rows = []
    for i in range(20):
        rows.append((i, "s", template.format(i // 2, i // 2)))
    for i in range(20, 30):
        rows.append((i, "s", scrambled.format(i, i)))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in dedup.ppjoin_pairs(docs, thr_pct=80, shingle_n=2).collect()
    )
    # expected: exactly the template pairs that share the SAME fill
    # value (i//2), i.e. (0,1), (2,3), ... — identical bigram sets
    exp = sorted((2 * k, 2 * k + 1) for k in range(10))
    assert got == exp
    # unigram mode at the same threshold also pairs scrambled docs with
    # their same-vocabulary templates? No — fills differ; instead pin
    # that unigram J of a scrambled/template pair with the SAME fill
    # would clear a low unigram bar while bigram correctly rejects it.
    probe = spark.createDataFrame(
        [
            (100, "s", template.format(7, 7)),
            (101, "s", scrambled.format(7, 7)),
        ],
        "doc_id long, source string, text string",
    )
    uni = dedup.ppjoin_pairs(probe, thr_pct=90, shingle_n=1).collect()
    big = dedup.ppjoin_pairs(probe, thr_pct=80, shingle_n=2).collect()
    assert len(uni) == 1 and uni[0].jaccard == 1.0  # same vocabulary
    assert big == []  # different phrasing


def test_km_quartiles_by_segment_consistency(spark):
    """Per-segment quartiles must agree with the per-segment summary's
    median (level 50 = median_gap_days) on the same data, and every
    (segment, level) cell must be present."""
    from tsod_spark.queries.round8 import km_segment_summary
    from tsod_spark.queries.round9 import orders_km_quartiles_by_segment

    sf = "/root/testdata/sf0.01"
    q = {
        (r.c_mktsegment, r.level_pct): r
        for r in orders_km_quartiles_by_segment(spark, sf).collect()
    }
    from tsod_spark.registry import table as rt

    s = {
        r.c_mktsegment: r
        for r in km_segment_summary(
            rt(spark, sf, "orders"), rt(spark, sf, "customer")
        ).collect()
    }
    assert set(k[0] for k in q) == set(s)
    for seg, r in s.items():
        assert set(
            lp for (sg, lp) in q if sg == seg
        ) == {25, 50, 75}
        assert q[(seg, 50)].dur_days == r.median_gap_days, seg
        # quartiles are monotone where present
        durs = [q[(seg, lp)].dur_days for lp in (25, 50, 75)]
        present = [d for d in durs if d is not None]
        assert present == sorted(present), seg


def test_ppjoin_screen_new_docs_matches_bruteforce(spark):
    """The one-sided prefix probe must return exactly the brute-force
    batch x corpus pairs at the threshold — including matches through
    grams the corpus has never seen (df 0) and across blocks never."""
    rows = []
    for i in range(60):
        base = [f"w{j}" for j in range(10)]
        if i % 5 == 0:
            base[3] = f"u{i}"
        rows.append((i, "s" if i % 2 else "t", " ".join(base)))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    batch = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    got = sorted(
        (r.doc_id, r.match_id, r.jaccard)
        for r in dedup.ppjoin_screen_new_docs(
            corpus, batch, thr_pct=80, shingle_n=1
        ).collect()
    )
    bl = {r.doc_id: (r.source, set(r.text.split())) for r in batch.collect()}
    cl = {r.doc_id: (r.source, set(r.text.split())) for r in corpus.collect()}
    exp = []
    for bid, (bs, bt) in bl.items():
        for cid, (cs, ct) in cl.items():
            if bs != cs:
                continue
            inter = len(bt & ct)
            union = len(bt | ct)
            if 100 * inter >= 80 * union:
                exp.append((bid, cid, round(inter / union, 6)))
    assert got == sorted(exp)
    assert len(got) > 0


def test_conformal_curve_alpha20_equals_snaive(spark):
    """At alpha_pct=20 the calibration curve must reproduce
    ts_conformal_snaive exactly (the generalized rank
    ((n+1)(100-a)+99) div 100 reduces to ((n+1)*8+9) div 10)."""
    from tsod_spark.registry import QUERIES

    sf = "/root/testdata/sf0.01"
    curve = {
        r.user_id: r
        for r in QUERIES["ts_conformal_curve"](spark, sf).collect()
        if r.alpha_pct == 20
    }
    base = {r.user_id: r for r in QUERIES["ts_conformal_snaive"](spark, sf).collect()}
    assert set(curve) == set(base)
    assert len(curve) > 0
    for u, b in base.items():
        c = curve[u]
        assert (c.n_cal, c.qhat_cents, c.n_test, c.n_flagged, c.coverage) == (
            b.n_cal,
            b.qhat_cents,
            b.n_test,
            b.n_flagged,
            b.coverage,
        ), u
    spark.catalog.clearCache()


def test_nelson_aalen_by_segment_consistency(spark):
    """Per-segment N-A must be internally consistent: cumhaz
    nondecreasing within a segment, survival_fh = exp(-cumhaz)
    (both rounded), and per-segment event totals must match the KM
    segment summary's."""
    import math

    from tsod_spark.queries.round8 import km_segment_summary
    from tsod_spark.registry import QUERIES
    from tsod_spark.registry import table as rt

    sf = "/root/testdata/sf0.01"
    rows = QUERIES["orders_nelson_aalen_by_segment"](spark, sf).collect()
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r.c_mktsegment, []).append(r)
    s = {
        r.c_mktsegment: r
        for r in km_segment_summary(
            rt(spark, sf, "orders"), rt(spark, sf, "customer")
        ).collect()
    }
    assert set(by_seg) == set(s)
    for seg, rs in by_seg.items():
        rs = sorted(rs, key=lambda r: r.dur_days)
        ch = [r.na_cumhaz for r in rs]
        assert ch == sorted(ch), seg
        assert sum(r.d_event for r in rs) == s[seg].n_events, seg
        for r in rs:
            assert abs(r.survival_fh - round(math.exp(-r.na_cumhaz), 6)) < 2e-6, (
                seg,
                r.dur_days,
            )
    spark.catalog.clearCache()


def test_km_logrank_identities(spark):
    """Log-rank invariants: per-segment observed events equal the KM
    summary's; sum(observed) == sum(expected) up to the term
    quantization (expected sums to total events by construction:
    sum_g n_g(t) = n(t) at every pooled time)."""
    from tsod_spark.queries.round8 import km_segment_summary
    from tsod_spark.registry import QUERIES
    from tsod_spark.registry import table as rt

    sf = "/root/testdata/sf0.01"
    lr = {
        r.c_mktsegment: r for r in QUERIES["orders_km_logrank"](spark, sf).collect()
    }
    s = {
        r.c_mktsegment: r
        for r in km_segment_summary(
            rt(spark, sf, "orders"), rt(spark, sf, "customer")
        ).collect()
    }
    assert set(lr) == set(s)
    for seg, r in s.items():
        assert lr[seg].observed == r.n_events, seg
        assert lr[seg].n_subj == r.n_events + r.n_censored, seg
        assert lr[seg].chi_contrib >= 0, seg
    tot_obs = sum(r.observed for r in lr.values())
    tot_exp = sum(r.expected for r in lr.values())
    # each of the |segments| x |event durations| terms is quantized to
    # 1e-6, so the identity holds to that granularity
    assert abs(tot_obs - tot_exp) < 1e-6 * 5 * 4000
    spark.catalog.clearCache()


def test_psi_drift_planted_shift(spark):
    """PSI flags a planted distribution shift and stays quiet on a
    stable one: type 'shift' doubles its values in the second half,
    type 'stable' keeps one distribution throughout."""
    import datetime

    rows = []
    t0 = datetime.datetime(2024, 1, 1)
    eid = 0
    for h in range(200):
        ts = t0 + datetime.timedelta(hours=h)
        for j in range(5):
            base = float((h * 7 + j * 13) % 50)
            rows.append((eid, 1, "stable", ts, base)); eid += 1
            v = base if h < 100 else base * 2.0 + 100.0
            rows.append((eid, 1, "shift", ts, v)); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="psi_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    from tsod_spark.registry import QUERIES

    out = {r.event_type: r for r in QUERIES["events_psi_drift"](spark, d).collect()}
    assert out["shift"].drift_flag is True
    assert out["shift"].psi > 1.0
    assert out["stable"].drift_flag is False
    assert out["stable"].psi < 0.05
    import shutil

    shutil.rmtree(d, ignore_errors=True)
    spark.catalog.clearCache()
