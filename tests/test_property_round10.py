"""Property-based cross-validation for the round-10 operators against
independent pure-python references on hypothesis-generated data (same
net as test_property_round5..8 — a bug must appear identically in two
formulations to survive)."""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_BASE = datetime.datetime(2024, 1, 1)

# small word-pool documents: containment/packing behavior is driven by
# vocabulary overlap, so draw words from a 12-word pool
_WORDS = [f"w{i}" for i in range(12)]
docs_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1"]),
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
    ),
    min_size=2,
    max_size=16,
)

series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=-5000, max_value=5000).map(lambda c: c / 100.0),
    ),
    min_size=4,
    max_size=30,
)


def _docs(spark, rows):
    data = [
        (i, " ".join(ws), src) for i, (src, ws) in enumerate(rows)
    ]
    return spark.createDataFrame(data, "doc_id long, text string, source string")


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=docs_strategy, thr=st.sampled_from([50, 80, 100]))
def test_containment_screen_property(spark, rows, thr):
    """The index-join containment screen equals brute-force python set
    containment for arbitrary corpora/thresholds (batch = even doc_ids,
    corpus = odd)."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.util import cache_scope

    df = _docs(spark, rows)
    batch = df.where("doc_id % 2 = 0")
    corpus = df.where("doc_id % 2 <> 0")
    with cache_scope():
        got = {
            (r.doc_id, r.match_id): (r.shared_grams, r.containment)
            for r in dedup.containment_screen_new_docs(
                corpus, batch, thr_pct=thr
            ).collect()
        }
    toks = {i: set(ws) for i, (_, ws) in enumerate(rows)}
    srcs = {i: s for i, (s, _) in enumerate(rows)}
    expect = {}
    for b in range(0, len(rows), 2):
        if not toks[b]:
            continue
        for c in range(1, len(rows), 2):
            if srcs[b] != srcs[c]:
                continue
            inter = len(toks[b] & toks[c])
            if 100 * inter >= thr * len(toks[b]):
                expect[(b, c)] = (
                    inter,
                    round(inter / len(toks[b]), 6),
                )
    assert got == expect, (rows, thr)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=docs_strategy, budget=st.sampled_from([4, 7, 16]))
def test_pack_loss_mask_property(spark, rows, budget):
    """Per-sequence kept/masked/pad/crossings match a pure-python
    simulation of concat-and-split packing for arbitrary corpora and
    budgets."""
    from tsod_spark.pipeline import curate

    df = _docs(spark, rows)
    got = {
        (r.part, r.seq_id): (
            r.n_docs,
            r.n_kept,
            r.n_masked,
            r.n_pad,
            r.boundary_crossings,
        )
        for r in curate.pack_loss_mask(df, budget=budget).collect()
    }
    # python simulation
    expect: dict = {}
    per_part: dict = {}
    for i, (src, ws) in enumerate(rows):
        per_part.setdefault(src, []).append((i, len(ws)))
    for part, ds in per_part.items():
        cb = 0
        seqs: dict = {}
        for _i, nt in sorted(ds):
            if nt == 0:
                continue
            s0 = cb // budget
            s1 = (cb + nt - 1) // budget
            for s in range(s0, s1 + 1):
                tok_in = min((s + 1) * budget, cb + nt) - max(s * budget, cb)
                d = seqs.setdefault(s, [0, 0, 0, 0])  # docs, kept, masked, cross
                d[0] += 1
                if s > s0:
                    d[2] += tok_in
                    d[3] += 1
                else:
                    d[1] += tok_in
            cb += nt
        for s, (nd, kept, masked, cross) in seqs.items():
            expect[(part, s)] = (
                nd,
                kept,
                masked,
                budget - kept - masked,
                cross,
            )
    assert got == expect, (rows, budget)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=series_strategy)
def test_wasserstein_property(spark, pts):
    """The batch W1 equals a pure-python earth-mover computation over
    the same half-split, for arbitrary sparse value series."""
    from tsod_spark.analytics.stattests import wasserstein_drift

    rows = [
        ("a", _BASE + datetime.timedelta(hours=h, minutes=i % 60), v)
        for i, (h, v) in enumerate(pts)
    ]
    e = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )
    out = {r.event_type: r for r in wasserstein_drift(e).collect()}

    hb = [
        int(
            (_BASE + datetime.timedelta(hours=h, minutes=i % 60)).timestamp()
            // 3600
        )
        for i, (h, _) in enumerate(pts)
    ]
    mid = (min(hb) + max(hb) + 1) // 2
    ref = [int(round(v * 100)) for (h, v), b in zip(pts, hb) if b < mid]
    cur = [int(round(v * 100)) for (h, v), b in zip(pts, hb) if b >= mid]
    dom = sorted(set(ref) | set(cur))
    if not ref or not cur or len(dom) < 2:
        assert "a" not in out, pts
        return
    s = 0
    cr = cc = 0
    for i, v in enumerate(dom[:-1]):
        cr += sum(1 for x in ref if x == v)
        cc += sum(1 for x in cur if x == v)
        s += abs(cr * len(cur) - cc * len(ref)) * (dom[i + 1] - v)
    from tsod_spark.util import py_round6

    r = out["a"]
    assert (r.n_ref, r.n_cur) == (len(ref), len(cur)), pts
    # py_round6 = the F.round twin (HALF_UP); builtin round is banker's
    # and diverges on exact decimal halves like 0.2125625
    w1 = s / (len(ref) * len(cur) * 100.0)
    assert r.w1_value == py_round6(w1), pts
    w1n = s / (len(ref) * len(cur) * float(dom[-1] - dom[0]))
    assert r.w1_norm == py_round6(w1n), pts


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=docs_strategy)
def test_lsh_curve_truth_is_exact_superset(spark, rows):
    """For arbitrary corpora: the b=k candidate set contains every
    pair with any matching signature component (the truth-set
    soundness the tuning curve relies on), and the curve invariants
    hold."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.util import cache_scope

    df = _docs(spark, rows)
    with cache_scope():
        curve = dedup.lsh_tuning_curve(df, band_configs=(2, 4, 8)).collect()
        sigs = {
            r.doc_id: tuple(r[f"mh{i}"] for i in range(8))
            for r in dedup.minhash_signatures(df).collect()
        }
    # empty docs have NULL signatures and never join (engine contract)
    ids = sorted(i for i, sg in sigs.items() if all(x is not None for x in sg))
    n_true = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            m = sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y)
            if 100 * m >= 50 * 8:
                n_true += 1
    by_b = {r.bands: r for r in curve}
    assert by_b[8].n_true_pairs == n_true, rows
    assert by_b[8].n_found == n_true
    prev = -1
    for b in (2, 4, 8):
        assert by_b[b].n_candidates >= prev
        prev = by_b[b].n_candidates
