"""Property-based cross-validation for the round-11 operators against
independent pure-python references on hypothesis-generated corpora
(same net as test_property_round5/7/8 — a bug must appear identically
in two formulations to survive)."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# small-vocab corpora force canonical collisions, cross-source shares,
# and minhash candidate pairs
_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "EPS", "zeta"])
corpus_strategy = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2"]),
        st.lists(_word, min_size=1, max_size=6),
    ),
    min_size=2,
    max_size=25,
)


def _df(spark, rows):
    data = [(i, s, " ".join(ws)) for i, (s, ws) in enumerate(rows)]
    return (
        spark.createDataFrame(
            data, "doc_id long, source string, text string"
        ),
        data,
    )


def _canon(t: str) -> str:
    return " ".join(sorted(set(t.lower().split())))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=corpus_strategy)
def test_exact_cross_source_matrix_property(spark, rows):
    """Closed-form int64 cell counts == brute-force doc-pair
    enumeration under canonical equality, for arbitrary corpora."""
    from tsod_spark.pipeline import dedup

    df, data = _df(spark, rows)
    got = {
        (r.source_a, r.source_b): (r.dup_pairs, r.shared_contents)
        for r in dedup.exact_cross_source_matrix(df).collect()
    }
    exp_pairs: dict = {}
    exp_contents: dict = {}
    for (i, si, ti), (j, sj, tj) in itertools.combinations(data, 2):
        if _canon(ti) != _canon(tj):
            continue
        key = tuple(sorted((si, sj)))
        exp_pairs[key] = exp_pairs.get(key, 0) + 1
        exp_contents.setdefault(key, set()).add(_canon(ti))
    assert got == {
        k: (exp_pairs[k], len(exp_contents[k])) for k in exp_pairs
    }
    spark.catalog.clearCache()


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=corpus_strategy)
def test_source_containment_property(spark, rows):
    """Directional containment == brute force over the SAME candidate
    pair set (minhash_band_pairs is the shared generator, so the
    property pins the distinct-(doc, other_source) roll-up and the
    totals join, independent of LSH recall)."""
    from tsod_spark.pipeline import dedup

    df, data = _df(spark, rows)
    pairs = dedup.minhash_band_pairs(df).collect()
    src = {i: s for i, s, _ in data}
    directed: set = set()
    for p in pairs:
        directed.add((p.doc_a, src[p.doc_a], src[p.doc_b]))
        directed.add((p.doc_b, src[p.doc_b], src[p.doc_a]))
    exp: dict = {}
    for _doc, sa, sb in directed:
        exp[(sa, sb)] = exp.get((sa, sb), 0) + 1
    totals: dict = {}
    for _i, s, _ in data:
        totals[s] = totals.get(s, 0) + 1
    got = {
        (r.source_a, r.source_b): r for r in dedup.source_containment(df).collect()
    }
    assert {k: v.docs_contained for k, v in got.items()} == exp
    for k, v in got.items():
        assert v.docs_total == totals[k[0]]
        assert 0.0 < v.containment <= 1.0
        assert v.containment == round(v.docs_contained / v.docs_total, 6)
    spark.catalog.clearCache()
