"""Property-based cross-validation for the round-7 operators against
independent pure-python references on hypothesis-generated data (the
test_property_round5/6 net — a bug must appear identically in two
formulations to survive)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

doc_strategy = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]),
    min_size=0,
    max_size=25,
)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=8)


def _py_winnow(toks: list[str], k: int = 5, window: int = 4) -> set[int]:
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    return {min(hs[j : j + window]) for j in range(len(hs) - window + 1)}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus=corpus_strategy)
def test_winnow_screen_matches_pure_python(spark, corpus):
    """winnow_screen_new_docs survivors equal an independent python
    screen: batch doc i (odd ids) is dropped iff it shares >= 2
    fingerprints with any corpus doc (even ids) or any earlier batch
    doc."""
    from pyspark.sql import functions as F

    from tsod_spark.pipeline.dedup import winnow_screen_new_docs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus_df = df.where(F.col("doc_id") % 2 == 0)
    batch_df = df.where(F.col("doc_id") % 2 == 1)

    fps = {i: _py_winnow(toks) for i, toks in enumerate(corpus)}
    corpus_ids = [i for i in fps if i % 2 == 0]
    batch_ids = [i for i in fps if i % 2 == 1]
    expected = set()
    for b in batch_ids:
        hit = any(len(fps[b] & fps[c]) >= 2 for c in corpus_ids) or any(
            len(fps[b] & fps[e]) >= 2 for e in batch_ids if e < b
        )
        if not hit:
            expected.add(b)

    got = {r.doc_id for r in winnow_screen_new_docs(corpus_df, batch_df).collect()}
    spark.catalog.clearCache()
    assert got == expected, (got, expected, corpus)


values_strategy = st.lists(
    st.integers(min_value=-2000, max_value=2000).map(lambda c: c / 100.0),
    min_size=2,
    max_size=40,
)


def _py_amoc(cents: list[int]) -> tuple[int, int]:
    """(k, gstat) of the CUSUM argmax with smallest-k tie-break."""
    n = len(cents)
    sn = sum(cents)
    best_k, best_g, s = 1, -1, 0
    for k in range(1, n):
        s += cents[k - 1]
        g = abs(n * s - k * sn)
        if g > best_g:
            best_k, best_g = k, g
    return best_k, best_g


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=values_strategy)
def test_changepoint_matches_pure_python(spark, vals):
    """changepoint_mean_shift's argmax position and statistic equal an
    independent O(n) python scan on a single hypothesis-generated
    series (exact cents — no float rounding ambiguity by
    construction)."""
    import datetime as dtm

    from tsod_spark.analytics.temporal import changepoint_mean_shift

    base = dtm.datetime(2024, 1, 1)
    rows = [
        (1, i, base + dtm.timedelta(hours=i), v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    out = changepoint_mean_shift(df).collect()
    assert len(out) == 1
    cents = [round(v * 100) for v in vals]
    k, g = _py_amoc(cents)
    assert out[0].k_pre == k and out[0].gstat == g, (vals, out[0])
