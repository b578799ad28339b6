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
