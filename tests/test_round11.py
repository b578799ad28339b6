"""Round-11 regression tests for the ADVICE r10 items: stale-ppjoin-index
exactness with novel grams (high), tracked-cache registry bounds +
thread-local scopes (medium), LSH band-config nesting validation and
truth-reuse (low), and the ivf_recall_curve missing-vec_id guard (low)."""

import threading

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# ADVICE r10 #1 (high): ppjoin_pairs with a STALE index must still be exact
# ---------------------------------------------------------------------------


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_ppjoin_stale_index_novel_grams_exact(spark):
    """An index snapshot built BEFORE two new docs arrive knows none of
    their grams. The old inner join dropped those grams before
    row_number, so the all-novel duplicate pair produced zero candidates
    despite Jaccard 1.0. With the left-join/df-0 fix the stale-index run
    must equal the fresh recompute bit-for-bit."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.util import cache_scope

    old = _corpus(
        spark,
        [
            (1, "s", "alpha beta gamma delta"),
            (2, "s", "alpha beta gamma epsilon"),
            (3, "s", "zeta eta theta iota"),
        ],
    )
    new_docs = [
        # entirely novel vocabulary — no gram appears in the snapshot
        (10, "s", "quux corge grault garply"),
        (11, "s", "quux corge grault garply"),
        # mixed: one known gram, three novel
        (12, "s", "alpha waldo fred plugh"),
        (13, "s", "alpha waldo fred plugh"),
    ]
    full = _corpus(spark, [tuple(r) for r in old.collect()] + new_docs)
    with cache_scope():
        stale_idx = dedup.ppjoin_index(old, shingle_n=1).cache()
        stale_idx.count()
        fresh = dedup.ppjoin_pairs(full, thr_pct=90, shingle_n=1).collect()
        with_stale = dedup.ppjoin_pairs(
            full, thr_pct=90, shingle_n=1, index=stale_idx
        ).collect()
        stale_idx.unpersist()
    key = lambda r: (r.doc_a, r.doc_b)  # noqa: E731
    assert sorted(map(key, fresh)) == sorted(map(key, with_stale))
    got = {key(r): r.jaccard for r in with_stale}
    # the all-novel duplicate pair MUST be found (the old bug's miss)
    assert got[(10, 11)] == 1.0
    assert got[(12, 13)] == 1.0
    fj = {key(r): r.jaccard for r in fresh}
    for kk, v in got.items():
        assert fj[kk] == v


# ---------------------------------------------------------------------------
# ADVICE r10 #2 (medium): tracked-cache registry bounds + thread-local scopes
# ---------------------------------------------------------------------------


def test_tracked_cache_registry_self_prunes(spark):
    """Outside any scope, dead DataFrame objects must not accumulate in
    the module registry: after GC, the registry holds only live refs."""
    import gc

    from tsod_spark import util

    util.unpersist_tracked()
    for i in range(25):
        df = util.tracked_cache(spark.range(10 + i))
        df.count()
        df.unpersist()
        del df
    gc.collect()
    # one more append triggers the prune of the 25 dead refs
    keep = util.tracked_cache(spark.range(999))
    with util._TRACKED_LOCK:
        live = [r for r in util._TRACKED_CACHES if r() is not None]
        total = len(util._TRACKED_CACHES)
    assert total <= 2, f"registry kept {total} entries for dead frames"
    assert any(r() is keep for r in live)
    keep.unpersist()


def test_cache_scope_is_thread_local(spark):
    """A scope exiting on one thread must not unpersist frames another
    thread cached inside ITS own still-open scope (the old shared
    len()-mark did)."""
    from tsod_spark import util

    util.unpersist_tracked()
    results = {}
    barrier = threading.Barrier(2, timeout=30)
    release = threading.Event()

    def worker(name, n):
        with util.cache_scope():
            df = util.tracked_cache(spark.range(n))
            df.count()
            barrier.wait()  # both threads have cached inside their scope
            if name == "a":
                pass  # thread a exits its scope first
            else:
                release.wait(timeout=30)  # thread b outlives a's exit
                results["b_cached_after_a_exit"] = df.storageLevel.useMemory
        results[name] = True

    ta = threading.Thread(target=worker, args=("a", 50))
    tb = threading.Thread(target=worker, args=("b", 60))
    ta.start(), tb.start()
    ta.join(timeout=60)
    release.set()
    tb.join(timeout=60)
    assert results.get("a") and results.get("b")
    # b's frame was still cached when a's scope had already exited
    assert results["b_cached_after_a_exit"] is True


# ---------------------------------------------------------------------------
# ADVICE r10 #4 (low): band-config nesting validation
# ---------------------------------------------------------------------------


def test_lsh_tuning_curve_rejects_non_nested_configs(spark):
    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table

    docs = table(spark, SF, "documents")
    with pytest.raises(ValueError, match="pairwise nested"):
        dedup.lsh_tuning_curve(docs, k=12, band_configs=(2, 3, 12))
    # nested configs with k=12 pass validation (smoke: plan builds)
    df = dedup.lsh_tuning_curve(docs, k=12, band_configs=(1, 2, 6, 12))
    assert "recall" in df.columns


# ---------------------------------------------------------------------------
# ADVICE r10 #5 (low): missing query vec_id raises a named error
# ---------------------------------------------------------------------------


def test_ivf_recall_curve_missing_vec_id_raises(spark):
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="vec_id -17 not found"):
        similarity.ivf_recall_curve(emb, query_vec_id=-17)


def test_cosine_topk_missing_vec_id_raises(spark):
    """The shared _query_vector guard covers the PQ/IVFPQ entry points
    too; pq_topk is the cheapest to exercise."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings").limit(64)
    with pytest.raises(ValueError, match="not found"):
        similarity.pq_topk(emb, query_vec_id=10**9, m=4, n_centroids=4)


# ---------------------------------------------------------------------------
# VERDICT r10 #2: PQ distortion-vs-m tuning curve (raw curve range pins)
# ---------------------------------------------------------------------------


def test_pq_distortion_curve_raw_ranges(spark):
    """The registered certificate pins booleans; this pins the raw
    curve: provable monotone distortion (nested codebooks), sane value
    ranges, exact bytes accounting, and the full-refine anchor."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table
    from tsod_spark.util import cache_scope

    with cache_scope():
        rows = similarity.pq_distortion_curve(
            table(spark, SF, "embeddings")
        ).collect()
    assert [r.m for r in rows] == [4, 8, 16, 32]
    assert [r.bytes_per_code for r in rows] == [4, 8, 16, 32]
    assert [r.codebook_k for r in rows] == [16, 32, 48, 64]
    assert [r.compression_x for r in rows] == [64.0, 32.0, 16.0, 8.0]
    dist = [r.mean_distortion for r in rows]
    # provably nonincreasing (nested codebooks); strictly so in practice
    assert all(a >= b for a, b in zip(dist, dist[1:])), dist
    assert 0.4 < dist[0] < 1.2 and 0.02 < dist[-1] < 0.2, dist
    rec = [r.recall_k for r in rows]
    assert all(0.0 <= r <= 1.0 for r in rec)
    assert rec[-1] >= 0.5  # finest m floor (measured-stable)
    # the provable anchor: full-corpus refine IS the exact scan
    assert rows[-1].full_refine_recall == 1.0
    assert all(r.full_refine_recall is None for r in rows[:-1])


def test_pq_nested_codebooks_validation_and_nesting(spark):
    """Nesting construction: every finer codebook contains the split
    halves of each coarser augmented centroid (the monotonicity proof's
    premise), and non-nested m grids are rejected."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="pairwise nested"):
        similarity.pq_nested_codebooks(emb, m_configs=(4, 6, 12))
    with pytest.raises(ValueError, match="strictly increasing"):
        similarity.pq_nested_codebooks(emb, m_configs=(8, 4))
    books = similarity.pq_nested_codebooks(emb, m_configs=(4, 8))
    # each m=8 subspace j holds the (j%2)-th halves of m=4 book j//2
    for j in range(8):
        fine = books[8][j]
        parent = books[4][j // 2]
        off = (j % 2) * 8
        for cent in parent:
            assert cent[off : off + 8] in fine


# ---------------------------------------------------------------------------
# VERDICT r10 #3: sampled threshold-curve twin (CI agreement at sf0.1)
# ---------------------------------------------------------------------------


def test_threshold_curve_sampled_vs_exact_within_ci_sf01(spark):
    """The sampled twin's Wilson interval must cover the exact curve's
    drop share at every threshold at sf0.1 (the scale VERDICT r10 #3
    names). Also pins the estimator plumbing: raw sampled counts never
    exceed their expansions, and the interval is ordered."""
    from tsod_spark.registry import QUERIES
    from tsod_spark.util import cache_scope

    sf = "/root/testdata/sf0.1"
    with cache_scope():
        exact = {
            r.thr_pct: r.drop_share
            for r in QUERIES["dedup_threshold_curve"](spark, sf).collect()
        }
        sampled = QUERIES["dedup_threshold_curve_sampled"](spark, sf).collect()
    assert len(sampled) == 7 and set(exact) == {r.thr_pct for r in sampled}
    for r in sampled:
        assert 0.0 <= r.ci95_lo <= r.ci95_hi <= 1.0
        # Wilson must not collapse: the upper bound stays positive even
        # when the sample catches zero dropped docs (the sf0.1 case)
        assert r.ci95_hi > 0.0
        assert r.ci95_lo <= exact[r.thr_pct] <= r.ci95_hi, (
            r.thr_pct,
            exact[r.thr_pct],
            r.ci95_lo,
            r.ci95_hi,
        )
        assert r.n_dup_pairs_sampled <= r.n_dup_pairs_est
        assert r.n_docs_dropped_sampled <= r.n_docs_dropped_est
        assert r.n_sampled_docs == sampled[0].n_sampled_docs


def test_threshold_curve_sampled_deterministic(spark):
    """Same corpus, same sample, bit-identical output across calls (the
    re-shard-stable hash discipline)."""
    from tsod_spark.registry import QUERIES
    from tsod_spark.util import cache_scope

    with cache_scope():
        a = QUERIES["dedup_threshold_curve_sampled"](spark, SF).collect()
    with cache_scope():
        b = QUERIES["dedup_threshold_curve_sampled"](
            spark, SF
        ).repartition(7).orderBy("thr_pct").collect()
    assert a == sorted(b, key=lambda r: r.thr_pct)


# ---------------------------------------------------------------------------
# VERDICT r10 #7: by-segment drift reduces to global on one segment
# ---------------------------------------------------------------------------


def test_ks_drift_single_segment_reduces_to_global(spark):
    from tsod_spark.analytics import stattests
    from tsod_spark.registry import table

    e = table(spark, SF, "events")
    glob = stattests.ks_drift(e).collect()
    seg = stattests.ks_drift(
        e.withColumn("cohort", F.lit(0)), seg_col="cohort"
    ).collect()
    assert len(glob) == len(seg) > 0
    for g, s in zip(glob, seg):
        assert s.cohort == 0
        assert (s.event_type, s.n_group, s.ks, s.ks_at_cent, s.drift_flag) == (
            g.event_type,
            g.n_group,
            g.ks,
            g.ks_at_cent,
            g.drift_flag,
        )


def test_wasserstein_drift_single_segment_reduces_to_global(spark):
    from tsod_spark.analytics import stattests
    from tsod_spark.registry import table

    e = table(spark, SF, "events")
    glob = stattests.wasserstein_drift(e).collect()
    seg = stattests.wasserstein_drift(
        e.withColumn("cohort", F.lit(0)), seg_col="cohort"
    ).collect()
    assert len(glob) == len(seg) > 0
    for g, s in zip(glob, seg):
        assert s.cohort == 0
        assert (
            s.event_type,
            s.n_ref,
            s.n_cur,
            s.w1_value,
            s.w1_norm,
            s.drift_flag,
        ) == (g.event_type, g.n_ref, g.n_cur, g.w1_value, g.w1_norm, g.drift_flag)


def test_segmented_drift_is_segment_local(spark):
    """A drift injected into ONE cohort must move that cohort's W1 and
    not the others' (the reason the by-segment factoring exists)."""
    import datetime

    from tsod_spark.analytics import stattests

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        hour = i % 20
        cohort = i % 2
        # cohort 1 drifts hard in the second half; cohort 0 is stable
        if hour >= 10 and cohort == 1:
            v = 50.0 + (i % 5)
        else:
            v = 1.0 + (i % 5) * 0.01
        rows.append(
            (
                "a",
                cohort,
                base + datetime.timedelta(hours=hour, seconds=i % 3600),
                v,
            )
        )
    e = spark.createDataFrame(
        rows, "event_type string, cohort int, ts timestamp, value double"
    )
    out = {
        r.cohort: r
        for r in stattests.wasserstein_drift(e, seg_col="cohort").collect()
    }
    assert out[1].drift_flag and out[1].w1_value > 10.0
    assert not out[0].drift_flag and out[0].w1_value < 1.0


# ---------------------------------------------------------------------------
# PPJoin hash-ordered prefix path (VERDICT r10 #6): the pairs path now
# sorts int64 (df, gh) structs + slices top-p instead of a row_number
# window over gram-string rows. Pin (a) bigram-mode exactness against
# pure python (the tier the rewrite targets — existing invariance tests
# only covered shingle_n=1), (b) bigram equality with the full
# inverted-index engine, and (c) that the hash-order prefix selects the
# same per-doc prefix LENGTH p as the string-order stats path (p is
# order-independent; a slice bug would break this first).


def _pure_bigram_jaccard_pairs(docs, pct):
    import itertools

    by_blk = {}
    for doc_id, blk, text in docs:
        toks = [t for t in text.lower().split() if t]
        grams = frozenset(
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        )
        if grams:
            by_blk.setdefault(blk, []).append((doc_id, grams))
    out = {}
    for blk, members in by_blk.items():
        for (ida, ta), (idb, tb) in itertools.combinations(sorted(members), 2):
            inter = len(ta & tb)
            union = len(ta) + len(tb) - inter
            if 100 * inter >= pct * union:
                out[(ida, idb)] = round(inter / union, 6)
    return out


def _bigram_corpus(seed=29, n_docs=90, vocab_n=12):
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(vocab_n)]
    return [
        (
            i,
            f"s{rng.randint(0, 1)}",
            " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 10))),
        )
        for i in range(n_docs)
    ]


def test_ppjoin_bigram_matches_pure_python(spark):
    from tsod_spark.pipeline import dedup

    docs = _bigram_corpus()
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    for pct in (40, 70, 100):
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in dedup.ppjoin_pairs(df, thr_pct=pct, shingle_n=2).collect()
        }
        assert got == _pure_bigram_jaccard_pairs(docs, pct), f"pct={pct}"


def test_ppjoin_bigram_matches_index_engine(spark):
    from tsod_spark.pipeline import dedup

    docs = _bigram_corpus(seed=31)
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    pp = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ppjoin_pairs(df, thr_pct=50, shingle_n=2).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_pairs_index(df, shingle_n=2).collect()
        if r.jaccard >= 0.5  # 0.5 dyadic: round6 cannot cross the cut
    }
    assert pp == full


def test_ppjoin_hash_order_prefix_same_lengths_as_string_order(spark):
    from tsod_spark.pipeline.dedup import _ppjoin_prefix

    docs = _bigram_corpus(seed=37)
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    by_hash = {
        r.doc_id: r.p
        for r in _ppjoin_prefix(
            df, 40, "text", "source", 2, cache=False, order_by_hash=True
        )[1]
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("p"))
        .collect()
    }
    by_str = {
        r.doc_id: r.p
        for r in _ppjoin_prefix(df, 40, "text", "source", 2, cache=False)[1]
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("p"))
        .collect()
    }
    assert by_hash == by_str and by_hash
