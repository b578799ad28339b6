"""Unit tests for pipeline operators, persistence, features, sources,
and the MLlib detectors."""

import math

import pytest
from pyspark.sql import functions as F

from tsod_spark import (
    CombinedDetector,
    DiffDetector,
    HampelDetector,
    RangeDetector,
    load,
    save,
)
from tsod_spark.features import create_dataset, lag_time_series
from tsod_spark.frame import TimeSeriesFrame
from tsod_spark.pipeline import dedup, multimodal, similarity, text

from .conftest import hourly_series

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


# ---- text -------------------------------------------------------------


def test_text_stats(spark, docs):
    out = text.text_stats(docs).collect()
    assert len(out) == docs.count()
    for r in out[:20]:
        assert r.n_uniq_words <= r.n_words
        assert 0 < r.type_token_ratio <= 1
        assert 0 <= r.quality_score <= 1


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",), ("q",)], "text string")
    out = df.select(
        text.shingles(text.tokens(F.col("text")), 3).alias("sh")
    ).collect()
    assert out[0].sh == ["a b c", "b c d"]
    assert out[1].sh == []
    assert out[2].sh == []


def test_lang_id_deterministic(spark, docs):
    a = {r.doc_id: r.predicted_lang for r in text.lang_id(docs).collect()}
    b = {r.doc_id: r.predicted_lang for r in text.lang_id(docs).collect()}
    assert a == b
    assert set(a.values()) <= set(text.LANG_MARKERS)


# ---- dedup ------------------------------------------------------------


def test_exact_duplicates_finds_planted(spark, docs):
    # plant a duplicate: copy doc 0's text onto a new doc_id
    planted = docs.limit(1).select(
        F.lit(999999).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    with_dup = docs.unionByName(planted)
    out = dedup.exact_duplicates(with_dup)
    dup_rows = out.where(F.col("is_duplicate_group")).collect()
    assert {r.doc_id for r in dup_rows} == {0, 999999}
    assert all(r.keeper_doc_id == 0 and r.group_size == 2 for r in dup_rows)


def test_minhash_near_dup_detects_mutation(spark, docs):
    # a doc with one word changed should land in the same band bucket
    mutated = docs.where(F.col("doc_id") == 0).select(
        F.lit(999999).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    with_dup = docs.unionByName(mutated)
    pairs = dedup.minhash_band_pairs(with_dup, min_est_jaccard=0.5).collect()
    assert any({p.doc_a, p.doc_b} == {0, 999999} for p in pairs)


def test_minhash_groups_transitive_closure(spark, docs):
    # A copies doc 0, B copies A: {0, A, B} must land in ONE group even
    # though 0-B may never share a band — transitivity via propagation.
    base = docs.where(F.col("doc_id") == 0)
    copy = lambda i: base.select(  # noqa: E731
        F.lit(i).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    with_dups = docs.unionByName(copy(999998)).unionByName(copy(999999))
    out = dedup.minhash_duplicate_groups(with_dups).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == docs.count() + 2  # every doc labeled exactly once
    g = by_id[0]["group_id"]
    assert by_id[999998]["group_id"] == g and by_id[999999]["group_id"] == g
    assert by_id[0]["group_size"] >= 3


def test_simhash_identical_distance_zero(spark, docs):
    dup = docs.limit(1).select(
        F.lit(999999).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    out = dedup.simhash_near_pairs(docs.unionByName(dup), max_hamming=0).collect()
    assert any({p.doc_a, p.doc_b} == {0, 999999} and p.hamming == 0 for p in out)


def test_simhash_full_recall_within_radius(spark, docs):
    """The pigeonhole chunk join must find EVERY pair within the
    advertised hamming radius — compare against brute-force all-pairs
    over the fingerprints. Mutated copies of real docs plant pairs at
    small nonzero hamming so the assertion isn't vacuous."""
    mutants = []
    for i, nwords in enumerate([1, 2, 4, 8, 16]):
        # replace the LAST nwords words: perturbs ~nwords+2 shingles,
        # flipping a handful of fingerprint bits
        src = docs.where(F.col("doc_id") == i)
        toks = F.split(F.col("text"), r"\s+")
        kept = F.slice(toks, 1, F.greatest(F.size(toks) - nwords, F.lit(1)))
        pad = F.array(*[F.lit(f"mut{i}w{j}") for j in range(nwords)])
        mutants.append(
            src.select(
                F.lit(999990 + i).alias("doc_id"),
                F.array_join(F.concat(kept, pad), " ").alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    corpus = docs
    for m in mutants:
        corpus = corpus.unionByName(m)

    sigs = dedup.simhash_fingerprints(corpus).collect()
    brute = set()
    for x in range(len(sigs)):
        for y in range(x + 1, len(sigs)):
            a, b = sigs[x], sigs[y]
            if bin(a.simhash ^ b.simhash).count("1") <= 3:
                brute.add(frozenset((a.doc_id, b.doc_id)))
    assert brute, "corpus must contain pairs within the radius"
    assert any(
        999990 <= max(p) and min(p) < 999990 for p in brute
    ), "at least one planted mutant pair within radius"

    found = {
        frozenset((r.doc_a, r.doc_b))
        for r in dedup.simhash_near_pairs(corpus, max_hamming=3).collect()
    }
    assert found == brute


def test_simhash_rejects_indivisible_radius(spark, docs):
    with pytest.raises(ValueError):
        dedup.simhash_near_pairs(docs, max_hamming=4)  # 5 chunks !| 32


def test_jaccard_identical_is_one(spark, docs):
    dup = docs.limit(1).select(
        F.lit(999999).alias("doc_id"), "text", "lang", F.lit("src0").alias("source"), "n_chars"
    )
    src0 = docs.where(F.col("source") == "src0").unionByName(dup)
    top = dedup.jaccard_pairs(src0, top_n=1).collect()
    assert top[0].jaccard == 1.0 and {top[0].doc_a, top[0].doc_b} == {0, 999999}


def test_repetition_signals_crafted(spark):
    rows = [
        (1, "spam spam spam spam spam ok"),          # top share 5/6
        (2, "the quick brown fox jumps over dogs"),  # varied
        (3, "ab ab ab ab"),                          # dup 2-grams: 3 total, 1 distinct
        (4, "single"),                               # no 2-grams -> NULL fracs
        (5, ""),                                     # empty -> all NULL, not flagged
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text.repetition_signals(df).collect()}
    assert out[1].is_repetitive and abs(out[1].top_unigram_share - 5 / 6) < 1e-6
    assert not out[2].is_repetitive
    assert out[3].is_repetitive and abs(out[3].dup_2gram_frac - 2 / 3) < 1e-6
    assert out[4].dup_2gram_frac is None and not out[4].is_repetitive
    assert out[5].n_tokens == 0 and not out[5].is_repetitive


def _union_find_groups(n_ids, edges):
    parent = list(range(n_ids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per component
    root = [find(i) for i in range(n_ids)]
    rep = {}
    for i, r in enumerate(root):
        rep.setdefault(r, min(rep.get(r, i), i))
    return {i: rep[root[i]] for i in range(n_ids)}


def test_pair_graph_groups_vs_union_find(spark):
    """Differential test of the shared CC engine against a pure-python
    union-find on a seeded random graph plus a 12-deep chain (depth >
    2 fused propagation rounds, so the loop must actually iterate)."""
    import random

    rng = random.Random(7)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(25)]
    edges = [(a, b) for a, b in edges if a != b]
    chain = [(100 + i, 100 + i + 1) for i in range(12)]
    ids = sorted({i for e in edges + chain for i in e} | set(range(n)) | set(range(100, 113)))
    universe = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    pairs = spark.createDataFrame(edges + chain, "doc_a long, doc_b long")
    # python oracle over a dense relabeling of the same ids
    idx = {v: i for i, v in enumerate(ids)}
    expect = _union_find_groups(len(ids), [(idx[a], idx[b]) for a, b in edges + chain])
    rev = {i: v for v, i in idx.items()}
    # both engine paths must agree with the oracle: the bounded
    # driver-side union-find short-circuit (default) AND the iterative
    # min-label propagation loop (forced via driver_cc_max_edges=0 —
    # the 100 TB path)
    for cap in (1_000_000, 0):
        out = {
            r.doc_id: (r.group_id, r.group_size)
            for r in dedup.pair_graph_groups(
                pairs, "doc_a", "doc_b", universe, "doc_id",
                driver_cc_max_edges=cap,
            ).collect()
        }
        for v in ids:
            assert out[v][0] == rev[expect[idx[v]]], f"label mismatch at {v} (cap={cap})"
        # chain collapses to one 13-member component labeled 100
        assert out[112] == (100, 13)
        assert len(out) == len(ids)


def test_redact_crafted_pii(spark):
    from tsod_spark.pipeline import curate

    rows = [
        (1, "contact Bob.Smith+x@Example.COM or +1 555-123-4567 now"),
        (2, "customer of the supplier said customers are fine"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in curate.redact(df).collect()}
    assert out[1].n_emails == 1 and out[1].n_phones == 1
    assert "@" not in out[1].redacted_text and "555" not in out[1].redacted_text
    # word-bounded: 'customers' must NOT match the 'customer' term
    assert out[2].n_terms == 2
    assert out[2].redacted_text == "[REDACTED] of the [REDACTED] said customers are fine"
    assert out[3].n_terms == 0 and out[3].redacted_text == rows[2][1]


def test_decontaminate_planted_overlap(spark):
    from tsod_spark.pipeline import curate

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "x alpha beta gamma delta epsilon y"),  # shares 1 distinct 5-gram
            (2, "totally different words entirely here now"),
            (3, "too short"),  # no 5-grams at all
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in curate.decontaminate(corpus, bench, n=5).collect()}
    assert out[1].is_contaminated and out[1].n_contaminated == 1
    assert out[1].n_grams == 3 and abs(out[1].contaminated_frac - 1 / 3) < 1e-5
    assert not out[2].is_contaminated and out[2].n_contaminated == 0
    assert out[3].n_grams == 0 and out[3].contaminated_frac is None


def test_split_assign_content_keyed(spark, docs):
    from tsod_spark.pipeline import curate

    out = curate.split_assign(docs).collect()
    by_split = {}
    for r in out:
        by_split[r.split] = by_split.get(r.split, 0) + 1
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] > by_split["val"]
    # content-keyed: identical text in a different row gets the same split
    dup = docs.limit(1).select(
        F.lit(999999).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    out2 = {
        r.doc_id: r.split
        for r in curate.split_assign(docs.unionByName(dup)).collect()
    }
    assert out2[999999] == out2[0]


def test_pack_sequences_boundaries(spark):
    from tsod_spark.pipeline import curate

    mk = lambda i, n: (i, " ".join(f"w{j}" for j in range(n)), "s")  # noqa: E731
    # budget 10: doc1 (7 toks) fills [0,7); doc2 (5) straddles into
    # seq 1; doc3 (3) starts at offset 2 of seq 1; doc4 empty
    df = spark.createDataFrame(
        [mk(1, 7), mk(2, 5), mk(3, 3), (4, "", "s")],
        "doc_id long, text string, source string",
    )
    out = {
        r.doc_id: r
        for r in curate.pack_sequences(df, budget=10).collect()
    }
    assert (out[1].seq_id, out[1].seq_offset, out[1].straddles_boundary) == (0, 0, False)
    assert (out[2].seq_id, out[2].seq_offset, out[2].straddles_boundary) == (0, 7, True)
    assert (out[3].seq_id, out[3].seq_offset, out[3].straddles_boundary) == (1, 2, False)
    assert out[4].n_tokens == 0 and not out[4].straddles_boundary


def test_bm25_tf_saturation_and_idf(spark):
    """BM25: rarer term outweighs common term; repeated-term gain
    saturates (doubling tf far from doubles the score); only docs
    containing a query term are returned, ranked desc with rk 1..n."""
    docs = spark.createDataFrame(
        [
            (1, "rare common filler filler"),
            (2, "common common filler filler"),
            (3, "common filler filler filler"),
            (4, "filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = sorted(
        text.bm25_search(docs, ["rare", "common"], top_k=10).collect(),
        key=lambda r: r.rk,
    )
    assert [r.doc_id for r in out][0] == 1  # rare+common beats common x2
    assert {r.doc_id for r in out} == {1, 2, 3}  # doc 4 has no hit
    assert [r.rk for r in out] == [1, 2, 3]
    scores = {r.doc_id: r.score for r in out}
    assert scores[2] < 2 * scores[3]  # tf saturation
    assert all(a.score >= b.score for a, b in zip(out, out[1:]))


def test_vocab_overlap_pair_matrix(spark):
    """Full pair matrix including zero-overlap pairs; jaccard exact on
    a constructed vocabulary."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),
            (2, "a b c e", "s2"),
            (3, "x y z w", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.source_a, r.source_b): r
        for r in text.vocab_overlap(docs, n=2).collect()
    }
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    r12 = out[("s1", "s2")]
    # bigrams s1: {a b, b c, c d}; s2: {a b, b c, c e} -> 2 common of 4
    assert (r12.vocab_a, r12.vocab_b, r12.n_common) == (3, 3, 2)
    assert r12.jaccard == 0.5
    assert out[("s1", "s3")].n_common == 0 and out[("s1", "s3")].jaccard == 0.0


def test_weighted_sample_deterministic_and_weight_biased(spark):
    """E-S keys: deterministic under re-run/re-order, k exact, and a
    heavily-weighted row is overwhelmingly likely to be picked first."""
    from tsod_spark.pipeline import curate

    rows = [(i, f"doc {i}", 10 if i else 100000) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out1 = curate.weighted_sample(docs, k=5).collect()
    out2 = curate.weighted_sample(
        spark.createDataFrame(list(reversed(rows)), docs.schema), k=5
    ).collect()
    assert [r.doc_id for r in out1] == [r.doc_id for r in out2]  # re-order stable
    assert len(out1) == 5
    assert [r.rk for r in sorted(out1, key=lambda r: r.es_key)] == [1, 2, 3, 4, 5]
    assert out1[0].doc_id == 0  # weight 1e5 vs 10: Exp(1e5) min wins


def test_tfidf_rare_term_ranks_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "common common rareword common"),
            (2, "common common common other"),
            (3, "common other other stuff"),
        ],
        "doc_id long, text string",
    )
    out = text.tfidf_topk(docs, k=2).collect()
    doc1 = sorted([r for r in out if r.doc_id == 1], key=lambda r: r.rk)
    # 'rareword' (df=1) outranks 'common' (df=3) despite tf 1 vs 3
    assert doc1[0].term == "rareword" and doc1[0].df == 1


def test_funnel_order_matters(spark):
    import datetime as dt

    t0 = dt.datetime(2020, 1, 1)
    rows = [
        # user 1: view -> click -> purchase (full conversion)
        (1, t0, 1, "view"), (2, t0 + dt.timedelta(hours=1), 1, "click"),
        (3, t0 + dt.timedelta(hours=2), 1, "purchase"),
        # user 2: click BEFORE view, purchase after view but no
        # post-view click -> counts for view only
        (4, t0, 2, "click"), (5, t0 + dt.timedelta(hours=1), 2, "view"),
        (6, t0 + dt.timedelta(hours=2), 2, "purchase"),
        # user 3: view then purchase, no click -> view only
        (7, t0, 3, "view"), (8, t0 + dt.timedelta(hours=1), 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    from tsod_spark.analytics import olap

    out = olap.funnel(df).collect()[0]
    assert (out.n_view, out.n_click, out.n_purchase) == (3, 1, 1)


# ---- similarity -------------------------------------------------------


def test_cosine_topk_self_similarity(spark, embeddings):
    dup = embeddings.where(F.col("vec_id") == 0).select(
        F.lit(999999).alias("vec_id"), "embedding", "label"
    )
    out = similarity.cosine_topk(embeddings.unionByName(dup), query_vec_id=0, k=3).collect()
    assert out[0].vec_id == 999999 and out[0].cos_sim == 1.0


def test_embedding_groups_cluster_exact_copies(spark, embeddings):
    # Two exact copies of vector 0 must land in vector 0's group via
    # the LSH-bucketed cosine pair graph; every vector labeled once.
    base = embeddings.where(F.col("vec_id") == 0)
    copy = lambda i: base.select(  # noqa: E731
        F.lit(i).alias("vec_id"), "embedding", "label"
    )
    with_dups = embeddings.unionByName(copy(999998)).unionByName(copy(999999))
    out = similarity.embedding_duplicate_groups(with_dups).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(out) == embeddings.count() + 2
    g = by_id[0]["group_id"]
    assert by_id[999998]["group_id"] == g and by_id[999999]["group_id"] == g
    assert by_id[0]["group_size"] >= 3


def test_knn_join_shape(spark, embeddings):
    out = similarity.knn_join(embeddings, n_queries=3, k=2).collect()
    assert len(out) == 6
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rows in per_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == [1, 2]
        sims = [r.cos_sim for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)


def test_lsh_bucket_assignment(spark, embeddings):
    hist = similarity.lsh_bucket_histogram(embeddings)
    total = hist.agg(F.sum("n_vectors")).first()[0]
    assert total == embeddings.count()


def test_ivf_cells_partition_all_vectors(spark, embeddings):
    hist = similarity.ivf_cell_histogram(embeddings, n_cells=8)
    rows = hist.collect()
    assert sum(r["n_vectors"] for r in rows) == embeddings.count()
    assert 1 <= len(rows) <= 8


def test_ivf_topk_recall_vs_brute_force(spark, embeddings):
    exact = {r["vec_id"] for r in similarity.cosine_topk(embeddings, k=10).collect()}
    approx = similarity.ivf_topk(embeddings, k=10, n_cells=8, n_probe=4).collect()
    got = {r["vec_id"] for r in approx}
    assert len(approx) == 10
    # probing half the cells must recover most of the true top-10
    assert len(exact & got) >= 6


def test_ivf_mean_recall_at_10(spark, embeddings):
    """Quantified recall guarantee for the rows-only IVF queries: mean
    recall@10 over a query sample, probing a SHARED prebuilt index
    (index build and probe separated, as in production)."""
    index = similarity.ivf_index(embeddings, n_cells=8)
    index = (index[0].cache(), index[1])
    queries = [0, 50, 100, 200, 300, 400, 499]
    recalls = []
    for qid in queries:
        exact = {
            r["vec_id"]
            for r in similarity.cosine_topk(embeddings, query_vec_id=qid, k=10).collect()
        }
        got = {
            r["vec_id"]
            for r in similarity.ivf_topk(
                embeddings, query_vec_id=qid, k=10, n_probe=4, index=index
            ).collect()
        }
        recalls.append(len(exact & got) / 10)
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.7, (mean_recall, recalls)


def test_pq_adc_recall_vs_brute_force(spark, embeddings):
    """PQ/ADC search over a shared prebuilt index: mean recall@10
    against exact L2 brute force over a query sample, plus an encode
    sanity check (codes in range, one per subspace)."""
    books = similarity.pq_train(embeddings, m=16, n_centroids=16)
    codes = similarity.pq_encode(embeddings, books).cache()
    first = codes.first()
    assert len(first["codes"]) == 16
    assert all(0 <= c < 16 for c in first["codes"])

    from pyspark.sql import functions as FF

    queries = [0, 100, 250, 400, 499]
    recalls = []
    for qid in queries:
        q = embeddings.where(FF.col("vec_id") == qid).select(
            FF.col("embedding").alias("__q")
        )
        d2 = FF.aggregate(
            FF.zip_with(
                FF.col("embedding"),
                FF.col("__q"),
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            FF.lit(0.0),
            lambda acc, x: acc + x,
        )
        exact = {
            r["vec_id"]
            for r in embeddings.where(FF.col("vec_id") != qid)
            .crossJoin(FF.broadcast(q))
            .select("vec_id", d2.alias("d2"))
            .orderBy("d2", "vec_id")
            .limit(10)
            .collect()
        }
        got = {
            r["vec_id"]
            for r in similarity.pq_topk(
                embeddings, query_vec_id=qid, k=10, index=(codes, books)
            ).collect()
        }
        recalls.append(len(exact & got) / 10)
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.6, (mean_recall, recalls)
    codes.unpersist()


# ---- multimodal -------------------------------------------------------


def test_multimodal_decode_stub(spark, docs):
    assets = multimodal.fake_assets_from_documents(docs)
    decoded = multimodal.decode_assets(assets)
    rows = decoded.collect()
    assert len(rows) == docs.count()
    for r in rows[:10]:
        assert r.n_bytes > 0
        assert 16 <= r.width < 256 and 16 <= r.height < 256
        assert (r.kind == "image") == (r.n_frames == 1)
    planned = multimodal.resize_images(decoded, max_side=32).collect()
    assert all(max(p.target_width, p.target_height) <= 32 for p in planned)
    frames = multimodal.sample_frames(decoded, every_n=10)
    assert frames.count() > 0


def test_multimodal_real_decode_rejects_unknown_format(spark, docs):
    # fake assets carry raw text bytes — not BMP/PPM/WAV
    assets = multimodal.fake_assets_from_documents(docs.limit(2))
    with pytest.raises(Exception, match="unsupported payload format"):
        multimodal.decode_assets(assets, decode_stub=False).collect()


def test_multimodal_codec_roundtrip():
    """build_* payloads parse back to exactly what was written."""
    from tsod_spark.pipeline.multimodal import (
        _decode_payload,
        build_bmp,
        build_ppm,
        build_wav,
    )

    assert _decode_payload(build_bmp(7, 5, 200)) == (7, 5, 1, 200)
    assert _decode_payload(build_bmp(4, 3, 0)) == (4, 3, 1, 0)
    assert _decode_payload(build_ppm(12, 9, 33)) == (12, 9, 1, 33)
    # WAV: (channels, bits, n_samples, mean|amp| >> 8)
    assert _decode_payload(build_wav(120, 256 * 77)) == (1, 16, 120, 77)
    assert _decode_payload(build_wav(50, 0)) == (1, 16, 50, 0)


def test_multimodal_real_decode_spark_path(spark):
    """End-to-end: synthetic payloads decoded by the real codecs inside
    mapInPandas match the generator's arithmetic."""
    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    out = multimodal.decode_assets(
        multimodal.synthetic_assets(ids), decode_stub=False
    ).collect()
    assert len(out) == 30
    for r in out:
        i = r.asset_id
        if i % 3 == 0:
            assert (r.width, r.height, r.mean_brightness) == (
                4 + i % 13, 3 + i % 11, i % 256,
            )
        elif i % 3 == 1:
            assert (r.width, r.height, r.mean_brightness) == (
                5 + i % 9, 2 + i % 7, (7 * i) % 256,
            )
        else:
            assert (r.width, r.height, r.n_frames, r.mean_brightness) == (
                1, 16, 50 + i % 100, i % 128,
            )


# ---- persistence ------------------------------------------------------


def test_persistence_roundtrip(spark, tmp_path):
    det = CombinedDetector(
        [RangeDetector(0.0, 2.0), DiffDetector(1.5), HampelDetector(5, 3)]
    )
    p = tmp_path / "model.json"
    save(det, p)
    loaded = load(p)
    assert isinstance(loaded, CombinedDetector) and len(loaded) == 3

    df = hourly_series(spark, [0.0, 1.0, 5.0, 1.0, 0.5])
    a = [r.is_anomaly for r in det.detect(df).orderBy("ts").collect()]
    b = [r.is_anomaly for r in loaded.detect(df).orderBy("ts").collect()]
    assert a == b


def test_persistence_fitted_params(spark, tmp_path):
    normal = hourly_series(spark, [0.0, 1.0, 2.0, 3.0, 4.0])
    det = RangeDetector().fit(normal)
    p = tmp_path / "range.json"
    save(det, p)
    loaded = load(p)
    assert loaded._min == 0.0 and loaded._max == 4.0


def test_persistence_golden_fixture(spark):
    """Load the COMMITTED golden params file (the operational pattern:
    configure+fit offline, save, load in production — mirrors
    /root/reference/tests/test_persistence.py:23-31 where a golden
    combined.joblib is loaded and type-checked) and assert the loaded
    detector detects identically to a freshly constructed one."""
    import pathlib

    golden = pathlib.Path(__file__).parent / "data" / "combined_golden.json"
    loaded = load(golden)
    assert isinstance(loaded, CombinedDetector) and len(loaded) == 5

    from tsod_spark import (
        ConstantValueDetector,
        GradientDetector,
    )

    fresh = CombinedDetector(
        [
            RangeDetector(1.0, 300.0),
            DiffDetector(80.0),
            GradientDetector(0.005),
            ConstantValueDetector(3, 5.0),
            HampelDetector(5, 3),
        ]
    )
    df = hourly_series(
        spark, [10.0, 10.0, 10.0, 10.0, 350.0, 12.0, 100.0, 11.0, 10.5, 9.0]
    )
    a = [r.is_anomaly for r in loaded.detect(df).orderBy("ts").collect()]
    b = [r.is_anomaly for r in fresh.detect(df).orderBy("ts").collect()]
    assert a == b and any(a)


def test_persistence_per_series_fit_roundtrip(spark, tmp_path):
    """Per-series fitted state must survive save/load via the parquet
    sidecar — a loaded detector with defaulted scalars (±inf bounds)
    would silently flag nothing."""
    rows = [("a", i, float(i)) for i in range(5)] + [
        ("b", i, float(10 * i)) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "series string, hour int, value double").select(
        "series", F.timestamp_seconds(F.col("hour") * 3600).alias("ts"), "value"
    )
    tsf = TimeSeriesFrame(df, ts_col="ts", value_col="value", series=["series"])
    det = RangeDetector().fit(tsf)
    assert det._params_df is not None

    p = tmp_path / "per_series.json"
    save(det, p)
    loaded = load(p, spark)
    assert loaded._params_df is not None

    test = spark.createDataFrame(
        [("a", 6, 5.0), ("b", 6, 5.0)], "series string, hour int, value double"
    ).select("series", F.timestamp_seconds(F.col("hour") * 3600).alias("ts"), "value")
    test_tsf = TimeSeriesFrame(test, ts_col="ts", value_col="value", series=["series"])
    got = {
        (r.series): r.is_anomaly for r in loaded.detect(test_tsf).collect()
    }
    # series a fit on [0,4] -> 5.0 is out of range; series b fit on [0,40]
    assert got == {"a": True, "b": False}


# ---- features ---------------------------------------------------------


def test_lag_time_series(spark):
    df = hourly_series(spark, [1.0, 2.0, 3.0, 4.0])
    out = lag_time_series(TimeSeriesFrame(df), [1, -1]).orderBy("ts").collect()
    assert [r["1"] for r in out] == [None, 1.0, 2.0, 3.0]
    assert [r["-1"] for r in out] == [2.0, 3.0, 4.0, None]


def test_create_dataset(spark):
    df = hourly_series(spark, [1.0, 2.0, 3.0, 4.0, 5.0])
    out = create_dataset(TimeSeriesFrame(df), time_steps=2).orderBy("ts").collect()
    assert len(out) == 3
    assert out[0].features == [1.0, 2.0] and out[0].y == 3.0


# ---- sources ----------------------------------------------------------


def test_read_csv_timeseries(spark, tmp_path):
    p = tmp_path / "series.csv"
    p.write_text(
        "datetime,value\n2020-01-01 00:00,1.0\n2020-01-01 01:00,2.0\n2020-01-01 02:00,\n"
    )
    from tsod_spark.sources import read_csv_timeseries

    tsf = read_csv_timeseries(spark, str(p))
    rows = tsf.df.orderBy("ts").collect()
    assert len(rows) == 3
    assert rows[0].value == 1.0 and rows[2].value is None
    mask = [
        r.is_anomaly
        for r in RangeDetector(0.0, 1.5).detect(tsf).orderBy("ts").collect()
    ]
    assert mask == [False, True, False]


def test_netcdf4_hdf5_requires_xarray(spark, tmp_path):
    """NetCDF-4 payloads are HDF5 containers; without xarray the reader
    must say so (classic files decode stdlib-side — test_netcdf.py)."""
    from tsod_spark.sources import read_netcdf_timeseries

    try:
        import xarray  # noqa: F401

        pytest.skip("xarray present")
    except ImportError:
        pass
    p = tmp_path / "nc4.nc"
    p.write_bytes(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(NotImplementedError):
        read_netcdf_timeseries(spark, str(p), "PSAL")


def test_netcdf_fleet_with_injected_decoder(spark, tmp_path):
    """The binaryFile + mapInPandas fleet path: one decode per file,
    rows shaped (source, ts, value, qc) with the CMEMS QC companion
    semantics — exercised with an injected decoder standing in for
    xarray (absent here)."""
    import pandas as pd

    from tsod_spark.sources import qc_flag_projection, read_netcdf_fleet

    fleet = tmp_path / "fleet"
    fleet.mkdir()
    # fake "station files": each carries its rows as CSV bytes
    for station in range(3):
        lines = [
            f"2021-01-0{i + 1} 00:00:00,{10.0 * station + i},{1 if i != 2 else 4}"
            for i in range(4)
        ]
        (fleet / f"station{station}.nc").write_bytes("\n".join(lines).encode())

    def decoder(content: bytes) -> pd.DataFrame:
        rows = [ln.split(",") for ln in content.decode().splitlines()]
        return pd.DataFrame(
            {
                "ts": pd.to_datetime([r[0] for r in rows]),
                "value": [float(r[1]) for r in rows],
                "qc": [int(r[2]) for r in rows],
            }
        )

    out = read_netcdf_fleet(spark, str(fleet / "*.nc"), decoder=decoder)
    got = qc_flag_projection(out).collect()
    assert len(got) == 12
    assert len({r.source for r in got}) == 3
    # CMEMS semantics: qc flag 1 = good, everything else suspect
    assert sum(not r.qc_is_good for r in got) == 3
    by_station = {}
    for r in got:
        by_station.setdefault(r.source.rsplit("/", 1)[-1], []).append(r.value)
    assert sorted(by_station["station2.nc"]) == [20.0, 21.0, 22.0, 23.0]


# ---- MLlib detectors --------------------------------------------------


def test_regression_residual_detector(spark):
    import numpy as np

    np.random.seed(7)
    base = np.cumsum(np.random.normal(size=400)).tolist()
    dirty = list(base)
    dirty[200] += 40.0  # big residual spike
    normal = hourly_series(spark, base)
    test = hourly_series(spark, dirty)

    from tsod_spark.detectors.mllib import RegressionResidualDetector

    det = RegressionResidualDetector(time_steps=3, n_sigmas=6.0).fit(normal)
    flagged = det.detect(test).where("is_anomaly").collect()
    assert any(abs(r.value - dirty[200]) < 1e-9 for r in flagged)
    assert len(flagged) <= 5


def test_kmeans_distance_detector(spark):
    import numpy as np

    np.random.seed(11)
    vals = (np.sin(np.linspace(0, 30, 500)) + np.random.normal(scale=0.05, size=500)).tolist()
    dirty = list(vals)
    for i in range(250, 258):
        dirty[i] = 5.0  # alien shape
    from tsod_spark.detectors.mllib import KMeansDistanceDetector

    det = KMeansDistanceDetector(time_steps=6, k=4, quantile=0.995).fit(
        hourly_series(spark, vals)
    )
    flagged = det.detect(hourly_series(spark, dirty)).where("is_anomaly").count()
    assert flagged > 0


# ---- partitioned sink -------------------------------------------------


def test_write_partitioned_bounds_files_and_prunes(spark, tmp_path):
    """One file per partition dir by construction; a partition-column
    filter on read-back must prune at the source (PartitionFilters),
    and all rows survive the round trip."""
    import glob

    from pyspark.sql import functions as F

    from tsod_spark.registry import table
    from tsod_spark.sources import write_partitioned

    e = table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    out = str(tmp_path / "events_by_day")
    write_partitioned(e, out, ["day"], sort_cols=["user_id", "ts"])

    part_dirs = glob.glob(f"{out}/day=*")
    assert part_dirs, "no hive partition directories written"
    for d in part_dirs:
        files = [f for f in glob.glob(f"{d}/*.parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files, wanted 1"

    back = spark.read.parquet(out)
    assert back.count() == e.count()

    one_day = sorted(p.rsplit("day=", 1)[1] for p in part_dirs)[0]
    filtered = back.where(F.col("day") == one_day)
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200]
    # spot-check content equality for the pruned day
    exp = e.where(F.col("day") == one_day).count()
    assert filtered.count() == exp


def test_write_partitioned_salted_file_spread(spark, tmp_path):
    from pyspark.sql import functions as F

    from tsod_spark.registry import table
    from tsod_spark.sources import write_partitioned

    e = table(spark, "/root/testdata/sf0.001", "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    out = str(tmp_path / "events_salted")
    write_partitioned(e, out, ["day"], files_per_partition=3)
    import glob

    for d in glob.glob(f"{out}/day=*"):
        n = len(glob.glob(f"{d}/*.parquet"))
        assert 1 <= n <= 3, f"{d}: {n} files"
    assert spark.read.parquet(out).count() == e.count()


def test_build_session_conf_applies():
    from tsod_spark.conf import build_session, recommended_conf

    s = build_session("conf-test", master="local[2]", total_cores=2)
    try:
        assert s.conf.get("spark.sql.adaptive.enabled") == "true"
        assert s.conf.get("spark.sql.shuffle.partitions") == "6"
        assert recommended_conf(100)["spark.sql.shuffle.partitions"] == "300"
    finally:
        pass  # session is shared JVM-wide; leave it for other tests


# ---- corpus sampling / chunk dedup ------------------------------------


def test_chunk_dedup_drops_repeated_spans(spark):
    from tsod_spark.pipeline import dedup

    ten = "a b c d e f g h i j"
    docs = spark.createDataFrame(
        [
            (1, ten + " k l m"),          # chunk0 = ten, chunk1 = "k l m"
            (2, "x y z " + "p q r s t u v w 0 1"),  # unique chunks
            (3, ten + " k l m"),          # exact repeat of doc 1's chunks
            (4, ""),                       # empty doc
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.chunk_dedup(docs).collect()}
    assert out[1].text_dedup == ten + " k l m"
    assert out[1].n_kept == 2 and out[1].n_total == 2
    # doc 3's both chunks already seen at doc 1 -> fully removed
    assert out[3].text_dedup == "" and out[3].n_kept == 0 and out[3].n_total == 2
    assert out[2].n_kept == 2  # 13 tokens -> chunks of 10 + 3
    assert out[4].text_dedup == "" and out[4].n_total == 0


def test_chunk_dedup_first_occurrence_within_doc(spark):
    """A chunk repeated INSIDE one doc keeps only its first occurrence."""
    from tsod_spark.pipeline import dedup

    ten = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(7, ten + " " + ten)], "doc_id long, text string"
    )
    r = dedup.chunk_dedup(docs).collect()[0]
    assert r.n_total == 2 and r.n_kept == 1 and r.text_dedup == ten


def test_mixture_sample_deterministic_and_temperature(spark):
    from tsod_spark.pipeline import curate

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r.doc_id for r in curate.mixture_sample(docs, 0.5).collect()}
    b = {r.doc_id for r in curate.mixture_sample(docs, 0.5).collect()}
    assert a == b  # content-hash draws, not RNG
    kept_small = sum(1 for d in a if d >= 1000) / 100
    kept_big = sum(1 for d in a if d < 1000) / 900
    # α=0.5 upweights the small source
    assert kept_small > kept_big
    assert 0.3 < len(a) / 1000 < 0.7  # overall ≈ target_frac


def test_stratified_sample_exact_quota(spark):
    from tsod_spark.pipeline import curate

    rows = [(i, f"s{i % 7}") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = curate.stratified_sample(docs, per_stratum=5).collect()
    per = {}
    for r in out:
        per.setdefault(r.source, set()).add(r.doc_id)
    assert len(per) == 7 and all(len(v) == 5 for v in per.values())
    again = curate.stratified_sample(docs, per_stratum=5).collect()
    assert {(r.doc_id, r.rk) for r in again} == {(r.doc_id, r.rk) for r in out}


def test_canonical_docs_longest_wins(spark, docs):
    """Planted cluster {0, short-mutant, long-mutant}: the longest text
    is canonical; singleton docs are each their own canonical."""
    base = docs.where(F.col("doc_id") == 0)
    longer = base.select(
        F.lit(999998).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tail tail tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    same = base.select(
        F.lit(999999).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    corpus = docs.unionByName(longer).unionByName(same)
    out = {r.doc_id: r for r in dedup.canonical_docs(corpus).collect()}
    g = out[0].group_id
    cluster = [r for r in out.values() if r.group_id == g]
    assert len(cluster) >= 3
    assert out[999998].is_canonical  # longest
    assert not out[0].is_canonical and not out[999999].is_canonical
    singles = [r for r in out.values() if r.group_size == 1]
    assert singles and all(r.is_canonical for r in singles)


def test_incremental_new_docs(spark, docs):
    """Batch vs corpus: exact corpus dup, near corpus dup, intra-batch
    dup, and a genuinely new doc — only the new doc (and the first of
    the intra-batch pair) survive."""
    corpus = docs
    base = docs.where(F.col("doc_id") == 0)
    mk = lambda i, text_expr: base.select(  # noqa: E731
        F.lit(i).alias("doc_id"), text_expr.alias("text"), "lang", "source", "n_chars"
    )
    batch = (
        mk(1000001, F.col("text"))  # exact dup of corpus doc 0
        .unionByName(mk(1000002, F.concat(F.col("text"), F.lit(" zz"))))  # near dup
        .unionByName(
            spark.createDataFrame(
                [
                    (1000003, "completely novel words nowhere else qqq www eee rrr ttt yyy uuu iii", "en", "srcX", 60),
                    (1000004, "completely novel words nowhere else qqq www eee rrr ttt yyy uuu iii", "en", "srcX", 60),
                ],
                "doc_id long, text string, lang string, source string, n_chars long",
            )
        )
    )
    kept = {r.doc_id for r in dedup.incremental_new_docs(corpus, batch).collect()}
    assert kept == {1000003}  # 1000004 is an intra-batch exact dup of 1000003


def test_write_read_corpus_roundtrip(spark, docs, tmp_path):
    """Curate -> export -> manifest -> reload: the full last mile."""
    from tsod_spark.pipeline import corpus_io, curate

    curated = (
        curate.split_assign(docs)
        .join(docs.select("doc_id", "text", "source"), "doc_id")
        .withColumn("n_tokens", F.size(F.split(F.col("text"), r"\s+")))
        .select("doc_id", "text", "source", "split", "n_tokens")
    )
    path = str(tmp_path / "corpus")
    manifest = corpus_io.write_corpus(curated, path, partition_by=("split",))
    assert manifest["n_docs"] == docs.count()
    assert {p["split"] for p in manifest["partitions"]} <= {"train", "val", "test"}
    assert manifest["n_tokens"] > 0

    back, m2 = corpus_io.read_corpus(spark, path)
    assert m2 == manifest
    assert back.count() == docs.count()
    assert set(back.columns) == {"doc_id", "text", "source", "split", "n_tokens"}
    # partition pruning works on the hive layout
    assert back.where("split = 'train'").count() == next(
        p["n_docs"] for p in manifest["partitions"] if p["split"] == "train"
    )


def test_jsonl_interop(spark, docs, tmp_path):
    from tsod_spark.pipeline import corpus_io

    path = str(tmp_path / "corpus_jsonl")
    corpus_io.write_jsonl(docs.select("doc_id", "text", "source"), path)
    back = corpus_io.read_jsonl(
        spark, path, schema="doc_id long, text string, source string"
    )
    assert back.count() == docs.count()
    a = {r.doc_id: r.text for r in back.collect()}
    b = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert a == b


def test_contamination_stats_planted(spark, docs):
    """A corpus doc sharing a 5-gram with the benchmark slice drives
    its source's contamination count; untouched sources report 0."""
    from tsod_spark.pipeline import curate

    bench = spark.createDataFrame(
        [(900001, "alpha beta gamma delta epsilon zeta", "bench", "en", 30)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    leak = spark.createDataFrame(
        [(900002, "x alpha beta gamma delta epsilon y", "srcLeak", "en", 30),
         (900003, "totally clean words here nothing shared", "srcClean", "en", 30)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = {r.source: r for r in curate.contamination_stats(leak, bench).collect()}
    assert out["srcLeak"].n_contaminated == 1
    assert out["srcLeak"].contamination_rate == 1.0
    assert out["srcClean"].n_contaminated == 0 and out["srcClean"].contamination_rate == 0.0


def test_jaccard_bucket_decomposition_invariance(spark, docs):
    """The pair-bucket parallelism decomposition must not change
    results: identical top-k for any bucket count."""
    src0 = docs.where(F.col("source").isin("src0", "src1", "src2"))
    outs = []
    for nb in (1, 3, 8):
        rows = dedup.jaccard_pairs(src0, top_n=15, n_buckets=nb).collect()
        outs.append([(r.doc_a, r.doc_b, r.jaccard) for r in rows])
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 15


def test_quantize_embeddings_roundtrip(spark):
    """Codes span [0, levels], constant vectors reconstruct exactly,
    and MSE is bounded by (scale/2)^2."""
    from tsod_spark.pipeline import similarity

    emb = spark.createDataFrame(
        [
            (1, [0.0, 1.0, 0.5, 0.25]),
            (2, [3.0, 3.0, 3.0, 3.0]),      # constant: scale 0
            (3, [-2.0, 2.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in similarity.quantize_embeddings(emb).collect()}
    assert out[1].codes[0] == 0 and out[1].codes[1] == 255
    assert out[2].codes == [0, 0, 0, 0] and out[2].mse == 0.0
    assert out[2].q_scale == 0.0
    for r in out.values():
        assert all(0 <= c <= 255 for c in r.codes)
        if r.q_scale > 0:
            assert r.mse <= (r.q_scale / 2) ** 2 + 1e-12


def test_audio_energy_windows_real_wav(spark):
    """Real PCM parsing: constant-amplitude WAV gives every window the
    same quantized RMS; the tail window is short; images are skipped."""
    from tsod_spark.pipeline import multimodal

    ids = spark.createDataFrame([(2,), (5,), (3,)], "doc_id long")  # 2,5 audio; 3 image
    out = multimodal.audio_energy_windows(multimodal.synthetic_assets(ids)).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == {2, 5}
    for aid, rows in by_asset.items():
        n = 50 + aid % 100
        assert sum(r.n_samples for r in rows) == n
        assert len(rows) == -(-n // 25)
        assert all(r.rms_q == aid % 128 for r in rows)


def test_resize_pixels_roundtrip(spark):
    """Pixel path: 16x12 gray BMP -> max_side 8 -> 8x6 P6 whose decoded
    bytes preserve the gray value; small images pass through unscaled."""
    from tsod_spark.pipeline import multimodal

    ids = spark.createDataFrame([(12,), (1,)], "doc_id long")  # 12: BMP 16x... compute
    assets = multimodal.synthetic_assets(ids)
    resized = multimodal.resize_images_pixels(assets, max_side=8)
    out = {r.asset_id: r for r in multimodal.decode_assets(
        resized, decode_stub=False).collect()}
    for aid, r in out.items():
        w = 4 + aid % 13 if aid % 3 == 0 else 5 + aid % 9
        h = 3 + aid % 11 if aid % 3 == 0 else 2 + aid % 7
        sc = min(1.0, 8.0 / max(w, h))
        assert (r.width, r.height) == (-(-w * sc // 1), -(-h * sc // 1)) or (
            r.width == int(-(-(w * sc)) // 1)
        )
        import math
        assert r.width == math.ceil(w * sc) and r.height == math.ceil(h * sc)
        v = aid % 256 if aid % 3 == 0 else (7 * aid) % 256
        assert r.mean_brightness == v  # constant gray survives resampling


def test_minhash_lsh_precision_recall_vs_exact_jaccard(spark, docs):
    """Quantified dedup quality: LSH candidate pairs at est_jaccard >=
    0.5 against an INDEPENDENT pure-python exact-Jaccard ground truth
    (3-shingle sets, all C(n,2) pairs). The banded sketch must be a
    faithful proxy, not just 'returns some pairs'."""
    import itertools
    import re

    rows = docs.select("doc_id", "text").collect()

    def sh3(t):
        toks = [w for w in re.split(r"\s+", t.lower()) if w]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    shingle_sets = {r["doc_id"]: sh3(r["text"]) for r in rows}
    truth = set()
    for a, b in itertools.combinations(sorted(shingle_sets), 2):
        sa, sb = shingle_sets[a], shingle_sets[b]
        if sa and sb and len(sa & sb) / len(sa | sb) >= 0.5:
            truth.add((a, b))
    assert len(truth) >= 10  # the fixture must make this non-vacuous

    cand = dedup.minhash_band_pairs(docs, min_est_jaccard=0.5)
    pred = {(r["doc_a"], r["doc_b"]) for r in cand.select("doc_a", "doc_b").collect()}
    inter = truth & pred
    precision = len(inter) / max(len(pred), 1)
    recall = len(inter) / max(len(truth), 1)
    # measured on the fixture: precision 0.97, recall 1.0
    assert precision >= 0.8, (precision, len(pred), len(truth))
    assert recall >= 0.9, (recall, len(pred), len(truth))


def test_ivfpq_recall_vs_brute_force(spark, embeddings):
    """The composed IVF+PQ search over a shared prebuilt index: mean
    recall@10 vs exact L2 brute force — the probe restriction plus PQ
    approximation must still recover most true neighbors after the
    exact refine stage."""
    from pyspark.sql import functions as FF

    assigned, centroids = similarity.ivf_index(embeddings, n_cells=8)
    books = similarity.pq_train(embeddings, m=16, n_centroids=16)
    assigned_codes = (
        assigned.select("vec_id", "cell")
        .join(similarity.pq_encode(embeddings, books), "vec_id")
        .cache()
    )
    queries = [0, 100, 250, 400, 499]
    recalls = []
    for qid in queries:
        qv = embeddings.where(FF.col("vec_id") == qid).select(
            FF.col("embedding").alias("__q")
        )
        d2 = FF.aggregate(
            FF.zip_with(
                FF.col("embedding"),
                FF.col("__q"),
                lambda a, b: (a.cast("double") - b.cast("double"))
                * (a.cast("double") - b.cast("double")),
            ),
            FF.lit(0.0),
            lambda acc, x: acc + x,
        )
        exact = {
            r["vec_id"]
            for r in embeddings.where(FF.col("vec_id") != qid)
            .crossJoin(FF.broadcast(qv))
            .select("vec_id", d2.alias("d2"))
            .orderBy("d2", "vec_id")
            .limit(10)
            .collect()
        }
        got = {
            r["vec_id"]
            for r in similarity.ivfpq_topk(
                embeddings,
                query_vec_id=qid,
                k=10,
                n_probe=4,
                index=(assigned_codes, centroids, books),
            ).collect()
        }
        recalls.append(len(exact & got) / 10)
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, (mean_recall, recalls)
    assigned_codes.unpersist()


# ---- hot-bucket guard (cap_hot_buckets) -------------------------------


def test_cap_hot_buckets_noop_below_cap(spark, docs):
    """Recall contract: when every bucket is at or under the cap, the
    capped generators are bit-identical to the uncapped ones."""
    un_mh = {tuple(r) for r in dedup.minhash_band_pairs(docs).collect()}
    cap_mh = {
        tuple(r)
        for r in dedup.minhash_band_pairs(docs, max_bucket=10**6).collect()
    }
    assert cap_mh == un_mh
    spark.catalog.clearCache()
    un_sh = {tuple(r) for r in dedup.simhash_near_pairs(docs).collect()}
    cap_sh = {
        tuple(r)
        for r in dedup.simhash_near_pairs(docs, max_bucket=10**6).collect()
    }
    assert cap_sh == un_sh
    spark.catalog.clearCache()


def test_cap_hot_buckets_truncates_clique_keeps_planted_pair(spark, docs):
    """A boilerplate clique larger than the cap contributes ZERO pairs
    (all its buckets are dropped whole — bounded fan-out instead of a
    B^2 blowup), while a planted near-dup pair sitting in small
    buckets is still found."""
    boiler = spark.range(30).select(
        (F.col("id") + 500000).alias("doc_id"),
        F.lit(
            "the quick brown fox jumps over the lazy dog again and again"
        ).alias("text"),
        F.lit("en").alias("lang"),
        F.lit("boiler").alias("source"),
        F.lit(60).alias("n_chars"),
    )
    planted = docs.where(F.col("doc_id") == 0).select(
        F.lit(999999).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    corpus = docs.unionByName(boiler).unionByName(planted)
    clique = set(range(500000, 500030))

    mh = dedup.minhash_band_pairs(corpus, max_bucket=8).collect()
    assert not any(p.doc_a in clique and p.doc_b in clique for p in mh)
    assert any({p.doc_a, p.doc_b} == {0, 999999} for p in mh)
    spark.catalog.clearCache()

    sh = dedup.simhash_near_pairs(corpus, max_bucket=8).collect()
    assert not any(p.doc_a in clique and p.doc_b in clique for p in sh)
    assert any({p.doc_a, p.doc_b} == {0, 999999} for p in sh)
    spark.catalog.clearCache()


def test_hot_bucket_stats_counts_exactly(spark):
    """Truncation observability ("no silent caps"): for a frame with
    known bucket sizes the one-row stats aggregate must report the
    exact dropped bucket/row counts the cap would discard."""
    rows = (
        [("k1", i) for i in range(5)]    # size 5 -> dropped at cap 3
        + [("k2", i) for i in range(3)]  # size 3 -> kept
        + [("k3", i) for i in range(1)]  # size 1 -> kept
    )
    df = spark.createDataFrame(rows, "key string, doc_id long")
    s = dedup.hot_bucket_stats(df, ["key"], max_bucket=3).collect()[0]
    assert s.total_buckets == 3 and s.dropped_buckets == 1
    assert s.total_rows == 9 and s.dropped_rows == 5
    assert abs(s.dropped_row_frac - round(5 / 9, 6)) < 1e-12
    # consistency with the cap itself: surviving rows == total - dropped
    kept = dedup.cap_hot_buckets(df, ["key"], 3).count()
    assert kept == s.total_rows - s.dropped_rows


def test_hot_bucket_stats_matches_capped_band_join(spark, docs):
    """Integration: on the real corpus, the rows the stats frame says
    are dropped at cap=2 must equal the row-count delta between the
    uncapped and capped band tables."""
    sigs = dedup.minhash_signatures(docs)
    exploded = dedup.minhash_band_table(sigs)
    s = dedup.hot_bucket_stats(exploded, ["band", "key"], max_bucket=2).collect()[0]
    n_all = exploded.count()
    n_kept = dedup.cap_hot_buckets(exploded, ["band", "key"], 2).count()
    assert s.total_rows == n_all
    assert s.dropped_rows == n_all - n_kept
    assert s.dropped_buckets >= 1  # cap=2 triggers on this fixture
    spark.catalog.clearCache()


def test_winnow_overlap_cap_below_threshold_is_noop(spark, docs):
    """Below-cap equivalence for the winnow overlap generator: with a
    cap larger than any fingerprint bucket the output is bit-identical
    to the uncapped run (containment denominators included — n_fp is
    computed over the UNCAPPED fingerprint set)."""
    un = {tuple(r) for r in dedup.winnow_overlap_pairs(docs).collect()}
    spark.catalog.clearCache()
    capped = {
        tuple(r)
        for r in dedup.winnow_overlap_pairs(docs, max_bucket=10**6).collect()
    }
    spark.catalog.clearCache()
    assert capped == un and len(un) > 0


def test_winnow_screen_drops_span_carrier_keeps_clean(spark, docs):
    """Continuous-ingest span screening: a batch doc that lifts a
    >= 8-token span from a corpus doc is rejected; a batch doc with
    fresh content survives; an intra-batch later copy of an earlier
    batch doc's span is rejected too."""
    corpus = docs.where(F.col("doc_id") < 40)
    span_src = " ".join(
        docs.where(F.col("doc_id") == 0).select("text").collect()[0][0].split()[:12]
    )
    extra = spark.createDataFrame(
        [
            (1001, span_src + " completely new trailing content here", "en", "t", 10),
            (1002, "fresh unrelated totally novel wording all the way through ok", "en", "t", 10),
            (1003, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "t", 10),
            (1004, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "t", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    survivors = {
        r.doc_id
        for r in dedup.winnow_screen_new_docs(corpus, extra).collect()
    }
    spark.catalog.clearCache()
    assert 1001 not in survivors, "span lifted from corpus must be screened"
    assert 1002 in survivors, "fresh doc must survive"
    assert 1003 in survivors, "earlier batch doc wins"
    assert 1004 not in survivors, "later intra-batch span copy is screened"


# ---- winnowing fingerprints -------------------------------------------


def _py_winnow(text: str, k: int = 5, window: int = 4) -> set[int]:
    import hashlib
    import re as _re

    toks = [t for t in _re.split(r"\s+", text.lower()) if t]
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) for g in grams
    ]
    return {
        min(hs[j : j + window]) for j in range(len(hs) - window + 1)
    }


def test_winnow_fingerprints_match_python_oracle(spark, docs):
    """Differential: the Column-algebra winnowing (MOSS) must produce
    the exact fingerprint set of an independent python implementation
    for every document."""
    got: dict[int, set[int]] = {}
    for r in text.winnow_fingerprints(docs).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    rows = docs.select("doc_id", "text").collect()
    assert len(rows) > 0
    for r in rows:
        assert got.get(r.doc_id, set()) == _py_winnow(r.text), r.doc_id


def test_winnow_overlap_detects_planted_shared_span(spark, docs):
    """The MOSS guarantee: two documents sharing a token run of
    >= window + k - 1 = 8 tokens share at least one fingerprint; a
    planted 30-token common span across otherwise-different docs must
    surface as an overlap pair (and near-total containment for a doc
    that IS the span)."""
    span = " ".join(f"planted{i}" for i in range(30))
    a = docs.where(F.col("doc_id") == 0).select(
        F.lit(888888).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" " + span)).alias("text"),
        "lang", "source", "n_chars",
    )
    b = docs.where(F.col("doc_id") == 1).select(
        F.lit(999999).alias("doc_id"),
        F.concat(F.lit(span + " "), F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(a).unionByName(b)
    pairs = {
        (p.doc_a, p.doc_b): (p.shared_fps, p.containment)
        for p in dedup.winnow_overlap_pairs(corpus).collect()
    }
    spark.catalog.clearCache()
    assert (888888, 999999) in pairs
    shared, containment = pairs[(888888, 999999)]
    assert shared >= 2 and 0 < containment <= 1.0


def test_diverse_sample_exact_budget_and_proportional(spark, embeddings):
    """Hamilton allocation contract: exactly n rows delivered, every
    bucket gets floor or floor+1 of its proportional share, and the
    selection is deterministic."""
    n = 40
    out = similarity.diverse_sample(embeddings, n=n).collect()
    assert len(out) == n
    out2 = similarity.diverse_sample(embeddings, n=n).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    from collections import Counter

    got = Counter(r.bucket for r in out)
    sizes = Counter(
        r.bucket
        for r in embeddings.select(
            similarity.sign_lsh_bucket(F.col("embedding")).alias("bucket")
        ).collect()
    )
    total = sum(sizes.values())
    for b, s in sizes.items():
        base = (n * s) // total
        assert base <= got.get(b, 0) <= base + 1, (b, s, got.get(b, 0))


# ---- persisted LSH ingest index ---------------------------------------


def test_indexed_incremental_matches_self_contained(spark, docs, tmp_path):
    """The persisted-index screen must accept exactly the docs the
    self-contained incremental_new_docs accepts, after a parquet
    round-trip of the index (the production tick: read index, screen
    batch, append accepted docs' index rows)."""
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    batch = docs.where(F.col("doc_id") % 20 == 0)

    expected = {
        r.doc_id for r in dedup.incremental_new_docs(corpus, batch).collect()
    }
    spark.catalog.clearCache()

    path = str(tmp_path / "corpus_index")
    dedup.build_corpus_index(corpus).write.mode("overwrite").parquet(path)
    index = spark.read.parquet(path)
    accepted = dedup.incremental_new_docs_indexed(index, batch)
    got = {r.doc_id for r in accepted.collect()}
    assert got == expected and len(got) > 0
    spark.catalog.clearCache()

    # maintenance: append the accepted docs' own index rows; the next
    # tick's index must now reject a re-submission of an accepted doc
    dedup.build_corpus_index(accepted).write.mode("append").parquet(path)
    index2 = spark.read.parquet(path)
    some_accepted = sorted(got)[0]
    resubmit = docs.where(F.col("doc_id") == some_accepted).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "text", "lang", "source", "n_chars",
    )
    survivors = dedup.incremental_new_docs_indexed(index2, resubmit).count()
    assert survivors == 0
    spark.catalog.clearCache()


def test_corpus_index_has_no_text_and_bounded_width(spark, docs):
    """The index carries signatures/keys/hashes only — never text —
    and exactly `bands` rows per doc."""
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    idx = dedup.build_corpus_index(corpus)
    assert "text" not in idx.columns
    per_doc = idx.groupBy("doc_id").count().agg(
        F.min("count").alias("lo"), F.max("count").alias("hi")
    ).collect()[0]
    assert per_doc.lo == per_doc.hi == 4
    spark.catalog.clearCache()
