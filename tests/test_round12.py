"""Round-12 tests: the fused dedup-governance pipeline (VERDICT r11
#6) — plan pins (corpus text scanned once, bounded shuffles),
structural invariants, and a differential check against the five
constituent queries it fuses."""

import re

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_governance_pipeline_single_text_scan(spark):
    """The fused plan reads the corpus parquet ONCE (into the slim
    cached frame whose groupBy keys carry both content hashes and the
    length through the signature aggregate); every downstream stage —
    band pairs, tier counts, CC labels, canonical window, containment —
    reads caches. The naive five-query assembly scans the corpus text
    five+ times and computes the LSH pair join twice."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table
    from tsod_spark.util import cache_scope

    with cache_scope():
        df = dedup.governance_pipeline(table(spark, SF, "documents"))
        p = _plan(df)
        assert p.count("documents.parquet") == 1, p.count("documents.parquet")
        # shuffles bounded: sig aggregate, band self-join legs, tier
        # counts + window, canonical window, containment distinct —
        # every exchange is over slim hashed columns, never text
        assert len(re.findall(r"\(\d+\) Exchange", p)) <= 18
        # the shared pair cache is read by BOTH the CC branch and the
        # containment branch
        assert p.count("InMemoryTableScan") >= 3


def test_governance_pipeline_invariants(spark):
    """Structural certificates: raw-tier dup mass <= canonical-tier
    (byte-equal texts have equal token sets — the canonicalization
    monotonicity specialized to the two governance tiers), canonical +
    dropped partitions each source, dropped docs are near-dup members,
    and every rate/containment lands in [0, 1]."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table
    from tsod_spark.util import cache_scope

    with cache_scope():
        rows = dedup.governance_pipeline(
            table(spark, SF, "documents")
        ).collect()
    assert len(rows) == 20
    assert [r.source for r in rows] == sorted(r.source for r in rows)
    for r in rows:
        assert r.n_dup_docs_raw <= r.n_dup_docs_canonical
        assert r.n_canonical + r.n_dropped == r.n_docs
        assert r.n_dropped <= r.n_near_dup
        assert 0.0 <= r.near_dup_rate <= 1.0
        assert 0.0 <= r.drop_rate <= 1.0
        assert 0.0 <= r.max_containment <= 1.0
        assert (r.top_partner is None) == (r.max_containment == 0.0)
        assert r.cross_dup_pairs >= 0


def test_governance_pipeline_matches_constituents(spark):
    """Differential: every fused column equals the value assembled
    from the standalone operators it replaces (rate_by_source,
    canonical_docs, exact_cross_source_matrix, source_containment) —
    the fusion changes the plan, never the numbers."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table
    from tsod_spark.util import cache_scope

    docs = table(spark, SF, "documents")
    with cache_scope():
        gov = {
            r.source: r for r in dedup.governance_pipeline(docs).collect()
        }
    with cache_scope():
        groups = dedup.minhash_duplicate_groups(docs)
        n = F.count(F.lit(1)).cast("long")
        nd = F.sum((F.col("group_size") > 1).cast("int")).cast("long")
        rate = {
            r.source: r
            for r in docs.select("doc_id", "source")
            .join(groups, "doc_id")
            .groupBy("source")
            .agg(
                n.alias("n_docs"),
                nd.alias("n_near_dup"),
                F.round(nd / n, 6).alias("near_dup_rate"),
            )
            .collect()
        }
    with cache_scope():
        canon = (
            dedup.canonical_docs(docs)
            .join(docs.select("doc_id", "source"), "doc_id")
            .groupBy("source")
            .agg(
                F.sum(F.col("is_canonical").cast("int")).alias("n_canonical")
            )
            .collect()
        )
        canon = {r.source: r.n_canonical for r in canon}
    with cache_scope():
        cont = [
            r
            for r in dedup.source_containment(docs).collect()
            if r.source_a != r.source_b
        ]
    best = {}
    for r in cont:
        cand = (round(r.docs_contained / r.docs_total, 6), r.source_b)
        cur = best.get(r.source_a)
        if cur is None or cand[0] > cur[0] or (
            cand[0] == cur[0] and cand[1] < cur[1]
        ):
            best[r.source_a] = cand
    with cache_scope():
        matrix = dedup.exact_cross_source_matrix(docs).collect()
    cross = {}
    for r in matrix:
        if r.source_a != r.source_b:
            cross[r.source_a] = cross.get(r.source_a, 0) + r.dup_pairs
            cross[r.source_b] = cross.get(r.source_b, 0) + r.dup_pairs

    for s, g in gov.items():
        assert g.n_docs == rate[s].n_docs
        assert g.n_near_dup == rate[s].n_near_dup
        assert g.near_dup_rate == rate[s].near_dup_rate
        assert g.n_canonical == canon[s]
        assert g.cross_dup_pairs == cross.get(s, 0)
        exp_c, exp_p = best.get(s, (0.0, None))
        assert g.max_containment == exp_c
        assert g.top_partner == exp_p


# (the r12 window-composition pin moved to tests/test_round13.py as the
# r13 equivalent once CORRECTNESS_r12.json folded into the registry)


def test_steady_median3_protocol():
    """The scale-probe timing discipline: converged-warm absorbers,
    then median-of-3 over the FIRST consecutive triple meeting the
    20%-of-median spread bar (up to 9 runs), tightest-triple fallback,
    and the full run list returned so the record hides nothing."""
    import bench

    # hump spans past the absorbers; protocol extends until converged
    seq = iter([30.0, 13.0, 5.0, 10.0, 9.0, 8.5, 4.4, 4.3, 4.2])
    med, spr, runs = bench.steady_median3(lambda: next(seq))
    assert (med, spr) == (9.0, 1.5)
    assert len(runs) >= 3  # every timed run recorded

    # already steady: exactly 3 timed runs
    seq2 = iter([5.0, 5.0, 5.1, 5.0, 5.05])
    med, spr, runs = bench.steady_median3(lambda: next(seq2))
    assert (med, spr, len(runs)) == (5.05, 0.1, 3)

    # never converges: capped at max_runs, falls back to a triple
    vals = [5.0, 5.0] + [10.0, 3.0, 9.0, 2.0, 8.0, 1.5, 7.0, 1.0, 6.0]
    seq3 = iter(vals)
    med, spr, runs = bench.steady_median3(lambda: next(seq3))
    assert len(runs) == 9
    assert med in runs


def test_ivfpq_index_build_fused_and_equivalent(spark):
    """The fused IVF+PQ build must (a) be join-free with ONE corpus
    scan in its plan (the old assign + encode + vec_id join scanned
    twice and shuffled once), and (b) reproduce the unfused build's
    (cell, codes) assignment bit-for-bat — same KMeans model, same
    codebooks, same argmin tie rule."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings")
    assigned, cents, books = similarity.ivfpq_index_build(emb)
    p = _plan(assigned)
    assert p.count("embeddings.parquet") == 1
    assert "Join" not in p and "Exchange" not in p  # map-side only

    old = (
        similarity.ivf_index(emb)[0]
        .select("vec_id", "cell")
        .join(similarity.pq_encode(emb, books), "vec_id")
    )
    got = {
        r.vec_id: (r.cell, tuple(r.codes)) for r in assigned.collect()
    }
    exp = {r.vec_id: (r.cell, tuple(r.codes)) for r in old.collect()}
    assert got == exp
    # distortion is the summed per-subspace residual of the CHOSEN code
    for r in assigned.limit(50).collect():
        assert r.distortion >= 0.0


def test_ivfpq_build_stats_certificate(spark):
    """The one-row governance certificate holds on the fixture and its
    exact total matches the corpus count."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings")
    r = similarity.ivfpq_build_stats(emb).first()
    assert r.n_vectors_total == emb.count()
    assert r.all_cells_nonempty and r.max_cell_share_ok
    assert r.distortion_positive
    assert r.bytes_per_code == 16 and r.compression_x == 16.0


def test_stream_ivfpq_encode_matches_batch(spark, tmp_path):
    """Streaming ANN ingest equals the batch fused build field-exact
    over the same rows and the same FROZEN index metadata — cell,
    codes, and distortion per vec_id, across micro-batch boundaries."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table
    from tsod_spark.streaming import stream_ivfpq_encode

    emb = table(spark, SF, "embeddings")
    assigned, cents, books = similarity.ivfpq_index_build(emb)
    batch = {
        r.vec_id: (r.cell, tuple(r.codes), round(r.distortion, 9))
        for r in assigned.collect()
    }

    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    n = len(rows)
    chunk = (n + 2) // 3
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(
                part, "vec_id long, embedding array<float>"
            ).coalesce(1).write.parquet(
                str(tmp_path / f"batch_{i}"), mode="overwrite"
            )
    src = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "batch_*"))
    )
    q = (
        stream_ivfpq_encode(src, cents, books)
        .writeStream.format("memory")
        .queryName("t_ivfpq_enc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.vec_id: (r.cell, tuple(r.codes), round(r.distortion, 9))
        for r in spark.sql("SELECT * FROM t_ivfpq_enc").collect()
    }
    assert got == batch
    assert len(got) == n
