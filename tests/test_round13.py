"""Round-13 tests: the driver-window pin (VERDICT r12 #1), the
persisted IVF+PQ index serving path (VERDICT r12 #2 — partition-
pruning plan pin + differential vs the in-plan path), and the bench
adjudication blind-spot trigger (VERDICT r12 #4)."""

SF = "/root/testdata/sf0.001"


def test_r13_window_fold():
    """The r13 window pin, retired into history once CORRECTNESS_r13
    folded: the 5 never-verified names VERDICT r12 #1 demanded (and
    the 6 r13 registrations) must carry an r13 driver verdict in the
    registry's fold, i.e. they actually got verified in the window
    the pin reserved for them."""
    from tsod_spark import registry

    for n in (
        "ts_hw_anomaly",
        "ts_peaks",
        "orders_km_segment_summary",
        "dedup_governance_pipeline",
        "emb_ivfpq_build_stats",
        # the 6 r13 registrations
        "emb_ivfpq_persisted_topk",
        "dedup_governance_increments",
        "emb_ivfpq_persisted_recall_curve",
        "emb_ivfpq_residual_topk",
        "dedup_embedding_cell_block_stats",
    ):
        assert registry._latest_verified_round(n) == 13, n


def test_tight_median_drift_trigger():
    """VERDICT r12 #4 (threshold tightened to 1.4x in r14 — VERDICT
    r13 #4's ts_hw_anomaly sat at 1.49x, one tick under the old 1.5x):
    a median3 whose median exceeds prior by >1.4x with spread <30% of
    the median must be adjudicated; loose spreads, sub-floor times,
    prior-less names, and in-band medians must not fire."""
    import bench

    prior = {"a": 5.0, "b": 5.0, "c": 5.0, "d": 5.0, "f": 0.4}
    timings = {"a": 7.04, "b": 7.0, "c": 13.0, "d": 5.5, "e": 9.0,
               "f": 0.9}
    median3 = {
        # r12's real signature: 7.04/5.0 = 1.408x tight — the case the
        # 1.5x trigger missed by a tick; 1.4x catches it
        "a": {"runs": [7.04, 7.88, 6.99], "spread": 0.89},   # 1.408x: YES
        "b": {"runs": [6.9, 7.0, 7.1], "spread": 0.2},       # 1.4x exact: no
        "c": {"runs": [12.0, 13.0, 14.0], "spread": 2.0},    # 2.6x tight
        "d": {"runs": [5.4, 5.5, 5.6], "spread": 0.2},       # 1.1x: no
        "e": {"runs": [8.9, 9.0, 9.1], "spread": 0.2},       # no prior
        "f": {"runs": [0.88, 0.9, 0.92], "spread": 0.04},    # sub-floor
    }
    # c is 2.6x with tight spread — normally caught by the 2.5x
    # excursion trigger, but _flag_tight_drift itself must fire on any
    # >1.4x tight case; the caller dedups against the other triggers.
    assert bench._flag_tight_drift(median3, timings, prior) == ["a", "c"]

    # the blind-spot case proper: 1.8x prior, spread 12% of median
    prior2 = {"g": 5.0}
    timings2 = {"g": 9.0}
    median32 = {"g": {"runs": [8.5, 9.0, 9.5], "spread": 1.0}}
    assert bench._flag_tight_drift(median32, timings2, prior2) == ["g"]
    # same median with a LOOSE spread (55%) stays with median3_spread
    median33 = {"g": {"runs": [6.0, 9.0, 11.0], "spread": 5.0}}
    assert bench._flag_tight_drift(median33, timings2, prior2) == []


def _build_index(spark, tmp_path):
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq")
    meta = similarity.ivfpq_index_write(emb, path)
    return emb, path, meta


def test_persisted_index_layout_and_metadata(spark, tmp_path):
    """The persisted index is cell-partitioned parquet (n_cells
    directories) + a driver-side metadata JSON carrying everything
    serving needs (centroids, codebooks, params, format version);
    loading round-trips the metadata and the codes row count."""
    import json
    import os

    emb, path, meta = _build_index(spark, tmp_path)
    cells = sorted(
        d for d in os.listdir(os.path.join(path, "codes"))
        if d.startswith("cell=")
    )
    assert len(cells) == 16
    on_disk = json.load(open(os.path.join(path, "meta.json")))
    assert on_disk["format_version"] == 1
    assert on_disk["n_cells"] == 16 and on_disk["m"] == 16
    assert len(on_disk["centroids"]) == 16
    assert len(on_disk["codebooks"]) == 16  # m subspaces

    from tsod_spark.pipeline import similarity

    codes, meta2 = similarity.ivfpq_index_load(spark, path)
    assert meta2 == on_disk
    assert codes.count() == emb.count()
    assert set(codes.columns) >= {"vec_id", "cell", "codes", "distortion"}


def test_persisted_probe_scan_prunes_partitions(spark, tmp_path):
    """VERDICT r12 #2 done-criterion: the serving scan touches EXACTLY
    n_probe of n_cells partition directories — partition pruning is in
    the plan (PartitionFilters), not an after-the-fact filter, so at
    100 TB unprobed cells are never listed or read."""
    import re

    from tsod_spark.pipeline import similarity

    emb, path, meta = _build_index(spark, tmp_path)
    codes, meta = similarity.ivfpq_index_load(spark, path)
    q = similarity._query_vector(emb, 0, "embedding")

    from pyspark.sql import functions as F

    for n_probe in (1, 4, 6):
        scan = similarity.ivfpq_probe_scan(codes, meta, q, n_probe)
        expect = set(
            map(str, similarity._nearest_cells(q, meta["centroids"], n_probe))
        )
        # plan-level pin: the cell filter reached the scan node as a
        # PartitionFilter (file pruning), not a post-scan Filter
        plan = scan._sc._jvm.PythonSQLUtils.explainString(
            scan._jdf.queryExecution(), "formatted"
        )
        pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert pf, plan
        # n_probe=1 folds IN([c]) to an equality; both are pruning forms
        m = re.search(r"cell#\d+ IN \(([\d,]+)\)", pf.group(1)) or re.search(
            r"\(cell#\d+ = (\d+)\)", pf.group(1)
        )
        assert m, plan
        assert set(m.group(1).split(",")) == expect
        assert "(2) Filter" not in plan  # nothing survives past the scan
        # execution-level proof: the files actually opened all live in
        # the n_probe probed cell directories
        touched = {
            re.search(r"cell=(\d+)", r[0]).group(1)
            for r in scan.select(F.input_file_name()).distinct().collect()
        }
        assert touched == expect, (n_probe, touched, expect)


def test_persisted_topk_matches_in_plan(spark, tmp_path):
    """Differential: the persisted serve path returns row-for-row the
    in-plan ivfpq_topk result at identical params/seed (the stored
    codes ARE the fused build's output, so only the code location
    differs)."""
    from tsod_spark.pipeline import similarity

    emb, path, _meta = _build_index(spark, tmp_path)
    served = similarity.ivfpq_persisted_topk(
        spark, path, emb, n_probe=6
    ).collect()
    in_plan = similarity.ivfpq_topk(emb, n_probe=6).collect()
    assert [r.asDict() for r in served] == [r.asDict() for r in in_plan]
    assert len(served) == 10


def test_persisted_index_rebuild_gate(spark, tmp_path, monkeypatch):
    """The registered demo rebuilds only when the index is missing or
    the fixture CONTENT no longer matches the fingerprint recorded at
    build time (stale indexes must never serve); an untouched fixture
    never triggers a rebuild, and corrupting the recorded fingerprint
    does."""
    import json
    import os

    from tsod_spark.queries import round13

    monkeypatch.setattr(round13, "_INDEX_ROOT", str(tmp_path / "root"))
    p1 = round13.persisted_index_path(spark, SF)
    meta_path = os.path.join(p1, "meta.json")
    mt1 = os.path.getmtime(meta_path)
    p2 = round13.persisted_index_path(spark, SF)
    assert p1 == p2
    assert os.path.getmtime(meta_path) == mt1  # no rebuild
    # falsify the recorded fingerprint -> rebuild fires (the on-disk
    # index no longer certifiably matches the fixture)
    meta = json.load(open(meta_path))
    meta["source_fingerprint"] = "0" * 64
    json.dump(meta, open(meta_path, "w"))
    round13.persisted_index_path(spark, SF)
    assert (
        json.load(open(meta_path))["source_fingerprint"]
        == round13._source_fingerprint(
            os.path.join(SF, "embeddings.parquet")
        )
    )


def test_governance_flags_batch_semantics(spark):
    """Sanity of the shared flag core on a batch frame: a doc whose
    text byte-equals a corpus doc is an exact dup; flags partition the
    batch (exact / near-only / accepted)."""
    from pyspark.sql import functions as F

    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table

    docs = table(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    batch = docs.where(F.col("doc_id") % 7 == 0)
    idx = dedup.build_corpus_index(corpus).cache()
    idx.count()
    flags = dedup.governance_flags(batch, idx).collect()
    assert len(flags) == batch.count()
    assert all(
        r.accepted == (not r.is_exact_dup and not r.is_near_dup)
        for r in flags
    )
    # every exact dup is also a near dup (identical text -> identical
    # signature -> every band collides at est 1.0)
    assert all(r.is_near_dup for r in flags if r.is_exact_dup)
    # cross-check is_exact_dup against a direct md5 semi-join
    exact_ids = {
        r.doc_id
        for r in batch.alias("b")
        .join(
            corpus.alias("c"),
            F.md5(F.col("b.text")) == F.md5(F.col("c.text")),
            "left_semi",
        )
        .collect()
    }
    assert {r.doc_id for r in flags if r.is_exact_dup} == exact_ids
    # and the screen finds someone at this fixture scale
    assert any(r.is_near_dup for r in flags)
    idx.unpersist()


def test_stream_governance_rollup_matches_batch(spark, tmp_path):
    """VERDICT r12 #6 done-criterion: the streaming per-source
    governance rollup's LAST emission per source equals the batch
    rollup on the same docs field-for-field, across micro-batch
    boundaries (3 single-file triggers)."""
    from pyspark.sql import functions as F

    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table
    from tsod_spark.streaming import stream_governance_rollup

    docs = table(spark, SF, "documents")
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    batch = docs.where(F.col("doc_id") % 7 == 0)
    idx = dedup.build_corpus_index(corpus).cache()
    idx.count()

    expected = {
        r.source: r
        for r in dedup.governance_rollup(
            dedup.governance_flags(batch, idx)
        ).collect()
    }
    assert len(expected) > 1
    assert any(r.n_exact_dups + r.n_near_dups > 0 for r in expected.values())

    rows = batch.select("doc_id", "text", "source").orderBy("doc_id").collect()
    src_dir = str(tmp_path / "gov_src")
    chunk = (len(rows) + 2) // 3
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(
                part, "doc_id long, text string, source string"
            ).coalesce(1).write.parquet(f"{src_dir}/b{i}")
    src = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/b*")
    )
    q = (
        stream_governance_rollup(src, idx)
        .writeStream.format("memory")
        .queryName("t_gov")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode re-emits a source's growing totals each tick; the
    # final (max n_docs) emission per source is the cumulative rollup
    got = {}
    for r in spark.sql("SELECT * FROM t_gov").collect():
        if r.source not in got or r.n_docs > got[r.source].n_docs:
            got[r.source] = r
    idx.unpersist()
    assert set(got) == set(expected)
    for s, b in expected.items():
        g = got[s]
        assert (
            g.n_docs, g.n_exact_dups, g.n_near_dups, g.n_accepted,
            g.dup_rate,
        ) == (
            b.n_docs, b.n_exact_dups, b.n_near_dups, b.n_accepted,
            b.dup_rate,
        ), s
    spark.catalog.clearCache()


def test_stream_ivfpq_search_matches_batch(spark, tmp_path):
    """Continuous ANN serving twin: for query vectors streamed across
    3 micro-batches against the frozen persisted index, each query's
    final emission equals the batch ADC shortlist
    (_adc_topk(..., refine=0)) row-for-row — ids, rounded distances,
    and rank order."""
    from pyspark.sql import functions as F

    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table
    from tsod_spark.streaming import stream_ivfpq_search

    emb, path, _ = _build_index(spark, tmp_path)
    codes, meta = similarity.ivfpq_index_load(spark, path)
    codes = codes.cache()
    codes.count()

    query_ids = [0, 3, 7, 11, 42, 99]
    expected = {}
    for qid in query_ids:
        q = similarity._query_vector(emb, qid, "embedding")
        probe = similarity._nearest_cells(q, meta["centroids"], 4)
        cand = codes.where(F.col("cell").isin(probe)).select(
            "vec_id", "codes"
        )
        rows = similarity._adc_topk(
            cand, meta["codebooks"], q, 10, 0, emb, "embedding",
            exclude_id=-1,
        ).collect()
        expected[qid] = [(r.vec_id, r.adc_d2) for r in rows]

    qrows = (
        emb.where(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .collect()
    )
    src_dir = str(tmp_path / "q_src")
    chunk = (len(qrows) + 2) // 3
    for i in range(3):
        part = qrows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(
                part, "query_id long, embedding array<float>"
            ).coalesce(1).write.parquet(f"{src_dir}/b{i}")
    src = (
        spark.readStream.schema("query_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/b*")
    )
    q = (
        stream_ivfpq_search(src, codes, meta, k=10, n_probe=4)
        .writeStream.format("memory")
        .queryName("t_ann_serve")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got: dict = {}
    for r in spark.sql("SELECT * FROM t_ann_serve").collect():
        got.setdefault(r.query_id, {})[r.rank] = (r.vec_id, r.adc_d2)
    codes.unpersist()
    assert set(got) == set(query_ids)
    for qid in query_ids:
        ranked = [got[qid][i] for i in sorted(got[qid])]
        assert ranked == expected[qid], qid
    spark.catalog.clearCache()


def test_residual_build_lower_distortion_than_flat(spark):
    """The residual encoding's entire value claim, pinned: at
    identical (m, k) the residual build's mean quantization distortion
    is STRICTLY lower than the flat build's (residuals of a decent
    coarse quantizer are lower-energy than raw vectors — measured
    ~10% on every fixture). Also pins the shared schema contract that
    lets ivfpq_index_write persist either build."""
    from pyspark.sql import functions as F

    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings")
    flat, _, _ = similarity.ivfpq_index_build(emb)
    res, _, _ = similarity.ivfpq_residual_index_build(emb)
    assert flat.schema == res.schema
    fd = flat.agg(F.avg("distortion")).first()[0]
    rd = res.agg(F.avg("distortion")).first()[0]
    assert rd < fd, (rd, fd)
    # residual distortion strictly positive (the certificate invariant)
    assert res.agg(F.min("distortion")).first()[0] > 0.0


def test_residual_topk_refine_and_certificate(spark):
    """Serving sanity: the residual path returns k exact-refined rows
    (d2 ascending, ties by vec_id) and its registered certificate is
    recall_ok=TRUE on the fixture."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import QUERIES, table

    emb = table(spark, SF, "embeddings")
    rows = similarity.ivfpq_residual_topk(emb, n_probe=6).collect()
    assert len(rows) == 10
    d2s = [r.d2 for r in rows]
    assert d2s == sorted(d2s)
    cert = QUERIES["emb_ivfpq_residual_topk"](spark, SF).collect()
    assert len(cert) == 10 and all(r.recall_ok for r in cert)


def test_embedding_cell_block_stats_raw_values(spark, tmp_path):
    """Raw quantities behind the cell-block certificate: blocked pairs
    are a subset of exact pairs, the candidate count is exactly
    sum C(n_c,2), and both certificate booleans hold on the fixture."""
    from pyspark.sql import functions as F

    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb, path, _ = _build_index(spark, tmp_path)
    codes, _meta = similarity.ivfpq_index_load(spark, path)
    cells = codes.select("vec_id", "cell")
    row = similarity.embedding_cell_block_stats(emb, cells).first()
    assert row.n_vectors == emb.count()
    assert row.n_exact_pairs > 0
    assert row.blocked_coverage_ok and row.candidate_ratio_ok
    # candidate count identity
    sizes = [r["count"] for r in cells.groupBy("cell").count().collect()]
    cand = sum(n * (n - 1) // 2 for n in sizes)
    total = row.n_vectors * (row.n_vectors - 1) // 2
    assert 100 * cand <= 15 * total
