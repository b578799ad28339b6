"""Round-14 OPTIMIZATION equivalence pins: every plan-shape change in
the optimization round must leave results bit-identical, and each
rewrite gets a focused differential test against the shape it
replaced."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_fused_multiprobe_blocked_counts_equal_per_probe_joins(spark):
    """The fused min-over-cells-of-max-rank blocked count (one
    join+aggregate for all probe widths) equals the per-p
    join+distinct+count subtrees it replaced: a pair is blocked at
    width p iff some shared cell has rk_a <= p AND rk_b <= p, i.e.
    iff min_cell max(rk_a, rk_b) <= p."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings")
    _assigned, cents, _books = similarity.ivfpq_index_build(emb)
    got = {
        r["n_probe"]: r["n_blocked_pairs"]
        for r in similarity.embedding_multiprobe_stats(
            emb, cents, probes=(1, 2), min_cosine=0.3
        ).collect()
    }

    # the pre-fusion shape, inline: per-p tag restriction + distinct
    tags = similarity.embedding_multiprobe_tags(emb, cents, 2)
    pairs = similarity._exact_cosine_pairs(emb, 0.3, "embedding", 10_000)
    for p in (1, 2):
        tp_a = tags.where(F.col("rk") <= p).select(
            F.col("vec_id").alias("__va"), "cell"
        )
        tp_b = tags.where(F.col("rk") <= p).select(
            F.col("vec_id").alias("__vb"), "cell"
        )
        want = (
            pairs.join(tp_a, "__va")
            .join(tp_b, ["__vb", "cell"])
            .select("__va", "__vb")
            .distinct()
            .count()
        )
        assert got[p] == want, f"probe {p}: fused {got[p]} != join {want}"


def test_hoisted_query_norm_is_bit_identical(spark):
    """cosine_topk's hoisted ||q|| (computed once on the broadcast
    side) must give bit-identical cos_sim to the inline
    dot/(norm(a)*norm(q)) form it replaced — same sqrt(dot(q,q))
    double in the same product position."""
    from tsod_spark.pipeline.similarity import cosine, cosine_topk
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings")
    got = cosine_topk(emb, query_vec_id=0, k=25).orderBy("vec_id")

    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__q")
    )
    want = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("__q")), 6).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(25)
        .orderBy("vec_id")
    )
    g = [(r["vec_id"], r["cos_sim"]) for r in got.collect()]
    w = [(r["vec_id"], r["cos_sim"]) for r in want.collect()]
    assert g == w


def test_spread_generators_results_partition_independent(spark):
    """The mm generators' core-spread repartition must not change any
    fingerprint: per-id seeded generation is partition-independent,
    so the dhash set equals a single-partition (coalesce(1)) run."""
    from tsod_spark.pipeline import multimodal
    from tsod_spark.registry import table

    ids = table(spark, SF, "documents").select("doc_id").limit(40)
    spread = multimodal.image_dhash(
        multimodal.synthetic_textured_assets(ids)
    )
    narrow = multimodal.image_dhash(
        multimodal.synthetic_textured_assets(ids.coalesce(1)).coalesce(1)
    )
    assert sorted(
        (r["asset_id"], r["dhash"]) for r in spread.collect()
    ) == sorted((r["asset_id"], r["dhash"]) for r in narrow.collect())


def _curve_rows(df):
    return [tuple(r) for r in df.collect()]


def test_fused_ivf_recall_curve_equals_per_probe_shape(spark):
    """The single-cosine-pass fused curve (score once with the cell's
    probe rank attached; fused counts; per-width window top-k; exact
    ground truth = global top-k of the same scored frame) equals the
    per-probe count+topk+join subtrees it replaced, row for row."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings")
    k, n_cells, probes = 10, 16, (1, 2, 4, 8, 16)
    got = _curve_rows(similarity.ivf_recall_curve(emb, 0, k, n_cells, probes))

    # pre-fusion shape, inline
    assigned, centroids = similarity.ivf_index(emb, n_cells, 42, "embedding")
    assigned = assigned.select(
        "vec_id", "cell", F.col("embedding").alias("__v")
    )
    query = similarity._query_vector(emb, 0, "embedding")
    qlit = F.array(*[F.lit(x) for x in query])
    ranked = similarity._nearest_cells(query, centroids, n_cells)
    exact_ids = (
        similarity.cosine_topk(emb, 0, k, "embedding").select("vec_id")
    )
    want = []
    for np_ in probes:
        cand = assigned.where(F.col("cell").isin(ranked[:np_])).where(
            F.col("vec_id") != 0
        )
        scanned = cand.count()
        topk = (
            cand.select(
                "vec_id",
                F.round(
                    similarity.cosine(F.col("__v"), qlit), 6
                ).alias("__cs"),
            )
            .orderBy(F.desc("__cs"), "vec_id")
            .limit(k)
        )
        n_hits = topk.join(exact_ids, "vec_id").count()
        want.append(
            (np_, min(np_, n_cells), scanned, n_hits, round(n_hits / k, 6))
        )
    assert got == want


def test_fused_persisted_recall_curve_equals_per_probe_shape(spark, tmp_path):
    """The one-scan fused persisted curve (probe-independent flat-PQ
    ADC scored once; per-width window shortlists; ONE fused refine
    join) equals the per-probe pruned-scan + _adc_topk + hits-join
    subtrees it replaced, row for row."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table

    emb = table(spark, SF, "embeddings")
    path = str(tmp_path / "ivfpq")
    similarity.ivfpq_index_write(emb, path)
    k, refine, probes = 10, 4, (1, 2, 4, 8, 16)
    got = _curve_rows(
        similarity.ivfpq_persisted_recall_curve(
            spark, path, emb, 0, k, probes, refine
        )
    )

    codes, meta = similarity.ivfpq_index_load(spark, path)
    books = meta["codebooks"]
    q = similarity._query_vector(emb, 0, "embedding")
    ranked = similarity._nearest_cells(q, meta["centroids"], meta["n_cells"])
    exact_ids = similarity.cosine_topk(emb, 0, k, "embedding").select(
        "vec_id"
    )
    want = []
    for np_ in probes:
        cand = codes.where(F.col("cell").isin(ranked[:np_])).where(
            F.col("vec_id") != 0
        )
        scanned = cand.count()
        topk = similarity._adc_topk(
            cand.select("vec_id", "codes"), books, q, k, refine,
            emb, "embedding", 0,
        )
        n_hits = topk.join(exact_ids, "vec_id").count()
        want.append(
            (
                np_,
                min(np_, meta["n_cells"]),
                scanned,
                n_hits,
                round(n_hits / k, 6),
            )
        )
    assert got == want


def test_profile_table_branch_shape_equals_multi_distinct_agg(spark):
    """The per-column two-level-aggregation profile (no Expand, no
    wide SortAggregate) equals the single multi-count_distinct
    aggregate it replaced, including row order and string renderings."""
    from tsod_spark.analytics import olap
    from tsod_spark.registry import table

    e = table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    got = [tuple(r) for r in olap.profile_table(e).collect()]

    columns = e.columns
    aggs = []
    for c in columns:
        col = F.col(c)
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(col.isNull().cast("int")).cast("long").alias(f"__nn_{c}"),
            F.count_distinct(col).alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
    wide = e.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"__n_{c}").alias("n_rows"),
            F.col(f"__nn_{c}").alias("n_null"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in columns
    ]
    want = [
        tuple(r)
        for r in wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .collect()
    ]
    assert got == want


def test_fused_lsh_curve_equals_per_config_joins(spark):
    """The one-self-join fused LSH curve (b = k pair superset, per-pair
    md5 band-key candidacy, one conditional-sum aggregate) equals the
    per-config band self-join + distinct aggregates it replaced."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table

    docs = table(spark, SF, "documents")
    k, cfgs, pct = 8, (1, 2, 4, 8), 50
    got = _curve_rows(dedup.lsh_tuning_curve(docs, "text", k, cfgs, pct))

    sigs = dedup.minhash_signatures(docs, "text", k, 3)
    per = {}
    for b in cfgs:
        bf = dedup._band_frame(sigs, k, b)
        a, c = bf.alias("a"), bf.alias("b")
        matches = sum(
            F.when(
                F.substring(F.col("a.sig"), i * 8 + 1, 8)
                == F.substring(F.col("b.sig"), i * 8 + 1, 8),
                1,
            ).otherwise(0)
            for i in range(k)
        )
        cand = (
            a.join(
                c,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                matches.alias("__m"),
            )
            .distinct()
        )
        hits = cand.where(
            F.lit(100) * F.col("__m") >= F.lit(pct * k)
        ).count()
        per[b] = (cand.count(), hits)
    truth = per[k][1]
    want = [
        (
            b,
            k // b,
            per[b][0],
            truth,
            per[b][1],
            round(per[b][1] / truth, 6) if truth > 0 else None,
        )
        for b in cfgs
    ]
    assert got == want


def test_t1_closed_form_per_series_equals_numpy_kernel(spark):
    """The T=1 per-series JVM closed-form fit (one windowed-aggregate
    pass, no Python) must flag exactly the rows the numpy
    applyInPandas 2x2 solve it replaced flags — the boolean output
    absorbs the solver's last-ulp association differences."""
    from tsod_spark.detectors.mllib import RegressionResidualDetector
    from tsod_spark.queries._base import events_tsf

    tsf = events_tsf(spark, SF)
    fast = RegressionResidualDetector(
        time_steps=1, n_sigmas=4.0, per_series=True
    ).fit(tsf)
    assert fast._params_df is not None and fast._model is None
    slow = RegressionResidualDetector(
        time_steps=1, n_sigmas=4.0, per_series=True
    )
    slow._fit_per_series(tsf)  # the numpy kernel path, forced
    got = {
        r["event_id"]: r["is_anomaly"]
        for r in fast.detect(tsf).select("event_id", "is_anomaly").collect()
    }
    want = {
        r["event_id"]: r["is_anomaly"]
        for r in slow.detect(tsf).select("event_id", "is_anomaly").collect()
    }
    assert got == want and len(got) > 0


def test_t1_closed_form_global_equals_mllib_fit(spark):
    """The T=1 global OLS closed form (two aggregate actions) must
    flag exactly the rows the MLlib solver="normal" fit it replaced
    flags, and its coefficients must match MLlib's to float
    association tolerance."""
    from pyspark.ml.regression import LinearRegression

    from tsod_spark.detectors.mllib import (
        RegressionResidualDetector,
        _lag_matrix,
    )
    from tsod_spark.queries._base import events_tsf

    tsf = events_tsf(spark, SF)
    fast = RegressionResidualDetector(
        time_steps=1, n_sigmas=4.0, reg=0.0
    ).fit(tsf)
    assert fast._closed_form is not None and fast._model is None
    train = _lag_matrix(tsf, 1)
    m = LinearRegression(
        featuresCol="features_vec", labelCol="y", regParam=0.0,
        solver="normal",
    ).fit(train)
    coef, icpt = fast._closed_form
    assert abs(coef - float(m.coefficients[0])) <= 1e-9 * max(
        1.0, abs(coef)
    )
    assert abs(icpt - float(m.intercept)) <= 1e-9 * max(1.0, abs(icpt))

    slow = RegressionResidualDetector(time_steps=1, n_sigmas=4.0, reg=0.0)
    slow._model = m
    pred = m.transform(train)
    slow._resid_std = pred.select(
        F.stddev_samp(F.col("y") - F.col("prediction")).alias("s")
    ).first()["s"]
    got = {
        r["event_id"]: r["is_anomaly"]
        for r in fast.detect(tsf).select("event_id", "is_anomaly").collect()
    }
    want = {
        r["event_id"]: r["is_anomaly"]
        for r in slow.detect(tsf).select("event_id", "is_anomaly").collect()
    }
    assert got == want and len(got) > 0


def test_outer_explode_gram_frames_equal_inner_and_skip_inferred_filter(spark):
    """The explode_outer rewrite of the inverted-index gram frames
    (jaccard_pairs_index / containment_pairs / containment_index +
    screen) must (a) return row-identical results to the inner-explode
    shape it replaced — the only extra rows are (doc, NULL gh) and the
    equi-join drops them — and (b) keep the whole tokenize->shingle->
    xxhash chain OUT of Filter conditions (InferFiltersFromGenerate
    copied it into an inferred scan filter below the repartition
    exchange: the guide §4.4 duplicated-expression pathology)."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.pipeline.text import tokens, shingles
    from tsod_spark.registry import table
    from tsod_spark.util import default_parallelism

    docs = table(spark, SF, "documents")

    # (a) row equality vs the inner-explode formulation, inline
    got = dedup.jaccard_pairs_index(docs).orderBy("doc_a", "doc_b")
    n_part = default_parallelism(spark)
    tok = docs.repartition(n_part, F.col("doc_id")).select(
        "doc_id", F.col("source").alias("blk"),
        tokens(F.col("text")).alias("__t"),
    )
    g = tok.select(
        "doc_id", "blk",
        F.transform(
            shingles(F.col("__t"), 2), lambda x: F.xxhash64(x)
        ).alias("__gh"),
    ).select(
        "doc_id", "blk",
        F.size("__gh").cast("long").alias("__ng"),
        F.explode("__gh").alias("gh"),
    )
    a = g.select("blk", "gh", F.col("doc_id").alias("doc_a"),
                 F.col("__ng").alias("__na"))
    b = g.select("blk", "gh", F.col("doc_id").alias("doc_b"),
                 F.col("__ng").alias("__nb"))
    p = (
        a.join(b, ["blk", "gh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__inter"),
            F.first("__na").alias("__na"),
            F.first("__nb").alias("__nb"),
        )
    )
    jac = F.round(
        F.col("__inter").cast("double")
        / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double"),
        6,
    )
    want = p.select("doc_a", "doc_b", jac.alias("jaccard")).orderBy(
        "doc_a", "doc_b"
    )
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]

    # (b) the pathology pin: no Filter condition re-inlines the chain
    for df in (
        dedup.jaccard_pairs_index(docs),
        dedup.containment_pairs(docs),
        dedup.containment_screen_new_docs(
            docs.where(F.col("doc_id") % 7 != 0),
            docs.where(F.col("doc_id") % 7 == 0),
            thr_pct=90,
        ),
    ):
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        import re

        for m in re.finditer(r"\(\d+\) Filter\b.*?(?=\(\d+\) )", txt, re.S):
            assert "transform(" not in m.group(0), m.group(0)[:200]

    # (c) the index artifact keeps its no-null contract
    idx = dedup.containment_index(docs)
    assert idx.where(F.col("gh").isNull()).count() == 0
