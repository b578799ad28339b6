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
