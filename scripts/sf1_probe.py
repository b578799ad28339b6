"""Materialized sf1 probe: a second MEASURED decade of scale.

`scale_probe.py` expands sf0.1 logically (unioned key-shifted scans).
This script goes one step further and MATERIALIZES a real sf1-scale
parquet dataset (10x row counts: lineitem 6M, orders 1.5M, events 1M,
documents 50k, embeddings 20k — the genuine TPC-H sf1 cardinalities)
under ``.scaledata/sf1/`` inside the repo, then times headline
registry queries at sf0.1 and sf1 against real parquet scans — footer
pruning, pushdown, and I/O included, which the logical expansion
cannot exercise.

Expansion model = horizontal growth: every copy shifts its keys by a
stride (10x KEY COUNT, constant per-key cardinality/structure), and
document text is word-salted per copy (``c3foo``) so the duplicate /
near-duplicate structure of the original corpus is replicated per
copy rather than turning every doc into a 10-way cross-copy clique —
the same contract `scale_probe.py` documents. Embeddings get a tiny
deterministic first-component offset per copy for the same reason.
Fixed dims (nation, region) stay 1x, as in TPC-H itself.

Usage: python scripts/sf1_probe.py [--rebuild]
Writes SCALE_sf1.json at the repo root: {"queries": {name: {"sf0.1":
sec, "sf1": sec, "ratio": r}}}. A ratio <= ~14x for 10x data on a
fixed 32-core box means no hidden quadratic / single-partition
collapse; most shapes should land well under that because sf0.1
underutilizes 32 cores.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(REPO, ".scaledata", "sf1")
MULT = 10

# per-table key strides (copy i adds i*stride; FK columns share the
# stride of the key they reference so referential integrity survives)
STRIDES: dict[str, dict[str, int]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 100_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 10_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
FIXED_DIMS = {"region", "nation"}
# files per output table: enough parallelism for a 32-core scan
# without drowning small dims in footers
N_FILES = {"lineitem": 16, "orders": 8, "events": 8, "documents": 4}

HEADLINE = [
    "ts_combined",
    "ts_hampel",
    "ts_rolling_corr",
    "ts_resample_1h",
    "ts_seasonal_anomaly",
    "events_sessions",
    "tpch_q1",
    "tpch_q9",
    "tpch_q21",
    "dedup_minhash_groups",
    "dedup_incremental",
    "doc_curation_pipeline",
    "doc_stats",
    "emb_cosine_topk",
    # r5/r6 newcomers + the CC family (r6 VERDICT item 4)
    "ts_esd",
    "ts_shesd",
    "ts_ccf",
    "doc_rag_search",
    "dq_suite",
    "dedup_canonical",
    "dedup_simhash_pairs",
    "dedup_simhash_pairs_capped",
    # r6 newcomers (r6 VERDICT item 1: the only operators with no scale
    # evidence yet — winnow explodes ~2/(window+1) of all grams, so its
    # per-decade ratio is the number a 100 TB user needs) + r7's
    # truncation-observability aggregate
    "doc_winnow_fingerprints",
    "dedup_winnow_overlap",
    "emb_diverse_sample",
    "events_salted_join",
    "dedup_minhash_pairs_capped",
    "dedup_cap_drop_stats",
    "doc_winnow_screen",
    # late-r7 operators: sketch paths + changepoint localization
    "events_kll_quantiles",
    "events_hll_overlap",
    "ts_changepoint",
    "ts_changepoint_binseg",
    # round-7 closers: frequent-pattern + theta set algebra + rank
    # stats (heavy hitters re-scans the exploded bigrams twice by
    # design — the decade ratio shows what the two-pass costs)
    "doc_bigram_heavy_hitters",
    "events_theta_sets",
    "events_assoc_rules",
    "ts_spearman",
    "ts_runs_test",
    "events_ks_drift",
    "events_mannwhitney",
    "ts_theil_sen",
    "orders_rfm",
    "parts_abc",
    "customer_gini_by_nation",
    "events_benford",
    # round-7 closers, second wave: backtest/LTV + the per-series
    # moment screens (2-shuffle series-bounded frames — ratios should
    # track the scan) + the duration-grid KM and salted top-k Hill
    "ts_backtest_snaive",
    "orders_cohort_ltv",
    "ts_hour_anova",
    "events_markov",
    "ts_ols_fit",
    "events_interarrival",
    "ts_haar_energy",
    "events_dispersion",
    "events_type_entropy",
    "orders_km_survival",
    "orders_hill_tail",
    "ts_ar1",
    "parts_skyline",
    "doc_zipf_fit",
    "events_welch_ttest",
    "events_type_corr",
    "ts_record_stats",
    "doc_lexical_diversity",
    "dedup_threshold_curve",
    "orders_in_flight",
    "dedup_cross_source_matrix",
    "orders_contingency",
    "ts_holt_winters",
    "ts_hw_anomaly",
    "ts_peaks",
    "emb_label_silhouette",
    "orders_km_segment_summary",
    # round-8: prefix-filtered exact Jaccard (the decade ratio shows
    # whether the prefix join volume tracks near-dup mass, not corpus
    # size), its CC completion, the DB validity index, KM quartiles
    "dedup_ppjoin_pairs",
    "dedup_ppjoin_groups",
    "emb_label_davies_bouldin",
    "orders_km_quartiles",
    "dedup_containment_pairs",
    "ts_permutation_entropy",
    "ts_sax_motifs",
    "orders_nelson_aalen",
    "ts_conformal_snaive",
    "events_attribution_credit",
    "ts_periodogram",
    "supplier_ship_latency",
    # round-9: PPJoin observability/bigram/incremental tiers, the
    # per-segment KM quartiles, and the two curation curves
    "dedup_ppjoin_prefix_stats",
    "dedup_ppjoin_bigram_pairs",
    "dedup_ppjoin_incremental",
    "orders_km_quartiles_by_segment",
    "doc_pack_mixture_stats",
    "doc_quality_budget_curve",
    "ts_conformal_curve",
    "orders_nelson_aalen_by_segment",
    "orders_km_logrank",
    "events_psi_drift",
    # round-10: the incremental containment screen (corpus-index join
    # volume must track batch-gram corpus frequency, not corpus size),
    # the IVF tuning curve (5 probes over one cached cell-tagged
    # frame), per-segment conformal, the packing accountants, and the
    # exact W1 drift (domain-bounded ECDF frame)
    "dedup_containment_incremental",
    "emb_ivf_recall_curve",
    "ts_conformal_by_segment",
    "doc_pack_loss_mask",
    "doc_pack_bucketed_stats",
    "events_wasserstein_drift",
    "dedup_lsh_tuning_curve",
    "doc_contamination_by_split",
    # round-11: the PQ m-curve (nested-codebook fits at 4 m values),
    # sampled threshold twin (the knob-read's 100 TB variant — its
    # decade ratio vs the exact curve IS the value claim), by-segment
    # drift pair, the exact cross-source matrix (closed-form counts,
    # one hash shuffle) and directional containment (pair-bounded)
    "emb_pq_distortion_curve",
    "dedup_threshold_curve_sampled",
    "events_ks_drift_by_segment",
    "events_wasserstein_drift_by_segment",
    "dedup_exact_cross_source",
    "dedup_source_containment",
    "dedup_canonicalization_curve",
    # r13: persisted-index ANN serving (the warm absorber pays the
    # one-time build; timed runs measure the pruned serve path) and
    # the per-source governance increments
    "emb_ivfpq_persisted_topk",
    "emb_ivfpq_persisted_recall_curve",
    "dedup_governance_increments",
    # r13 second wave: residual-encoded IVF+PQ (KMeans-fit +
    # one-pass encode, like the flat build certificate)
    "emb_ivfpq_residual_topk",
    # r14: the cell-block certificate (exact regime at sf1, the
    # seeded SAMPLED regime at sf10 — 200k vectors crosses the 100k
    # exact boundary, so the sf10 row prices the regime the 100 TB
    # deployment actually runs), persisted residual serving,
    # multi-probe blocking, and image dHash near-dup dedup
    "dedup_embedding_cell_block_stats",
    "emb_ivfpq_residual_persisted_topk",
    "dedup_embedding_multiprobe_stats",
    "mm_phash_near_dups",
    # r14 second wave: the index-maintenance lifecycle (the warm
    # absorber pays the one-time build+append+delete; timed runs
    # price the tomb-filtered pruned serve)
    "emb_ivfpq_upsert_topk",
    "emb_ivfpq_upsert_stats",
    "mm_audio_near_dups",
    "mm_video_near_dups",
    "doc_hybrid_rrf_search",
    "emb_ivfpq_compact_stats",
    # r15: decade rows for the r14 events_profile rewrite (per-column
    # two-level agg replaced the 4-way Expand count_distinct — the §2
    # claim needs a scale row) and the newly spread doc tokenize legs
    "events_profile",
    "doc_tfidf_topk",
    "doc_decontaminate",
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    from tsod_spark.registry import table

    os.makedirs(os.path.dirname(DST), exist_ok=True)
    tmp = DST + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    for name, strides in STRIDES.items():
        base = table(spark, SRC, name)
        if name in FIXED_DIMS:
            out = base
        else:
            parts = []
            for i in range(MULT):
                df = base
                for col, stride in strides.items():
                    df = df.withColumn(col, F.col(col) + F.lit(i * stride))
                if name == "documents" and i > 0:
                    # word-salt copy i: unique shingles per copy, so the
                    # corpus' dup structure replicates instead of every
                    # doc becoming a 10-way cross-copy near-dup clique
                    df = df.withColumn(
                        "text", F.regexp_replace("text", r"(\S+)", f"c{i}$1")
                    ).withColumn("n_chars", F.length("text"))
                if name == "embeddings" and i > 0:
                    df = df.withColumn(
                        "embedding",
                        F.concat(
                            F.array(
                                (F.element_at("embedding", 1) + i * 0.017).cast(
                                    "float"
                                )
                            ),
                            F.slice("embedding", 2, 1_000_000),
                        ),
                    )
                parts.append(df)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        nf = N_FILES.get(name, 2)
        out.repartition(nf).write.mode("overwrite").parquet(
            os.path.join(tmp, f"{name}.parquet")
        )
    shutil.rmtree(DST, ignore_errors=True)
    os.rename(tmp, DST)


def main() -> None:
    rebuild = "--rebuild" in sys.argv
    # optional query-name args: probe only those HEADLINE entries and
    # MERGE into the existing SCALE_sf1.json (newcomer top-up without
    # re-timing the whole list)
    only = {a for a in sys.argv[1:] if not a.startswith("--")}

    from pyspark.sql import SparkSession

    # Parallelism/memory derive from the box (overridable like bench.py)
    # so SCALE_sf1.json is reproducible on machines smaller than the
    # 32-core reference box.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sf1-probe")
        .config("spark.sql.shuffle.partitions", str(2 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # 165 codegen-heavy plans overflow the JVM's default 240m JIT
        # code cache mid-session; once it fills, compilation stops and
        # CPU-bound generated code (md5 dedup pipelines) runs
        # interpreted 3-7x slower -- the root cause of the CC-family
        # run-to-run variance (measured: pairs phase 3s->10s across
        # trials, steady 1.6s with this flag).
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing")
        .config("spark.driver.memory", driver_mem)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if rebuild or not os.path.isdir(DST):
        t0 = time.time()
        build(spark)
        print(f"materialized sf1 under {DST} in {time.time() - t0:.1f}s", flush=True)

    import gc

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    # warmup (same rationale as bench.py, abbreviated)
    from pyspark.sql import functions as F

    from tsod_spark.registry import table

    for t in STRIDES:
        table(spark, DST, t).limit(1).write.format("noop").mode("overwrite").save()
    table(spark, SRC, "documents").limit(32).select("doc_id").mapInPandas(
        lambda it: it, "doc_id long"
    ).write.format("noop").mode("overwrite").save()
    from tsod_spark.pipeline import dedup as _dedup

    _dedup.minhash_duplicate_groups(
        table(spark, SRC, "documents").limit(64)
    ).write.format("noop").mode("overwrite").save()

    # Median-of-3 per (query, scale): single samples of the CC/dedup
    # family vary 2-7x run-to-run inside a long session (GC/scheduler
    # jitter — same reason bench.py runs that family median-of-3), and
    # a probe that exists to measure SCALING cannot ride on one noisy
    # sample per decade.
    def run3(fn, sf_dir) -> tuple[float, float]:
        # Converged-warm absorbers + steady-state median-of-3 (shared
        # bench.py discipline; see sf10_probe.run3): the C2 recompile
        # race can span more runs than a fixed triple absorbs.
        def once() -> float:
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            spark.catalog.clearCache()
            gc.collect()
            return el

        from bench import steady_median3

        med, spr, _runs = steady_median3(once)
        return med, spr

    results: dict[str, dict[str, float | None]] = {}
    out_path = os.path.join(REPO, "SCALE_sf1.json")
    if only and os.path.exists(out_path):
        with open(out_path) as fh:
            results.update(json.load(fh).get("queries", {}))
    for name in HEADLINE:
        if only and name not in only:
            continue
        fn = qmap[name]
        t: dict[str, float] = {}
        spread: dict[str, float] = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
            t[label], spread[label] = run3(fn, sf_dir)
        ratio = round(t["sf1"] / t["sf0.1"], 2) if t["sf0.1"] > 0 else None
        results[name] = {**t, "ratio": ratio, "spread": spread}
        print(
            f"{name}: sf0.1={t['sf0.1']}s sf1={t['sf1']}s ratio={ratio} "
            f"spread={spread}",
            flush=True,
        )

    payload = json.dumps({"multiplier": MULT, "queries": results}, indent=1)
    with open(out_path, "w") as fh:
        fh.write(payload + "\n")
    print(payload)
    spark.stop()


if __name__ == "__main__":
    main()
