"""Materialized sf10 probe: a THIRD measured decade of scale.

`scale_probe.py` expands sf0.1 logically; `sf1_probe.py` materializes
a real 10x dataset. This script adds one more decade — it expands the
materialized sf1 dataset (``.scaledata/sf1``) by another 10x into
``.scaledata/sf10`` (TPC-H sf10 cardinalities: lineitem 60M, orders
15M, events 10M, documents 500k, embeddings 200k) under the SAME
horizontal-growth contract (key strides x10, per-copy word salt
``d{j}`` layered over sf1's ``c{i}`` so the duplicate structure
replicates instead of cross-copy cliques, per-copy embedding offset),
then times a headline subset at sf1 AND sf10.

Two consecutive measured decades per query (SCALE_sf1.json's
sf0.1->sf1 plus this file's sf1->sf10) show the growth CURVE, which a
single decade cannot: a hidden super-linear term that hides inside
fixed costs at sf1 must surface by sf10.

Usage: python scripts/sf10_probe.py [--rebuild] [query ...]
Writes SCALE_sf10.json: {"multiplier": 10, "queries": {name:
{"sf1": sec, "sf10": sec, "ratio": r, "spread": {...}}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sf1_probe import FIXED_DIMS, STRIDES  # noqa: E402

SRC = os.path.join(REPO, ".scaledata", "sf1")
DST = os.path.join(REPO, ".scaledata", "sf10")
MULT = 10
# sf1 strides already offset copies by i*stride with key counts ~10x
# the sf0.1 originals; the sf10 layer must stride past ALL sf1 keys
STRIDE_MULT = 10
N_FILES = {"lineitem": 64, "orders": 32, "events": 32, "documents": 16}

# the scale-critical subset: scan+agg, the biggest join, windowed
# sessionization, CC dedup, prefix-filtered exact dedup, the fused
# curation pipeline, the incremental screens, a drift monitor, and the
# two tuning curves
HEADLINE10 = [
    "tpch_q1",
    "tpch_q9",
    "events_sessions",
    "ts_resample_1h",
    "doc_token_counts",
    "doc_quality",
    "dedup_minhash_groups",
    "dedup_ppjoin_pairs",
    "dedup_containment_incremental",
    "doc_curation_pipeline",
    "events_psi_drift",
    "events_wasserstein_drift",
    "dedup_lsh_tuning_curve",
    "emb_cosine_topk",
    "doc_pack_loss_mask",
    # top-up: survival (duration-grid bounded), conformal
    # (bucket-bounded), the IVF curve (KMeans fit at 200k vectors),
    # packing comparison, simhash CC, winnow spans
    "orders_km_logrank",
    "ts_conformal_snaive",
    "emb_ivf_recall_curve",
    "doc_pack_bucketed_stats",
    "dedup_simhash_groups",
    "doc_winnow_screen",
    "dedup_ppjoin_incremental",
    "dedup_threshold_curve",
    "events_ks_drift",
    # r11: the sampled twin's value claim lives at THIS decade — at
    # sf1 the full-corpus gram shuffle dominates and sampled == exact
    # (14.6 vs 14.5s); at sf10 the exact curve is pair-hit-dominated
    # (51.2M pairs), which is what the 1/4 sample actually cuts
    "dedup_threshold_curve_sampled",
    # r11 second wave: content-hash shuffle (scan-shaped), the
    # minhash-pair-bound directional containment, and the segment-
    # keyed PSI (|segments| x |types| x 10 bounded past the counts)
    "dedup_exact_cross_source",
    "dedup_source_containment",
    "events_psi_drift_by_segment",
    "dedup_canonicalization_curve",
    "events_ks_drift_by_segment",
    "events_wasserstein_drift_by_segment",
    # r12: the fused governance rollup (one text scan; pair join shared
    # by the CC and containment branches) and the fused ANN build
    # certificate (KMeans-fit-dominated; the encode pass is join-free)
    "dedup_governance_pipeline",
    "emb_ivfpq_build_stats",
    # r13: the persisted-index serving family (build absorbed by the
    # warm absorber; the timed runs measure the production serve path
    # — pruned code scans + refine, no retrain/re-encode) and the
    # governance increments (index-join ingest screen + one rollup)
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
    # r14 second wave: the index-maintenance lifecycle (warm absorber
    # pays build+append+delete; timed runs price the tomb-filtered
    # pruned serve)
    "emb_ivfpq_upsert_topk",
    "emb_ivfpq_upsert_stats",
    "mm_audio_near_dups",
    "mm_video_near_dups",
    "doc_hybrid_rrf_search",
    "emb_ivfpq_compact_stats",
    # r15: third-decade row for the r14 events_profile rewrite
    "events_profile",
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
                    df = df.withColumn(
                        col, F.col(col) + F.lit(i * stride * STRIDE_MULT)
                    )
                if name == "documents" and i > 0:
                    df = df.withColumn(
                        "text", F.regexp_replace("text", r"(\S+)", f"d{i}$1")
                    ).withColumn("n_chars", F.length("text"))
                if name == "embeddings" and i > 0:
                    df = df.withColumn(
                        "embedding",
                        F.concat(
                            F.array(
                                (
                                    F.element_at("embedding", 1) + i * 0.0019
                                ).cast("float")
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
    only = {a for a in sys.argv[1:] if not a.startswith("--")}

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sf10-probe")
        .config("spark.sql.shuffle.partitions", str(4 * int(cpus)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.driver.memory", driver_mem)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.isdir(SRC):
        raise SystemExit("run scripts/sf1_probe.py first (needs .scaledata/sf1)")
    if rebuild or not os.path.isdir(DST):
        t0 = time.time()
        build(spark)
        print(
            f"materialized sf10 under {DST} in {time.time() - t0:.1f}s",
            flush=True,
        )

    import gc

    import __spark_entry__ as entrymod
    from tsod_spark.registry import table

    qmap = entrymod.queries()
    for t in STRIDES:
        table(spark, DST, t).limit(1).write.format("noop").mode(
            "overwrite"
        ).save()
    table(spark, SRC, "documents").limit(32).select("doc_id").mapInPandas(
        lambda it: it, "doc_id long"
    ).write.format("noop").mode("overwrite").save()
    from tsod_spark.pipeline import dedup as _dedup

    _dedup.minhash_duplicate_groups(
        table(spark, SRC, "documents").limit(64)
    ).write.format("noop").mode("overwrite").save()

    def run3(fn, sf_dir):
        # Converged-warm absorbers + steady-state median-of-3 (shared
        # bench.py discipline): the C2 recompile race can span more
        # runs than a fixed triple absorbs on the heaviest queries
        # (measured r12: dedup_threshold_curve 31-34% spreads under the
        # fixed protocol), so keep timing until the last 3 consecutive
        # runs meet the <=20%-of-median hygiene bar (max 9); all runs
        # land in the JSON.
        def once():
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            spark.catalog.clearCache()
            gc.collect()
            return el

        from bench import steady_median3

        return steady_median3(once)

    results: dict = {}
    out_path = os.path.join(REPO, "SCALE_sf10.json")
    if only and os.path.exists(out_path):
        with open(out_path) as fh:
            results.update(json.load(fh).get("queries", {}))
    for name in HEADLINE10:
        if only and name not in only:
            continue
        fn = qmap[name]
        t: dict = {}
        spread: dict = {}
        all_runs: dict = {}
        for label, sf_dir in (("sf1", SRC), ("sf10", DST)):
            med, spr, runs = run3(fn, sf_dir)
            t[label], spread[label], all_runs[label] = med, spr, runs
        ratio = round(t["sf10"] / t["sf1"], 2) if t["sf1"] else None
        results[name] = {
            **t,
            "ratio": ratio,
            "spread": spread,
            "runs": all_runs,
        }
        print(f"{name}: sf1 {t['sf1']}s sf10 {t['sf10']}s ratio {ratio}", flush=True)
    payload = json.dumps({"multiplier": MULT, "queries": results}, indent=1)
    with open(out_path, "w") as fh:
        fh.write(payload + "\n")
    print(payload)


if __name__ == "__main__":
    main()
