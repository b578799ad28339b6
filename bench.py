"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Queries execute to a noop sink (full plan runs JVM-side, nothing is
collected to the driver) — the honest analogue of writing results out
on a cluster.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("tsod_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
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
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    # Cold-start honesty number: one designated query timed as the very
    # first action of the session — before any warmup — so the record
    # shows what a cold driver actually pays (JVM init + first codegen +
    # parquet footer reads), alongside the steady-state totals below.
    cold_name = os.environ.get("SPARK_GRAFT_COLD_QUERY", "tpch_q1")
    cold_first_query_s = None
    cold_fn = entrymod.queries().get(cold_name)
    if cold_fn is not None:
        t0 = time.time()
        cold_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold_first_query_s = round(time.time() - t0, 3)
        spark.catalog.clearCache()

    # Untimed warmup: JVM/codegen/scan-footer initialization otherwise
    # lands entirely on whichever query runs first (~3s on a trivial
    # projection, ~5s extra for the first shuffle/join/window/explode
    # plan compiled). One tiny action per table plus one composite
    # shuffle-shaped job gives steady-state per-query numbers without
    # touching what is measured.
    from pyspark.sql import functions as F

    from tsod_spark.registry import table

    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        table(spark, sf_dir, t).limit(1).write.format("noop").mode("overwrite").save()
    warm = (
        table(spark, sf_dir, "documents")
        .limit(64)
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    warm.join(warm.select(F.col("w").alias("w2"), "c"), F.col("w") == F.col("w2")).write.format(
        "noop"
    ).mode("overwrite").save()
    from pyspark.sql import Window as _W

    table(spark, sf_dir, "events").limit(256).select(
        F.sum("value").over(_W.partitionBy("user_id").orderBy("ts")).alias("s")
    ).write.format("noop").mode("overwrite").save()
    # python-worker + Arrow-serde warmup: the first mapInPandas stage
    # otherwise pays worker fork + Arrow init (~2s) inside whichever
    # python-path query happens to run first
    table(spark, sf_dir, "documents").limit(32).select("doc_id").mapInPandas(
        lambda it: it, "doc_id long"
    ).write.format("noop").mode("overwrite").save()
    # CC-loop warmup: the label-propagation family compiles many small
    # per-iteration plans; the first CC query in rotation order
    # otherwise absorbs ~8s of codegen that isn't its own cost
    from tsod_spark.pipeline import dedup as _dedup

    _dedup.minhash_duplicate_groups(
        table(spark, sf_dir, "documents").limit(64)
    ).write.format("noop").mode("overwrite").save()
    # MLlib warmup: estimator classloading + netlib BLAS/LAPACK probe +
    # KMeans/WLS codegen otherwise land on the first MLlib query in
    # rotation order (~15s measured on ts_mllib_kmeans at sf0.1)
    from pyspark.ml.clustering import KMeans as _KM
    from pyspark.ml.functions import array_to_vector as _a2v
    from pyspark.ml.regression import LinearRegression as _LR

    _w = (
        table(spark, sf_dir, "embeddings")
        .limit(64)
        .select(
            _a2v(F.col("embedding").cast("array<double>")).alias("features"),
            F.lit(1.0).alias("y"),
        )
    )
    _KM(k=2, seed=1, maxIter=1, featuresCol="features").fit(_w)
    _LR(featuresCol="features", labelCol="y", solver="normal").fit(_w)
    spark.catalog.clearCache()

    import gc

    # Full compile pass at sf0.001 (JMH-style warmup iteration): every
    # registered plan executes once on the tiny fixture so Janino
    # compile + HotSpot JIT of each query's generated classes happen
    # OUTSIDE the timed loop. Without this, whichever queries lead the
    # rotation window absorb multi-second first-execution costs that
    # are not their own (measured: doc_vocab_overlap 11.8s as bench
    # query #1 vs 3.6s steady-state on the same box). The timed loop
    # below still reads sf0.1 cold — only code, not data, is warm,
    # matching the compile-once-run-daily shape of a production job.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    warmup_skipped: list[str] = []
    if os.path.isdir(warm_dir):
        for _name, _fn in entrymod.queries().items():
            try:
                _fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            except Exception:
                # A fixture-shape miss must not sink the bench, but a
                # silently-skipped warmup puts that query's Janino/JIT
                # first-execution cost back into its timed measurement —
                # record it so partial warm coverage is visible.
                warmup_skipped.append(_name)
            spark.catalog.clearCache()
        gc.collect()
        if warmup_skipped:
            print(f"warmup skipped: {warmup_skipped}", file=sys.stderr)

    # The CC/label-propagation dedup family shows 2-4x run-to-run
    # variance even on an idle box (many small iterative jobs +
    # localCheckpoint I/O make them scheduler/GC sensitive), so a
    # single sample is not a comparable record. These run median-of-3
    # with the spread reported; everything else runs once.
    cc_family = frozenset(
        os.environ.get(
            "SPARK_GRAFT_MEDIAN3",
            "dedup_canonical dedup_rate_by_source dedup_simhash_pairs "
            "dedup_simhash_groups dedup_minhash_groups doc_repetition "
            "dedup_minhash_pairs emb_ivfpq_topk emb_pq_topk doc_vocab_overlap "
            "dedup_minhash_pairs_capped dedup_simhash_pairs_capped "
            "dedup_winnow_overlap dedup_ppjoin_pairs dedup_ppjoin_groups "
            "dedup_containment_pairs",
        ).split()
    )

    def _run_once(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        elapsed = time.time() - t0
        # Untimed inter-query hygiene: several operators cache small
        # intermediates (LSH signatures, CC labels/checkpoints) that
        # stay pinned after the query's action completes. Left alone,
        # ~100 queries' worth of leaked blocks + lingering RDDs inflate
        # late-running queries 2-4x (measured: minhash_groups 7.7s
        # fresh vs 33s at the end of a leaky session). Each query is
        # measured from cold data either way.
        spark.catalog.clearCache()
        gc.collect()
        return elapsed

    timings: dict[str, float] = {}
    median3: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        if name in cc_family:
            runs = [round(_run_once(fn), 3) for _ in range(3)]
            timings[name] = sorted(runs)[1]
            median3[name] = {"runs": runs, "spread": round(max(runs) - min(runs), 3)}
        else:
            timings[name] = round(_run_once(fn), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    payload = json.dumps(
        {
            "metric": "total_query_wall_seconds",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "cold_first_query": cold_name,
            "cold_first_query_s": cold_first_query_s,
            "median3": median3,
            "warmup_skipped": warmup_skipped,
        }
    )
    print(payload)
    # Self-preserving record: the driver captures only a tail of stdout,
    # which truncated 78 of 152 per-query timings out of BENCH_r04.json.
    # Writing the full JSON beside the repo makes the record independent
    # of any output-capture window.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"),
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(payload + "\n")
    except OSError:
        pass  # stdout line above remains the primary record
    spark.stop()


if __name__ == "__main__":
    main()
