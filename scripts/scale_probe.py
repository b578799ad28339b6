"""Scale probe: measure how headline plans scale with data volume.

Builds a 10x logical expansion of the sf0.1 tables (10 unioned scans
with key-shifted copies — no data written; series keys are shifted so
per-key cardinality stays constant while key COUNT grows 10x, which is
how real horizontal growth looks), then times representative queries
at 1x and 10x. A plan that is linear-ish here (ratio ~<= 14x for 10x
data on a fixed 32-core box, allowing scheduler overhead) has no
hidden quadratic/collapse-to-one-partition term; a superlinear ratio
is a red flag to fix before any real scale-up.

Usage: python scripts/scale_probe.py [multiplier]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def expanded(spark, name: str, mult: int, key_cols: dict[str, int]):
    """Union of ``mult`` scans with shifted keys (constant per-key size,
    mult-x key count)."""
    from pyspark.sql import functions as F

    from tsod_spark.registry import table

    base = table(spark, SF_DIR, name)
    parts = []
    for i in range(mult):
        df = base
        for col, stride in key_cols.items():
            df = df.withColumn(col, F.col(col) + F.lit(i * stride))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("scale-probe")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # 165 codegen-heavy plans overflow the JVM's default 240m JIT
        # code cache mid-session; once it fills, compilation stops and
        # CPU-bound generated code (md5 dedup pipelines) runs
        # interpreted 3-7x slower -- the root cause of the CC-family
        # run-to-run variance (measured: pairs phase 3s->10s across
        # trials, steady 1.6s with this flag).
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from tsod_spark import CombinedDetector, ConstantValueDetector, DiffDetector, HampelDetector, RangeDetector
    from tsod_spark.analytics import temporal, tpch
    from tsod_spark.frame import TimeSeriesFrame
    from tsod_spark.pipeline import dedup

    KEYSHIFT = {"events": {"user_id": 10_000, "event_id": 10_000_000}}

    def events(m):
        return expanded(spark, "events", m, KEYSHIFT["events"])

    def tsf(m):
        return TimeSeriesFrame(events(m), series=["user_id"], tiebreak=["event_id"])

    def q_combined(m):
        det = CombinedDetector(
            [RangeDetector(1.0, 300.0), DiffDetector(80.0), ConstantValueDetector(3, 5.0), HampelDetector(5, 3)]
        )
        return det.detect(tsf(m))

    def q_asof(m):
        e = events(m)
        p = e.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
        return temporal.asof_join(e, p, ["user_id"])

    def q_resample(m):
        return temporal.resample(events(m))

    def q_sessions(m):
        return tpch.sessionize(events(m))

    def q_q5(m):
        li = expanded(spark, "lineitem", m, {"l_orderkey": 10_000_000})
        o = expanded(spark, "orders", m, {"o_orderkey": 10_000_000, "o_custkey": 0})
        return tpch.q5_local_supplier_volume(
            expanded(spark, "customer", 1, {}),
            o,
            li,
            expanded(spark, "supplier", 1, {}),
            expanded(spark, "nation", 1, {}),
            expanded(spark, "region", 1, {}),
        )

    def q_dedup_exact(m):
        docs = expanded(spark, "documents", m, {"doc_id": 10_000_000})
        return dedup.exact_duplicates(docs)

    def q_minhash_sigs(m):
        docs = expanded(spark, "documents", m, {"doc_id": 10_000_000})
        return dedup.minhash_signatures(docs)

    def q_top_parts(m):
        from tsod_spark.analytics import olap

        li = expanded(spark, "lineitem", m, {"l_orderkey": 10_000_000})
        return olap.top_parts_per_brand(li, expanded(spark, "part", 1, {}))

    def q_funnel(m):
        from tsod_spark.analytics import olap

        return olap.funnel(events(m))

    def q_retention(m):
        from tsod_spark.analytics import olap

        return olap.retention_cohorts(events(m))

    def q_chunk_dedup(m):
        docs = expanded(spark, "documents", m, {"doc_id": 10_000_000})
        return dedup.chunk_dedup(docs)

    def q_jaccard(m):
        # horizontal growth for blocked-quadratic ops = MORE blocks of
        # constant size (each expansion copy gets its own block space),
        # matching the operator's contract. Growing block SIZE 10x is
        # a different experiment: pairs grow 100x, and a measured run
        # did 100x pairs in 11x wall (per-pair throughput UP 9x via the
        # bucket decomposition) — intrinsic to exact in-block all-pairs,
        # not a plan defect.
        docs = expanded(spark, "documents", m, {"doc_id": 10_000_000})
        docs = docs.withColumn(
            "blk",
            F.concat(
                F.col("source"),
                F.lit("#"),
                (F.col("doc_id") / 10_000_000).cast("int"),
            ),
        )
        return dedup.jaccard_pairs(docs, block_col="blk")

    def q_mixture(m):
        from tsod_spark.pipeline import curate

        docs = expanded(spark, "documents", m, {"doc_id": 10_000_000})
        return curate.mixture_sample(docs)

    def _purchase_intervals(e):
        return e.where(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("event_id").alias("iv_id"),
            (F.col("ts") - F.expr("INTERVAL 30 MINUTE")).alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("end_ts"),
        )

    def q_range_join(m):
        e = events(m)
        return temporal.range_join(
            e.select("user_id", "event_id", "ts"),
            _purchase_intervals(e),
            ["user_id"],
            bucket_seconds=1800,
        )

    def q_interval_overlap(m):
        p = _purchase_intervals(events(m))
        return temporal.interval_overlap_join(p, p, ["user_id"], bucket_seconds=1800)

    def q_incremental(m):
        # the production shape: a FIXED-size ingest tick against a
        # corpus that grows mult-x — cost must track the corpus scan,
        # with zero corpus-side exchanges (plan-pinned in tests)
        corpus = expanded(spark, "documents", m, {"doc_id": 10_000_000})
        batch = expanded(spark, "documents", 1, {}).where(F.col("doc_id") % 5 == 0)
        return dedup.incremental_new_docs(corpus, batch)

    def q_seasonal(m):
        return temporal.seasonal_anomaly(events(m))

    def q_lm_rarity(m):
        from tsod_spark.pipeline import text as _text

        docs = expanded(spark, "documents", m, {"doc_id": 10_000_000})
        ref = expanded(spark, "documents", 1, {}).where(
            F.col("source").isin("src0", "src1", "src2")
        )
        return _text.lm_rarity(docs, ref)

    def q_profile(m):
        from tsod_spark.analytics import olap

        e = events(m).select(
            "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
        )
        return olap.profile_table(e)

    def q_drift(m):
        from tsod_spark.analytics import olap

        e = events(m)
        cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
        return olap.histogram_drift(
            e.where(F.col("ts") < cut), e.where(F.col("ts") >= cut)
        )

    QUERIES = {
        "combined_detect": q_combined,
        "asof_join": q_asof,
        "resample": q_resample,
        "sessionize": q_sessions,
        "tpch_q5": q_q5,
        "dedup_exact": q_dedup_exact,
        "minhash_sigs": q_minhash_sigs,
        "top_parts_rank": q_top_parts,
        "funnel": q_funnel,
        "retention": q_retention,
        "chunk_dedup": q_chunk_dedup,
        "jaccard_pairs": q_jaccard,
        "mixture_sample": q_mixture,
        "range_join": q_range_join,
        "interval_overlap": q_interval_overlap,
        "incremental_dedup": q_incremental,
        "rolling_corr": lambda m: temporal.rolling_benchmark_correlation(events(m)),
        "seasonal_anomaly": q_seasonal,
        "lm_rarity": q_lm_rarity,
        "profile": q_profile,
        "histogram_drift": q_drift,
        # r5 operators: one map-side corpus scan; three keyed-window/
        # grouped shapes whose horizontal growth axis is key count
        "gopher_filter": lambda m: __import__(
            "tsod_spark.pipeline.text", fromlist=["text"]
        ).gopher_filter(expanded(spark, "documents", m, {"doc_id": 10_000_000})),
        "lttb_downsample": lambda m: temporal.lttb_downsample(events(m)),
        "time_weighted_avg": lambda m: temporal.time_weighted_avg(events(m)),
        "winsorize": lambda m: temporal.winsorize(events(m)),
    }

    # warmup
    events(1).limit(1).write.format("noop").mode("overwrite").save()

    results = {}
    for name, fn in QUERIES.items():
        t = {}
        for m in (1, mult):
            t0 = time.time()
            fn(m).write.format("noop").mode("overwrite").save()
            t[m] = round(time.time() - t0, 2)
        ratio = round(t[mult] / t[1], 2) if t[1] > 0 else None
        results[name] = {"t1x": t[1], f"t{mult}x": t[mult], "ratio": ratio}
        print(f"{name}: 1x={t[1]}s {mult}x={t[mult]}s ratio={ratio}", flush=True)

    # --- CC loop with a deep-diameter chain ---------------------------
    # Worst case for label propagation is a long CHAIN of near-dups:
    # labels must walk the whole diameter, exercising the max_iter
    # bound, per-round cache turnover, and localCheckpoint cadence.
    # Chain docs are 50-token sliding windows over a shared token
    # stream (consecutive windows ~96% Jaccard). The chain length is
    # FIXED while the background corpus grows mult-x: a healthy loop
    # scales with corpus volume, not with (volume x diameter).
    def chained_docs(m, chain_len=40):
        base = expanded(spark, "documents", m, {"doc_id": 10_000_000})
        chain = (
            spark.range(chain_len)
            .select(
                (F.col("id") + 900_000_000).alias("doc_id"),
                F.concat_ws(" ", F.transform(
                    F.sequence(F.col("id"), F.col("id") + 49),
                    lambda x: F.concat(F.lit("chainword"), x),
                )).alias("text"),
            )
            .withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("chain"))
            .withColumn("n_chars", F.length("text"))
        )
        return base.select(*chain.columns).unionByName(chain)

    t = {}
    for m in (1, mult):
        t0 = time.time()
        labels = dedup.minhash_duplicate_groups(chained_docs(m), max_iter=40)
        chain_rows = labels.where(F.col("doc_id") >= 900_000_000).collect()
        t[m] = round(time.time() - t0, 2)
        n_groups = len({r.group_id for r in chain_rows})
        assert len(chain_rows) == 40, f"chain rows lost: {len(chain_rows)}"
        # sliding windows overlap several hops out, so the chain may
        # resolve to a handful of groups, never 40 singletons
        assert n_groups <= 5, f"chain fractured into {n_groups} groups"
    ratio = round(t[mult] / t[1], 2) if t[1] > 0 else None
    results["minhash_groups_chained"] = {"t1x": t[1], f"t{mult}x": t[mult], "ratio": ratio}
    print(f"minhash_groups_chained: 1x={t[1]}s {mult}x={t[mult]}s ratio={ratio}", flush=True)

    print(json.dumps({"multiplier": mult, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
