"""Round-10 regression tests: tied-decile PSI stream/batch agreement
(ADVICE r9 medium), structural cache hygiene (VERDICT r9 #7), the
km_logrank zero-expected guard (ADVICE r9 low), and the
filter-above-cache pushdown contract for the ppjoin tokenizer
(VERDICT r9 #1 root cause)."""

import datetime

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _tied_events(spark):
    """Events whose reference-half deciles COLLAPSE: ~95% of values are
    the identical 1.00, so all nine decile bounds equal 100 cents and
    buckets 2..9 are structurally unreachable — empty in BOTH halves.
    The batch counts frame omits those buckets; a stream that sums
    smoothed terms over all 10 would add eight spurious nonzero terms
    (n_ref != n_cur here on purpose, so 1/(n_cur+10) != 1/(n_ref+10)).
    """
    base = datetime.datetime(2024, 1, 1)
    rows = []
    # ref half: hours 0..9, 60 rows, all value 1.0
    for i in range(60):
        rows.append(("a", base + datetime.timedelta(hours=i % 10, minutes=i), 1.0))
    # cur half: hours 10..19, 40 rows: 30x 1.0 + 10x 5.0 (drift mass)
    for i in range(40):
        v = 5.0 if i % 4 == 0 else 1.0
        rows.append(("a", base + datetime.timedelta(hours=10 + i % 10, minutes=i), v))
    return spark.createDataFrame(rows, "event_type string, ts timestamp, value double")


def test_psi_tied_deciles_stream_equals_batch(spark, tmp_path):
    """ADVICE r9 (medium): when tied decile boundaries leave buckets
    empty in both halves, the stream must omit their smoothed terms
    exactly as the batch does."""
    from tsod_spark.queries.round9 import psi_drift, psi_ref_stats
    from tsod_spark.streaming import stream_psi_drift

    e = _tied_events(spark)
    batch = {r.event_type: r for r in psi_drift(e).collect()}
    ref = {
        r.event_type: (list(r.bounds), list(r.ref_counts), r.n_ref)
        for r in psi_ref_stats(e).collect()
    }
    # sanity: the fixture really collapses the deciles
    assert ref["a"][0] == [100.0] * 9
    assert sum(1 for c in ref["a"][1] if c == 0) >= 8

    d = e.withColumn("__hb", F.expr("unix_micros(ts) div 3600000000"))
    lo, hi = d.agg(F.min("__hb"), F.max("__hb")).first()
    mid = (lo + hi + 1) // 2
    cur = d.where(F.col("__hb") >= mid).drop("__hb").orderBy("ts")
    rows = cur.collect()
    src_dir = str(tmp_path / "psi_tied_src")
    chunk = (len(rows) + 1) // 2
    for i in range(2):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, cur.schema).coalesce(1).write.parquet(
                f"{src_dir}/b{i}"
            )
    src = (
        spark.readStream.schema(cur.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/b*")
    )
    q = (
        stream_psi_drift(src, ref)
        .writeStream.format("memory")
        .queryName("t_psi_tied")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {}
    for r in spark.sql("SELECT * FROM t_psi_tied").collect():
        if r.event_type not in got or r.n_cur > got[r.event_type].n_cur:
            got[r.event_type] = r
    assert set(got) == set(batch) == {"a"}
    b, s = batch["a"], got["a"]
    assert s.n_ref == b.n_ref and s.n_cur == b.n_cur
    assert s.n_ref != s.n_cur  # the spurious terms would differ
    assert s.psi == b.psi
    assert bool(s.drift_flag) == bool(b.drift_flag)


def test_cache_scope_leaves_no_pinned_blocks(spark):
    """VERDICT r9 #7: the structural replacement for the clearCache
    docstring contract — after a cache_scope exits, every frame a dedup
    operator cached inside it is unpersisted."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table
    from tsod_spark.util import cache_scope

    def rdd_ids() -> set:
        return set(spark.sparkContext._jsc.getPersistentRDDs().keySet())

    docs = table(spark, SF, "documents")
    spark.catalog.clearCache()
    # SET-relative, not count-relative: earlier suite tests may hold
    # localCheckpoint RDD blocks that catalog.clearCache() does not
    # drop, and the JVM ContextCleaner may release THOSE asynchronously
    # mid-test (a count baseline flakes; the id-set of blocks WE
    # created cannot)
    base = rdd_ids()
    with cache_scope():
        pairs = dedup.ppjoin_pairs(docs, thr_pct=90, shingle_n=1).collect()
        assert rdd_ids() - base  # the scope pinned new blocks
    assert not (rdd_ids() - base)  # ...and exit dropped every one
    # nested scopes unpersist only their own frames
    with cache_scope():
        dedup.ppjoin_pairs(docs, thr_pct=90, shingle_n=1).collect()
        outer = rdd_ids()
        with cache_scope():
            dedup.ppjoin_pairs(docs, thr_pct=80, shingle_n=2).collect()
        assert not (rdd_ids() - outer)  # inner's frames are gone
        assert outer - base  # outer's frames survive the inner exit
    assert not (rdd_ids() - base)
    assert isinstance(pairs, list)


def _formatted_plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_explain_audit_flags_double_kernel_sort(spark):
    """VERDICT r9 #6: the audit must flag a global orderBy directly
    above an applyInPandas kernel (range-partition sampling runs the
    kernel twice) and pass the cache()-fixed variant and the
    shuffle-barrier variant."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from explain_audit import find_double_kernel_sorts

    import pandas as pd

    df = spark.range(200).withColumn("k", F.col("id") % 4)

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.assign(v=pdf["id"] * 2.0)

    out = df.groupBy("k").applyInPandas(kern, "id long, k long, v double")
    broken = out.orderBy("v")
    assert find_double_kernel_sorts(_formatted_plan(broken)), (
        "audit missed the deliberately-broken double-kernel plan"
    )
    cached = out.cache()
    try:
        fixed = cached.orderBy("v")
        assert not find_double_kernel_sorts(_formatted_plan(fixed))
    finally:
        cached.unpersist()
    # an aggregation shuffle between kernel and sort is a barrier: the
    # sample pass reuses the shuffle files, the kernel runs once
    barrier = out.groupBy("k").agg(F.sum("v").alias("s")).orderBy("s")
    assert not find_double_kernel_sorts(_formatted_plan(barrier))


def test_explain_audit_all_registered_plans_clean_rule6(spark):
    """The new double-kernel rule passes every registered plan (the r9
    audit found only the fixed HW pair; this pins it)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from explain_audit import find_double_kernel_sorts

    from tsod_spark.registry import QUERIES

    bad = []
    for name, fn in QUERIES.items():
        try:
            plan = _formatted_plan(fn(spark, SF))
        except Exception:
            continue  # plan-build failures are other tests' business
        if find_double_kernel_sorts(plan):
            bad.append(name)
    spark.catalog.clearCache()
    assert bad == [], f"double-kernel range sorts in: {bad}"


def test_km_logrank_no_nan_chi(spark):
    """ADVICE r9: chi_contrib is NULL (not NaN/Inf) when a segment's
    expected count is zero; on real data it is finite and
    nonnegative."""
    from tsod_spark.registry import QUERIES

    rows = QUERIES["orders_km_logrank"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        if r.chi_contrib is not None:
            assert r.chi_contrib == r.chi_contrib  # not NaN
            assert r.chi_contrib >= 0
            assert r.chi_contrib != float("inf")


def test_ppjoin_prefix_stats_uncached(spark):
    """ADVICE r9: the read-only stats screen must not pin the tokenized
    corpus (cache=False path), and its numbers must agree with the
    cached pairs path's prefix construction."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table
    from tsod_spark.util import cache_scope

    docs = table(spark, SF, "documents")
    spark.catalog.clearCache()
    base = len(spark.sparkContext._jsc.getPersistentRDDs())
    st = dedup.ppjoin_prefix_stats(docs, thr_pct=90, shingle_n=1).collect()[0]
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == base
    assert st.total_buckets > 0 and st.total_rows >= st.total_buckets
    # cross-check against the cached pairs-path prefix table
    with cache_scope():
        _tok, pre = dedup._ppjoin_prefix(docs, 90, "text", "source", 1)
        n_pre = pre.count()
    assert st.total_rows == n_pre


def test_stream_containment_screen_matches_batch(spark, tmp_path):
    """VERDICT r9 missing #4: the streaming containment screen's final
    emission per (doc, match) equals the batch twin row-for-row, across
    micro-batch boundaries."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table
    from tsod_spark.streaming import stream_containment_screen

    docs = table(spark, SF, "documents")
    batch = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    expected = {
        (r.doc_id, r.match_id): r
        for r in dedup.containment_screen_new_docs(
            corpus, batch, thr_pct=90
        ).collect()
    }
    assert len(expected) > 0

    idx = dedup.containment_index(corpus).cache()
    idx.count()
    rows = batch.select("doc_id", "text", "source").orderBy("doc_id").collect()
    src_dir = str(tmp_path / "cont_src")
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
        stream_containment_screen(src, idx, thr_pct=90)
        .writeStream.format("memory")
        .queryName("t_cont")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {}
    for r in spark.sql("SELECT * FROM t_cont").collect():
        k = (r.doc_id, r.match_id)
        if k not in got or r.shared_grams > got[k].shared_grams:
            got[k] = r
    idx.unpersist()
    assert set(got) == set(expected)
    for k, b in expected.items():
        s = got[k]
        assert s.shared_grams == b.shared_grams, k
        assert s.containment == b.containment, k
    spark.catalog.clearCache()


def test_ivf_recall_curve_raw_values(spark):
    """The raw tuning curve behind emb_ivf_recall_curve: monotone
    recall and scan cost, exact full-probe anchors, floors hold."""
    from tsod_spark.pipeline import similarity
    from tsod_spark.registry import table
    from tsod_spark.util import cache_scope

    emb = table(spark, SF, "embeddings")
    n_total = emb.count()
    base = len(spark.sparkContext._jsc.getPersistentRDDs())
    with cache_scope():
        rows = similarity.ivf_recall_curve(emb).collect()
    assert [r.n_probe for r in rows] == [1, 2, 4, 8, 16]
    floors = {1: 0.0, 2: 0.2, 4: 0.4, 8: 0.7, 16: 1.0}
    prev_r, prev_s = -1.0, -1
    for r in rows:
        assert r.recall_k >= floors[r.n_probe], r
        assert r.recall_k >= prev_r and r.rows_scanned >= prev_s, r
        prev_r, prev_s = r.recall_k, r.rows_scanned
    last = rows[-1]
    assert last.rows_scanned == n_total - 1
    assert last.recall_k == 1.0 and last.n_hits == 10
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == base


def test_conformal_by_segment_single_segment_reduces_to_global(spark):
    """VERDICT r9 #5 done-criterion: on a single-segment corpus the
    per-segment conformal emits exactly the global query's rows."""
    import datetime

    from tsod_spark.queries.round8 import conformal_snaive
    from tsod_spark.queries.round10 import conformal_snaive_by
    from tsod_spark.util import cache_scope

    base = datetime.datetime(2024, 3, 1)
    rows = []
    for u in range(3):
        for h in range(120):
            # deterministic value with a daily-ish wobble per user
            v = 10.0 + u + ((h * 7 + u * 3) % 13) * 0.25
            rows.append(
                (u, "metric", base + datetime.timedelta(hours=h), v)
            )
    e = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )
    glob = {r.user_id: r for r in conformal_snaive(e).collect()}
    with cache_scope():
        seg = conformal_snaive_by(e).collect()
    spark.catalog.clearCache()
    assert len(glob) > 0 and len(seg) == len(glob)
    for r in seg:
        assert r.event_type == "metric"
        g = glob[r.user_id]
        assert (r.n_cal, r.qhat_cents, r.n_test, r.n_flagged) == (
            g.n_cal,
            g.qhat_cents,
            g.n_test,
            g.n_flagged,
        ), r.user_id
        assert r.coverage == g.coverage, r.user_id


def test_pack_loss_mask_conservation(spark):
    """VERDICT r9 #8 done-criterion: per source, kept + masked equals
    the corpus token total; per sequence, kept + masked + pad equals
    the budget; crossings match doc_pack_sequences' straddle count."""
    from tsod_spark.pipeline import curate
    from tsod_spark.pipeline.text import tokens
    from tsod_spark.registry import table

    docs = table(spark, SF, "documents")
    budget = 256
    per_seq = curate.pack_loss_mask(docs, budget=budget).collect()
    assert len(per_seq) > 0
    totals = {
        r.part: r.nt
        for r in docs.groupBy(F.col("source").alias("part"))
        .agg(F.sum(F.size(tokens(F.col("text")))).cast("long").alias("nt"))
        .collect()
    }
    by_part: dict = {}
    for r in per_seq:
        assert r.n_kept >= 0 and r.n_masked >= 0 and r.n_pad >= 0, r
        assert r.n_kept + r.n_masked + r.n_pad == budget, r
        assert r.boundary_crossings <= r.n_docs, r
        acc = by_part.setdefault(r.part, [0, 0, 0])
        acc[0] += r.n_kept
        acc[1] += r.n_masked
        acc[2] += r.boundary_crossings
    assert set(by_part) == set(totals)
    for part, (kept, masked, crossings) in by_part.items():
        assert kept + masked == totals[part], part
    # crossings = straddling docs counted once per extra sequence
    straddle = {
        r.part: r.c
        for r in curate.pack_sequences(docs, budget=budget)
        .where("straddles_boundary")
        .groupBy("part")
        .agg(F.count("*").cast("long").alias("c"))
        .collect()
    }
    for part, (_, _, crossings) in by_part.items():
        assert crossings >= straddle.get(part, 0), part


def test_stream_pack_sequences_matches_batch(spark, tmp_path):
    """The streaming packer's emissions across 3 micro-batches equal
    the batch pack_sequences rows byte-for-byte (docs delivered in the
    batch operator's own doc_id-per-source order)."""
    from tsod_spark.pipeline import curate
    from tsod_spark.registry import table
    from tsod_spark.streaming import stream_pack_sequences

    docs = table(spark, SF, "documents")
    expected = {r.doc_id: r for r in curate.pack_sequences(docs).collect()}
    rows = docs.select("doc_id", "text", "source").orderBy("doc_id").collect()
    src_dir = str(tmp_path / "pack_src")
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
        stream_pack_sequences(src)
        .writeStream.format("memory")
        .queryName("t_pack")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.doc_id: r for r in spark.sql("SELECT * FROM t_pack").collect()}
    assert set(got) == set(expected)
    for did, b in expected.items():
        s = got[did]
        assert (s.part, s.n_tokens, s.seq_id, s.seq_offset) == (
            b.part,
            b.n_tokens,
            b.seq_id,
            b.seq_offset,
        ), did
        assert bool(s.straddles_boundary) == bool(b.straddles_boundary), did


def test_stream_wasserstein_matches_batch(spark, tmp_path):
    """A stream that has consumed exactly the batch query's
    current-half rows, scored against the frozen reference ECDF, must
    emit the batch W1 row per type exactly."""
    from tsod_spark.queries.round10 import w1_ref_stats
    from tsod_spark.registry import QUERIES
    from tsod_spark.registry import table as rt
    from tsod_spark.streaming import stream_wasserstein_drift

    e = rt(spark, SF, "events")
    ref = {
        r.event_type: (list(r.cents), list(r.counts), r.n_ref)
        for r in w1_ref_stats(e).collect()
    }
    d = e.withColumn("__hb", F.expr("unix_micros(ts) div 3600000000"))
    lo, hi = d.agg(F.min("__hb"), F.max("__hb")).first()
    mid = (lo + hi + 1) // 2
    cur = d.where(F.col("__hb") >= mid).drop("__hb").orderBy("ts", "event_id")
    rows = cur.collect()
    src_dir = str(tmp_path / "w1_src")
    chunk = (len(rows) + 2) // 3
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, cur.schema).coalesce(1).write.parquet(
                f"{src_dir}/b{i}"
            )
    src = (
        spark.readStream.schema(cur.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/b*")
    )
    q = (
        stream_wasserstein_drift(src, ref)
        .writeStream.format("memory")
        .queryName("t_w1")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {}
    for r in spark.sql("SELECT * FROM t_w1").collect():
        if r.event_type not in got or r.n_cur > got[r.event_type].n_cur:
            got[r.event_type] = r
    batch = {
        r.event_type: r
        for r in QUERIES["events_wasserstein_drift"](spark, SF).collect()
    }
    assert set(got) == set(batch)
    assert len(got) > 0
    for et, b in batch.items():
        s = got[et]
        assert s.n_ref == b.n_ref and s.n_cur == b.n_cur, et
        assert s.w1_value == b.w1_value, et
        assert s.w1_norm == b.w1_norm, et
        assert bool(s.drift_flag) == bool(b.drift_flag), et
    spark.catalog.clearCache()


def test_lsh_tuning_curve_invariants(spark):
    """Band nesting: candidates/found nondecreasing in b; recall at
    b=k exactly 1.0; truth constant across rows."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table
    from tsod_spark.util import cache_scope

    with cache_scope():
        rows = dedup.lsh_tuning_curve(table(spark, SF, "documents")).collect()
    assert [r.bands for r in rows] == [1, 2, 4, 8]
    prev_c = prev_f = -1
    for r in rows:
        assert r.n_candidates >= prev_c and r.n_found >= prev_f, r
        assert r.n_true_pairs == rows[0].n_true_pairs
        assert r.n_found <= r.n_true_pairs
        prev_c, prev_f = r.n_candidates, r.n_found
    assert rows[-1].recall == 1.0
    assert rows[-1].n_found == rows[-1].n_true_pairs


def test_stream_ks_drift_matches_python_reference(spark, tmp_path):
    """The streaming KS monitor's final emission equals a pure-python
    two-sample KS (exact ECDFs over cents) between the frozen reference
    half and the streamed current half."""
    import math

    from tsod_spark.queries.round10 import w1_ref_stats
    from tsod_spark.registry import table as rt
    from tsod_spark.streaming import stream_ks_drift
    from tsod_spark.util import py_round6

    e = rt(spark, SF, "events")
    ref = {
        r.event_type: (list(r.cents), list(r.counts), r.n_ref)
        for r in w1_ref_stats(e).collect()
    }
    d = e.withColumn("__hb", F.expr("unix_micros(ts) div 3600000000"))
    lo, hi = d.agg(F.min("__hb"), F.max("__hb")).first()
    mid = (lo + hi + 1) // 2
    cur = d.where(F.col("__hb") >= mid).drop("__hb").orderBy("ts", "event_id")
    rows = cur.collect()
    src_dir = str(tmp_path / "ks_src")
    chunk = (len(rows) + 2) // 3
    for i in range(3):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, cur.schema).coalesce(1).write.parquet(
                f"{src_dir}/b{i}"
            )
    src = (
        spark.readStream.schema(cur.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src_dir}/b*")
    )
    q = (
        stream_ks_drift(src, ref)
        .writeStream.format("memory")
        .queryName("t_ks")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {}
    for r in spark.sql("SELECT * FROM t_ks").collect():
        if r.event_type not in got or r.n_cur > got[r.event_type].n_cur:
            got[r.event_type] = r

    # python reference: exact two-sample KS over cent values
    cur_vals: dict = {}
    for r in rows:
        v = r.value
        if v is None or v != v:
            continue
        vc = (-1 if v < 0 else 1) * int(math.floor(abs(v) * 100 + 0.5))
        cur_vals.setdefault(r.event_type, {}).setdefault(vc, 0)
        cur_vals[r.event_type][vc] += 1
    assert len(got) > 0
    for et, s in got.items():
        rcents, rcounts, n_ref = ref[et]
        cm = cur_vals[et]
        n_cur = sum(cm.values())
        rmap = dict(zip(rcents, rcounts))
        merged = sorted(set(rcents) | set(cm))
        best, best_v = -1, merged[0]
        cr = cc = 0
        for v in merged:
            cr += rmap.get(v, 0)
            cc += cm.get(v, 0)
            num = abs(cr * n_cur - cc * n_ref)
            if num > best:
                best, best_v = num, v
        assert s.n_ref == n_ref and s.n_cur == n_cur, et
        assert s.ks == py_round6(best / (n_ref * n_cur)), et
        assert s.ks_at_cent == best_v, et
        crit = 1.358 * math.sqrt((n_ref + n_cur) / (n_ref * n_cur))
        assert bool(s.drift_flag) == (best / (n_ref * n_cur) > crit), et


def test_ppjoin_tok_plan_no_compute_below_exchange(spark):
    """Plan-shape pin for the r10 pushdown fix (VERDICT r9 #1 root
    cause): in the ppjoin tokenizer's cached plan, the repartition
    Exchange must sit DIRECTLY on the bare parquet scan — no Filter or
    Project carrying the shingle/hash expressions below it (pushdown
    used to drag the nonempty filter, and with it the whole
    interpreted tokenize pipeline, into the single-partition scan:
    3.8s single-threaded + a post-shuffle recompute vs 0.6s fixed).
    The nonempty filter must sit above the InMemoryRelation."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from explain_audit import _tree_nodes

    from tsod_spark.pipeline.dedup import _ppjoin_prefix
    from tsod_spark.registry import table
    from tsod_spark.util import cache_scope

    with cache_scope():
        tok, _pre = _ppjoin_prefix(
            table(spark, SF, "documents"), 80, "text", "source", 2
        )
        plan = tok._sc._jvm.PythonSQLUtils.explainString(
            tok._jdf.queryExecution(), "formatted"
        )
    nodes = _tree_nodes(plan)
    names = [n for _, n, _ in nodes]
    assert "InMemoryRelation" in names and "Exchange" in names
    # the Exchange's subtree must be exactly the bare scan
    for idx, (depth, name, _) in enumerate(nodes):
        if name != "Exchange":
            continue
        below = []
        j = idx + 1
        while j < len(nodes) and nodes[j][0] > depth:
            below.append(nodes[j][1])
            j += 1
        assert all(b.startswith("Scan") for b in below), (
            f"compute below the repartition exchange: {below}"
        )
    # the nonempty filter sits above the cache, not inside it
    fi = names.index("Filter")
    assert "InMemoryTableScan" in names[fi + 1 :], names


def test_ppjoin_prebuilt_index_result_invariant(spark):
    """ppjoin_pairs with a persisted df index (ppjoin_index) returns
    bit-identical pairs to the self-contained recompute — the index is
    an optimization hint, not a correctness input."""
    from tsod_spark.pipeline import dedup
    from tsod_spark.registry import table
    from tsod_spark.util import cache_scope

    docs = table(spark, SF, "documents")
    with cache_scope():
        base = dedup.ppjoin_pairs(docs, thr_pct=90, shingle_n=1).collect()
        idx = dedup.ppjoin_index(docs, shingle_n=1).cache()
        idx.count()
        with_idx = dedup.ppjoin_pairs(
            docs, thr_pct=90, shingle_n=1, index=idx
        ).collect()
        idx.unpersist()
    key = lambda r: (r.doc_a, r.doc_b)  # noqa: E731
    assert sorted(map(key, base)) == sorted(map(key, with_idx))
    bj = {key(r): r.jaccard for r in base}
    for r in with_idx:
        assert bj[key(r)] == r.jaccard
