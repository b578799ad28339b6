"""Round-11 query registrations: PQ distortion-vs-m tuning curve
(completing the knob-curve family: nprobe r10, LSH bands r10, PQ m
here), sampled threshold-curve twin, and per-segment drift.

Reference basis: the reference is a univariate anomaly-detection
library (/root/reference/tsod/detectors.py); these extend the repo's
ANN/dedup/drift families along the axes VERDICT_r10 queued.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..pipeline import dedup
from ._base import DTOKS, TOKS, _shingle_sql, register, table


@register(
    "emb_pq_distortion_curve",
    """WITH g AS (SELECT unnest([4, 8, 16, 32]) AS m,
                         unnest([1, 2, 3, 4]) AS lvl)
    SELECT CAST(m AS BIGINT) AS m, CAST(m AS BIGINT) AS bytes_per_code,
       round(256.0 / m, 6) AS compression_x,
       CAST(16 * lvl AS BIGINT) AS codebook_k,
       TRUE AS distortion_monotone_ok, TRUE AS recall_floor_ok,
       CASE WHEN m = 32 THEN CAST(1.0 AS DOUBLE) END AS full_refine_recall
    FROM g ORDER BY m""",
)
def emb_pq_distortion_curve(spark, sf_dir):
    """PQ distortion-vs-m TUNING CURVE (VERDICT r10 #2) in the
    certificate shape the knob-curve family established
    (emb_ivf_recall_curve, dedup_lsh_tuning_curve): per m in
    {4, 8, 16, 32} against the 64-dim corpus, the row certifies

    - ``distortion_monotone_ok``: corpus-mean L2^2 reconstruction
      error is NONINCREASING in m — PROVABLE, not empirical: the
      codebooks are NESTED (pipeline.similarity.pq_nested_codebooks —
      each finer codebook contains the split halves of every coarser
      augmented centroid, so the finer quantizer can always reproduce
      the coarser reconstruction per vector), the codebook analogue of
      the IVF curve's nested probe sets and the LSH curve's band
      nesting;
    - ``recall_floor_ok``: raw-ADC recall@10 >= a measured-stable
      floor (0.0/0.1/0.3/0.5 across the three fixtures);
    - ``full_refine_recall``: at the finest m, the recall of the ADC
      search whose refine shortlist covers the whole corpus — EXACTLY
      1.0 by construction (the shortlist re-rank IS the exact scan),
      the SQL-reproducible anchor;
    - exact bytes accounting: ``bytes_per_code = m`` (every codebook
      stays <= 256 entries — one byte per code), ``compression_x =
      4*64/m`` vs float32, ``codebook_k = 16*level`` by the nested
      construction.

    This is the query that fixes bytes/vector before a 100 TB ANN
    deployment: read where the distortion knee crosses the recall
    floor you need, fix m. The raw curve (actual distortion/recall per
    m) stays available via pipeline.similarity.pq_distortion_curve and
    is range-pinned in tests/test_round11.py."""
    from ..pipeline import similarity
    from ..util import cache_scope

    floors = {4: 0.0, 8: 0.1, 16: 0.3, 32: 0.5}
    with cache_scope():
        curve = similarity.pq_distortion_curve(
            table(spark, sf_dir, "embeddings")
        )
        floor_col = F.create_map(
            *[F.lit(x) for kv in floors.items() for x in kv]
        )[F.col("m").cast("int")]
        w = Window.orderBy("m")
        out = (
            curve.select(
                "m",
                "bytes_per_code",
                "compression_x",
                "codebook_k",
                F.coalesce(
                    F.col("mean_distortion")
                    <= F.lag("mean_distortion").over(w),
                    F.lit(True),
                ).alias("distortion_monotone_ok"),
                (F.col("recall_k") >= floor_col).alias("recall_floor_ok"),
                "full_refine_recall",
            )
            .orderBy("m")
        )
        # materialize inside the scope so the enc caches drop on exit
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


@register(
    "dedup_threshold_curve_sampled",
    f"""WITH t AS (SELECT doc_id, source AS blk, {TOKS} AS toks0 FROM documents),
    d AS (SELECT doc_id, blk, {_shingle_sql('toks0', 2)} AS toks FROM t),
    n AS (SELECT source AS blk, CAST(count(*) AS BIGINT) AS n_blk,
            CAST((count(*) + 3) // 4 AS BIGINT) AS s_blk
          FROM documents GROUP BY source),
    r AS (SELECT doc_id, source AS blk,
            row_number() OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents),
    samp AS (SELECT r.doc_id, r.blk FROM r JOIN n USING (blk)
             WHERE rk <= s_blk),
    p AS (SELECT b.doc_id AS doc_b, a.blk AS blk,
            len(list_filter(a.toks, x -> list_contains(b.toks, x))) AS inter,
            len(a.toks) + len(b.toks) AS tot
          FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
          JOIN samp s ON s.doc_id = b.doc_id),
    j AS (SELECT doc_b, blk,
            round(CAST(inter AS DOUBLE) / (tot - inter), 6) AS jac FROM p),
    grid AS (SELECT unnest([30, 40, 50, 60, 70, 80, 90]) AS thr_pct),
    hp AS (SELECT g.thr_pct, j.blk, CAST(count(*) AS BIGINT) AS pairs,
             CAST(count(DISTINCT j.doc_b) AS BIGINT) AS dropped
           FROM j JOIN grid g ON j.jac >= CAST(g.thr_pct AS DOUBLE) / 100.0
           GROUP BY 1, 2),
    est AS (SELECT thr_pct,
              CAST(sum(pairs) AS BIGINT) AS n_dup_pairs_sampled,
              CAST(sum((pairs * n_blk) // s_blk) AS BIGINT)
                AS n_dup_pairs_est,
              CAST(sum(dropped) AS BIGINT) AS n_docs_dropped_sampled,
              CAST(sum((dropped * n_blk) // s_blk) AS BIGINT)
                AS n_docs_dropped_est
            FROM hp JOIN n USING (blk) GROUP BY 1),
    tot AS (SELECT CAST(sum(n_blk) AS BIGINT) AS n_docs,
              CAST(sum(s_blk) AS BIGINT) AS s_tot FROM n),
    fin AS (SELECT CAST(g.thr_pct AS BIGINT) AS thr_pct,
       tot.s_tot AS n_sampled_docs, tot.n_docs AS n_docs,
       CAST(coalesce(e.n_dup_pairs_sampled, 0) AS BIGINT)
         AS n_dup_pairs_sampled,
       CAST(coalesce(e.n_dup_pairs_est, 0) AS BIGINT) AS n_dup_pairs_est,
       CAST(coalesce(e.n_docs_dropped_sampled, 0) AS BIGINT)
         AS n_docs_dropped_sampled,
       CAST(coalesce(e.n_docs_dropped_est, 0) AS BIGINT)
         AS n_docs_dropped_est,
       CAST(coalesce(e.n_docs_dropped_sampled, 0) AS DOUBLE)
         / CAST(tot.s_tot AS DOUBLE) AS p,
       CAST(tot.s_tot AS DOUBLE) AS s
    FROM grid g CROSS JOIN tot LEFT JOIN est e ON e.thr_pct = g.thr_pct)
    SELECT thr_pct, n_sampled_docs, n_dup_pairs_sampled, n_dup_pairs_est,
       n_docs_dropped_sampled, n_docs_dropped_est,
       round(CAST(n_docs_dropped_est AS DOUBLE)
             / CAST(n_docs AS DOUBLE), 6) AS drop_share_est,
       round(greatest(0.0,
           (p + (1.96 * 1.96) / (2.0 * s)) / (1.0 + (1.96 * 1.96) / s)
           - 1.96 * sqrt(p * (1.0 - p) / s
                         + (1.96 * 1.96) / (4.0 * s * s))
             / (1.0 + (1.96 * 1.96) / s)), 6) AS ci95_lo,
       round(least(1.0,
           (p + (1.96 * 1.96) / (2.0 * s)) / (1.0 + (1.96 * 1.96) / s)
           + 1.96 * sqrt(p * (1.0 - p) / s
                         + (1.96 * 1.96) / (4.0 * s * s))
             / (1.0 + (1.96 * 1.96) / s)), 6) AS ci95_hi
    FROM fin ORDER BY thr_pct""",
)
def dedup_threshold_curve_sampled(spark, sf_dir):
    """SAMPLED twin of dedup_threshold_curve (VERDICT r10 #3): the
    same 7-threshold knob table estimated from a deterministic
    md5-stratified 25% document sample, at ~1/4 of the pair-join
    volume — the variant an operator runs at 100 TB where the exact
    knob-read costs a material fraction of the dedup run it precedes
    (51.2M pairs / 127s at the sf10 probe).

    Every sampled doc's drop status is EXACT (its pair Jaccards
    against all lower-id in-block docs are fully computed — only the
    right join leg is restricted); the corpus expansion is per-block
    int64 Horvitz-Thompson with floor division summed in int64 (no
    cross-block float accumulation), and ``ci95_lo``/``ci95_hi`` is
    the pooled WILSON score interval on the sampled drop rate —
    Wilson because the normal half-width collapses to +-0 when the
    sample catches zero dropped docs (it does at sf0.1) and would
    falsely exclude the truth. The exact curve is checked against the
    interval (tests/test_round11.py pins sampled-vs-exact agreement
    within it at sf0.1). The oracle reproduces the SAME sample (md5 ranking
    is engine-portable — the doc_stratified_sample discipline), so
    every column is hash-checked, not just rows."""
    return dedup.threshold_curve_sampled(table(spark, sf_dir, "documents"))


@register(
    "events_ks_drift_by_segment",
    """WITH c AS (SELECT user_id % 4 AS cohort, event_type,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    o AS (SELECT * FROM c WHERE vc IS NOT NULL),
    tc AS (SELECT cohort, event_type, vc, CAST(count(*) AS BIGINT) AS ct
           FROM o GROUP BY 1, 2, 3),
    g AS (SELECT cohort, vc, CAST(sum(ct) AS BIGINT) AS cg
          FROM tc GROUP BY 1, 2),
    nt AS (SELECT cohort, event_type, CAST(sum(ct) AS BIGINT) AS n1
           FROM tc GROUP BY 1, 2),
    tot AS (SELECT cohort, CAST(sum(cg) AS BIGINT) AS nn
            FROM g GROUP BY 1),
    grid AS (SELECT nt.cohort, nt.event_type, g.vc, g.cg, nt.n1
             FROM g JOIN nt ON nt.cohort = g.cohort),
    jj AS (SELECT grid.cohort, grid.event_type, grid.vc, grid.cg, grid.n1,
                  coalesce(tc.ct, 0) AS ct
           FROM grid LEFT JOIN tc
             ON tc.cohort = grid.cohort
            AND tc.event_type = grid.event_type AND tc.vc = grid.vc),
    cum AS (SELECT cohort, event_type, vc, n1,
              sum(ct) OVER (PARTITION BY cohort, event_type
                            ORDER BY vc) AS c1,
              sum(cg) OVER (PARTITION BY cohort, event_type
                            ORDER BY vc) AS cgc
            FROM jj),
    dd AS (SELECT cum.cohort, cum.event_type, vc, n1, tot.nn,
              abs(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(cgc - c1 AS DOUBLE) / CAST(tot.nn - n1 AS DOUBLE))
                AS d
           FROM cum JOIN tot ON tot.cohort = cum.cohort),
    mx AS (SELECT cohort, event_type, n1, nn, max(d) AS ksd
           FROM dd WHERE nn > n1 GROUP BY 1, 2, 3, 4),
    loc AS (SELECT dd.cohort, dd.event_type, min(dd.vc) AS ks_at_cent
            FROM dd JOIN mx ON dd.cohort = mx.cohort
             AND dd.event_type = mx.event_type AND dd.d = mx.ksd
            GROUP BY 1, 2)
    SELECT mx.cohort, mx.event_type, CAST(mx.n1 AS BIGINT) AS n_group,
           round(mx.ksd, 6) AS ks, loc.ks_at_cent,
           mx.ksd > 1.358 * sqrt(CAST(mx.n1 + (mx.nn - mx.n1) AS DOUBLE)
                                 / CAST(mx.n1 * (mx.nn - mx.n1) AS DOUBLE))
             AS drift_flag
    FROM mx JOIN loc ON loc.cohort = mx.cohort
     AND loc.event_type = mx.event_type
    ORDER BY mx.cohort, mx.event_type""",
)
def events_ks_drift_by_segment(spark, sf_dir):
    """Per-SEGMENT Kolmogorov-Smirnov drift screen (VERDICT r10 #7):
    the ``_by_segment`` factoring the conformal/KM/NA families
    established, applied to the KS member of the drift triple — each
    (cohort = user_id %% 4, event_type) is tested against the rest of
    ITS OWN cohort's population, because drift rarely hits all cohorts
    uniformly and the pooled test dilutes a cohort-local shift by the
    unaffected cohorts' mass. Same exact machinery as events_ks_drift
    with the segment in every key: domain-bounded (cohort, type, cent)
    counts, per-(cohort, type) ECDF windows, one-aggregate argmax. A
    single-segment corpus reduces EXACTLY to the global query
    (differential test, tests/test_round11.py)."""
    e = table(spark, sf_dir, "events").withColumn(
        "cohort", F.col("user_id") % 4
    )
    from ..analytics import stattests

    return stattests.ks_drift(e, seg_col="cohort")


@register(
    "events_wasserstein_drift_by_segment",
    """WITH c AS (SELECT user_id % 4 AS cohort, event_type AS t,
           CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc
        FROM events),
    d AS (SELECT * FROM c WHERE vc IS NOT NULL),
    span AS (SELECT (min(hb) + max(hb) + 1) // 2 AS mid FROM d),
    lab AS (SELECT cohort, t, vc, hb < span.mid AS is_ref
            FROM d CROSS JOIN span),
    counts AS (SELECT cohort, t, vc,
         CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS cr,
         CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS cc
       FROM lab GROUP BY 1, 2, 3),
    cum AS (SELECT cohort, t, vc,
         CAST(sum(cr) OVER (PARTITION BY cohort, t ORDER BY vc) AS BIGINT)
           AS fr,
         CAST(sum(cc) OVER (PARTITION BY cohort, t ORDER BY vc) AS BIGINT)
           AS fc,
         CAST(sum(cr) OVER (PARTITION BY cohort, t) AS BIGINT) AS n_ref,
         CAST(sum(cc) OVER (PARTITION BY cohort, t) AS BIGINT) AS n_cur,
         CAST(lead(vc) OVER (PARTITION BY cohort, t ORDER BY vc) - vc
              AS BIGINT) AS gap,
         CAST(max(vc) OVER (PARTITION BY cohort, t)
              - min(vc) OVER (PARTITION BY cohort, t) AS BIGINT) AS spn
       FROM counts),
    agg AS (SELECT cohort, t, any_value(n_ref) AS n_ref,
         any_value(n_cur) AS n_cur, any_value(spn) AS spn,
         CAST(sum(abs(fr * n_cur - fc * n_ref) * gap) AS BIGINT) AS s
       FROM cum WHERE gap IS NOT NULL GROUP BY cohort, t)
    SELECT cohort, t AS event_type, n_ref, n_cur,
       round(CAST(s AS DOUBLE)
             / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE) * 100.0), 6)
         AS w1_value,
       round(CAST(s AS DOUBLE)
             / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)
                * CAST(spn AS DOUBLE)), 6) AS w1_norm,
       round(CAST(s AS DOUBLE)
             / (CAST(n_ref AS DOUBLE) * CAST(n_cur AS DOUBLE)
                * CAST(spn AS DOUBLE)), 6) > 0.1 AS drift_flag
    FROM agg WHERE n_ref > 0 AND n_cur > 0 AND spn > 0
    ORDER BY cohort, event_type""",
)
def events_wasserstein_drift_by_segment(spark, sf_dir):
    """Per-SEGMENT exact 1-Wasserstein drift (VERDICT r10 #7),
    completing the by-segment drift pair next to the KS twin: W1 runs
    independently per (cohort = user_id %% 4, event_type) — ECDFs,
    totals, and the normalizing domain span are segment-local, while
    the ref/cur calendar midpoint stays GLOBAL so every segment is
    compared over the same two time windows. Same int64 ECDF-integral
    exactness as events_wasserstein_drift (integer numerators summed
    in any order, one division at the end); int64 headroom shrinks by
    nothing — the products are per-(cohort, type), each smaller than
    the global pair's. Single-segment reduction to the global query is
    differential-tested."""
    e = table(spark, sf_dir, "events").withColumn(
        "cohort", F.col("user_id") % 4
    )
    from ..analytics import stattests

    return stattests.wasserstein_drift(e, seg_col="cohort")


@register(
    "dedup_exact_cross_source",
    f"""WITH per AS (SELECT
              md5(array_to_string(list_sort({DTOKS}), ' ')) AS h,
              source AS s, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2),
    cells AS (SELECT a.s AS source_a, b.s AS source_b,
          CASE WHEN a.s = b.s THEN (a.n * (a.n - 1)) // 2
               ELSE a.n * b.n END AS pc,
          CASE WHEN a.s < b.s OR a.n >= 2 THEN 1 ELSE 0 END AS sc
        FROM per a JOIN per b ON a.h = b.h AND a.s <= b.s)
    SELECT source_a, source_b,
       CAST(sum(pc) AS BIGINT) AS dup_pairs,
       CAST(sum(sc) AS BIGINT) AS shared_contents
    FROM cells GROUP BY 1, 2
    HAVING sum(pc) > 0
    ORDER BY 1, 2""",
)
def dedup_exact_cross_source(spark, sf_dir):
    """Exact-duplicate contamination matrix across sources: which
    source PAIRS share canonically-identical documents (sorted
    distinct lowercase token set — byte equality is vacuous on this
    fixture: zero byte-identical dups below sf0.1), with closed-form
    int64 pair counts (n_a*n_b cross, C(n,2) within) — no doc-level
    pair enumeration, one content-hash shuffle, per-hash frames
    bounded by |sources|. The curation read dedup_rate_by_source
    can't give: a twice-ingested crawl is one hot off-diagonal cell;
    boilerplate is a dense row. Named _exact_ because
    dedup_cross_source_matrix (queries/dedup.py) already holds the
    MinHash-tier rollup of the same matrix."""
    return dedup.exact_cross_source_matrix(table(spark, sf_dir, "documents"))


def _src_containment_sql() -> str:
    from .dedup import _mh_pairs_parts

    ctes, select = _mh_pairs_parts()
    return f"""WITH {ctes},
    pairs AS ({select}),
    lab AS (SELECT p.doc_a, p.doc_b, da.source AS sa, db.source AS sb
            FROM pairs p JOIN documents da ON da.doc_id = p.doc_a
                         JOIN documents db ON db.doc_id = p.doc_b),
    directed AS (SELECT doc_a AS doc, sa AS source_a, sb AS source_b FROM lab
                 UNION SELECT doc_b, sb, sa FROM lab),
    contained AS (SELECT source_a, source_b,
                    CAST(count(*) AS BIGINT) AS docs_contained
                  FROM directed GROUP BY 1, 2),
    totals AS (SELECT source AS source_a, CAST(count(*) AS BIGINT) AS docs_total
               FROM documents GROUP BY 1)
    SELECT c.source_a, c.source_b, c.docs_contained, t.docs_total,
       round(CAST(c.docs_contained AS DOUBLE) / CAST(t.docs_total AS DOUBLE), 6)
         AS containment
    FROM contained c JOIN totals t ON t.source_a = c.source_a
    ORDER BY 1, 2"""


@register("dedup_source_containment", _src_containment_sql())
def dedup_source_containment(spark, sf_dir):
    """DIRECTIONAL near-dup containment between sources (the
    asymmetric complement of dedup_minhash_cross_source): per ordered
    (source_a -> source_b), how many and what fraction of source_a's
    docs have >= 1 MinHash candidate partner in source_b. A mirror is
    ~100% contained in its origin, never vice versa — the read that
    decides DROP-the-source vs dedup-the-union. Distinct
    (doc, other_source) so prolific partners count once; totals join
    is a |sources|-row broadcast."""
    return dedup.source_containment(table(spark, sf_dir, "documents"))


def _psi_by_segment_sql() -> str:
    from .round9 import _psi_bounds_sql

    return f"""WITH c AS (SELECT user_id % 4 AS cohort, event_type,
           CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc
        FROM events),
    d AS (SELECT * FROM c WHERE vc IS NOT NULL),
    span AS (SELECT (min(hb) + max(hb) + 1) // 2 AS mid FROM d),
    lab AS (SELECT cohort, event_type, vc, hb < span.mid AS is_ref
            FROM d CROSS JOIN span),
    refq AS (SELECT cohort, event_type,
               list_sort(list(CAST(vc AS DOUBLE))) AS arr
             FROM lab WHERE is_ref GROUP BY 1, 2),
    bounds AS (SELECT cohort, event_type, {_psi_bounds_sql()} AS bs FROM refq),
    assigned AS (SELECT l.cohort, l.event_type, l.is_ref,
                   1 + len(list_filter(b.bs, x -> CAST(l.vc AS DOUBLE) > x))
                     AS bkt
                 FROM lab l JOIN bounds b ON b.event_type = l.event_type
                  AND b.cohort = l.cohort),
    counts AS (SELECT cohort, event_type, bkt,
                 CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                   AS c_ref,
                 CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
                   AS c_cur
               FROM assigned GROUP BY 1, 2, 3),
    tot AS (SELECT cohort, event_type, CAST(sum(c_ref) AS BIGINT) AS n_ref,
                   CAST(sum(c_cur) AS BIGINT) AS n_cur
            FROM counts GROUP BY 1, 2),
    terms AS (SELECT c2.cohort, c2.event_type, t.n_ref, t.n_cur,
                CAST(floor(
                  (CAST(c2.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + 10 AS DOUBLE)
                   - CAST(c2.c_ref + 1 AS DOUBLE) / CAST(t.n_ref + 10 AS DOUBLE))
                  * ln((CAST(c2.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + 10 AS DOUBLE))
                       / (CAST(c2.c_ref + 1 AS DOUBLE) / CAST(t.n_ref + 10 AS DOUBLE)))
                  * 1000000000.0 + 0.5) AS BIGINT) AS term_u
              FROM counts c2 JOIN tot t ON t.event_type = c2.event_type
               AND t.cohort = c2.cohort)
    SELECT cohort, event_type, any_value(n_ref) AS n_ref,
       any_value(n_cur) AS n_cur,
       round(CAST(sum(term_u) AS BIGINT) / 1000000000.0, 6) AS psi,
       round(CAST(sum(term_u) AS BIGINT) / 1000000000.0, 6) > 0.2
         AS drift_flag
    FROM terms GROUP BY 1, 2
    ORDER BY cohort, event_type"""


@register("events_psi_drift_by_segment", _psi_by_segment_sql())
def events_psi_drift_by_segment(spark, sf_dir):
    """Per-SEGMENT PSI — completes the by-segment drift TRIPLE (PSI =
    binned mass moved, KS = worst ECDF gap, W1 = distance moved in
    value units; all three now exist at both grains). Reference
    deciles, counts, and Laplace-smoothed terms are per-(cohort =
    user_id %% 4, event_type) — a segment's own reference distribution
    is the right yardstick — while the calendar midpoint stays GLOBAL.
    Same three-layer cross-engine exactness as events_psi_drift
    (Spark-interpolation decile bounds rounded half-away-6 on both
    sides, pure value>bound bucket assignment, int64 nano-unit term
    quantization). Single-segment reduction differential-tested."""
    from .round9 import psi_drift

    e = table(spark, sf_dir, "events").withColumn(
        "cohort", F.col("user_id") % 4
    )
    return psi_drift(e, seg_col="cohort")


_T2S = "array_to_string(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''), ' ')"
_T3S = f"lower({_T2S})"
_T4S = f"array_to_string(list_sort(string_split({_T3S}, ' ')), ' ')"
_T5S = f"array_to_string(list_sort(list_distinct(string_split({_T3S}, ' '))), ' ')"


@register(
    "dedup_canonicalization_curve",
    f"""WITH e AS (
      SELECT 1 AS tier_rank, 'raw' AS tier, md5(text) AS h FROM documents
      UNION ALL
      SELECT 2, 'whitespace', md5({_T2S}) FROM documents
      UNION ALL
      SELECT 3, 'lowercase', md5({_T3S}) FROM documents
      UNION ALL
      SELECT 4, 'token_multiset', md5({_T4S}) FROM documents
      UNION ALL
      SELECT 5, 'token_set', md5({_T5S}) FROM documents),
    pc AS (SELECT tier_rank, tier, h, CAST(count(*) AS BIGINT) AS n
           FROM e GROUP BY 1, 2, 3)
    SELECT CAST(tier_rank AS BIGINT) AS tier_rank, tier,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_distinct_contents,
       CAST(sum(n) - count(*) AS BIGINT) AS n_dup_docs,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
       CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS dup_pairs
    FROM pc GROUP BY 1, 2
    ORDER BY tier_rank""",
)
def dedup_canonicalization_curve(spark, sf_dir):
    """Dedup normalization tuning curve: dup mass surfaced per
    cumulative canonicalization tier (raw -> whitespace -> lowercase
    -> token multiset -> token set). Monotone by construction (each
    tier factors through the previous — equivalence classes only
    coarsen); the tier where dup mass jumps identifies the corpus'
    duplication mode (byte mirrors vs re-serialized whitespace vs
    case-folds vs reshuffled boilerplate). One pass, one shuffle,
    5-row output."""
    return dedup.canonicalization_curve(table(spark, sf_dir, "documents"))
