"""Round-9 query registrations: per-segment survival quartiles,
PPJoin bigram mode, pack mixture observability.

Reference basis: the reference is a univariate anomaly-detection
library (/root/reference/tsod/detectors.py); these extend the repo's
survival/dedup/curation families along the axes VERDICT_r8 queued.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..pipeline import curate, dedup
from ..util import round_half_away6
from ._base import TOKS, _shingle_sql, register, table
from .round8 import km_segment_curve


@register(
    "orders_km_quartiles_by_segment",
    """WITH o AS (SELECT o.o_custkey, CAST(o.o_orderdate AS DATE) AS d,
                o.o_orderkey, c.c_mktsegment AS seg
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    mx AS (SELECT max(d) AS mxd FROM o),
    s AS (SELECT seg, o_custkey, d,
            lead(d) OVER (PARTITION BY o_custkey
                          ORDER BY d, o_orderkey) AS nxt
          FROM o),
    dur AS (
      SELECT seg, CAST(date_diff('day', d, nxt) AS BIGINT) AS dur,
             CAST(1 AS BIGINT) AS ev
      FROM s WHERE nxt IS NOT NULL
      UNION ALL
      SELECT seg, CAST(date_diff('day', d, mxd) AS BIGINT) AS dur,
             CAST(0 AS BIGINT) AS ev
      FROM s CROSS JOIN mx WHERE nxt IS NULL),
    g AS (SELECT seg, dur, CAST(sum(ev) AS BIGINT) AS de,
                 CAST(sum(1 - ev) AS BIGINT) AS ce
          FROM dur GROUP BY 1, 2),
    k AS (SELECT *,
            CAST(sum(de + ce) OVER (PARTITION BY seg) AS BIGINT)
              - coalesce(CAST(sum(de + ce) OVER
                  (PARTITION BY seg ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS BIGINT), CAST(0 AS BIGINT)) AS nr
          FROM g),
    l AS (SELECT *,
            CASE WHEN de = 0 THEN CAST(0 AS DOUBLE)
                 WHEN de < nr THEN ln(CAST(nr - de AS DOUBLE)
                                      / CAST(nr AS DOUBLE)) END AS lt,
            CASE WHEN de >= nr THEN 1 ELSE 0 END AS dead
          FROM k),
    curve AS (SELECT seg, dur,
            CASE WHEN CAST(sum(dead) OVER (PARTITION BY seg ORDER BY dur)
                      AS BIGINT) > 0
                 THEN CAST(0 AS DOUBLE)
                 ELSE round(exp(sum(lt) OVER (PARTITION BY seg
                                              ORDER BY dur)), 6)
            END AS survival
          FROM l),
    segs AS (SELECT DISTINCT seg FROM o),
    grid AS (SELECT s2.seg, g2.level_pct
             FROM segs s2 CROSS JOIN
                  (SELECT unnest([25, 50, 75]) AS level_pct) g2),
    hit AS (SELECT g2.seg, g2.level_pct, min(c.dur) AS dur_days
            FROM curve c JOIN grid g2
              ON c.seg = g2.seg
             AND c.survival <= 1.0 - CAST(g2.level_pct AS DOUBLE) / 100.0
            GROUP BY 1, 2)
    SELECT g2.seg AS c_mktsegment,
       CAST(g2.level_pct AS BIGINT) AS level_pct,
       CAST(h.dur_days AS BIGINT) AS dur_days,
       c.survival AS survival_at
    FROM grid g2
    LEFT JOIN hit h ON h.seg = g2.seg AND h.level_pct = g2.level_pct
    LEFT JOIN curve c ON c.seg = g2.seg AND c.dur = h.dur_days
    ORDER BY c_mktsegment, level_pct""",
)
def orders_km_quartiles_by_segment(spark, sf_dir):
    """Censoring-corrected reorder-time quartiles PER market segment —
    the table a churn review actually reads: "BUILDING's median
    reorder gap vs MACHINERY's, 25th/75th alongside", each the
    smallest duration where that segment's Kaplan-Meier curve drops to
    <= 0.75 / 0.50 / 0.25, with NULLs (not missing rows) where a
    segment's curve never reaches a level — every (segment, level)
    cell is present, so a dashboard diff never mistakes "not reached"
    for "not computed".  Shares the per-segment KM curve stage with
    orders_km_segment_summary (``km_segment_curve`` — one candidate
    plan, windows all partitioned by segment); the curve's survival is
    round(6)-pinned BEFORE the threshold compare (the km_survival
    discipline) so boundary hits are engine-exact.  After the curve,
    every stage is bounded by |segments| x 3 grid rows and the
    duration grid — never the orders fact table."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    curve = km_segment_curve(orders, customer).select(
        "__seg",
        F.col("dur").alias("dur_days"),
        F.round("__surv", 6).alias("survival"),
    )
    grid_arr = F.array(*[F.lit(v).cast("long") for v in (25, 50, 75)])
    segs = curve.select("__seg").distinct()
    grid = segs.select("__seg", F.explode(grid_arr).alias("level_pct"))
    hits = (
        curve.select(
            "__seg",
            F.explode(grid_arr).alias("level_pct"),
            "dur_days",
            "survival",
        )
        .where(
            F.col("survival")
            <= F.lit(1.0) - F.col("level_pct").cast("double") / F.lit(100.0)
        )
        .groupBy("__seg", "level_pct")
        .agg(F.min(F.struct("dur_days", "survival")).alias("__m"))
    )
    return (
        grid.join(hits, ["__seg", "level_pct"], "left")
        .select(
            F.col("__seg").alias("c_mktsegment"),
            "level_pct",
            F.col("__m.dur_days").alias("dur_days"),
            F.col("__m.survival").alias("survival_at"),
        )
        .orderBy("c_mktsegment", "level_pct")
    )


_BG = _shingle_sql("toks0", 2)


@register(
    "dedup_ppjoin_bigram_pairs",
    f"""WITH t AS (SELECT doc_id, source AS blk, {TOKS} AS toks0
                   FROM documents),
    d AS (SELECT doc_id, blk, {_BG} AS toks FROM t WHERE len({_BG}) > 0),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_filter(a.toks, x -> list_contains(b.toks, x)))
                  AS BIGINT) AS inter,
             CAST(len(a.toks) + len(b.toks) AS BIGINT) AS tot
          FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
       round(CAST(inter AS DOUBLE) / CAST(tot - inter AS DOUBLE), 6) AS jaccard
    FROM p WHERE 100 * inter >= 80 * (tot - inter)
    ORDER BY doc_a, doc_b""",
)
def dedup_ppjoin_bigram_pairs(spark, sf_dir):
    """PPJoin in BIGRAM mode (J >= 0.80 over distinct word 2-shingles,
    in-block): the order-sensitive tier of the exact-threshold family —
    unigram Jaccard cannot tell "the dog bit the man" from "the man
    bit the dog", bigrams can, so this is the screen for templated
    rewrites where vocabulary survives but phrasing changed. The
    shingle space is |vocab|^2, so document frequencies are far more
    skewed than unigrams' — exactly the regime prefix filtering is
    for: the df-asc order packs each doc's prefix with its RAREST
    bigrams and the boilerplate bigrams ("of the", "in a") that would
    fan out the plain inverted index never generate candidates. Same
    int64-exact bounds and output-sensitive verification as
    dedup_ppjoin_pairs; oracle = the plain exact-Jaccard filter (the
    prefix strategy must be result-invariant in this mode too)."""
    return dedup.ppjoin_pairs(
        table(spark, sf_dir, "documents"), thr_pct=80, shingle_n=2
    )


@register(
    "doc_pack_mixture_stats",
    f"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
                   FROM documents GROUP BY source),
    t0 AS (SELECT sum(ns) AS n,
                  sum(CAST(round(sqrt(ns) * 1000000) AS BIGINT)) AS ssq_u
           FROM c),
    r AS (SELECT source,
                 CAST(floor(least(1.0, (0.5 * n)
                      / ((ssq_u / 1000000.0) * sqrt(ns)))
                      * 4294967296.0) AS BIGINT) AS thr
          FROM c, t0),
    kept AS (SELECT d.doc_id, d.source, d.text
             FROM documents d JOIN r ON d.source = r.source
             WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                   < r.thr),
    tk AS (SELECT doc_id, source AS part,
                  CAST(len({TOKS}) AS BIGINT) AS n_tokens FROM kept),
    cc AS (SELECT *, coalesce(sum(n_tokens) OVER (
             PARTITION BY part ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM tk),
    p AS (SELECT part, n_tokens,
            CASE WHEN n_tokens > 0
                 THEN floor((cb + n_tokens - 1) / 256) > floor(cb / 256)
                 ELSE FALSE END AS st
          FROM cc),
    g AS (SELECT part AS source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
            CAST(sum(CASE WHEN st THEN 1 ELSE 0 END) AS BIGINT)
              AS n_straddlers
          FROM p GROUP BY 1),
    tt AS (SELECT sum(n_tokens) AS tot FROM g)
    SELECT g.source, g.n_docs, g.n_tokens,
       CAST((g.n_tokens + 255) // 256 AS BIGINT) AS n_sequences,
       g.n_straddlers,
       round(CAST(g.n_straddlers AS DOUBLE) / CAST(g.n_docs AS DOUBLE), 6)
         AS straddle_frac,
       round(CAST(g.n_tokens AS DOUBLE) / CAST(tt.tot AS DOUBLE), 6)
         AS token_share
    FROM g CROSS JOIN tt ORDER BY source""",
)
def doc_pack_mixture_stats(spark, sf_dir):
    """Mixture-then-pack observability: apply the temperature-α=0.5
    source mixture (deterministic content-hash Bernoulli, exact int64
    thresholds — the doc_mixture_sample engine), pack the SURVIVORS
    per source (the doc_pack_sequences engine), and report the table a
    batch-prep review reads before training: per source, kept docs,
    kept tokens, how many 256-token sequences that packs into, how
    many documents straddle a sequence boundary (get split across
    training examples — the loss-masking hazard), and each source's
    share of the post-mixture token budget.  This is the check that
    the mixture's sqrt-temperature actually rebalanced the token
    budget and didn't silently hand one source all the split docs.
    Composition stays one lazy plan: mixture thresholds broadcast onto
    the corpus, packing windows partition per source, and every stage
    after the per-source aggregate is bounded by |sources| rows.  The
    two ratios round half-away (the DuckDB double algorithm); all else
    is exact int64."""
    docs = table(spark, sf_dir, "documents")
    kept_ids = curate.mixture_sample(docs).select("doc_id")
    kept = docs.join(kept_ids, "doc_id")
    packed = curate.pack_sequences(kept)
    g = packed.groupBy(F.col("part").alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(F.col("straddles_boundary").cast("long"))
        .cast("long")
        .alias("n_straddlers"),
    )
    wa = Window.partitionBy()
    tot = F.sum("n_tokens").over(wa)
    return g.select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr("(n_tokens + 255) div 256").cast("long").alias("n_sequences"),
        "n_straddlers",
        round_half_away6(
            F.col("n_straddlers").cast("double") / F.col("n_docs").cast("double")
        ).alias("straddle_frac"),
        round_half_away6(F.col("n_tokens").cast("double") / tot.cast("double")).alias(
            "token_share"
        ),
    ).orderBy("source")


@register(
    "dedup_ppjoin_incremental",
    f"""WITH d AS (SELECT doc_id, source AS blk, {TOKS} AS toks0
                   FROM documents),
    dd AS (SELECT doc_id, blk, list_distinct(toks0) AS toks FROM d
           WHERE len(toks0) > 0),
    b AS (SELECT * FROM dd WHERE doc_id % 7 = 0),
    c AS (SELECT * FROM dd WHERE doc_id % 7 <> 0),
    p AS (SELECT b.doc_id AS doc_id, c.doc_id AS match_id,
             CAST(len(list_filter(b.toks, x -> list_contains(c.toks, x)))
                  AS BIGINT) AS inter,
             CAST(len(b.toks) + len(c.toks) AS BIGINT) AS tot
          FROM b JOIN c ON b.blk = c.blk)
    SELECT doc_id, match_id,
       round(CAST(inter AS DOUBLE) / CAST(tot - inter AS DOUBLE), 6) AS jaccard
    FROM p WHERE 100 * inter >= 90 * (tot - inter)
    ORDER BY doc_id, match_id""",
)
def dedup_ppjoin_incremental(spark, sf_dir):
    """Continuous-ingest EXACT near-dup screen: each doc of the
    arriving ~14% batch (doc_id % 7 = 0; the fixture generator places
    near-dups at doc_id offsets that are multiples of 20, so the usual
    % 20 split never crosses batch/corpus — 7 is coprime and yields a
    non-vacuous check)
    against the standing 95% corpus, returning every in-block corpus
    match at Jaccard >= 0.90 with its exact score — the
    guarantee-grade ingest gate next to dedup_incremental (MinHash,
    has false negatives by construction) and doc_winnow_screen (span
    collisions). One-SIDED prefix filter: only the batch docs' rarest
    grams (by CORPUS document frequency, unseen grams rarest) probe
    the corpus — sound because J >= t already forces an overlap
    >= ceil(t*|batch doc|), which cannot hide entirely in the doc's
    suffix. The corpus leg is one slim df-index groupBy (amortized in
    production: the index is maintained incrementally) plus one probe
    scan against the BROADCAST batch prefix; nothing corpus-sized ever
    shuffles a gram array. Oracle = brute-force batch x corpus exact
    Jaccard: the prefix probe must be result-invariant."""
    docs = table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    return dedup.ppjoin_screen_new_docs(corpus, batch, thr_pct=90, shingle_n=1)


@register(
    "doc_quality_budget_curve",
    f"""WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
             CAST(len(list_filter(toks, x -> x IN
                 ('the', 'a', 'an', 'of', 'and', 'to', 'in', 'is', 'it',
                  'that'))) AS BIGINT) AS n_stop
          FROM t WHERE len(toks) > 0),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                   CAST(sum(n_words) AS BIGINT) AS nt FROM s),
    grid AS (SELECT unnest([0, 10, 20, 30, 40, 50, 60, 70, 80, 90, 100])
                    AS thr_milli),
    hits AS (SELECT g.thr_milli,
               CAST(count(*) AS BIGINT) AS n_docs_kept,
               CAST(sum(s.n_words) AS BIGINT) AS n_tokens_kept
             FROM s JOIN grid g ON 1000 * s.n_stop >= g.thr_milli * s.n_words
             GROUP BY 1)
    SELECT CAST(g.thr_milli AS BIGINT) AS thr_milli,
       CAST(coalesce(h.n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
       CAST(coalesce(h.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
       round(CAST(coalesce(h.n_docs_kept, 0) AS DOUBLE)
             / CAST(tot.nd AS DOUBLE), 6) AS doc_share,
       round(CAST(coalesce(h.n_tokens_kept, 0) AS DOUBLE)
             / CAST(tot.nt AS DOUBLE), 6) AS token_share
    FROM grid g CROSS JOIN tot
    LEFT JOIN hits h ON h.thr_milli = g.thr_milli
    ORDER BY thr_milli""",
)
def doc_quality_budget_curve(spark, sf_dir):
    """Quality-knob budget curve — the dedup_threshold_curve of the
    QUALITY axis: for each minimum-stopword-ratio cut (0‰..100‰ in
    10‰ steps; low stopword density is the classic non-prose signal a
    Gopher-style filter drops on), how many documents and how many
    tokens survive, as counts and corpus shares — the "what does
    tightening the quality filter cost in training tokens" table an
    operator reads BEFORE re-running the curation pipeline per
    candidate setting.  The threshold compare is pure int64
    (``1000 * n_stop >= thr_milli * n_words``) — no float ratio is
    ever materialized, so the curve is engine-exact everywhere
    including boundary docs; empty-token docs are excluded from both
    numerator and denominator (they are dropped at any setting).
    Plan: one corpus scan computes (n_words, n_stop) map-side, an 11x
    grid explode over the TINY per-doc stat frame (never the text),
    one groupBy, and a left join back onto the grid so zero-survivor
    thresholds still report 0."""
    return curate.quality_budget_curve(table(spark, sf_dir, "documents"))


@register(
    "ts_conformal_curve",
    """WITH c AS (SELECT user_id, date_trunc('hour', ts) AS b,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    p AS (SELECT user_id, b, CAST(sum(vc) AS BIGINT) AS x
          FROM c WHERE vc IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT a.user_id,
            CAST(epoch_us(a.b) // 3600000000 AS BIGINT) AS hb,
            abs(a.x - f.x) AS resid
          FROM p a JOIN p f
            ON f.user_id = a.user_id AND f.b = a.b - INTERVAL 24 HOUR),
    cal AS (SELECT user_id, resid,
              CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY resid, hb) AS BIGINT) AS rk,
              CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_cal
            FROM r WHERE hb % 5 <> 0),
    grid AS (SELECT unnest([10, 20, 30, 40, 50]) AS alpha_pct),
    q AS (SELECT c2.user_id, CAST(g.alpha_pct AS BIGINT) AS alpha_pct,
                 c2.n_cal, c2.resid AS qhat_cents
          FROM cal c2 JOIN grid g
            ON c2.rk = ((c2.n_cal + 1) * (100 - g.alpha_pct) + 99) // 100
           AND ((c2.n_cal + 1) * (100 - g.alpha_pct) + 99) // 100 <= c2.n_cal),
    t AS (SELECT q.user_id, q.alpha_pct,
            CAST(count(*) AS BIGINT) AS n_test,
            CAST(sum(CASE WHEN r.resid <= q.qhat_cents THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_covered
          FROM r JOIN q USING (user_id) WHERE r.hb % 5 = 0
          GROUP BY q.user_id, q.alpha_pct, q.qhat_cents),
    o AS (SELECT q.user_id, q.alpha_pct, q.n_cal, q.qhat_cents,
       coalesce(t.n_test, CAST(0 AS BIGINT)) AS n_test,
       coalesce(t.n_test, CAST(0 AS BIGINT))
         - coalesce(t.n_covered, CAST(0 AS BIGINT)) AS n_flagged,
       CASE WHEN t.n_test > 0
            THEN round(CAST(t.n_covered AS DOUBLE)
                       / CAST(t.n_test AS DOUBLE), 6) END AS coverage
    FROM q LEFT JOIN t ON t.user_id = q.user_id
                      AND t.alpha_pct = q.alpha_pct)
    SELECT * FROM o ORDER BY user_id, alpha_pct""",
)
def ts_conformal_curve(spark, sf_dir):
    """Conformal CALIBRATION curve — the dedup_threshold_curve of the
    miscoverage knob: for each alpha in {0.10..0.50}, the per-series
    exact conformal quantile (rank ``ceil((n_cal+1)(1-alpha))`` as the
    int64 order statistic ``((n_cal+1)(100-a)+99) div 100``), the
    held-out flag count, and the empirical coverage — the table that
    shows WHERE the finite-sample guarantee starts paying for data: a
    series certifies a given alpha only when the rank fits inside its
    calibration set (alpha=0.1 needs n_cal >= 9; tighter alphas
    certify earlier), and refused (series, alpha) cells emit NO row on
    either engine.  At alpha=0.2 this reproduces ts_conformal_snaive
    exactly (the generalized rank reduces to ((n+1)*8+9) div 10,
    pinned by test).  One shared cached residual frame
    (round8.snaive_residuals — same stage conformal_snaive splits), a
    5x grid join against the ranked calibration frame (bounded by
    residual rows), one test-side aggregate per (series, alpha)."""
    return conformal_curve(table(spark, sf_dir, "events"))


def conformal_curve(e):
    """Batch conformal calibration curve over an events frame — the
    body of ts_conformal_curve, exposed so the streaming twin's
    batch-equivalence test (tests/test_streaming.py) can run it on a
    closed-bucket subset."""
    from .round8 import snaive_residuals

    r = snaive_residuals(e)
    cal = r.where(F.col("__hb") % 5 != 0)
    wn = Window.partitionBy("user_id")
    wr = Window.partitionBy("user_id").orderBy("__resid", "__hb")
    ranked = cal.select(
        "user_id",
        "__resid",
        F.row_number().over(wr).cast("long").alias("__rk"),
        F.count(F.lit(1)).over(wn).cast("long").alias("n_cal"),
    )
    grid_arr = F.array(*[F.lit(v).cast("long") for v in (10, 20, 30, 40, 50)])
    k = F.expr("((n_cal + 1) * (100 - alpha_pct) + 99) div 100")
    q = (
        ranked.select(
            "user_id",
            "__resid",
            "__rk",
            "n_cal",
            F.explode(grid_arr).alias("alpha_pct"),
        )
        .where((F.col("__rk") == k) & (k <= F.col("n_cal")))
        .select(
            "user_id", "alpha_pct", "n_cal", F.col("__resid").alias("qhat_cents")
        )
    )
    t = (
        r.where(F.col("__hb") % 5 == 0)
        .join(q.select("user_id", "alpha_pct", "qhat_cents"), "user_id")
        .groupBy("user_id", "alpha_pct")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("__resid") <= F.col("qhat_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("__cov"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        q.join(t, ["user_id", "alpha_pct"], "left")
        .select(
            "user_id",
            "alpha_pct",
            "n_cal",
            "qhat_cents",
            F.coalesce(F.col("n_test"), zero).alias("n_test"),
            (
                F.coalesce(F.col("n_test"), zero)
                - F.coalesce(F.col("__cov"), zero)
            ).alias("n_flagged"),
            F.when(
                F.col("n_test") > 0,
                F.round(
                    F.col("__cov").cast("double") / F.col("n_test").cast("double"),
                    6,
                ),
            ).alias("coverage"),
        )
        .orderBy("user_id", "alpha_pct")
    )


@register(
    "orders_nelson_aalen_by_segment",
    """WITH o AS (SELECT o.o_custkey, CAST(o.o_orderdate AS DATE) AS d,
                o.o_orderkey, c.c_mktsegment AS seg
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    mx AS (SELECT max(d) AS mxd FROM o),
    s AS (SELECT seg, o_custkey, d,
            lead(d) OVER (PARTITION BY o_custkey
                          ORDER BY d, o_orderkey) AS nxt
          FROM o),
    dur AS (
      SELECT seg, CAST(date_diff('day', d, nxt) AS BIGINT) AS dur,
             CAST(1 AS BIGINT) AS ev
      FROM s WHERE nxt IS NOT NULL
      UNION ALL
      SELECT seg, CAST(date_diff('day', d, mxd) AS BIGINT) AS dur,
             CAST(0 AS BIGINT) AS ev
      FROM s CROSS JOIN mx WHERE nxt IS NULL),
    g AS (SELECT seg, dur, CAST(sum(ev) AS BIGINT) AS de,
                 CAST(sum(1 - ev) AS BIGINT) AS ce
          FROM dur GROUP BY 1, 2),
    k AS (SELECT *,
            CAST(sum(de + ce) OVER (PARTITION BY seg) AS BIGINT)
              - coalesce(CAST(sum(de + ce) OVER
                  (PARTITION BY seg ORDER BY dur
                   ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS BIGINT), CAST(0 AS BIGINT)) AS nr
          FROM g),
    na AS (SELECT seg, dur, nr, de,
            sum(CASE WHEN de > 0
                     THEN CAST(de AS DOUBLE) / CAST(nr AS DOUBLE)
                     ELSE CAST(0 AS DOUBLE) END)
              OVER (PARTITION BY seg ORDER BY dur) AS ch,
            sum(CASE WHEN de > 0
                     THEN CAST(de AS DOUBLE)
                          / (CAST(nr AS DOUBLE) * CAST(nr AS DOUBLE))
                     ELSE CAST(0 AS DOUBLE) END)
              OVER (PARTITION BY seg ORDER BY dur) AS cv
          FROM k)
    SELECT seg AS c_mktsegment, dur AS dur_days, nr AS n_risk,
       de AS d_event,
       round(ch, 6) AS na_cumhaz,
       round(sqrt(cv), 6) AS na_se,
       round(exp(-ch), 6) AS survival_fh
    FROM na ORDER BY c_mktsegment, dur_days""",
)
def orders_nelson_aalen_by_segment(spark, sf_dir):
    """Nelson-Aalen cumulative hazard PER market segment — the
    segment-resolved twin of orders_nelson_aalen, completing the
    per-segment survival triple (KM summary, KM quartiles, N-A): the
    curve whose SLOPE differences between segments are the "BUILDING
    reorders are accelerating, MACHINERY's flat" read, with the
    Poisson standard error and the Fleming-Harrington survival
    exp(-H).  Shares the per-segment duration-grid risk table
    (``km_segment_risk``) with the other two — one candidate plan
    family, all windows partitioned by segment, everything after the
    per-customer lead window bounded by |segments| x duration grid.
    Hazard increments are single exact divisions d/n and d/n^2 with
    identical association in both engines; only the final
    sqrt/exp/round are transcendental."""
    from .round8 import km_segment_risk

    k = km_segment_risk(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    )
    de, nr = F.col("__de"), F.col("__nr")
    hz = F.when(de > 0, de.cast("double") / nr.cast("double")).otherwise(
        F.lit(0.0)
    )
    hv = F.when(
        de > 0, de.cast("double") / (nr.cast("double") * nr.cast("double"))
    ).otherwise(F.lit(0.0))
    w_cum = Window.partitionBy("__seg").orderBy("dur")
    h = k.withColumn("__hz", hz).withColumn("__hv", hv)
    return h.select(
        F.col("__seg").alias("c_mktsegment"),
        F.col("dur").alias("dur_days"),
        F.col("__nr").alias("n_risk"),
        F.col("__de").alias("d_event"),
        F.round(F.sum("__hz").over(w_cum), 6).alias("na_cumhaz"),
        F.round(F.sqrt(F.sum("__hv").over(w_cum)), 6).alias("na_se"),
        F.round(F.exp(-F.sum("__hz").over(w_cum)), 6).alias("survival_fh"),
    ).orderBy("c_mktsegment", "dur_days")


@register(
    "orders_km_logrank",
    """WITH o AS (SELECT o.o_custkey, CAST(o.o_orderdate AS DATE) AS d,
                o.o_orderkey, c.c_mktsegment AS seg
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
    mx AS (SELECT max(d) AS mxd FROM o),
    s AS (SELECT seg, o_custkey, d,
            lead(d) OVER (PARTITION BY o_custkey
                          ORDER BY d, o_orderkey) AS nxt
          FROM o),
    subj AS (
      SELECT seg, CAST(date_diff('day', d, nxt) AS BIGINT) AS dur,
             CAST(1 AS BIGINT) AS ev
      FROM s WHERE nxt IS NOT NULL
      UNION ALL
      SELECT seg, CAST(date_diff('day', d, mxd) AS BIGINT) AS dur,
             CAST(0 AS BIGINT) AS ev
      FROM s CROSS JOIN mx WHERE nxt IS NULL),
    pool AS (SELECT dur, CAST(sum(ev) AS BIGINT) AS dt,
                    CAST(count(*) AS BIGINT) AS cnt
             FROM subj GROUP BY dur),
    pool2 AS (SELECT dur, dt,
                CAST(sum(cnt) OVER (ORDER BY dur DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS nt
              FROM pool),
    evdur AS (SELECT dur, dt, nt FROM pool2 WHERE dt > 0),
    g AS (SELECT seg, dur, CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(ev) AS BIGINT) AS dg
          FROM subj GROUP BY 1, 2),
    segs AS (SELECT DISTINCT seg FROM subj),
    grid AS (SELECT s2.seg, p.dur FROM segs s2
             CROSS JOIN (SELECT dur FROM pool) p),
    atrisk AS (SELECT grid.seg, grid.dur,
                 coalesce(g.dg, CAST(0 AS BIGINT)) AS dg,
                 CAST(sum(coalesce(g.cnt, 0)) OVER (
                      PARTITION BY grid.seg ORDER BY grid.dur DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS BIGINT) AS ng
               FROM grid LEFT JOIN g
                 ON g.seg = grid.seg AND g.dur = grid.dur),
    cell AS (SELECT a.seg, a.dg, e.dt, e.nt, a.ng
             FROM atrisk a JOIN evdur e ON e.dur = a.dur),
    contrib AS (SELECT seg, CAST(sum(dg) AS BIGINT) AS observed,
                  CAST(sum(CAST(floor(CAST(dt AS DOUBLE)
                       * CAST(ng AS DOUBLE) / CAST(nt AS DOUBLE)
                       * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS exp_u
                FROM cell GROUP BY seg),
    tot AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_subj
            FROM subj GROUP BY seg)
    SELECT t.seg AS c_mktsegment, t.n_subj, c.observed,
       round(c.exp_u / 1000000.0, 6) AS expected,
       CASE WHEN c.exp_u > 0 THEN
         round((CAST(c.observed AS DOUBLE) - c.exp_u / 1000000.0)
               * (CAST(c.observed AS DOUBLE) - c.exp_u / 1000000.0)
               / (c.exp_u / 1000000.0), 6)
       ELSE NULL END AS chi_contrib
    FROM contrib c JOIN tot t ON t.seg = c.seg
    ORDER BY c_mktsegment""",
)
def orders_km_logrank(spark, sf_dir):
    """K-sample log-rank comparison across customer market segments —
    the hypothesis-test companion to the per-segment KM/Nelson-Aalen
    curves: per segment, observed reorder events O_g vs the expected
    count E_g = sum over pooled event times of d_t * n_g(t) / n(t)
    under the null that all segments share one hazard, plus the
    Peto-approximation chi-square contribution (O-E)^2/E (the full
    covariance-matrix form is deliberately not computed — the
    per-segment O/E table is the production read, and the
    approximation's sum is the standard screening statistic; a
    contribution > ~3.8 flags the segment driving the difference).

    All counts are int64; n_g(t) (at-risk in segment g at pooled
    event time t) comes from a per-segment REVERSE cumulative count
    over the (segments x pooled event durations) grid — bounded by
    |segments| x |duration grid|, never the orders table; expected
    sums divide identical doubles in identical order in both engines.
    Shares the subject frame construction with the km_segment family
    (same lead-window gap derivation and censoring-at-max-date
    contract)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    o = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("__seg"),
            "o_custkey",
            F.to_date("o_orderdate").alias("__d"),
            "o_orderkey",
        )
    )
    wc = Window.partitionBy("o_custkey").orderBy("__d", "o_orderkey")
    s = o.select(
        "__seg", "o_custkey", "__d", F.lead("__d").over(wc).alias("__nxt")
    )
    mx = o.agg(F.max("__d").alias("__mxd"))
    subj = (
        s.where(F.col("__nxt").isNotNull())
        .select(
            "__seg",
            F.datediff("__nxt", "__d").cast("long").alias("dur"),
            F.lit(1).cast("long").alias("__ev"),
        )
        .unionByName(
            s.where(F.col("__nxt").isNull())
            .crossJoin(F.broadcast(mx))
            .select(
                "__seg",
                F.datediff("__mxd", "__d").cast("long").alias("dur"),
                F.lit(0).cast("long").alias("__ev"),
            )
        )
    )
    # pooled risk table over distinct durations
    w_desc = Window.orderBy(F.desc("dur")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pool = (
        subj.groupBy("dur")
        .agg(
            F.sum("__ev").cast("long").alias("__dt"),
            F.count(F.lit(1)).cast("long").alias("__cnt"),
        )
        .withColumn("__nt", F.sum("__cnt").over(w_desc).cast("long"))
    )
    evdur = pool.where(F.col("__dt") > 0).select("dur", "__dt", "__nt")
    # per-(segment, duration) subject counts and events
    g = subj.groupBy("__seg", "dur").agg(
        F.count(F.lit(1)).cast("long").alias("__cnt"),
        F.sum("__ev").cast("long").alias("__dg"),
    )
    segs = subj.select("__seg").distinct()
    # (segments x ALL durations) grid so the reverse cumsum sees every
    # duration; then restrict to pooled EVENT durations for E
    alldur = pool.select("dur")
    grid = segs.crossJoin(alldur)
    w_seg_desc = (
        Window.partitionBy("__seg")
        .orderBy(F.desc("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    atrisk = (
        grid.join(g, ["__seg", "dur"], "left")
        .select(
            "__seg",
            "dur",
            F.coalesce(F.col("__cnt"), F.lit(0).cast("long")).alias("__cnt"),
            F.coalesce(F.col("__dg"), F.lit(0).cast("long")).alias("__dg"),
        )
        .withColumn("__ng", F.sum("__cnt").over(w_seg_desc).cast("long"))
    )
    cell = atrisk.join(evdur, "dur")
    # per-cell expected term quantized to int64 micro-units BEFORE the
    # sum (the mixture ssq_u discipline): float sums are association-
    # order sensitive and partial-aggregation order differs across
    # engines; an integer sum of identically-rounded terms is exact
    term_u = F.floor(
        F.col("__dt").cast("double")
        * F.col("__ng").cast("double")
        / F.col("__nt").cast("double")
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    contrib = cell.groupBy("__seg").agg(
        F.sum("__dg").cast("long").alias("observed"),
        F.sum(term_u).cast("long").alias("__exp_u"),
    )
    tot = subj.groupBy("__seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_subj")
    )
    expected = F.col("__exp_u") / F.lit(1000000.0)
    diff = F.col("observed").cast("double") - expected
    return (
        contrib.join(tot, "__seg")
        .select(
            F.col("__seg").alias("c_mktsegment"),
            "n_subj",
            "observed",
            F.round(expected, 6).alias("expected"),
            # E == 0 guard (ADVICE r9): a segment whose members are at
            # risk only outside the pooled event times has exp_u = 0;
            # (O-E)^2/E is undefined there and NaN/Inf render
            # differently across engines — emit NULL on both sides.
            F.when(
                F.col("__exp_u") > 0, F.round(diff * diff / expected, 6)
            ).alias("chi_contrib"),
        )
        .orderBy("c_mktsegment")
    )


def _psi_bounds_sql() -> str:
    from ._base import spark_quantile_sql

    parts = []
    for k in range(1, 10):
        expr = spark_quantile_sql("arr", k / 10.0)
        # rounded half-away to 6 decimals — the shared boundary both
        # engines compare against (bounds are nonnegative magnitudes
        # either sign; use the sign-safe form)
        parts.append(
            f"CASE WHEN {expr} >= 0 THEN floor({expr} * 1000000.0 + 0.5) / 1000000.0"
            f" ELSE -floor(-({expr}) * 1000000.0 + 0.5) / 1000000.0 END"
        )
    return "[" + ", ".join(parts) + "]"


@register(
    "events_psi_drift",
    f"""WITH c AS (SELECT event_type,
           CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc
        FROM events),
    d AS (SELECT * FROM c WHERE vc IS NOT NULL),
    span AS (SELECT (min(hb) + max(hb) + 1) // 2 AS mid FROM d),
    lab AS (SELECT event_type, vc, hb < span.mid AS is_ref
            FROM d CROSS JOIN span),
    refq AS (SELECT event_type,
               list_sort(list(CAST(vc AS DOUBLE))) AS arr
             FROM lab WHERE is_ref GROUP BY event_type),
    bounds AS (SELECT event_type, {_psi_bounds_sql()} AS bs FROM refq),
    assigned AS (SELECT l.event_type, l.is_ref,
                   1 + len(list_filter(b.bs, x -> CAST(l.vc AS DOUBLE) > x))
                     AS bkt
                 FROM lab l JOIN bounds b ON b.event_type = l.event_type),
    counts AS (SELECT event_type, bkt,
                 CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                   AS c_ref,
                 CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
                   AS c_cur
               FROM assigned GROUP BY 1, 2),
    tot AS (SELECT event_type, CAST(sum(c_ref) AS BIGINT) AS n_ref,
                   CAST(sum(c_cur) AS BIGINT) AS n_cur
            FROM counts GROUP BY 1),
    terms AS (SELECT c2.event_type, t.n_ref, t.n_cur,
                CAST(floor(
                  (CAST(c2.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + 10 AS DOUBLE)
                   - CAST(c2.c_ref + 1 AS DOUBLE) / CAST(t.n_ref + 10 AS DOUBLE))
                  * ln((CAST(c2.c_cur + 1 AS DOUBLE) / CAST(t.n_cur + 10 AS DOUBLE))
                       / (CAST(c2.c_ref + 1 AS DOUBLE) / CAST(t.n_ref + 10 AS DOUBLE)))
                  * 1000000000.0 + 0.5) AS BIGINT) AS term_u
              FROM counts c2 JOIN tot t ON t.event_type = c2.event_type)
    SELECT event_type, any_value(n_ref) AS n_ref, any_value(n_cur) AS n_cur,
       round(CAST(sum(term_u) AS BIGINT) / 1000000000.0, 6) AS psi,
       round(CAST(sum(term_u) AS BIGINT) / 1000000000.0, 6) > 0.2
         AS drift_flag
    FROM terms GROUP BY event_type
    ORDER BY event_type""",
)
def events_psi_drift(spark, sf_dir):
    """Population Stability Index per event type between the first and
    second halves of the time range — THE standard production drift
    monitor next to the KS test (events_ks_drift): bucket the metric
    by the REFERENCE period's deciles, then
    ``PSI = sum (q_i - p_i) * ln(q_i / p_i)`` with add-one (Laplace)
    smoothing so empty buckets stay defined (smoothing is part of the
    contract, documented — an unsmoothed PSI is infinite the moment a
    bucket empties, which is exactly when a monitor must not crash);
    > 0.2 is the conventional "investigate" flag.

    Cross-engine exactness, three layers: decile boundaries reproduce
    Spark's ``percentile`` interpolation bit-exactly on the oracle
    side (spark_quantile_sql) and are rounded half-away to 6 decimals
    on BOTH sides before any comparison; bucket assignment is a pure
    ``value > boundary`` count against those shared boundaries; and
    each PSI term is quantized to int64 nano-units BEFORE summing
    ((q-p) and ln(q/p) always share a sign, so terms are nonnegative
    and the floor(x*1e9+0.5) quantizer is safe) — the sum is an exact
    integer in any aggregation order.  Plan: one fact scan -> per-type
    hour-bucket split at the midpoint, one sorted-list percentile per
    type (bounded by |types|), broadcast bounds back, one counts
    aggregate — nothing beyond the counts frame is bigger than
    |types| x 10."""
    return psi_drift(table(spark, sf_dir, "events"))


def psi_drift(e, seg_col=None):
    """Batch PSI body over an arbitrary events frame (factored so the
    tied-decile stream-equivalence test can drive it on a synthetic
    corpus whose decile boundaries collapse — see
    tests/test_streaming.py).

    ``seg_col`` adds a segment to every key (VERDICT r10 #7 factoring,
    completing the by-segment drift TRIPLE next to the KS and W1
    twins): reference deciles, counts, and totals are all
    per-(segment, type) — a segment's own reference distribution is
    the right yardstick for its drift — while the ref/cur calendar
    midpoint stays GLOBAL (one split for the whole corpus). A
    single-segment corpus reduces EXACTLY to the global query
    (differential-tested)."""
    from ..expressions import nan_to_null

    keys = ([seg_col] if seg_col else []) + ["event_type"]
    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    d = e.select(
        *keys,
        F.expr("unix_micros(ts) div 3600000000").alias("__hb"),
        cents.alias("__vc"),
    ).where(F.col("__vc").isNotNull())
    span = d.agg(
        ((F.min("__hb") + F.max("__hb") + 1) / 2).cast("long").alias("__mid")
    )
    lab = d.crossJoin(F.broadcast(span)).select(
        *keys, "__vc", (F.col("__hb") < F.col("__mid")).alias("__is_ref")
    )
    qs = [k / 10.0 for k in range(1, 10)]
    bounds = (
        lab.where("__is_ref")
        .groupBy(*keys)
        .agg(
            F.expr(
                "percentile(CAST(__vc AS DOUBLE), array("
                + ", ".join(f"CAST({q} AS DOUBLE)" for q in qs)
                + "))"
            ).alias("__bs_raw")
        )
        .select(
            *keys,
            F.transform(
                F.col("__bs_raw"),
                lambda x: F.when(
                    x >= 0, F.floor(x * 1e6 + 0.5) / 1e6
                ).otherwise(-F.floor(-x * 1e6 + 0.5) / 1e6),
            ).alias("__bs"),
        )
    )
    assigned = lab.join(F.broadcast(bounds), keys).select(
        *keys,
        "__is_ref",
        (
            F.lit(1)
            + F.size(
                F.filter(
                    F.col("__bs"), lambda x: F.col("__vc").cast("double") > x
                )
            )
        ).cast("long").alias("__bkt"),
    )
    counts = assigned.groupBy(*keys, "__bkt").agg(
        F.sum(F.when(F.col("__is_ref"), 1).otherwise(0))
        .cast("long")
        .alias("__c_ref"),
        F.sum(F.when(F.col("__is_ref"), 0).otherwise(1))
        .cast("long")
        .alias("__c_cur"),
    )
    wt = Window.partitionBy(*keys)
    tot = counts.select(
        *keys,
        "__bkt",
        "__c_ref",
        "__c_cur",
        F.sum("__c_ref").over(wt).cast("long").alias("__n_ref"),
        F.sum("__c_cur").over(wt).cast("long").alias("__n_cur"),
    )
    p = (F.col("__c_ref") + 1).cast("double") / (F.col("__n_ref") + 10).cast(
        "double"
    )
    q = (F.col("__c_cur") + 1).cast("double") / (F.col("__n_cur") + 10).cast(
        "double"
    )
    term_u = F.floor((q - p) * F.log(q / p) * F.lit(1000000000.0) + F.lit(0.5)).cast(
        "long"
    )
    return (
        tot.withColumn("__tu", term_u)
        .groupBy(*keys)
        .agg(
            F.first("__n_ref").alias("n_ref"),
            F.first("__n_cur").alias("n_cur"),
            F.round(F.sum("__tu").cast("long") / F.lit(1000000000.0), 6).alias(
                "psi"
            ),
            (
                F.round(F.sum("__tu").cast("long") / F.lit(1000000000.0), 6)
                > F.lit(0.2)
            ).alias("drift_flag"),
        )
        .orderBy(*keys)
    )


def psi_ref_stats(e, seg_col=None):
    """Reference-side PSI statistics per event type, exactly as the
    registered events_psi_drift query derives them (first-half split,
    Spark percentile deciles rounded half-away, bucket counts by
    ``value > bound``): ``(event_type, bounds: array<double>[9],
    ref_counts: array<long>[10], n_ref)``. This is the frame a batch
    job freezes and hands to :func:`tsod_spark.streaming
    .stream_psi_drift` as the monitoring reference. ``seg_col`` keys
    everything by (event_type, segment) — the keyed monitor's ref
    shape (tuple-keyed dict)."""
    from ..expressions import nan_to_null

    keys = ["event_type"] + ([seg_col] if seg_col else [])
    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    d = e.select(
        *keys,
        F.expr("unix_micros(ts) div 3600000000").alias("__hb"),
        cents.alias("__vc"),
    ).where(F.col("__vc").isNotNull())
    span = d.agg(
        ((F.min("__hb") + F.max("__hb") + 1) / 2).cast("long").alias("__mid")
    )
    refrows = (
        d.crossJoin(F.broadcast(span))
        .where(F.col("__hb") < F.col("__mid"))
        .select(*keys, "__vc")
    )
    qs = [k / 10.0 for k in range(1, 10)]
    bounds = (
        refrows.groupBy(*keys)
        .agg(
            F.expr(
                "percentile(CAST(__vc AS DOUBLE), array("
                + ", ".join(f"CAST({q} AS DOUBLE)" for q in qs)
                + "))"
            ).alias("__bs_raw")
        )
        .select(
            *keys,
            F.transform(
                F.col("__bs_raw"),
                lambda x: F.when(
                    x >= 0, F.floor(x * 1e6 + 0.5) / 1e6
                ).otherwise(-F.floor(-x * 1e6 + 0.5) / 1e6),
            ).alias("bounds"),
        )
    )
    assigned = refrows.join(F.broadcast(bounds), keys).select(
        *keys,
        (
            F.lit(1)
            + F.size(
                F.filter(
                    F.col("bounds"), lambda x: F.col("__vc").cast("double") > x
                )
            )
        ).cast("long").alias("__bkt"),
    )
    counts = (
        assigned.groupBy(*keys, "__bkt")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .groupBy(*keys)
        .agg(
            F.map_from_arrays(
                F.collect_list("__bkt"), F.collect_list("__c")
            ).alias("__m"),
            F.sum("__c").cast("long").alias("n_ref"),
        )
        .select(
            *keys,
            F.array(
                *[
                    F.coalesce(
                        F.col("__m").getItem(F.lit(i + 1)), F.lit(0).cast("long")
                    )
                    for i in range(10)
                ]
            ).alias("ref_counts"),
            "n_ref",
        )
    )
    return bounds.join(counts, keys)
