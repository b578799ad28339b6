"""Round-7 additions: frequent-pattern mining (exact bounded-state
heavy hitters, association rules), theta-sketch set algebra, and
distribution-free rank statistics (Spearman, Wald-Wolfowitz runs).

Part of the driver-facing query registry (see ``tsod_spark.registry``);
registration side-effects populate ``_base.QUERIES`` / ``ORACLE``.
Reference scope note: the reference library (reference tsod/) has no
frequent-pattern or rank-statistic surface; these extend the engine's
beyond-reference corpus/analytics tooling with the same exact-int64 +
certificate discipline as the r4-r6 families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..analytics import sketches, stattests, temporal
from ..pipeline import frequent, text
from ._base import TOKS, register, spark_quantile_sql, table


@register(
    "doc_bigram_heavy_hitters",
    f"""WITH tk AS (SELECT {TOKS} AS t FROM documents),
    bg AS (SELECT unnest(list_transform(range(1, len(t)),
                                        i -> t[i] || ' ' || t[i + 1])) AS bigram
           FROM tk),
    c AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY bigram),
    t AS (SELECT sum(cnt) AS n FROM c)
    SELECT bigram, cnt,
           round(CAST(cnt AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS support
    FROM c, t
    WHERE cnt >= CAST(ceil(CAST(0.0012 AS DOUBLE) * CAST(t.n AS DOUBLE)) AS BIGINT)
    ORDER BY cnt DESC, bigram""",
)
def doc_bigram_heavy_hitters(spark, sf_dir):
    """EXACT corpus heavy hitters — every word bigram with frequency
    >= ceil(0.0012 * total) — via the two-pass bounded-state
    algorithm: pass 1 Misra-Gries summaries (hard k=1024 counters per
    partition, mapInPandas over a JVM-exploded single string column)
    whose merge guarantee proves no heavy bigram can be missed
    (0.0012 > 1/1025); pass 2 re-counts ONLY the surviving candidates
    behind a broadcast semi-join.  The oracle is the plain GROUP BY /
    HAVING the operator replaces once the distinct-ngram space
    outgrows a hash aggregate.  At sf0.01 the corpus holds ~916
    distinct bigrams (below k, no eviction pressure — eviction
    correctness is pytest-covered on a synthetic wide-vocabulary
    fixture with k=8)."""
    from ..util import default_parallelism

    docs = table(spark, sf_dir, "documents")
    # spread the corpus before the CPU-heavy tokenize+shingle explode:
    # a single-file corpus otherwise runs BOTH passes on one core
    # (measured 5.6s -> 0.6s for the explode alone at sf0.1); at
    # production scale the source arrives multi-file and this is a
    # cheap no-op-shaped round-robin of text bytes
    spread = docs.repartition(default_parallelism(spark), "doc_id")
    bigrams = spread.select(
        F.explode(text.all_shingles(text.tokens(F.col("text")), 2)).alias("bigram")
    )
    return frequent.heavy_hitters(bigrams, "bigram", k=1024, phi=0.0012)


@register(
    "events_theta_sets",
    """WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1),
    i AS (SELECT a.event_type AS ta, b.event_type AS tb,
                 CAST(count(*) AS BIGINT) AS c
          FROM d a JOIN d b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2)
    SELECT na.event_type AS type_a, nb.event_type AS type_b,
           CAST(na.c - coalesce(i.c, 0) AS BIGINT) AS exact_a_not_b,
           CAST(nb.c - coalesce(i.c, 0) AS BIGINT) AS exact_b_not_a,
           CAST(coalesce(i.c, 0) AS BIGINT) AS exact_intersect,
           TRUE AS a_not_b_within_tol,
           TRUE AS b_not_a_within_tol,
           TRUE AS intersect_within_tol
    FROM n na JOIN n nb ON na.event_type < nb.event_type
    LEFT JOIN i ON i.ta = na.event_type AND i.tb = nb.event_type
    ORDER BY type_a, type_b""",
)
def events_theta_sets(spark, sf_dir):
    """Distinct-audience SET ALGEBRA per event-type pair — |A\\B|,
    |B\\A|, |A∩B| — from mergeable THETA sketches (theta_difference /
    theta_intersection on per-group sketches built in one fact scan),
    certified against the exact values derived from one distinct
    (type, user) reduction.  The query HLL cannot answer: HLL only
    unions, theta keeps the sampled hash set, so difference and
    intersection are first-class.  Sparse-mode-exact at test
    cardinalities, ~1.6% rsd at 100 TB."""
    return sketches.theta_set_ops(table(spark, sf_dir, "events"))


@register(
    "events_assoc_rules",
    """WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1),
    u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS uu FROM d),
    p AS (SELECT a.event_type AS ta, b.event_type AS tb,
                 CAST(count(*) AS BIGINT) AS s
          FROM d a JOIN d b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2)
    SELECT na.event_type AS type_a, nb.event_type AS type_b,
           CAST(coalesce(p.s, 0) AS BIGINT) AS pair_users,
           round(CAST(coalesce(p.s, 0) AS DOUBLE) / CAST(u.uu AS DOUBLE), 6)
             AS support_pair,
           round(CAST(coalesce(p.s, 0) AS DOUBLE) / CAST(na.c AS DOUBLE), 6)
             AS conf_a_to_b,
           round(CAST(coalesce(p.s, 0) AS DOUBLE) / CAST(nb.c AS DOUBLE), 6)
             AS conf_b_to_a,
           round(CAST(coalesce(p.s, 0) * u.uu AS DOUBLE)
                 / CAST(na.c * nb.c AS DOUBLE), 6) AS lift
    FROM n na JOIN n nb ON na.event_type < nb.event_type
    LEFT JOIN p ON p.ta = na.event_type AND p.tb = nb.event_type
    CROSS JOIN u
    ORDER BY type_a, type_b""",
)
def events_assoc_rules(spark, sf_dir):
    """Market-basket association rules over (user, event_type)
    co-occurrence: pair support, both directional confidences, and
    lift for every unordered type pair — the exact metrics an FP-
    growth pipeline reports, computed relationally: one distinct
    reduction of the fact table, a pair self-join keyed by user on the
    reduced frame, then O(#types^2) arithmetic on broadcast counts.
    All ratios are single double divisions over exact int64 counts."""
    return frequent.cooccurrence_rules(table(spark, sf_dir, "events"))


@register(
    "ts_spearman",
    """WITH c AS (SELECT user_id, date_trunc('hour', ts) AS b,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    p AS (SELECT user_id, b, sum(vc) AS x FROM c GROUP BY 1, 2),
    g AS (SELECT b, sum(x) AS y FROM p GROUP BY 1),
    j AS (SELECT p.user_id, p.x, g.y FROM p JOIN g USING (b)
          WHERE p.x IS NOT NULL AND g.y IS NOT NULL),
    r AS (SELECT user_id,
        2 * rank() OVER (PARTITION BY user_id ORDER BY x)
          + count(*) OVER (PARTITION BY user_id, x) - 1 AS rx,
        2 * rank() OVER (PARTITION BY user_id ORDER BY y)
          + count(*) OVER (PARTITION BY user_id, y) - 1 AS ry
      FROM j)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_buckets,
           CASE WHEN sqrt(CAST(count(*) * sum(rx * rx) - sum(rx) * sum(rx) AS DOUBLE))
                     * sqrt(CAST(count(*) * sum(ry * ry) - sum(ry) * sum(ry) AS DOUBLE)) > 0
                THEN round(CAST(count(*) * sum(rx * ry) - sum(rx) * sum(ry) AS DOUBLE)
                     / (sqrt(CAST(count(*) * sum(rx * rx) - sum(rx) * sum(rx) AS DOUBLE))
                        * sqrt(CAST(count(*) * sum(ry * ry) - sum(ry) * sum(ry) AS DOUBLE))), 6)
           END AS spearman
    FROM r GROUP BY user_id""",
)
def ts_spearman(spark, sf_dir):
    """Per-series SPEARMAN rank correlation to the global hourly
    benchmark — the robust twin of ts_benchmark_corr (monotone
    association on ranks, immune to heavy-tailed bucket totals).
    Ties take average rank as the integer 2*avg_rank = 2*min_rank +
    ties - 1 (Pearson is scale-invariant), so every product-sum stays
    exact int64 and both engines divide once."""
    return temporal.benchmark_spearman(table(spark, sf_dir, "events"))


_RT_V = (
    "(CAST(2 * n_pos * n_neg AS DOUBLE)"
    " * CAST(2 * n_pos * n_neg - (n_pos + n_neg) AS DOUBLE))"
    " / (CAST(n_pos + n_neg AS DOUBLE) * CAST(n_pos + n_neg AS DOUBLE)"
    "    * CAST(n_pos + n_neg - 1 AS DOUBLE))"
)


@register(
    "ts_runs_test",
    f"""WITH c AS (SELECT user_id, ts, event_id,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    o AS (SELECT * FROM c WHERE vc IS NOT NULL),
    m AS (SELECT user_id,
                 {spark_quantile_sql("a", 0.5)} AS med
          FROM (SELECT user_id, list_sort(list(vc)) AS a FROM o GROUP BY user_id)),
    s AS (SELECT o.user_id, o.ts, o.event_id,
                 CASE WHEN o.vc > m.med THEN 1 ELSE -1 END AS sgn
          FROM o JOIN m USING (user_id)
          WHERE CAST(o.vc AS DOUBLE) <> m.med),
    t AS (SELECT user_id, sgn,
            CASE WHEN lag(sgn) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  OR sgn <> lag(sgn) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 THEN 1 ELSE 0 END AS chg
          FROM s),
    a AS (SELECT user_id,
            CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
            CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
            CAST(sum(chg) AS BIGINT) AS runs
          FROM t GROUP BY user_id)
    SELECT user_id, n_pos, n_neg, runs,
           CASE WHEN (n_pos + n_neg) > 1 AND {_RT_V} > 0
                THEN round((CAST(runs AS DOUBLE)
                      - (1.0 + CAST(2 * n_pos * n_neg AS DOUBLE)
                               / CAST(n_pos + n_neg AS DOUBLE)))
                     / sqrt({_RT_V}), 6)
           END AS runs_z
    FROM a ORDER BY user_id""",
)
def ts_runs_test(spark, sf_dir):
    """Wald-Wolfowitz runs test per series: sign sequence of
    (value - series median) scanned for runs; emits above/below
    counts, run count, and the normal-approximation z-score — the
    distribution-free "is this sensor trending or mean-reverting"
    screen.  Values quantize to int64 cents, the median compares in
    Spark's bit-exact interpolation (spark_quantile_sql oracle twin),
    median-ties are excluded, and the variance converts each int64
    factor to double in a fixed textual order both engines share."""
    return temporal.runs_test(table(spark, sf_dir, "events"))


_MK_VAR = "CAST(nd.n * (nd.n - 1) * (2 * nd.n + 5) - tie.tsum AS DOUBLE) / 18.0"
_MK_NUM = (
    "(CASE WHEN agg.s > 0 THEN CAST(agg.s - 1 AS DOUBLE) "
    "WHEN agg.s < 0 THEN CAST(agg.s + 1 AS DOUBLE) ELSE 0.0 END)"
)


@register(
    "ts_theil_sen",
    f"""WITH c AS (SELECT user_id,
           date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    daily AS (SELECT user_id, d, sum(vc) AS x FROM c GROUP BY 1, 2),
    dd AS (SELECT * FROM daily WHERE x IS NOT NULL),
    p AS (SELECT a.user_id,
            CAST(b.x - a.x AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope,
            CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
          FROM dd a JOIN dd b ON a.user_id = b.user_id AND a.d < b.d),
    agg AS (SELECT user_id, CAST(sum(sgn) AS BIGINT) AS s,
                   list_sort(list(slope)) AS sl FROM p GROUP BY 1),
    nd AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM dd GROUP BY 1),
    tie AS (SELECT user_id,
                   CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum
            FROM (SELECT user_id, x, CAST(count(*) AS BIGINT) AS t
                  FROM dd GROUP BY 1, 2) GROUP BY 1)
    SELECT nd.user_id, nd.n AS n_days,
           round({spark_quantile_sql("agg.sl", 0.5)}, 6) AS sen_slope,
           agg.s AS mk_s,
           CASE WHEN {_MK_VAR} > 0
                THEN round({_MK_NUM} / sqrt({_MK_VAR}), 6) END AS mk_z,
           coalesce(abs({_MK_NUM} / sqrt({_MK_VAR})) > 1.96, FALSE) AS trend_flag
    FROM nd JOIN agg ON agg.user_id = nd.user_id
    JOIN tie ON tie.user_id = nd.user_id
    ORDER BY nd.user_id""",
)
def ts_theil_sen(spark, sf_dir):
    """Robust trend screen per series: Theil-Sen slope (median of all
    pairwise daily-total slopes — outlier-immune where OLS is not)
    plus the tie-corrected Mann-Kendall z and its 5% trend flag, the
    standard distribution-free sensor-trend battery.  Pairs enumerate
    on the per-(series, day) int64 cent aggregate (bounded by the
    horizon, never the event count); the Sen slope interpolates with
    the engine-exact percentile both engines share."""
    return temporal.robust_trend(table(spark, sf_dir, "events"))


_TC_CTE = """WITH c AS (SELECT event_type,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    o AS (SELECT * FROM c WHERE vc IS NOT NULL),
    tc AS (SELECT event_type, vc, CAST(count(*) AS BIGINT) AS ct
           FROM o GROUP BY 1, 2),
    g AS (SELECT vc, CAST(sum(ct) AS BIGINT) AS cg FROM tc GROUP BY 1),
    nt AS (SELECT event_type, CAST(sum(ct) AS BIGINT) AS n1 FROM tc GROUP BY 1),
    tot AS (SELECT CAST(sum(cg) AS BIGINT) AS nn,
                   CAST(sum(cg * cg * cg - cg) AS BIGINT) AS t FROM g)"""


@register(
    "events_ks_drift",
    f"""{_TC_CTE},
    grid AS (SELECT nt.event_type, g.vc, g.cg, nt.n1 FROM g CROSS JOIN nt),
    jj AS (SELECT grid.event_type, grid.vc, grid.cg, grid.n1,
                  coalesce(tc.ct, 0) AS ct
           FROM grid LEFT JOIN tc
             ON tc.event_type = grid.event_type AND tc.vc = grid.vc),
    cum AS (SELECT event_type, vc, n1,
              sum(ct) OVER (PARTITION BY event_type ORDER BY vc) AS c1,
              sum(cg) OVER (PARTITION BY event_type ORDER BY vc) AS cgc
            FROM jj),
    dd AS (SELECT cum.event_type, vc, n1, tot.nn,
              abs(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - CAST(cgc - c1 AS DOUBLE) / CAST(tot.nn - n1 AS DOUBLE)) AS d
           FROM cum CROSS JOIN tot),
    mx AS (SELECT event_type, n1, nn, max(d) AS ksd FROM dd
           WHERE nn > n1 GROUP BY 1, 2, 3),
    loc AS (SELECT dd.event_type, min(dd.vc) AS ks_at_cent
            FROM dd JOIN mx ON dd.event_type = mx.event_type AND dd.d = mx.ksd
            GROUP BY 1)
    SELECT mx.event_type, CAST(mx.n1 AS BIGINT) AS n_group,
           round(mx.ksd, 6) AS ks, loc.ks_at_cent,
           mx.ksd > 1.358 * sqrt(CAST(mx.n1 + (mx.nn - mx.n1) AS DOUBLE)
                                 / CAST(mx.n1 * (mx.nn - mx.n1) AS DOUBLE))
             AS drift_flag
    FROM mx JOIN loc ON loc.event_type = mx.event_type
    ORDER BY mx.event_type""",
)
def events_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift screen per event type (vs
    the rest of the population): KS distance, the cent value where the
    ECDF gap peaks, and the alpha=0.05 rejection flag.  Computed
    entirely on the domain-bounded (type, cent) count aggregate —
    ECDFs are cumulative windows over that compact frame, so the fact
    table is scanned once and never sorted row-level."""
    return stattests.ks_drift(table(spark, sf_dir, "events"))


@register(
    "events_mannwhitney",
    f"""{_TC_CTE},
    gc AS (SELECT vc, cg, sum(cg) OVER (ORDER BY vc) - cg AS cumbefore FROM g),
    r2 AS (SELECT tc.event_type,
                  CAST(sum(tc.ct * (2 * gc.cumbefore + gc.cg + 1)) AS BIGINT) AS r2
           FROM tc JOIN gc ON tc.vc = gc.vc GROUP BY 1),
    uu AS (SELECT nt.event_type, nt.n1, tot.nn, tot.t,
                  CAST(r2.r2 - nt.n1 * (nt.n1 + 1) AS BIGINT) AS u2
           FROM nt JOIN r2 ON r2.event_type = nt.event_type CROSS JOIN tot)
    SELECT event_type, CAST(n1 AS BIGINT) AS n_group, u2,
           CASE WHEN sqrt(CAST(n1 * (nn - n1) AS DOUBLE)
                     * ((CAST(nn AS DOUBLE) + 1.0)
                        - CAST(t AS DOUBLE)
                          / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))
                     / 3.0) > 0
                THEN round(CAST(u2 - n1 * (nn - n1) AS DOUBLE)
                     / sqrt(CAST(n1 * (nn - n1) AS DOUBLE)
                       * ((CAST(nn AS DOUBLE) + 1.0)
                          - CAST(t AS DOUBLE)
                            / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))
                       / 3.0), 6)
           END AS mw_z,
           coalesce(abs(CAST(u2 - n1 * (nn - n1) AS DOUBLE)
                    / sqrt(CAST(n1 * (nn - n1) AS DOUBLE)
                      * ((CAST(nn AS DOUBLE) + 1.0)
                         - CAST(t AS DOUBLE)
                           / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))
                      / 3.0)) > 1.96, FALSE) AS shift_flag
    FROM uu ORDER BY event_type""",
)
def events_mannwhitney(spark, sf_dir):
    """Mann-Whitney U (rank-sum) location-shift test per event type vs
    the rest, tie-corrected normal approximation, no continuity
    correction.  The doubled rank sum computes in closed form over
    pooled tie groups of the (type, cent) aggregate (doubled average
    rank of a tie group = 2*cum_before + t + 1, an integer), so u2 =
    2*U1 is exact int64 and the z-score divides once in a fixed
    textual order both engines share."""
    return stattests.mann_whitney(table(spark, sf_dir, "events"))


O_CENTS7 = "CAST(round(o_totalprice * 100) AS BIGINT)"
REV_C7 = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


@register(
    "orders_rfm",
    f"""WITH per AS (SELECT o_custkey,
           max(CAST(o_orderdate AS DATE)) AS last_d,
           CAST(count(*) AS BIGINT) AS frequency,
           CAST(sum({O_CENTS7}) AS BIGINT) AS monetary_cents
         FROM orders GROUP BY 1),
    nw AS (SELECT max(CAST(o_orderdate AS DATE)) AS now_d FROM orders),
    r AS (SELECT per.*,
            CAST(date_diff('day', last_d, now_d) AS BIGINT) AS recency_days
          FROM per CROSS JOIN nw),
    s AS (SELECT o_custkey, recency_days, frequency, monetary_cents,
        CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS BIGINT)
          AS r_score,
        CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS BIGINT) AS f_score,
        CAST(ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS BIGINT)
          AS m_score
      FROM r)
    SELECT o_custkey, recency_days, frequency, monetary_cents,
           r_score, f_score, m_score,
           CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
                  THEN 'champion'
                WHEN f_score >= 4 THEN 'loyal'
                WHEN m_score >= 4 THEN 'big_spender'
                WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                WHEN r_score <= 2 THEN 'hibernating'
                ELSE 'regular' END AS segment
    FROM s ORDER BY o_custkey""",
)
def orders_rfm(spark, sf_dir):
    """RFM customer segmentation: recency / frequency / monetary
    quintile scores (deterministic ntile with custkey tiebreaks — both
    engines share the standard remainder-to-first-buckets ntile) and
    the classic segment labels.  The quintile windows sort the
    customer-DIM-sized aggregate, never the fact table; the reference
    date is the max order date via a broadcast 1-row scalar."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    per = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("__last"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum(cents).alias("monetary_cents"),
    )
    now = o.agg(F.max(F.to_date("o_orderdate")).alias("__now"))
    r = per.crossJoin(F.broadcast(now)).withColumn(
        "recency_days", F.datediff(F.col("__now"), F.col("__last")).cast("long")
    )
    w_r = Window.orderBy(F.col("recency_days").desc(), "o_custkey")
    w_f = Window.orderBy(F.col("frequency"), "o_custkey")
    w_m = Window.orderBy(F.col("monetary_cents"), "o_custkey")
    s = r.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        F.ntile(5).over(w_r).cast("long").alias("r_score"),
        F.ntile(5).over(w_f).cast("long").alias("f_score"),
        F.ntile(5).over(w_m).cast("long").alias("m_score"),
    )
    seg = (
        F.when(
            (F.col("r_score") >= 4) & (F.col("f_score") >= 4) & (F.col("m_score") >= 4),
            F.lit("champion"),
        )
        .when(F.col("f_score") >= 4, F.lit("loyal"))
        .when(F.col("m_score") >= 4, F.lit("big_spender"))
        .when((F.col("r_score") <= 2) & (F.col("f_score") >= 3), F.lit("at_risk"))
        .when(F.col("r_score") <= 2, F.lit("hibernating"))
        .otherwise(F.lit("regular"))
    )
    return s.withColumn("segment", seg).orderBy("o_custkey")


@register(
    "parts_abc",
    f"""WITH pr AS (SELECT l_partkey, CAST(sum({REV_C7}) AS BIGINT) AS revenue_c
          FROM lineitem GROUP BY 1),
    t AS (SELECT CAST(sum(revenue_c) AS BIGINT) AS tot FROM pr),
    c AS (SELECT l_partkey, revenue_c,
            sum(revenue_c) OVER (ORDER BY revenue_c DESC, l_partkey) AS cum
          FROM pr)
    SELECT l_partkey, revenue_c,
           round(CAST(cum AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS cum_share,
           CASE WHEN CAST(cum AS DOUBLE) / CAST(t.tot AS DOUBLE) <= 0.8 THEN 'A'
                WHEN CAST(cum AS DOUBLE) / CAST(t.tot AS DOUBLE) <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c CROSS JOIN t ORDER BY revenue_c DESC, l_partkey""",
)
def parts_abc(spark, sf_dir):
    """ABC / Pareto inventory classification: parts ranked by exact
    int64 revenue cents, cumulative-share thresholds at 80% / 95%.
    The cumulative window sorts the part-DIM-sized aggregate (the fact
    table reduces in one map-side-combinable pass); the grand total is
    a broadcast 1-row scalar and each share divides once in double."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    pr = li.groupBy("l_partkey").agg(F.sum(rev).cast("long").alias("revenue_c"))
    tot = pr.agg(F.sum("revenue_c").cast("long").alias("__tot"))
    w = Window.orderBy(F.col("revenue_c").desc(), "l_partkey")
    c = pr.withColumn("__cum", F.sum("revenue_c").over(w)).crossJoin(
        F.broadcast(tot)
    )
    share = F.col("__cum").cast("double") / F.col("__tot").cast("double")
    return c.select(
        "l_partkey",
        "revenue_c",
        F.round(share, 6).alias("cum_share"),
        F.when(share <= 0.8, F.lit("A"))
        .when(share <= 0.95, F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    ).orderBy(F.col("revenue_c").desc(), "l_partkey")


@register(
    "customer_gini_by_nation",
    f"""WITH sp AS (SELECT o_custkey, CAST(sum({O_CENTS7}) AS BIGINT) AS x
          FROM orders GROUP BY 1),
    cs AS (SELECT c.c_nationkey, sp.o_custkey, sp.x
           FROM sp JOIN customer c ON c.c_custkey = sp.o_custkey),
    r AS (SELECT c_nationkey, x,
            row_number() OVER (PARTITION BY c_nationkey ORDER BY x, o_custkey)
              AS i,
            count(*) OVER (PARTITION BY c_nationkey) AS n,
            sum(x) OVER (PARTITION BY c_nationkey) AS sx
          FROM cs),
    g AS (SELECT c_nationkey, CAST(max(n) AS BIGINT) AS n_customers,
            CAST(sum((2 * i - n - 1) * x) AS BIGINT) AS num,
            CAST(max(n * sx) AS BIGINT) AS den
          FROM r GROUP BY 1)
    SELECT nt.n_name AS nation, g.n_customers,
           CASE WHEN g.den > 0
                THEN round(CAST(g.num AS DOUBLE) / CAST(g.den AS DOUBLE), 6)
           END AS gini
    FROM g JOIN nation nt ON nt.n_nationkey = g.c_nationkey
    ORDER BY nation""",
)
def customer_gini_by_nation(spark, sf_dir):
    """Gini coefficient of customer spend per nation — the inequality
    screen over the rank formulation ``sum((2i - n - 1) x_i) / (n
    sum(x))`` with spend sorted ascending (custkey tiebreak), which
    keeps every term an exact int64 product-sum and divides once.
    Windows partition by nation over the customer-DIM-sized spend
    aggregate; the nation dim joins broadcast."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    sp = o.groupBy("o_custkey").agg(F.sum(cents).alias("x"))
    cs = sp.join(
        cust.select(F.col("c_custkey"), "c_nationkey"),
        sp["o_custkey"] == F.col("c_custkey"),
    ).select("c_nationkey", "o_custkey", "x")
    wp = Window.partitionBy("c_nationkey")
    r = cs.select(
        "c_nationkey",
        "x",
        F.row_number().over(wp.orderBy("x", "o_custkey")).alias("i"),
        F.count(F.lit(1)).over(wp).alias("n"),
        F.sum("x").over(wp).alias("sx"),
    )
    g = r.groupBy("c_nationkey").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.sum(
            (F.lit(2) * F.col("i") - F.col("n") - 1) * F.col("x")
        ).cast("long").alias("__num"),
        F.max(F.col("n") * F.col("sx")).cast("long").alias("__den"),
    )
    return (
        g.join(
            F.broadcast(nat.select("n_nationkey", "n_name")),
            g["c_nationkey"] == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            "n_customers",
            F.when(
                F.col("__den") > 0,
                F.round(F.col("__num").cast("double") / F.col("__den").cast("double"), 6),
            ).alias("gini"),
        )
        .orderBy("nation")
    )


# Benford first-digit probabilities log10(1 + 1/d), shared as literal
# doubles so both engines parse the identical values (no libm log10 in
# either plan — engine log implementations differ in the last ulp)
_BENFORD_P = (
    0.301029995663981,
    0.176091259055681,
    0.1249387366083,
    0.096910013008056,
    0.079181246047625,
    0.066946789630613,
    0.057991946977687,
    0.051152522447381,
    0.045757490560675,
)
_BENFORD_SQL_CHI2 = " + ".join(
    f"(CAST(o{d} AS DOUBLE) - CAST(n AS DOUBLE) * {p})"
    f" * (CAST(o{d} AS DOUBLE) - CAST(n AS DOUBLE) * {p})"
    f" / (CAST(n AS DOUBLE) * {p})"
    for d, p in zip(range(1, 10), _BENFORD_P)
)
_BENFORD_OS = ",\n".join(
    f"CAST(sum(CASE WHEN dig = {d} THEN 1 ELSE 0 END) AS BIGINT) AS o{d}"
    for d in range(1, 10)
)


@register(
    "events_benford",
    f"""WITH c AS (SELECT event_type,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    d AS (SELECT event_type,
                 CAST(substr(CAST(abs(vc) AS VARCHAR), 1, 1) AS BIGINT) AS dig
          FROM c WHERE vc IS NOT NULL AND vc <> 0),
    p AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 {_BENFORD_OS}
          FROM d GROUP BY 1)
    SELECT event_type, n, round({_BENFORD_SQL_CHI2}, 6) AS chi2,
           ({_BENFORD_SQL_CHI2}) > 15.507 AS benford_flag
    FROM p ORDER BY event_type""",
)
def events_benford(spark, sf_dir):
    """Benford first-significant-digit conformance screen per event
    type: chi-square distance of the observed leading-digit histogram
    (of int64 cent magnitudes — digit extraction is string-based, so
    no float log in either engine) from the Benford expectation, with
    the 5% rejection flag (chi2 > 15.507, df=8).  The expected
    probabilities are shared literal doubles and the nine chi-square
    terms sum in one fixed textual order, keeping the statistic
    engine-deterministic.  One map-side-combinable aggregate over the
    fact table; everything after is a 9-column projection."""
    return benford_screen(table(spark, sf_dir, "events"))


def benford_screen(e):
    """The events_benford plan on an arbitrary events-shaped frame
    (shared with the differential tests)."""
    from ..expressions import nan_to_null

    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    d = (
        e.select("event_type", cents.alias("__vc"))
        .where(F.col("__vc").isNotNull() & (F.col("__vc") != 0))
        .select(
            "event_type",
            F.substring(F.abs(F.col("__vc")).cast("string"), 1, 1)
            .cast("long")
            .alias("__dig"),
        )
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")] + [
        F.sum(F.when(F.col("__dig") == dd, 1).otherwise(0))
        .cast("long")
        .alias(f"o{dd}")
        for dd in range(1, 10)
    ]
    p = d.groupBy("event_type").agg(*aggs)
    chi2 = None
    for dd, prob in zip(range(1, 10), _BENFORD_P):
        o = F.col(f"o{dd}").cast("double")
        exp = F.col("n").cast("double") * F.lit(prob)
        term = (o - exp) * (o - exp) / exp
        chi2 = term if chi2 is None else chi2 + term
    return p.select(
        "event_type",
        "n",
        F.round(chi2, 6).alias("chi2"),
        (chi2 > F.lit(15.507)).alias("benford_flag"),
    ).orderBy("event_type")


@register(
    "ts_backtest_snaive",
    """WITH c AS (SELECT user_id, date_trunc('hour', ts) AS b,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    p AS (SELECT user_id, b, sum(vc) AS x FROM c GROUP BY 1, 2),
    pp AS (SELECT * FROM p WHERE x IS NOT NULL),
    s AS (SELECT a.user_id, abs(a.x - f.x) AS es
          FROM pp a JOIN pp f
            ON f.user_id = a.user_id AND f.b = a.b - INTERVAL 24 HOUR),
    n1 AS (SELECT a.user_id, abs(a.x - f.x) AS ep
           FROM pp a JOIN pp f
             ON f.user_id = a.user_id AND f.b = a.b - INTERVAL 1 HOUR),
    sa AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_scored,
                  CAST(sum(es) AS BIGINT) AS se FROM s GROUP BY 1),
    na AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_persist,
                  CAST(sum(ep) AS BIGINT) AS sp FROM n1 GROUP BY 1)
    SELECT sa.user_id, sa.n_scored,
           round(CAST(sa.se AS DOUBLE) / CAST(sa.n_scored AS DOUBLE), 6)
             AS mae_cents,
           CASE WHEN na.sp > 0
                THEN round(CAST(sa.se * na.n_persist AS DOUBLE)
                           / CAST(sa.n_scored * na.sp AS DOUBLE), 6)
           END AS mase
    FROM sa JOIN na ON na.user_id = sa.user_id
    ORDER BY sa.user_id""",
)
def ts_backtest_snaive(spark, sf_dir):
    """Rolling-origin backtest of the SEASONAL-NAIVE forecaster per
    series: predict each hourly total with the value 24 hours earlier,
    score MAE (exact int64 error sum, one division) and MASE against
    the 1-hour persistence baseline — MASE is a ratio of two exact
    ratios, so it reduces to integer cross-products divided once.
    Forecast lookup is a self-join on the bucket timestamp (gap-safe:
    a missing t-24h bucket scores nothing, unlike a row-lag), both
    joins keyed by series over the bucketed aggregate — the standard
    "is a model even worth training" screen run before any MLlib fit."""
    from ..expressions import nan_to_null

    e = table(spark, sf_dir, "events")
    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    p = (
        e.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("__b"))
        .agg(F.sum(cents).alias("__x"))
        .where(F.col("__x").isNotNull())
        .cache()
    )
    a, f = p.alias("a"), p.alias("f")

    def err_agg(hours, n_name, s_name):
        j = a.join(
            f,
            (F.col("f.user_id") == F.col("a.user_id"))
            & (
                F.col("f.__b")
                == F.col("a.__b") - F.expr(f"INTERVAL {hours} HOUR")
            ),
        )
        return j.groupBy(F.col("a.user_id").alias("user_id")).agg(
            F.count(F.lit(1)).cast("long").alias(n_name),
            F.sum(F.abs(F.col("a.__x") - F.col("f.__x")))
            .cast("long")
            .alias(s_name),
        )

    sa = err_agg(24, "n_scored", "__se")
    na = err_agg(1, "__np", "__sp")
    out = sa.join(na, "user_id")
    mae = F.col("__se").cast("double") / F.col("n_scored").cast("double")
    mase = (F.col("__se") * F.col("__np")).cast("double") / (
        F.col("n_scored") * F.col("__sp")
    ).cast("double")
    return out.select(
        "user_id",
        "n_scored",
        F.round(mae, 6).alias("mae_cents"),
        F.when(F.col("__sp") > 0, F.round(mase, 6)).alias("mase"),
    ).orderBy("user_id")


@register(
    "orders_cohort_ltv",
    """WITH om AS (SELECT o_custkey,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS ym,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders),
    first AS (SELECT o_custkey, min(ym) AS cohort_ym FROM om GROUP BY 1),
    cs AS (SELECT cohort_ym, CAST(count(*) AS BIGINT) AS cohort_size
           FROM first GROUP BY 1),
    j AS (SELECT f.cohort_ym, om.ym - f.cohort_ym AS age_months, om.cents
          FROM om JOIN first f ON f.o_custkey = om.o_custkey),
    g AS (SELECT cohort_ym, CAST(age_months AS BIGINT) AS age_months,
                 CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(cents) AS BIGINT) AS revenue_cents
          FROM j GROUP BY 1, 2),
    cum AS (SELECT *, sum(revenue_cents) OVER (
              PARTITION BY cohort_ym ORDER BY age_months) AS cum_revenue_cents
            FROM g)
    SELECT cum.cohort_ym, cum.age_months, cum.n_orders, cum.revenue_cents,
           CAST(cum.cum_revenue_cents AS BIGINT) AS cum_revenue_cents,
           round(CAST(cum.cum_revenue_cents AS DOUBLE)
                 / CAST(cs.cohort_size AS DOUBLE), 6) AS ltv_cents_per_customer
    FROM cum JOIN cs ON cs.cohort_ym = cum.cohort_ym
    ORDER BY cum.cohort_ym, cum.age_months""",
)
def orders_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value matrix: customers cohorted by first-order
    month (integer year*12+month key — no date formatting ambiguity
    between engines), revenue accumulated by cohort age in months, and
    cumulative LTV per cohort customer (exact int64 cents, one double
    division against the cohort size).  The cumulative window runs per
    cohort over the month-grain aggregate; the first-order table and
    cohort sizes are customer-dim-sized."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("long")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    om = o.select("o_custkey", ym.alias("__ym"), cents.alias("__c"))
    first = om.groupBy("o_custkey").agg(F.min("__ym").alias("cohort_ym"))
    cs = first.groupBy("cohort_ym").agg(
        F.count(F.lit(1)).cast("long").alias("__size")
    )
    g = (
        om.join(first, "o_custkey")
        .groupBy("cohort_ym", (F.col("__ym") - F.col("cohort_ym")).cast("long").alias("age_months"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("__c").cast("long").alias("revenue_cents"),
        )
    )
    w = Window.partitionBy("cohort_ym").orderBy("age_months")
    cum = g.withColumn(
        "cum_revenue_cents", F.sum("revenue_cents").over(w).cast("long")
    )
    return (
        cum.join(F.broadcast(cs), "cohort_ym")
        .select(
            "cohort_ym",
            "age_months",
            "n_orders",
            "revenue_cents",
            "cum_revenue_cents",
            F.round(
                F.col("cum_revenue_cents").cast("double")
                / F.col("__size").cast("double"),
                6,
            ).alias("ltv_cents_per_customer"),
        )
        .orderBy("cohort_ym", "age_months")
    )


@register(
    "ts_hour_anova",
    """WITH c AS (SELECT user_id, CAST(hour(ts) AS BIGINT) AS h,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    o AS (SELECT * FROM c WHERE vc IS NOT NULL),
    gh AS (SELECT user_id, h, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(vc) AS BIGINT) AS s,
                  CAST(sum(vc * vc) AS BIGINT) AS q
           FROM o GROUP BY 1, 2),
    per AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS nn,
                   CAST(sum(s) AS BIGINT) AS ss,
                   CAST(sum(q) AS BIGINT) AS qq,
                   CAST(count(*) AS BIGINT) AS k FROM gh GROUP BY 1),
    m AS (SELECT *, CAST(floor(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
                         AS BIGINT) AS mu FROM per),
    t AS (SELECT gh.user_id,
            sum((CAST(gh.s - gh.n * m.mu AS DOUBLE)
                 * CAST(gh.s - gh.n * m.mu AS DOUBLE))
                / CAST(gh.n AS DOUBLE)) AS term
          FROM gh JOIN m ON m.user_id = gh.user_id GROUP BY 1),
    fin AS (SELECT m.user_id, m.nn, m.k,
              t.term - (CAST(m.ss - m.nn * m.mu AS DOUBLE)
                        * CAST(m.ss - m.nn * m.mu AS DOUBLE))
                       / CAST(m.nn AS DOUBLE) AS ssb,
              CAST(m.qq - 2 * m.mu * m.ss + m.nn * m.mu * m.mu AS DOUBLE)
                - (CAST(m.ss - m.nn * m.mu AS DOUBLE)
                   * CAST(m.ss - m.nn * m.mu AS DOUBLE))
                  / CAST(m.nn AS DOUBLE) AS sst
            FROM m JOIN t ON t.user_id = m.user_id)
    SELECT user_id, nn AS n_obs, k AS k_hours,
           CASE WHEN k > 1 AND nn > k AND (sst - ssb) > 0
                THEN round((ssb / CAST(k - 1 AS DOUBLE))
                           / ((sst - ssb) / CAST(nn - k AS DOUBLE)), 6)
           END AS f_stat,
           CASE WHEN sst > 0 THEN round(ssb / sst, 6) END AS eta_sq,
           coalesce((CASE WHEN k > 1 AND nn > k AND (sst - ssb) > 0
                THEN (ssb / CAST(k - 1 AS DOUBLE))
                     / ((sst - ssb) / CAST(nn - k AS DOUBLE)) END) > 1.52,
                FALSE) AS seasonal_flag
    FROM fin ORDER BY user_id""",
)
def ts_hour_anova(spark, sf_dir):
    """Per-series one-way ANOVA across hour-of-day bins (F statistic +
    eta-squared): the "does this series have daily seasonality at all"
    screen run before ts_seasonal_decompose / seasonal models.  Exact
    int64 cell moments, algebraic integer-floor-mean centering (no
    second scan, no catastrophic cancellation), 2 shuffles on frames
    bounded by |series| x 24 — see stattests.hour_anova.  f_crit=1.52
    is the alpha=.05 critical value for df=(23, inf)."""
    return stattests.hour_anova(table(spark, sf_dir, "events"))


@register(
    "events_markov",
    """WITH s AS (SELECT user_id, event_type,
            lag(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev
          FROM events),
    p AS (SELECT prev AS from_type, event_type AS to_type,
                 CAST(count(*) AS BIGINT) AS transitions
          FROM s WHERE prev IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT from_type, CAST(sum(transitions) AS BIGINT) AS row_total
          FROM p GROUP BY 1),
    col AS (SELECT to_type, CAST(sum(transitions) AS BIGINT) AS col_total
            FROM p GROUP BY 1),
    g AS (SELECT CAST(sum(transitions) AS BIGINT) AS grand FROM p)
    SELECT p.from_type, p.to_type, p.transitions,
           round(CAST(p.transitions AS DOUBLE) / CAST(r.row_total AS DOUBLE),
                 6) AS prob,
           round(CAST(p.transitions * g.grand AS DOUBLE)
                 / CAST(r.row_total * col.col_total AS DOUBLE), 6) AS lift
    FROM p JOIN r ON r.from_type = p.from_type
    JOIN col ON col.to_type = p.to_type CROSS JOIN g
    ORDER BY p.from_type, p.to_type""",
)
def events_markov(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: for every (from_type, to_type) pair the transition
    count, row-conditional probability, and lift vs the destination's
    marginal share (lift as ONE division of exact int64
    cross-products).  Sequencing is a lag window per user with an
    event_id tiebreak (deterministic under timestamp ties in both
    engines); the pair counts map-side-combine down to |types|^2 rows,
    and the row/column marginals join broadcast-small."""
    return markov_matrix(table(spark, sf_dir, "events"))


def markov_matrix(e):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.select(
        "event_type", F.lag("event_type").over(w).alias("__prev")
    ).where(F.col("__prev").isNotNull())
    p = (
        s.groupBy(
            F.col("__prev").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("transitions"))
        .cache()
    )
    r = p.groupBy("from_type").agg(
        F.sum("transitions").cast("long").alias("__rt")
    )
    c = p.groupBy("to_type").agg(
        F.sum("transitions").cast("long").alias("__ct")
    )
    g = p.agg(F.sum("transitions").cast("long").alias("__g"))
    return (
        p.join(F.broadcast(r), "from_type")
        .join(F.broadcast(c), "to_type")
        .crossJoin(F.broadcast(g))
        .select(
            "from_type",
            "to_type",
            "transitions",
            F.round(
                F.col("transitions").cast("double")
                / F.col("__rt").cast("double"),
                6,
            ).alias("prob"),
            F.round(
                (F.col("transitions") * F.col("__g")).cast("double")
                / (F.col("__rt") * F.col("__ct")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "ts_ols_fit",
    """WITH c AS (SELECT user_id, date_trunc('hour', ts) AS b,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    p AS (SELECT user_id, b, sum(vc) AS y0 FROM c GROUP BY 1, 2),
    pp AS (SELECT user_id, epoch_us(b) // 3600000000 AS hb,
                  CAST(y0 AS BIGINT) AS y0 FROM p WHERE y0 IS NOT NULL),
    x AS (SELECT user_id,
            CAST(hb - min(hb) OVER (PARTITION BY user_id) AS BIGINT) AS x,
            CAST(y0 - CAST(floor(
                CAST(sum(y0) OVER (PARTITION BY user_id) AS DOUBLE)
                / CAST(count(*) OVER (PARTITION BY user_id) AS DOUBLE))
              AS BIGINT) AS BIGINT) AS y,
            CAST(floor(CAST(sum(y0) OVER (PARTITION BY user_id) AS DOUBLE)
                / CAST(count(*) OVER (PARTITION BY user_id) AS DOUBLE))
              AS BIGINT) AS muy
          FROM pp),
    agg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(min(muy) AS BIGINT) AS muy
            FROM x GROUP BY 1),
    d AS (SELECT *, CAST(n * sxy - sx * sy AS BIGINT) AS num,
                 CAST(n * sxx - sx * sx AS BIGINT) AS dx,
                 CAST(n * syy - sy * sy AS BIGINT) AS dy
          FROM agg)
    SELECT user_id, n AS n_buckets,
       CASE WHEN dx > 0
            THEN round(CAST(num AS DOUBLE) / CAST(dx AS DOUBLE), 6)
       END AS slope_cents_per_hour,
       CASE WHEN dx > 0
            THEN round(CAST(muy AS DOUBLE)
              + (CAST(sy AS DOUBLE)
                 - (CAST(num AS DOUBLE) / CAST(dx AS DOUBLE))
                   * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
       END AS intercept_cents,
       CASE WHEN dx > 0 AND dy > 0
            THEN round((CAST(num AS DOUBLE) * CAST(num AS DOUBLE))
                       / (CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)), 6)
       END AS r2,
       CASE WHEN dx > 0 AND n > 0
            THEN round(sqrt((CAST(dy AS DOUBLE)
                - CAST(num AS DOUBLE) * CAST(num AS DOUBLE)
                  / CAST(dx AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
       END AS rmse_cents
    FROM d ORDER BY user_id""",
)
def ts_ols_fit(spark, sf_dir):
    """Exact per-series OLS trend fit on hourly totals: slope
    (cents/hour), intercept at the series' first bucket, R^2, and
    residual RMSE — the least-squares complement to ts_theil_sen's
    robust slope.  Closed-form normal equations over exact int64
    moments: x is rebased to hours-since-series-start (window min) and
    y centered on its integer floor-mean (window sum/count, IEEE-exact
    in both engines), so every product-sum (n*sxy - sx*sy etc.) stays
    variance-scale int64 with no cancellation; each output divides
    once in a fixed textual order.  One fact scan, one (series,
    bucket) aggregate, one window + final aggregate co-partitioned on
    the series key."""
    return ols_fit(table(spark, sf_dir, "events"))


def ols_fit(e):
    from ..expressions import nan_to_null
    from pyspark.sql import Window

    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    p = (
        e.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("__b")
        )
        .agg(F.sum(cents).alias("__y0"))
        .where(F.col("__y0").isNotNull())
        .select(
            "user_id",
            F.expr("unix_micros(__b) div 3600000000").alias("__hb"),
            F.col("__y0").cast("long"),
        )
    )
    w = Window.partitionBy("user_id")
    muy = F.floor(
        F.sum("__y0").over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    ).cast("long")
    x = p.select(
        "user_id",
        (F.col("__hb") - F.min("__hb").over(w)).cast("long").alias("__x"),
        (F.col("__y0") - muy).cast("long").alias("__y"),
        muy.alias("__muy"),
    )
    agg = x.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").cast("long").alias("__sx"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).cast("long").alias("__sxy"),
        F.sum(F.col("__y") * F.col("__y")).cast("long").alias("__syy"),
        F.min("__muy").cast("long").alias("__muy"),
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    num = (n * F.col("__sxy") - sx * sy).cast("long")
    dx = (n * F.col("__sxx") - sx * sx).cast("long")
    dy = (n * F.col("__syy") - sy * sy).cast("long")
    d = agg.select(
        "user_id", "__n", "__sx", "__sy", "__muy",
        num.alias("__num"), dx.alias("__dx"), dy.alias("__dy"),
    )
    numd = F.col("__num").cast("double")
    dxd = F.col("__dx").cast("double")
    dyd = F.col("__dy").cast("double")
    nd = F.col("__n").cast("double")
    slope = numd / dxd
    return d.select(
        "user_id",
        F.col("__n").alias("n_buckets"),
        F.when(F.col("__dx") > 0, F.round(slope, 6)).alias(
            "slope_cents_per_hour"
        ),
        F.when(
            F.col("__dx") > 0,
            F.round(
                F.col("__muy").cast("double")
                + (F.col("__sy").cast("double") - slope * F.col("__sx").cast("double"))
                / nd,
                6,
            ),
        ).alias("intercept_cents"),
        F.when(
            (F.col("__dx") > 0) & (F.col("__dy") > 0),
            F.round((numd * numd) / (dxd * dyd), 6),
        ).alias("r2"),
        F.when(
            (F.col("__dx") > 0) & (F.col("__n") > 0),
            F.round(F.sqrt((dyd - numd * numd / dxd) / (nd * nd)), 6),
        ).alias("rmse_cents"),
    ).orderBy("user_id")


@register(
    "events_interarrival",
    """WITH s AS (SELECT user_id,
            epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id) AS du
          FROM events),
    g AS (SELECT user_id, du // 1000000 AS gap FROM s WHERE du IS NOT NULL),
    a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
                 CAST(sum(gap) AS BIGINT) AS t,
                 CAST(sum(gap * gap) AS BIGINT) AS q FROM g GROUP BY 1)
    SELECT user_id, n_gaps,
       round(CAST(t AS DOUBLE) / CAST(n_gaps AS DOUBLE), 6) AS mean_gap_s,
       round(sqrt(CAST(n_gaps * q - t * t AS DOUBLE))
             / CAST(n_gaps AS DOUBLE), 6) AS std_gap_s,
       CASE WHEN t > 0
            THEN round(sqrt(CAST(n_gaps * q - t * t AS DOUBLE))
                       / CAST(t AS DOUBLE), 6) END AS cv,
       CASE WHEN sqrt(CAST(n_gaps * q - t * t AS DOUBLE))
                 + CAST(t AS DOUBLE) > 0
            THEN round((sqrt(CAST(n_gaps * q - t * t AS DOUBLE))
                        - CAST(t AS DOUBLE))
                       / (sqrt(CAST(n_gaps * q - t * t AS DOUBLE))
                          + CAST(t AS DOUBLE)), 6) END AS burstiness
    FROM a ORDER BY user_id""",
)
def events_interarrival(spark, sf_dir):
    """Inter-arrival-time profile per series: mean/std gap (seconds),
    coefficient of variation, and the Goh-Barabasi burstiness index
    B = (sigma - mu)/(sigma + mu) in [-1, 1] (B=-1 perfectly periodic,
    B=0 Poisson, B->1 bursty) — the standard arrival-process
    characterization for event streams.  Gaps come from one lag window
    per series (event_id tiebreak); whole-second truncation keeps the
    moment sums int64-exact with sum(gap^2) <= (sum gap)^2 = span^2,
    so n*q - t^2 never overflows for spans to ~3e9 s; sigma and B
    reduce to expressions of sqrt(n*q - t*t) and t alone (the 1/n
    normalizations cancel), each divided once."""
    return interarrival_profile(table(spark, sf_dir, "events"))


def interarrival_profile(e):
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    du = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w)
    g = (
        e.select("user_id", du.alias("__du"))
        .where(F.col("__du").isNotNull())
        .select("user_id", F.expr("__du div 1000000").alias("__gap"))
    )
    a = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("__gap").cast("long").alias("__t"),
        F.sum(F.col("__gap") * F.col("__gap")).cast("long").alias("__q"),
    )
    n, t, q = F.col("n_gaps"), F.col("__t"), F.col("__q")
    root = F.sqrt((n * q - t * t).cast("double"))
    return a.select(
        "user_id",
        "n_gaps",
        F.round(t.cast("double") / n.cast("double"), 6).alias("mean_gap_s"),
        F.round(root / n.cast("double"), 6).alias("std_gap_s"),
        F.when(t > 0, F.round(root / t.cast("double"), 6)).alias("cv"),
        F.when(
            root + t.cast("double") > 0,
            F.round((root - t.cast("double")) / (root + t.cast("double")), 6),
        ).alias("burstiness"),
    ).orderBy("user_id")
