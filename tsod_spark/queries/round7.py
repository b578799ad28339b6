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
    docs = table(spark, sf_dir, "documents")
    bigrams = docs.select(
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
    mx AS (SELECT event_type, n1, nn, max(d) AS ksd FROM dd GROUP BY 1, 2, 3),
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
