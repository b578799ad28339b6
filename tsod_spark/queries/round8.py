"""Round-8 additions: multiresolution signal energy (Haar), arrival
process diagnostics (overdispersion), information-theoretic profiling
(entropy), survival analysis (Kaplan-Meier), and extreme-value tail
estimation (Hill) — the same exact-int64 + one-division discipline as
the r4-r7 families wherever the math allows, transcendentals only where
they are the operator (ln/exp for entropy, KM, Hill — the tfidf/idf
precedent: both engines' libm agree to ~1 ulp, 1e-12-scale error into
round(.,6)).

Part of the driver-facing query registry (see ``tsod_spark.registry``);
registration side-effects populate ``_base.QUERIES`` / ``ORACLE``.
Reference scope note: the reference library (reference tsod/) has no
wavelet/survival/tail-index surface; these extend the engine's
beyond-reference analytics corpus.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..analytics import temporal
from ._base import register, spark_quantile_sql, table

# (level, half-width, block-width) for the depth-4 Haar bank
_HAAR_LEVELS = ((1, 1, 2), (2, 2, 4), (3, 4, 8), (4, 8, 16))
_HAAR_ARR = "array(" + ",".join(
    f"named_struct('l',CAST({l} AS BIGINT),'half',CAST({h} AS BIGINT),"
    f"'width',CAST({wd} AS BIGINT))"
    for l, h, wd in _HAAR_LEVELS
) + ")"


@register(
    "ts_haar_energy",
    """WITH c AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    b AS (SELECT user_id, hb, CAST(sum(vc) AS BIGINT) AS y
          FROM c WHERE vc IS NOT NULL GROUP BY 1, 2),
    rb AS (SELECT user_id,
             CAST(hb - min(hb) OVER (PARTITION BY user_id) AS BIGINT) AS r,
             y FROM b),
    x AS (SELECT rb.user_id, lv.l, rb.r // lv.width AS blk,
            CASE WHEN (rb.r // lv.half) % 2 = 0 THEN rb.y ELSE -rb.y END AS sy
          FROM rb CROSS JOIN (VALUES
            (CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT)),
            (2, 2, 4), (3, 4, 8), (4, 8, 16)) AS lv(l, half, width)),
    d AS (SELECT user_id, l, blk, CAST(sum(sy) AS BIGINT) AS detail
          FROM x GROUP BY 1, 2, 3),
    en AS (SELECT user_id, l, CAST(count(*) AS BIGINT) AS n_blocks,
                  CAST(sum(detail * detail) AS BIGINT) AS energy
           FROM d GROUP BY 1, 2),
    t AS (SELECT *, CAST(sum(energy) OVER (PARTITION BY user_id) AS BIGINT)
                    AS tot FROM en)
    SELECT user_id, l AS level, n_blocks, energy,
           CASE WHEN tot > 0
                THEN round(CAST(energy AS DOUBLE) / CAST(tot AS DOUBLE), 6)
           END AS energy_share
    FROM t ORDER BY user_id, level""",
)
def ts_haar_energy(spark, sf_dir):
    """Per-series Haar wavelet energy decomposition over hourly cent
    totals, levels 1-4 (2h / 4h / 8h / 16h detail scales): for each
    level the number of occupied blocks, the EXACT int64 detail energy
    (sum over blocks of the squared signed-sum Haar coefficient), and
    its share of the series' total detail energy — which timescale
    carries the variance, the screen behind resample-width and
    season-length choices.  Empty hours contribute 0 (absent, not
    imputed); bucket index is rebased to the series' first hour so
    phase is series-relative.  Everything up to the single share
    division is integer arithmetic: detail = sum(+-y) over <=8 buckets
    (|detail| < 2^40 at sf1 densities), energy int64.  Plan: one fact
    scan -> (series, hour) aggregate, a 4x generator explode (no join)
    on the bucket table, (series, level, block) then (series, level)
    aggregates, and a series-window for the total — every frame after
    the first aggregate is bounded by series x buckets x 4.
    """
    return haar_energy(table(spark, sf_dir, "events"))


def haar_energy(e):
    from ..expressions import nan_to_null

    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    b = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("__hb"),
            cents.alias("__vc"),
        )
        .where(F.col("__vc").isNotNull())
        .groupBy("user_id", "__hb")
        .agg(F.sum("__vc").cast("long").alias("__y"))
    )
    w = Window.partitionBy("user_id")
    rb = b.select(
        "user_id",
        (F.col("__hb") - F.min("__hb").over(w)).cast("long").alias("__r"),
        "__y",
    )
    x = rb.select(
        "user_id", "__r", "__y", F.explode(F.expr(_HAAR_ARR)).alias("__lv")
    ).select(
        "user_id",
        F.col("__lv.l").alias("__l"),
        F.expr("__r div __lv.width").alias("__blk"),
        F.when(
            F.expr("(__r div __lv.half) % 2") == 0, F.col("__y")
        ).otherwise(-F.col("__y")).alias("__sy"),
    )
    d = x.groupBy("user_id", "__l", "__blk").agg(
        F.sum("__sy").cast("long").alias("__detail")
    )
    en = d.groupBy("user_id", "__l").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.col("__detail") * F.col("__detail")).cast("long").alias("energy"),
    )
    tot = F.sum("energy").over(Window.partitionBy("user_id")).cast("long")
    return (
        en.withColumn("__tot", tot)
        .select(
            "user_id",
            F.col("__l").alias("level"),
            "n_blocks",
            "energy",
            F.when(
                F.col("__tot") > 0,
                F.round(
                    F.col("energy").cast("double") / F.col("__tot").cast("double"), 6
                ),
            ).alias("energy_share"),
        )
        .orderBy("user_id", "level")
    )


@register(
    "events_dispersion",
    """WITH c AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hb
                  FROM events),
    b AS (SELECT user_id, hb, CAST(count(*) AS BIGINT) AS c
          FROM c GROUP BY 1, 2),
    a AS (SELECT user_id,
            CAST(max(hb) - min(hb) + 1 AS BIGINT) AS span,
            CAST(sum(c) AS BIGINT) AS t,
            CAST(sum(c * c) AS BIGINT) AS q FROM b GROUP BY 1)
    SELECT user_id, span AS n_buckets, t AS n_events,
       round(CAST(t AS DOUBLE) / CAST(span AS DOUBLE), 6) AS mean_per_hour,
       round(CAST(span * q - t * t AS DOUBLE)
             / CAST(span * t AS DOUBLE), 6) AS dispersion,
       CASE WHEN span > 1 THEN
         CAST(span * q - t * t AS DOUBLE) / CAST(span * t AS DOUBLE)
           > 1.0 + 2.0 * sqrt(2.0 / CAST(span - 1 AS DOUBLE))
       ELSE FALSE END AS overdispersed
    FROM a ORDER BY user_id""",
)
def events_dispersion(spark, sf_dir):
    """Poisson overdispersion screen per series: the index of
    dispersion D = var/mean of hourly event counts over the series'
    full hour span (empty hours count as zeros — max-min+1, not the
    occupied-bucket count), with a two-sigma normal-approximation flag
    (D ~ 1 + 2*sqrt(2/(n-1)) under H0: Poisson).  D > 1 means
    clustered/bursty arrivals, D < 1 regular — the count-domain twin of
    events_interarrival's gap-domain burstiness.  Exact int64 moments;
    D reduces to (span*q - t^2)/(span*t), ONE division (population
    variance over the span; zero buckets add nothing to t or q).  One
    fact scan -> (series, hour) count -> series aggregate; both
    aggregates map-side combine and no row ever leaves its series
    partition after the first shuffle."""
    return dispersion_profile(table(spark, sf_dir, "events"))


def dispersion_profile(e):
    b = (
        e.select(
            "user_id", F.expr("unix_micros(ts) div 3600000000").alias("__hb")
        )
        .groupBy("user_id", "__hb")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    a = b.groupBy("user_id").agg(
        (F.max("__hb") - F.min("__hb") + 1).cast("long").alias("__span"),
        F.sum("__c").cast("long").alias("__t"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__q"),
    )
    span, t, q = F.col("__span"), F.col("__t"), F.col("__q")
    disp = (span * q - t * t).cast("double") / (span * t).cast("double")
    return a.select(
        "user_id",
        span.alias("n_buckets"),
        t.alias("n_events"),
        F.round(t.cast("double") / span.cast("double"), 6).alias("mean_per_hour"),
        F.round(disp, 6).alias("dispersion"),
        F.when(
            span > 1,
            disp
            > F.lit(1.0)
            + F.lit(2.0) * F.sqrt(F.lit(2.0) / (span - 1).cast("double")),
        )
        .otherwise(F.lit(False))
        .alias("overdispersed"),
    ).orderBy("user_id")


@register(
    "events_type_entropy",
    """WITH c AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
                  FROM events GROUP BY 1, 2),
    a AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
                 CAST(count(*) AS BIGINT) AS k,
                 sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slc
          FROM c GROUP BY 1)
    SELECT user_id, n AS n_events, k AS k_types,
       round(ln(CAST(n AS DOUBLE)) - slc / CAST(n AS DOUBLE), 6)
         AS entropy_nats,
       CASE WHEN k > 1
            THEN round((ln(CAST(n AS DOUBLE)) - slc / CAST(n AS DOUBLE))
                       / ln(CAST(k AS DOUBLE)), 6) END AS entropy_norm,
       round(exp(ln(CAST(n AS DOUBLE)) - slc / CAST(n AS DOUBLE)), 6)
         AS perplexity
    FROM a ORDER BY user_id""",
)
def events_type_entropy(spark, sf_dir):
    """Shannon entropy of each series' event-type mix: H in nats via
    the count-moment identity H = ln N - (sum c*ln c)/N (ONE pass over
    exact int64 type counts — no per-type probability division), the
    ln-k-normalized evenness in [0,1], and the perplexity exp(H)
    ("effective number of event types") — the behavioral-diversity
    profile used for user segmentation and bot screening (entropy ~ 0:
    single-type automation; ~ ln k: uniform mixing).  Counts stay exact
    through both aggregates; ln/exp are the operator here and both
    engines agree to ~1 ulp on identical double inputs (the idf
    precedent), 1e-12-scale error into round(.,6).  One fact scan ->
    (series, type) count (map-side combinable) -> series aggregate."""
    return type_entropy(table(spark, sf_dir, "events"))


def type_entropy(e):
    c = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    a = c.groupBy("user_id").agg(
        F.sum("__c").cast("long").alias("__n"),
        F.count(F.lit(1)).cast("long").alias("__k"),
        F.sum(
            F.col("__c").cast("double") * F.log(F.col("__c").cast("double"))
        ).alias("__slc"),
    )
    n, k = F.col("__n"), F.col("__k")
    h = F.log(n.cast("double")) - F.col("__slc") / n.cast("double")
    return a.select(
        "user_id",
        n.alias("n_events"),
        k.alias("k_types"),
        F.round(h, 6).alias("entropy_nats"),
        F.when(k > 1, F.round(h / F.log(k.cast("double")), 6)).alias(
            "entropy_norm"
        ),
        F.round(F.exp(h), 6).alias("perplexity"),
    ).orderBy("user_id")


# KM estimator CTE chain, shared by orders_km_survival and the
# median/quartile summary (the curve SELECT wraps it; the summary reads
# the same curve through one more CTE).
_KM_CTES = """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
                  FROM orders),
    mx AS (SELECT max(d) AS mxd FROM o),
    s AS (SELECT o_custkey, d,
            lead(d) OVER (PARTITION BY o_custkey
                          ORDER BY d, o_orderkey) AS nxt
          FROM o),
    dur AS (
      SELECT CAST(date_diff('day', d, nxt) AS BIGINT) AS dur,
             CAST(1 AS BIGINT) AS ev
      FROM s WHERE nxt IS NOT NULL
      UNION ALL
      SELECT CAST(date_diff('day', d, mxd) AS BIGINT) AS dur,
             CAST(0 AS BIGINT) AS ev
      FROM s CROSS JOIN mx WHERE nxt IS NULL),
    g AS (SELECT dur, CAST(sum(ev) AS BIGINT) AS d_event,
                 CAST(sum(1 - ev) AS BIGINT) AS c_censored
          FROM dur GROUP BY 1),
    k AS (SELECT *,
            CAST(sum(d_event + c_censored) OVER () AS BIGINT)
              - coalesce(CAST(sum(d_event + c_censored) OVER
                  (ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING) AS BIGINT), CAST(0 AS BIGINT)) AS n_risk
          FROM g),
    l AS (SELECT *,
            CASE WHEN d_event = 0 THEN CAST(0 AS DOUBLE)
                 WHEN d_event < n_risk
                 THEN ln(CAST(n_risk - d_event AS DOUBLE)
                         / CAST(n_risk AS DOUBLE)) END AS lt,
            CASE WHEN d_event >= n_risk THEN 1 ELSE 0 END AS dead
          FROM k)"""

_KM_CURVE_SELECT = """SELECT dur AS dur_days, n_risk, d_event, c_censored,
       CASE WHEN d_event > 0
            THEN round(CAST(d_event AS DOUBLE) / CAST(n_risk AS DOUBLE), 6)
       END AS hazard,
       CASE WHEN CAST(sum(dead) OVER (ORDER BY dur) AS BIGINT) > 0
            THEN CAST(0 AS DOUBLE)
            ELSE round(exp(sum(lt) OVER (ORDER BY dur)), 6)
       END AS survival
    FROM l"""


@register(
    "orders_km_survival",
    f"{_KM_CTES}\n    {_KM_CURVE_SELECT} ORDER BY dur_days",
)
def orders_km_survival(spark, sf_dir):
    """Kaplan-Meier survival curve of customer inter-order waiting
    times with right censoring: every consecutive-order gap (days) is
    an observed event; each customer's open gap from their last order
    to the dataset's final date enters as censored (leaves the risk set
    without an event — dropping it would bias survival down, the
    classic churn-analysis mistake).  Per distinct duration: risk-set
    size, events, censorings, the discrete hazard d/n (exact int64
    division), and the product-limit survival estimate computed as
    exp(cumulative sum of ln((n-d)/n)) — the log-domain form turns the
    running product into a window sum accumulated in the SAME
    dur-ascending order by both engines; if the curve ever hits zero
    (d = n at the last event time) a cumulative flag pins survival to
    exactly 0 rather than exp(-inf).  Plan: orders scan -> lead window
    per customer (customer-partitioned), union with the censored
    tails, aggregate to the duration grain (<= max-gap-days rows,
    ~2.4k for the 7-year TPC-H span), then ordered windows over that
    single bounded frame — the one single-partition sort in the plan
    is over the duration GRID, never the fact table."""
    return km_survival(table(spark, sf_dir, "orders"))


def km_risk_table(orders):
    """(dur, d_event, c_censored, n_risk) — the duration-grid risk
    table both survival estimators (KM product-limit, Nelson-Aalen)
    read; factored so the estimators share one candidate plan."""
    o = orders.select(
        "o_custkey", F.to_date("o_orderdate").alias("__d"), "o_orderkey"
    )
    wc = Window.partitionBy("o_custkey").orderBy("__d", "o_orderkey")
    s = o.select(
        "o_custkey", "__d", F.lead("__d").over(wc).alias("__nxt")
    )
    mx = o.agg(F.max("__d").alias("__mxd"))
    events = s.where(F.col("__nxt").isNotNull()).select(
        F.datediff("__nxt", "__d").cast("long").alias("dur"),
        F.lit(1).cast("long").alias("__ev"),
    )
    censored = (
        s.where(F.col("__nxt").isNull())
        .crossJoin(F.broadcast(mx))
        .select(
            F.datediff("__mxd", "__d").cast("long").alias("dur"),
            F.lit(0).cast("long").alias("__ev"),
        )
    )
    g = (
        events.unionByName(censored)
        .groupBy("dur")
        .agg(
            F.sum("__ev").cast("long").alias("d_event"),
            F.sum(F.lit(1) - F.col("__ev")).cast("long").alias("c_censored"),
        )
    )
    w_all = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    at = F.col("d_event") + F.col("c_censored")
    return g.withColumn(
        "n_risk",
        (
            F.sum(at).over(w_all).cast("long")
            - F.coalesce(F.sum(at).over(w_prev).cast("long"), F.lit(0).cast("long"))
        ),
    )


def km_survival(orders):
    k = km_risk_table(orders)
    w_cum = Window.orderBy("dur")
    nr, de = F.col("n_risk"), F.col("d_event")
    lt = (
        F.when(de == 0, F.lit(0.0))
        .when(de < nr, F.log((nr - de).cast("double") / nr.cast("double")))
    )
    lrow = k.withColumn("__lt", lt).withColumn(
        "__dead", F.when(de >= nr, F.lit(1)).otherwise(F.lit(0))
    )
    return lrow.select(
        F.col("dur").alias("dur_days"),
        "n_risk",
        "d_event",
        "c_censored",
        F.when(de > 0, F.round(de.cast("double") / nr.cast("double"), 6)).alias(
            "hazard"
        ),
        F.when(
            F.sum("__dead").over(w_cum).cast("long") > 0, F.lit(0.0)
        )
        .otherwise(F.round(F.exp(F.sum("__lt").over(w_cum)), 6))
        .alias("survival"),
    ).orderBy("dur_days")


@register(
    "orders_hill_tail",
    """WITH r AS (SELECT o_orderpriority AS p, o_totalprice AS x,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC,
                                       o_orderkey DESC) AS rn
         FROM orders),
    th AS (SELECT p, x AS thr FROM r WHERE rn = 101),
    s AS (SELECT r.p, sum(ln(r.x / th.thr)) AS slog
          FROM r JOIN th ON th.p = r.p WHERE r.rn <= 100 GROUP BY r.p)
    SELECT s.p AS o_orderpriority, CAST(100 AS BIGINT) AS k_top,
           th.thr AS threshold,
           CASE WHEN s.slog > 0
                THEN round(CAST(100 AS DOUBLE) / s.slog, 6)
           END AS alpha
    FROM s JOIN th ON th.p = s.p ORDER BY o_orderpriority""",
)
def orders_hill_tail(spark, sf_dir):
    """Hill tail-index estimator per order priority: alpha = k / sum
    of ln(x_i / x_(k+1)) over the k=100 largest order values (heavier
    tail -> smaller alpha; alpha < 2 means infinite variance — the
    screen behind "can I trust a mean/stddev of this column at all").
    The top-(k+1) per group is EXACT but never sorts the fact table:
    rows are salted into 64 sub-groups (pmod(hash(orderkey), 64) —
    correctness is independent of the salt: the global top-101 is
    always contained in the union of per-salt top-101s), each sub-group
    keeps a sorted 101-struct array via map-side collect_list +
    sort_array + slice, and the merge re-sorts 64 x 101 bounded arrays
    per group — two aggregates with O(salt x k) state instead of a
    5-partition window sort that serializes the whole table through 5
    tasks at scale.  Ties at the boundary break by (price, orderkey)
    descending in both engines, so the selected SET is identical; the
    ln-ratio sum is the operator's one transcendental (~1e-13
    association error into round(.,6))."""
    return hill_tail(table(spark, sf_dir, "orders"))


def hill_tail(orders, k_top: int = 100, salt: int = 64):
    o = orders.select(
        F.col("o_orderpriority"),
        F.col("o_totalprice").alias("x"),
        F.col("o_orderkey").alias("k"),
    )
    k1 = k_top + 1
    s1 = o.groupBy(
        "o_orderpriority", F.pmod(F.hash("k"), F.lit(salt)).alias("__salt")
    ).agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct("x", "k")), asc=False), 1, k1
        ).alias("__part")
    )
    s2 = s1.groupBy("o_orderpriority").agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("__part")), asc=False), 1, k1
        ).alias("__top")
    )
    return (
        s2.where(F.size("__top") >= k1)
        .withColumn("__thr", F.element_at("__top", k1).getField("x"))
        .withColumn(
            "__slog",
            F.expr(
                f"aggregate(slice(__top, 1, {k_top}), CAST(0.0 AS DOUBLE),"
                " (acc, e) -> acc + ln(e.x / __thr))"
            ),
        )
        .select(
            "o_orderpriority",
            F.lit(k_top).cast("long").alias("k_top"),
            F.col("__thr").alias("threshold"),
            # slog = 0 when every top-k value ties the threshold (a
            # degenerate constant tail) — alpha is undefined there,
            # and ANSI mode errors on the bare division
            F.when(
                F.col("__slog") > 0,
                F.round(F.lit(float(k_top)) / F.col("__slog"), 6),
            ).alias("alpha"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "ts_ar1",
    """WITH c AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    p AS (SELECT user_id, hb, CAST(sum(vc) AS BIGINT) AS y
          FROM c WHERE vc IS NOT NULL GROUP BY 1, 2),
    lg AS (SELECT user_id, hb, y,
             lag(hb) OVER (PARTITION BY user_id ORDER BY hb) AS phb,
             lag(y) OVER (PARTITION BY user_id ORDER BY hb) AS py
           FROM p),
    pr AS (SELECT user_id, CAST(py AS BIGINT) AS x, y
           FROM lg WHERE phb = hb - 1),
    ctr AS (SELECT user_id, x, y,
              CAST(floor(CAST(sum(x) OVER (PARTITION BY user_id) AS DOUBLE)
                / CAST(count(*) OVER (PARTITION BY user_id) AS DOUBLE))
                AS BIGINT) AS mu
            FROM pr),
    agg AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(x - mu) AS BIGINT) AS sx,
              CAST(sum(y - mu) AS BIGINT) AS sy,
              CAST(sum((x - mu) * (x - mu)) AS BIGINT) AS sxx,
              CAST(sum((x - mu) * (y - mu)) AS BIGINT) AS sxy,
              CAST(min(mu) AS BIGINT) AS mu
            FROM ctr GROUP BY 1),
    d AS (SELECT *, CAST(n * sxy - sx * sy AS BIGINT) AS num,
                 CAST(n * sxx - sx * sx AS BIGINT) AS dx
          FROM agg)
    SELECT user_id, n AS n_pairs,
       CASE WHEN dx > 0
            THEN round(CAST(num AS DOUBLE) / CAST(dx AS DOUBLE), 6)
       END AS phi,
       CASE WHEN dx > 0 AND CAST(num AS DOUBLE) / CAST(dx AS DOUBLE) > 0
                 AND CAST(num AS DOUBLE) / CAST(dx AS DOUBLE) < 1
            THEN round(-ln(2.0) / ln(CAST(num AS DOUBLE)
                                     / CAST(dx AS DOUBLE)), 6)
       END AS half_life_hours,
       CASE WHEN dx > 0 AND abs(CAST(num AS DOUBLE) / CAST(dx AS DOUBLE)) < 1
            THEN round(CAST(mu AS DOUBLE)
              + ((CAST(sy AS DOUBLE)
                  - (CAST(num AS DOUBLE) / CAST(dx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))
                / (1.0 - CAST(num AS DOUBLE) / CAST(dx AS DOUBLE)), 6)
       END AS longrun_mean_cents
    FROM d ORDER BY user_id""",
)
def ts_ar1(spark, sf_dir):
    """AR(1) mean-reversion fit per series on hourly cent totals over
    CONSECUTIVE-hour pairs only (a gap breaks the lag-1 relation —
    pairing across gaps would bias phi toward the unconditional
    correlation): the autoregressive coefficient phi, the mean-reversion
    half-life -ln2/ln(phi) in hours (defined for 0 < phi < 1), and the
    implied long-run level c-hat/(1-phi) — the "how fast does this
    series forget a shock" screen that complements ts_ols_fit's trend
    and ts_autocorr's raw lag correlation.  Both regression variables
    are centered on the SAME integer floor-mean of the lagged value
    (window sum/count, IEEE-exact), keeping every product-sum
    variance-scale int64; phi is ONE division and every derived output
    reuses that division in a fixed textual order.  Plan: fact scan ->
    (series, hour) aggregate, then lag window, centering window, and
    final aggregate ALL partitioned by the series key — one data
    shuffle, three co-partitioned stages."""
    return ar1_fit(table(spark, sf_dir, "events"))


def ar1_fit(e):
    from ..expressions import nan_to_null

    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    p = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("__hb"),
            cents.alias("__vc"),
        )
        .where(F.col("__vc").isNotNull())
        .groupBy("user_id", "__hb")
        .agg(F.sum("__vc").cast("long").alias("__y"))
    )
    wo = Window.partitionBy("user_id").orderBy("__hb")
    lg = p.select(
        "user_id", "__hb", "__y",
        F.lag("__hb").over(wo).alias("__phb"),
        F.lag("__y").over(wo).alias("__py"),
    )
    pr = lg.where(F.col("__phb") == F.col("__hb") - 1).select(
        "user_id", F.col("__py").cast("long").alias("__x"), F.col("__y")
    )
    w = Window.partitionBy("user_id")
    mu = F.floor(
        F.sum("__x").over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    ).cast("long")
    ctr = pr.select(
        "user_id",
        (F.col("__x") - mu).alias("__cx"),
        (F.col("__y") - mu).alias("__cy"),
        mu.alias("__mu"),
    )
    agg = ctr.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__cx").cast("long").alias("__sx"),
        F.sum("__cy").cast("long").alias("__sy"),
        F.sum(F.col("__cx") * F.col("__cx")).cast("long").alias("__sxx"),
        F.sum(F.col("__cx") * F.col("__cy")).cast("long").alias("__sxy"),
        F.min("__mu").cast("long").alias("__mu"),
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    num = (n * F.col("__sxy") - sx * sy).cast("long")
    dx = (n * F.col("__sxx") - sx * sx).cast("long")
    d = agg.select(
        "user_id", "__n", "__sx", "__sy", "__mu",
        num.alias("__num"), dx.alias("__dx"),
    )
    phi = F.col("__num").cast("double") / F.col("__dx").cast("double")
    ok = F.col("__dx") > 0
    chat = (
        F.col("__sy").cast("double") - phi * F.col("__sx").cast("double")
    ) / F.col("__n").cast("double")
    # nest the guards: under ANSI mode a compound WHEN condition like
    # ok & (phi > 0) still evaluates phi's division on dx = 0 rows —
    # only the OUTER when(ok, ...) short-circuits it away
    return d.select(
        "user_id",
        F.col("__n").alias("n_pairs"),
        F.when(ok, F.round(phi, 6)).alias("phi"),
        F.when(
            ok,
            F.when(
                (phi > 0) & (phi < 1),
                F.round(-F.log(F.lit(2.0)) / F.log(phi), 6),
            ),
        ).alias("half_life_hours"),
        F.when(
            ok,
            F.when(
                F.abs(phi) < 1,
                F.round(
                    F.col("__mu").cast("double") + chat / (F.lit(1.0) - phi),
                    6,
                ),
            ),
        ).alias("longrun_mean_cents"),
    ).orderBy("user_id")


@register(
    "parts_skyline",
    """WITH pr AS (SELECT p_partkey, p_brand, CAST(p_size AS BIGINT) AS p_size,
           CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
         FROM part),
    dp AS (SELECT price_cents, CAST(max(p_size) AS BIGINT) AS pmax
           FROM pr GROUP BY 1),
    dp2 AS (SELECT price_cents, pmax,
              max(pmax) OVER (ORDER BY price_cents
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS smax
            FROM dp)
    SELECT pr.p_partkey, pr.p_brand, pr.p_size, pr.price_cents
    FROM pr JOIN dp2 ON dp2.price_cents = pr.price_cents
    WHERE NOT ((dp2.smax IS NOT NULL AND dp2.smax >= pr.p_size)
               OR dp2.pmax > pr.p_size)
    ORDER BY pr.price_cents, pr.p_partkey""",
)
def parts_skyline(spark, sf_dir):
    """2-D skyline (Pareto-front) operator: the parts not dominated in
    (minimize retail price, maximize size) — part A dominates B when A
    is no worse on both objectives and strictly better on one.  Ties on
    both objectives survive together (neither strictly dominates).  The
    classic sort-scan algorithm made declarative: collapse to the
    DISTINCT-PRICE grid (max size per price — domain-bounded, TPC-H
    prices land on ~a hundred thousand distinct cents values
    independent of row count), one prefix-max window over that grid for
    the best size among STRICTLY cheaper prices, then a broadcast join
    back to the full part table; dominated iff a strictly-cheaper price
    reaches the part's size, or its own price point holds a strictly
    larger one.  All integer comparisons — no floats anywhere.  The
    only ordered pass is over the price grid, never the fact table."""
    return skyline_2d(table(spark, sf_dir, "part"))


def skyline_2d(part):
    pr = part.select(
        "p_partkey",
        "p_brand",
        F.col("p_size").cast("long").alias("p_size"),
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
    )
    dp = pr.groupBy("price_cents").agg(
        F.max("p_size").cast("long").alias("__pmax")
    )
    wp = Window.orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    dp2 = dp.withColumn("__smax", F.max("__pmax").over(wp))
    dominated = (
        F.col("__smax").isNotNull() & (F.col("__smax") >= F.col("p_size"))
    ) | (F.col("__pmax") > F.col("p_size"))
    return (
        pr.join(F.broadcast(dp2), "price_cents")
        .where(~dominated)
        .select("p_partkey", "p_brand", "p_size", "price_cents")
        .orderBy("price_cents", "p_partkey")
    )


_ZIPF_K = 1000


@register(
    "doc_zipf_fit",
    f"""WITH tk AS (SELECT unnest(
            list_filter(regexp_split_to_array(lower(text), '\\s+'),
                        x -> x <> '')) AS tok FROM documents),
    c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM tk GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS vocab_size FROM c),
    r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok DESC) AS rk
          FROM c),
    f AS (SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
          FROM r WHERE rk <= {_ZIPF_K}),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
                 sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
          FROM f)
    SELECT tot.total_tokens, tot.vocab_size, m.n AS k_fit,
       round(-(CAST(m.n AS DOUBLE) * m.sxy - m.sx * m.sy)
             / (CAST(m.n AS DOUBLE) * m.sxx - m.sx * m.sx), 6) AS zipf_s,
       round(((CAST(m.n AS DOUBLE) * m.sxy - m.sx * m.sy)
              * (CAST(m.n AS DOUBLE) * m.sxy - m.sx * m.sy))
             / ((CAST(m.n AS DOUBLE) * m.sxx - m.sx * m.sx)
                * (CAST(m.n AS DOUBLE) * m.syy - m.sy * m.sy)), 6) AS r2
    FROM m CROSS JOIN tot""",
)
def doc_zipf_fit(spark, sf_dir):
    """Zipf's-law fit for the corpus token distribution: OLS of
    ln(frequency) on ln(rank) over the top-1000 tokens gives the Zipf
    exponent s (natural text: s ~ 0.9-1.2; templated/synthetic corpora
    drift off) plus the fit R^2 — a one-row corpus fingerprint used to
    screen scraped text for boilerplate collapse before training.  The
    rank table is an EXACT top-k that never globally sorts the
    vocabulary: per-salt sorted-array top-k then a 64-way bounded
    merge (the orders_hill_tail machinery), with (count desc, token
    desc) tiebreaks making the rank order identical in both engines;
    corpus totals ride a broadcast 1-row crossJoin.  The regression
    runs over 1000 rank rows — ln is the operator's transcendental,
    double moment sums carry ~1e-11 association error into
    round(.,6)."""
    return zipf_fit(table(spark, sf_dir, "documents"))


def zipf_fit(docs, k_fit: int = _ZIPF_K, salt: int = 64):
    from ..pipeline import text as ptext
    from ..util import default_parallelism

    spark = docs.sparkSession
    spread = docs.repartition(default_parallelism(spark), "doc_id")
    c = (
        spread.select(F.explode(ptext.tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tot = c.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
    )
    s1 = c.groupBy(F.pmod(F.hash("tok"), F.lit(salt)).alias("__s")).agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct("cnt", "tok")), asc=False),
            1,
            k_fit,
        ).alias("__part")
    )
    top = s1.agg(
        F.slice(
            F.sort_array(F.flatten(F.collect_list("__part")), asc=False),
            1,
            k_fit,
        ).alias("__top")
    )
    pts = top.select(
        F.posexplode("__top").alias("__pos", "__e")
    ).select(
        F.log((F.col("__pos") + 1).cast("double")).alias("__x"),
        F.log(F.col("__e.cnt").cast("double")).alias("__y"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    nd = F.col("__n").cast("double")
    num = nd * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dx = nd * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = nd * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return (
        m.crossJoin(F.broadcast(tot))
        .select(
            "total_tokens",
            "vocab_size",
            F.col("__n").alias("k_fit"),
            F.round(-num / dx, 6).alias("zipf_s"),
            F.round((num * num) / (dx * dy), 6).alias("r2"),
        )
    )


@register(
    "events_welch_ttest",
    """WITH c AS (SELECT event_type,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(vc) AS BIGINT) AS s,
                 CAST(sum(vc * vc) AS BIGINT) AS q
          FROM c WHERE vc IS NOT NULL GROUP BY 1),
    t AS (SELECT *, CAST(sum(n) OVER () AS BIGINT) AS nn,
                 CAST(sum(s) OVER () AS BIGINT) AS ss,
                 CAST(sum(q) OVER () AS BIGINT) AS qq FROM g),
    m AS (SELECT *, CAST(floor(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE))
                         AS BIGINT) AS mu FROM t),
    z AS (SELECT event_type, n, s, mu,
            CAST(s - n * mu AS BIGINT) AS s1,
            CAST(q - 2 * mu * s + n * mu * mu AS BIGINT) AS q1,
            CAST(nn - n AS BIGINT) AS n2,
            CAST((ss - nn * mu) - (s - n * mu) AS BIGINT) AS s2,
            CAST((qq - 2 * mu * ss + nn * mu * mu)
                 - (q - 2 * mu * s + n * mu * mu) AS BIGINT) AS q2
          FROM m),
    v AS (SELECT event_type, n, s, n2,
            CAST(s1 * n2 - s2 * n AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n2 AS DOUBLE)) AS md,
            (CAST(q1 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(n - 1 AS DOUBLE) AS v1,
            (CAST(q2 AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                 / CAST(n2 AS DOUBLE))
              / CAST(n2 - 1 AS DOUBLE) AS v2
          FROM z WHERE n > 1 AND n2 > 1),
    f AS (SELECT event_type, n, s, n2, md,
            v1 / CAST(n AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) AS se2,
            v1, v2 FROM v)
    SELECT event_type, n AS n_group,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_cents,
       CASE WHEN se2 > 0 THEN round(md / sqrt(se2), 6) END AS t_stat,
       CASE WHEN se2 > 0 AND v1 > 0 AND v2 > 0
            THEN round((se2 * se2)
              / ((v1 / CAST(n AS DOUBLE)) * (v1 / CAST(n AS DOUBLE))
                   / CAST(n - 1 AS DOUBLE)
                 + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
                   / CAST(n2 - 1 AS DOUBLE)), 6) END AS welch_df,
       coalesce(abs(CASE WHEN se2 > 0 THEN md / sqrt(se2) END) > 1.96,
                FALSE) AS mean_shift_flag
    FROM f ORDER BY event_type""",
)
def events_welch_ttest(spark, sf_dir):
    """Welch two-sample t-test of each event type's value mean against
    the REST of the population (the parametric twin of
    events_mannwhitney's rank test): t statistic, Welch-Satterthwaite
    degrees of freedom, and an alpha=.05 two-sided flag.  The rest-side
    moments are derived by subtraction from windowed grand totals over
    the |types|-row aggregate — one fact scan total.  All moments are
    exact int64 centered algebraically on the GLOBAL integer floor-mean
    (shared by both sides, so the mean difference is the exact rational
    (s1*n2 - s2*n1)/(n1*n2) and every n*q - s^2 stays variance-scale);
    sample variances, t, and df divide in a fixed textual order."""
    return welch_ttest(table(spark, sf_dir, "events"))


def welch_ttest(e):
    from ..expressions import nan_to_null

    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    g = (
        e.select("event_type", cents.alias("__vc"))
        .where(F.col("__vc").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__vc").cast("long").alias("__s"),
            F.sum(F.col("__vc") * F.col("__vc")).cast("long").alias("__q"),
        )
    )
    w = Window.partitionBy()
    t = g.select(
        "*",
        F.sum("__n").over(w).cast("long").alias("__nn"),
        F.sum("__s").over(w).cast("long").alias("__ss"),
        F.sum("__q").over(w).cast("long").alias("__qq"),
    )
    mu = F.floor(
        F.col("__ss").cast("double") / F.col("__nn").cast("double")
    ).cast("long")
    n, s, q = F.col("__n"), F.col("__s"), F.col("__q")
    nn, ss, qq = F.col("__nn"), F.col("__ss"), F.col("__qq")
    z = t.select(
        "event_type", "__n", "__s",
        (s - n * mu).cast("long").alias("__s1"),
        (q - F.lit(2) * mu * s + n * mu * mu).cast("long").alias("__q1"),
        (nn - n).cast("long").alias("__n2"),
        ((ss - nn * mu) - (s - n * mu)).cast("long").alias("__s2"),
        (
            (qq - F.lit(2) * mu * ss + nn * mu * mu)
            - (q - F.lit(2) * mu * s + n * mu * mu)
        ).cast("long").alias("__q2"),
    ).where((F.col("__n") > 1) & (F.col("__n2") > 1))
    n1d = F.col("__n").cast("double")
    n2d = F.col("__n2").cast("double")
    md = (F.col("__s1") * F.col("__n2") - F.col("__s2") * F.col("__n")).cast(
        "double"
    ) / (n1d * n2d)
    # double-form sample variance (q - s^2/n)/(n-1): the int64 n*q
    # product overflows at sf1 group sizes; after global-mean centering
    # s^2/n << q so the double subtraction is cancellation-free
    s1d = F.col("__s1").cast("double")
    s2d = F.col("__s2").cast("double")
    v1 = (F.col("__q1").cast("double") - s1d * s1d / n1d) / (n1d - 1)
    v2 = (F.col("__q2").cast("double") - s2d * s2d / n2d) / (n2d - 1)
    f = z.select(
        "event_type", "__n", "__s", "__n2",
        md.alias("__md"), v1.alias("__v1"), v2.alias("__v2"),
        (v1 / n1d + v2 / n2d).alias("__se2"),
    )
    se2 = F.col("__se2")
    tstat = F.col("__md") / F.sqrt(se2)
    a = F.col("__v1") / F.col("__n").cast("double")
    b = F.col("__v2") / F.col("__n2").cast("double")
    return f.select(
        "event_type",
        F.col("__n").alias("n_group"),
        F.round(F.col("__s").cast("double") / F.col("__n").cast("double"), 6).alias(
            "mean_cents"
        ),
        F.when(se2 > 0, F.round(tstat, 6)).alias("t_stat"),
        F.when(
            (se2 > 0) & (F.col("__v1") > 0) & (F.col("__v2") > 0),
            F.round(
                (se2 * se2)
                / (
                    a * a / (F.col("__n").cast("double") - 1)
                    + b * b / (F.col("__n2").cast("double") - 1)
                ),
                6,
            ),
        ).alias("welch_df"),
        F.coalesce(
            F.abs(F.when(se2 > 0, tstat)) > 1.96, F.lit(False)
        ).alias("mean_shift_flag"),
    ).orderBy("event_type")


@register(
    "events_type_corr",
    """WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    h AS (SELECT event_type, hb, CAST(sum(vc) AS BIGINT) AS y
          FROM c WHERE vc IS NOT NULL GROUP BY 1, 2),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 a.y AS xa, b.y AS xb
          FROM h a JOIN h b ON a.hb = b.hb AND a.event_type < b.event_type),
    m AS (SELECT type_a, type_b, xa, xb,
            CAST(floor(CAST(sum(xa) OVER (PARTITION BY type_a, type_b)
                            AS DOUBLE)
              / CAST(count(*) OVER (PARTITION BY type_a, type_b) AS DOUBLE))
              AS BIGINT) AS mua,
            CAST(floor(CAST(sum(xb) OVER (PARTITION BY type_a, type_b)
                            AS DOUBLE)
              / CAST(count(*) OVER (PARTITION BY type_a, type_b) AS DOUBLE))
              AS BIGINT) AS mub
          FROM p),
    agg AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xa - mua) AS BIGINT) AS sa,
             CAST(sum(xb - mub) AS BIGINT) AS sb,
             CAST(sum((xa - mua) * (xa - mua)) AS BIGINT) AS qa,
             CAST(sum((xb - mub) * (xb - mub)) AS BIGINT) AS qb,
             CAST(sum((xa - mua) * (xb - mub)) AS BIGINT) AS sab
            FROM m GROUP BY 1, 2)
    SELECT type_a, type_b, n AS n_hours,
       CASE WHEN CAST(qa AS DOUBLE)
                   - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                     / CAST(n AS DOUBLE) > 0
             AND CAST(qb AS DOUBLE)
                   - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                     / CAST(n AS DOUBLE) > 0
            THEN round((CAST(sab AS DOUBLE)
                        - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
                          / CAST(n AS DOUBLE))
                       / sqrt((CAST(qa AS DOUBLE)
                               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                              * (CAST(qb AS DOUBLE)
                                 - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                                   / CAST(n AS DOUBLE))), 6)
       END AS pearson_r
    FROM agg ORDER BY type_a, type_b""",
)
def events_type_corr(spark, sf_dir):
    """Pairwise Pearson correlation between event TYPES' hourly value
    totals over co-occurring hours — do purchases and clicks move
    together hour to hour?  The cross-series complement of
    ts_rolling_corr's per-series benchmark correlation.  The fact
    collapses to the (type, hour) grain first, so the self-join is
    |types| x hours rows on the hour key (never event x event); each
    pair's variables are centered on their own integer floor-means
    (pair-partitioned windows) keeping all product-sums variance-scale
    int64, then r is one division by one sqrt.  Type pairs are ordered
    a < b in both engines."""
    return type_corr(table(spark, sf_dir, "events"))


def type_corr(e):
    from ..expressions import nan_to_null

    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    h = (
        e.select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("__hb"),
            cents.alias("__vc"),
        )
        .where(F.col("__vc").isNotNull())
        .groupBy("event_type", "__hb")
        .agg(F.sum("__vc").cast("long").alias("__y"))
    )
    a = h.select(
        F.col("event_type").alias("type_a"),
        F.col("__hb"),
        F.col("__y").alias("__xa"),
    )
    b = h.select(
        F.col("event_type").alias("type_b"),
        F.col("__hb"),
        F.col("__y").alias("__xb"),
    )
    p = a.join(b, "__hb").where(F.col("type_a") < F.col("type_b"))
    w = Window.partitionBy("type_a", "type_b")
    mua = F.floor(
        F.sum("__xa").over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    ).cast("long")
    mub = F.floor(
        F.sum("__xb").over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    ).cast("long")
    m = p.select(
        "type_a", "type_b",
        (F.col("__xa") - mua).alias("__ca"),
        (F.col("__xb") - mub).alias("__cb"),
    )
    agg = m.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__ca").cast("long").alias("__sa"),
        F.sum("__cb").cast("long").alias("__sb"),
        F.sum(F.col("__ca") * F.col("__ca")).cast("long").alias("__qa"),
        F.sum(F.col("__cb") * F.col("__cb")).cast("long").alias("__qb"),
        F.sum(F.col("__ca") * F.col("__cb")).cast("long").alias("__sab"),
    )
    # double-form central moments (q - s^2/n): int64 n*q products would
    # overflow once hourly sums grow past ~sf1 densities; after
    # pair-mean centering s^2/n << q so no cancellation
    n = F.col("__n")
    nd = n.cast("double")
    sad = F.col("__sa").cast("double")
    sbd = F.col("__sb").cast("double")
    da = F.col("__qa").cast("double") - sad * sad / nd
    db = F.col("__qb").cast("double") - sbd * sbd / nd
    num = F.col("__sab").cast("double") - sad * sbd / nd
    return agg.select(
        "type_a",
        "type_b",
        n.alias("n_hours"),
        F.when(
            (da > 0) & (db > 0),
            F.round(num / F.sqrt(da * db), 6),
        ).alias("pearson_r"),
    ).orderBy("type_a", "type_b")


_EULER_GAMMA = "0.5772156649015329"


@register(
    "ts_record_stats",
    f"""WITH c AS (SELECT user_id, ts, event_id,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    o AS (SELECT * FROM c WHERE vc IS NOT NULL),
    r AS (SELECT user_id, vc,
            max(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmax,
            min(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS pmin
          FROM o),
    a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(CASE WHEN pmax IS NULL OR vc > pmax
                          THEN 1 ELSE 0 END) AS BIGINT) AS hi,
            CAST(sum(CASE WHEN pmin IS NULL OR vc < pmin
                          THEN 1 ELSE 0 END) AS BIGINT) AS lo
          FROM r GROUP BY 1)
    SELECT user_id, n AS n_obs, hi AS hi_records, lo AS lo_records,
       round(ln(CAST(n AS DOUBLE)) + {_EULER_GAMMA}
             + 1.0 / (2.0 * CAST(n AS DOUBLE)), 6) AS expected_records,
       round(CAST(hi AS DOUBLE)
             / (ln(CAST(n AS DOUBLE)) + {_EULER_GAMMA}
                + 1.0 / (2.0 * CAST(n AS DOUBLE))), 6) AS hi_ratio,
       round(CAST(lo AS DOUBLE)
             / (ln(CAST(n AS DOUBLE)) + {_EULER_GAMMA}
                + 1.0 / (2.0 * CAST(n AS DOUBLE))), 6) AS lo_ratio
    FROM a ORDER BY user_id""",
)
def ts_record_stats(spark, sf_dir):
    """Record statistics per series: the count of running record highs
    and record lows (strict new extrema in (ts, event_id) order, exact
    int64 cents comparisons — ties are NOT records) against the
    iid-expected record count H_n ~ ln n + gamma + 1/(2n).  Under
    exchangeability both ratios sit near 1; an upward-trending or
    scale-drifting series inflates hi_ratio far beyond it — a
    distribution-free trend screen that needs no residual model,
    complementing ts_theil_sen (magnitude) and ts_runs_test
    (randomness).  One ordered window pass per series (prefix max and
    min share the same frame) then a series aggregate; both engines
    count the identical record set because the comparisons are
    integer."""
    return record_stats(table(spark, sf_dir, "events"))


def record_stats(e):
    from ..expressions import nan_to_null

    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    o = e.select(
        "user_id", "ts", "event_id", cents.alias("__vc")
    ).where(F.col("__vc").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = o.select(
        "user_id",
        "__vc",
        F.max("__vc").over(w).alias("__pmax"),
        F.min("__vc").over(w).alias("__pmin"),
    )
    a = r.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(
            F.when(
                F.col("__pmax").isNull() | (F.col("__vc") > F.col("__pmax")), 1
            ).otherwise(0)
        ).cast("long").alias("hi_records"),
        F.sum(
            F.when(
                F.col("__pmin").isNull() | (F.col("__vc") < F.col("__pmin")), 1
            ).otherwise(0)
        ).cast("long").alias("lo_records"),
    )
    nd = F.col("n_obs").cast("double")
    exp_rec = F.log(nd) + F.lit(float(_EULER_GAMMA)) + 1.0 / (2.0 * nd)
    return a.select(
        "user_id",
        "n_obs",
        "hi_records",
        "lo_records",
        F.round(exp_rec, 6).alias("expected_records"),
        F.round(F.col("hi_records").cast("double") / exp_rec, 6).alias("hi_ratio"),
        F.round(F.col("lo_records").cast("double") / exp_rec, 6).alias("lo_ratio"),
    ).orderBy("user_id")


@register(
    "doc_lexical_diversity",
    """WITH tk AS (SELECT source, unnest(
            list_filter(regexp_split_to_array(lower(text), '\\s+'),
                        x -> x <> '')) AS tok FROM documents),
    c AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS cnt
          FROM tk GROUP BY 1, 2),
    a AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
            CAST(count(*) AS BIGINT) AS vocab,
            CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
          FROM c GROUP BY 1)
    SELECT source, n_tokens, vocab, hapax,
       round(CAST(vocab AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
       round(CAST(hapax AS DOUBLE) / CAST(vocab AS DOUBLE), 6) AS hapax_share,
       CASE WHEN n_tokens > 1 AND vocab > 1
            THEN round(ln(CAST(vocab AS DOUBLE))
                       / ln(CAST(n_tokens AS DOUBLE)), 6)
       END AS herdan_c
    FROM a ORDER BY source""",
)
def doc_lexical_diversity(spark, sf_dir):
    """Lexical diversity profile per corpus source: type-token ratio,
    hapax-legomena share (tokens seen exactly once — high in natural
    text, collapsing under template spam or aggressive dedup), and
    Herdan's C = ln V / ln N (the size-robust TTR variant) — together
    with doc_zipf_fit these are the corpus-health fingerprints checked
    before a source is admitted to a training mix.  One tokenize
    explode (corpus spread by doc_id first) -> (source, token) count
    (map-side combinable) -> source aggregate; all counts exact int64,
    ln the only transcendental."""
    return lexical_diversity(table(spark, sf_dir, "documents"))


def lexical_diversity(docs):
    from ..pipeline import text as ptext
    from ..util import default_parallelism

    spark = docs.sparkSession
    spread = docs.repartition(default_parallelism(spark), "doc_id")
    c = (
        spread.select(
            "source", F.explode(ptext.tokens(F.col("text"))).alias("__tok")
        )
        .groupBy("source", "__tok")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )
    a = c.groupBy("source").agg(
        F.sum("__cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("__cnt") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax"),
    )
    nd = F.col("n_tokens").cast("double")
    vd = F.col("vocab").cast("double")
    return a.select(
        "source",
        "n_tokens",
        "vocab",
        "hapax",
        F.round(vd / nd, 6).alias("ttr"),
        F.round(F.col("hapax").cast("double") / vd, 6).alias("hapax_share"),
        F.when(
            (F.col("n_tokens") > 1) & (F.col("vocab") > 1),
            F.round(F.log(vd) / F.log(nd), 6),
        ).alias("herdan_c"),
    ).orderBy("source")


@register(
    "orders_in_flight",
    """WITH st AS (SELECT CAST(o.o_orderdate AS DATE) AS d,
                CAST(count(*) AS BIGINT) AS starts,
                CAST(0 AS BIGINT) AS ends
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          GROUP BY 1),
    en AS (SELECT CAST(l_shipdate AS DATE) AS d,
                CAST(0 AS BIGINT) AS starts,
                CAST(count(*) AS BIGINT) AS ends
          FROM lineitem GROUP BY 1),
    u AS (SELECT d, CAST(sum(starts) AS BIGINT) AS starts,
                 CAST(sum(ends) AS BIGINT) AS ends
          FROM (SELECT * FROM st UNION ALL SELECT * FROM en) GROUP BY 1)
    SELECT d AS day, starts, ends,
       CAST(sum(starts - ends) OVER (ORDER BY d) AS BIGINT) AS open_items
    FROM u ORDER BY day""",
)
def orders_in_flight(spark, sf_dir):
    """Work-in-progress backlog over time by sweep line: per calendar
    day, how many line items entered flight (their order was placed),
    how many left (shipped), and the running count still unshipped —
    the interval-stabbing "how many intervals cover each day" operator
    (capacity planning / backlog monitoring) done WITHOUT expanding
    intervals into their covered days: each lineitem contributes
    exactly one +1 and one -1 delta, the deltas aggregate map-side to
    the date grain, and the only ordered pass is a running sum over
    the ~2.4k-day date GRID.  An interval-expansion formulation would
    emit O(total interval length) rows — this one is O(distinct days)
    after two linear scans.  Counting is exact int64 end-to-end; the
    orders join is a key join on o_orderkey (shipdate comes from
    lineitem, orderdate from its order)."""
    return in_flight(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    )


def in_flight(li, o):
    st = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("starts"))
        .withColumn("ends", F.lit(0).cast("long"))
    )
    en = (
        li.groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("ends"))
        .withColumn("starts", F.lit(0).cast("long"))
    )
    u = (
        st.select("d", "starts", "ends")
        .unionByName(en.select("d", "starts", "ends"))
        .groupBy("d")
        .agg(
            F.sum("starts").cast("long").alias("starts"),
            F.sum("ends").cast("long").alias("ends"),
        )
    )
    w = Window.orderBy("d")
    return u.select(
        F.col("d").alias("day"),
        "starts",
        "ends",
        F.sum(F.col("starts") - F.col("ends")).over(w).cast("long").alias(
            "open_items"
        ),
    ).orderBy("day")


@register(
    "orders_contingency",
    """WITH c AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
            o_orderpriority AS prio, CAST(count(*) AS BIGINT) AS n
          FROM orders GROUP BY 1, 2),
    t AS (SELECT *, CAST(sum(n) OVER (PARTITION BY ym) AS BIGINT) AS row_t,
            CAST(sum(n) OVER (PARTITION BY prio) AS BIGINT) AS col_t,
            CAST(sum(n) OVER () AS BIGINT) AS grand FROM c)
    SELECT ym, prio, n AS n_orders,
       round(CAST(row_t * col_t AS DOUBLE) / CAST(grand AS DOUBLE), 6)
         AS expected,
       round((CAST(n AS DOUBLE)
              - CAST(row_t * col_t AS DOUBLE) / CAST(grand AS DOUBLE))
             / sqrt(CAST(row_t * col_t AS DOUBLE) / CAST(grand AS DOUBLE)),
             6) AS std_residual,
       abs((CAST(n AS DOUBLE)
            - CAST(row_t * col_t AS DOUBLE) / CAST(grand AS DOUBLE))
           / sqrt(CAST(row_t * col_t AS DOUBLE) / CAST(grand AS DOUBLE)))
         > 3.0 AS cell_flag
    FROM t ORDER BY ym, prio""",
)
def orders_contingency(spark, sf_dir):
    """Chi-square independence residuals for the month x priority
    contingency table: per cell the observed count, the
    independence-expected count e = row_total * col_total / grand (one
    int64 cross-product, ONE division), the standardized Pearson
    residual (n - e)/sqrt(e), and a |resid| > 3 drift flag — "did the
    order-priority mix shift in some month", the composition-drift
    screen behind mix monitoring (the cells whose residuals spike ARE
    the answer, unlike a single global chi2 that only says
    'something').  The fact collapses to at most months x priorities
    cells in one map-side-combinable aggregate; marginals come from
    three windows over that bounded cell table — no second fact
    scan."""
    return contingency_residuals(table(spark, sf_dir, "orders"))


def contingency_residuals(o):
    c = o.groupBy(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("ym"),
        F.col("o_orderpriority").alias("prio"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    t = c.select(
        "*",
        F.sum("n_orders").over(Window.partitionBy("ym")).cast("long").alias("__rt"),
        F.sum("n_orders").over(Window.partitionBy("prio")).cast("long").alias("__ct"),
        F.sum("n_orders").over(Window.partitionBy()).cast("long").alias("__g"),
    )
    e = (F.col("__rt") * F.col("__ct")).cast("double") / F.col("__g").cast(
        "double"
    )
    resid = (F.col("n_orders").cast("double") - e) / F.sqrt(e)
    return t.select(
        "ym",
        "prio",
        "n_orders",
        F.round(e, 6).alias("expected"),
        F.round(resid, 6).alias("std_residual"),
        (F.abs(resid) > 3.0).alias("cell_flag"),
    ).orderBy("ym", "prio")


_HW_ZEROS = "[" + ", ".join(["CAST(0 AS DOUBLE)"] * 24) + "]"


@register(
    "ts_holt_winters",
    f"""WITH RECURSIVE c0 AS (SELECT user_id,
           epoch_us(ts) // 3600000000 AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    b AS (SELECT user_id, hb, CAST(sum(vc) AS DOUBLE) AS y
          FROM c0 WHERE vc IS NOT NULL GROUP BY 1, 2),
    o AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY hb)
                    AS rn FROM b),
    r AS (
      SELECT user_id, rn, hb, y AS l, CAST(0 AS DOUBLE) AS t,
             {_HW_ZEROS} AS s
      FROM o WHERE rn = 1
      UNION ALL
      SELECT user_id, rn, hb, nl,
         0.25 * (nl - pl) + 0.75 * pt,
         list_slice(ps, 1, h)
           || [0.25 * (y - nl) + 0.75 * ps[h + 1]]
           || list_slice(ps, h + 2, 24)
      FROM (SELECT o.user_id, o.rn, o.hb, o.y, r.l AS pl, r.t AS pt,
               r.s AS ps, CAST(o.hb % 24 AS INT) AS h,
               0.5 * (o.y - r.s[CAST(o.hb % 24 AS INT) + 1])
                 + 0.5 * (r.l + r.t) AS nl
            FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1))
    SELECT user_id, hb AS hour_bucket, round(l, 6) AS level,
       round(t, 6) AS trend,
       round(s[CAST(hb % 24 AS INT) + 1], 6) AS season
    FROM r ORDER BY user_id, hour_bucket""",
)
def ts_holt_winters(spark, sf_dir):
    """Additive Holt-Winters triple exponential smoothing (α=0.5,
    β=0.25, γ=0.25, period 24) per series over hourly cent totals,
    seasonals anchored to the calendar hour of day so gaps don't shift
    the season — level/trend/season per bucket, the seasonal
    forecaster that complements ts_holt (trend only) and
    ts_seasonal_decompose (retrospective averages).  The three-state
    recurrence with its 24-slot seasonal vector runs as an
    Arrow-batched sequential kernel (temporal.holt_winters, the
    ewma/holt bucketed shape); the oracle threads the seasonal vector
    through a recursive CTE as a LIST, updating one slot per step by
    slice concatenation.  Dyadic smoothing constants keep every
    multiply IEEE-exact, so the engines are bit-identical before
    round(6).

    The kernel output is cached before the final orderBy: a global
    sort range-partitions via a SAMPLE PASS over its child, which
    would execute the sequential Python kernel twice (measured r9:
    3.95s -> ~2.2s warm at sf0.1 with the cache; the conformal r8
    cached-residual idiom). The cache is bucket-grain (~96k rows at
    sf0.1), and the harness clearCache()s between queries."""
    out = temporal.holt_winters(table(spark, sf_dir, "events")).cache()
    from ..queries._base import duck_round6

    return out.select(
        "user_id",
        "hour_bucket",
        duck_round6(F.col("level")).alias("level"),
        duck_round6(F.col("trend")).alias("trend"),
        duck_round6(F.col("season")).alias("season"),
    ).orderBy("user_id", "hour_bucket")


_HW_REC = f"""c0 AS (SELECT user_id,
           epoch_us(ts) // 3600000000 AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    b AS (SELECT user_id, hb, CAST(sum(vc) AS DOUBLE) AS y
          FROM c0 WHERE vc IS NOT NULL GROUP BY 1, 2),
    o AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY hb)
                    AS rn FROM b),
    r AS (
      SELECT user_id, rn, hb, y, y AS l, CAST(0 AS DOUBLE) AS t,
             {_HW_ZEROS} AS s, CAST(NULL AS DOUBLE) AS f
      FROM o WHERE rn = 1
      UNION ALL
      SELECT user_id, rn, hb, y, nl,
         0.25 * (nl - pl) + 0.75 * pt,
         list_slice(ps, 1, h)
           || [0.25 * (y - nl) + 0.75 * ps[h + 1]]
           || list_slice(ps, h + 2, 24),
         (pl + pt) + ps[h + 1]
      FROM (SELECT o.user_id, o.rn, o.hb, o.y, r.l AS pl, r.t AS pt,
               r.s AS ps, CAST(o.hb % 24 AS INT) AS h,
               0.5 * (o.y - r.s[CAST(o.hb % 24 AS INT) + 1])
                 + 0.5 * (r.l + r.t) AS nl
            FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1))"""


@register(
    "ts_hw_anomaly",
    f"""WITH RECURSIVE {_HW_REC},
    rr AS (SELECT user_id, hb, y, f, y - f AS resid
           FROM r WHERE f IS NOT NULL),
    md AS (SELECT user_id,
             list_sort(list(abs(resid))) AS arr FROM rr GROUP BY 1),
    md2 AS (SELECT user_id,
             {{Q}} AS mad FROM md)
    SELECT rr.user_id, rr.hb AS hour_bucket,
       CAST(rr.y AS BIGINT) AS y_cents,
       round(rr.f, 6) AS forecast_cents,
       round(rr.resid, 6) AS residual_cents,
       CASE WHEN md2.mad > 0 THEN abs(rr.resid) > 5.0 * md2.mad
            ELSE abs(rr.resid) > 0.0 END AS is_anomaly
    FROM rr JOIN md2 ON md2.user_id = rr.user_id
    ORDER BY rr.user_id, hour_bucket""".replace(
        "{Q}", spark_quantile_sql("arr", 0.5)
    ),
)
def ts_hw_anomaly(spark, sf_dir):
    """Seasonal forecast-residual anomaly detection: each hourly
    bucket is compared against the additive Holt-Winters ONE-step-ahead
    forecast (level + trend + the hour's seasonal, all from state
    BEFORE the bucket's own update — no lookahead leak), and flagged
    when |residual| exceeds 5x the series' exact median absolute
    residual.  This is the anomaly-detection payoff of ts_holt_winters:
    a level shift, a missing daily peak, or an off-cycle burst all
    break the forecast even when raw-value detectors (range/zscore)
    stay quiet because the value is "normal for some other hour".
    Residuals are bit-identical across engines (dyadic HW recurrence on
    exact cent sums), so the MAD comparison — Spark exact percentile vs
    the oracle's interpolation-matched list quantile — flags the
    identical set.  The MAD attaches via a series-partitioned window
    over the bucket-grain frame, never a second fact scan.  Like
    ts_holt_winters, the kernel output is cached so the final
    orderBy's range-partitioning sample pass doesn't run the
    sequential kernel twice (r9)."""
    hw = temporal.holt_winters(table(spark, sf_dir, "events")).cache()
    rr = hw.where(F.col("forecast").isNotNull()).select(
        "user_id",
        "hour_bucket",
        "bucket_cents",
        "forecast",
        (F.col("bucket_cents") - F.col("forecast")).alias("__resid"),
    )
    w = Window.partitionBy("user_id")
    mad = F.expr("percentile(abs(__resid), 0.5)").over(w)
    r2 = rr.withColumn("__mad", mad)
    flag = F.when(
        F.col("__mad") > 0, F.abs(F.col("__resid")) > 5.0 * F.col("__mad")
    ).otherwise(F.abs(F.col("__resid")) > 0.0)
    return r2.select(
        "user_id",
        "hour_bucket",
        F.col("bucket_cents").cast("long").alias("y_cents"),
        F.round("forecast", 6).alias("forecast_cents"),
        F.round("__resid", 6).alias("residual_cents"),
        flag.alias("is_anomaly"),
    ).orderBy("user_id", "hour_bucket")


@register(
    "ts_peaks",
    """WITH c AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    b AS (SELECT user_id, hb, CAST(sum(vc) AS BIGINT) AS y
          FROM c WHERE vc IS NOT NULL GROUP BY 1, 2),
    w AS (SELECT user_id, hb, y,
            list(y) OVER (PARTITION BY user_id ORDER BY hb
                          RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS arr,
            CAST(sum(y) OVER (PARTITION BY user_id ORDER BY hb
                  RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT)
              AS s12,
            CAST(count(*) OVER (PARTITION BY user_id ORDER BY hb
                  RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT)
              AS n12
          FROM b),
    f AS (SELECT user_id, hb, y, s12, n12,
            y = list_max(arr)
              AND len(list_filter(arr, v -> v = list_max(arr))) = 1
              AS cand_peak,
            y = list_min(arr)
              AND len(list_filter(arr, v -> v = list_min(arr))) = 1
              AS cand_valley,
            CAST(n12 * y - s12 AS DOUBLE) / CAST(n12 AS DOUBLE) AS height
          FROM w)
    SELECT user_id, hb AS hour_bucket, y AS y_cents,
       CASE WHEN cand_peak AND height >= 500.0 THEN 'peak'
            ELSE 'valley' END AS kind,
       round(height, 6) AS height_cents
    FROM f
    WHERE (cand_peak AND height >= 500.0)
       OR (cand_valley AND height <= -500.0)
    ORDER BY user_id, hour_bucket""",
)
def ts_peaks(spark, sf_dir):
    """Windowed peak / valley detection on hourly cent totals: a
    bucket is a PEAK when it is the UNIQUE maximum among every bucket
    within +-3 hours of it (RANGE frame on the hour index, so gaps
    neither create nor hide extrema; a tie anywhere in the frame
    disqualifies both rivals) AND sits at least $5 above the +-12h
    local mean (the prominence proxy that rejects flat-plateau
    "maxima" of noise); valleys mirror with the unique minimum and
    -$5.  Uniqueness is decided on the frame's collected value list
    (<= 7 elements), so the test really is against THIS bucket's
    neighborhood max; all comparisons are exact int64 and the height
    is the single division (n*y - sum)/n over the +-12h frame.  One
    fact scan -> (series, hour) aggregate, then RANGE windows all
    sharing the series partitioning — no joins, nothing larger than
    the bucket grid is ever re-scanned."""
    return peaks(table(spark, sf_dir, "events"))


def peaks(e, span: int = 3, base_span: int = 12, min_height_cents: int = 500):
    from ..expressions import nan_to_null

    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    b = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("__hb"),
            cents.alias("__vc"),
        )
        .where(F.col("__vc").isNotNull())
        .groupBy("user_id", "__hb")
        .agg(F.sum("__vc").cast("long").alias("__y"))
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("__hb")
        .rangeBetween(-span, span)
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("__hb")
        .rangeBetween(-base_span, base_span)
    )
    w1 = b.select(
        "user_id",
        "__hb",
        "__y",
        F.collect_list("__y").over(wn).alias("__arr"),
        F.sum("__y").over(wb).cast("long").alias("__s12"),
        F.count(F.lit(1)).over(wb).cast("long").alias("__n12"),
    )
    mx = F.array_max("__arr")
    mn = F.array_min("__arr")
    n_at_max = F.size(F.filter("__arr", lambda v: v == mx))
    n_at_min = F.size(F.filter("__arr", lambda v: v == mn))
    cand_peak = (F.col("__y") == mx) & (n_at_max == 1)
    cand_valley = (F.col("__y") == mn) & (n_at_min == 1)
    height = (F.col("__n12") * F.col("__y") - F.col("__s12")).cast(
        "double"
    ) / F.col("__n12").cast("double")
    thr = float(min_height_cents)
    return (
        w1.withColumn("__height", height)
        .where(
            (cand_peak & (F.col("__height") >= thr))
            | (cand_valley & (F.col("__height") <= -thr))
        )
        .select(
            "user_id",
            F.col("__hb").alias("hour_bucket"),
            F.col("__y").alias("y_cents"),
            # a gap-isolated bucket is BOTH the unique max and min of
            # its singleton frame — the label must follow the branch
            # that actually passed the height floor
            F.when(
                cand_peak & (F.col("__height") >= thr), F.lit("peak")
            ).otherwise(F.lit("valley")).alias("kind"),
            F.round("__height", 6).alias("height_cents"),
        )
        .orderBy("user_id", "hour_bucket")
    )


@register(
    "orders_km_segment_summary",
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
    sv AS (SELECT seg, dur, de, ce,
            CASE WHEN CAST(sum(dead) OVER (PARTITION BY seg ORDER BY dur)
                      AS BIGINT) > 0
                 THEN CAST(0 AS DOUBLE)
                 ELSE exp(sum(lt) OVER (PARTITION BY seg ORDER BY dur))
            END AS surv
          FROM l),
    st AS (SELECT seg, dur, de, ce, surv,
            coalesce(lag(dur) OVER (PARTITION BY seg ORDER BY dur),
                     CAST(0 AS BIGINT)) AS pdur,
            coalesce(lag(surv) OVER (PARTITION BY seg ORDER BY dur),
                     CAST(1 AS DOUBLE)) AS psurv
          FROM sv)
    SELECT seg AS c_mktsegment,
       CAST(sum(de) AS BIGINT) AS n_events,
       CAST(sum(ce) AS BIGINT) AS n_censored,
       min(CASE WHEN surv <= 0.5 THEN dur END) AS median_gap_days,
       round(sum(psurv * CAST(dur - pdur AS DOUBLE)), 6) AS rmst_days
    FROM st GROUP BY 1 ORDER BY c_mktsegment""",
)
def orders_km_segment_summary(spark, sf_dir):
    """Kaplan-Meier survival SUMMARY per customer market segment: do
    BUILDING customers reorder faster than MACHINERY?  Per segment:
    event/censor counts, the KM median inter-order gap (smallest
    duration where the product-limit curve drops to <= 0.5 — the
    censoring-aware replacement for a plain median of observed gaps,
    which is biased low), and the restricted mean survival time (the
    area under the step curve up to the segment's largest duration,
    computed exactly from the table as sum of S(t_prev) * dt via one
    lag window).  Same estimator pipeline as orders_km_survival but
    every window is PARTITIONED BY SEGMENT — the duration-grid sorts
    parallelize across segments, so nothing in the plan is
    single-partition.  The customer dimension joins broadcast-small;
    survival doubles are identical in both engines (same exp-of-sums
    in the same order), so median/RMST hash-match after round(6)."""
    return km_segment_summary(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "customer")
    )


def km_segment_risk(orders, customer):
    """Per-market-segment duration-grid risk table ``(__seg, dur,
    __de, __ce, __nr)`` — the shared stage all three per-segment
    survival estimators (KM summary, KM quartiles, Nelson-Aalen)
    read. Every window partitions by segment."""
    o = (
        orders
        .join(
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
    events = s.where(F.col("__nxt").isNotNull()).select(
        "__seg",
        F.datediff("__nxt", "__d").cast("long").alias("dur"),
        F.lit(1).cast("long").alias("__ev"),
    )
    censored = (
        s.where(F.col("__nxt").isNull())
        .crossJoin(F.broadcast(mx))
        .select(
            "__seg",
            F.datediff("__mxd", "__d").cast("long").alias("dur"),
            F.lit(0).cast("long").alias("__ev"),
        )
    )
    g = (
        events.unionByName(censored)
        .groupBy("__seg", "dur")
        .agg(
            F.sum("__ev").cast("long").alias("__de"),
            F.sum(F.lit(1) - F.col("__ev")).cast("long").alias("__ce"),
        )
    )
    ws = Window.partitionBy("__seg")
    w_prev = (
        Window.partitionBy("__seg")
        .orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = Window.partitionBy("__seg").orderBy("dur")
    at = F.col("__de") + F.col("__ce")
    k = g.withColumn(
        "__nr",
        F.sum(at).over(ws).cast("long")
        - F.coalesce(F.sum(at).over(w_prev).cast("long"), F.lit(0).cast("long")),
    )
    return k


def km_segment_curve(orders, customer):
    """Per-segment KM curve ``(__seg, dur, __de, __ce, __surv)`` with
    UNROUNDED survival, built on :func:`km_segment_risk`."""
    k = km_segment_risk(orders, customer)
    w_cum = Window.partitionBy("__seg").orderBy("dur")
    de, nr = F.col("__de"), F.col("__nr")
    lt = F.when(de == 0, F.lit(0.0)).when(
        de < nr, F.log((nr - de).cast("double") / nr.cast("double"))
    )
    l = k.withColumn("__lt", lt).withColumn(
        "__dead", F.when(de >= nr, F.lit(1)).otherwise(F.lit(0))
    )
    surv = F.when(
        F.sum("__dead").over(w_cum).cast("long") > 0, F.lit(0.0)
    ).otherwise(F.exp(F.sum("__lt").over(w_cum)))
    return l.withColumn("__surv", surv).select(
        "__seg", "dur", "__de", "__ce", "__surv"
    )


def km_segment_summary(orders, customer):
    sv = km_segment_curve(orders, customer)
    w_cum = Window.partitionBy("__seg").orderBy("dur")
    st = sv.select(
        "__seg",
        "dur",
        "__de",
        "__ce",
        "__surv",
        F.coalesce(
            F.lag("dur").over(w_cum), F.lit(0).cast("long")
        ).alias("__pdur"),
        F.coalesce(F.lag("__surv").over(w_cum), F.lit(1.0)).alias("__psurv"),
    )
    return (
        st.groupBy(F.col("__seg").alias("c_mktsegment"))
        .agg(
            F.sum("__de").cast("long").alias("n_events"),
            F.sum("__ce").cast("long").alias("n_censored"),
            F.min(F.when(F.col("__surv") <= 0.5, F.col("dur"))).alias(
                "median_gap_days"
            ),
            F.round(
                F.sum(
                    F.col("__psurv")
                    * (F.col("dur") - F.col("__pdur")).cast("double")
                ),
                6,
            ).alias("rmst_days"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "orders_km_quartiles",
    f"""{_KM_CTES},
    curve AS ({_KM_CURVE_SELECT}),
    grid AS (SELECT unnest([25, 50, 75]) AS level_pct),
    hit AS (SELECT g.level_pct, min(c.dur_days) AS dur_days
            FROM curve c JOIN grid g
              ON c.survival <= 1.0 - CAST(g.level_pct AS DOUBLE) / 100.0
            GROUP BY 1)
    SELECT CAST(g.level_pct AS BIGINT) AS level_pct,
       CAST(h.dur_days AS BIGINT) AS dur_days,
       c.survival AS survival_at
    FROM grid g
    LEFT JOIN hit h ON h.level_pct = g.level_pct
    LEFT JOIN curve c ON c.dur_days = h.dur_days
    ORDER BY level_pct""",
)
def orders_km_quartiles(spark, sf_dir):
    """Survival-time quartiles off the Kaplan-Meier curve: the smallest
    duration where S(t) has dropped to <= 0.75 / 0.50 / 0.25 — the
    "median time between orders, censoring-corrected" headline numbers
    a churn analysis actually reports (the naive median of observed
    gaps is biased LOW because open gaps are exactly the long ones).
    Levels that the curve never reaches emit NULL rather than
    disappearing.  Plan: the km_survival curve (duration-grid frame,
    <= max-gap-days rows) exploded 3x against the integer level grid,
    one min(struct) per level, broadcast-joined back onto the grid —
    every stage after the curve is bounded by the GRID, not the fact
    table.  Thresholds 0.75/0.5/0.25 are exact doubles and the curve's
    survival is round(6)-pinned in both engines, so boundary compares
    are engine-exact."""
    return km_quartiles(table(spark, sf_dir, "orders"))


def km_quartiles(orders):
    curve = km_survival(orders).select("dur_days", "survival")
    grid_arr = F.array(*[F.lit(v).cast("long") for v in (25, 50, 75)])
    grid = orders.sparkSession.range(1).select(
        F.explode(grid_arr).alias("level_pct")
    )
    hits = (
        curve.select(
            F.explode(grid_arr).alias("level_pct"), "dur_days", "survival"
        )
        .where(
            F.col("survival")
            <= F.lit(1.0) - F.col("level_pct").cast("double") / F.lit(100.0)
        )
        .groupBy("level_pct")
        .agg(F.min(F.struct("dur_days", "survival")).alias("__m"))
    )
    return (
        grid.join(hits, "level_pct", "left")
        .select(
            "level_pct",
            F.col("__m.dur_days").alias("dur_days"),
            F.col("__m.survival").alias("survival_at"),
        )
        .orderBy("level_pct")
    )


@register(
    "ts_permutation_entropy",
    """WITH c AS (SELECT user_id,
           CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc
       FROM events),
    g AS (SELECT user_id, hb, CAST(sum(vc) AS BIGINT) AS y
          FROM c WHERE vc IS NOT NULL GROUP BY 1, 2),
    l AS (SELECT user_id, hb, y,
            lead(hb, 1) OVER w AS hb2, lead(y, 1) OVER w AS y2,
            lead(hb, 2) OVER w AS hb3, lead(y, 2) OVER w AS y3
          FROM g WINDOW w AS (PARTITION BY user_id ORDER BY hb)),
    t AS (SELECT user_id,
            (CAST(y2 < y  AS BIGINT) + CAST(y3 < y  AS BIGINT)) AS r1,
            (CAST(y  <= y2 AS BIGINT) + CAST(y3 < y2 AS BIGINT)) AS r2,
            (CAST(y  <= y3 AS BIGINT) + CAST(y2 <= y3 AS BIGINT)) AS r3
          FROM l WHERE hb2 = hb + 1 AND hb3 = hb + 2),
    pc AS (SELECT user_id, 9 * r1 + 3 * r2 + r3 AS pat,
             CAST(count(*) AS BIGINT) AS c
           FROM t GROUP BY 1, 2),
    a AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS k,
            sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS slc
          FROM pc GROUP BY 1)
    SELECT user_id, n AS n_triples, k AS k_patterns,
       round(ln(CAST(n AS DOUBLE)) - slc / CAST(n AS DOUBLE), 6) AS pe_nats,
       round((ln(CAST(n AS DOUBLE)) - slc / CAST(n AS DOUBLE))
             / ln(6.0), 6) AS pe_norm
    FROM a ORDER BY user_id""",
)
def ts_permutation_entropy(spark, sf_dir):
    """Permutation entropy per series (Bandt-Pompe, order m=3): the
    Shannon entropy of the ordinal-pattern distribution of
    consecutive-hour triples of hourly cent totals — the standard
    model-free complexity screen (low = predictable/monotone dynamics,
    ~ln 6 = fully irregular; a constant-ish sensor, a stuck value, or
    a pure ramp all collapse to one dominant pattern long before a
    distributional test notices).  Ties rank by position (the original
    Bandt-Pompe convention), so each triple maps to exactly one of 6
    permutations via int64 comparisons only; the entropy is the
    count-moment identity H = ln N - sum(c ln c)/N over exact counts
    (the events_type_entropy discipline — no per-pattern probability
    division, one float fold at the end, libm-stable into round(6)).
    Triples must be hour-CONSECUTIVE (the ts_ar1 gap rule: patterns
    across gaps are not dynamics).  Plan: fact scan -> (series, hour)
    aggregate, lead window and the pattern/count/entropy stages all
    partitioned by the series key — one data shuffle."""
    return permutation_entropy(table(spark, sf_dir, "events"))


def permutation_entropy(e):
    from ..expressions import nan_to_null

    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    g = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("__hb"),
            cents.alias("__vc"),
        )
        .where(F.col("__vc").isNotNull())
        .groupBy("user_id", "__hb")
        .agg(F.sum("__vc").cast("long").alias("__y"))
    )
    wo = Window.partitionBy("user_id").orderBy("__hb")
    l = g.select(
        "user_id", "__hb", "__y",
        F.lead("__hb", 1).over(wo).alias("__hb2"),
        F.lead("__y", 1).over(wo).alias("__y2"),
        F.lead("__hb", 2).over(wo).alias("__hb3"),
        F.lead("__y", 2).over(wo).alias("__y3"),
    )
    y, y2, y3 = F.col("__y"), F.col("__y2"), F.col("__y3")
    # Bandt-Pompe ranks, ties by position: r_i = #{j: x_j < x_i, or
    # x_j == x_i with j < i} — always a permutation of {0,1,2}
    r1 = (y2 < y).cast("long") + (y3 < y).cast("long")
    r2 = (y <= y2).cast("long") + (y3 < y2).cast("long")
    r3 = (y <= y3).cast("long") + (y2 <= y3).cast("long")
    t = l.where(
        (F.col("__hb2") == F.col("__hb") + 1)
        & (F.col("__hb3") == F.col("__hb") + 2)
    ).select("user_id", (F.lit(9) * r1 + F.lit(3) * r2 + r3).alias("__pat"))
    pc = t.groupBy("user_id", "__pat").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    a = pc.groupBy("user_id").agg(
        F.sum("__c").cast("long").alias("__n"),
        F.count(F.lit(1)).cast("long").alias("__k"),
        F.sum(
            F.col("__c").cast("double") * F.log(F.col("__c").cast("double"))
        ).alias("__slc"),
    )
    n = F.col("__n")
    h = F.log(n.cast("double")) - F.col("__slc") / n.cast("double")
    import math

    return a.select(
        "user_id",
        n.alias("n_triples"),
        F.col("__k").alias("k_patterns"),
        F.round(h, 6).alias("pe_nats"),
        F.round(h / F.lit(math.log(6.0)), 6).alias("pe_norm"),
    ).orderBy("user_id")


_SAX_BRK = "0.6744897501960817"  # exact N(0,1) quartile, shared literal


@register(
    "ts_sax_motifs",
    f"""WITH c AS (SELECT user_id,
           CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc
       FROM events),
    g AS (SELECT user_id, hb, CAST(sum(vc) AS BIGINT) AS y
          FROM c WHERE vc IS NOT NULL GROUP BY 1, 2),
    st AS (SELECT user_id, hb, y,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(y) OVER w AS BIGINT) AS t,
             CAST(sum(y * y) OVER w AS BIGINT) AS q
           FROM g WINDOW w AS (PARTITION BY user_id)),
    z AS (SELECT user_id, hb,
            (CAST(y AS DOUBLE) - CAST(t AS DOUBLE) / CAST(n AS DOUBLE))
              / sqrt((CAST(q AS DOUBLE)
                      - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS zv
          FROM st
          WHERE (CAST(q AS DOUBLE)
                 - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE) > 0),
    s AS (SELECT user_id, hb,
            CASE WHEN zv < -{_SAX_BRK} THEN 'a'
                 WHEN zv < 0 THEN 'b'
                 WHEN zv < {_SAX_BRK} THEN 'c'
                 ELSE 'd' END AS sym
          FROM z),
    l AS (SELECT user_id, hb, sym,
            lead(hb, 1) OVER w AS hb2, lead(sym, 1) OVER w AS s2,
            lead(hb, 2) OVER w AS hb3, lead(sym, 2) OVER w AS s3
          FROM s WINDOW w AS (PARTITION BY user_id ORDER BY hb)),
    wd AS (SELECT user_id, sym || s2 || s3 AS word
           FROM l WHERE hb2 = hb + 1 AND hb3 = hb + 2),
    wc AS (SELECT user_id, word, CAST(count(*) AS BIGINT) AS n_word
           FROM wd GROUP BY 1, 2),
    rk AS (SELECT user_id, word, n_word,
             CAST(sum(n_word) OVER (PARTITION BY user_id) AS BIGINT) AS tot,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n_word DESC, word) AS rnk
           FROM wc)
    SELECT user_id, CAST(rnk AS BIGINT) AS rank, word, n_word,
       round(CAST(n_word AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share
    FROM rk WHERE rnk <= 3 ORDER BY user_id, rank""",
)
def ts_sax_motifs(spark, sf_dir):
    """Top-3 SAX motifs per series: hourly cent totals z-normalized
    per series (double-form central moments (q - t^2/n)/n after
    integer sums — the events_type_corr overflow lesson), quantized to
    a 4-letter alphabet at the exact N(0,1) quartile breakpoints
    (shared literal), and folded into 3-hour words over
    consecutive-hour triples (the ts_ar1 gap rule).  The dominant
    words ARE the series' recurring local shapes — 'abc'/'bcd'
    staircases for ramps, 'ada' spikes, a single dominant word for
    near-periodic load — the standard symbolic pre-filter before any
    expensive motif/discord mining, and the discrete complement of
    ts_permutation_entropy (which scores HOW concentrated the pattern
    distribution is; this names the patterns).  Constant series
    (variance 0) have no shape information and are excluded by the
    variance guard.  Exactness: z-scores divide identical doubles in
    both engines, breakpoint compares are literal-exact, words are
    strings, counts int64; the only rounding is the final share.
    Plan: fact scan -> (series, hour) aggregate; the stats window, the
    lead window, and the count/rank stages are ALL partitioned by the
    series key — one data shuffle end to end."""
    return sax_motifs(table(spark, sf_dir, "events"))


def sax_motifs(e, top_k: int = 3):
    from ..expressions import nan_to_null

    brk = float(_SAX_BRK)
    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    g = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("__hb"),
            cents.alias("__vc"),
        )
        .where(F.col("__vc").isNotNull())
        .groupBy("user_id", "__hb")
        .agg(F.sum("__vc").cast("long").alias("__y"))
    )
    w = Window.partitionBy("user_id")
    st = g.select(
        "user_id",
        "__hb",
        "__y",
        F.count(F.lit(1)).over(w).cast("long").alias("__n"),
        F.sum("__y").over(w).cast("long").alias("__t"),
        F.sum(F.col("__y") * F.col("__y")).over(w).cast("long").alias("__q"),
    )
    n_d = F.col("__n").cast("double")
    t_d = F.col("__t").cast("double")
    q_d = F.col("__q").cast("double")
    var = (q_d - t_d * t_d / n_d) / n_d
    z = (F.col("__y").cast("double") - t_d / n_d) / F.sqrt(var)
    s = st.where(var > 0).select(
        "user_id",
        "__hb",
        F.when(z < -brk, F.lit("a"))
        .when(z < 0, F.lit("b"))
        .when(z < brk, F.lit("c"))
        .otherwise(F.lit("d"))
        .alias("__sym"),
    )
    wo = Window.partitionBy("user_id").orderBy("__hb")
    l = s.select(
        "user_id",
        "__hb",
        "__sym",
        F.lead("__hb", 1).over(wo).alias("__hb2"),
        F.lead("__sym", 1).over(wo).alias("__s2"),
        F.lead("__hb", 2).over(wo).alias("__hb3"),
        F.lead("__sym", 2).over(wo).alias("__s3"),
    )
    wd = l.where(
        (F.col("__hb2") == F.col("__hb") + 1)
        & (F.col("__hb3") == F.col("__hb") + 2)
    ).select(
        "user_id", F.concat("__sym", "__s2", "__s3").alias("word")
    )
    wc = wd.groupBy("user_id", "word").agg(
        F.count(F.lit(1)).cast("long").alias("n_word")
    )
    rnk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("n_word"), "word")
    )
    tot = F.sum("n_word").over(Window.partitionBy("user_id")).cast("long")
    return (
        wc.select(
            "user_id",
            "word",
            "n_word",
            tot.alias("__tot"),
            rnk.cast("long").alias("rank"),
        )
        .where(F.col("rank") <= top_k)
        .select(
            "user_id",
            "rank",
            "word",
            "n_word",
            F.round(
                F.col("n_word").cast("double") / F.col("__tot").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("user_id", "rank")
    )


@register(
    "orders_nelson_aalen",
    f"""{_KM_CTES},
    h AS (SELECT dur, n_risk, d_event, c_censored,
            CASE WHEN d_event > 0
                 THEN CAST(d_event AS DOUBLE) / CAST(n_risk AS DOUBLE)
                 ELSE CAST(0 AS DOUBLE) END AS hz,
            CASE WHEN d_event > 0
                 THEN CAST(d_event AS DOUBLE)
                      / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE))
                 ELSE CAST(0 AS DOUBLE) END AS hv
          FROM l)
    SELECT dur AS dur_days, n_risk, d_event,
       round(sum(hz) OVER (ORDER BY dur), 6) AS na_cumhaz,
       round(sqrt(sum(hv) OVER (ORDER BY dur)), 6) AS na_se,
       round(exp(-sum(hz) OVER (ORDER BY dur)), 6) AS survival_fh
    FROM h ORDER BY dur_days""",
)
def orders_nelson_aalen(spark, sf_dir):
    """Nelson-Aalen cumulative hazard over the same censored
    inter-order durations as orders_km_survival, with its Poisson
    standard error and the Fleming-Harrington survival exp(-H) — the
    estimator pair every survival analysis reports next to
    Kaplan-Meier (N-A is the stabler of the two in small risk sets,
    and H(t)'s slope IS the hazard intensity an operations reader
    wants).  Same shared duration-grid CTEs; the cumulative sums run
    in ascending-duration order in both engines (the ordered-window
    association the KM log-sum already relies on), hazard increments
    are single exact divisions d/n and d/n^2, and the only
    transcendentals are the final sqrt/exp into round(6).  Plan: the
    km_survival shape — everything after the per-customer lead window
    is bounded by the duration GRID."""
    return nelson_aalen(table(spark, sf_dir, "orders"))


def nelson_aalen(orders):
    k = km_risk_table(orders)
    nr, de = F.col("n_risk"), F.col("d_event")
    hz = F.when(de > 0, de.cast("double") / nr.cast("double")).otherwise(F.lit(0.0))
    hv = F.when(
        de > 0, de.cast("double") / (nr.cast("double") * nr.cast("double"))
    ).otherwise(F.lit(0.0))
    w_cum = Window.orderBy("dur")
    h = k.withColumn("__hz", hz).withColumn("__hv", hv)
    return h.select(
        F.col("dur").alias("dur_days"),
        "n_risk",
        "d_event",
        F.round(F.sum("__hz").over(w_cum), 6).alias("na_cumhaz"),
        F.round(F.sqrt(F.sum("__hv").over(w_cum)), 6).alias("na_se"),
        F.round(F.exp(-F.sum("__hz").over(w_cum)), 6).alias("survival_fh"),
    ).orderBy("dur_days")


@register(
    "ts_conformal_snaive",
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
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY resid, hb) AS rk,
              CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_cal
            FROM r WHERE hb % 5 <> 0),
    q AS (SELECT user_id, n_cal, resid AS qhat_cents
          FROM cal WHERE rk = ((n_cal + 1) * 8 + 9) // 10),
    t AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_test,
            CAST(sum(CASE WHEN resid <= q.qhat_cents THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_covered
          FROM r JOIN q USING (user_id) WHERE hb % 5 = 0
          GROUP BY user_id, q.qhat_cents)
    SELECT q.user_id, q.n_cal, q.qhat_cents,
       coalesce(t.n_test, CAST(0 AS BIGINT)) AS n_test,
       coalesce(t.n_test, CAST(0 AS BIGINT))
         - coalesce(t.n_covered, CAST(0 AS BIGINT)) AS n_flagged,
       CASE WHEN t.n_test > 0
            THEN round(CAST(t.n_covered AS DOUBLE)
                       / CAST(t.n_test AS DOUBLE), 6) END AS coverage
    FROM q LEFT JOIN t ON t.user_id = q.user_id
    ORDER BY q.user_id""",
)
def ts_conformal_snaive(spark, sf_dir):
    """Split-conformal anomaly interval on the seasonal-naive
    forecaster, per series: calibration residuals |y_t - y_{t-24h}|
    (hours with hb % 5 <> 0) yield the finite-sample conformal
    quantile — the ceil((n+1)(1-alpha))-th SMALLEST calibration
    residual at alpha = 0.2, an exact integer order statistic
    (rank ((n+1)*8+9) div 10, int64 residual cents, ties broken by
    hour so the picked row is unique) — and held-out hours (hb % 5 =
    0) score against it: residuals above q-hat are flagged, and the
    reported coverage should concentrate near 0.8 WITHOUT any
    distributional assumption; that guarantee is the whole point of
    conformal calibration vs the 5x-MAD rule of ts_hw_anomaly.  A
    series whose conformal rank exceeds n_cal (too few calibration
    points to certify 80%) emits no row — refusing to certify is the
    correct conformal behavior.  Everything except the one coverage
    division is integer arithmetic; the forecast lookup is the
    gap-safe 24h self-join of ts_backtest_snaive.  Plan: fact scan ->
    (series, hour) aggregate (cached, scanned by both split sides),
    self-join keyed by series, one rank window over the per-series
    calibration frame."""
    return conformal_snaive(table(spark, sf_dir, "events"))


def snaive_residuals(e):
    """Cached per-(series, hour) seasonal-naive residual frame
    ``(user_id, __hb, __resid)`` — the shared stage conformal_snaive
    and the r9 calibration curve both split; scanned by both split
    sides, bounded by the bucket count."""
    from ..expressions import nan_to_null

    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    p = (
        e.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("__b"))
        .agg(F.sum(cents).alias("__x"))
        .where(F.col("__x").isNotNull())
        .cache()
    )
    a, f = p.alias("a"), p.alias("f")
    return a.join(
        f,
        (F.col("f.user_id") == F.col("a.user_id"))
        & (F.col("f.__b") == F.col("a.__b") - F.expr("INTERVAL 24 HOUR")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.expr("unix_micros(a.__b) div 3600000000").alias("__hb"),
        F.abs(F.col("a.__x") - F.col("f.__x")).cast("long").alias("__resid"),
    ).cache()


def conformal_snaive(e):
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
    q = ranked.where(
        F.col("__rk") == F.expr("((n_cal + 1) * 8 + 9) div 10")
    ).select("user_id", "n_cal", F.col("__resid").alias("qhat_cents"))
    t = (
        r.where(F.col("__hb") % 5 == 0)
        .join(q.select("user_id", "qhat_cents"), "user_id")
        .groupBy("user_id")
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
        q.join(t, "user_id", "left")
        .select(
            "user_id",
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
        .orderBy("user_id")
    )


@register(
    "events_attribution_credit",
    """WITH conv AS (SELECT user_id, event_id AS conv_id, ts AS conv_ts
                     FROM events WHERE event_type = 'purchase'),
    touch AS (SELECT user_id, event_id AS touch_id, event_type AS touch_type,
                     ts AS touch_ts
              FROM events WHERE event_type <> 'purchase'),
    j AS (SELECT c.conv_id, t.touch_type, t.touch_ts, t.touch_id
          FROM conv c JOIN touch t
            ON t.user_id = c.user_id
           AND t.touch_ts < c.conv_ts
           AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
    r AS (SELECT conv_id, touch_type,
            CAST(count(*) OVER wc AS BIGINT) AS k,
            row_number() OVER (PARTITION BY conv_id
                               ORDER BY touch_ts DESC, touch_id DESC) AS rl,
            row_number() OVER (PARTITION BY conv_id
                               ORDER BY touch_ts ASC, touch_id ASC) AS rf,
            pow(2.0, -(CAST(epoch_us(conv_ts) - epoch_us(touch_ts) AS DOUBLE)
                       / 86400000000.0) / 3.5) AS w,
            sum(pow(2.0, -(CAST(epoch_us(conv_ts) - epoch_us(touch_ts)
                                AS DOUBLE) / 86400000000.0) / 3.5))
              OVER wc AS wsum
          FROM (SELECT j.*, c2.conv_ts
                FROM j JOIN conv c2 ON c2.conv_id = j.conv_id)
          WINDOW wc AS (PARTITION BY conv_id))
    SELECT touch_type,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_conversions,
       CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS first_touch,
       CAST(sum(CASE WHEN rl = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch,
       round(sum(1.0 / CAST(k AS DOUBLE)), 6) AS linear_credit,
       round(sum(w / wsum), 6) AS decay_credit
    FROM r GROUP BY touch_type ORDER BY touch_type""",
)
def events_attribution_credit(spark, sf_dir):
    """Multi-touch conversion attribution over the event stream: every
    purchase distributes credit across the SAME user's touch events in
    the trailing 7 days under the four standard models — first-touch,
    last-touch (integer counts of being the window's first/latest
    touch, (ts, event_id)-tiebroken so both engines pick the identical
    row), linear (1/k per touch, k = the conversion's touch count),
    and time-decay (half-life 3.5 days over the exact micros age,
    normalized per conversion so each model conserves total credit)
    — the marketing-science table every funnel/retention readout feeds
    into.  Totals per model are conserved across types (each equals
    the number of touched conversions), which the test asserts.  Plan:
    the conversion-touch pairing is an equi-join on the series key
    with a time-range residual (co-partitioned by user, never
    cartesian); both rank windows and the credit aggregate are
    bounded by touches-per-conversion, capped by the 7-day window at
    any scale.  Floats: the 1/k division and the
    2^(-age/half-life) decay weights (identical libm doubles both
    engines, per-conversion normalization divides near-identical
    sums), each summed per type into round(6)."""
    return attribution_credit(table(spark, sf_dir, "events"))


def attribution_credit(e, conversion_type: str = "purchase", window_days: int = 7):
    base = e.select("user_id", "event_id", "event_type", "ts")
    conv = base.where(F.col("event_type") == conversion_type).select(
        "user_id",
        F.col("event_id").alias("__conv_id"),
        F.col("ts").alias("__conv_ts"),
    )
    touch = base.where(F.col("event_type") != conversion_type).select(
        "user_id",
        F.col("event_id").alias("__touch_id"),
        F.col("event_type").alias("touch_type"),
        F.col("ts").alias("__touch_ts"),
    )
    j = conv.join(
        touch,
        (conv["user_id"] == touch["user_id"])
        & (F.col("__touch_ts") < F.col("__conv_ts"))
        & (
            F.col("__touch_ts")
            >= F.col("__conv_ts") - F.expr(f"INTERVAL {window_days} DAYS")
        ),
    ).select("__conv_id", "touch_type", "__touch_ts", "__touch_id", "__conv_ts")
    wc = Window.partitionBy("__conv_id")
    wl = Window.partitionBy("__conv_id").orderBy(
        F.desc("__touch_ts"), F.desc("__touch_id")
    )
    wf = Window.partitionBy("__conv_id").orderBy("__touch_ts", "__touch_id")
    # time-decay weight: half-life 3.5 days over the exact micros age
    age_days = (
        F.unix_micros("__conv_ts") - F.unix_micros("__touch_ts")
    ).cast("double") / F.lit(86400000000.0)
    wgt = F.pow(F.lit(2.0), -age_days / F.lit(3.5))
    r = j.select(
        "__conv_id",
        "touch_type",
        F.count(F.lit(1)).over(wc).cast("long").alias("__k"),
        F.row_number().over(wl).alias("__rl"),
        F.row_number().over(wf).alias("__rf"),
        wgt.alias("__w"),
        F.sum(wgt).over(wc).alias("__wsum"),
    )
    return (
        r.groupBy("touch_type")
        .agg(
            F.countDistinct("__conv_id").cast("long").alias("n_conversions"),
            F.sum(F.when(F.col("__rf") == 1, 1).otherwise(0))
            .cast("long")
            .alias("first_touch"),
            F.sum(F.when(F.col("__rl") == 1, 1).otherwise(0))
            .cast("long")
            .alias("last_touch"),
            F.round(F.sum(F.lit(1.0) / F.col("__k").cast("double")), 6).alias(
                "linear_credit"
            ),
            F.round(F.sum(F.col("__w") / F.col("__wsum")), 6).alias(
                "decay_credit"
            ),
        )
        .orderBy("touch_type")
    )


_PERIODS = (6, 8, 12, 24, 48, 168)
_TWO_PI = "6.283185307179586"


@register(
    "ts_periodogram",
    f"""WITH c AS (SELECT user_id,
           CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hb,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc
       FROM events),
    g AS (SELECT user_id, hb, CAST(sum(vc) AS BIGINT) AS y
          FROM c WHERE vc IS NOT NULL GROUP BY 1, 2),
    st AS (SELECT user_id, hb, y,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(y) OVER w AS BIGINT) AS t,
             CAST(sum(y * y) OVER w AS BIGINT) AS q
           FROM g WINDOW w AS (PARTITION BY user_id)),
    z AS (SELECT user_id, hb, n,
            (CAST(y AS DOUBLE) - CAST(t AS DOUBLE) / CAST(n AS DOUBLE))
              / sqrt((CAST(q AS DOUBLE)
                      - CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS zv
          FROM st
          WHERE (CAST(q AS DOUBLE)
                 - CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE))
                / CAST(n AS DOUBLE) > 0),
    e AS (SELECT user_id, n, zv, hb, u.p
          FROM z, unnest([{", ".join(str(p) for p in _PERIODS)}]) AS u(p)),
    a AS (SELECT user_id, p AS period,
            CAST(any_value(n) AS BIGINT) AS n_hours,
            sum(zv * cos({_TWO_PI} * CAST(hb % p AS DOUBLE)
                         / CAST(p AS DOUBLE))) AS ca,
            sum(zv * sin({_TWO_PI} * CAST(hb % p AS DOUBLE)
                         / CAST(p AS DOUBLE))) AS sb
          FROM e GROUP BY 1, 2),
    pw AS (SELECT user_id, CAST(period AS BIGINT) AS period, n_hours,
             round((ca * ca + sb * sb) / CAST(n_hours AS DOUBLE), 6) AS power
           FROM a),
    rk AS (SELECT *,
             round(power / sum(power) OVER (PARTITION BY user_id), 6)
               AS power_share,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY power DESC, period) AS rnk
           FROM pw)
    SELECT user_id, period, n_hours, power, power_share,
       rnk = 1 AS is_dominant
    FROM rk ORDER BY user_id, period""",
)
def ts_periodogram(spark, sf_dir):
    """Candidate-period periodogram per series: spectral power of the
    z-normalized hourly cent totals at the calendar-meaningful periods
    {{6, 8, 12, 24, 48, 168}}h — WHICH cycle dominates, where
    ts_hour_anova only asks whether the fixed 24h one exists (a
    12h-shift sensor or a weekly-batch pipeline lights up 12/168, not
    24).  Power_p = (A^2 + B^2)/n with A = sum z*cos(2*pi*(hb mod p)/p),
    B likewise — the single-frequency Goertzel/DFT bin.  Exactness
    discipline: z-scores divide identical doubles (the sax central-
    moment form), the angle argument uses hb MOD p so both engines
    feed libm small identical doubles (~1 ulp agreement), and the sum's
    association noise (~1e-13 on n~1e3 unit-scale terms) vanishes in
    round(6); dominance ranks by the ROUNDED power (ties to the
    shorter period) so the flag is engine-exact.  Plan: fact scan ->
    (series, hour) aggregate, stats window, a 6x grid explode of the
    bucket frame (never the fact table), one (series, period)
    aggregate, one final window over the 6-row-per-series frame."""
    return periodogram(table(spark, sf_dir, "events"))


def periodogram(e):
    import math

    from ..expressions import nan_to_null

    two_pi = float(_TWO_PI)
    assert two_pi == 2 * math.pi
    cents = F.round(nan_to_null(F.col("value")) * 100).cast("long")
    g = (
        e.select(
            "user_id",
            F.expr("unix_micros(ts) div 3600000000").alias("__hb"),
            cents.alias("__vc"),
        )
        .where(F.col("__vc").isNotNull())
        .groupBy("user_id", "__hb")
        .agg(F.sum("__vc").cast("long").alias("__y"))
    )
    w = Window.partitionBy("user_id")
    st = g.select(
        "user_id",
        "__hb",
        "__y",
        F.count(F.lit(1)).over(w).cast("long").alias("__n"),
        F.sum("__y").over(w).cast("long").alias("__t"),
        F.sum(F.col("__y") * F.col("__y")).over(w).cast("long").alias("__q"),
    )
    n_d = F.col("__n").cast("double")
    t_d = F.col("__t").cast("double")
    q_d = F.col("__q").cast("double")
    var = (q_d - t_d * t_d / n_d) / n_d
    zv = (F.col("__y").cast("double") - t_d / n_d) / F.sqrt(var)
    z = st.where(var > 0).select(
        "user_id", "__hb", F.col("__n"), zv.alias("__zv")
    )
    grid = F.array(*[F.lit(p).cast("long") for p in _PERIODS])
    ex = z.select(
        "user_id", "__hb", "__n", "__zv", F.explode(grid).alias("period")
    )
    ang = (
        F.lit(two_pi)
        * (F.col("__hb") % F.col("period")).cast("double")
        / F.col("period").cast("double")
    )
    a = ex.groupBy("user_id", "period").agg(
        F.first("__n").alias("n_hours"),
        F.sum(F.col("__zv") * F.cos(ang)).alias("__ca"),
        F.sum(F.col("__zv") * F.sin(ang)).alias("__sb"),
    )
    power = F.round(
        (F.col("__ca") * F.col("__ca") + F.col("__sb") * F.col("__sb"))
        / F.col("n_hours").cast("double"),
        6,
    )
    pw = a.select("user_id", "period", "n_hours", power.alias("power"))
    share = F.round(
        F.col("power") / F.sum("power").over(Window.partitionBy("user_id")), 6
    )
    rnk = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.desc("power"), "period")
    )
    return pw.select(
        "user_id",
        "period",
        "n_hours",
        "power",
        share.alias("power_share"),
        (rnk == 1).alias("is_dominant"),
    ).orderBy("user_id", "period")


@register(
    "supplier_ship_latency",
    f"""WITH j AS (SELECT l.l_suppkey AS s_suppkey,
             CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lat
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    arr AS (SELECT s_suppkey,
              CAST(count(*) AS BIGINT) AS n_items,
              CAST(sum(lat) AS BIGINT) AS t,
              CAST(sum(CASE WHEN lat > 90 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_late,
              list_sort(list(lat)) AS a
            FROM j GROUP BY 1)
    SELECT s_suppkey, n_items,
       round(CAST(t AS DOUBLE) / CAST(n_items AS DOUBLE), 6)
         AS mean_latency_days,
       round({spark_quantile_sql('a', 0.5)}, 6) AS p50_latency,
       round({spark_quantile_sql('a', 0.9)}, 6) AS p90_latency,
       round(CAST(n_late AS DOUBLE) / CAST(n_items AS DOUBLE), 6)
         AS late90_share
    FROM arr ORDER BY s_suppkey""",
)
def supplier_ship_latency(spark, sf_dir):
    """Supplier fulfillment-latency profile: per supplier, the
    order-to-ship latency distribution — exact mean (int64 day sum,
    one division), engine-exact p50/p90 (Spark ``percentile``
    interpolation reproduced bit-for-bit by the shared
    spark_quantile_sql oracle helper), and the share of line items
    shipping more than 90 days after the order — the operations
    scorecard a procurement team reads next to parts_abc and
    orders_in_flight.  Plan: the one fact-fact equi-join
    (lineitem x orders on orderkey, co-partitioned shuffle, AQE-sized),
    then a single supplier-grain aggregate; latencies are small ints,
    so the per-group sorted list the exact percentile needs is bounded
    by items-per-supplier."""
    li = table(spark, sf_dir, "lineitem")
    # narrow the shuffle (guide 2.3): both sides of the fact-fact
    # exchange carry 4-byte DATEs instead of date strings — the cast
    # runs map-side on the scan, the join moves ~40% fewer bytes
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("__od")
    )
    j = li.select(
        "l_suppkey", "l_orderkey", F.to_date("l_shipdate").alias("__sd")
    ).join(o, F.col("o_orderkey") == F.col("l_orderkey"))
    lat = F.datediff(F.col("__sd"), F.col("__od")).cast("long")
    # single supplier-grain aggregate (measured: the two-level
    # (supplier, day)-histogram form adds a shuffle that costs MORE
    # than it saves — 4.2s vs 2.2s warm at sf1 — because per-group
    # exact percentiles on ~6k-element groups are cheap in memory)
    a = (
        j.select(F.col("l_suppkey").alias("s_suppkey"), lat.alias("__lat"))
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum("__lat").cast("long").alias("__t"),
            F.sum(F.when(F.col("__lat") > 90, 1).otherwise(0))
            .cast("long")
            .alias("__late"),
            F.round(F.percentile("__lat", F.lit(0.5)), 6).alias("p50_latency"),
            F.round(F.percentile("__lat", F.lit(0.9)), 6).alias("p90_latency"),
        )
    )
    return a.select(
        "s_suppkey",
        "n_items",
        F.round(
            F.col("__t").cast("double") / F.col("n_items").cast("double"), 6
        ).alias("mean_latency_days"),
        "p50_latency",
        "p90_latency",
        F.round(
            F.col("__late").cast("double") / F.col("n_items").cast("double"), 6
        ).alias("late90_share"),
    ).orderBy("s_suppkey")
