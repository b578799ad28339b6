"""Round-5 additions: quality gate, downsampling, irregular-sampling aggs.

Part of the driver-facing query registry (see ``tsod_spark.registry``,
the facade that imports every family module in registration order and
owns the verification rotation). Registration side-effects populate
``tsod_spark.queries._base.QUERIES`` / ``ORACLE``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..analytics import temporal, tpch  # noqa: F401
from ..detectors import (  # noqa: F401
    CombinedDetector,
    ConstantGradientDetector,
    ConstantValueDetector,
    DiffDetector,
    GradientDetector,
    HampelDetector,
    RangeDetector,
    RollingStandardDeviationDetector,
)
from ..detectors.gradient import gradient_col  # noqa: F401
from ..expressions import as_pred  # noqa: F401
from ..features import create_dataset, lag_time_series  # noqa: F401
from ..frame import TimeSeriesFrame  # noqa: F401
from ..pipeline import dedup, multimodal, similarity, text  # noqa: F401
from ._base import (  # noqa: F401
    DTOKS,
    E_CTE,
    HIGH_HEX,
    P,
    TOKS,
    W,
    _shingle_sql,
    duck_round6,
    events_tsf,
    register,
    spark_quantile_sql,
    table,
)


# round-5 additions: quality gate, downsampling, irregular-sampling aggs


@register(
    "doc_gopher_filter",
    f"""WITH b AS (SELECT doc_id, {TOKS} AS t,
        regexp_split_to_array(text, '\\n') AS l,
        (length(text) - length(replace(text, '#', '')))
          + len(list_filter(regexp_split_to_array(text, ' '),
                            x -> regexp_matches(x, '(\\.\\.\\.|…)'))) AS nsym
      FROM documents),
    m AS (SELECT doc_id, nsym,
        len(t) AS nw,
        list_sum(list_transform(t, x -> length(x))) AS tl,
        len(l) AS nl,
        len(list_filter(l, x -> regexp_matches(x, '^\\s*[-*•]'))) AS nb,
        len(list_filter(l, x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*$'))) AS ne,
        len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]'))) AS na,
        len(list_filter(['the','a','an','of','and','to','in','is','it','that'],
                        s -> list_contains(t, s))) AS sh
      FROM b)
    SELECT doc_id,
      CAST(nw AS BIGINT) AS n_words,
      CASE WHEN nw > 0 THEN round(tl / nw, 6) END AS mean_word_len,
      CASE WHEN nw > 0 THEN round(nsym / nw, 6) END AS symbol_word_ratio,
      round(nb / nl, 6) AS bullet_line_frac,
      round(ne / nl, 6) AS ellipsis_line_frac,
      CASE WHEN nw > 0 THEN round(na / nw, 6) END AS alpha_word_frac,
      CAST(sh AS BIGINT) AS n_stopword_hits,
      coalesce(nw >= 20 AND nw <= 100000
               AND tl / nw >= 2.0 AND tl / nw <= 12.0
               AND nsym / nw <= 0.1
               AND nb / nl <= 0.9 AND ne / nl <= 0.3
               AND na / nw >= 0.6 AND sh >= 2, FALSE) AS pass_gopher
    FROM m""",
)
def doc_gopher_filter(spark, sf_dir):
    """Gopher-style quality gate (word-count / mean-word-length bounds,
    symbol & bullet & ellipsis ratios, alpha-word fraction, stopword
    floor) folded to one pass_gopher boolean — the map-side filter a
    pretraining pipeline runs before any shuffle-heavy dedup."""
    return text.gopher_filter(table(spark, sf_dir, "documents"))


@register(
    "ts_lttb",
    f"""{E_CTE},
    d AS (SELECT user_id, event_id, ts, v,
            row_number() OVER ({W}) AS rn,
            count(*) OVER ({P}) AS cnt,
            epoch_us(ts) - min(epoch_us(ts)) OVER ({P}) AS x
          FROM e WHERE v IS NOT NULL),
    d2 AS (SELECT *, CAST(floor(((rn - 1) * 20) / CAST(cnt AS DOUBLE))
                          AS BIGINT) AS bucket FROM d),
    a AS (SELECT user_id, bucket, count(*) AS n, sum(x) AS sx,
            sum(CAST(round(v * 100) AS BIGINT)) AS sc
          FROM d2 GROUP BY 1, 2),
    an AS (SELECT user_id, bucket,
            lag(CAST(sx AS DOUBLE) / n) OVER wb AS pax,
            lag(CAST(sc AS DOUBLE) / n / 100.0) OVER wb AS pay,
            lead(CAST(sx AS DOUBLE) / n) OVER wb AS nax,
            lead(CAST(sc AS DOUBLE) / n / 100.0) OVER wb AS nay,
            row_number() OVER wb = 1 AS isf,
            row_number() OVER (PARTITION BY user_id ORDER BY bucket DESC) = 1 AS isl
          FROM a WINDOW wb AS (PARTITION BY user_id ORDER BY bucket)),
    j AS (SELECT d2.*, an.pax, an.pay, an.nax, an.nay, an.isf, an.isl
          FROM d2 JOIN an USING (user_id, bucket)),
    r AS (SELECT *, row_number() OVER (PARTITION BY user_id, bucket ORDER BY
            CASE WHEN isf THEN CAST(rn AS DOUBLE)
                 WHEN isl THEN -CAST(rn AS DOUBLE)
                 ELSE -abs((pax - nax) * (v - pay) - (pax - x) * (nay - pay))
            END, rn) AS sel
          FROM j)
    SELECT user_id, event_id, ts, v AS value, bucket
    FROM r WHERE sel = 1""",
)
def ts_lttb(spark, sf_dir):
    """Largest-Triangle-Three-Buckets downsampling (parallel
    fixed-anchor variant): 20 equal-count buckets per series, each
    keeping its max-triangle-area point against the neighbor-bucket
    mean anchors; endpoints pinned. Two window passes + one small
    join, no sequential scan (temporal.lttb_downsample)."""
    return temporal.lttb_downsample(table(spark, sf_dir, "events"))


@register(
    "ts_time_weighted_avg",
    f"""{E_CTE},
    d AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
            CAST(round(v * 100) AS BIGINT) AS c,
            coalesce(lead(epoch_us(ts)) OVER (PARTITION BY user_id,
                date_trunc('hour', ts) ORDER BY ts, event_id),
              epoch_us(ts)) - epoch_us(ts) AS w
          FROM e WHERE v IS NOT NULL),
    g AS (SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS n_events,
            sum(w) AS sw, sum(c * w) AS scw, sum(c) AS sc
          FROM d GROUP BY 1, 2)
    SELECT user_id, bucket, n_events,
      round(CASE WHEN sw > 0 THEN scw / CAST(sw AS DOUBLE) / 100.0
            ELSE CAST(sc AS DOUBLE) / n_events / 100.0 END,
            6) AS time_weighted_avg
    FROM g""",
)
def ts_time_weighted_avg(spark, sf_dir):
    """Hourly time-weighted average per series: each observation
    weighted by its holding time to the next one in the bucket
    (burst-proof aggregate; single-obs buckets fall back to the plain
    mean). Exact integer cents-x-micros sums, one shuffle
    (temporal.time_weighted_avg)."""
    return temporal.time_weighted_avg(table(spark, sf_dir, "events"))


def _esd_sql(rounds: int = 3, z2: int = 9, base: str | None = None) -> str:
    """Unrolled CTE chain for the integer-exact ESD peeling rounds.
    ``base`` overrides the r0 source CTEs: it must end with an ``r0``
    CTE producing (user_id, event_id, c BIGINT, f BOOLEAN)."""
    parts = [
        base
        if base is not None
        else E_CTE
        + """,
    r0 AS (SELECT user_id, event_id,
             CAST(round(v * 100) AS BIGINT) AS c, FALSE AS f FROM e)""",
    ]
    for i in range(rounds):
        p, q = i, i + 1
        parts.append(
            f"""s{q} AS (SELECT user_id,
               count(CASE WHEN NOT f THEN c END) AS n,
               coalesce(sum(CASE WHEN NOT f THEN c END), 0) AS s,
               coalesce(sum(CASE WHEN NOT f THEN c * c END), 0) AS q
             FROM r{p} GROUP BY user_id),
    c{q} AS (SELECT r{p}.user_id, r{p}.event_id, r{p}.c, r{p}.f,
               s{q}.n, s{q}.s, s{q}.q,
               CASE WHEN NOT r{p}.f AND r{p}.c IS NOT NULL
                    THEN (s{q}.n * r{p}.c - s{q}.s) * (s{q}.n * r{p}.c - s{q}.s)
               END AS dev2
             FROM r{p} JOIN s{q} USING (user_id)),
    m{q} AS (SELECT user_id, event_id FROM (
               SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY dev2 DESC, event_id) AS rk
               FROM c{q} WHERE dev2 IS NOT NULL)
             WHERE rk = 1 AND dev2 * (n - 1) > {z2} * n * (n * q - s * s)),
    r{q} AS (SELECT c.user_id, c.event_id, c.c,
               c.f OR (m.event_id IS NOT NULL) AS f
             FROM c{q} c LEFT JOIN m{q} m
               ON c.user_id = m.user_id AND c.event_id = m.event_id)"""
        )
    return (
        ",\n    ".join(parts)
        + f"\n    SELECT user_id, event_id, f AS is_anomaly FROM r{rounds}"
    )


@register(
    "doc_chunk_split",
    f"""WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    e AS (SELECT doc_id, toks,
            unnest(range(1, len(toks) + 1, 48)) AS s,
            generate_subscripts(range(1, len(toks) + 1, 48), 1) - 1 AS cid
          FROM t WHERE len(toks) > 0)
    SELECT doc_id,
      CAST(cid AS BIGINT) AS chunk_id,
      CAST(s AS BIGINT) AS start_token,
      CAST(len(toks[s : least(s + 63, len(toks))]) AS BIGINT) AS n_tokens,
      array_to_string(toks[s : least(s + 63, len(toks))], ' ') AS chunk_text
    FROM e""",
)
def doc_chunk_split(spark, sf_dir):
    """RAG chunking: overlapping 64-token windows at stride 48 per
    document — one map-side tokenize+slice pass, no shuffle
    (text.chunk_split); feeds the embedding/ANN retrieval half."""
    return text.chunk_split(table(spark, sf_dir, "documents"))


_HBX = (
    "list_transform({T}, x -> ('0x' || substr(md5(x), 1, 4))::BIGINT % 32)"
)
# query histogram under the same md5 bucket map, computed once at
# import (hashlib.md5 == Spark md5 == DuckDB md5 on the same bytes) —
# both engines get the identical dim-int literal, and cosine reduces
# to exact int64 product-sums with ONE final IEEE divide
_RAG_QCNT = text.query_hash_counts("spark window query over table", 32)
_RAG_SSQ = sum(c * c for c in _RAG_QCNT)
_RAG_QLIT = "[" + ", ".join(str(c) for c in _RAG_QCNT) + "]"


@register(
    "doc_rag_search",
    f"""WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    e AS (SELECT doc_id, toks,
            unnest(range(1, len(toks) + 1, 48)) AS s,
            generate_subscripts(range(1, len(toks) + 1, 48), 1) - 1 AS cid
          FROM t WHERE len(toks) > 0),
    c AS (SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
            array_to_string(toks[s : least(s + 63, len(toks))], ' ') AS chunk_text,
            toks[s : least(s + 63, len(toks))] AS ct
          FROM e),
    cb AS (SELECT doc_id, chunk_id, chunk_text,
             unnest({_HBX.format(T='ct')}) AS b FROM c),
    cnt AS (SELECT doc_id, chunk_id, chunk_text, b,
              CAST(count(*) AS BIGINT) AS c
            FROM cb GROUP BY doc_id, chunk_id, chunk_text, b),
    agg AS (SELECT doc_id, chunk_id, chunk_text,
              CAST(sum(c * ({_RAG_QLIT})[b + 1]) AS BIGINT) AS dot_i,
              CAST(sum(c * c) AS BIGINT) AS ss
            FROM cnt GROUP BY doc_id, chunk_id, chunk_text)
    SELECT doc_id, chunk_id, chunk_text,
           CASE WHEN ss > 0 AND {_RAG_SSQ} > 0
                THEN round(dot_i / (sqrt(ss) * sqrt(CAST({_RAG_SSQ} AS DOUBLE))), 6)
                ELSE 0.0 END AS cos_sim
    FROM agg
    ORDER BY cos_sim DESC, doc_id, chunk_id LIMIT 10""",
)
def doc_rag_search(spark, sf_dir):
    """End-to-end retrieval pipeline as ONE lazy plan: chunk the
    corpus (64-token windows, stride 48), feature-hash every chunk
    AND the query string with the same deterministic md5 bucket map,
    rank by cosine computed in exact int64 product-sums (slim
    (chunk, bucket) rows through two map-side-combined hash
    aggregates — no dense per-chunk vector), top-10 via
    TakeOrderedAndProject (text.rag_search)."""
    return text.rag_search(
        table(spark, sf_dir, "documents"), "spark window query over table"
    )


@register(
    "ts_ccf",
    f"""{E_CTE},
    p AS (SELECT user_id, date_trunc('hour', ts) AS b,
            sum(CAST(round(v * 100) AS BIGINT)) AS x
          FROM e GROUP BY 1, 2),
    p2 AS (SELECT * FROM p WHERE x IS NOT NULL),
    g AS (SELECT b, sum(x) AS y FROM p2 GROUP BY b),
    ex AS (SELECT p2.user_id, p2.b, p2.x, l.lag,
             p2.b + to_hours(l.lag) AS tb
           FROM p2 CROSS JOIN (SELECT unnest(range(-3, 4)) AS lag) l),
    j AS (SELECT ex.user_id, CAST(ex.lag AS INT) AS lag, ex.x, g.y
          FROM ex JOIN g ON ex.tb = g.b),
    a AS (SELECT user_id, lag, CAST(count(*) AS BIGINT) AS n,
            sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy,
            sum(x*x) AS sxx, sum(y*y) AS syy
          FROM j GROUP BY 1, 2)
    SELECT user_id, lag, n AS n_buckets,
      CASE WHEN sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                * sqrt(CAST(n*syy - sy*sy AS DOUBLE)) > 0
           THEN round(CAST(n*sxy - sx*sy AS DOUBLE)
                / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                   * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
      END AS ccf
    FROM a""",
)
def ts_ccf(spark, sf_dir):
    """Per-series cross-correlation function vs the global benchmark at
    lags -3..+3 hours — exact int64 Pearson product-sums, one fact
    scan, broadcast bucket-totals lag join
    (temporal.lagged_cross_correlation)."""
    return temporal.lagged_cross_correlation(table(spark, sf_dir, "events"))


@register(
    "dq_suite",
    """WITH a AS (SELECT count(*) AS n, count(value) AS nn,
             count(DISTINCT event_id) AS d,
             sum(CASE WHEN value BETWEEN -10000 AND 10000
                 THEN 1 ELSE 0 END) AS b
           FROM events),
    fk AS (SELECT count(*) AS n,
             sum(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS ok
           FROM orders o
           LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o.o_custkey = c.c_custkey)
    SELECT 'row_count' AS check, CAST(n AS DOUBLE) AS metric,
           n >= 1 AS passed FROM a
    UNION ALL
    SELECT 'completeness(value)', round(nn / CAST(n AS DOUBLE), 6), nn = n FROM a
    UNION ALL
    SELECT 'uniqueness(event_id)', round(d / CAST(n AS DOUBLE), 6), d = n FROM a
    UNION ALL
    SELECT 'bounds(value)', round(b / CAST(n AS DOUBLE), 6), b = n FROM a
    UNION ALL
    SELECT 'fk(o_custkey->c_custkey)', round(ok / CAST(n AS DOUBLE), 6),
           ok = n FROM fk""",
)
def dq_suite(spark, sf_dir):
    """Deequ-style data-quality suite: completeness/uniqueness/bounds
    over events in ONE aggregate scan, plus orders->customer FK
    conformance via a broadcast left join — each constraint one
    (check, metric, passed) row (olap.dq_checks/referential_check)."""
    from ..analytics import olap

    e = table(spark, sf_dir, "events")
    fk = olap.referential_check(
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
        "o_custkey",
        "c_custkey",
    )
    return olap.dq_checks(
        e, bounds={"value": (-10000, 10000)}
    ).unionByName(fk)


# S-H-ESD base: the seasonal-decomposition residual, quantized to
# cents with DuckDB's native round (the Spark side mirrors it with the
# duck_round half-away-from-zero formulation); edge rows with NULL
# trend are excluded — ESD then peels on the residual space.
_SHESD_BASE = f"""{E_CTE}, c0 AS (
      SELECT event_id, user_id, ts,
             CAST(round(v * 100) AS BIGINT) AS vc, hour(ts) AS ph FROM e),
    t0 AS (SELECT *,
          sum(vc) OVER wr AS swc, count(vc) OVER wr AS nwc,
          sum(vc) OVER (PARTITION BY user_id, ph) AS sp,
          count(vc) OVER (PARTITION BY user_id, ph) AS np,
          sum(vc) OVER (PARTITION BY user_id) AS sg,
          count(vc) OVER (PARTITION BY user_id) AS ng
      FROM c0
      WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    d0 AS (SELECT user_id, event_id,
          vc / 100.0
            - (CASE WHEN nwc = 25 THEN swc / (100.0 * 25) END)
            - (sp / (100.0 * np) - sg / (100.0 * ng)) AS resid
      FROM t0),
    r0 AS (SELECT user_id, event_id,
             CAST(round(resid * 100) AS BIGINT) AS c, FALSE AS f
           FROM d0 WHERE resid IS NOT NULL)"""


@register("ts_shesd", _esd_sql(base=_SHESD_BASE))
def ts_shesd(spark, sf_dir):
    """Seasonal-Hybrid ESD (the Twitter AnomalyDetection shape):
    additive seasonal decomposition first (centered-MA trend +
    hour-of-day mean-by-phase seasonal, exact integer cents), then
    generalized-ESD peeling on the RESIDUALS — rush-hour peaks stop
    masking true anomalies because the seasonal pattern is subtracted
    before the sigma test. Residuals quantize to cents with the
    duck_round half-away formulation (cross-engine tie behavior on
    quotient doubles); rows without a complete trend window are
    excluded (min_periods discipline)."""
    dec = temporal.seasonal_decompose(table(spark, sf_dir, "events"))
    rc = F.when(
        F.col("resid") >= 0, F.floor(F.col("resid") * 100 + 0.5)
    ).otherwise(-F.floor(-F.col("resid") * 100 + 0.5))
    d = dec.where(F.col("resid").isNotNull()).select(
        "user_id", "event_id", rc.cast("long").alias("rc")
    )
    return temporal.esd_anomalies(
        d, value_col="rc", precomputed_cents=True
    )


@register("ts_esd", _esd_sql())
def ts_esd(spark, sf_dir):
    """Generalized-ESD-style iterative outlier peeling, 3 rounds at
    z=3: each round removes the most deviant remaining point per
    series if it exceeds 3 sigma of the REMAINING points (fixes
    z-score masking). The test runs entirely in int64 cents
    arithmetic — (n·c-S)²·(n-1) > 9·n·(n·Q-S²) — so ranking and flag
    decisions are bit-identical across engines
    (temporal.esd_anomalies)."""
    return temporal.esd_anomalies(table(spark, sf_dir, "events"))


@register(
    "events_merge_upsert",
    """WITH t0 AS (SELECT *, row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         FROM events WHERE ts < TIMESTAMP '2024-01-16'),
    t AS (SELECT user_id, event_id, ts, value FROM t0 WHERE rn = 1),
    u0 AS (SELECT *, row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-16' AND event_type = 'purchase'),
    u AS (SELECT user_id, event_id, ts, value FROM u0 WHERE rn = 1)
    SELECT coalesce(t.user_id, u.user_id) AS user_id,
           CASE WHEN u.user_id IS NOT NULL THEN u.event_id ELSE t.event_id END AS event_id,
           CASE WHEN u.user_id IS NOT NULL THEN u.ts ELSE t.ts END AS ts,
           CASE WHEN u.user_id IS NOT NULL THEN u.value ELSE t.value END AS value
    FROM t FULL OUTER JOIN u ON t.user_id = u.user_id""",
)
def events_merge_upsert(spark, sf_dir):
    """Lakehouse-style batch MERGE: the compacted pre-cutoff state per
    user, upserted with the latest post-cutoff purchase (update-wins;
    unmatched updates insert, untouched users carry over). One window
    shuffle on the small update side + one full-outer key join
    (olap.merge_upsert)."""
    from ..analytics import olap

    e = table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    slim = ["user_id", "event_id", "ts", "value"]
    target = olap.latest_by_key(e.where(F.col("ts") < cut)).select(*slim)
    updates = e.where(
        (F.col("ts") >= cut) & (F.col("event_type") == "purchase")
    ).select(*slim)
    return olap.merge_upsert(target, updates)


@register(
    "ts_winsorize",
    f"""{E_CTE},
    arr AS (SELECT user_id, list_sort(list(v) FILTER (v IS NOT NULL)) AS a
            FROM e GROUP BY user_id),
    q AS (SELECT user_id, {spark_quantile_sql('a', 0.05)} AS lo,
                 {spark_quantile_sql('a', 0.95)} AS hi
          FROM arr),
    j AS (SELECT e.event_id, e.user_id, e.v, q.lo, q.hi
          FROM e JOIN q USING (user_id))
    SELECT event_id, user_id, round(v, 6) AS value,
      CASE WHEN v IS NOT NULL
           THEN round(least(greatest(v, lo), hi), 6) END AS value_winsorized,
      coalesce(v < lo OR v > hi, FALSE) AS is_clipped
    FROM j""",
)
def ts_winsorize(spark, sf_dir):
    """Per-series winsorization to the exact [p05, p95] band — one
    grouped exact-percentile pass, broadcast back, clip
    (temporal.winsorize)."""
    return temporal.winsorize(table(spark, sf_dir, "events"))


