"""Temporal joins + resampling (analytics/temporal.py).

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


# temporal joins + resampling (analytics/temporal.py)


@register(
    "ts_asof_join",
    """WITH p AS (SELECT user_id, ts, CASE WHEN isnan(value) THEN NULL ELSE value END AS value
           FROM events WHERE event_type = 'purchase')
    SELECT e.event_id, p.ts AS asof_ts, p.value AS asof_value
    FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts""",
)
def ts_asof_join(spark, sf_dir):
    """Backward as-of join: every event aligned with the user's most
    recent purchase (union + window forward-fill, one shuffle)."""
    from ..expressions import nan_to_null

    e = table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", nan_to_null(F.col("value")).alias("value")
    )
    out = temporal.asof_join(e, p, ["user_id"], value_cols=["value"])
    return out.select("event_id", "asof_ts", "asof_value")


@register(
    "ts_ewma",
    """WITH RECURSIVE e AS (SELECT event_id, user_id, ts,
           CASE WHEN isnan(value) THEN NULL ELSE value END AS v FROM events),
    o AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS rn FROM e),
    r AS (
      SELECT user_id, rn, event_id, v AS y FROM o WHERE rn = 1
      UNION ALL
      SELECT o.user_id, o.rn, o.event_id,
             CASE WHEN o.v IS NULL THEN r.y
                  WHEN r.y IS NULL THEN o.v
                  ELSE r.y * 0.75 + o.v * 0.25 END
      FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1)
    SELECT event_id, round(y, 6) AS ewma FROM r""",
)
def ts_ewma(spark, sf_dir):
    """Per-series EWMA (α=0.25), the sequential-recurrence operator:
    Arrow-batched pandas ewm kernel per series on the Spark side, a
    recursive CTE on the oracle side — bit-identical before rounding
    because α and 1-α are exact doubles (verified: 0/10000 raw-double
    mismatches; see temporal.ewma). The final rounding mirrors
    DuckDB's multiply-then-round-half-away double algorithm
    (floor(|x|·1e6 + 0.5) — Java's BigDecimal HALF_UP disagrees with
    it on ~3/10000 of these dyadic-heavy values)."""
    y = F.col("ewma")
    r6 = (
        F.when(y >= 0, F.floor(y * 1e6 + 0.5)).otherwise(-F.floor(-y * 1e6 + 0.5))
        / 1e6
    )
    return temporal.ewma(table(spark, sf_dir, "events")).select(
        "event_id", r6.alias("ewma")
    )


@register(
    "ts_holt",
    """WITH RECURSIVE e AS (SELECT event_id, user_id, ts,
           CASE WHEN isnan(value) THEN NULL ELSE value END AS v FROM events),
    o AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS rn FROM e),
    r AS (
      SELECT user_id, rn, event_id, v AS l,
             CASE WHEN v IS NULL THEN CAST(NULL AS DOUBLE) ELSE 0.0 END AS t
      FROM o WHERE rn = 1
      UNION ALL
      SELECT user_id, rn, event_id, nl,
             CASE WHEN v IS NULL THEN pt
                  WHEN pl IS NULL THEN 0.0
                  ELSE 0.25 * (nl - pl) + 0.75 * pt END
      FROM (
        SELECT o.user_id, o.rn, o.event_id, o.v, r.l AS pl, r.t AS pt,
               CASE WHEN o.v IS NULL THEN r.l
                    WHEN r.l IS NULL THEN o.v
                    ELSE 0.5 * o.v + 0.5 * (r.l + r.t) END AS nl
        FROM r JOIN o ON o.user_id = r.user_id AND o.rn = r.rn + 1))
    SELECT event_id, round(l, 6) AS level, round(t, 6) AS trend FROM r""",
)
def ts_holt(spark, sf_dir):
    """Holt's linear-trend double exponential smoothing (α=0.5,
    β=0.25): the two-state sequential recurrence, Arrow-batched numpy
    kernel vs recursive-CTE oracle, bit-identical before rounding
    because α/β and their complements are exact doubles and the
    operation order matches term-for-term (temporal.holt)."""
    from ..expressions import nan_to_null

    out = temporal.holt(table(spark, sf_dir, "events"))
    return out.select(
        "event_id",
        nan_to_null(duck_round6(F.col("level"))).alias("level"),
        nan_to_null(duck_round6(F.col("trend"))).alias("trend"),
    )


@register(
    "events_range_join",
    """WITH p AS (SELECT user_id, event_id AS p_event_id,
           ts - INTERVAL 30 MINUTE AS start_ts,
           ts + INTERVAL 30 MINUTE AS end_ts
       FROM events WHERE event_type = 'purchase')
    SELECT e.event_id, p.p_event_id
    FROM events e JOIN p
      ON e.user_id = p.user_id AND e.ts >= p.start_ts AND e.ts <= p.end_ts""",
)
def events_range_join(spark, sf_dir):
    """Point-in-interval range join (every event inside ±30min of a
    same-user purchase), decomposed into a bucketized EQUI-join — the
    naive BETWEEN predicate has no equi-key and degenerates toward a
    per-user cross product; this shape shuffles rows + interval-buckets
    and hash-joins. Oracle: the plain inequality join."""
    e = table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTE")).alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("end_ts"),
    )
    out = temporal.range_join(
        e.select("user_id", "event_id", "ts"), p, ["user_id"], bucket_seconds=1800
    )
    return out.select("event_id", "p_event_id")


@register(
    "events_latest_by_key",
    """WITH r AS (SELECT *, row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       FROM events)
    SELECT event_id, user_id, event_type FROM r WHERE rn = 1""",
)
def events_latest_by_key(spark, sf_dir):
    """CDC/upsert compaction: latest event per user (keep-last of
    merge-on-read ingestion). One hash-partitioned window shuffle."""
    from ..analytics import olap

    out = olap.latest_by_key(table(spark, sf_dir, "events"))
    return out.select("event_id", "user_id", "event_type")


@register(
    "events_table_diff",
    """WITH c AS (SELECT user_id, ts, event_id,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS cents FROM events),
    o AS (SELECT user_id, cents AS old_cents FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn
            FROM c WHERE ts < TIMESTAMP '2024-01-16') WHERE rn = 1),
    n AS (SELECT user_id, cents AS new_cents FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id
                ORDER BY ts DESC, event_id DESC) AS rn
            FROM c WHERE ts >= TIMESTAMP '2024-01-16') WHERE rn = 1),
    j AS (SELECT coalesce(o.user_id, n.user_id) AS user_id,
                 old_cents, new_cents,
                 o.user_id IS NOT NULL AS in_old,
                 n.user_id IS NOT NULL AS in_new
          FROM o FULL OUTER JOIN n ON o.user_id = n.user_id)
    SELECT user_id, old_cents, new_cents,
           CASE WHEN NOT in_old THEN 'added'
                WHEN NOT in_new THEN 'removed'
                ELSE 'changed' END AS status
    FROM j
    WHERE NOT (in_old AND in_new
               AND old_cents IS NOT DISTINCT FROM new_cents)""",
)
def events_table_diff(spark, sf_dir):
    """Snapshot diff between two time-sliced versions of the per-user
    latest state: added / removed / changed keys only — diff output
    scales with churn, not table size (olap.table_diff)."""
    from ..analytics import olap
    from ..expressions import nan_to_null

    cut = F.lit("2024-01-16").cast("timestamp")
    base = table(spark, sf_dir, "events").withColumn(
        "cents", F.round(nan_to_null(F.col("value")) * 100).cast("long")
    )
    old = olap.latest_by_key(base.where(F.col("ts") < cut))
    new = olap.latest_by_key(base.where(F.col("ts") >= cut))
    diff = olap.table_diff(old, new, keys=("user_id",), compare_cols=("cents",))
    return diff.select("user_id", "old_cents", "new_cents", "status")


@register(
    "ts_benchmark_corr",
    """WITH c AS (SELECT user_id, date_trunc('hour', ts) AS b,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    p AS (SELECT user_id, b, sum(vc) AS x FROM c GROUP BY 1, 2),
    g AS (SELECT b, sum(x) AS y FROM p GROUP BY 1),
    j AS (SELECT p.user_id, p.x, g.y FROM p JOIN g USING (b)
          WHERE p.x IS NOT NULL AND g.y IS NOT NULL)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_buckets,
           CASE WHEN sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE))
                     * sqrt(CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE)) > 0
                THEN round(CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
                     / (sqrt(CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE))
                        * sqrt(CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE))), 6)
           END AS benchmark_corr
    FROM j GROUP BY user_id""",
)
def ts_benchmark_corr(spark, sf_dir):
    """Per-series Pearson correlation to the global per-hour benchmark
    ("beta screening" — which sensors track the aggregate signal).
    Every Pearson term is an exact int64 product-sum over integer
    cents, so the correlation is engine-deterministic where float-mean
    formulations are not."""
    return temporal.benchmark_correlation(table(spark, sf_dir, "events"))


@register(
    "ts_rolling_corr",
    """WITH c AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100)
                AS BIGINT) AS vc FROM events),
    p AS (SELECT user_id, bucket, sum(vc) AS x FROM c GROUP BY 1, 2),
    g AS (SELECT bucket, sum(x) AS y FROM p GROUP BY 1),
    j AS (SELECT p.user_id, p.bucket, p.x, g.y FROM p JOIN g USING (bucket)
          WHERE p.x IS NOT NULL AND g.y IS NOT NULL),
    t AS (SELECT user_id, bucket,
            count(*) OVER w AS n,
            sum(x) OVER w AS sx, sum(y) OVER w AS sy,
            sum(x * y) OVER w AS sxy,
            sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
      FROM j
      WINDOW w AS (PARTITION BY user_id ORDER BY bucket
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
    SELECT user_id, bucket,
           CASE WHEN n = 24
                 AND sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)) > 0
                THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                        * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
           END AS rolling_corr
    FROM t""",
)
def ts_rolling_corr(spark, sf_dir):
    """Rolling 24-bucket Pearson correlation of each series' hourly
    totals to the global benchmark — regime changes show as
    correlation breaks. Windowed exact int64 product-sums divided
    once per row; full windows only."""
    return temporal.rolling_benchmark_correlation(table(spark, sf_dir, "events"))


@register(
    "events_asof_snapshot",
    """WITH r AS (SELECT *, row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
       FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00')
    SELECT event_id, user_id, event_type, ts FROM r WHERE rn = 1""",
)
def events_asof_snapshot(spark, sf_dir):
    """Point-in-time (bitemporal) state reconstruction: each key's
    latest record as of snapshot time T, read off the event changelog —
    the query side of CDC keep-last. The ts <= T predicate pushes to
    the parquet scan (a snapshot far in the past prunes most of the
    log via row-group stats), then ONE keyed window shuffle."""
    from ..analytics import olap

    e = table(spark, sf_dir, "events").where(
        F.col("ts") <= F.lit("2024-01-15 00:00:00").cast("timestamp")
    )
    return olap.latest_by_key(e).select("event_id", "user_id", "event_type", "ts")


@register(
    "events_scd2",
    """SELECT event_id, user_id, event_type, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to
    FROM events""",
)
def events_scd2(spark, sf_dir):
    """SCD type-2 build: change log -> validity intervals (valid until
    the key's next change; NULL = current). One keyed window shuffle;
    completes the bitemporal family next to keep-last compaction and
    the as-of snapshot."""
    from ..analytics import olap

    out = olap.scd2_intervals(table(spark, sf_dir, "events"))
    return out.select("event_id", "user_id", "event_type", "valid_from", "valid_to")


_PROFILE_COL_SQL = """SELECT '{c}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_value,
       CAST(max({c}) AS VARCHAR) AS max_value FROM e"""


@register(
    "events_profile",
    "WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us "
    "FROM events) "
    + " UNION ALL ".join(
        _PROFILE_COL_SQL.format(c=c)
        for c in ("event_id", "user_id", "event_type", "ts_us")
    ),
)
def events_profile(spark, sf_dir):
    """One-pass table profiling (row/null/exact-distinct counts +
    min/max per column) — the ANALYZE a 100 TB ingest runs first; all
    metrics ride one aggregate job over one scan. Timestamps profile
    as epoch micros (string rendering of timestamps/doubles is
    engine-specific; integer casts are not)."""
    from ..analytics import olap

    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    return olap.profile_table(e)


@register(
    "events_value_drift",
    """WITH e AS (SELECT event_type, ts,
           CASE WHEN isnan(value) THEN NULL ELSE value END AS v FROM events),
    a AS (SELECT event_type, CAST(floor(v / 10.0) AS BIGINT) AS bin,
                 CAST(count(*) AS BIGINT) AS n_a
          FROM e WHERE ts < TIMESTAMP '2024-01-16' AND v IS NOT NULL
          GROUP BY 1, 2),
    b AS (SELECT event_type, CAST(floor(v / 10.0) AS BIGINT) AS bin,
                 CAST(count(*) AS BIGINT) AS n_b
          FROM e WHERE ts >= TIMESTAMP '2024-01-16' AND v IS NOT NULL
          GROUP BY 1, 2),
    j AS (SELECT coalesce(a.event_type, b.event_type) AS event_type,
                 coalesce(a.bin, b.bin) AS bin,
                 coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b
          FROM a FULL JOIN b ON a.event_type = b.event_type AND a.bin = b.bin),
    t AS (SELECT *, sum(n_a) OVER (PARTITION BY event_type) AS ta,
                 sum(n_b) OVER (PARTITION BY event_type) AS tb FROM j)
    SELECT event_type, CAST(sum(n_a) AS BIGINT) AS n_a,
           CAST(sum(n_b) AS BIGINT) AS n_b,
           round(CAST(sum(abs(n_a * tb - n_b * ta)) AS DOUBLE)
                 / (CAST(max(ta) AS DOUBLE) * max(tb)), 6) AS l1_drift
    FROM t GROUP BY event_type""",
)
def events_value_drift(spark, sf_dir):
    """Distribution-drift monitoring between two snapshots (first vs
    second half of the month): per event type, the L1 distance between
    normalized value histograms, computed entirely in exact integer
    cross-products divided once — engine-deterministic where per-bin
    float sums and log-space PSI are not."""
    from ..analytics import olap

    e = table(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return olap.histogram_drift(
        e.where(F.col("ts") < cut), e.where(F.col("ts") >= cut)
    )


@register(
    "ts_seasonal_decompose",
    f"""{E_CTE}, c AS (
      SELECT event_id, user_id, ts,
             CAST(round(v * 100) AS BIGINT) AS vc, hour(ts) AS ph FROM e),
    t AS (SELECT *,
          sum(vc) OVER wr AS swc, count(vc) OVER wr AS nwc,
          sum(vc) OVER (PARTITION BY user_id, ph) AS sp,
          count(vc) OVER (PARTITION BY user_id, ph) AS np,
          sum(vc) OVER (PARTITION BY user_id) AS sg,
          count(vc) OVER (PARTITION BY user_id) AS ng
      FROM c
      WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    d AS (SELECT event_id,
          CASE WHEN nwc = 25 THEN swc / (100.0 * 25) END AS trend,
          sp / (100.0 * np) - sg / (100.0 * ng) AS seasonal,
          vc / 100.0 AS vv FROM t)
    SELECT event_id, round(trend, 6) AS trend, round(seasonal, 6) AS seasonal,
           round(vv - trend - seasonal, 6) AS resid FROM d""",
)
def ts_seasonal_decompose(spark, sf_dir):
    """Additive decomposition value = trend + seasonal + residual per
    series (centered-MA trend, hour-of-day mean-by-phase seasonal in
    exact integer cents, min_periods-style NULL edges). Oracle: the
    identical window formulation; both engines divide exact long sums
    once, so the doubles match bit-for-bit before rounding."""
    dec = temporal.seasonal_decompose(table(spark, sf_dir, "events"))
    return dec.select(
        "event_id",
        duck_round6(F.col("trend")).alias("trend"),
        duck_round6(F.col("seasonal")).alias("seasonal"),
        duck_round6(F.col("resid")).alias("resid"),
    )


@register(
    "ts_seasonal_anomaly",
    f"""{E_CTE}, c AS (
      SELECT event_id, user_id, ts,
             CAST(round(v * 100) AS BIGINT) AS vc, hour(ts) AS ph FROM e),
    t AS (SELECT *,
          sum(vc) OVER wr AS swc, count(vc) OVER wr AS nwc,
          sum(vc) OVER (PARTITION BY user_id, ph) AS sp,
          count(vc) OVER (PARTITION BY user_id, ph) AS np,
          sum(vc) OVER (PARTITION BY user_id) AS sg,
          count(vc) OVER (PARTITION BY user_id) AS ng
      FROM c
      WINDOW wr AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
    d AS (SELECT event_id, user_id,
          abs(vc / 100.0
              - CASE WHEN nwc = 25 THEN swc / (100.0 * 25) END
              - (sp / (100.0 * np) - sg / (100.0 * ng))) AS ar FROM t),
    qa AS (SELECT user_id, list_sort(list(ar) FILTER (ar IS NOT NULL)) AS a
           FROM d GROUP BY user_id),
    qt AS (SELECT user_id, {spark_quantile_sql('a', 0.99)} AS q99 FROM qa)
    SELECT d.event_id,
           coalesce(d.ar > qt.q99, FALSE) AS is_anomaly
    FROM d LEFT JOIN qt USING (user_id)""",
)
def ts_seasonal_anomaly(spark, sf_dir):
    """Seasonal-aware detection: |residual| above the per-series exact
    0.99 quantile of |residual| — a rule detector on raw values flags
    every rush hour; on residuals it flags departures from the
    pattern. Exact percentile (an order statistic) keeps the threshold
    engine-deterministic where float stddev would not be."""
    out = temporal.seasonal_anomaly(table(spark, sf_dir, "events"))
    return out.select("event_id", "is_anomaly")


@register(
    "events_interval_overlap",
    """WITH p AS (SELECT user_id, event_id AS iv_id,
           ts - INTERVAL 30 MINUTE AS start_ts,
           ts + INTERVAL 30 MINUTE AS end_ts
       FROM events WHERE event_type = 'purchase')
    SELECT a.iv_id AS iv_a, b.iv_id AS iv_b
    FROM p a JOIN p b
      ON a.user_id = b.user_id AND a.iv_id < b.iv_id
     AND a.start_ts <= b.end_ts AND b.start_ts <= a.end_ts""",
)
def events_interval_overlap(spark, sf_dir):
    """Interval×interval overlap self-join (same-user purchase windows
    within 60min of each other), bucketized with exactly-once pair
    emission via canonical-bucket attribution. Oracle: the naive
    inequality self-join."""
    e = table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("iv_id"),
        (F.col("ts") - F.expr("INTERVAL 30 MINUTE")).alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("end_ts"),
    )
    out = temporal.interval_overlap_join(p, p, ["user_id"], bucket_seconds=1800)
    return out.where(F.col("iv_id") < F.col("iv_id_b")).select(
        F.col("iv_id").alias("iv_a"), F.col("iv_id_b").alias("iv_b")
    )


@register(
    "events_rollup_hierarchy",
    """WITH c AS (SELECT event_type, ts,
           CAST(round(CASE WHEN isnan(value) THEN NULL ELSE value END * 100) AS BIGINT) AS vc
       FROM events),
    h AS (SELECT 'hour' AS level, event_type, date_trunc('hour', ts) AS bucket,
                 count(vc) AS n, sum(vc) AS s, min(vc) AS mn, max(vc) AS mx
          FROM c GROUP BY 2, 3),
    d AS (SELECT 'day' AS level, event_type, date_trunc('day', ts) AS bucket,
                 count(vc) AS n, sum(vc) AS s, min(vc) AS mn, max(vc) AS mx
          FROM c GROUP BY 2, 3),
    u AS (SELECT * FROM h UNION ALL SELECT * FROM d)
    SELECT level, event_type, bucket, CAST(n AS BIGINT) AS n,
           round(s / 100.0, 6) AS sum_value,
           round(mn / 100.0, 6) AS min_value,
           round(mx / 100.0, 6) AS max_value,
           round(s / (100.0 * n), 6) AS avg_value
    FROM u""",
)
def events_rollup_hierarchy(spark, sf_dir):
    """Hypertable-style continuous-aggregate rollup (hour -> day in one
    raw scan; coarser levels re-aggregate the finer level's exact
    integer-cent partials). Oracle aggregates each level from raw —
    identical results because count/sum/min/max are associative."""
    return temporal.rollup_hierarchy(
        table(spark, sf_dir, "events"), keys=("event_type",), levels=("hour", "day")
    )


@register(
    "ts_asof_tolerance",
    """WITH p AS (SELECT user_id, ts, CASE WHEN isnan(value) THEN NULL ELSE value END AS value
           FROM events WHERE event_type = 'purchase'),
    j AS (SELECT e.event_id, e.ts AS ets, p.ts AS asof_ts, p.value AS asof_value
          FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts)
    SELECT event_id,
           CASE WHEN asof_ts >= ets - INTERVAL '1 HOUR' THEN asof_ts END AS asof_ts,
           CASE WHEN asof_ts >= ets - INTERVAL '1 HOUR' THEN asof_value END AS asof_value
    FROM j""",
)
def ts_asof_tolerance(spark, sf_dir):
    """Backward as-of join with a pandas merge_asof-style tolerance:
    matches older than 1 hour are nulled (post-fill predicate, same
    single-shuffle plan)."""
    from ..expressions import nan_to_null

    e = table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", nan_to_null(F.col("value")).alias("value")
    )
    out = temporal.asof_join(
        e, p, ["user_id"], value_cols=["value"], tolerance="1 HOUR"
    )
    return out.select("event_id", "asof_ts", "asof_value")


@register(
    "ts_asof_forward",
    """WITH p AS (SELECT user_id, ts, CASE WHEN isnan(value) THEN NULL ELSE value END AS value
           FROM events WHERE event_type = 'purchase')
    SELECT e.event_id, p.ts AS asof_ts, p.value AS asof_value
    FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts <= p.ts""",
)
def ts_asof_forward(spark, sf_dir):
    """Forward as-of join: every event aligned with the user's NEXT
    purchase (reversed-sort window fill, still one shuffle)."""
    from ..expressions import nan_to_null

    e = table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", nan_to_null(F.col("value")).alias("value")
    )
    out = temporal.asof_join(e, p, ["user_id"], value_cols=["value"], direction="forward")
    return out.select("event_id", "asof_ts", "asof_value")


@register(
    "ts_resample_1h",
    """WITH e AS (SELECT user_id, ts, CASE WHEN isnan(value) THEN NULL ELSE value END AS v FROM events),
    a AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
                 count(*) AS n, count(v) AS nv,
                 sum(CAST(round(v*100) AS BIGINT)) AS cents
          FROM e GROUP BY 1, 2),
    s AS (SELECT user_id, min(bucket) b0, max(bucket) b1 FROM a GROUP BY 1),
    g AS (SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket FROM s),
    j AS (SELECT g.user_id, g.bucket, a.n, a.nv, a.cents,
                 CASE WHEN a.nv > 0 THEN round(a.cents / 100.0 / a.nv, 6) END AS v_avg
          FROM g LEFT JOIN a ON g.user_id = a.user_id AND g.bucket = a.bucket),
    f AS (SELECT user_id, bucket, n, v_avg,
            last_value(v_avg IGNORE NULLS) OVER wp AS prev_v,
            last_value(CASE WHEN v_avg IS NOT NULL THEN bucket END IGNORE NULLS) OVER wp AS prev_t,
            first_value(v_avg IGNORE NULLS) OVER wn AS next_v,
            first_value(CASE WHEN v_avg IS NOT NULL THEN bucket END IGNORE NULLS) OVER wn AS next_t
          FROM j
          WINDOW wp AS (PARTITION BY user_id ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY user_id ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT user_id, bucket, coalesce(n, 0) AS n_events, v_avg, prev_v AS v_locf,
           CASE WHEN v_avg IS NOT NULL THEN v_avg
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN prev_v + (next_v - prev_v) * ((epoch_us(bucket) - epoch_us(prev_t)) / CAST(epoch_us(next_t) - epoch_us(prev_t) AS DOUBLE))
                ELSE prev_v END AS v_lerp,
           v_avg IS NULL AS is_gap
    FROM f""",
)
def ts_resample_1h(spark, sf_dir):
    """Hourly resample of each user's event series with gap-fill:
    bucket mean, locf, and linear interpolation over a dense grid."""
    return temporal.resample(table(spark, sf_dir, "events"))


@register(
    "events_type_pivot",
    """SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events GROUP BY user_id""",
)
def events_type_pivot(spark, sf_dir):
    """Pivot event counts to one column per type. The explicit values
    list keeps it one pass (inferring pivot values costs an extra
    distinct scan)."""
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
        .na.fill(0, types)
    )


@register(
    "events_distinct_users",
    """SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type""",
)
def events_distinct_users(spark, sf_dir):
    """Exact distinct-count per group (two-phase: dedup shuffle then
    count). The sketch alternative is approx_count_distinct — same
    plan shape as ts_range_quantile_approx's t-digest path."""
    return (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "users_purchase_no_error",
    """SELECT user_id FROM events
    WHERE event_type = 'purchase' AND CAST(ts AS DATE) = DATE '2024-01-15'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'error' AND CAST(ts AS DATE) = DATE '2024-01-15'""",
)
def users_purchase_no_error(spark, sf_dir):
    """Relational set difference (EXCEPT): users who purchased but
    didn't error on a given day. Spark's subtract maps to a left-anti
    join on all columns under the hood."""
    e = table(spark, sf_dir, "events").withColumn("__day", F.col("ts").cast("date"))
    day = F.lit("2024-01-15").cast("date")
    return (
        e.where((F.col("event_type") == "purchase") & (F.col("__day") == day))
        .select("user_id")
        .subtract(
            e.where((F.col("event_type") == "error") & (F.col("__day") == day)).select(
                "user_id"
            )
        )
    )


@register(
    "events_value_percentiles",
    f"""{E_CTE}
    SELECT event_type,
           round(quantile_cont(v, 0.25), 6) AS p25,
           round(quantile_cont(v, 0.50), 6) AS p50,
           round(quantile_cont(v, 0.75), 6) AS p75,
           round(quantile_cont(v, 0.90), 6) AS p90
    FROM e GROUP BY event_type ORDER BY event_type""",
)
def events_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (sort-based exact
    percentile; the approx/t-digest variant is the scale path)."""
    tsf = events_tsf(spark, sf_dir)
    v = tsf.value
    return (
        tsf.df.groupBy("event_type")
        .agg(
            *[
                F.round(F.percentile(v, F.lit(q)), 6).alias(f"p{int(q * 100)}")
                for q in (0.25, 0.50, 0.75, 0.90)
            ]
        )
        .orderBy("event_type")
    )


