"""tsod detector queries (SURVEY §2.1) on the events table, keyed by user_id.

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


# tsod detector queries (SURVEY §2.1) on the events table, keyed by user_id


@register(
    "ts_range",
    f"{E_CTE} SELECT event_id, coalesce(v < 1.0 OR v > 300.0, FALSE) AS is_anomaly FROM e",
)
def ts_range(spark, sf_dir):
    """D1 RangeDetector with fixed bounds (detectors.py:121-130)."""
    out = RangeDetector(1.0, 300.0).detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_range_quantile",
    f"""{E_CTE},
    arr AS (SELECT user_id, list_sort(list(v) FILTER (v IS NOT NULL)) AS a
            FROM e GROUP BY user_id),
    th AS (SELECT user_id, {spark_quantile_sql('a', 0.02)} AS lo,
                  {spark_quantile_sql('a', 0.98)} AS hi
           FROM arr)
    SELECT e.event_id, coalesce(e.v < th.lo OR e.v > th.hi, FALSE) AS is_anomaly
    FROM e LEFT JOIN th USING (user_id)""",
)
def ts_range_quantile(spark, sf_dir):
    """D1f quantile fit + detect in one pass (detectors.py:104-119)."""
    out = RangeDetector(quantiles=[0.02, 0.98]).fit_detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_diff",
    f"{E_CTE} SELECT event_id, coalesce(abs(v - lag(v) OVER ({W})) > 80.0, FALSE) AS is_anomaly FROM e",
)
def ts_diff(spark, sf_dir):
    """D2 DiffDetector (detectors.py:172-178)."""
    out = DiffDetector(80.0).detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_diff_fit",
    f"""{E_CTE}, d AS (
      SELECT event_id, event_type, user_id, ts, v - lag(v) OVER ({W}) AS dv FROM e),
    t AS (SELECT event_id, dv,
          max(CASE WHEN event_type <> 'error' THEN dv END) OVER ({P}) AS thr FROM d)
    SELECT event_id, coalesce(abs(dv) > thr, FALSE) AS is_anomaly FROM t""",
)
def ts_diff_fit(spark, sf_dir):
    """D2f: per-series signed-max diff learned on non-error ("normal")
    events, single pass (detectors.py:166-170 semantics)."""
    tsf = events_tsf(spark, sf_dir)
    df = tsf.df.withColumn("__d", tsf.value - F.lag(tsf.value).over(tsf.w()))
    tsf2 = tsf.with_df(df)
    thr = F.max(F.when(F.col("event_type") != "error", F.col("__d"))).over(tsf2.w_all())
    return df.select("event_id", as_pred(F.abs(F.col("__d")) > thr).alias("is_anomaly"))


@register(
    "ts_range_low_only",
    f"{E_CTE} SELECT event_id, coalesce(v < 5.0, FALSE) AS is_anomaly FROM e",
)
def ts_range_low_only(spark, sf_dir):
    """D1 one-sided lower bound (detectors.py:124-128: max omitted)."""
    out = RangeDetector(min_value=5.0).detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_diff_positive",
    f"{E_CTE} SELECT event_id, coalesce((v - lag(v) OVER ({W})) > 60.0, FALSE) AS is_anomaly FROM e",
)
def ts_diff_positive(spark, sf_dir):
    """D2 direction='positive': only upward jumps flag
    (detectors.py:175-176 signed comparison)."""
    out = DiffDetector(60.0, direction="positive").detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_diff_negative",
    f"{E_CTE} SELECT event_id, coalesce((v - lag(v) OVER ({W})) < -60.0, FALSE) AS is_anomaly FROM e",
)
def ts_diff_negative(spark, sf_dir):
    """D2 direction='negative': only downward jumps flag
    (detectors.py:177-178)."""
    out = DiffDetector(60.0, direction="negative").detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


GRAD_SQL = (
    f"(v - lag(v) OVER ({W})) / "
    f"((epoch_us(ts) - lag(epoch_us(ts)) OVER ({W})) / 1000000.0)"
)


@register(
    "ts_gradient",
    f"{E_CTE} SELECT event_id, coalesce(abs({GRAD_SQL}) > 0.005, FALSE) AS is_anomaly FROM e",
)
def ts_gradient(spark, sf_dir):
    """D3 GradientDetector (detectors.py:311-318; kernel base.py:82-90)."""
    out = GradientDetector(0.005).detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_gradient_fit",
    f"""{E_CTE}, g AS (SELECT event_id, event_type, user_id, {GRAD_SQL} AS gv FROM e),
    t AS (SELECT event_id, gv,
          max(CASE WHEN event_type <> 'error' THEN abs(gv) END) OVER ({P}) AS thr FROM g)
    SELECT event_id, coalesce(abs(gv) > thr, FALSE) AS is_anomaly FROM t""",
)
def ts_gradient_fit(spark, sf_dir):
    """D3f: per-series max |gradient| learned on non-error events
    (detectors.py:305-309 semantics)."""
    tsf = events_tsf(spark, sf_dir)
    df = tsf.df.withColumn("__g", gradient_col(tsf))
    tsf2 = tsf.with_df(df)
    thr = F.max(F.when(F.col("event_type") != "error", F.abs(F.col("__g")))).over(
        tsf2.w_all()
    )
    return df.select("event_id", as_pred(F.abs(F.col("__g")) > thr).alias("is_anomaly"))


ROLLSTD_FR = f"{W} ROWS BETWEEN 5 PRECEDING AND 4 FOLLOWING"


@register(
    "ts_rolling_std",
    f"""{E_CTE}, s AS (
      SELECT event_id,
             CASE WHEN count(v) OVER fr >= 10 THEN stddev_samp(v) OVER fr END AS sd,
             row_number() OVER ({W}) AS rn
      FROM e WINDOW fr AS ({ROLLSTD_FR}))
    SELECT event_id, coalesce(sd > 80.0, FALSE) AND rn <> 1 AS is_anomaly FROM s""",
)
def ts_rolling_std(spark, sf_dir):
    """D4 RollingStandardDeviationDetector, centered window + min_periods
    guard (detectors.py:210-216)."""
    out = RollingStandardDeviationDetector(10, 80.0).detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_rolling_std_fit",
    f"""{E_CTE}, s AS (
      SELECT event_id, event_type, user_id, ts,
             CASE WHEN count(v) OVER fc >= 10 THEN stddev_samp(v) OVER fc END AS sd,
             CASE WHEN count(v) OVER ft >= 10 THEN stddev_samp(v) OVER ft END AS sdt,
             row_number() OVER ({W}) AS rn
      FROM e WINDOW fc AS ({ROLLSTD_FR}),
                  ft AS ({W} ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)),
    t AS (SELECT event_id, sd, rn,
          max(CASE WHEN event_type <> 'error' THEN sdt END) OVER ({P}) AS thr FROM s)
    SELECT event_id, coalesce(sd > thr, FALSE) AND rn <> 1 AS is_anomaly FROM t""",
)
def ts_rolling_std_fit(spark, sf_dir):
    """D4f: threshold = per-series max *trailing* rolling std anchored on
    non-error rows; detect uses the centered window (the reference's
    fit/detect window asymmetry, detectors.py:205-216)."""
    from ..windows import rolling

    tsf = events_tsf(spark, sf_dir)
    w = tsf.w()
    df = tsf.df.withColumn(
        "__sd", rolling(F.stddev_samp, tsf.value, w, 10, center=True)
    ).withColumn("__sdt", rolling(F.stddev_samp, tsf.value, w, 10, center=False))
    tsf2 = tsf.with_df(df)
    thr = F.max(F.when(F.col("event_type") != "error", F.col("__sdt"))).over(tsf2.w_all())
    rn = F.row_number().over(tsf2.w())
    return df.select(
        "event_id", (as_pred(F.col("__sd") > thr) & (rn != 1)).alias("is_anomaly")
    )


def _const_sql(val: str, thr: float, w_size: int = 3) -> str:
    """Oracle fragment: ConstantValueDetector pipeline over column
    expression ``val`` of CTE ``x`` (centered max-min, min_periods guard,
    edge mask, ±1 dilation)."""
    half = f"ROWS BETWEEN {w_size // 2} PRECEDING AND {w_size - w_size // 2 - 1} FOLLOWING"
    return f"""
    c AS (SELECT event_id, user_id, ts,
          CASE WHEN count({val}) OVER fr >= {w_size} THEN max({val}) OVER fr END AS mx,
          CASE WHEN count({val}) OVER fr >= {w_size} THEN min({val}) OVER fr END AS mn,
          row_number() OVER ({W}) AS rn,
          count(*) OVER ({P}) AS cnt
      FROM x WINDOW fr AS ({W} {half})),
    k AS (SELECT event_id, user_id, ts,
          (coalesce(abs(mx - mn) < {thr}, FALSE) AND rn <> 1 AND rn <> cnt) AS core FROM c)
    SELECT event_id, coalesce(core OR lag(core) OVER ({W}) OR lead(core) OVER ({W}), FALSE) AS is_anomaly
    FROM k"""


@register(
    "ts_constant_value",
    f"{E_CTE}, x AS (SELECT * FROM e), {_const_sql('v', 5.0)}",
)
def ts_constant_value(spark, sf_dir):
    """D5 ConstantValueDetector (detectors.py:237-251). Threshold 5.0
    flags low-variability stretches of this continuous-valued data."""
    out = ConstantValueDetector(3, 5.0).detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_constant_gradient",
    f"""{E_CTE},
    x AS (SELECT event_id, user_id, ts,
          {GRAD_SQL} AS gf,
          (v - lead(v) OVER ({W})) / ((epoch_us(ts) - lag(epoch_us(ts)) OVER ({W})) / 1000000.0) AS gb
      FROM e),
    fwd AS (WITH {_const_sql('gf', 1e-07)}),
    bwd AS (WITH {_const_sql('gb', 1e-07)})
    SELECT fwd.event_id, (fwd.is_anomaly OR bwd.is_anomaly) AS is_anomaly
    FROM fwd JOIN bwd USING (event_id)""",
)
def ts_constant_gradient(spark, sf_dir):
    """D6 ConstantGradientDetector: D5 pipeline over forward and backward
    gradients, OR-combined (detectors.py:271-276)."""
    out = ConstantGradientDetector(3).detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_hampel",
    f"""{E_CTE}, h AS (
      SELECT event_id, v,
             median(v) OVER fr AS med,
             mad(v) OVER fr AS madr,
             row_number() OVER ({W}) AS rn,
             count(*) OVER ({P}) AS cnt
      FROM e WINDOW fr AS ({W} ROWS BETWEEN 5 PRECEDING AND 4 FOLLOWING))
    SELECT event_id,
           (rn > 5 AND rn <= cnt - 5) AND coalesce(abs(v - med) > 3.0 * (1.4826 * madr), FALSE) AS is_anomaly
    FROM h""",
)
def ts_hampel(spark, sf_dir):
    """D7 HampelDetector: half-open window [t-w, t+w), exact rolling
    median/MAD, interior points only (hampel.py:27-60)."""
    out = HampelDetector(5, 3).detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_combined",
    f"""{E_CTE}, x AS (SELECT * FROM e),
    cv AS (WITH {_const_sql('v', 5.0)})
    SELECT e.event_id,
           (coalesce(e.v < 1.0 OR e.v > 300.0, FALSE)
            OR coalesce(abs(e.v - lag(e.v) OVER ({W})) > 80.0, FALSE)
            OR cv.is_anomaly) AS is_anomaly
    FROM e JOIN cv USING (event_id)""",
)
def ts_combined(spark, sf_dir):
    """D8 CombinedDetector: one fused plan, one scan, one sort — vs the
    reference's N sequential passes (detectors.py:43-49)."""
    det = CombinedDetector(
        [RangeDetector(1.0, 300.0), DiffDetector(80.0), ConstantValueDetector(3, 5.0)]
    )
    out = det.detect(events_tsf(spark, sf_dir))
    return out.select("event_id", "is_anomaly")


@register(
    "ts_lag_features",
    f"""{E_CTE} SELECT event_id,
           lag(v, 1) OVER ({W}) AS lag_1,
           lag(v, 2) OVER ({W}) AS lag_2,
           lag(v, 3) OVER ({W}) AS lag_3
    FROM e""",
)
def ts_lag_features(spark, sf_dir):
    """F1 lag_time_series (features.py:5-23)."""
    out = lag_time_series(events_tsf(spark, sf_dir), [1, 2, 3])
    return out.select(
        "event_id",
        F.col("1").alias("lag_1"),
        F.col("2").alias("lag_2"),
        F.col("3").alias("lag_3"),
    )


@register(
    "ts_window_dataset",
    f"""{E_CTE}, s AS (
      SELECT event_id,
             lag(v, 4) OVER ({W}) AS x1,
             lag(v, 3) OVER ({W}) AS x2,
             lag(v, 2) OVER ({W}) AS x3,
             lag(v, 1) OVER ({W}) AS x4,
             v AS y
      FROM e)
    SELECT event_id, x1, x2, x3, x4, y FROM s
    WHERE x1 IS NOT NULL AND x2 IS NOT NULL AND x3 IS NOT NULL AND x4 IS NOT NULL""",
)
def ts_window_dataset(spark, sf_dir):
    """F2 create_dataset: trailing feature windows for MLlib
    (features.py:26-32)."""
    out = create_dataset(events_tsf(spark, sf_dir), time_steps=4)
    return out.select(
        "event_id",
        *[F.element_at("features", i + 1).alias(f"x{i + 1}") for i in range(4)],
        "y",
    )


@register(
    "ts_resample_15m",
    """WITH e AS (SELECT user_id, ts, CASE WHEN isnan(value) THEN NULL ELSE value END AS v FROM events),
    a AS (SELECT user_id, time_bucket(INTERVAL '15 minutes', ts) AS bucket,
                 count(*) AS n, count(v) AS nv,
                 sum(CAST(round(v*100) AS BIGINT)) AS cents
          FROM e GROUP BY 1, 2),
    s AS (SELECT user_id, min(bucket) b0, max(bucket) b1 FROM a GROUP BY 1),
    g AS (SELECT user_id, unnest(generate_series(b0, b1, INTERVAL '15 minutes')) AS bucket FROM s),
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
def ts_resample_15m(spark, sf_dir):
    """Sub-calendar-unit resampling: epoch-aligned 15-minute tumbling
    buckets (F.window start == SQL time_bucket), same gap-fill plan."""
    return temporal.resample(table(spark, sf_dir, "events"), unit="15 minutes")


@register(
    "ts_range_sqlapi",
    f"{E_CTE} SELECT event_id, coalesce(v < 1.0 OR v > 300.0, FALSE) AS is_anomaly FROM e",
)
def ts_range_sqlapi(spark, sf_dir):
    """The same D1 range detection expressed PURELY through the SQL
    front-end (temp view + spark.sql) — demonstrates that every
    relational operator here is reachable from SQL alone, since the
    engine IS Spark SQL."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events_sqlapi")
    return spark.sql(
        """WITH e AS (SELECT event_id,
                CASE WHEN isnan(value) THEN NULL ELSE value END AS v
              FROM events_sqlapi)
        SELECT event_id,
               coalesce(v < 1.0 OR v > 300.0, FALSE) AS is_anomaly
        FROM e"""
    )


