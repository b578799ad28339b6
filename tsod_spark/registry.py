"""Driver-facing query registry: Spark query builders + DuckDB oracle SQL.

Every operator from SURVEY.md §2 (and the LLM-pipeline additions) gets a
``(spark, sf_dir) -> DataFrame`` builder here plus, where SQL can
express it, an ANSI-SQL twin with IDENTICAL semantics:

- anomaly flags are booleans (exact), keys are ints (exact);
- money sums run in integer cents (bit-exact across engines regardless
  of partial-aggregation order);
- unavoidable float outputs (quantiles, stddev, cosine) are computed
  with the same operation order/association in both engines and
  rounded to 6 decimals;
- integer outputs are cast to 64-bit on both sides.

Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .analytics import temporal, tpch
from .detectors import (
    CombinedDetector,
    ConstantGradientDetector,
    ConstantValueDetector,
    DiffDetector,
    GradientDetector,
    HampelDetector,
    RangeDetector,
    RollingStandardDeviationDetector,
)
from .detectors.gradient import gradient_col
from .encodings import read_table
from .expressions import as_pred
from .features import create_dataset, lag_time_series
from .frame import TimeSeriesFrame
from .pipeline import dedup, multimodal, similarity, text

# ---------------------------------------------------------------------------
# helpers


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table, normalizing timestamp encodings.

    The driver's events.parquet has shipped ``ts`` as TIMESTAMP(NANOS),
    TIMESTAMP(MICROS)-UTC, and TIMESTAMP(MICROS)-NTZ across rounds; all
    three are coerced to plain ``timestamp`` in one shared helper
    (:mod:`tsod_spark.encodings`) so every downstream ``unix_micros`` /
    range-window call site sees one type."""
    return read_table(spark, f"{sf_dir}/{name}.parquet")


def events_tsf(spark: SparkSession, sf_dir: str) -> TimeSeriesFrame:
    return TimeSeriesFrame(
        table(spark, sf_dir, "events"),
        ts_col="ts",
        value_col="value",
        series=["user_id"],
        tiebreak=["event_id"],
    )


# oracle fragments ----------------------------------------------------------

E_CTE = (
    "WITH e AS (SELECT event_id, user_id, event_type, ts, "
    "CASE WHEN isnan(value) THEN NULL ELSE value END AS v FROM events)"
)
W = "PARTITION BY user_id ORDER BY ts, event_id"
P = "PARTITION BY user_id"
TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
DTOKS = f"list_distinct({TOKS})"


def _shingle_sql(toks: str = "toks", n: int = 3) -> str:
    """Distinct word n-gram shingles of token-list column ``toks``
    (DuckDB range(a,b) is empty when b <= a, matching the Spark guard)."""
    gram = " || ' ' || ".join(f"{toks}[i + {j}]" if j else f"{toks}[i]" for j in range(n))
    return f"list_distinct(list_transform(range(1, len({toks}) - {n - 2}), i -> {gram}))"
HIGH_HEX = "('8','9','a','b','c','d','e','f')"


def duck_round6(col: Column) -> Column:
    """round(x, 6) mirroring DuckDB's multiply-then-round-half-away
    double algorithm (floor(|x|*1e6 + 0.5)) — Spark's F.round is Java
    BigDecimal HALF_UP on the shortest decimal repr and disagrees on
    dyadic-heavy values (see ts_ewma; verify-skill gotcha)."""
    return (
        F.when(col >= 0, F.floor(col * 1e6 + 0.5)).otherwise(
            -F.floor(-col * 1e6 + 0.5)
        )
        / 1e6
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
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
    f"""{E_CTE}, s AS (
      SELECT event_id, v,
             quantile_cont(v, 0.02) OVER ({P}) AS lo,
             quantile_cont(v, 0.98) OVER ({P}) AS hi
      FROM e)
    SELECT event_id, coalesce(v < lo OR v > hi, FALSE) AS is_anomaly FROM s""",
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
    from .windows import rolling

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


# ---------------------------------------------------------------------------
# star-schema analytics (SURVEY §7 phase 4)


@register(
    "tpch_q1",
    """WITH li AS (SELECT l_returnflag, l_linestatus,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
           CAST(round(l_discount * 100) AS BIGINT) AS d,
           CAST(round(l_tax * 100) AS BIGINT) AS t,
           CAST(round(l_quantity) AS BIGINT) AS q
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01')
    SELECT l_returnflag, l_linestatus,
           CAST(sum(q) AS BIGINT) AS sum_qty,
           sum(c) / 100.0 AS sum_base_price,
           sum(c * (100 - d)) / 10000.0 AS sum_disc_price,
           sum(c * (100 - d) * (100 + t)) / 1000000.0 AS sum_charge,
           round(sum(q) / count(*), 6) AS avg_qty,
           round(sum(c) / 100.0 / count(*), 6) AS avg_price,
           round(sum(d) / 100.0 / count(*), 6) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM li GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus""",
)
def tpch_q1(spark, sf_dir):
    return tpch.q1_pricing_summary(table(spark, sf_dir, "lineitem"))


@register(
    "tpch_q3",
    """SELECT l_orderkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey AND o_orderdate < TIMESTAMP '1998-06-15'
    JOIN customer ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
    WHERE l_shipdate > TIMESTAMP '1998-06-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10""",
)
def tpch_q3(spark, sf_dir):
    return tpch.q3_shipping_priority(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
    )


@register(
    "tpch_q5",
    """SELECT n_name,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name""",
)
def tpch_q5(spark, sf_dir):
    return tpch.q5_local_supplier_volume(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"),
    )


@register(
    "tpch_q6",
    """WITH li AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
                          CAST(round(l_discount * 100) AS BIGINT) AS d
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        AND l_quantity < 24)
    SELECT sum(c * d) / 10000.0 AS revenue, CAST(count(*) AS BIGINT) AS n_items FROM li""",
)
def tpch_q6(spark, sf_dir):
    return tpch.q6_forecast_revenue(table(spark, sf_dir, "lineitem"))


@register(
    "tpch_q4",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority""",
)
def tpch_q4(spark, sf_dir):
    return tpch.q4_order_priority(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    )


@register(
    "tpch_q14",
    """WITH li AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
             p_type
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01')
    SELECT round(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) * 100.0 / sum(rev), 6) AS promo_revenue_pct,
           sum(rev) / 10000.0 AS total_revenue
    FROM li""",
)
def tpch_q14(spark, sf_dir):
    return tpch.q14_promo_effect(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    )


@register(
    "tpch_q17",
    """WITH li AS (SELECT l.* FROM lineitem l JOIN part ON l_partkey = p_partkey
                   WHERE p_brand = 'Brand#9'),
    a AS (SELECT l_partkey AS pk,
                 sum(CAST(round(l_quantity) AS BIGINT)) / count(*) AS avg_qty
          FROM li GROUP BY 1)
    SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / 7.0 AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM li JOIN a ON l_partkey = pk
    WHERE l_quantity < 0.5 * avg_qty""",
)
def tpch_q17(spark, sf_dir):
    return tpch.q17_small_quantity_revenue(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    )


@register(
    "tpch_q18",
    """WITH big AS (
      SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250)
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS o_totalprice,
           sum_qty
    FROM big JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def tpch_q18(spark, sf_dir):
    return tpch.q18_large_orders(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
    )


@register(
    "tpch_q19",
    """SELECT sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 30 AND l_quantity BETWEEN 20 AND 40)""",
)
def tpch_q19(spark, sf_dir):
    return tpch.q19_disjunctive_revenue(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    )


@register(
    "tpch_q22",
    """WITH p AS (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s, count(*) AS n
                  FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs,
           sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 100.0 AS total_acctbal
    FROM customer, p
    WHERE CAST(round(c_acctbal * 100) AS BIGINT) > s / n
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment ORDER BY c_mktsegment""",
)
def tpch_q22(spark, sf_dir):
    return tpch.q22_global_sales_opportunity(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )


@register(
    "top_customers",
    """SELECT c_custkey, c_name,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_spend,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spend DESC, c_custkey LIMIT 10""",
)
def top_customers(spark, sf_dir):
    return tpch.top_customers(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )


@register(
    "events_daily",
    """SELECT CAST(ts AS DATE) AS day, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0 / count(*), 6) AS avg_value
    FROM events GROUP BY CAST(ts AS DATE), event_type
    ORDER BY day, event_type""",
)
def events_daily(spark, sf_dir):
    return tpch.events_daily(table(spark, sf_dir, "events"))


@register(
    "events_props_json",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                 / count(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
    FROM events GROUP BY event_type ORDER BY event_type""",
)
def events_props_json(spark, sf_dir):
    return tpch.events_props_stats(table(spark, sf_dir, "events"))


@register(
    "events_rollup",
    """WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type,
           CASE WHEN isnan(value) THEN NULL ELSE value END AS v FROM events)
    SELECT day, event_type, CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(v * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM e GROUP BY ROLLUP(day, event_type)""",
)
def events_rollup(spark, sf_dir):
    return tpch.events_rollup(table(spark, sf_dir, "events"))


@register(
    "events_sessions",
    f"""WITH g AS (
      SELECT user_id, event_id, ts,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER ({W})) / 1000000.0 AS gap
      FROM events),
    s AS (SELECT user_id, event_id, ts,
          sum(CASE WHEN coalesce(gap > 1800, TRUE) THEN 1 ELSE 0 END)
            OVER ({W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           (max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000.0 AS duration_sec
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id""",
)
def events_sessions(spark, sf_dir):
    return tpch.sessionize(table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
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
    from .expressions import nan_to_null

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
    from .expressions import nan_to_null

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
    from .analytics import olap

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
    from .analytics import olap
    from .expressions import nan_to_null

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
    from .analytics import olap

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
    from .analytics import olap

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
    from .analytics import olap

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
    from .analytics import olap

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
              - (sp / (100.0 * np) - sg / (100.0 * ng))) AS ar FROM t)
    SELECT event_id,
           coalesce(ar > quantile_cont(ar, 0.99) OVER (PARTITION BY user_id),
                    FALSE) AS is_anomaly
    FROM d""",
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
    from .expressions import nan_to_null

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
    from .expressions import nan_to_null

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


# ---------------------------------------------------------------------------
# text analysis (pipeline/text.py)


@register(
    "doc_stats",
    f"""WITH d AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_words,
           round(len(list_distinct(toks)) / len(toks), 6) AS type_token_ratio,
           round(CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) / len(toks), 6) AS mean_word_len,
           round(least(length(text) / 500.0, 1.0) * (len(list_distinct(toks)) / len(toks)), 6) AS quality_score
    FROM d""",
)
def doc_stats(spark, sf_dir):
    return text.text_stats(table(spark, sf_dir, "documents"))


_SW = ", ".join(f"'{s}'" for s in text.STOPWORDS_EN)


@register(
    "doc_budget_select",
    f"""WITH d AS (SELECT doc_id, source AS part, {TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, part, CAST(len(toks) AS BIGINT) AS n_tokens,
            CASE WHEN len(toks) > 0
                 THEN round(len(list_filter(toks, x -> x IN ({_SW})))
                            / CAST(len(toks) AS DOUBLE), 6) END AS quality
        FROM d),
    r AS (SELECT *, coalesce(sum(n_tokens) OVER w_rank, 0) AS cb,
            CAST(row_number() OVER (PARTITION BY part
                 ORDER BY quality DESC NULLS LAST, doc_id) AS BIGINT) AS sel_rank
        FROM s
        WINDOW w_rank AS (PARTITION BY part
                          ORDER BY quality DESC NULLS LAST, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT doc_id, part, n_tokens, quality, sel_rank
    FROM r WHERE cb < 600""",
)
def doc_budget_select(spark, sf_dir):
    """Token-budget-aware curation: per source, greedily keep the
    highest-stopword-ratio (fluency-proxy) docs until a 600-token
    budget fills (roughly the top 40% of each source's tokens, so the
    cut is non-vacuous at every test scale) — quality-ranked selection via a windowed exact-int
    cumsum, no global sort."""
    return curate.budget_select(table(spark, sf_dir, "documents"), token_budget=600)


@register(
    "doc_quality",
    f"""WITH d AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
            CAST(length(text) AS BIGINT) AS n_chars,
            CAST(len(toks) AS BIGINT) AS n_words,
            length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
            length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
            length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
            len(list_filter(toks, x -> x IN ({_SW}))) AS n_stop
        FROM d),
    r AS (SELECT doc_id, n_chars, n_words,
            CASE WHEN n_chars > 0 THEN round(n_punct / n_chars, 6) END AS punct_ratio,
            CASE WHEN n_chars > 0 THEN round(n_upper / n_chars, 6) END AS upper_ratio,
            CASE WHEN n_chars > 0 THEN round(n_digit / n_chars, 6) END AS digit_ratio,
            CASE WHEN n_words > 0 THEN round(n_stop / n_words, 6) END AS stopword_ratio
        FROM s)
    SELECT *, (n_words < 5 OR coalesce(stopword_ratio < 0.01, TRUE)
               OR coalesce(punct_ratio > 0.2, TRUE)) AS is_low_quality
    FROM r""",
)
def doc_quality(spark, sf_dir):
    return text.quality_signals(table(spark, sf_dir, "documents"))


@register(
    "doc_token_counts",
    f"""SELECT doc_id,
           CAST(len({TOKS}) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{text.BPE_TOKEN_RE}')) AS BIGINT) AS bpe_tokens
    FROM documents""",
)
def doc_token_counts(spark, sf_dir):
    return text.token_counts(table(spark, sf_dir, "documents"))


def _lang_sql() -> str:
    langs = list(text.LANG_MARKERS)
    scores = []
    for lang, markers in text.LANG_MARKERS.items():
        in_list = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            f"CAST(len(list_filter(toks, x -> x IN ({in_list}))) AS BIGINT) AS score_{lang}"
        )
    whens = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"score_{lang} >= score_{l2}" for l2 in langs[i + 1 :])
        whens.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{langs[-1]}' END"
    return f"""WITH d AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, lang, {', '.join(scores)} FROM d)
    SELECT doc_id, {', '.join('score_' + lang for lang in langs)},
           {case} AS predicted_lang,
           ({case}) = lang AS matches_label
    FROM s"""


@register("doc_lang_id", _lang_sql())
def doc_lang_id(spark, sf_dir):
    return text.lang_id(table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprints",
    f"""WITH d AS (SELECT doc_id, text, list_sort({DTOKS}) AS toks FROM documents)
    SELECT doc_id,
           md5(text) AS content_md5,
           md5(array_to_string(toks, ' ')) AS bag_md5,
           CAST(list_sum(list_transform(toks, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)) % 2147483647 AS BIGINT) AS bag_hash
    FROM d""",
)
def doc_fingerprints(spark, sf_dir):
    return text.fingerprints(table(spark, sf_dir, "documents"))


@register(
    "doc_repetition",
    f"""WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    g AS (SELECT doc_id, toks,
            list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i + 1]) AS g2,
            list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g3
          FROM t),
    m AS (SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_tokens,
            CASE WHEN len(toks) > 0 THEN round(
              list_max(list_transform(list_distinct(toks),
                                      d -> len(list_filter(toks, x -> x = d))))
              / len(toks), 6) END AS top_unigram_share,
            CASE WHEN len(g2) > 0 THEN round(1 - len(list_distinct(g2)) / len(g2), 6) END AS dup_2gram_frac,
            CASE WHEN len(g3) > 0 THEN round(1 - len(list_distinct(g3)) / len(g3), 6) END AS dup_3gram_frac
          FROM g)
    SELECT *,
           coalesce(n_tokens >= 10 AND top_unigram_share > 0.2, FALSE)
           OR coalesce(dup_2gram_frac > 0.4, FALSE)
           OR coalesce(dup_3gram_frac > 0.3, FALSE) AS is_repetitive
    FROM m""",
)
def doc_repetition(spark, sf_dir):
    """Gopher-style repetition quality filters (top-unigram share,
    duplicate n-gram fractions) — pure column algebra, shuffle-free."""
    return text.repetition_signals(table(spark, sf_dir, "documents"))


from .pipeline import curate  # noqa: E402

_RED = "'[REDACTED]', 'g'"
_EM = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PH = r"\+?[0-9][0-9\- ]{7,}[0-9]"


@register(
    "doc_redact",
    f"""WITH t AS (SELECT doc_id, lower(text) AS txt FROM documents)
    SELECT doc_id,
      CAST(len(regexp_extract_all(txt, '{_EM}')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(txt, '{_PH}')) AS BIGINT) AS n_phones,
      CAST(len(regexp_extract_all(txt, '\\bcustomer\\b'))
           + len(regexp_extract_all(txt, '\\bsupplier\\b')) AS BIGINT) AS n_terms,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        txt, '{_EM}', {_RED}), '{_PH}', {_RED}),
        '\\bcustomer\\b', {_RED}), '\\bsupplier\\b', {_RED}) AS redacted_text
    FROM t""",
)
def doc_redact(spark, sf_dir):
    """Regex-class (email/phone) + denylist-term redaction with match
    counts — one chained regexp_replace pass, shuffle-free."""
    return curate.redact(table(spark, sf_dir, "documents"))


@register(
    "doc_decontaminate",
    f"""WITH t AS (SELECT doc_id, source, {TOKS} AS toks0 FROM documents),
    d AS (SELECT doc_id, source, {{}} AS gs FROM t),
    bg AS (SELECT DISTINCT unnest(gs) AS g FROM d WHERE source = 'src0'),
    c AS (SELECT doc_id, gs FROM d WHERE source <> 'src0'),
    dg AS (SELECT doc_id, unnest(gs) AS g FROM c),
    h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM dg JOIN bg USING (g) GROUP BY 1)
    SELECT c.doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
           coalesce(n_hits, 0) AS n_contaminated,
           CASE WHEN len(gs) > 0
                THEN round(coalesce(n_hits, 0) / len(gs), 6) END AS contaminated_frac,
           coalesce(n_hits, 0) > 0 AS is_contaminated
    FROM c LEFT JOIN h ON c.doc_id = h.doc_id""".format(_shingle_sql("toks0", 5)),
)
def doc_decontaminate(spark, sf_dir):
    """GPT-3-style benchmark decontamination: distinct 5-gram collision
    against the (broadcast) src0 benchmark slice — no corpus shuffle."""
    docs = table(spark, sf_dir, "documents")
    return curate.decontaminate(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
        n=5,
    )


@register(
    "doc_split_assign",
    """SELECT doc_id,
           ('0x' || substr(md5(text), 1, 4))::BIGINT % 10 AS bucket,
           CASE WHEN ('0x' || substr(md5(text), 1, 4))::BIGINT % 10 < 8 THEN 'train'
                WHEN ('0x' || substr(md5(text), 1, 4))::BIGINT % 10 < 9 THEN 'val'
                ELSE 'test' END AS split
    FROM documents""",
)
def doc_split_assign(spark, sf_dir):
    """Deterministic content-hash train/val/test assignment (stable
    under re-sharding and corpus growth)."""
    return curate.split_assign(table(spark, sf_dir, "documents"))


@register(
    "doc_pack_sequences",
    f"""WITH t AS (SELECT doc_id, source AS part,
                  CAST(len({TOKS}) AS BIGINT) AS n_tokens FROM documents),
    c AS (SELECT *, coalesce(sum(n_tokens) OVER (
            PARTITION BY part ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM t)
    SELECT doc_id, part, n_tokens,
           CAST(floor(cb / 256) AS BIGINT) AS seq_id,
           CAST(cb % 256 AS BIGINT) AS seq_offset,
           CASE WHEN n_tokens > 0
                THEN floor((cb + n_tokens - 1) / 256) > floor(cb / 256)
                ELSE FALSE END AS straddles_boundary
    FROM c""",
)
def doc_pack_sequences(spark, sf_dir):
    """Greedy in-order token-budget sequence packing per source
    partition (windowed cumsum, no global sort)."""
    return curate.pack_sequences(table(spark, sf_dir, "documents"))


@register(
    "doc_lm_rarity",
    f"""WITH ref AS (SELECT unnest({TOKS}) AS w FROM documents
                    WHERE source IN ('src0', 'src1', 'src2')),
    rc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ref GROUP BY w),
    dt AS (SELECT doc_id, unnest({TOKS}) AS w FROM documents
           WHERE source NOT IN ('src0', 'src1', 'src2')),
    j AS (SELECT doc_id, dt.w, rc.c FROM dt LEFT JOIN rc USING (w))
    SELECT doc_id, CAST(count(w) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END)
                 / CAST(count(w) AS DOUBLE), 6) AS oov_rate,
           round(quantile_cont(coalesce(c, 0), 0.5), 6) AS median_ref_count
    FROM j GROUP BY doc_id""",
)
def doc_lm_rarity(spark, sf_dir):
    """Reference-LM rarity scoring (CCNet-style quality filter): exact
    OOV counts + median reference frequency per doc against a unigram
    LM built from three reference sources — integer statistics and an
    order statistic instead of float log-prob sums, so the oracle
    matches exactly."""
    docs = table(spark, sf_dir, "documents")
    ref_sources = ("src0", "src1", "src2")
    return text.lm_rarity(
        docs.where(~F.col("source").isin(*ref_sources)),
        docs.where(F.col("source").isin(*ref_sources)),
    )


@register(
    "doc_tfidf_topk",
    f"""WITH tk AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tk GROUP BY 1, 2),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
    s AS (SELECT doc_id, tf.term, tf, df,
                 round(tf * ln((nd + 1) / (df + 1)), 6) AS tfidf
          FROM tf JOIN dfq USING (term) CROSS JOIN n),
    r AS (SELECT *, CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rk
          FROM s)
    SELECT doc_id, term, tf, df, tfidf, rk FROM r WHERE rk <= 5""",
)
def doc_tfidf_topk(spark, sf_dir):
    """Top-5 TF-IDF keywords per doc (round-before-rank keeps the
    cross-engine top-k stable)."""
    return text.tfidf_topk(table(spark, sf_dir, "documents"))


BM25_TERMS = ("spark", "window", "merge")


@register(
    "doc_bm25_search",
    f"""WITH tk AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM tk),
    st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                  CAST(sum(dl) AS BIGINT) AS stt FROM lens),
    tf AS (SELECT doc_id, dl, w AS term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, dl, unnest(toks) AS w FROM lens)
           WHERE w IN ('spark', 'window', 'merge')
           GROUP BY 1, 2, 3),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    s AS (SELECT doc_id,
            round(sum(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
                  * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl * nd / stt)))),
                  6) AS score,
            CAST(count(*) AS BIGINT) AS n_terms_hit
          FROM tf JOIN dfq USING (term) CROSS JOIN st GROUP BY doc_id),
    r AS (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                         AS BIGINT) AS rk FROM s)
    SELECT doc_id, score, n_terms_hit, rk FROM r WHERE rk <= 20""",
)
def doc_bm25_search(spark, sf_dir):
    """Okapi BM25 full-text ranking for a fixed 3-term query: postings
    filtered to the broadcast term set before any shuffle, exact
    bigint dl·N/Σdl length normalization (see text.bm25_search)."""
    return text.bm25_search(table(spark, sf_dir, "documents"), list(BM25_TERMS))


@register(
    "doc_vocab_overlap",
    f"""WITH tk AS (SELECT source, {TOKS} AS toks FROM documents),
    v AS (SELECT DISTINCT source AS g, unnest({_shingle_sql('toks', 2)}) AS gram
          FROM tk),
    sz AS (SELECT s.g, CAST(coalesce(c.vsz, 0) AS BIGINT) AS vsz
           FROM (SELECT DISTINCT source AS g FROM documents) s
           LEFT JOIN (SELECT g, count(*) AS vsz FROM v GROUP BY g) c
             USING (g)),
    inter AS (SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS n_common
              FROM v a JOIN v b USING (gram) WHERE a.g < b.g GROUP BY 1, 2),
    p AS (SELECT sa.g AS source_a, sb.g AS source_b,
                 sa.vsz AS vocab_a, sb.vsz AS vocab_b
          FROM sz sa CROSS JOIN sz sb WHERE sa.g < sb.g)
    SELECT source_a, source_b, vocab_a, vocab_b,
           CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
           CASE WHEN vocab_a + vocab_b - coalesce(n_common, 0) > 0
                THEN round(coalesce(n_common, 0)
                     / CAST(vocab_a + vocab_b - coalesce(n_common, 0) AS DOUBLE),
                     6)
                ELSE 0.0 END AS jaccard
    FROM p LEFT JOIN inter ON source_a = ga AND source_b = gb""",
)
def doc_vocab_overlap(spark, sf_dir):
    """Pairwise bigram-vocabulary Jaccard between the 20 sources —
    corpus collapses to a distinct (source, gram) vocabulary first, so
    the self-join runs on vocab scale, not corpus scale."""
    return text.vocab_overlap(table(spark, sf_dir, "documents"))


_SW = "('the', 'a', 'an', 'of', 'and', 'to', 'in', 'is', 'it', 'that')"


@register(
    "doc_curation_pipeline",
    f"""WITH base AS (SELECT doc_id, text, source FROM documents
                     WHERE source <> 'src0'),
    tq AS (SELECT doc_id, text, source, {TOKS} AS toks FROM base),
    qs AS (SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(length(text) AS BIGINT) AS n_chars,
             length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
             len(list_filter(toks, x -> x IN {_SW})) AS n_stop
           FROM tq),
    ql AS (SELECT doc_id, (n_words < 5
            OR coalesce(CASE WHEN n_words > 0 THEN round(n_stop / n_words, 6) END < 0.01, TRUE)
            OR coalesce(CASE WHEN n_chars > 0 THEN round(n_punct / n_chars, 6) END > 0.2, TRUE)) AS low
           FROM qs),
    rg AS (SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS g2,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g3
           FROM tq),
    rm AS (SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN round(
               list_max(list_transform(list_distinct(toks),
                                       d -> len(list_filter(toks, x -> x = d))))
               / len(toks), 6) END AS tus,
             CASE WHEN len(g2) > 0 THEN round(1 - len(list_distinct(g2)) / len(g2), 6) END AS d2,
             CASE WHEN len(g3) > 0 THEN round(1 - len(list_distinct(g3)) / len(g3), 6) END AS d3
           FROM rg),
    rp AS (SELECT doc_id, (coalesce(n_tokens >= 10 AND tus > 0.2, FALSE)
            OR coalesce(d2 > 0.4, FALSE) OR coalesce(d3 > 0.3, FALSE)) AS rep
           FROM rm),
    dk AS (SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep_dup
           FROM base),
    bg AS (SELECT DISTINCT unnest({_shingle_sql('toks', 5)}) AS g
           FROM (SELECT {TOKS} AS toks FROM documents WHERE source = 'src0')),
    dg AS (SELECT doc_id, unnest({_shingle_sql('toks', 5)}) AS g FROM tq),
    ch AS (SELECT DISTINCT doc_id FROM dg JOIN bg USING (g)),
    kept AS (SELECT b.doc_id, b.text, b.source FROM base b
             JOIN ql USING (doc_id) JOIN rp USING (doc_id) JOIN dk USING (doc_id)
             WHERE keep_dup AND NOT low AND NOT rep
               AND b.doc_id NOT IN (SELECT doc_id FROM ch)),
    kt AS (SELECT doc_id, source AS part, text,
                  CAST(len({TOKS}) AS BIGINT) AS n_tokens FROM kept),
    kc AS (SELECT *, coalesce(sum(n_tokens) OVER (
             PARTITION BY part ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM kt)
    SELECT doc_id, part, n_tokens,
           CAST(floor(cb / 256) AS BIGINT) AS seq_id,
           CAST(cb % 256 AS BIGINT) AS seq_offset,
           CASE WHEN ('0x' || substr(md5(text), 1, 4))::BIGINT % 10 < 8 THEN 'train'
                WHEN ('0x' || substr(md5(text), 1, 4))::BIGINT % 10 < 9 THEN 'val'
                ELSE 'test' END AS split
    FROM kc""",
)
def doc_curation_pipeline(spark, sf_dir):
    """End-to-end curation composition: quality + repetition + exact-
    dup keeper + decontamination filters, then split assignment and
    sequence packing of the survivors — one lazy Catalyst DAG."""
    docs = table(spark, sf_dir, "documents")
    return curate.curation_pipeline(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    )


# ---------------------------------------------------------------------------
# deduplication (pipeline/dedup.py)


@register(
    "dedup_exact",
    """SELECT doc_id,
           CAST(count(*) OVER wd AS BIGINT) AS group_size,
           min(doc_id) OVER wd AS keeper_doc_id,
           (count(*) OVER wd) > 1 AS is_duplicate_group
    FROM documents WINDOW wd AS (PARTITION BY md5(text))""",
)
def dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(table(spark, sf_dir, "documents"))


def _mh_cols_sql(k: int = 8) -> str:
    # one-permutation slicing: component i = min over shingles of the
    # 8-hex window i%4 of md5((i//4) || ':' || shingle) — matches
    # dedup._component exactly
    return ", ".join(
        f"list_min(list_transform(dtoks, t -> substr(md5('{i // 4}:' || t), {1 + 8 * (i % 4)}, 8))) AS mh{i}"
        for i in range(k)
    )


MH_BASE = (
    f"WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents), "
    f"d AS (SELECT doc_id, {_shingle_sql('toks', 3)} AS dtoks FROM t)"
)


@register(
    "dedup_minhash_sig",
    f"{MH_BASE} SELECT doc_id, {_mh_cols_sql()} FROM d",
)
def dedup_minhash_sig(spark, sf_dir):
    return dedup.minhash_signatures(table(spark, sf_dir, "documents"))


def _mh_pairs_parts(
    k: int = 8, bands: int = 4, max_bucket: int | None = None
) -> tuple[str, str]:
    """(CTE list without WITH, final pair SELECT) — shared by the pair
    query and the recursive-CTE component oracle. ``max_bucket``
    mirrors the engine's hot-bucket guard (cap_hot_buckets): whole
    band-buckets larger than the cap are dropped with the identical
    ``count(*) OVER (PARTITION BY band, key)`` filter."""
    r = k // bands
    mh_list = ", ".join(f"mh{i}" for i in range(k))
    band_selects = []
    for b in range(bands):
        key = " || ".join(f"mh{b * r + i}" for i in range(r))
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({key}) AS key, {mh_list} FROM sig"
        )
    bands_cte = " UNION ALL ".join(band_selects)
    matches = " + ".join(f"CAST(a.mh{i} = b.mh{i} AS INT)" for i in range(k))
    cap_cte = ""
    bands_name = "bands"
    if max_bucket is not None:
        bands_name = "bands0"
        cap_cte = f""",
    bands AS (SELECT * FROM (
        SELECT *, count(*) OVER (PARTITION BY band, key) AS bsz FROM bands0)
      WHERE bsz <= {max_bucket})"""
    ctes = f"""{MH_BASE[len("WITH "):]},
    sig AS (SELECT doc_id, {_mh_cols_sql(k)} FROM d),
    {bands_name} AS ({bands_cte}){cap_cte}"""
    select = f"""SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(({matches}) / {float(k)}, 6) AS est_jaccard
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"""
    return ctes, select


def _mh_pairs_sql(k: int = 8, bands: int = 4, max_bucket: int | None = None) -> str:
    ctes, select = _mh_pairs_parts(k, bands, max_bucket)
    return f"WITH {ctes} {select}"


def _mh_groups_sql(k: int = 8, bands: int = 4) -> str:
    ctes, select = _mh_pairs_parts(k, bands)
    return f"""WITH RECURSIVE {ctes},
    pairs AS ({select}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(doc, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.doc),
    comp AS (SELECT doc, min(root) AS group_id FROM reach GROUP BY doc)
    SELECT doc AS doc_id, group_id,
           CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size
    FROM comp"""


def _mh_incremental_sql(k: int = 8, bands: int = 4, tau: float = 0.5) -> str:
    ctes, _ = _mh_pairs_parts(k, bands)
    matches = " + ".join(f"CAST(a.mh{i} = b.mh{i} AS INT)" for i in range(k))
    est = f"round(({matches}) / {float(k)}, 6)"
    return f"""WITH {ctes},
    bb AS (SELECT * FROM bands WHERE doc_id % 20 = 0),
    cb AS (SELECT * FROM bands WHERE doc_id % 20 <> 0),
    hits AS (
      SELECT DISTINCT b.doc_id FROM cb a JOIN bb b
        ON a.band = b.band AND a.key = b.key WHERE {est} >= {tau}
      UNION
      SELECT DISTINCT b.doc_id FROM bb a JOIN bb b
        ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        WHERE {est} >= {tau}
      UNION
      SELECT b.doc_id FROM documents a JOIN documents b
        ON md5(a.text) = md5(b.text)
        WHERE a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
      UNION
      SELECT b.doc_id FROM documents a JOIN documents b
        ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
        WHERE a.doc_id % 20 = 0 AND b.doc_id % 20 = 0)
    SELECT d.doc_id, d.source FROM documents d
    WHERE d.doc_id % 20 = 0
      AND d.doc_id NOT IN (SELECT doc_id FROM hits)"""


@register("dedup_incremental", _mh_incremental_sql())
def dedup_incremental(spark, sf_dir):
    """Continuous-ingest dedup: batch = every 20th doc, corpus = the
    rest; survivors are batch docs that are neither exact nor LSH
    near-dups (est_jaccard >= 0.5) of the corpus or of earlier batch
    docs. Corpus side never shuffles (broadcast batch index)."""
    docs = table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    return dedup.incremental_new_docs(corpus, batch).select("doc_id", "source")


@register("dedup_minhash_pairs", _mh_pairs_sql())
def dedup_minhash_pairs(spark, sf_dir):
    return dedup.minhash_band_pairs(table(spark, sf_dir, "documents"))


@register("dedup_minhash_pairs_capped", _mh_pairs_sql(max_bucket=2))
def dedup_minhash_pairs_capped(spark, sf_dir):
    """LSH pairs with the hot-bucket guard ACTIVE: band-buckets larger
    than the cap are dropped whole before the self-join
    (dedup.cap_hot_buckets) — the 100 TB defense against a boilerplate
    band key fanning out to B^2 candidate pairs. The cap (2) is chosen
    to TRIGGER at sf0.01 (the fixture has 4 buckets of size 3), so the
    oracle verifies the truncation semantics, not a no-op; the oracle
    reproduces the identical count-over-bucket filter."""
    return dedup.minhash_band_pairs(
        table(spark, sf_dir, "documents"), max_bucket=2
    )


def _mh_canonical_sql(k: int = 8, bands: int = 4) -> str:
    ctes, select = _mh_pairs_parts(k, bands)
    return f"""WITH RECURSIVE {ctes},
    pairs AS ({select}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(doc, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.doc),
    comp AS (SELECT doc, min(root) AS group_id FROM reach GROUP BY doc),
    j AS (SELECT c.doc AS doc_id, c.group_id, length(d.text) AS nlen
          FROM comp c JOIN documents d ON d.doc_id = c.doc),
    r AS (SELECT doc_id, group_id,
            CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size,
            row_number() OVER (PARTITION BY group_id
                               ORDER BY nlen DESC, doc_id) AS rk
          FROM j)
    SELECT doc_id, group_id, group_size, rk = 1 AS is_canonical FROM r"""


@register("dedup_canonical", _mh_canonical_sql())
def dedup_canonical(spark, sf_dir):
    """Keep-best-per-cluster: longest text (ties to lowest doc_id)
    within each MinHash-LSH connected component."""
    return dedup.canonical_docs(table(spark, sf_dir, "documents"))


@register("dedup_minhash_groups", _mh_groups_sql())
def dedup_minhash_groups(spark, sf_dir):
    """Connected components over the LSH pair graph (iterative
    min-label propagation; driver loop, nothing collected). Oracle:
    recursive-CTE transitive closure."""
    return dedup.minhash_duplicate_groups(table(spark, sf_dir, "documents"))


@register(
    "dedup_rate_by_source",
    f"""WITH groups AS ({_mh_groups_sql()})
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN g.group_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_near_dup,
           round(sum(CASE WHEN g.group_size > 1 THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS near_dup_rate
    FROM documents d JOIN groups g USING (doc_id)
    GROUP BY d.source""",
)
def dedup_rate_by_source(spark, sf_dir):
    """Data-governance metric: per source, the fraction of documents
    sitting in a near-dup cluster — the table that decides which
    supplier's crawl is redundant. Exact integer counts over the LSH
    connected components (group labels are min-doc-id, deterministic),
    so even the CC-derived rate hash-matches the recursive-CTE
    oracle."""
    docs = table(spark, sf_dir, "documents")
    groups = dedup.minhash_duplicate_groups(docs)
    n = F.count(F.lit(1)).cast("long")
    nd = F.sum((F.col("group_size") > 1).cast("int")).cast("long")
    return (
        docs.select("doc_id", "source")
        .join(groups, "doc_id")
        .groupBy("source")
        .agg(
            n.alias("n_docs"),
            nd.alias("n_near_dup"),
            F.round(nd / n, 6).alias("near_dup_rate"),
        )
    )


def _simhash_sql(toks: str = "toks") -> str:
    terms = []
    for b in range(32):
        terms.append(
            f"(CASE WHEN 2 * len(list_filter({toks}, t -> substr(md5(t), {b + 1}, 1) IN {HIGH_HEX})) >= len({toks}) THEN {1 << b} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "dedup_simhash",
    f"""WITH t AS (SELECT doc_id, {TOKS} AS toks0 FROM documents),
    d AS (SELECT doc_id, {_shingle_sql('toks0', 3)} AS toks FROM t)
    SELECT doc_id, {_simhash_sql()} AS simhash FROM d""",
)
def dedup_simhash(spark, sf_dir):
    """32-bit SimHash over 3-gram shingles (phrase features, not
    unigrams — see simhash_fingerprints for the bias measurement)."""
    return dedup.simhash_fingerprints(table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_pairs",
    f"""WITH t AS (SELECT doc_id, {TOKS} AS toks0 FROM documents),
    d AS (SELECT doc_id, {_shingle_sql('toks0', 3)} AS toks FROM t),
    sig AS (SELECT doc_id, {_simhash_sql()} AS simhash FROM d),
    c AS (SELECT doc_id, simhash,
                 (simhash // 1) % 256 AS chunk0,
                 (simhash // 256) % 256 AS chunk1,
                 (simhash // 65536) % 256 AS chunk2,
                 (simhash // 16777216) % 256 AS chunk3
          FROM sig)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM c a JOIN c b
      ON (a.chunk0 = b.chunk0 OR a.chunk1 = b.chunk1
          OR a.chunk2 = b.chunk2 OR a.chunk3 = b.chunk3) AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
)
def dedup_simhash_pairs(spark, sf_dir):
    """Pigeonhole chunk join over 32-bit SimHash: 4 chunks cover the
    hamming<=3 radius with FULL recall (a pair differing in <=3 bits
    must agree exactly on one of the 4 chunks)."""
    return dedup.simhash_near_pairs(table(spark, sf_dir, "documents"))


_SH_CHUNK_EXPLODE = """ck AS (
      SELECT doc_id, simhash, 0 AS c, (simhash // 1) % 256 AS v FROM sig
      UNION ALL
      SELECT doc_id, simhash, 1, (simhash // 256) % 256 FROM sig
      UNION ALL
      SELECT doc_id, simhash, 2, (simhash // 65536) % 256 FROM sig
      UNION ALL
      SELECT doc_id, simhash, 3, (simhash // 16777216) % 256 FROM sig)"""


@register(
    "dedup_simhash_pairs_capped",
    f"""WITH t AS (SELECT doc_id, {TOKS} AS toks0 FROM documents),
    d AS (SELECT doc_id, {_shingle_sql('toks0', 3)} AS toks FROM t),
    sig AS (SELECT doc_id, {_simhash_sql()} AS simhash FROM d),
    {_SH_CHUNK_EXPLODE},
    kept AS (SELECT * FROM (
        SELECT *, count(*) OVER (PARTITION BY c, v) AS bsz FROM ck)
      WHERE bsz <= 4)
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM kept a JOIN kept b
      ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
)
def dedup_simhash_pairs_capped(spark, sf_dir):
    """SimHash pigeonhole pairs with the hot-bucket guard ACTIVE:
    chunk-buckets larger than the cap are dropped whole before the
    self-join (dedup.cap_hot_buckets) — with 256-way 8-bit chunks,
    short boilerplate docs sharing a chunk value are the quadratic
    residual at corpus scale. The cap (4) TRIGGERS at sf0.01 (the
    fixture has 51 buckets of size 5-8), so the oracle verifies the
    truncation semantics against the identical exploded-chunk
    count-over-bucket filter, not a no-op."""
    return dedup.simhash_near_pairs(
        table(spark, sf_dir, "documents"), max_bucket=4
    )


@register(
    "dedup_simhash_groups",
    f"""WITH RECURSIVE t AS (SELECT doc_id, {TOKS} AS toks0 FROM documents),
    d AS (SELECT doc_id, {_shingle_sql('toks0', 3)} AS toks FROM t),
    sig AS (SELECT doc_id, {_simhash_sql()} AS simhash FROM d),
    c AS (SELECT doc_id, simhash,
                 (simhash // 1) % 256 AS chunk0,
                 (simhash // 256) % 256 AS chunk1,
                 (simhash // 65536) % 256 AS chunk2,
                 (simhash // 16777216) % 256 AS chunk3
          FROM sig),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM c a JOIN c b
        ON (a.chunk0 = b.chunk0 OR a.chunk1 = b.chunk1
            OR a.chunk2 = b.chunk2 OR a.chunk3 = b.chunk3)
       AND a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(doc, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.doc),
    comp AS (SELECT doc, min(root) AS group_id FROM reach GROUP BY doc)
    SELECT doc AS doc_id, group_id,
           CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size
    FROM comp""",
)
def dedup_simhash_groups(spark, sf_dir):
    """Connected components over the SimHash pigeonhole pair graph —
    the second LSH family gets the same shared CC engine (min-label
    propagation over edges only) the MinHash path uses; min-doc-id
    labels are deterministic, so the whole clustering hash-matches the
    recursive-CTE oracle."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.simhash_near_pairs(docs).select("doc_a", "doc_b")
    return dedup.pair_graph_groups(pairs, "doc_a", "doc_b", docs, "doc_id")


@register(
    "dedup_jaccard_topk",
    f"""WITH t AS (SELECT doc_id, source AS blk, {TOKS} AS toks0 FROM documents),
    d AS (SELECT doc_id, blk, {_shingle_sql('toks0', 2)} AS toks FROM t),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_filter(a.toks, t -> list_contains(b.toks, t))) AS inter,
             len(a.toks) + len(b.toks) AS tot
          FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / (tot - inter), 6) AS jaccard
    FROM p ORDER BY jaccard DESC, doc_a, doc_b LIMIT 20""",
)
def dedup_jaccard_topk(spark, sf_dir):
    return dedup.jaccard_pairs(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# embedding similarity (pipeline/similarity.py)

EMB_D = "list_transform(embedding, x -> CAST(x AS DOUBLE))"


@register(
    "emb_cosine_topk",
    f"""WITH q AS (SELECT {EMB_D} AS qe FROM embeddings WHERE vec_id = 0),
    s AS (SELECT vec_id, {EMB_D} AS ve FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id,
           round(list_dot_product(ve, qe) / (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(qe, qe))), 6) AS cos_sim
    FROM s, q ORDER BY cos_sim DESC, vec_id LIMIT 10""",
)
def emb_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(table(spark, sf_dir, "embeddings"))


@register(
    "emb_knn_join",
    f"""WITH q AS (SELECT vec_id AS query_id, {EMB_D} AS qe FROM embeddings WHERE vec_id < 5),
    s AS (SELECT vec_id, {EMB_D} AS ve FROM embeddings),
    scored AS (
      SELECT q.query_id, s.vec_id AS neighbor_id,
             round(list_dot_product(ve, qe) / (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(qe, qe))), 6) AS cos_sim
      FROM s, q WHERE s.vec_id <> q.query_id),
    ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS INT) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= 3""",
)
def emb_knn_join(spark, sf_dir):
    return similarity.knn_join(table(spark, sf_dir, "embeddings"))


@register(
    "emb_knn_label_accuracy",
    f"""WITH q AS (SELECT vec_id AS query_id, label AS own_label, {EMB_D} AS qe
                   FROM embeddings WHERE vec_id < 50),
    s AS (SELECT vec_id, label, {EMB_D} AS ve FROM embeddings),
    scored AS (
      SELECT q.query_id, q.own_label, s.vec_id, s.label,
             round(list_dot_product(ve, qe) / (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(qe, qe))), 6) AS cos_sim
      FROM s, q WHERE s.vec_id <> q.query_id),
    ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rk
      FROM scored),
    top3 AS (SELECT query_id, own_label,
             max(CASE WHEN rk = 1 THEN label END) AS l1,
             max(CASE WHEN rk = 2 THEN label END) AS l2,
             max(CASE WHEN rk = 3 THEN label END) AS l3
      FROM ranked WHERE rk <= 3 GROUP BY query_id, own_label)
    SELECT query_id, own_label,
           CAST(CASE WHEN l1 = l2 OR l1 = l3 THEN l1
                     WHEN l2 = l3 THEN l2 ELSE l1 END AS INT) AS predicted_label,
           (CASE WHEN l1 = l2 OR l1 = l3 THEN l1
                 WHEN l2 = l3 THEN l2 ELSE l1 END) = own_label AS correct
    FROM top3""",
)
def emb_knn_label_accuracy(spark, sf_dir):
    """kNN label classification (k=3, majority vote, nearest wins
    ties): the end-to-end evaluation of similarity search — broadcast
    query side, one scored shuffle per query partition, conditional
    aggregation for the vote."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("own_label"),
        F.col("embedding").alias("__q"),
    )
    from .pipeline.similarity import cosine

    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "own_label",
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("__q")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    ranked = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 3)
    top3 = ranked.groupBy("query_id", "own_label").agg(
        *[
            F.max(F.when(F.col("rk") == i, F.col("label"))).alias(f"l{i}")
            for i in (1, 2, 3)
        ]
    )
    l1, l2, l3 = F.col("l1"), F.col("l2"), F.col("l3")
    pred = (
        F.when((l1 == l2) | (l1 == l3), l1).when(l2 == l3, l2).otherwise(l1)
    )
    return top3.select(
        "query_id",
        "own_label",
        pred.cast("int").alias("predicted_label"),
        (pred == F.col("own_label")).alias("correct"),
    )


def _bucket_sql(vec: str = "embedding") -> str:
    terms = [
        f"(CASE WHEN {vec}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(8)
    ]
    return "CAST(" + " + ".join(terms) + " AS INT)"


@register(
    "emb_quantize",
    f"""WITH b AS (SELECT vec_id, {EMB_D} AS x FROM embeddings),
    s AS (SELECT vec_id, x, list_min(x) AS mn, list_max(x) AS mx FROM b),
    q AS (SELECT vec_id, x, mn, (mx - mn) / 255.0 AS sc FROM s),
    c AS (SELECT vec_id, x, mn, sc,
            CASE WHEN sc > 0
                 THEN list_transform(x, v -> CAST(floor((v - mn) / sc + 0.5) AS INT))
                 ELSE list_transform(x, v -> 0) END AS codes FROM q),
    d AS (SELECT vec_id, x, mn, sc, codes,
            list_transform(codes, cc -> mn + cc * sc) AS deq FROM c)
    SELECT vec_id,
           array_to_string(list_transform(codes, cc -> CAST(cc AS VARCHAR)), ',') AS codes,
           round(mn, 6) AS q_min, round(sc, 9) AS q_scale,
           round(list_sum(list_transform(range(1, len(x) + 1),
                 i -> (x[i] - deq[i]) * (x[i] - deq[i]))) / len(x), 9) AS mse
    FROM d""",
)
def emb_quantize(spark, sf_dir):
    """Per-vector int8-range scalar quantization with in-line
    reconstruction MSE — pure array-HOF column algebra, explicit
    floor(+0.5) rounding so both engines derive identical codes.
    Codes serialize to a CSV string for the driver's scalar-column
    value hash."""
    out = similarity.quantize_embeddings(table(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id",
        F.array_join(F.transform("codes", lambda c: c.cast("string")), ",").alias(
            "codes"
        ),
        "q_min",
        "q_scale",
        "mse",
    )


@register(
    "emb_lsh_buckets",
    f"""SELECT {_bucket_sql()} AS bucket, CAST(count(*) AS BIGINT) AS n_vectors
    FROM embeddings GROUP BY 1""",
)
def emb_lsh_buckets(spark, sf_dir):
    return similarity.lsh_bucket_histogram(table(spark, sf_dir, "embeddings"))


@register(
    "emb_lsh_near_pairs",
    f"""WITH b AS (SELECT vec_id, {EMB_D} AS ve, {_bucket_sql()} AS bucket FROM embeddings)
    SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
           round(list_dot_product(a.ve, b2.ve) / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b2.ve, b2.ve))), 6) AS cos_sim
    FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
    WHERE round(list_dot_product(a.ve, b2.ve) / (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b2.ve, b2.ve))), 6) >= 0.3""",
)
def emb_lsh_near_pairs(spark, sf_dir):
    """τ=0.3 here (not the 0.9 production default): the synthetic
    embeddings' in-bucket cosine tops out ≈0.43 at sf0.01, so 0.9
    hash-matched an empty set — vacuously green. 0.3 keeps the driver
    check exercising real pairing + cosine logic (~17 rows)."""
    return similarity.lsh_near_pairs(table(spark, sf_dir, "embeddings"), min_cosine=0.3)


_EMB_COS = (
    "round(list_dot_product(a.ve, b2.ve)"
    " / (sqrt(list_dot_product(a.ve, a.ve))"
    " * sqrt(list_dot_product(b2.ve, b2.ve))), 6)"
)


@register(
    "dedup_embedding_groups",
    f"""WITH RECURSIVE b AS (
      SELECT vec_id, {EMB_D} AS ve, {_bucket_sql()} AS bucket FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
      WHERE {_EMB_COS} >= 0.3),
    edges AS (SELECT vec_a AS a, vec_b AS b FROM pairs
              UNION SELECT vec_b, vec_a FROM pairs),
    reach(vec, root) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.vec),
    comp AS (SELECT vec, min(root) AS group_id FROM reach GROUP BY vec)
    SELECT vec AS vec_id, group_id,
           CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size
    FROM comp""",
)
def dedup_embedding_groups(spark, sf_dir):
    """Embedding-cosine near-dup groups (semantic dedup): LSH-bucketed
    cosine pairs -> shared min-label-propagation CC engine. Oracle:
    recursive-CTE transitive closure over the same pair graph.
    τ=0.3 (not the 0.9 production default) so the synthetic fixture
    yields a non-empty pair graph — see emb_lsh_near_pairs."""
    return similarity.embedding_duplicate_groups(
        table(spark, sf_dir, "embeddings"), min_cosine=0.3
    )


@register(
    "ts_zscore",
    f"""{E_CTE}, c AS (SELECT event_id, user_id, CAST(round(v * 100) AS BIGINT) AS vc FROM e),
    s AS (SELECT event_id, vc,
            sum(vc) OVER ({P}) AS sv,
            sum(vc * vc) OVER ({P}) AS svv,
            count(vc) OVER ({P}) AS n
          FROM c)
    SELECT event_id,
           coalesce(
             CAST((vc * n - sv) AS DOUBLE) * (vc * n - sv)
               > 9.0 * CAST(n AS DOUBLE) * (svv * n - sv * sv) / (n - 1),
             FALSE) AS is_anomaly
    FROM s""",
)
def ts_zscore(spark, sf_dir):
    """Per-series z-score detector, |v - mean| > 3 std, computed
    ENTIRELY in exact integer cents: the test (v-mean)^2 > 9*var is
    cross-multiplied by n^2 so mean and variance never become
    intermediate floats — sums of cents and squared cents are exact
    BIGINTs in any engine, making even the variance comparison
    bit-deterministic (the one float product is a single rounding on
    both sides of identical integers). Overflow bound: svv*n fits a
    BIGINT up to ~1e5 rows/series at 4e4-cent values; beyond that
    switch the products to double (losing bit-parity, keeping
    correctness)."""
    tsf = events_tsf(spark, sf_dir)
    vc = F.round(tsf.value * 100).cast("long")
    df = tsf.df.withColumn("__vc", vc)
    w = tsf.with_df(df).w_all()
    sv = F.sum("__vc").over(w)
    svv = F.sum(F.col("__vc") * F.col("__vc")).over(w)
    n = F.count("__vc").over(w)
    dev = F.col("__vc") * n - sv
    lhs = dev.cast("double") * dev
    rhs = 9.0 * n.cast("double") * (svv * n - sv * sv) / (n - 1)
    return df.select("event_id", as_pred(lhs > rhs).alias("is_anomaly"))


@register(
    "anomaly_daily_summary",
    f"""{E_CTE}, x AS (SELECT * FROM e),
    cv AS (WITH {_const_sql('v', 5.0)}),
    flags AS (
      SELECT e.event_id, e.ts,
             (coalesce(e.v < 1.0 OR e.v > 300.0, FALSE)
              OR coalesce(abs(e.v - lag(e.v) OVER ({W})) > 80.0, FALSE)
              OR cv.is_anomaly) AS is_anomaly
      FROM e JOIN cv USING (event_id))
    SELECT CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN is_anomaly THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
           round(sum(CASE WHEN is_anomaly THEN 1 ELSE 0 END) / count(*), 6) AS anomaly_rate
    FROM flags GROUP BY 1 ORDER BY 1""",
)
def anomaly_daily_summary(spark, sf_dir):
    """Detector -> rollup composition: the combined detector's flags
    aggregated to a daily anomaly-rate report — one fused plan, the
    aggregation rides the detector's output without re-scanning."""
    det = CombinedDetector(
        [RangeDetector(1.0, 300.0), DiffDetector(80.0), ConstantValueDetector(3, 5.0)]
    )
    out = det.detect(events_tsf(spark, sf_dir))
    flag = F.when(F.col("is_anomaly"), 1).otherwise(0)
    return (
        out.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(flag).alias("n_anomalies"),
            F.round(F.sum(flag) / F.count(F.lit(1)), 6).alias("anomaly_rate"),
        )
        .orderBy("day")
    )


@register(
    "ts_range_quantile_approx",
    f"""{E_CTE}
    SELECT user_id,
           round(quantile_cont(v, 0.02), 6) AS lo_exact,
           round(quantile_cont(v, 0.98), 6) AS hi_exact,
           TRUE AS approx_within_tol
    FROM e GROUP BY user_id ORDER BY user_id""",
)
def ts_range_quantile_approx(spark, sf_dir):
    """The 100 TB variant of ts_range_quantile's fit: per-series
    approx_percentile in a grouped aggregate (t-digest sketch, one
    pass, mergeable map-side) — versus the exact percentile that must
    materialize every series. The sketch value itself is
    engine-specific, so the query emits an oracle-checkable
    certificate instead: the exact bounds plus a boolean asserting the
    sketch landed within 5% of the per-series spread (production runs
    only the sketch aggregate; the exact column is the verification
    harness)."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.isnan("value"), F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    agg = e.groupBy("user_id").agg(
        F.percentile("v", F.lit(0.02)).alias("__lo"),
        F.percentile("v", F.lit(0.98)).alias("__hi"),
        F.percentile_approx("v", F.array(F.lit(0.02), F.lit(0.98)), 10000).alias("__a"),
    )
    # The sketch's contract is RANK accuracy (±1/accuracy of the target
    # rank), not value accuracy — so the certificate checks the empirical
    # CDF at the returned bound: |frac(v <= bound) - p| <= 2/n + 1e-3
    # (the 2/n term absorbs ECDF discreteness on short series).
    scored = e.join(F.broadcast(agg), "user_id").groupBy("user_id").agg(
        F.first("__lo").alias("__lo"),
        F.first("__hi").alias("__hi"),
        F.avg((F.col("v") <= F.element_at("__a", 1)).cast("double")).alias("__flo"),
        F.avg((F.col("v") <= F.element_at("__a", 2)).cast("double")).alias("__fhi"),
        F.count("v").alias("__n"),
    )
    tol = F.lit(2.0) / F.col("__n") + F.lit(1e-3)
    return scored.select(
        "user_id",
        F.round("__lo", 6).alias("lo_exact"),
        F.round("__hi", 6).alias("hi_exact"),
        (
            (F.abs(F.col("__flo") - F.lit(0.02)) <= tol)
            & (F.abs(F.col("__fhi") - F.lit(0.98)) <= tol)
        ).alias("approx_within_tol"),
    ).orderBy("user_id")


# MLlib learned detectors — the reference's "advanced detectors"
# vision (README.md:43). The two residual detectors register their
# T=1 variants, whose normal-equation fits have a closed-form 2x2
# solution a SQL oracle CAN reproduce (per-series ridge analytically;
# the global fit with reg=0 is exact OLS) — the boolean output makes
# last-ulp solver differences invisible except exactly at the 4-sigma
# boundary. The richer T=5 fits stay pytest-verified
# (tests/test_pipeline.py / test_golden_detectors.py); seeded KMeans
# remains the one genuinely SQL-irreproducible case (rows-only).

# closed-form 2x2 ridge y ~ coef*x + icpt with penalty LAM on both
# diagonal entries of A'A (A = [x, 1]), matching numpy's
# solve(A'A + LAM*I, A'y); training rows need x AND y non-null,
# detect rows need only x (create_dataset keeps rows whose single
# trailing lag exists), and series with <3 training rows get no model
# (flag False) per the solve()'s underdetermined guard.
def _RIDGE1_SQL(lam: str, part: str) -> str:
    return f"""{E_CTE},
    f AS (SELECT event_id, user_id, v AS y, lag(v) OVER ({W}) AS x FROM e),
    d AS (SELECT * FROM f WHERE x IS NOT NULL),
    tr AS (SELECT {part} count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                  sum(x*x) AS sxx, sum(x*y) AS sxy
           FROM d WHERE y IS NOT NULL {('GROUP BY user_id' if part else '')}),
    m AS (SELECT {('user_id,' if part else '')} n,
                 ((n + {lam})*sxy - sx*sy)
                   / ((sxx + {lam})*(n + {lam}) - sx*sx) AS coef,
                 ((sxx + {lam})*sy - sx*sxy)
                   / ((sxx + {lam})*(n + {lam}) - sx*sx) AS icpt
          FROM tr),
    r AS (SELECT d.user_id, d.event_id, d.x, d.y, m.coef, m.icpt, m.n
          FROM d {('JOIN m USING (user_id)' if part else 'CROSS JOIN m')}),
    th AS (SELECT {part} 4.0 * stddev_samp(y - (coef*x + icpt)) AS thr
           FROM r WHERE y IS NOT NULL {('GROUP BY user_id' if part else '')})
    SELECT r.event_id,
           coalesce(CASE WHEN r.n >= 3
                         THEN abs(r.y - (r.coef*r.x + r.icpt)) > th.thr
                         ELSE FALSE END, FALSE) AS is_anomaly
    FROM r {('LEFT JOIN th USING (user_id)' if part else 'CROSS JOIN th')}"""


@register("ts_mllib_residual_per_series", _RIDGE1_SQL("1e-6", "user_id,"))
def ts_mllib_residual_per_series(spark, sf_dir):
    """One small ridge model PER SERIES (numpy normal-equation solves
    inside applyInPandas — a million series = a million TxT solves
    spread across executors), scored via broadcast coef arrays. T=1
    registered so the DuckDB oracle can solve the 2x2 normal equations
    analytically; T=5 shape pytest-verified."""
    from .detectors.mllib import RegressionResidualDetector

    tsf = events_tsf(spark, sf_dir)
    det = RegressionResidualDetector(
        time_steps=1, n_sigmas=4.0, per_series=True
    ).fit(tsf)
    return det.detect(tsf).select("event_id", "is_anomaly")


@register("ts_mllib_residual", _RIDGE1_SQL("0.0", ""))
def ts_mllib_residual(spark, sf_dir):
    """Global linear value~lag model (MLlib solver='normal', reg=0 =>
    exact OLS, reproducible by the closed-form oracle); flag
    |residual| > n_sigmas * train std. T=5 shape pytest-verified."""
    from .detectors.mllib import RegressionResidualDetector

    tsf = events_tsf(spark, sf_dir)
    det = RegressionResidualDetector(time_steps=1, n_sigmas=4.0, reg=0.0).fit(tsf)
    return det.detect(tsf).select("event_id", "is_anomaly")


@register(
    "ts_mllib_kmeans",
    f"""{E_CTE},
    f AS (SELECT count(v) OVER ({W}
            ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING) AS c FROM e)
    SELECT CAST(count(*) AS BIGINT) AS n_windows, TRUE AS anomaly_frac_ok
    FROM f WHERE c = 8""",
)
def ts_mllib_kmeans(spark, sf_dir):
    """Lag-window shape novelty (distance to nearest seeded-KMeans
    centroid above the fitted 0.99-quantile threshold), emitted in the
    CERTIFICATE shape that makes the one genuinely SQL-irreproducible
    detector hash-checkable: ``n_windows`` (rows with a complete
    8-lag window — exact, the oracle reproduces it with a window
    count) plus ``anomaly_frac_ok`` certifying the flagged fraction
    sits in [0.005, 0.015] — the 0.99-quantile threshold pins it at
    ~0.01 by construction (measured exactly 0.01 across all three
    fixtures). Per-row flags stay available via
    detectors.mllib.KMeansDistanceDetector (pytest-verified)."""
    from .detectors.mllib import KMeansDistanceDetector

    tsf = events_tsf(spark, sf_dir)
    det = KMeansDistanceDetector(time_steps=8, k=8, quantile=0.99).fit(tsf)
    frac = F.avg(F.col("is_anomaly").cast("double"))
    return det.detect(tsf).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        ((frac >= 0.005) & (frac <= 0.015)).alias("anomaly_frac_ok"),
    )


# IVF/PQ ANN — the seeded-quantizer outputs themselves are not
# SQL-reproducible, so each query ships the CERTIFICATE shape (the
# same scheme as the approx sketches): the output rows are the exact
# brute-force top-k — fully SQL-reproducible — plus an in-plan
# ``recall_ok`` boolean asserting the ANN path recovered at least
# ceil(min_recall*k) of them. The oracle reproduces exact-top-k +
# literal TRUE, making the whole result hash-checkable. Raw ANN
# outputs stay available via pipeline.similarity and are recall-
# quantified in tests/test_pipeline.py.

_EXACT_TOPK_CERT = f"""WITH q AS (SELECT {{EMB_D}} AS qe FROM embeddings WHERE vec_id = 0),
    s AS (SELECT vec_id, {{EMB_D}} AS ve FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id,
           round(list_dot_product(ve, qe) / (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(qe, qe))), 6) AS cos_sim,
           TRUE AS recall_ok
    FROM s, q ORDER BY cos_sim DESC, vec_id LIMIT 10""".replace("{EMB_D}", EMB_D)


@register("emb_ivf_topk", _EXACT_TOPK_CERT)
def emb_ivf_topk(spark, sf_dir):
    """IVF probe (6/16 cells, seeded KMeans router) certified against
    the exact brute-force top-10: measured recall@10 in [0.7, 1.0]
    across the sf0.001/0.01/0.1 fixtures, certificate threshold 0.4."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.recall_certificate(
        emb, similarity.ivf_topk(emb, n_probe=6), min_recall=0.4
    )


@register(
    "emb_ivf_cells",
    """SELECT CAST(count(*) AS BIGINT) AS n_vectors_total,
           TRUE AS all_cells_nonempty,
           TRUE AS max_cell_share_ok
    FROM embeddings""",
)
def emb_ivf_cells(spark, sf_dir):
    """IVF index-balance certificate: total vector count is exact and
    SQL-checkable; the booleans certify every one of the 16 cells is
    non-empty and no cell holds >50% of the corpus (measured max share
    0.134 at sf0.01) — the invariants that make probe work balanced.
    The raw per-cell histogram stays available via
    similarity.ivf_cell_histogram."""
    hist = similarity.ivf_cell_histogram(table(spark, sf_dir, "embeddings"))
    return hist.agg(
        F.sum("n_vectors").cast("bigint").alias("n_vectors_total"),
        (
            (F.count(F.lit(1)) == 16) & (F.min("n_vectors") > 0)
        ).alias("all_cells_nonempty"),
        (F.max("n_vectors") * 2 < F.sum("n_vectors")).alias(
            "max_cell_share_ok"
        ),
    )


@register("emb_ivfpq_topk", _EXACT_TOPK_CERT)
def emb_ivfpq_topk(spark, sf_dir):
    """IVF+PQ composition (coarse cells route the probe, probed cells
    scan m-byte ADC codes, floats only at the exact re-rank) certified
    against exact top-10: measured recall@10 in [0.5, 0.9] across the
    fixtures at n_probe=6, threshold 0.3."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.recall_certificate(
        emb, similarity.ivfpq_topk(emb, n_probe=6), min_recall=0.3
    )


@register("emb_pq_topk", _EXACT_TOPK_CERT)
def emb_pq_topk(spark, sf_dir):
    """PQ ADC top-k (m-byte codes scanned, floats only at refine)
    certified against exact top-10: measured recall@10 in [0.6, 0.8]
    across the fixtures, threshold 0.4."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.recall_certificate(
        emb, similarity.pq_topk(emb), min_recall=0.4
    )


# ---------------------------------------------------------------------------
# multimodal plumbing (pipeline/multimodal.py). The decode kernel runs
# through the real mapInPandas/Arrow path; because the stub derives its
# pseudo-metadata from md5(payload), a full SQL oracle can replay it —
# so even the Python-UDF plumbing is value-checked, not just row-counted.

MM_DECODE_SQL = """WITH a AS (SELECT doc_id AS asset_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       md5(text) AS h, octet_length(encode(text)) AS n_bytes FROM documents),
    d AS (SELECT asset_id, kind, CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(16 + ('0x' || substr(h, 1, 2))::INT % 240 AS INT) AS width,
       CAST(16 + ('0x' || substr(h, 3, 2))::INT % 240 AS INT) AS height,
       CAST(CASE WHEN kind = 'image' THEN 1 ELSE 1 + ('0x' || substr(h, 5, 2))::INT % 100 END AS INT) AS n_frames,
       CAST(('0x' || substr(h, 7, 2))::INT AS INT) AS mean_brightness
       FROM a)"""


@register("mm_decode", f"{MM_DECODE_SQL} SELECT * FROM d")
def mm_decode(spark, sf_dir):
    assets = multimodal.fake_assets_from_documents(table(spark, sf_dir, "documents"))
    return multimodal.decode_assets(assets)


@register(
    "mm_resize",
    f"""{MM_DECODE_SQL}
    SELECT asset_id, width, height,
           CAST(ceil(width * least(1.0, 64 / CAST(greatest(width, height) AS DOUBLE))) AS INT) AS target_width,
           CAST(ceil(height * least(1.0, 64 / CAST(greatest(width, height) AS DOUBLE))) AS INT) AS target_height
    FROM d""",
)
def mm_resize(spark, sf_dir):
    assets = multimodal.fake_assets_from_documents(table(spark, sf_dir, "documents"))
    out = multimodal.resize_images(multimodal.decode_assets(assets))
    return out.select("asset_id", "width", "height", "target_width", "target_height")


@register(
    "mm_frames",
    f"""{MM_DECODE_SQL}
    SELECT asset_id, CAST(unnest(generate_series(0, greatest(n_frames - 1, 0), 10)) AS BIGINT) AS frame_idx
    FROM d WHERE kind = 'video'""",
)
def mm_frames(spark, sf_dir):
    assets = multimodal.fake_assets_from_documents(table(spark, sf_dir, "documents"))
    out = multimodal.sample_frames(multimodal.decode_assets(assets))
    return out.select("asset_id", F.col("frame_idx").cast("long").alias("frame_idx"))


@register(
    "mm_resize_pixels",
    """WITH a AS (SELECT doc_id AS asset_id,
        CASE doc_id % 3 WHEN 0 THEN 4 + doc_id % 13 ELSE 5 + doc_id % 9 END AS w,
        CASE doc_id % 3 WHEN 0 THEN 3 + doc_id % 11 ELSE 2 + doc_id % 7 END AS h,
        CASE doc_id % 3 WHEN 0 THEN doc_id % 256 ELSE (7 * doc_id) % 256 END AS v
      FROM documents WHERE doc_id % 3 IN (0, 1)),
    s AS (SELECT asset_id, w, h, v,
                 least(1.0, 8.0 / greatest(w, h)) AS sc FROM a)
    SELECT asset_id, 'image' AS kind,
           CAST(ceil(w * sc) AS INT) AS width,
           CAST(ceil(h * sc) AS INT) AS height,
           CAST(1 AS INT) AS n_frames,
           CAST(v AS INT) AS mean_brightness
    FROM s""",
)
def mm_resize_pixels(spark, sf_dir):
    """REAL pixel thumbnailing end-to-end: decode BMP/PPM pixels,
    nearest-neighbor resample to max side 8, re-encode as P6, then
    RE-DECODE the produced bytes with the stdlib codec. The oracle
    predicts the resized dimensions arithmetically and the brightness
    invariance (constant-gray sources) — value parity through two real
    byte-level codec passes and an actual pixel transform."""
    assets = multimodal.synthetic_assets(table(spark, sf_dir, "documents"))
    resized = multimodal.resize_images_pixels(assets, max_side=8)
    return multimodal.decode_assets(resized, decode_stub=False).select(
        "asset_id", "kind", "width", "height", "n_frames", "mean_brightness"
    )


@register(
    "mm_audio_energy",
    """WITH a AS (SELECT doc_id AS asset_id, 50 + doc_id % 100 AS n,
                        doc_id % 128 AS amp8
           FROM documents WHERE doc_id % 3 = 2),
    w AS (SELECT asset_id, CAST(u.w AS INT) AS win_id, n, amp8
          FROM a, unnest(range(0, CAST(ceil(n / 25.0) AS BIGINT))) AS u(w))
    SELECT asset_id, win_id,
           CAST(CASE WHEN (win_id + 1) * 25 <= n THEN 25
                     ELSE n - win_id * 25 END AS INT) AS n_samples,
           CAST(amp8 AS INT) AS rms_q
    FROM w""",
)
def mm_audio_energy(spark, sf_dir):
    """Windowed RMS energy over REAL PCM WAV payloads (stdlib decode in
    Arrow mapInPandas). The synthetic WAVs hold constant amplitude
    256*(id%128) over 50+id%100 samples, so the oracle predicts every
    window's quantized RMS arithmetically — full value parity through
    actual byte-level DSP."""
    assets = multimodal.synthetic_assets(table(spark, sf_dir, "documents"))
    return multimodal.audio_energy_windows(assets)




@register(
    "mm_real_decode",
    """WITH ids AS (SELECT doc_id AS asset_id FROM documents),
    d AS (
      SELECT asset_id,
        CASE WHEN asset_id % 3 IN (0, 1) THEN 'image' ELSE 'audio' END AS kind,
        CASE asset_id % 3
          WHEN 0 THEN 4 + asset_id % 13
          WHEN 1 THEN 5 + asset_id % 9
          ELSE 1 END AS width,
        CASE asset_id % 3
          WHEN 0 THEN 3 + asset_id % 11
          WHEN 1 THEN 2 + asset_id % 7
          ELSE 16 END AS height,
        CASE asset_id % 3 WHEN 2 THEN 50 + asset_id % 100 ELSE 1 END AS n_frames,
        CASE asset_id % 3
          WHEN 0 THEN asset_id % 256
          WHEN 1 THEN (7 * asset_id) % 256
          ELSE asset_id % 128 END AS mean_brightness
      FROM ids)
    SELECT asset_id, kind,
      CAST(CASE asset_id % 3
        WHEN 0 THEN 54 + ((3 * width + 3) // 4 * 4) * height
        WHEN 1 THEN 3 + length(CAST(width AS VARCHAR)) + 1
                     + length(CAST(height AS VARCHAR)) + 5 + 3 * width * height
        ELSE 44 + 2 * n_frames END AS BIGINT) AS n_bytes,
      CAST(width AS INT) AS width, CAST(height AS INT) AS height,
      CAST(n_frames AS INT) AS n_frames,
      CAST(mean_brightness AS INT) AS mean_brightness
    FROM d""",
)
def mm_real_decode(spark, sf_dir):
    """REAL decode end-to-end: generate valid BMP/PPM/WAV payloads per
    doc_id, parse them with the actual stdlib codecs inside Arrow
    mapInPandas, and let the oracle predict every metadata field
    arithmetically — full value parity through real byte-level
    decoding, not a stub."""
    ids = table(spark, sf_dir, "documents")
    assets = multimodal.synthetic_assets(ids)
    return multimodal.decode_assets(assets, decode_stub=False)


# ---------------------------------------------------------------------------
# driver entry points


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined anomaly sweep over the events stream — the engine's
    flagship: one fused plan, five detectors, one shuffle."""
    det = CombinedDetector(
        [
            RangeDetector(1.0, 300.0),
            DiffDetector(80.0),
            GradientDetector(0.005),
            ConstantValueDetector(3, 5.0),
            HampelDetector(5, 3),
        ]
    )
    return det.detect(events_tsf(spark, sf_dir))


# ---------------------------------------------------------------------------
# Remaining TPC-H shapes (Q7-Q16 family; adapted where the testdata has
# no partsupp/commitdate/shipmode columns — see each docstring)

REV_C = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


@register(
    "tpch_q7",
    f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           sum({REV_C}) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
)
def tpch_q7(spark, sf_dir):
    return tpch.q7_volume_shipping(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"),
    )


@register(
    "tpch_q8",
    f"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN n_name = 'NATION_5' THEN {REV_C} ELSE 0 END)
                 * 1.0 / sum({REV_C}), 6) AS mkt_share,
           sum({REV_C}) / 10000.0 AS total_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
      AND o_custkey IN (
        SELECT c_custkey FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA')
    GROUP BY 1 ORDER BY 1""",
)
def tpch_q8(spark, sf_dir):
    return tpch.q8_market_share(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"),
        part=table(spark, sf_dir, "part"),
    )


@register(
    "tpch_q9",
    f"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           sum({REV_C}) / 10000.0 AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2 ORDER BY 1, 2 DESC""",
)
def tpch_q9(spark, sf_dir):
    return tpch.q9_product_margin(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "part"),
    )


@register(
    "tpch_q10",
    f"""SELECT c_custkey, c_name, c_acctbal, n_name,
           sum({REV_C}) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY 1, 2, 3, 4 ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def tpch_q10(spark, sf_dir):
    return tpch.q10_returned_items(
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "nation"),
    )


@register(
    "tpch_q12",
    """SELECT o_orderpriority,
           CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_count,
           CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                         THEN 0 ELSE 1 END) AS BIGINT) AS ontime_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY 1""",
)
def tpch_q12(spark, sf_dir):
    return tpch.q12_ship_latency(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "orders")
    )


@register(
    "tpch_q13",
    """WITH pc AS (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1)
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM pc GROUP BY 1 ORDER BY 2 DESC, 1 DESC""",
)
def tpch_q13(spark, sf_dir):
    return tpch.q13_customer_distribution(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )


@register(
    "tpch_q15",
    f"""WITH ps AS (
      SELECT l_suppkey, sum({REV_C}) AS rev_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, rev_c / 10000.0 AS total_revenue
    FROM ps JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev_c = (SELECT max(rev_c) FROM ps)
    ORDER BY s_suppkey""",
)
def tpch_q15(spark, sf_dir):
    return tpch.q15_top_supplier(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "supplier")
    )


@register(
    "tpch_q16",
    """SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25)
    GROUP BY 1, 2, 3 ORDER BY 4 DESC, 1, 2, 3""",
)
def tpch_q16(spark, sf_dir):
    return tpch.q16_parts_supplier_count(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    )


@register(
    "tpch_q20",
    """WITH qs AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(round(l_quantity * 100) AS BIGINT)) AS q
      FROM lineitem WHERE l_shipdate >= '2000-01-01' GROUP BY 1, 2),
    tot AS (SELECT *, sum(q) OVER (PARTITION BY l_partkey) AS t FROM qs),
    dom AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_parts_dominated
            FROM tot WHERE q * 2 > t GROUP BY 1)
    SELECT s_suppkey, s_name, n_parts_dominated
    FROM dom JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY n_parts_dominated DESC, s_suppkey LIMIT 20""",
)
def tpch_q20(spark, sf_dir):
    return tpch.q20_dominant_part_suppliers(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "supplier")
    )


@register(
    "tpch_q21",
    """WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    ret AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_returnflag = 'R'),
    sole AS (
      SELECT r.l_orderkey, r.l_suppkey FROM ret r
      WHERE EXISTS (SELECT 1 FROM pairs p
                    WHERE p.l_orderkey = r.l_orderkey
                      AND p.l_suppkey <> r.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM ret r2
                        WHERE r2.l_orderkey = r.l_orderkey
                          AND r2.l_suppkey <> r.l_suppkey)),
    counts AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
               FROM sole GROUP BY 1)
    SELECT s_suppkey, s_name, numwait
    FROM counts JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY numwait DESC, s_suppkey LIMIT 20""",
)
def tpch_q21(spark, sf_dir):
    return tpch.q21_sole_blame_suppliers(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "supplier")
    )


@register(
    "tpch_q2",
    """WITH p AS (
      SELECT p_partkey, p_brand FROM part
      WHERE p_size IN (5, 10, 15, 20) AND p_type = 'STANDARD'),
    elig AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    costs AS (
      SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS price_c,
             sum(CAST(round(l_quantity * 100) AS BIGINT)) AS qty_c
      FROM lineitem
      JOIN p ON l_partkey = p_partkey
      JOIN elig ON l_suppkey = s_suppkey
      GROUP BY 1, 2, 3, 4, 5, 6),
    mc AS (
      SELECT *, CAST(price_c AS DOUBLE) / qty_c AS uc,
             min(CAST(price_c AS DOUBLE) / qty_c)
               OVER (PARTITION BY p_partkey) AS mn
      FROM costs)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           round(uc, 6) AS unit_cost
    FROM mc WHERE uc = mn
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
)
def tpch_q2(spark, sf_dir):
    return tpch.q2_min_cost_supplier(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "part"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"),
    )


@register(
    "tpch_q11",
    f"""WITH ns AS (
      SELECT s_suppkey FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'),
    pp AS (
      SELECT l_partkey, sum({REV_C}) AS rev_c
      FROM lineitem JOIN ns ON l_suppkey = s_suppkey
      GROUP BY 1)
    SELECT l_partkey AS p_partkey, rev_c / 10000.0 AS part_value
    FROM pp WHERE rev_c * 1000 > (SELECT sum(rev_c) FROM pp)
    ORDER BY part_value DESC, p_partkey""",
)
def tpch_q11(spark, sf_dir):
    return tpch.q11_important_parts(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "supplier"),
        table(spark, sf_dir, "nation"),
    )


# ---------------------------------------------------------------------------
# OLAP window-ranking / set / grouping shapes (analytics/olap.py)

from .analytics import olap  # noqa: E402

CENTS_V = "CAST(round(v * 100) AS BIGINT)"
O_CENTS = "CAST(round(o_totalprice * 100) AS BIGINT)"


@register(
    "events_running_total",
    f"""{E_CTE}
    SELECT event_id, user_id,
           sum({CENTS_V}) OVER ({W} ROWS UNBOUNDED PRECEDING) / 100.0 AS running_sum
    FROM e""",
)
def events_running_total(spark, sf_dir):
    return olap.running_total(table(spark, sf_dir, "events"))


@register(
    "events_sliding_1h",
    f"""{E_CTE}
    SELECT event_id,
           CAST(count({CENTS_V}) OVER w AS BIGINT) AS n_window,
           round(sum({CENTS_V}) OVER w / 100.0 / count({CENTS_V}) OVER w, 6) AS avg_window
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""",
)
def events_sliding_1h(spark, sf_dir):
    return olap.sliding_time_avg(table(spark, sf_dir, "events"))


@register(
    "customer_spend_quartiles",
    f"""WITH pc AS (SELECT o_custkey, sum({O_CENTS}) AS spend_c FROM orders GROUP BY 1)
    SELECT c_custkey, spend_c / 100.0 AS total_spend,
           CAST(ntile(4) OVER (ORDER BY spend_c DESC, o_custkey) AS BIGINT) AS spend_quartile
    FROM pc JOIN customer ON o_custkey = c_custkey""",
)
def customer_spend_quartiles(spark, sf_dir):
    return olap.customer_spend_quartiles(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )


@register(
    "top_parts_per_brand",
    f"""WITH pp AS (
      SELECT p_brand, p_partkey, sum({REV_C}) AS rev_c
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2),
    r AS (
      SELECT p_brand, p_partkey, rev_c,
             CAST(row_number() OVER (PARTITION BY p_brand
                                     ORDER BY rev_c DESC, p_partkey) AS BIGINT) AS rn
      FROM pp)
    SELECT p_brand, p_partkey, rev_c / 10000.0 AS revenue, rn
    FROM r WHERE rn <= 3""",
)
def top_parts_per_brand(spark, sf_dir):
    return olap.top_parts_per_brand(
        table(spark, sf_dir, "lineitem"), table(spark, sf_dir, "part")
    )


@register(
    "orders_monthly_momentum",
    f"""WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             sum({O_CENTS}) AS rev_c
      FROM orders GROUP BY 1)
    SELECT month, rev_c / 100.0 AS revenue,
           lag(rev_c) OVER (ORDER BY month) / 100.0 AS prev_revenue,
           round((rev_c - lag(rev_c) OVER (ORDER BY month)) * 1.0
                 / lag(rev_c) OVER (ORDER BY month), 6) AS mom_pct
    FROM m""",
)
def orders_monthly_momentum(spark, sf_dir):
    return olap.monthly_revenue_momentum(table(spark, sf_dir, "orders"))


@register(
    "events_cube",
    f"""{E_CTE}, c AS (
      SELECT event_type, CAST(date_trunc('month', ts) AS DATE) AS month, v FROM e)
    SELECT event_type, month, CAST(count(*) AS BIGINT) AS n_events,
           sum({CENTS_V}) / 100.0 AS sum_value
    FROM c GROUP BY CUBE (event_type, month)""",
)
def events_cube(spark, sf_dir):
    return olap.events_cube(table(spark, sf_dir, "events"))


@register(
    "users_purchase_and_error",
    """SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'""",
)
def users_purchase_and_error(spark, sf_dir):
    return olap.users_purchase_and_error(table(spark, sf_dir, "events"))


@register(
    "supplier_balance_rank",
    """SELECT s_suppkey, n_name, s_acctbal,
           CAST(rank() OVER w AS BIGINT) AS bal_rank,
           round(percent_rank() OVER w, 6) AS bal_pct_rank
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WINDOW w AS (PARTITION BY n_name
                 ORDER BY CAST(round(s_acctbal * 100) AS BIGINT) DESC, s_suppkey)""",
)
def supplier_balance_rank(spark, sf_dir):
    return olap.supplier_balance_rank(
        table(spark, sf_dir, "supplier"), table(spark, sf_dir, "nation")
    )


@register(
    "events_funnel",
    f"""{E_CTE},
    q0 AS (SELECT user_id, event_id, ts, event_type,
             CASE WHEN event_type = 'view' THEN ts END AS q0
           FROM e),
    q1 AS (SELECT *, CASE WHEN event_type = 'click'
               AND min(q0) OVER w IS NOT NULL AND ts >= min(q0) OVER w
               THEN ts END AS q1
           FROM q0 WINDOW w AS ({W} ROWS UNBOUNDED PRECEDING)),
    q2 AS (SELECT *, CASE WHEN event_type = 'purchase'
               AND min(q1) OVER w IS NOT NULL AND ts >= min(q1) OVER w
               THEN ts END AS q2
           FROM q1 WINDOW w AS ({W} ROWS UNBOUNDED PRECEDING)),
    pu AS (SELECT user_id, min(q0) AS t0, min(q1) AS t1, min(q2) AS t2
           FROM q2 GROUP BY 1),
    c AS (SELECT CAST(count(t0) AS BIGINT) AS n_view,
                 CAST(count(t1) AS BIGINT) AS n_click,
                 CAST(count(t2) AS BIGINT) AS n_purchase
          FROM pu)
    SELECT *, round(n_click / n_view, 6) AS conv_view_to_click,
           round(n_purchase / n_click, 6) AS conv_click_to_purchase
    FROM c""",
)
def events_funnel(spark, sf_dir):
    """Ordered view->click->purchase conversion funnel (sequential
    pattern via chained running-min windows, one shuffle)."""
    return olap.funnel(table(spark, sf_dir, "events"))


@register(
    "events_retention",
    f"""{E_CTE},
    c AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
          FROM e GROUP BY 1),
    a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM e),
    r AS (SELECT cohort_week,
                 CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
                 CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
          FROM a JOIN c ON a.user_id = c.user_id GROUP BY 1, 2)
    SELECT cohort_week, week_offset, n_active,
           round(n_active / first_value(n_active) OVER
                 (PARTITION BY cohort_week ORDER BY week_offset), 6) AS retention
    FROM r""",
)
def events_retention(spark, sf_dir):
    """Weekly retention cohorts (first-seen week x week offset,
    distinct-active counts, ratio vs week-0 cohort size)."""
    return olap.retention_cohorts(table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# scalar-function library coverage: date/time, string, and array functions
# (SURVEY §2.4 notes the reference has no scalar-function surface — these
# demonstrate the engine-side families over driver testdata, each with an
# exact cross-engine oracle)


@register(
    "events_date_parts",
    """SELECT event_id,
           CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
           CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
           CAST(minute(ts) AS BIGINT) AS mi,
           CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
           CAST(dayofyear(ts) AS BIGINT) AS doy,
           CAST(quarter(ts) AS BIGINT) AS q,
           CAST(date_trunc('day', ts) AS DATE) AS day_start
    FROM events""",
)
def events_date_parts(spark, sf_dir):
    """Datetime extraction family, JVM-side. DuckDB numbers weekdays
    Sunday=0 while Spark uses Sunday=1; the oracle normalizes."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.dayofweek("ts").cast("long").alias("dow"),
        F.dayofyear("ts").cast("long").alias("doy"),
        F.quarter("ts").cast("long").alias("q"),
        F.date_trunc("day", F.col("ts")).cast("date").alias("day_start"),
    )


@register(
    "doc_string_funcs",
    """SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           upper(substr(text, 1, 12)) AS head_upper,
           trim(lower(substr(text, 1, 12))) AS head_lower,
           regexp_extract(text, '[a-z]+') AS first_word,
           CAST(instr(text, 'e') AS BIGINT) AS first_e,
           CAST(levenshtein(substr(text, 1, 8), 'the quick') AS BIGINT) AS lev_d,
           replace(substr(text, 1, 16), ' ', '_') AS head_snake,
           reverse(substr(text, 1, 8)) AS head_rev
    FROM documents""",
)
def doc_string_funcs(spark, sf_dir):
    """String-function family, JVM-side: length/case/trim/regexp/
    instr/levenshtein/replace/reverse."""
    d = table(spark, sf_dir, "documents")
    head = lambda n: F.substring("text", 1, n)  # noqa: E731
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.upper(head(12)).alias("head_upper"),
        F.trim(F.lower(head(12))).alias("head_lower"),
        F.regexp_extract("text", "[a-z]+", 0).alias("first_word"),
        F.instr("text", "e").cast("long").alias("first_e"),
        F.levenshtein(head(8), F.lit("the quick")).cast("long").alias("lev_d"),
        F.replace(head(16), F.lit(" "), F.lit("_")).alias("head_snake"),
        F.reverse(head(8)).alias("head_rev"),
    )


@register(
    "emb_array_funcs",
    f"""WITH v AS (SELECT vec_id, label, {EMB_D} AS ve FROM embeddings)
    SELECT vec_id, label,
           CAST(len(ve) AS BIGINT) AS dim,
           round(ve[1], 6) AS first_el,
           round(list_min(ve), 6) AS min_el,
           round(list_max(ve), 6) AS max_el,
           round(list_sum(ve), 6) AS sum_el,
           round(sqrt(list_dot_product(ve, ve)), 6) AS l2_norm,
           round(list_sum(list_transform(ve, x -> abs(x))), 6) AS l1_norm
    FROM v""",
)
def emb_array_funcs(spark, sf_dir):
    """Array-function family over the embedding column: size/element/
    min/max/aggregate-sum/norms — all JVM-side higher-order functions,
    no Python in the path."""
    e = table(spark, sf_dir, "embeddings")
    ve = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    zero = F.lit(0.0)
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at(ve, 1), 6).alias("first_el"),
        F.round(F.array_min(ve), 6).alias("min_el"),
        F.round(F.array_max(ve), 6).alias("max_el"),
        F.round(F.aggregate(ve, zero, lambda a, x: a + x), 6).alias("sum_el"),
        F.round(
            F.sqrt(F.aggregate(ve, zero, lambda a, x: a + x * x)), 6
        ).alias("l2_norm"),
        F.round(F.aggregate(ve, zero, lambda a, x: a + F.abs(x)), 6).alias("l1_norm"),
    )


@register(
    "events_distinct_users_approx",
    """SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS approx_within_tol
    FROM events GROUP BY event_type ORDER BY event_type""",
)
def events_distinct_users_approx(spark, sf_dir):
    """HyperLogLog++ approximate distinct users per event type — the
    sketch-based scale path beside events_distinct_users' exact
    count(DISTINCT). The HLL estimate is engine-specific, so the query
    emits an oracle-checkable certificate: the exact count plus a
    boolean asserting the estimate landed within max(2, 10%) of it —
    5 standard deviations at rsd=0.02, so the certificate is
    effectively deterministic. (rsd=0.01 would be 2^14 registers per
    group whose partial-merge cost dominated the whole aggregate —
    measured 2.4s vs 0.8s at sf0.1; production runs only the sketch
    aggregate.)"""
    e = table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("__a"),
    )
    tol = F.greatest(F.lit(2.0), F.lit(0.10) * F.col("exact_users"))
    return agg.select(
        "event_type",
        "exact_users",
        (F.abs(F.col("__a") - F.col("exact_users")) <= tol).alias("approx_within_tol"),
    ).orderBy("event_type")


@register(
    "events_session_window",
    f"""WITH g AS (
      SELECT user_id, ts,
             (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)) / 1000000.0 AS gap
      FROM events),
    s AS (SELECT user_id, ts,
          sum(CASE WHEN coalesce(gap > 1800, TRUE) THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM g)
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_start""",
)
def events_session_window(spark, sf_dir):
    """Native session-window aggregation (F.session_window): Spark
    merges events closer than the gap into one session during
    aggregation — no self-window pre-pass, works identically under
    Structured Streaming (where the gap-cumsum formulation does not).
    The oracle is the gap-sessionization formulation, which defines
    the same partition of events; window.end = last event + gap."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "ts_iqr",
    f"""{E_CTE}, q AS (
      SELECT event_id, v,
             quantile_cont(v, 0.25) OVER ({P}) AS q1,
             quantile_cont(v, 0.75) OVER ({P}) AS q3
      FROM e)
    SELECT event_id,
           coalesce(v < q1 - 1.5 * (q3 - q1) OR v > q3 + 1.5 * (q3 - q1), FALSE) AS is_anomaly
    FROM q""",
)
def ts_iqr(spark, sf_dir):
    """Tukey-fence (IQR) outlier detector per series: quantile window
    aggregates (exact percentile at test scale; the approx-percentile
    scale path is ts_range_quantile_approx's pattern). NULL/NaN rows
    are never anomalies, matching the reference's NaN discipline."""
    from pyspark.sql import Window as _W

    e = table(spark, sf_dir, "events")
    pw = _W.partitionBy("user_id")
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(F.col("value"))
    q1 = F.expr("percentile(__v, 0.25)").over(pw)
    q3 = F.expr("percentile(__v, 0.75)").over(pw)
    iqr = q3 - q1
    pred = (F.col("__v") < q1 - 1.5 * iqr) | (F.col("__v") > q3 + 1.5 * iqr)
    return e.withColumn("__v", v).select(
        "event_id", F.coalesce(pred, F.lit(False)).alias("is_anomaly")
    )


@register(
    "ts_autocorr",
    f"""{E_CTE}, lagd AS (
      SELECT user_id, CAST(round(v * 100) AS BIGINT) AS x,
             lag(CAST(round(v * 100) AS BIGINT)) OVER ({W}) AS y
      FROM e),
    m AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM lagd WHERE x IS NOT NULL AND y IS NOT NULL
      GROUP BY user_id)
    SELECT user_id, n,
           round((n * sxy - sx * sy)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS lag1_autocorr
    FROM m""",
)
def ts_autocorr(spark, sf_dir):
    """Per-series lag-1 autocorrelation from EXACT integer moments:
    the sums run in the cents domain as longs (order-independent, so
    partial aggregation over any partitioning is bit-stable), and the
    Pearson formula is applied once in double at the end — unlike the
    built-in ``corr``, whose float accumulation order varies by plan."""
    from pyspark.sql import Window as _W

    e = table(spark, sf_dir, "events")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(F.col("value"))
    x = F.round(v * 100).cast("long")
    # lag must see the original row order, so compute lag BEFORE the
    # null filter
    lagd = (
        e.select("user_id", "ts", "event_id", x.alias("x"))
        .withColumn("y", F.lag("x").over(w))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    )
    m = lagd.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        "user_id",
        "n",
        F.round(num / (F.sqrt(dx) * F.sqrt(dy)), 6).alias("lag1_autocorr"),
    )


@register(
    "events_value_histogram",
    f"""{E_CTE}
    SELECT CAST(floor(v / 50.0) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(v), 6) AS lo, round(max(v), 6) AS hi
    FROM e GROUP BY 1""",
)
def events_value_histogram(spark, sf_dir):
    """Fixed-width value histogram: bucketing is a pure projection so
    the aggregate is map-side-combinable; NULL/NaN land in the NULL
    bucket row rather than silently dropping."""
    e = table(spark, sf_dir, "events")
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(F.col("value"))
    return (
        e.select(v.alias("v"))
        .groupBy(F.floor(F.col("v") / 50.0).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("v"), 6).alias("lo"),
            F.round(F.max("v"), 6).alias("hi"),
        )
    )


@register(
    "daily_orders_vs_purchases",
    f"""WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             sum({O_CENTS}) AS rev_c
      FROM orders GROUP BY 1),
    p AS (
      SELECT CAST(ts AS DATE) AS day,
             sum(CASE WHEN isnan(value) THEN NULL
                      ELSE CAST(round(value * 100) AS BIGINT) END) AS val_c
      FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT coalesce(o.day, p.day) AS day,
           o.rev_c / 100.0 AS order_revenue,
           p.val_c / 100.0 AS purchase_value
    FROM o FULL OUTER JOIN p ON o.day = p.day""",
)
def daily_orders_vs_purchases(spark, sf_dir):
    """FULL OUTER join of two independently-aggregated daily series
    (orders revenue vs purchase-event value). Aggregate-then-join: the
    outer join sees |days| rows per side, never the fact tables. The
    disjoint date ranges in the testdata exercise both null sides."""
    o = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(tpch.cents("o_totalprice")).alias("rev_c"))
    )
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(F.col("value"))
    p = (
        table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.round(v * 100).cast("long")).alias("val_c"))
    )
    return (
        o.join(p, "day", "full_outer")
        .select(
            "day",
            (F.col("rev_c") / 100.0).alias("order_revenue"),
            (F.col("val_c") / 100.0).alias("purchase_value"),
        )
    )


@register(
    "users_error_or_signup",
    """SELECT user_id FROM events WHERE event_type = 'error'
    UNION
    SELECT user_id FROM events WHERE event_type = 'signup'""",
)
def users_error_or_signup(spark, sf_dir):
    """UNION (distinct) set operation — planned as union-all + hash
    aggregate on the key."""
    e = table(spark, sf_dir, "events")
    a = e.where(F.col("event_type") == "error").select("user_id")
    b = e.where(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "events_unpivot",
    """WITH c AS (
      SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    d AS (SELECT DISTINCT day FROM c),
    t AS (SELECT unnest(['click','error','purchase','signup','view']) AS event_type)
    SELECT d.day, t.event_type, coalesce(c.n, 0) AS n
    FROM d CROSS JOIN t
    LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type""",
)
def events_unpivot(spark, sf_dir):
    """Pivot -> unpivot round trip: wide per-day counts by type, then
    melted back to long form. The pivot's value list is explicit, so
    no extra distinct-collection job runs; fillna(0) densifies the
    cube (the oracle densifies with a day x type cross join)."""
    e = table(spark, sf_dir, "events")
    wide = (
        e.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .count()
        .fillna(0, subset=EVENT_TYPES)
    )
    return wide.unpivot("day", EVENT_TYPES, "event_type", "n")


@register(
    "events_conditional_aggs",
    f"""{E_CTE}
    SELECT event_type,
           CAST(count(*) FILTER (WHERE v > 250) AS BIGINT) AS n_high,
           CAST(count(*) FILTER (WHERE v IS NULL) AS BIGINT) AS n_missing,
           bool_or(v > 450) AS any_extreme,
           bool_and(v IS NOT NULL) AS all_present
    FROM e GROUP BY event_type""",
)
def events_conditional_aggs(spark, sf_dir):
    """Conditional-aggregate family: count_if / filtered counts and
    boolean bool_or/bool_and reductions — all map-side combinable."""
    e = table(spark, sf_dir, "events")
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(F.col("value"))
    return (
        e.select("event_type", v.alias("v"))
        .groupBy("event_type")
        .agg(
            F.count_if(F.col("v") > 250).alias("n_high"),
            F.count_if(F.col("v").isNull()).alias("n_missing"),
            F.bool_or(F.col("v") > 450).alias("any_extreme"),
            F.bool_and(F.col("v").isNotNull()).alias("all_present"),
        )
    )


@register(
    "events_daily_ohlc",
    f"""{E_CTE}, r AS (
      SELECT user_id, CAST(ts AS DATE) AS day, v,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e)
    SELECT user_id, day,
           min(CASE WHEN rn_a = 1 THEN v END) AS open,
           round(max(v), 6) AS high, round(min(v), 6) AS low,
           min(CASE WHEN rn_d = 1 THEN v END) AS close
    FROM r GROUP BY user_id, day""",
)
def events_daily_ohlc(spark, sf_dir):
    """Per-series-per-day OHLC: open/close come from deterministic
    row_number boundaries (full (ts, event_id) order — arg_min/max on
    ts alone would be tie-ambiguous), high/low are plain min/max. One
    shuffle on (user_id, day); both windows share the sort."""
    from pyspark.sql import Window as _W

    e = table(spark, sf_dir, "events")
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(F.col("value"))
    day = F.col("ts").cast("date")
    wa = _W.partitionBy("user_id", day).orderBy("ts", "event_id")
    wd = _W.partitionBy("user_id", day).orderBy(F.desc("ts"), F.desc("event_id"))
    r = e.select(
        "user_id",
        day.alias("day"),
        v.alias("v"),
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("user_id", "day").agg(
        F.min(F.when(F.col("rn_a") == 1, F.col("v"))).alias("open"),
        F.round(F.max("v"), 6).alias("high"),
        F.round(F.min("v"), 6).alias("low"),
        F.min(F.when(F.col("rn_d") == 1, F.col("v"))).alias("close"),
    )


@register(
    "nation_revenue_share",
    f"""WITH n AS (
      SELECT n_name, sum({REV_C}) AS rev_c
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1)
    SELECT n_name, rev_c / 10000.0 AS revenue,
           round(rev_c * 1.0 / sum(rev_c) OVER (), 6) AS share
    FROM n""",
)
def nation_revenue_share(spark, sf_dir):
    """Percent-of-total: a window-over-() share computed on the
    pre-aggregated per-nation rollup (25 rows), so the unpartitioned
    window is trivially single-reducer-safe. Exact integer cents make
    the share an exact long ratio."""
    from pyspark.sql import Window as _W

    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    rev = F.sum(tpch.cents("l_extendedprice") * (100 - tpch.pct("l_discount")))
    per_nation = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(rev.alias("rev_c"))
    )
    w = _W.partitionBy()
    return per_nation.select(
        "n_name",
        (F.col("rev_c") / 10000.0).alias("revenue"),
        F.round(F.col("rev_c") * 1.0 / F.sum("rev_c").over(w), 6).alias("share"),
    )


@register(
    "events_grouping_sets",
    f"""{E_CTE}, c AS (SELECT event_type, CAST(ts AS DATE) AS day, v FROM e)
    SELECT event_type, day,
           CAST(grouping(event_type) * 2 + grouping(day) AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(CAST(round(v * 100) AS BIGINT)) / 100.0 AS sum_value
    FROM c GROUP BY GROUPING SETS ((event_type), (day), ())""",
)
def events_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (neither ROLLUP nor CUBE): per-type,
    per-day, and grand-total slices in one pass, with grouping()
    flags distinguishing real NULLs from subtotal rows."""
    e = table(spark, sf_dir, "events")
    e.createOrReplaceTempView("__ev_gs")
    return spark.sql(
        """WITH c AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CASE WHEN isnan(value) THEN NULL ELSE value END AS v
          FROM __ev_gs)
        SELECT event_type, day,
               CAST(grouping(event_type) * 2 + grouping(day) AS BIGINT) AS gid,
               count(*) AS n_events,
               sum(CAST(round(v * 100) AS BIGINT)) / CAST(100 AS DOUBLE) AS sum_value
        FROM c GROUP BY GROUPING SETS ((event_type), (day), ())"""
    )


@register(
    "customers_above_nation_avg",
    """SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE CAST(round(c_acctbal * 100) AS BIGINT) * (
            SELECT CAST(count(*) AS BIGINT) FROM customer i
            WHERE i.c_nationkey = c.c_nationkey)
          > (SELECT sum(CAST(round(i.c_acctbal * 100) AS BIGINT))
             FROM customer i WHERE i.c_nationkey = c.c_nationkey)""",
)
def customers_above_nation_avg(spark, sf_dir):
    """Correlated-subquery shape (customers above their nation's mean
    balance), hand-decorrelated into a window aggregate: one shuffle
    on nationkey, no per-row subquery execution. The comparison is
    cross-multiplied into the exact integer domain (bal * n > sum) so
    no float average is ever materialized in either engine."""
    from pyspark.sql import Window as _W

    c = table(spark, sf_dir, "customer")
    w = _W.partitionBy("c_nationkey")
    bal_c = tpch.cents("c_acctbal")
    return (
        c.withColumn("__n", F.count(F.lit(1)).over(w))
        .withColumn("__s", F.sum(bal_c).over(w))
        .where(bal_c * F.col("__n") > F.col("__s"))
        .select("c_custkey", "c_acctbal")
    )


@register(
    "ts_cusum",
    f"""{E_CTE}, s AS (
      SELECT event_id,
             sum(CAST(round(v * 100) AS BIGINT) - 15000)
               OVER ({W} ROWS UNBOUNDED PRECEDING) AS s_c
      FROM e)
    SELECT event_id, coalesce(abs(s_c) > 500000, FALSE) AS is_anomaly
    FROM s""",
)
def ts_cusum(spark, sf_dir):
    """CUSUM drift detector (Page's test without reset): running sum of
    deviations from a target level, flagged when the excursion exceeds
    h. The accumulation runs entirely in exact integer cents (longs),
    so the running sum is bit-identical in any engine — no float
    accumulation-order hazard. NULL rows contribute nothing and are
    never flagged. Target 150.00, h 5000.00 on the events series."""
    from pyspark.sql import Window as _W

    e = table(spark, sf_dir, "events")
    w = (
        _W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(F.col("value"))
    dev = F.round(v * 100).cast("long") - 15000
    s = e.select("event_id", F.sum(dev).over(w).alias("s_c"))
    return s.select(
        "event_id",
        F.coalesce(F.abs(F.col("s_c")) > 500000, F.lit(False)).alias("is_anomaly"),
    )


@register(
    "emb_label_centroids",
    f"""WITH u AS (
      SELECT label, CAST(round(unnest({EMB_D}) * 1000000) AS BIGINT) AS xm,
             generate_subscripts({EMB_D}, 1) AS pos
      FROM embeddings)
    SELECT label, CAST(pos AS BIGINT) AS pos,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(xm) / (1000000.0 * count(*)), 6) AS centroid
    FROM u GROUP BY 1, 2""",
)
def emb_label_centroids(spark, sf_dir):
    """Per-label centroid embedding via posexplode + per-dimension
    mean — the vector aggregate every clustering/dedup pipeline needs.
    Shuffles (label, pos, xm) triples with map-side partial sums; no
    Python, no vector UDAF. Values accumulate as exact integer
    micro-units (round(x*1e6) longs) so the running sum is
    bit-identical regardless of partial-aggregation order — the same
    discipline as the money paths; one float division at the end."""
    e = table(spark, sf_dir, "embeddings")
    ve = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    u = e.select("label", F.posexplode(ve).alias("pos0", "x")).select(
        "label", "pos0", F.round(F.col("x") * 1000000).cast("long").alias("xm")
    )
    return (
        u.groupBy("label", (F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("xm") / (1000000.0 * F.count(F.lit(1))), 6).alias("centroid"),
        )
    )


@register(
    "doc_contamination_stats",
    f"""WITH bt AS (SELECT {TOKS} AS t FROM documents WHERE source = 'src0'),
    bg AS (SELECT DISTINCT unnest({_shingle_sql('t', 5)}) AS g FROM bt),
    dt AS (SELECT doc_id, source, {TOKS} AS t FROM documents
           WHERE source <> 'src0'),
    dg AS (SELECT doc_id, source, unnest({_shingle_sql('t', 5)}) AS g FROM dt),
    hit AS (SELECT doc_id, max(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) AS h
            FROM dg LEFT JOIN bg ON dg.g = bg.g GROUP BY doc_id),
    f AS (SELECT d.doc_id, d.source, coalesce(h.h, 0) AS h
          FROM (SELECT doc_id, source FROM documents WHERE source <> 'src0') d
          LEFT JOIN hit h ON h.doc_id = d.doc_id)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(h) AS BIGINT) AS n_contaminated,
           round(sum(h) / CAST(count(*) AS DOUBLE), 6) AS contamination_rate
    FROM f GROUP BY source""",
)
def doc_contamination_stats(spark, sf_dir):
    """Per-source contamination rates against the src0 benchmark slice
    — the eval-integrity table a governance review reads ("which
    supplier's crawl leaks the eval sets?"). Broadcast-benchmark shape;
    corpus never shuffles for the marking."""
    docs = table(spark, sf_dir, "documents")
    return curate.contamination_stats(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    )


@register(
    "doc_chunk_dedup",
    f"""WITH t AS (SELECT doc_id, {TOKS} AS t FROM documents),
    b AS (SELECT doc_id, CAST(ceil(len(t) / 10.0) AS BIGINT) AS n_total, t FROM t),
    c AS (SELECT doc_id, CAST(u.ci AS BIGINT) AS ci,
                 array_to_string(t[u.ci * 10 + 1 : u.ci * 10 + 10], ' ') AS chunk
          FROM b, unnest(range(0, n_total)) AS u(ci)),
    k AS (SELECT doc_id, ci, chunk,
                 row_number() OVER (PARTITION BY chunk ORDER BY doc_id, ci) AS rn
          FROM c),
    r AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY ci) AS text_dedup,
                 CAST(count(*) AS BIGINT) AS n_kept
          FROM k WHERE rn = 1 GROUP BY doc_id)
    SELECT b.doc_id, coalesce(r.text_dedup, '') AS text_dedup,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept, b.n_total
    FROM b LEFT JOIN r ON b.doc_id = r.doc_id""",
)
def doc_chunk_dedup(spark, sf_dir):
    """Corpus-wide duplicate-span removal over fixed 10-token chunks
    (C4/Lee-et-al passage dedup; first occurrence by (doc_id, ci)
    wins) with per-doc text reassembly."""
    return dedup.chunk_dedup(table(spark, sf_dir, "documents"))


@register(
    "doc_mixture_sample",
    """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
                  FROM documents GROUP BY source),
    t AS (SELECT sum(ns) AS n,
                 sum(CAST(round(sqrt(ns) * 1000000) AS BIGINT)) AS ssq_u FROM c),
    r AS (SELECT source,
                 CAST(floor(least(1.0, (0.5 * n) / ((ssq_u / 1000000.0) * sqrt(ns)))
                      * 4294967296.0) AS BIGINT) AS thr
          FROM c, t)
    SELECT d.doc_id, d.source FROM documents d JOIN r ON d.source = r.source
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT < r.thr""",
)
def doc_mixture_sample(spark, sf_dir):
    """Temperature-α=0.5 source-mixture sampling at target_frac=0.5:
    deterministic content-hash Bernoulli draws against per-source
    thresholds derived in exact int64 space."""
    return curate.mixture_sample(table(spark, sf_dir, "documents"))


@register(
    "doc_stratified_sample",
    """WITH r AS (SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 10""",
)
def doc_stratified_sample(spark, sf_dir):
    """Exact-quota stratified sample: the 10 lowest-content-hash docs
    per source — deterministic, exact counts, re-shard-stable."""
    return curate.stratified_sample(table(spark, sf_dir, "documents"))


@register(
    "doc_weighted_sample",
    """WITH s AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           round(-ln((('0x' || substr(md5(text), 1, 8))::BIGINT + 0.5)
                     / 4294967296.0), 9) / n_chars AS es_key
        FROM documents),
    r AS (SELECT *, CAST(row_number() OVER (ORDER BY es_key, doc_id)
                         AS BIGINT) AS rk FROM s)
    SELECT doc_id, weight, es_key, rk FROM r WHERE rk <= 50""",
)
def doc_weighted_sample(spark, sf_dir):
    """Efraimidis–Spirakis weighted sampling without replacement with a
    deterministic content-hash uniform: k smallest Exp(weight) keys via
    TakeOrderedAndProject, no global sort (curate.weighted_sample)."""
    return curate.weighted_sample(table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
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
    from .analytics import olap

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
    from .analytics import olap

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
    q AS (SELECT user_id, quantile_cont(v, 0.05) AS lo,
                 quantile_cont(v, 0.95) AS hi
          FROM e GROUP BY user_id),
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


# ---------------------------------------------------------------------------
# driver check-window rotation
#
# The driver's per-round oracle run covers the FIRST 50 entries of the
# queries() dict; round 1 verified exactly the first 50 registration-order
# names (CORRECTNESS_r01.json), leaving 52 registered-later queries with
# no driver verdict. Rotate the ordering so every query earns a driver
# verdict across rounds: names without a green driver row yet come first
# (in registration order), already-verified names after. The two approx
# twins of r1-verified exact queries are parked at the window boundary —
# they are rows-only checks whose exact twins are already green, so they
# lose the least by waiting a round.

R1_VERIFIED = frozenset({
    "ts_range", "ts_range_quantile", "ts_diff", "ts_diff_fit",
    "ts_range_low_only", "ts_diff_positive", "ts_diff_negative",
    "ts_gradient", "ts_gradient_fit", "ts_rolling_std", "ts_rolling_std_fit",
    "ts_constant_value", "ts_constant_gradient", "ts_hampel", "ts_combined",
    "ts_lag_features", "ts_window_dataset", "ts_resample_15m",
    "ts_range_sqlapi", "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6",
    "tpch_q4", "tpch_q14", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q22",
    "top_customers", "events_daily", "events_props_json", "events_rollup",
    "events_sessions", "ts_asof_join", "ts_asof_forward", "ts_resample_1h",
    "events_type_pivot", "events_distinct_users", "users_purchase_no_error",
    "events_value_percentiles", "doc_stats", "doc_quality",
    "doc_token_counts", "doc_lang_id", "doc_fingerprints", "dedup_exact",
    "dedup_minhash_sig", "dedup_minhash_pairs", "dedup_minhash_groups",
})

# Fully-green rows from CORRECTNESS_r02.json, minus emb_lsh_near_pairs:
# its r2 "pass" hash-matched an EMPTY result (spark_rows=0) and the
# registered threshold has since changed (τ 0.9 → 0.3) to make the
# check non-vacuous, so it must earn a real verdict in r3.
R2_VERIFIED = frozenset({
    "anomaly_daily_summary", "customer_spend_quartiles",
    "customers_above_nation_avg", "daily_orders_vs_purchases",
    "dedup_jaccard_topk", "dedup_simhash", "dedup_simhash_pairs",
    "doc_string_funcs", "emb_array_funcs", "emb_cosine_topk",
    "emb_knn_join", "emb_knn_label_accuracy", "emb_label_centroids",
    "emb_lsh_buckets", "events_conditional_aggs", "events_cube",
    "events_daily_ohlc", "events_date_parts", "events_grouping_sets",
    "events_running_total", "events_session_window", "events_unpivot",
    "events_value_histogram", "mm_decode", "mm_frames", "mm_real_decode",
    "mm_resize", "nation_revenue_share", "orders_monthly_momentum",
    "supplier_balance_rank", "top_parts_per_brand", "tpch_q10",
    "tpch_q12", "tpch_q13", "tpch_q15", "tpch_q16", "tpch_q20",
    "tpch_q21", "tpch_q7", "tpch_q8", "tpch_q9", "ts_autocorr",
    "ts_cusum", "ts_iqr", "ts_zscore", "users_error_or_signup",
    "users_purchase_and_error",
    # rows-only by design (no oracle); its r2 rows-only verdict stands
    "emb_ivf_topk",
})

# Fully-green rows from CORRECTNESS_r03.json. Note r3's window already
# re-confirmed the ts_* detector family on post-encodings code, so those
# R1 names are no longer stale.
R3_VERIFIED = frozenset({
    "dedup_canonical", "dedup_embedding_groups", "dedup_incremental",
    "doc_chunk_dedup", "doc_contamination_stats", "doc_decontaminate",
    "doc_mixture_sample", "doc_redact", "doc_repetition",
    "doc_split_assign", "doc_stratified_sample", "doc_tfidf_topk",
    "emb_lsh_near_pairs", "emb_quantize", "events_funnel",
    "events_interval_overlap", "events_latest_by_key",
    "events_range_join", "events_retention", "events_rollup_hierarchy",
    "events_sliding_1h", "mm_audio_energy", "mm_resize_pixels",
    "tpch_q11", "tpch_q2", "ts_asof_tolerance", "ts_combined",
    "ts_constant_gradient", "ts_constant_value", "ts_diff",
    "ts_diff_fit", "ts_diff_negative", "ts_diff_positive", "ts_ewma",
    "ts_gradient", "ts_gradient_fit", "ts_hampel", "ts_lag_features",
    "ts_range", "ts_range_low_only", "ts_range_quantile",
    "ts_rolling_std", "ts_rolling_std_fit",
})

# Fully-green rows from CORRECTNESS_r04.json.
R4_VERIFIED = frozenset({
    "dedup_rate_by_source", "dedup_simhash_groups", "doc_bm25_search",
    "doc_budget_select", "doc_curation_pipeline", "doc_lm_rarity",
    "doc_pack_sequences", "doc_stats", "doc_vocab_overlap",
    "doc_weighted_sample", "events_asof_snapshot", "events_daily",
    "events_distinct_users", "events_distinct_users_approx",
    "events_profile", "events_props_json", "events_rollup",
    "events_scd2", "events_sessions", "events_table_diff",
    "events_type_pivot", "events_value_drift", "events_value_percentiles",
    "top_customers", "tpch_q1", "tpch_q14", "tpch_q17", "tpch_q18",
    "tpch_q19", "tpch_q22", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6",
    "ts_asof_forward", "ts_asof_join", "ts_benchmark_corr", "ts_holt",
    "ts_range_quantile_approx", "ts_range_sqlapi", "ts_resample_15m",
    "ts_resample_1h", "ts_rolling_corr", "ts_seasonal_anomaly",
    "ts_seasonal_decompose", "ts_window_dataset", "users_purchase_no_error",
})

# Fully-green rows from CORRECTNESS_r05.json (driver sf0.01 oracle, 50/50).
R5_VERIFIED = frozenset({
    "anomaly_daily_summary", "dedup_exact", "dedup_jaccard_topk",
    "dedup_minhash_groups", "dedup_minhash_pairs", "dedup_minhash_sig",
    "dedup_simhash", "dedup_simhash_pairs", "doc_chunk_split",
    "doc_fingerprints", "doc_gopher_filter", "doc_lang_id", "doc_quality",
    "doc_rag_search", "doc_token_counts", "doc_vocab_overlap",
    "doc_weighted_sample", "dq_suite", "emb_cosine_topk", "emb_ivf_cells",
    "emb_ivf_topk", "emb_ivfpq_topk", "emb_knn_join",
    "emb_knn_label_accuracy", "emb_lsh_buckets", "emb_pq_topk",
    "events_merge_upsert", "mm_decode", "mm_frames", "mm_real_decode",
    "mm_resize", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q15", "tpch_q16",
    "tpch_q20", "tpch_q7", "tpch_q8", "tpch_q9", "ts_ccf", "ts_esd",
    "ts_lttb", "ts_mllib_kmeans", "ts_mllib_residual",
    "ts_mllib_residual_per_series", "ts_shesd", "ts_time_weighted_avg",
    "ts_winsorize", "ts_zscore",
})

_ROUND_SETS = (
    (5, R5_VERIFIED),
    (4, R4_VERIFIED),
    (3, R3_VERIFIED),
    (2, R2_VERIFIED),
    (1, R1_VERIFIED),
)

# Queries whose verdict must be (re-)earned first in r6: names whose
# oracle or plan changed this round (hot-bucket caps for banded dedup
# joins, if any semantics shift) plus brand-new registrations. Empty
# entries are fine — tier 0 then just falls through to staleness.
_R6_PRIORITY = ()


def _latest_verified_round(n: str) -> int:
    """Most recent driver round whose CORRECTNESS file has this query
    fully green; 0 if never verified."""
    for rnd, s in _ROUND_SETS:
        if n in s:
            return rnd
    return 0


def _rotated(d: dict) -> dict:
    # The driver checks the FIRST 50 names per round, so ordering is the
    # verification schedule. r6 window: (1) new/changed queries needing
    # a fresh verdict, then (2) stalest latest-verdicts first — after
    # r5 the stalest tier is the 25 names whose latest green is r2
    # (tpch_q21, events_running_total, customer_spend_quartiles, ...),
    # then the oldest r3 names fill the remainder of the 50.

    def age(n: str) -> int:
        if n in _R6_PRIORITY:
            return 0
        return _latest_verified_round(n)  # 0 = never verified, first

    names = sorted(d, key=lambda n: age(n))  # stable: registration order within tier
    return {n: d[n] for n in names}


def ordered_queries() -> dict:
    return _rotated(QUERIES)


def ordered_oracle() -> dict:
    return _rotated(ORACLE)
