"""OLAP window-ranking / set / grouping shapes (analytics/olap.py).

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
    table,
)
from .tpch_more import REV_C  # noqa: F401

# OLAP window-ranking / set / grouping shapes (analytics/olap.py)

from ..analytics import olap  # noqa: E402

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




@register(
    "events_salted_join",
    """WITH dim AS (
      SELECT event_type,
             CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS type_id
      FROM (SELECT DISTINCT event_type FROM events)),
    e AS (SELECT event_type,
                 CASE WHEN isnan(value) THEN NULL ELSE value END AS v
          FROM events)
    SELECT d.type_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM e JOIN dim d USING (event_type)
    GROUP BY d.type_id""",
)
def events_salted_join(spark, sf_dir):
    """Skew-mitigated fact-to-dim join (analytics/skew.py salted_join):
    the events fact is salted across 8 buckets on a deterministic row
    hash and the tiny type dim is exploded once per salt, so a hot
    event_type can never collapse onto one shuffle partition. The
    oracle is the PLAIN join — salting must be result-invariant, and
    the exact-cents aggregate hash-checks that it is."""
    from ..analytics.skew import salted_join

    e = table(spark, sf_dir, "events").select(
        "event_type", F.col("value").alias("__v")
    )
    dim = (
        e.select("event_type")
        .distinct()
        .withColumn(
            "type_id",
            F.row_number()
            .over(Window.orderBy("event_type"))
            .cast("long"),
        )
    )
    v = F.when(F.isnan("__v") | F.col("__v").isNull(), None).otherwise(F.col("__v"))
    joined = salted_join(e, dim, ["event_type"], n_salts=8)
    return (
        joined.groupBy("type_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.round(v * 100).cast("long")).cast("long").alias("cents"),
        )
    )
