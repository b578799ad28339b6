"""Star-schema analytics: core TPC-H shapes (SURVEY §7 phase 4).

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


