"""Remaining TPC-H shapes (Q7-Q16 family; adapted where the testdata has no partsupp/commitdate/shipmode columns).

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


