"""Star-schema analytics over the TPC-H-ish testdata.

Cross-engine float discipline: money columns are 2-decimal doubles, so
every SUM is computed in exact integer cents (``round(x*100)`` cast to
BIGINT) and divided back at the end — bit-identical totals regardless
of partial-aggregation order, in Spark and in any SQL oracle. Averages
divide two exact integers.

Scale notes: joins to region/nation/supplier/customer are broadcast
(dimension tables); fact-fact joins (orders-lineitem) shuffle on the
join key with AQE handling skew; all filters sit directly on the scan
so parquet min/max pruning and dictionary pushdown apply.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cents(col) -> Column:
    """Exact integer cents for a 2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def pct(col) -> Column:
    """Exact integer percent for a 2-decimal fraction column (0.07 -> 7)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "2000-12-01") -> DataFrame:
    """TPC-H Q1 shape: grouped pricing summary with exact-cent sums.

    disc_price = extprice*(1-disc) and charge = disc_price*(1+tax) are
    computed in the integer domain: cents * (100-d) [* (100+t)] with
    the scale divided out after summation.
    """
    li = lineitem.where(F.col("l_shipdate") <= F.lit(cutoff))
    c = cents("l_extendedprice")
    d = pct("l_discount")
    t = pct("l_tax")
    qty = F.round(F.col("l_quantity")).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            (F.sum(c) / 100.0).alias("sum_base_price"),
            (F.sum(c * (100 - d)) / 10000.0).alias("sum_disc_price"),
            (F.sum(c * (100 - d) * (100 + t)) / 1000000.0).alias("sum_charge"),
            F.round(F.sum(qty) / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(c) / 100.0 / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(F.sum(d) / 100.0 / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1998-06-15",
) -> DataFrame:
    """TPC-H Q3 shape: top-10 unshipped orders by revenue.

    customer is a broadcast dim; orders-lineitem shuffles on orderkey.
    """
    rev = F.sum(cents("l_extendedprice") * (100 - pct("l_discount"))) / 10000.0
    return (
        lineitem.where(F.col("l_shipdate") > F.lit(date))
        .join(orders.where(F.col("o_orderdate") < F.lit(date)), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.where(F.col("c_mktsegment") == segment)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", F.col("o_orderdate").cast("date").alias("o_orderdate"), "o_orderpriority")
    )


def q5_local_supplier_volume(
    customer, orders, lineitem, supplier, nation, region, region_name="ASIA",
    date_from="1996-01-01", date_to="1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where customer and supplier
    share the nation. nation/region/supplier broadcast."""
    rev = F.sum(cents("l_extendedprice") * (100 - pct("l_discount"))) / 10000.0
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where((F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to)))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == region_name)), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q6_forecast_revenue(
    lineitem, date_from="1996-01-01", date_to="1997-01-01",
    disc_lo=0.05, disc_hi=0.07, max_qty=24,
) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate pushes
    to the parquet reader."""
    d = pct("l_discount")
    rev = F.sum(cents("l_extendedprice") * d) / 10000.0
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from))
            & (F.col("l_shipdate") < F.lit(date_to))
            & (d >= int(round(disc_lo * 100)))
            & (d <= int(round(disc_hi * 100)))
            & (F.col("l_quantity") < max_qty)
        )
        .agg(rev.alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


def q4_order_priority(
    orders, lineitem, date_from="1996-01-01", date_to="1997-01-01"
) -> DataFrame:
    """TPC-H Q4 shape: order-priority checking via EXISTS — a LEFT SEMI
    join (no fan-out, lineitem dedup is free) with an extra non-equi
    late-shipment condition riding the join."""
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to))
    )
    late = o.join(
        lineitem,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q14_promo_effect(lineitem, part, date_from="1996-01-01", date_to="1996-04-01") -> DataFrame:
    """TPC-H Q14 shape: promo revenue share. part broadcasts; both sums
    run in the exact integer domain, one double division at the end."""
    rev = cents("l_extendedprice") * (100 - pct("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(date_from)) & (F.col("l_shipdate") < F.lit(date_to))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.sum(promo) * 100.0 / F.sum(rev), 6).alias("promo_revenue_pct"),
            (F.sum(rev) / 10000.0).alias("total_revenue"),
        )
    )


def q17_small_quantity_revenue(lineitem, part, brand="Brand#9", frac: float = 0.5) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — per-part average
    quantity aggregated once, joined back, lineitems below frac*avg
    summed. Quantities are small integers so the average is the exact
    ratio of two longs (order-independent); the brand filter prunes the
    part scan before the aggregate's shuffle."""
    p = part.where(F.col("p_brand") == brand)
    qty = F.round(F.col("l_quantity")).cast("long")
    li = lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.sum(qty) / F.count(F.lit(1))).alias("__avg_qty")
    )
    return (
        li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("__pk"))
        .where(F.col("l_quantity") < frac * F.col("__avg_qty"))
        .agg(
            (F.sum(cents("l_extendedprice")) / 100.0 / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q18_large_orders(customer, orders, lineitem, min_qty: int = 250, top_n: int = 10) -> DataFrame:
    """TPC-H Q18 shape: large-volume orders — HAVING on a grouped sum,
    then dim joins and top-k. The lineitem aggregate runs FIRST so the
    expensive joins see only qualifying orderkeys."""
    qty = F.round(F.col("l_quantity")).cast("long")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sum_qty"))
        .where(F.col("sum_qty") > min_qty)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            (cents("o_totalprice") / 100.0).alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(top_n)
    )


def q19_disjunctive_revenue(lineitem, part) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    Catalyst extracts the common l_partkey=p_partkey conjunct so the
    join stays an equi-join (broadcast) with the disjunction as a
    post-join filter — the plan to check in .explain."""
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(11, 20)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(21, 30)
            & F.col("l_quantity").between(20, 40)
        )
    )
    rev = F.sum(cents("l_extendedprice") * (100 - pct("l_discount"))) / 10000.0
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(rev.alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


def q22_global_sales_opportunity(customer, orders, since="2000-01-01") -> DataFrame:
    """TPC-H Q22 shape: above-mean-balance customers with no RECENT
    orders — scalar aggregate as a broadcast cross-join (the SQL scalar
    subquery), then a LEFT ANTI join. The mean is the exact ratio of a
    cents sum and a count, so the comparison is order-independent.

    Fully lazy single plan: the 1-row aggregate is crossJoin-broadcast
    instead of collected with ``.first()`` mid-build — one job instead
    of two, and Catalyst sees the whole tree."""
    pos = customer.where(F.col("c_acctbal") > 0)
    avg_df = pos.agg(
        (F.sum(cents("c_acctbal")) / F.count(F.lit(1))).alias("__avg_cents")
    )
    rich = (
        customer.crossJoin(F.broadcast(avg_df))
        .where(cents("c_acctbal") > F.col("__avg_cents"))
        .drop("__avg_cents")
    )
    recent = orders.where(F.col("o_orderdate") >= F.lit(since))
    no_orders = rich.join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    return (
        no_orders.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            (F.sum(cents("c_acctbal")) / 100.0).alias("total_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


def top_customers(customer, orders, top_n: int = 10) -> DataFrame:
    """Top customers by lifetime spend (broadcast dim join + top-k)."""
    return (
        orders.groupBy("o_custkey")
        .agg(
            (F.sum(cents("o_totalprice")) / 100.0).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spend", "n_orders")
        .orderBy(F.desc("total_spend"), "c_custkey")
        .limit(top_n)
    )


def events_daily(events: DataFrame) -> DataFrame:
    """Per-day, per-type event rollup (the hypertable-rollup shape)."""
    return (
        events.groupBy(
            F.col("ts").cast("date").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(cents("value")) / 100.0 / F.count(F.lit(1)), 6).alias("avg_value"),
        )
        .orderBy("day", "event_type")
    )


def events_props_stats(events: DataFrame) -> DataFrame:
    """Typed JSON property extraction + per-type aggregate.

    ``get_json_object`` stays JVM-side (Jackson) — no Python in the
    path; the average is an exact ratio of two longs."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.round(F.sum(k) / F.count(k), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def events_rollup(events: DataFrame) -> DataFrame:
    """ROLLUP over (day, event_type): per-type, per-day, and grand
    totals in one pass — grouping-sets coverage the reference lacks.
    Partial aggregation applies per grouping set before the shuffle."""
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(
        F.col("value")
    )
    return (
        events.rollup(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(v * 100).cast("long")) / 100.0).alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Gap-based sessionization: one ordered window per user, cumulative
    sum of new-session flags, then per-session rollup. At scale this is
    exactly one shuffle on user_id."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))) / 1000000.0
    new_sess = F.when(F.coalesce(gap > gap_seconds, F.lit(True)), 1).otherwise(0)
    with_sess = events.withColumn(
        "session_id", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            ((F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts"))) / 1000000.0).alias(
                "duration_sec"
            ),
        )
        .orderBy("user_id", "session_id")
    )


def q7_volume_shipping(
    lineitem, orders, customer, supplier, nation,
    nation_a="NATION_1", nation_b="NATION_2",
    date_from="1996-01-01", date_to="1998-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. nation joins twice under different aliases (supplier's
    vs customer's nation); both sides broadcast — the only shuffle is
    the orders-lineitem join plus the final tiny group-by."""
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    rev = F.sum(cents("l_extendedprice") * (100 - pct("l_discount"))) / 10000.0
    pair = (
        (F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b)
    ) | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    return (
        lineitem.where((F.col("l_shipdate") >= F.lit(date_from)) & (F.col("l_shipdate") < F.lit(date_to)))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(rev.alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(
    lineitem, orders, customer, supplier, nation, region,
    target_nation="NATION_5", region_name="ASIA", p_type="ECONOMY", part=None,
    date_from="1996-01-01", date_to="1998-01-01",
) -> DataFrame:
    """TPC-H Q8 shape: target nation's share of revenue, by order year,
    among orders from customers in one region for one part type. The
    share is a ratio of two exact cents sums (order-independent)."""
    rev = cents("l_extendedprice") * (100 - pct("l_discount"))
    nat = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    cust_region = F.broadcast(
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region.where(F.col("r_name") == region_name), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    li = lineitem.join(F.broadcast(part.where(F.col("p_type") == p_type)), F.col("l_partkey") == F.col("p_partkey"))
    return (
        li.join(
            orders.where((F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to))),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat, F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target_nation, rev).otherwise(F.lit(0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share"),
            (F.sum(rev) / 10000.0).alias("total_revenue"),
        )
        .orderBy("o_year")
    )


def q9_product_margin(
    lineitem, orders, supplier, nation, part, name_like="%red%"
) -> DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp table, so profit is gross
    revenue): revenue from parts whose name matches, by supplier nation
    and order year. part filter broadcasts into the lineitem scan."""
    rev = F.sum(cents("l_extendedprice") * (100 - pct("l_discount"))) / 10000.0
    return (
        lineitem.join(
            F.broadcast(part.where(F.col("p_name").like(name_like)).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(rev.alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q10_returned_items(
    customer, orders, lineitem, nation,
    date_from="1996-01-01", date_to="1996-04-01", top_n=20,
) -> DataFrame:
    """TPC-H Q10 shape: top customers by revenue on returned items in a
    quarter. lineitem pre-filtered on returnflag before the join."""
    rev = F.sum(cents("l_extendedprice") * (100 - pct("l_discount"))) / 10000.0
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where((F.col("o_orderdate") >= F.lit(date_from)) & (F.col("o_orderdate") < F.lit(date_to))),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(top_n)
    )


def q12_ship_latency(lineitem, orders, late_days: int = 90) -> DataFrame:
    """TPC-H Q12 shape (adapted: no shipmode/commitdate columns, so
    lateness is shipdate > orderdate + late_days): per order priority,
    late vs on-time line counts. Single fact-fact shuffle, counts only."""
    late = (F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")).cast("long")
    return (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late).alias("late_count"),
            F.sum(F.lit(1) - late).alias("ontime_count"),
        )
        .orderBy("o_orderpriority")
    )


def q13_customer_distribution(customer, orders) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by order count, zero
    included — LEFT OUTER join then two cascaded group-bys. The first
    group-by shuffles on custkey; the histogram group-by is tiny."""
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(
    lineitem, supplier, date_from="1996-01-01", date_to="1996-04-01"
) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving max revenue in a quarter.
    Revenue stays in exact integer cents for the max-equality test, so
    ties are exact; the max is computed once and broadcast back."""
    per_supp = (
        lineitem.where((F.col("l_shipdate") >= F.lit(date_from)) & (F.col("l_shipdate") < F.lit(date_to)))
        .groupBy("l_suppkey")
        .agg(F.sum(cents("l_extendedprice") * (100 - pct("l_discount"))).alias("rev_c"))
    )
    top = per_supp.agg(F.max("rev_c").alias("max_rev_c"))
    return (
        per_supp.join(F.broadcast(top), F.col("rev_c") == F.col("max_rev_c"), "left_semi")
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", (F.col("rev_c") / 10000.0).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


def q20_dominant_part_suppliers(lineitem, supplier, since="2000-01-01") -> DataFrame:
    """TPC-H Q20 shape (adapted: shipped quantities from lineitem, no
    partsupp): suppliers who shipped MORE THAN HALF of some part's
    total volume since a date — the excess-stock/dominant-supplier
    probe. Two-level aggregation: per (part, supplier) sums, then a
    part-total via a window over the already-aggregated (small) frame
    — the raw fact table is scanned and shuffled exactly once. Exact
    integer centi-units for the quantity sums."""
    qsum = (
        lineitem.where(F.col("l_shipdate") >= F.lit(since))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(cents("l_quantity")).alias("__q"))
    )
    total = F.sum("__q").over(Window.partitionBy("l_partkey"))
    dominant = (
        qsum.withColumn("__tot", total)
        .where(F.col("__q") * 2 > F.col("__tot"))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts_dominated"))
    )
    return (
        dominant.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "n_parts_dominated")
        .orderBy(F.desc("n_parts_dominated"), "s_suppkey")
        .limit(20)
    )


def q21_sole_blame_suppliers(lineitem, supplier, top_n: int = 20) -> DataFrame:
    """TPC-H Q21 shape (adapted: 'fault' = returned lines
    l_returnflag = 'R', since there is no receipt/commit date):
    suppliers with returned lines in MULTI-supplier orders where no
    other supplier's lines were returned — Q21's double-correlated
    EXISTS / NOT EXISTS.

    Formulated as ONE per-order min/max aggregate instead of the
    textbook distinct + semi-join + anti-join self-join stack: a
    supplier "waits" for order o exactly when o has >1 distinct
    suppliers (⇔ ``min(supp) != max(supp)``) and the set of suppliers
    with returned lines is exactly {s} (⇔ ``min(ret_supp) ==
    max(ret_supp)`` non-null, s = that value). Four plain min/max
    aggregates stay in whole-stage codegen with full map-side partial
    aggregation — no Expand (countDistinct + collect_set together
    double the fact rows through one), no sets, no 6M-row cache, no
    self-joins. Measured at sf1 (6M lines): EXISTS/NOT-EXISTS join
    stack 9-21s, countDistinct+collect_set 10.5s, this shape ~2s —
    and only the slim partial rows (orderkey + 4 suppkeys) shuffle."""
    ret_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.min("l_suppkey").alias("__mn"),
        F.max("l_suppkey").alias("__mx"),
        F.min(ret_supp).alias("__rmn"),
        F.max(ret_supp).alias("__rmx"),
    )
    sole = per_order.where(
        (F.col("__mn") != F.col("__mx"))
        & F.col("__rmn").isNotNull()
        & (F.col("__rmn") == F.col("__rmx"))
    ).select(F.col("__rmn").alias("l_suppkey"))
    counts = sole.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("numwait")
    )
    return (
        counts.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(top_n)
    )


def q16_parts_supplier_count(
    lineitem, part, exclude_brand="Brand#1", sizes=(1, 5, 10, 15, 20, 25)
) -> DataFrame:
    """TPC-H Q16 shape (adapted: supplier-part relationships come from
    lineitem, there is no partsupp table): distinct supplier count per
    (brand, type, size) over selected sizes. The part filter broadcasts;
    count(distinct) shuffles on the grouping key only."""
    p = part.where((F.col("p_brand") != exclude_brand) & F.col("p_size").isin(*sizes))
    return (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q2_min_cost_supplier(
    lineitem,
    part,
    supplier,
    nation,
    region,
    region_name: str = "EUROPE",
    sizes: tuple = (5, 10, 15, 20),
    type_suffix: str = "STANDARD",
) -> DataFrame:
    """TPC-H Q2 shape (adapted: supply cost is the observed unit price
    sum(extendedprice)/sum(quantity) per (part, supplier) from lineitem,
    since there is no partsupp table): for each part of a given size and
    type, the region's supplier(s) offering the minimum unit cost — the
    correlated-MIN-subquery shape (reference parity: tsod has no SQL
    surface; this covers the driver's TPC-H envelope).

    Plan: part filter broadcasts into the fact scan, the supplier→
    nation→region chain is a broadcast dim snowflake, the per-(part,
    supplier) aggregation shuffles slim keys once, and the correlated
    min is a window over that already-aggregated frame — no second scan
    of lineitem, no join back. Unit cost divides two exact-integer sums
    (cents / centi-units), so the double is bit-identical across
    engines and partial-aggregation orders.
    """
    p = part.where(
        F.col("p_size").isin(*sizes) & (F.col("p_type") == type_suffix)
    ).select("p_partkey", "p_brand", "p_type")
    eligible = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        lineitem.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eligible), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.sum(cents("l_extendedprice")).alias("__price_c"),
            F.sum(cents("l_quantity")).alias("__qty_c"),
        )
        .withColumn("unit_cost", F.col("__price_c") / F.col("__qty_c"))
    )
    min_cost = F.min("unit_cost").over(Window.partitionBy("p_partkey"))
    return (
        costs.withColumn("__min", min_cost)
        .where(F.col("unit_cost") == F.col("__min"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def q11_important_parts(
    lineitem,
    supplier,
    nation,
    nation_name: str = "NATION_3",
    fraction_inv: int = 1000,
) -> DataFrame:
    """TPC-H Q11 shape (adapted: part value is shipped revenue
    extendedprice*(1-discount) for the nation's suppliers, since there
    is no partsupp stock valuation): parts whose value exceeds
    1/fraction_inv of the nation's total — the HAVING-over-scalar-
    subquery shape.

    Plan: one scan of lineitem filtered through the broadcast
    supplier-in-nation dim; per-part exact-integer revenue shuffles
    once; the grand total is a broadcast scalar crossJoin over the
    SAME aggregated frame (lazy, no driver .first()), and the
    threshold compare stays in the integer domain: value_c *
    fraction_inv > total_c — no float drift at any scale, and the
    multiplier sits on the (small) per-part side so int64 headroom
    holds even when the grand total nears 2^53.
    """
    nat_supp = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    rev_c = F.sum(
        cents("l_extendedprice") * (100 - pct("l_discount"))
    ).alias("__rev_c")
    per_part = (
        lineitem.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(rev_c)
    )
    total = per_part.agg(F.sum("__rev_c").alias("__tot_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("__rev_c") * F.lit(fraction_inv) > F.col("__tot_c"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("__rev_c") / 10000.0).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )
