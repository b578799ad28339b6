"""Window-ranking / set-operation / grouping OLAP shapes.

The reference has no ranking, set, or grouping-set surface at all
(SURVEY §2.4); these are north-star additions covering the window
function families an analytics engine is expected to provide: running
and time-range sliding aggregates, ranking (row_number / rank /
ntile / percent_rank), lag-over-aggregate (month-over-month), CUBE
grouping sets, and INTERSECT.

Money stays in exact integer cents through every sum (see
``tpch.cents``) so results are bit-identical across engines and
partial-aggregation orders.

Scale notes per shape are in the docstrings; the one deliberate
exception is global ranking (ntile over all customers), which is a
single-reducer operation by definition — its input is a *pre-aggregated*
per-customer rollup, orders of magnitude smaller than the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .tpch import cents


def running_total(events: DataFrame) -> DataFrame:
    """Per-user cumulative value over time: the running-aggregate shape.

    One shuffle on user_id; the frame is ROWS UNBOUNDED PRECEDING so
    the aggregate is O(1) per row in Spark's window executor."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(F.col("value"))
    return events.select(
        "event_id",
        "user_id",
        (F.sum(F.round(v * 100).cast("long")).over(w) / 100.0).alias("running_sum"),
    )


def sliding_time_avg(events: DataFrame, window_sec: int = 3600) -> DataFrame:
    """Per-user sliding aggregate over a TIME-RANGE frame (last hour),
    not a row-count frame — the one window family rowsBetween can't
    express. Ordering on unix microseconds makes rangeBetween exact and
    keeps tie (peer-row) semantics identical to SQL RANGE frames."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-window_sec * 1_000_000, 0)
    )
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(F.col("value"))
    vc = F.round(v * 100).cast("long")
    return events.select(
        "event_id",
        F.count(vc).over(w).alias("n_window"),
        F.round(F.sum(vc).over(w) / 100.0 / F.count(vc).over(w), 6).alias("avg_window"),
    )


def customer_spend_quartiles(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Global ntile(4) over per-customer lifetime spend.

    The unpartitioned window is single-reducer BY DEFINITION (a global
    ranking); it runs over the grouped per-customer rollup (|customers|
    rows), never the raw orders."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(cents("o_totalprice")).alias("spend_c")
    )
    w = Window.orderBy(F.desc("spend_c"), "o_custkey")
    return (
        per_cust.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            (F.col("spend_c") / 100.0).alias("total_spend"),
            F.ntile(4).over(w).cast("long").alias("spend_quartile"),
        )
    )


def top_parts_per_brand(lineitem: DataFrame, part: DataFrame, top_n: int = 3) -> DataFrame:
    """Top-N per group via row_number over a partitioned ranking window —
    the grouped-top-k shape. The revenue rollup shuffles on
    (brand, partkey); the ranking window then shuffles only the small
    aggregate on brand."""
    rev_c = F.sum(cents("l_extendedprice") * (100 - F.round(F.col("l_discount") * 100).cast("long")))
    per_part = (
        lineitem.join(F.broadcast(part.select("p_partkey", "p_brand")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(rev_c.alias("rev_c"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("rev_c"), "p_partkey")
    return (
        per_part.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= top_n)
        .select("p_brand", "p_partkey", (F.col("rev_c") / 10000.0).alias("revenue"), "rn")
    )


def monthly_revenue_momentum(orders: DataFrame) -> DataFrame:
    """Month-over-month revenue: lag over an aggregated time series.

    Aggregate first (tiny result), window second — the lag window is a
    single partition over |months| rows, which is the correct plan: the
    single-reducer stage sees dozens of rows, not the fact table."""
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(F.sum(cents("o_totalprice")).alias("rev_c"))
    w = Window.orderBy("month")
    prev = F.lag("rev_c").over(w)
    return monthly.select(
        "month",
        (F.col("rev_c") / 100.0).alias("revenue"),
        (prev / 100.0).alias("prev_revenue"),
        F.round((F.col("rev_c") - prev) * 1.0 / prev, 6).alias("mom_pct"),
    )


def events_cube(events: DataFrame) -> DataFrame:
    """CUBE over (event_type, month): all four grouping sets in one
    pass — the grouping-sets family beyond events_rollup's ROLLUP.
    Partial aggregation applies per grouping set before the shuffle."""
    v = F.when(F.isnan("value") | F.col("value").isNull(), None).otherwise(F.col("value"))
    return (
        events.cube(
            "event_type", F.date_trunc("month", F.col("ts")).cast("date").alias("month")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(v * 100).cast("long")) / 100.0).alias("sum_value"),
        )
    )


def users_purchase_and_error(events: DataFrame) -> DataFrame:
    """INTERSECT set operation: users with BOTH a purchase and an error.

    Spark plans INTERSECT as a left-semi aggregate join on the distinct
    keys — no fact-table fan-out."""
    purchasers = events.where(F.col("event_type") == "purchase").select("user_id")
    erroring = events.where(F.col("event_type") == "error").select("user_id")
    return purchasers.intersect(erroring)


def supplier_balance_rank(supplier: DataFrame, nation: DataFrame) -> DataFrame:
    """Partitioned rank + percent_rank: suppliers by account balance
    within nation. The ranking window shuffles on nationkey — fully
    parallel across nations (the scale-correct ranking shape, vs the
    global quartile query's deliberate single reducer)."""
    w = Window.partitionBy("n_name").orderBy(F.desc(cents("s_acctbal")), F.col("s_suppkey"))
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "s_suppkey",
            "n_name",
            F.col("s_acctbal"),
            F.rank().over(w).cast("long").alias("bal_rank"),
            F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        )
    )


def funnel(events: DataFrame, steps=("view", "click", "purchase")) -> DataFrame:
    """Ordered conversion funnel: per user, step k counts only when it
    occurs at-or-after that user's qualified step k-1 — the sequential-
    pattern shape (NOT the set-intersection of users_purchase_and_error:
    order matters here).

    Plan: ONE shuffle. All step qualifications are running-min windows
    over the same (user, ts, event_id) ordering, then a per-user
    aggregate on the identical partitioning — Catalyst chains the
    windows and the final groupBy without a second exchange. No self
    joins, no per-step pass over the 100 TB fact.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events
    qual_cols = []
    prev = None
    for i, step in enumerate(steps):
        is_step = F.col("event_type") == step
        if prev is None:
            q = F.when(is_step, F.col("ts"))
        else:
            seen_prev = F.min(prev).over(w)
            q = F.when(
                is_step & seen_prev.isNotNull() & (F.col("ts") >= seen_prev),
                F.col("ts"),
            )
        name = f"__q{i}"
        df = df.withColumn(name, q)
        qual_cols.append(name)
        prev = F.col(name)
    per_user = df.groupBy("user_id").agg(
        *[F.min(c).alias(f"__t{i}") for i, c in enumerate(qual_cols)]
    )
    counts = per_user.agg(
        *[
            F.count(f"__t{i}").cast("long").alias(f"n_{s}")
            for i, s in enumerate(steps)
        ]
    )
    ratio_cols = []
    for i, s in enumerate(steps[1:], start=1):
        ratio_cols.append(
            F.round(
                F.col(f"n_{s}") / F.col(f"n_{steps[i - 1]}"), 6
            ).alias(f"conv_{steps[i - 1]}_to_{s}")
        )
    return counts.select("*", *ratio_cols)


def retention_cohorts(events: DataFrame) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-activity week,
    tracked by distinct-active count at each week offset, with the
    retention ratio against the cohort's week-0 size.

    Plan: the 100 TB fact shuffles ONCE — a single per-user aggregate
    computes the first-seen week AND the distinct active-week set
    (collect_set is bounded by the corpus duration in weeks), which
    explodes shuffle-free into unique (user, week) rows, so the
    per-offset distinct-user count is a plain count. The naive
    cohort-agg + distinct + join formulation shuffles the fact three
    times. The final (cohort, offset) aggregate and the first_value
    window run over the tiny rollup. Weeks are date_trunc Mondays in
    both engines, so offsets are exact integers.
    """
    per_user = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week"),
        F.collect_set(F.date_trunc("week", F.col("ts"))).alias("__weeks"),
    )
    rolled = (
        per_user.select(
            "user_id", "cohort_week", F.explode("__weeks").alias("week")
        )
        .withColumn(
            "week_offset",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        # rows are unique (user, week) after the per-user explode, so
        # a plain count IS the distinct-user count
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    w0 = Window.partitionBy("cohort_week").orderBy("week_offset")
    return rolled.select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(
            F.col("n_active") / F.first("n_active").over(w0), 6
        ).alias("retention"),
    )


def profile_table(df: DataFrame, columns=None) -> DataFrame:
    """Data profiling (the ``ANALYZE TABLE`` a 100 TB ingest runs
    before anything else): per column, row count, null count, exact
    distinct count, and min/max rendered as strings so mixed column
    types stack into one long-format frame.

    Shape (r14, guide §2.2/§5): one two-level aggregation branch PER
    COLUMN, unioned — NOT one agg with N ``count_distinct``. The
    multi-distinct form Expands the scan N+1-fold and sorts the
    expanded rows twice on wide all-column keys (SortAggregate —
    string mins force sort-based buffers); at 100 TB that is N+1
    copies of the table through a sort. Here each branch groups by its
    own value (map-side partial HashAggregate reduces to the distinct
    values before the exchange — the ONLY rows shuffled), then folds
    the tiny distinct frame into the five metrics. With columnar
    parquet the per-branch scans read each column exactly once — the
    same total I/O as the one-scan form — and every branch is
    independently parallel within the single union job. Values are
    identical: count/sum over grouped counts == row-level count/sum,
    min/max over distinct values == over rows (computed on the NATIVE
    type, cast to string after), count(value) == count_distinct.

    INPUT ASSUMPTION (ADVICE r14): the same-total-I/O argument holds
    for COLUMNAR file scans (parquet/ORC), where each branch's scan
    prunes to its one column. A row-oriented or computed input
    (CSV/JDBC ingest profiling, an uncached derived frame) is
    re-evaluated once per column here where the old multi-distinct
    Expand read it once — ``.cache()`` such an input before profiling,
    or accept N passes.
    """
    columns = list(columns or df.columns)
    branches = []
    for c in columns:
        g = (
            df.select(F.col(c).alias("__v"))
            .groupBy("__v")
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        branches.append(
            g.agg(
                F.coalesce(F.sum("__cnt"), F.lit(0))
                .cast("long")
                .alias("n_rows"),
                F.sum(
                    F.when(F.col("__v").isNull(), F.col("__cnt")).otherwise(
                        F.lit(0)
                    )
                )
                .cast("long")
                .alias("n_null"),
                F.count("__v").alias("n_distinct"),
                F.min("__v").cast("string").alias("min_value"),
                F.max("__v").cast("string").alias("max_value"),
            ).select(
                F.lit(c).alias("col_name"),
                "n_rows",
                "n_null",
                "n_distinct",
                "min_value",
                "max_value",
            )
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def histogram_drift(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "value",
    keys=("event_type",),
    bin_width: float = 10.0,
) -> DataFrame:
    """Distribution drift between two snapshots of the same table —
    the monitoring pass a continuously-ingested corpus runs per tick.

    Per key: fixed-width histograms of both sides and the L1 distance
    between the normalized histograms (total-variation x2), computed
    ENTIRELY in exact integer space — ``sum |n_a*T_b - n_b*T_a|``
    over bins (longs, order-independent) divided once by ``T_a*T_b``
    — so the score is engine-deterministic (summing per-bin float
    proportions would depend on summation order; log-space PSI would
    additionally depend on the libm). Each side is one grouped count;
    the bin join is on (keys, bin) — tiny frames, the raw tables are
    scanned once.
    """
    keys = list(keys)

    def hist(df, side):
        v = F.when(F.isnan(value_col) | F.col(value_col).isNull(), None).otherwise(
            F.col(value_col)
        )
        return (
            df.withColumn("__bin", F.floor(v / bin_width).cast("long"))
            .where(F.col("__bin").isNotNull())
            .groupBy(*keys, "__bin")
            .agg(F.count(F.lit(1)).cast("long").alias(f"n_{side}"))
        )

    ha, hb = hist(a, "a"), hist(b, "b")
    joined = ha.join(hb, [*keys, "__bin"], "full").fillna(
        0, subset=["n_a", "n_b"]
    )
    w = Window.partitionBy(*keys)
    joined = joined.withColumn("__ta", F.sum("n_a").over(w)).withColumn(
        "__tb", F.sum("n_b").over(w)
    )
    cross = F.abs(F.col("n_a") * F.col("__tb") - F.col("n_b") * F.col("__ta"))
    return (
        joined.withColumn("__ci", cross)
        .groupBy(*keys)
        .agg(
            F.sum("n_a").cast("long").alias("n_a"),
            F.sum("n_b").cast("long").alias("n_b"),
            F.round(
                F.sum("__ci") / (F.max("__ta") * F.max("__tb")), 6
            ).alias("l1_drift"),
        )
    )


def scd2_intervals(
    df: DataFrame,
    keys=("user_id",),
    ts_col: str = "ts",
    tiebreak=("event_id",),
) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: turn a change log into
    validity intervals — each record is valid from its own timestamp
    until the key's next change (NULL ``valid_to`` = current record).
    With :func:`latest_by_key` (compaction) and the point-in-time
    snapshot query this completes the bitemporal read family. One
    keyed window shuffle; the interval table joins back to facts via
    the bucketized range join at scale."""
    w = Window.partitionBy(*keys).orderBy(ts_col, *tiebreak)
    return df.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys=("user_id",),
    compare_cols=("value",),
) -> DataFrame:
    """Snapshot diff: classify every key as added / removed / changed
    between two table versions (the audit step behind incremental
    loads, day-over-day partition reconciliation, and CDC replay
    validation). Unchanged keys are dropped — at 100 TB the diff
    output is proportional to the churn, not the table.

    One full-outer shuffle on the key columns (zero-Exchange when both
    snapshots are bucketed on the key, same as test_bucketed's joins);
    comparison is null-safe per column, so NULL->value and
    value->NULL edits count as changes.
    """
    kl = list(keys)
    o = old.select(
        *kl,
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *kl,
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, kl, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(~same, "changed")
        .otherwise("unchanged")
    )
    return (
        j.withColumn("status", status)
        .where(F.col("status") != "unchanged")
        .drop("__in_old", "__in_new")
    )


def latest_by_key(
    df: DataFrame,
    keys=("user_id",),
    ts_col: str = "ts",
    tiebreak=("event_id",),
) -> DataFrame:
    """CDC/upsert compaction: the LATEST record per key by event time
    (greatest ``ts``, ties broken by the highest ``tiebreak`` — arrival
    order). The keep-last step of every merge-on-read ingestion
    pipeline; at scale this is ONE hash-partitioned window shuffle and
    the map-side-combinable alternative (``max_by`` on a packed
    struct) shares the same exchange, so the window form is the
    simplest plan that is also the right one.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys=("user_id",),
    ts_col: str = "ts",
    tiebreak=("event_id",),
) -> DataFrame:
    """Batch MERGE: apply an update batch onto a target table —
    update-wins per key (the latest update row replaces the target
    row; unmatched updates insert; unmatched target rows carry over).
    The batch twin of a lakehouse ``MERGE INTO`` whose ON clause is
    the key equality, with last-writer-wins among duplicate update
    rows.

    Plan: compact the update batch to one row per key
    (:func:`latest_by_key` — one window shuffle of the SMALL side),
    then a single full-outer join on the key, coalescing update
    columns over target columns. The target shuffles once on the same
    key it would be bucketed/partitioned by at rest — with bucketed
    storage the join is exchange-free on the big side (see
    sources/bucketed.py).
    """
    keys = list(keys)
    payload = [c for c in target.columns if c not in keys]
    latest = latest_by_key(updates, keys, ts_col, tiebreak)
    u = latest.select(
        *keys, *[F.col(c).alias(f"__u_{c}") for c in payload]
    ).withColumn("__has_u", F.lit(True))
    merged = target.join(u, keys, "full_outer")
    return merged.select(
        *keys,
        *[
            F.when(F.coalesce(F.col("__has_u"), F.lit(False)), F.col(f"__u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in payload
        ],
    )


def dq_checks(
    df: DataFrame,
    completeness=("value",),
    unique=("event_id",),
    bounds: dict | None = None,
    min_rows: int = 1,
) -> DataFrame:
    """Deequ-style declarative data-quality suite in ONE aggregation
    pass: row count, per-column completeness (non-null fraction),
    key uniqueness (distinct/total), and value-bound conformance,
    each emitted as ``(check, metric, passed)`` rows.

    Everything is exact integer counting divided once at the end —
    no sampling, no sketches — and the whole suite is a single
    grouped-less aggregate, so at 100 TB it costs one scan with
    map-side partial aggregation and a 1-row shuffle. Constraint
    thresholds are plain literals, so the pass booleans are
    hash-stable.
    """
    bounds = bounds or {}
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")]
    checks = []  # (name, metric expr over agg row, threshold expr)
    for c in completeness:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        checks.append(
            (
                f"completeness({c})",
                F.col(f"__nn_{c}") / F.col("__n"),
                F.col(f"__nn_{c}") == F.col("__n"),
            )
        )
    for c in unique:
        aggs.append(F.count_distinct(F.col(c)).alias(f"__d_{c}"))
        checks.append(
            (
                f"uniqueness({c})",
                F.col(f"__d_{c}") / F.col("__n"),
                F.col(f"__d_{c}") == F.col("__n"),
            )
        )
    for c, (lo, hi) in bounds.items():
        ok = F.col(c).between(F.lit(lo), F.lit(hi))
        aggs.append(
            F.sum(F.coalesce(ok.cast("long"), F.lit(0))).alias(f"__b_{c}")
        )
        checks.append(
            (
                f"bounds({c})",
                F.col(f"__b_{c}") / F.col("__n"),
                F.col(f"__b_{c}") == F.col("__n"),
            )
        )
    agg = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit("row_count").alias("check"),
            F.col("__n").cast("double").alias("metric"),
            (F.col("__n") >= min_rows).alias("passed"),
        )
    ] + [
        F.struct(
            F.lit(name).alias("check"),
            F.round(metric, 6).alias("metric"),
            passed.alias("passed"),
        )
        for name, metric, passed in checks
    ]
    return agg.select(
        F.explode(F.array(*rows)).alias("r")
    ).select("r.check", "r.metric", "r.passed")


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Foreign-key conformance: fraction of child rows whose key exists
    in the parent, as one lazy ``(check, metric, passed)`` row — a
    single plan (no driver-side counts): broadcast the distinct parent
    keys (a dim table), LEFT join, count hits map-side."""
    pk = (
        parent.select(F.col(parent_key).alias(child_key))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    agg = (
        child.select(child_key)
        .join(F.broadcast(pk), child_key, "left")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("__ok"),
        )
    )
    return agg.select(
        F.lit(f"fk({child_key}->{parent_key})").alias("check"),
        F.round(F.col("__ok") / F.col("__n"), 6).alias("metric"),
        (F.col("__ok") == F.col("__n")).alias("passed"),
    )
