"""Frequent-pattern mining: bounded-state heavy hitters and
market-basket co-occurrence rules.

The 100 TB problem these solve: "which items are frequent" over a key
space too large to hash-aggregate comfortably (every distinct n-gram of
a web corpus), and "which item pairs co-occur" without materializing
per-user baskets.  Both stay exact:

- :func:`heavy_hitters` is the classic TWO-PASS exact algorithm —
  pass 1 runs a Misra-Gries summary with a hard O(k) state bound per
  partition (no spill, no hash table proportional to the vocabulary)
  whose merge guarantee proves every item above the support threshold
  survives as a candidate; pass 2 re-counts ONLY the candidates
  (broadcast semi-join) so the final counts are exact.  A plain
  ``groupBy(item).count()`` is also scalable but carries per-task
  state proportional to distinct-items-per-task and spills on wide
  vocabularies; the MG pass never allocates beyond ``k`` counters.
- :func:`cooccurrence_rules` reduces the fact table once to distinct
  (id, item) pairs; every metric after that computes on frames of size
  O(#items^2), which for catalog-sized item domains is driver-trivial.

Reference scope note: the reference library (reference tsod/, a
613-LoC pandas time-series anomaly package) has no frequent-pattern
surface; these operators are part of this engine's beyond-reference
LLM-corpus tooling, with DuckDB-oracled exact semantics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..util import round_half_away6, tracked_cache


def mg_fold(cnt: dict, batch_counts: dict, k: int) -> dict:
    """Fold one batch's value counts into a Misra-Gries summary and
    compress back to at most ``k`` counters (subtract the (k+1)-th
    largest count, drop non-positives) — the mergeable-summaries merge
    step.  Pure function so the MG invariants are property-testable
    against exact counting without a Spark session."""
    for it, c in batch_counts.items():
        cnt[it] = cnt.get(it, 0) + int(c)
    if len(cnt) > k:
        sub = sorted(cnt.values(), reverse=True)[k]
        cnt = {it: c - sub for it, c in cnt.items() if c > sub}
    return cnt


def misra_gries_partials(
    items: DataFrame, item_col: str = "item", k: int = 1024
) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries with a HARD ``k``
    counter bound, plus one sentinel row (``item IS NULL``) per
    partition carrying the exact partition row count.

    Implementation is the mergeable-summaries formulation (Agarwal et
    al., PODS'12): fold each Arrow batch's value counts into the
    summary, then compress back to ``k`` counters by subtracting the
    (k+1)-th largest count and dropping non-positives.  Each compress
    that subtracts ``s`` removes at least ``(k+1)*s`` total mass, so
    the cumulative subtraction within a partition of ``n_p`` rows is at
    most ``n_p/(k+1)`` — the classic MG error bound.  Consequences:

    - a stored count is a LOWER bound on the item's true partition
      count, never more than ``n_p/(k+1)`` below it;
    - an item absent from the summary has true partition count at most
      ``n_p/(k+1)``; summed over partitions, an item absent from EVERY
      summary has global count at most ``N/(k+1)`` — so for any
      support threshold ``phi > 1/(k+1)`` the union of partition
      summaries contains every true heavy hitter (no false negatives).

    The items column explodes/projects JVM-side before the Arrow
    transfer ships ONE string column to the Python worker; the worker
    holds at most ``k + batch_vocab`` counters at any moment.
    """

    def mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cnt: dict = {}
        rows = 0
        for pdf in batches:
            col = pdf[item_col].dropna()
            rows += len(col)
            cnt = mg_fold(cnt, col.value_counts().to_dict(), k)
        out = list(cnt.items())
        yield pd.DataFrame(
            {
                item_col: [it for it, _ in out] + [None],
                "mg_count": [c for _, c in out] + [rows],
            }
        )

    return items.select(F.col(item_col).alias(item_col)).mapInPandas(
        mg, f"{item_col} string, mg_count long"
    )


def heavy_hitters(
    items: DataFrame,
    item_col: str = "item",
    k: int = 1024,
    phi: float = 0.0012,
    count_col: str = "cnt",
    support_col: str = "support",
) -> DataFrame:
    """EXACT heavy hitters — every distinct ``item_col`` value with
    frequency ``>= ceil(phi * N)`` — via the two-pass bounded-state
    algorithm (requires ``phi > 1/(k+1)`` for the pass-1 guarantee).

    Pass 1 (:func:`misra_gries_partials`) produces at most ``k`` rows
    per partition; candidates are their distinct items (a tiny shuffle
    of ``<= k * partitions`` rows) and the exact global row count
    ``N`` comes free from the sentinel rows — the item stream is never
    re-counted.  Pass 2 re-scans the items, keeps candidate rows via a
    BROADCAST left-semi join (the candidate set is small by
    construction, so the fact stream never shuffles on item before the
    final per-candidate aggregate), counts exactly, and applies the
    threshold.  Output is deterministic and oracle-equivalent to the
    plain ``GROUP BY item HAVING count >= ceil(phi*N)`` it replaces.
    """
    if not phi > 1.0 / (k + 1):
        raise ValueError(
            f"phi={phi} must exceed 1/(k+1)={1.0 / (k + 1):.6g} for the "
            "Misra-Gries no-false-negative guarantee; raise k or phi"
        )
    partials = tracked_cache(misra_gries_partials(items, item_col, k))
    cands = partials.where(F.col(item_col).isNotNull()).select(item_col).distinct()
    total = partials.where(F.col(item_col).isNull()).agg(
        F.sum("mg_count").alias("__n")
    )
    exact = (
        items.join(F.broadcast(cands), item_col, "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).cast("long").alias(count_col))
    )
    out = (
        exact.crossJoin(F.broadcast(total))
        .where(
            F.col(count_col)
            >= F.ceil(F.lit(phi) * F.col("__n").cast("double")).cast("long")
        )
        .select(
            item_col,
            count_col,
            round_half_away6(
                F.col(count_col).cast("double") / F.col("__n").cast("double")
            ).alias(support_col),
        )
    )
    return out.orderBy(F.col(count_col).desc(), item_col)


def cooccurrence_rules(
    events: DataFrame,
    id_col: str = "user_id",
    item_col: str = "event_type",
) -> DataFrame:
    """Market-basket association rules over (id, item) co-occurrence:
    for every unordered item pair ``(a < b)``, the number of ids
    holding both, pair support, both directional confidences, and
    lift — all exact.

    Shuffle shape for 100 TB: the fact table reduces ONCE to distinct
    ``(id, item)`` (map-side-combinable); the pair self-join runs on
    that reduced frame keyed by id (each id contributes
    ``choose(items_held, 2)`` rows — bounded by the item-domain size,
    not the event count); every frame after the pair aggregate has
    O(#items^2) rows.  Per-item counts and the id total are broadcast.
    Ratios are single double divisions over exact int64 counts
    (numerator products stay in int64), so values are
    engine-deterministic.
    """
    d = tracked_cache(events.select(id_col, item_col).distinct())
    n = d.groupBy(item_col).agg(F.count(F.lit(1)).cast("long").alias("__c"))
    u = d.agg(F.count_distinct(id_col).cast("long").alias("__u"))
    da, db = d.alias("da"), d.alias("db")
    pairs = (
        da.join(
            db,
            (F.col(f"da.{id_col}") == F.col(f"db.{id_col}"))
            & (F.col(f"da.{item_col}") < F.col(f"db.{item_col}")),
        )
        .groupBy(
            F.col(f"da.{item_col}").alias("type_a"),
            F.col(f"db.{item_col}").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__s"))
    )
    na, nb = n.alias("na"), n.alias("nb")
    grid = (
        na.join(nb, F.col(f"na.{item_col}") < F.col(f"nb.{item_col}"))
        .select(
            F.col(f"na.{item_col}").alias("type_a"),
            F.col(f"nb.{item_col}").alias("type_b"),
            F.col("na.__c").alias("__na"),
            F.col("nb.__c").alias("__nb"),
        )
        .join(F.broadcast(pairs), ["type_a", "type_b"], "left")
        .withColumn("__s", F.coalesce(F.col("__s"), F.lit(0).cast("long")))
        .crossJoin(F.broadcast(u))
    )
    dbl = lambda c: c.cast("double")  # noqa: E731
    return grid.select(
        "type_a",
        "type_b",
        F.col("__s").alias("pair_users"),
        round_half_away6(dbl(F.col("__s")) / dbl(F.col("__u"))).alias("support_pair"),
        round_half_away6(dbl(F.col("__s")) / dbl(F.col("__na"))).alias("conf_a_to_b"),
        round_half_away6(dbl(F.col("__s")) / dbl(F.col("__nb"))).alias("conf_b_to_a"),
        round_half_away6(
            dbl(F.col("__s") * F.col("__u")) / dbl(F.col("__na") * F.col("__nb"))
        ).alias("lift"),
    ).orderBy("type_a", "type_b")
