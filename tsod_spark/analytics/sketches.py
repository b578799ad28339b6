"""Mergeable Datasketches operators — the single-pass sketch paths a
100 TB deployment runs where exact computation would sort or join the
whole fact table.

Spark 4 ships Apache Datasketches aggregates (KLL quantiles, theta /
HLL cardinality) as first-class SQL functions — partial sketches merge
map-side like any other aggregate buffer, so one scan produces
quantiles / overlap estimates with bounded error and O(k) state per
group, no matter the row count. The registry queries pair each sketch
with the exact computation at test scale and emit CERTIFICATE booleans
(the exact+certificate twin scheme proven on the r4/r5 sketches), so
even these engine-specific estimates hash-match a DuckDB oracle.

Reference scope note: the reference library computes exact pandas
quantiles only (reference tsod/detectors.py quantile usage); sketches
are part of this engine's beyond-reference scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kll_quantiles(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    probs: tuple[float, ...] = (0.5, 0.95, 0.99),
    eps: float = 0.05,
    with_exact: bool = True,
) -> DataFrame:
    """Per-group quantiles from a mergeable KLL sketch, with an
    in-plan rank certificate.

    The 100 TB shape: ``kll_sketch_agg_double`` is ONE map-side-
    combinable aggregate — each task folds its rows into an O(k)
    sketch buffer and only buffers merge at the exchange, vs the exact
    ``percentile`` which materializes and sorts every group's values.
    Default k=200 bounds rank error at ~1.65% (Datasketches KLL
    guarantee at 99% confidence).

    Certificate (``with_exact=True``, the registry/test configuration):
    the sketch estimate for rank ``p`` must lie within the exact
    ``[p - eps, p + eps]`` quantile band, all computed in the SAME
    aggregate pass — no second scan, no join. ``with_exact=False`` is
    the production projection (sketch columns only).
    """
    sk = F.kll_sketch_agg_double(value_col)
    if not with_exact:
        agg = events.groupBy(group_col).agg(sk.alias("__sk"))
        return agg.select(
            group_col,
            *[
                F.kll_sketch_get_quantile_double("__sk", F.lit(p)).alias(
                    f"kll_p{int(p * 100)}"
                )
                for p in probs
            ],
        ).orderBy(group_col)

    exact_cols = []
    for p in probs:
        exact_cols += [
            F.percentile(F.col(value_col), F.lit(p)).alias(f"__x{int(p * 100)}"),
            F.percentile(F.col(value_col), F.lit(max(0.0, p - eps))).alias(
                f"__lo{int(p * 100)}"
            ),
            F.percentile(F.col(value_col), F.lit(min(1.0, p + eps))).alias(
                f"__hi{int(p * 100)}"
            ),
        ]
    agg = events.groupBy(group_col).agg(sk.alias("__sk"), *exact_cols)
    out = [F.col(group_col)]
    for p in probs:
        t = int(p * 100)
        est = F.kll_sketch_get_quantile_double("__sk", F.lit(p))
        out.append(F.round(F.col(f"__x{t}"), 6).alias(f"exact_p{t}"))
        out.append(
            ((est >= F.col(f"__lo{t}")) & (est <= F.col(f"__hi{t}"))).alias(
                f"kll_p{t}_in_band"
            )
        )
    return agg.select(*out).orderBy(group_col)


def theta_set_ops(
    events: DataFrame,
    group_col: str = "event_type",
    id_col: str = "user_id",
    rel_tol: float = 0.10,
    abs_tol: float = 5.0,
) -> DataFrame:
    """Full distinct-set algebra for every unordered group pair —
    ``|A \\ B|``, ``|B \\ A|``, and ``|A ∩ B|`` — estimated from
    mergeable THETA sketches and certified against the exact values.

    Where :func:`hll_audience_overlap` can only reach the intersection
    via inclusion-exclusion (HLL supports union alone), theta sketches
    keep the sampled hash SET, so ``theta_difference`` /
    ``theta_intersection`` are first-class — the operations an
    audience / A-B cohort analysis actually asks for ("users who
    clicked but never purchased").

    The 100 TB shape mirrors the HLL query: per-group sketches build
    in ONE map-side-combinable scan (default lgNomEntries=12 -> at
    most 4096 retained hashes per group); all pairwise set algebra
    runs on the tiny per-group sketch table.  The exact leg reduces to
    distinct (group, id) once, takes per-group counts plus the pair
    intersection, and derives both differences arithmetically
    (``|A \\ B| = |A| - |A ∩ B|``) — no second fact scan.

    Certificate per estimate: ``|est - exact| <= max(abs_tol,
    rel_tol * exact)``.  Below ~4096 distinct ids per group the theta
    sketch is in exact (sampling-free) mode, so at test scale the
    certificates are deterministic; at production cardinalities the
    relative error is ~1.6% rsd.
    """
    sketches = (
        events.groupBy(group_col)
        .agg(F.theta_sketch_agg(id_col).alias("__sk"))
        .cache()
    )
    a, b = sketches.alias("a"), sketches.alias("b")
    est = a.join(b, F.col(f"a.{group_col}") < F.col(f"b.{group_col}")).select(
        F.col(f"a.{group_col}").alias("type_a"),
        F.col(f"b.{group_col}").alias("type_b"),
        F.theta_sketch_estimate(F.theta_difference("a.__sk", "b.__sk")).alias(
            "__e_ab"
        ),
        F.theta_sketch_estimate(F.theta_difference("b.__sk", "a.__sk")).alias(
            "__e_ba"
        ),
        F.theta_sketch_estimate(F.theta_intersection("a.__sk", "b.__sk")).alias(
            "__e_i"
        ),
    )
    d = events.select(group_col, id_col).distinct().cache()
    n = d.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("__n"))
    da, db = d.alias("da"), d.alias("db")
    inter = (
        da.join(
            db,
            (F.col(f"da.{id_col}") == F.col(f"db.{id_col}"))
            & (F.col(f"da.{group_col}") < F.col(f"db.{group_col}")),
        )
        .groupBy(
            F.col(f"da.{group_col}").alias("type_a"),
            F.col(f"db.{group_col}").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("__i"))
    )
    na, nb = n.alias("na"), n.alias("nb")
    exact = (
        na.join(nb, F.col(f"na.{group_col}") < F.col(f"nb.{group_col}"))
        .select(
            F.col(f"na.{group_col}").alias("type_a"),
            F.col(f"nb.{group_col}").alias("type_b"),
            F.col("na.__n").alias("__na"),
            F.col("nb.__n").alias("__nb"),
        )
        .join(F.broadcast(inter), ["type_a", "type_b"], "left")
        .withColumn("__i", F.coalesce(F.col("__i"), F.lit(0).cast("long")))
    )

    def cert(est_col, exact_col):
        tol = F.greatest(F.lit(abs_tol), F.lit(rel_tol) * exact_col.cast("double"))
        return F.coalesce(
            F.abs(F.col(est_col) - exact_col.cast("double")) <= tol, F.lit(False)
        )

    ab = F.col("__na") - F.col("__i")
    ba = F.col("__nb") - F.col("__i")
    return (
        exact.join(F.broadcast(est), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            ab.cast("long").alias("exact_a_not_b"),
            ba.cast("long").alias("exact_b_not_a"),
            F.col("__i").alias("exact_intersect"),
            cert("__e_ab", ab).alias("a_not_b_within_tol"),
            cert("__e_ba", ba).alias("b_not_a_within_tol"),
            cert("__e_i", F.col("__i")).alias("intersect_within_tol"),
        )
        .orderBy("type_a", "type_b")
    )


def hll_audience_overlap(
    events: DataFrame,
    group_col: str = "event_type",
    id_col: str = "user_id",
    rel_tol: float = 0.10,
    abs_tol: float = 5.0,
) -> DataFrame:
    """Pairwise audience overlap (distinct ``id_col`` present in BOTH
    groups) for every unordered group pair, estimated from mergeable
    HLL sketches via inclusion-exclusion, certified against the exact
    intersection.

    The 100 TB shape: per-group HLL sketches build in ONE scan of the
    fact table (map-side-combinable aggregate, O(2^lgK) state per
    group); every pairwise overlap then computes on the TINY per-group
    sketch table (G rows -> G^2/2 pairs of sketch merges) —
    ``|A ∩ B| = est(A) + est(B) - est(A ∪ B)`` with ``hll_union``.
    The exact intersection the certificate compares against costs a
    distinct + self-join on (id, group) — affordable at test scale,
    exactly what the sketch path exists to avoid at 100 TB.

    Certificate: ``|hll_estimate - exact| <= max(abs_tol, rel_tol *
    exact)``. At test-scale cardinalities the sketches operate in
    sparse (exact) mode, so the certificate is deterministic; at
    production scale the default lgConfigK=12 gives ~1.6% rsd per
    estimate.
    """
    # cache the tiny per-group sketch table: both sides of the pair
    # self-join read ONE materialization, so the fact table is scanned
    # once for the whole sketch leg (the _minhash_candidate_pairs
    # pattern — without the cache each alias re-runs the aggregate)
    sketches = events.groupBy(group_col).agg(
        F.hll_sketch_agg(id_col).alias("__sk")
    ).cache()
    a, b = sketches.alias("a"), sketches.alias("b")
    est = (
        a.join(b, F.col(f"a.{group_col}") < F.col(f"b.{group_col}"))
        .select(
            F.col(f"a.{group_col}").alias("type_a"),
            F.col(f"b.{group_col}").alias("type_b"),
            (
                F.hll_sketch_estimate("a.__sk")
                + F.hll_sketch_estimate("b.__sk")
                - F.hll_sketch_estimate(F.hll_union("a.__sk", "b.__sk"))
            ).alias("__est"),
        )
    )
    d = events.select(group_col, id_col).distinct().cache()
    da, db = d.alias("da"), d.alias("db")
    exact = (
        da.join(
            db,
            (F.col(f"da.{id_col}") == F.col(f"db.{id_col}"))
            & (F.col(f"da.{group_col}") < F.col(f"db.{group_col}")),
        )
        .groupBy(
            F.col(f"da.{group_col}").alias("type_a"),
            F.col(f"db.{group_col}").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("exact_overlap"))
    )
    tol = F.greatest(F.lit(abs_tol), F.lit(rel_tol) * F.col("exact_overlap"))
    return (
        exact.join(F.broadcast(est), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "exact_overlap",
            F.coalesce(
                F.abs(F.col("__est") - F.col("exact_overlap")) <= tol, F.lit(False)
            ).alias("overlap_within_tol"),
        )
        .orderBy("type_a", "type_b")
    )
