"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Spark-first design notes (the 100 TB story):

- **exact**: group on ``md5(text)`` — a 32-byte shuffle key instead of
  the document body; map-side partial aggregation does the heavy lifting.
- **MinHash+LSH**: signatures are per-row column algebra (no shuffle);
  candidate generation explodes b bands per doc and shuffles only
  ``(band_id, band_hash)`` pairs — the classic shingle->minhash->band->
  bucket-join pipeline. Verification joins candidates back to
  signatures. Skew guard: a degenerate band bucket (e.g. empty docs)
  salts naturally because the band hash includes r signature rows.
- **SimHash**: 32-bit fingerprint; near-dup candidates via the
  pigeonhole chunk join (hamming<=k pairs must agree exactly on one
  of k+1 chunks — full recall for the radius), then exact
  ``bit_count(xor)`` filter.
- **n-gram Jaccard**: exact verification on candidate pairs only —
  never all-pairs at scale (the all-pairs variant here blocks by a
  partition key to bound the quadratic term).

Hashes are md5-based so any SQL oracle reproduces them bit-for-bit
(Spark ``hash()``/``xxhash64`` are engine-specific — deliberately
avoided).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..util import default_parallelism, round_half_away6, tracked_cache
from .text import distinct_tokens, shingles, tokens

MERSENNE31 = 2147483647


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc exact-dup labeling via content hash groups."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h)
    return docs.select(
        "doc_id",
        F.count(F.lit(1)).over(w).alias("group_size"),
        F.min("doc_id").over(w).alias("keeper_doc_id"),
        (F.count(F.lit(1)).over(w) > 1).alias("is_duplicate_group"),
    )


def minhash_expr(toks: Column, seed: int) -> Column:
    """One MinHash component: lexicographic min of seeded md5 hex digests.

    ``min over tokens of md5(seed || ':' || token)`` is a valid min-hash
    family on the token set, and every engine computes the identical
    string. NULL for empty docs.
    """
    return F.array_min(F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"{seed}:"), t))))


def _component(i: int, sh: Column) -> Column:
    """MinHash component i as an 8-hex-char slice of a seeded digest.

    One-permutation-style hashing: k=8 components come from TWO md5
    invocations per shingle (seed i//4), each sliced into four 32-bit
    hex windows — 75% less hashing than k independent digests for the
    same LSH banding structure. 32-bit minima over ~50-shingle docs
    leave cross-doc collision odds negligible (~n^2/2^32).
    """
    seed = i // 4
    pos = 1 + 8 * (i % 4)
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), sh)), pos, 8)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    shingle_n: int = 3,
    spread: bool = True,
) -> DataFrame:
    """Shingle -> MinHash signatures (k components over word n-grams).

    Formulated as explode(shingles) -> groupBy(doc).agg(min(md5(seed:sh)))
    rather than k array-transform passes: the shingle array is built
    once, every hash runs in whole-stage codegen (array HOFs are
    interpreted and Catalyst re-inlines their subtrees per component —
    measured 7x slower), and the explode parallelizes a skewed few-docs
    partition across the cluster. Map-side partial min keeps the
    shuffle at k hashes per doc.

    ``spread=False`` skips the up-front text repartition: hashing runs
    at scan parallelism and the ONLY exchange carries the slim per-doc
    partial minima (doc_id + k 8-char hashes — the text never moves).
    Use it when the input is large and well-partitioned at rest (e.g.
    the standing corpus of incremental ingest); the default spread
    exists for small/few-file inputs where scan partitioning would cap
    CPU-bound hash work.
    """
    if spread:
        # spread compute-bound per-doc work across all cores: a small
        # corpus arrives as one parquet file = one task, and
        # shingling+hashing is CPU-bound, so scan-partition count must
        # not cap parallelism. The explicit partition count keeps AQE
        # from coalescing the tiny shuffle back into one task.
        n_part = default_parallelism(docs.sparkSession)
        docs = docs.repartition(n_part, F.col("doc_id"))
    # staged select: the shingle expression references the token array
    # several times internally (size guards, sequence bound, transform
    # source) and inlined tokenization re-runs per reference
    tok = docs.select("doc_id", tokens(F.col(text_col)).alias("__t"))
    sh = shingles(F.col("__t"), shingle_n)
    exploded = tok.select("doc_id", F.explode_outer(sh).alias("sh"))
    # NOTE (r15 measured revert): min over the 8-hex-char STRING plans
    # as SortAggregate (string buffers are not HashAggregate-able); a
    # bit-exact numeric twin — min(conv(hex,16,10) AS BIGINT) +
    # lower(lpad(hex(...),8,'0')) format-back — flips it to
    # HashAggregate, but the per-shingle conv work costs MORE than the
    # sort saves at every measured scale (A/B medians: minhash_sig
    # 0.53->0.61/0.66, minhash_groups 1.08->1.28, incremental
    # 2.14->2.50). The sort-based partial min stays.
    return exploded.groupBy("doc_id").agg(
        *[F.min(_component(i, F.col("sh"))).alias(f"mh{i}") for i in range(k)]
    )


def minhash_signatures_rowwise(
    docs: DataFrame, text_col: str = "text", k: int = 8, shingle_n: int = 3
) -> DataFrame:
    """Per-row MinHash signatures as a stateless projection — ZERO
    shuffle, same values as :func:`minhash_signatures`.

    Digest work matches the explode->groupBy path (k components come
    from k/4 md5 invocations per shingle, sliced into 8-hex-char
    windows); each stage is wrapped in a 1-element ``explode`` so the
    Generate node acts as a projection barrier (ProjectCollapse would
    otherwise inline the shingle/digest arrays into every consumer and
    re-run them per reference).

    Trade-off vs explode->groupBy: interpreted HOFs cost extra CPU per
    element — but NO exchange. This is the formulation for sides that
    must not shuffle: the per-row streaming path and the corpus side
    of incremental ingest, where re-shuffling the corpus every tick
    dwarfs any CPU delta at 100 TB. (On a single-row-group local
    fixture the scan is one task, so wall time understates the
    parallel path — at scale the scan splits like any other.)
    """
    keep = [c for c in docs.columns if c != text_col]
    n_seeds = (k + 3) // 4
    sh_staged = docs.select(
        *keep,
        F.explode(F.array(shingles(tokens(F.col(text_col)), shingle_n))).alias("__sh"),
    )

    def digests(seed: int) -> Column:
        return F.transform(
            F.col("__sh"), lambda x: F.md5(F.concat(F.lit(f"{seed}:"), x))
        )

    dg_staged = sh_staged.select(
        *keep,
        F.explode(
            F.array(F.struct(*[digests(s).alias(f"d{s}") for s in range(n_seeds)]))
        ).alias("__dg"),
    )

    def component_min(i: int) -> Column:
        pos = 1 + 8 * (i % 4)
        return F.array_min(
            F.transform(F.col(f"__dg.d{i // 4}"), lambda h: F.substring(h, pos, 8))
        ).alias(f"mh{i}")

    return dg_staged.select(*keep, *[component_min(i) for i in range(k)])


def cap_hot_buckets(
    exploded: DataFrame, key_cols: list[str], max_bucket: int | None
) -> DataFrame:
    """Drop whole buckets larger than ``max_bucket`` before a banded
    self-join — the hot-bucket guard for LSH/pigeonhole candidate
    generation.

    A bucket of B members fans out to B^2/2 candidate pairs: one
    boilerplate band/chunk value shared by 1M short docs makes a
    single 10^12-pair bucket that no amount of salting can make
    tractable (salting spreads quadratic work; it cannot shrink it).
    Oversized buckets are degenerate by construction — a band key or
    simhash chunk shared by millions of documents carries ~no
    discriminating signal, and a genuinely-near pair inside one
    almost always also agrees on another, smaller bucket.

    Mechanics: one unordered window count over the bucket key (linear
    per bucket — the hot bucket costs O(B), never O(B^2)), filter,
    drop. The window's exchange on ``key_cols`` is the same
    partitioning the self-join needs, so no extra shuffle survives in
    the physical plan. DETERMINISTIC truncation (whole buckets, no
    sampling) so an ANSI-SQL oracle reproduces it with the identical
    ``count(*) OVER (PARTITION BY ...)`` filter.

    Recall contract: pairs whose EVERY agreeing bucket exceeds the cap
    are lost; below the cap the output is bit-identical to the
    uncapped generator (property-tested). ``max_bucket=None`` disables
    the guard.
    """
    if max_bucket is None:
        return exploded
    w = Window.partitionBy(*key_cols)
    return (
        exploded.withColumn("__bsz", F.count(F.lit(1)).over(w))
        .where(F.col("__bsz") <= max_bucket)
        .drop("__bsz")
    )


def hot_bucket_stats(
    exploded: DataFrame, key_cols: list[str], max_bucket: int
) -> DataFrame:
    """Truncation observability for :func:`cap_hot_buckets` — "no
    silent caps" at 100 TB: an operator that discards candidate mass
    must make the recall loss measurable in production, not just in
    tests.

    Returns a ONE-ROW frame the caller can surface as a job metric:
    ``total_buckets``, ``dropped_buckets`` (buckets whose size exceeds
    ``max_bucket``), ``total_rows``, ``dropped_rows``, and
    ``dropped_row_frac``. One map-side-combinable groupBy over the
    bucket key plus a 1-row aggregate — O(rows), no window, safe to
    run alongside the capped join (on a cached explode it reuses the
    materialization).
    """
    per_bucket = exploded.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("__bsz")
    )
    dropped_rows = F.sum(
        F.when(F.col("__bsz") > max_bucket, F.col("__bsz")).otherwise(F.lit(0))
    ).cast("long")
    total_rows = F.sum("__bsz").cast("long")
    return per_bucket.agg(
        F.count(F.lit(1)).cast("long").alias("total_buckets"),
        F.sum((F.col("__bsz") > max_bucket).cast("long")).alias("dropped_buckets"),
        total_rows.alias("total_rows"),
        dropped_rows.alias("dropped_rows"),
        round_half_away6(dropped_rows / total_rows).alias("dropped_row_frac"),
    )


def minhash_band_table(sigs: DataFrame, k: int = 8, bands: int = 4) -> DataFrame:
    """The slim ``(doc_id, band, key)`` explode of a signature table —
    the bucketed join-key frame LSH candidate generation self-joins
    on. Public so truncation observability (:func:`hot_bucket_stats`)
    can aggregate the SAME frame the pair generator caps."""
    r = k // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat(*[F.col(f"mh{b * r + i}") for i in range(r)])).alias("key"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", "bk.band", "bk.key")


def _minhash_candidate_pairs(
    sigs: DataFrame, k: int, bands: int, max_bucket: int | None = None
) -> DataFrame:
    """Distinct LSH candidate pairs from a signature table.

    Explode per-band keys, self-join on (band, key) — the only shuffle
    moves (band_id, 32-byte hash, doc_id) triples. ``max_bucket``
    drops degenerate hot buckets (see :func:`cap_hot_buckets`).
    """
    # cache the slim (doc_id, band, key) table: without it BOTH sides
    # of the self-join recompute the whole shingle->minhash pipeline
    # (verified: 2 parquet scans in the physical plan, no
    # ReusedExchange once the planner picks a broadcast join)
    exploded = minhash_band_table(sigs, k, bands)
    # cap BEFORE the cache: the materialization then already holds only
    # surviving buckets, so the window count + its exchange run once,
    # not once per join side
    exploded = tracked_cache(cap_hot_buckets(exploded, ["band", "key"], max_bucket))
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_band_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    min_est_jaccard: float = 0.0,
    shingle_n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidate pairs + estimated Jaccard (matching components / k).

    ``max_bucket`` drops degenerate hot band-buckets before the
    self-join (see :func:`cap_hot_buckets`) — the 100 TB guard against
    a boilerplate band key fanning out quadratically.

    Single-shuffle shape: the full signature rides the band explode as
    ONE packed 64-char string (k * 8 hex chars), so est_jaccard is
    computed right at the band join from substring compares — no
    signature cache, no post-dedup re-joins. The packed column roughly
    doubles the band-shuffle bytes vs (band, key, doc_id) alone, but
    it removes two whole-table shuffle joins and a cache
    materialization barrier — fewer stages, fewer jobs, strictly less
    total I/O at any scale (r1 shape: 3 extra jobs, 12.6s at sf0.1;
    this shape ~2s). Carrying k SEPARATE hash columns (10x bytes) is
    what measured badly — one packed string is not that.
    """
    r = k // bands
    sigs = minhash_signatures(docs, text_col, k, shingle_n)
    packed = F.concat(*[F.col(f"mh{i}") for i in range(k)])
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat(*[F.col(f"mh{b * r + i}") for i in range(r)])).alias("key"),
        )
        for b in range(bands)
    ]
    # cache so both self-join sides read one materialization of the
    # hash pipeline instead of recomputing it (verified 2 parquet
    # scans without this); ~(1 + k/bands) hashes * n_docs * bands
    # rows of ~100B — bounded and spillable at any scale
    exploded = sigs.select(
        "doc_id",
        packed.alias("sig"),
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select("doc_id", "sig", "bk.band", "bk.key")
    exploded = tracked_cache(cap_hot_buckets(exploded, ["band", "key"], max_bucket))
    a, b = exploded.alias("a"), exploded.alias("b")
    est = sum(
        (
            F.substring(F.col("a.sig"), 8 * i + 1, 8)
            == F.substring(F.col("b.sig"), 8 * i + 1, 8)
        ).cast("int")
        for i in range(k)
    ) / float(k)
    out = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(est, 6).alias("est_jaccard"),
        )
        .distinct()
    )
    return out.where(F.col("est_jaccard") >= min_est_jaccard)


def minhash_duplicate_groups(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    max_iter: int = 20,
) -> DataFrame:
    """Near-duplicate GROUPS: connected components over the MinHash-LSH
    candidate-pair graph, via iterative min-label propagation.

    Each doc starts labeled with its own id; every round each node
    takes the min of its own and its neighbors' labels; fixpoint =
    components. Rounds needed = graph diameter — near-dup components
    are shallow (pairs/small clusters), so this converges in 2-3
    rounds in practice; ``max_iter`` bounds pathological chains.

    Scale notes: the loop is DRIVER-side control flow only — per round
    one join + groupBy on the edge list, nothing collected except a
    1-row convergence aggregate. The convergence test rides the label
    frame itself (a ``__changed`` flag folded into the update select,
    checked with ``max()`` over the round's cache) — no extra join and
    no second pass over the data. Labels are re-cached per round and
    the plan is cut with localCheckpoint every few rounds so lineage
    doesn't grow unboundedly (the classic iterative-algorithm trap on
    Spark).

    Only docs that occur in at least one candidate pair enter the
    loop: near-dup graphs are overwhelmingly singletons (no edges), so
    propagating labels over the full corpus would re-shuffle ~all of
    100 TB per round for rows that can never change. Singletons are
    re-attached at the end as their own group via a broadcast
    anti-join — one pass, no per-round cost.
    """
    sigs = minhash_signatures(docs, text_col, k)
    pairs = _minhash_candidate_pairs(sigs, k, bands)
    return pair_graph_groups(pairs, "doc_a", "doc_b", docs, "doc_id", max_iter)


def _driver_union_find(
    edges_pdf, a_col: str, b_col: str
) -> "tuple[list, list, list]":
    """Min-label union-find over a bounded edge list (driver-side).

    Returns parallel lists (id, group_id, group_size) for every id
    that appears in an edge; group_id is the component's min id —
    bit-identical to the label-propagation fixpoint and the
    recursive-CTE oracle."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(edges_pdf[a_col].tolist(), edges_pdf[b_col].tolist()):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min id becomes the root

    label = {x: find(x) for x in parent}
    sizes: dict = {}
    for g in label.values():
        sizes[g] = sizes.get(g, 0) + 1
    ids = sorted(label)
    return ids, [label[x] for x in ids], [sizes[label[x]] for x in ids]


def pair_graph_groups(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    universe: DataFrame,
    id_col: str,
    max_iter: int = 20,
    driver_cc_max_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components over an undirected candidate-pair graph via
    iterative min-label propagation; singletons from ``universe`` are
    re-attached as their own group. Shared engine for every near-dup
    family (minhash, simhash, embedding-cosine).

    Returns ``(id_col, group_id, group_size)`` covering all of
    ``universe``.

    Scale notes (measured on the minhash family): the loop is
    DRIVER-side control flow only — per round one join + groupBy on
    the edge list, nothing collected except a 1-row convergence
    aggregate. Labels are re-cached per round and the plan is cut with
    localCheckpoint every other round so lineage doesn't grow
    unboundedly. Only ids that occur in at least one pair enter the
    loop: near-dup graphs are overwhelmingly singletons, so
    propagating labels over the full corpus would re-shuffle ~all of
    100 TB per round for rows that can never change.
    """
    # symmetric edges in ONE pass over the pair join: exploding each
    # pair into both directions avoids the union-of-two-selects shape,
    # whose branches each recompute the join+distinct (measured: the
    # edge materialization halves, 10.6s -> ~5s cold at sf0.1)
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                    ),
                    F.struct(
                        F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
    )
    edges = tracked_cache(edges)
    # symmetric edges contain every paired id as src
    members = tracked_cache(edges.select(F.col("src").alias(id_col)).distinct())

    # Small-graph short-circuit: near-dup edge lists are tiny relative
    # to the corpus (635 edges per 5k docs on the fixture; even a 50%
    # duplicate rate at 1B docs yields edges ~ docs, and the threshold
    # bounds what the driver will hold). Below the cap, collect the
    # (already cached, already distinct) pairs and run exact min-label
    # union-find on the driver: same fixpoint, ~3 Spark jobs instead of
    # ~15 — the iterative loop's many small job barriers are what made
    # the CC family 2-4x noisy under scheduler/GC jitter (measured
    # 5.0s..32s across 5 identical runs). Above the cap, the loop below
    # is the 100 TB path: per-round one join + groupBy, checkpointed
    # lineage, nothing collected beyond a 1-row aggregate.
    n_edges = edges.count()  # materializes the cache; needed either way
    if n_edges <= 2 * driver_cc_max_edges:
        spark = pairs.sparkSession
        # Arrow serde for the bounded toPandas/createDataFrame hop only:
        # save + restore the session value so a library call doesn't
        # leak a conf change (and its dtype behavior) into the caller's
        # unrelated toPandas() calls.
        _ARROW_KEY = "spark.sql.execution.arrow.pyspark.enabled"
        try:
            _arrow_prev = spark.conf.get(_ARROW_KEY)
        except Exception:
            _arrow_prev = None
        spark.conf.set(_ARROW_KEY, "true")
        try:
            half = edges.where(F.col("src") < F.col("dst")).toPandas()
            ids, gids, sizes = _driver_union_find(half, "src", "dst")
            id_t = dict(universe.dtypes)[id_col]
            import pandas as pd

            labels_pdf = pd.DataFrame(
                {id_col: ids, "group_id": gids, "group_size": sizes}
            )
            # pandas->Arrow conversion happens eagerly inside this call,
            # so restoring the conf right after is safe for the lazy plan
            grouped = spark.createDataFrame(
                labels_pdf,
                schema=f"{id_col} {id_t}, group_id {id_t}, group_size bigint",
            )
        finally:
            if _arrow_prev is None:
                spark.conf.unset(_ARROW_KEY)
            else:
                spark.conf.set(_ARROW_KEY, _arrow_prev)
        singletons = universe.join(
            F.broadcast(grouped.select(id_col)), id_col, "left_anti"
        ).select(
            id_col,
            F.col(id_col).alias("group_id"),
            F.lit(1).cast("long").alias("group_size"),
        )
        return grouped.unionByName(singletons)

    labels = members.select(id_col, F.col(id_col).alias("group_id"))

    def step(lbl):
        # min-label propagation as ONE join + ONE groupBy: each node's
        # new label is min over {its own label} ∪ {labels arriving over
        # incoming edges}; the own-row rides the union (flagged) so the
        # update and the convergence test share a single aggregation —
        # no second join against the old labels.
        own = lbl.select(id_col, "group_id", F.lit(True).alias("__own"))
        via = edges.join(lbl, edges["src"] == lbl[id_col]).select(
            F.col("dst").alias(id_col),
            "group_id",
            F.lit(False).alias("__own"),
        )
        return (
            own.unionByName(via)
            .groupBy(id_col)
            .agg(
                F.min("group_id").alias("group_id"),
                (
                    F.min("group_id")
                    < F.max(F.when(F.col("__own"), F.col("group_id")))
                ).alias("__changed"),
            )
        )

    for it in range(max_iter):
        # TWO propagation rounds per materialization: shallow (pair/
        # small-cluster) graphs converge in round 1 and confirm in
        # round 2, so fusing them lazily halves the number of job
        # barriers — the dominant cost under scheduler contention.
        # Correct for any depth: the convergence flag comes from the
        # SECOND application, and unconverged graphs just loop again.
        new_labels = step(step(labels).drop("__changed"))
        if it % 2 == 1:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = tracked_cache(new_labels)
        # one scan of the just-materialized cache; coalesce covers the
        # all-NULL case (no id has any neighbor)
        changed = new_labels.agg(
            F.coalesce(F.max("__changed"), F.lit(False)).alias("c")
        ).first()["c"]
        labels.unpersist()
        labels = new_labels
        if not changed:
            break
    w = Window.partitionBy("group_id")
    grouped = labels.select(
        id_col, "group_id", F.count(F.lit(1)).over(w).alias("group_size")
    )
    singletons = universe.join(F.broadcast(members), id_col, "left_anti").select(
        id_col,
        F.col(id_col).alias("group_id"),
        F.lit(1).cast("long").alias("group_size"),
    )
    return grouped.unionByName(singletons)


SIMHASH_BITS = 32


def simhash32(toks: Column) -> Column:
    """32-bit SimHash over a distinct-token array.

    Bit b is set when at least half the tokens' md5 hex digit at
    position b has its high bit set (majority vote with deterministic
    >=-half tie-break) — an md5 hex digest has exactly 32 digits, one
    independent bit source per fingerprint bit. Pure column algebra,
    engine-portable.

    Prefer ``simhash32_from_md5`` over a pre-materialized md5 array
    column when computing many bits — Catalyst does not CSE the
    repeated transform subtree.
    """
    return simhash32_from_md5(F.transform(toks, lambda t: F.md5(t)))


def simhash32_from_md5(md5s: Column) -> Column:
    n = F.size(md5s)
    high = F.array(*[F.lit(c) for c in "89abcdef"])
    bits = []
    for b in range(SIMHASH_BITS):
        cnt = F.size(
            F.filter(md5s, lambda s: F.array_contains(high, F.substring(s, b + 1, 1)))
        )
        bits.append(F.when(cnt * 2 >= n, F.lit(1 << b)).otherwise(F.lit(0)))
    return sum(bits).cast("long")


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """32-bit SimHash fingerprints over distinct word n-gram shingles.

    Shingles, not unigram tokens: on a Zipfian vocabulary the same
    high-frequency words appear in every document, so unigram majority
    votes collapse to near-identical fingerprints corpus-wide (measured
    303 distinct fingerprints over 500 docs and 35k spurious
    hamming<=3 pairs). n-gram shingles are near-unique per document,
    so fingerprints only correlate when documents genuinely share
    phrases (498/500 distinct, 21 pairs — matching MinHash's verdict).
    This is the Manku et al. phrase-feature formulation.
    """
    # explode -> 32 conditional SUMs + count, not 32 array-filter HOF
    # passes: higher-order functions run interpreted (no codegen) and
    # each filter rescans the digest array — measured 3x slower. The
    # explode shape keeps every hash and digit test in whole-stage
    # codegen with map-side partial aggregation (only 33 small ints
    # per doc cross the shuffle), and parallelizes the CPU-bound
    # hashing beyond the input file count.
    n_part = default_parallelism(docs.sparkSession)
    docs = docs.repartition(n_part, F.col("doc_id"))
    tok = docs.select("doc_id", tokens(F.col(text_col)).alias("__t"))
    sh = shingles(F.col("__t"), shingle_n)
    # high bit of hex digit b <=> the digit is one of 89abcdef <=> its
    # ASCII code is >= '8' (56): digits sort '0'-'9' then 'a'-'f', so a
    # single ascii(substring(.,1)) >= 56 replaces the 8-way
    # string-array membership scan per bit — same truth table, ~8x
    # less per-row compare work in the 32-sum aggregate.
    exploded = tok.select("doc_id", F.explode_outer(sh).alias("sh")).select(
        "doc_id", F.md5(F.col("sh")).alias("h")
    )
    per_bit = [
        F.sum(
            F.when(F.ascii(F.substring(F.col("h"), b + 1, 1)) >= 56, 1).otherwise(0)
        ).alias(f"c{b}")
        for b in range(SIMHASH_BITS)
    ]
    counts = exploded.groupBy("doc_id").agg(F.count("h").alias("n"), *per_bit)
    fp = sum(
        F.when(F.col(f"c{b}") * 2 >= F.col("n"), F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(SIMHASH_BITS)
    )
    return counts.select("doc_id", fp.cast("long").alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance via pigeonhole chunks.

    ``max_bucket`` drops degenerate hot chunk-buckets before the
    self-join (see :func:`cap_hot_buckets`) — with 256-way 8-bit
    chunks, short boilerplate docs sharing a chunk value are the one
    quadratic residual at corpus scale.

    The 32-bit fingerprint splits into ``max_hamming + 1`` equal-width
    chunks: a pair within the hamming radius has fewer differing bits
    than chunks, so by pigeonhole it agrees EXACTLY on at least one
    chunk — the chunk equi-joins are a full-recall candidate generator
    for the advertised radius, and ``bit_count(xor)`` verifies
    exactly. Default radius 3 -> four 8-bit chunks: 256-way buckets,
    hash-joinable (an OR of chunk equalities would force a
    nested-loop join — quadratic at any scale). Requires
    ``max_hamming + 1`` to divide 32.
    """
    n_chunks = max_hamming + 1
    if SIMHASH_BITS % n_chunks:
        raise ValueError(
            f"max_hamming + 1 = {n_chunks} must divide {SIMHASH_BITS} "
            "so pigeonhole chunks cover the radius exactly"
        )
    width = SIMHASH_BITS // n_chunks
    # one exploded (chunk_id, chunk_value) table self-joined once — the
    # same banded shape as MinHash LSH. One shuffle of n_chunks * n
    # slim rows replaces n_chunks separate self-joins + union (4 joins,
    # 4 shuffles, 4x plan compile in the old shape). The fingerprint
    # pipeline is cached so both join sides scan one materialization.
    chunked = (
        simhash_fingerprints(docs, text_col)
        .select(
            "doc_id",
            "simhash",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("c"),
                            (
                                F.shiftright(F.col("simhash"), c * width)
                                % (1 << width)
                            ).alias("v"),
                        )
                        for c in range(n_chunks)
                    ]
                )
            ).alias("ck"),
        )
        .select("doc_id", "simhash", "ck.c", "ck.v")
    )
    chunked = tracked_cache(cap_hot_buckets(chunked, ["c", "v"], max_bucket))
    a, b = chunked.alias("a"), chunked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int")
    return (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Partial-overlap (plagiarism-style) pairs via winnowing
    fingerprints: documents sharing >= ``min_shared`` selected k-gram
    fingerprints, with the shared count and containment ratio
    ``shared / min(|A|, |B|)``.

    This catches SHARED SPANS (any common token run of length >=
    window + k - 1 is guaranteed a shared fingerprint — the MOSS
    property), which whole-document MinHash misses when the overlap is
    a small fraction of each document.

    Scale shape: the candidate generator is a bucketed equi-join on
    the fingerprint value — the same banded-LSH join pattern as
    MinHash bands / SimHash chunks, so the same hot-bucket guard
    applies (``max_bucket``, :func:`cap_hot_buckets`): a boilerplate
    span shared by millions of docs is a degenerate bucket. Per-doc
    fingerprint counts ride the (already shuffled-by-doc) distinct
    explode; only (fp, doc_id, n_fp) triples cross the join shuffle.
    """
    from .text import winnow_fingerprints

    fps = winnow_fingerprints(docs, text_col, k, window)
    w = Window.partitionBy("doc_id")
    # n_fp rides the doc_id-partitioned window over the UNCAPPED
    # fingerprint set — containment denominators must not shrink when
    # hot buckets are dropped; the cap then runs BEFORE the cache (the
    # _minhash_candidate_pairs ordering above) so the materialization
    # holds only surviving buckets and the bucket-size window count +
    # its exchange execute once, not once per self-join side.
    sized = fps.select(
        "doc_id", "fp", F.count(F.lit(1)).over(w).alias("n_fp")
    )
    sized = tracked_cache(cap_hot_buckets(sized, ["fp"], max_bucket))
    a, b = sized.alias("a"), sized.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_fp").alias("__na"),
            F.col("b.n_fp").alias("__nb"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
        .select(
            "doc_a",
            "doc_b",
            "shared_fps",
            # containment has arbitrary denominators (shared/min(n)),
            # so round half-away like the SQL engines do — F.round's
            # BigDecimal HALF_UP disagrees on boundary doubles
            round_half_away6(
                F.col("shared_fps") / F.least("__na", "__nb")
            ).alias("containment"),
        )
    )


def jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    block_col: str = "source",
    top_n: int | None = 20,
    shingle_n: int = 2,
    n_buckets: int = 8,
) -> DataFrame:
    """Exact word-n-gram Jaccard for pairs within a blocking key.

    Blocking bounds the quadratic term: C(n,2) within each block
    instead of globally. Two scale refinements on the naive in-block
    self-join:

    - **pair-bucket decomposition**: joining on the block alone caps
      parallelism at the number of blocks (a corpus with 10 sources
      ran all pair compute in 10 tasks regardless of cluster size).
      Each doc gets a stable bucket ``hash(doc_id) % B``; the left
      side is replicated to every target bucket and the join runs on
      ``(blk, target_bucket)`` — B× more, evenly-sized tasks, every
      unordered pair produced exactly once (the replicated side meets
      its partner's bucket once in each direction; ``doc_a < doc_b``
      keeps one). The B× replication is of slim hashed-gram rows, the
      standard price for spreading inherently-quadratic work.
    - **grams hash to int64 before the join** (``xxhash64``): the
      per-pair set intersection compares 8-byte longs instead of
      shingle strings — same counts (collisions at 2^-64 are below
      any practical significance), a fraction of the hash/compare
      cost, and a B×-smaller replication payload.
    """
    n_part = default_parallelism(docs.sparkSession)
    tok = docs.repartition(n_part, F.col("doc_id")).select(
        "doc_id", F.col(block_col).alias("blk"), tokens(F.col(text_col)).alias("__t")
    )
    grams = (
        shingles(F.col("__t"), shingle_n)
        if shingle_n > 1
        else F.array_distinct(F.col("__t"))
    )
    bkt = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_buckets)).cast("int")
    base = tok.select(
        "doc_id",
        "blk",
        bkt.alias("bkt"),
        F.transform(grams, lambda g: F.xxhash64(g)).alias("toks"),
    )
    base = tracked_cache(base)
    left = base.select(
        "doc_id",
        "blk",
        "toks",
        F.explode(F.sequence(F.lit(0), F.lit(n_buckets - 1))).alias("tgt"),
    ).alias("a")
    right = base.alias("b")
    # hash-based set intersect (O(na+nb) per pair); both arrays are
    # distinct, so the count equals |A ∩ B| exactly like the oracle's
    # filter+contains formulation
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    jac = F.round(inter.cast("double") / union, 6)
    out = left.join(
        right,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.tgt") == F.col("b.bkt"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        jac.alias("jaccard"),
    )
    if top_n is None:  # full pair table (threshold sweeps, group input)
        return out
    return out.orderBy(F.desc("jaccard"), "doc_a", "doc_b").limit(top_n)


def chunk_dedup(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 10,
) -> DataFrame:
    """Corpus-wide duplicate-SPAN removal at sub-document granularity
    (the C4 / Lee-et-al "deduplicate repeated passages" step, over
    fixed ``chunk_tokens``-token chunks since the fixture corpus has no
    sentence boundaries). A chunk that appears anywhere earlier in the
    corpus — same doc or another — is dropped; first occurrence wins,
    ordered by (doc_id, chunk_idx). Returns one row per input doc with
    the reassembled surviving text and kept/total chunk counts.

    Scale shape: explode to (chunk, doc_id, ci) and take
    ``row_number = 1`` per chunk text — ONE hash-partitioned window
    shuffle over slim chunk rows (hot chunks are exactly what AQE skew
    splitting handles); reassembly is ONE groupBy(doc_id) with an
    in-group ``array_sort``; the final attach joins two doc_id-keyed
    slim frames. No all-pairs anything, no driver state.
    """
    k = chunk_tokens
    base = docs.select("doc_id", tokens(F.col(text_col)).alias("__t")).select(
        "doc_id",
        "__t",
        F.ceil(F.size("__t") / F.lit(k)).cast("bigint").alias("n_chunks"),
    )
    chunks = base.where(F.col("n_chunks") > 0).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), (F.col("n_chunks") - 1).cast("int")),
                lambda i: F.struct(
                    i.cast("bigint").alias("ci"),
                    F.concat_ws(" ", F.slice(F.col("__t"), i * k + 1, k)).alias(
                        "chunk"
                    ),
                ),
            )
        ).alias("c"),
    ).select("doc_id", "c.ci", "c.chunk")
    w = Window.partitionBy("chunk").orderBy("doc_id", "ci")
    kept = (
        chunks.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ci", "chunk"))),
                    lambda s: s["chunk"],
                ),
            ).alias("text_dedup"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return (
        base.select("doc_id", "n_chunks")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("text_dedup"), F.lit("")).alias("text_dedup"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.col("n_chunks").alias("n_total"),
        )
    )


def canonical_docs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    max_iter: int = 20,
) -> DataFrame:
    """Canonical-document selection after near-dup grouping: within
    each MinHash-LSH connected component, the LONGEST text wins (ties
    to the lowest doc_id) — the standard "keep best of each dup
    cluster" curation step, so downstream training sees one canonical
    copy instead of an arbitrary survivor.

    Scale shape: groups come from the shared CC engine; the length
    join is doc_id-keyed slim columns; ranking is ONE window keyed by
    group_id. Returns every doc labeled
    ``(doc_id, group_id, group_size, is_canonical)``.
    """
    groups = minhash_duplicate_groups(docs, text_col, k, bands, max_iter)
    slim = docs.select("doc_id", F.length(F.col(text_col)).alias("__len"))
    w = Window.partitionBy("group_id").orderBy(F.desc("__len"), "doc_id")
    return (
        groups.join(slim, "doc_id")
        .withColumn("__rk", F.row_number().over(w))
        .select(
            "doc_id",
            "group_id",
            "group_size",
            (F.col("__rk") == 1).alias("is_canonical"),
        )
    )


def _band_frame(sigs: DataFrame, k: int, bands: int) -> DataFrame:
    """(doc_id, sig, band, key) with the full signature packed into one
    64-char string — the minhash_band_pairs explode shape, reusable."""
    r = k // bands
    packed = F.concat(*[F.col(f"mh{i}") for i in range(k)])
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat(*[F.col(f"mh{b * r + i}") for i in range(r)])).alias("key"),
        )
        for b in range(bands)
    ]
    return sigs.select(
        "doc_id",
        packed.alias("sig"),
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select("doc_id", "sig", "bk.band", "bk.key")


def _est_jaccard(a: str, b: str, k: int):
    return F.round(
        sum(
            (
                F.substring(F.col(f"{a}.sig"), 8 * i + 1, 8)
                == F.substring(F.col(f"{b}.sig"), 8 * i + 1, 8)
            ).cast("int")
            for i in range(k)
        )
        / float(k),
        6,
    )


def incremental_new_docs(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """Continuous-ingest dedup: which docs of a NEW batch may be
    appended to an existing corpus. A batch doc is dropped if it is an
    exact duplicate (same md5) or an LSH near-duplicate
    (band collision with est_jaccard >= τ) of ANY corpus doc, or of an
    EARLIER batch doc (lower doc_id) — so the appended set is
    internally clean too.

    Scale shape — the property that matters at 100 TB: the corpus TEXT
    never shuffles. Corpus signatures run at scan parallelism with
    ``spread=False`` — whole-stage-codegen hashing map-side, and the
    only corpus exchange carries the per-doc partial minima (doc_id +
    k 8-char hashes, ~100 bytes/doc: for a 100 TB corpus that is a
    ~100 GB slim shuffle vs re-shuffling 100 TB of text every tick).
    The batch's band keys and content hashes are tiny and BROADCAST,
    so everything downstream of the corpus aggregate is a map-side
    broadcast join (plan-pinned in tests/test_analytics_plans.py: no
    exchange anywhere touches the text column). A fully shuffle-free
    corpus path exists (:func:`minhash_signatures_rowwise`) but costs
    ~5x CPU in interpreted HOFs — the slim aggregate is the better
    trade. The persisted-index production variant of this screen is
    :func:`incremental_new_docs_indexed` (same join shape, corpus text
    read ZERO times per tick); this function takes the corpus frame so
    the demo is self-contained.
    """
    cb = _band_frame(
        minhash_signatures(corpus, text_col, k, spread=False), k, bands
    )
    corpus_hashes = corpus.select(F.md5(F.col(text_col)).alias("__h"))
    return _screen_batch_against(
        cb, corpus_hashes, batch, text_col, k, bands, min_est_jaccard
    )


def _screen_batch_against(
    cb: DataFrame,
    corpus_hashes: DataFrame,
    batch: DataFrame,
    text_col: str,
    k: int,
    bands: int,
    min_est_jaccard: float,
) -> DataFrame:
    """Shared ingest-screen core: drop batch docs that are exact or
    LSH near-dups of the corpus side (given as its slim band frame +
    content-hash frame — never its text) or of an earlier batch doc."""
    bb = tracked_cache(_band_frame(minhash_signatures(batch, text_col, k), k, bands))

    near_corpus = (
        cb.alias("c")
        .join(
            F.broadcast(bb.alias("b")),
            (F.col("c.band") == F.col("b.band")) & (F.col("c.key") == F.col("b.key")),
        )
        .where(_est_jaccard("c", "b", k) >= min_est_jaccard)
        .select(F.col("b.doc_id").alias("doc_id"))
    )
    bhash = tracked_cache(batch.select("doc_id", F.md5(F.col(text_col)).alias("__h")))
    exact_corpus = (
        corpus_hashes.join(F.broadcast(bhash), "__h").select("doc_id")
    )
    a, b = bb.alias("a"), bb.alias("b")
    near_intra = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(_est_jaccard("a", "b", k) >= min_est_jaccard)
        .select(F.col("b.doc_id").alias("doc_id"))
    )
    h1, h2 = bhash.alias("h1"), bhash.alias("h2")
    exact_intra = (
        h1.join(
            h2,
            (F.col("h1.__h") == F.col("h2.__h"))
            & (F.col("h1.doc_id") < F.col("h2.doc_id")),
        )
        .select(F.col("h2.doc_id").alias("doc_id"))
    )
    hits = (
        near_corpus.unionByName(exact_corpus)
        .unionByName(near_intra)
        .unionByName(exact_intra)
        .distinct()
    )
    return batch.join(F.broadcast(hits), "doc_id", "left_anti")


def winnow_screen_new_docs(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    spread: bool = True,
) -> DataFrame:
    """Continuous-ingest SPAN screening: which docs of a new batch may
    be appended to a standing corpus, where a batch doc is dropped if
    it shares >= ``min_shared`` winnowing fingerprints with ANY corpus
    doc or any EARLIER batch doc (lower doc_id) — the partial-overlap
    complement of :func:`incremental_new_docs`, which screens
    whole-document near-duplicates. A quote or boilerplate span of
    >= ``window + k - 1`` tokens lifted from a corpus doc collides by
    the MOSS guarantee even when the rest of the document is new.

    Scale shape: corpus fingerprints are pure per-row Column algebra
    (:func:`tsod_spark.pipeline.text.winnow_fingerprints`), the batch
    fingerprint table is tiny and BROADCAST, and only per-(corpus_doc,
    batch_doc) collision counts aggregate — bounded by the batch's
    fingerprint set. ``spread`` (the :func:`minhash_signatures`
    contract) controls the one open question, where the corpus
    fingerprint CPU runs: the default repartitions the corpus text
    once up front, for small/few-file corpora whose scan partitioning
    would cap the tokenize -> k-gram -> md5 -> window-min chain at one
    task; ``spread=False`` restores the zero-text-shuffle ingest shape
    (scan -> fingerprint projection -> broadcast semi-computation, no
    exchange carries text) for a standing corpus that is large and
    well-partitioned at rest. The streaming twin is
    :func:`tsod_spark.streaming.stream_winnow_overlap`.
    """
    from .text import winnow_fingerprints

    # corpus leg spread (the fingerprint chain is the operator's CPU
    # and a small corpus scans as one task); batch leg unspread — its
    # chain is 1/20 the work and feeds a broadcast, so an exchange
    # would cost more than it parallelizes
    bfp = tracked_cache(
        winnow_fingerprints(batch, text_col, k, window, spread=False)
    )
    cfp = winnow_fingerprints(corpus, text_col, k, window, spread=spread)

    hits_corpus = (
        cfp.alias("c")
        .join(F.broadcast(bfp.alias("b")), F.col("c.fp") == F.col("b.fp"))
        .groupBy(
            F.col("c.doc_id").alias("corpus_doc"),
            F.col("b.doc_id").alias("doc_id"),
        )
        .agg(F.count(F.lit(1)).alias("__shared"))
        .where(F.col("__shared") >= min_shared)
        .select("doc_id")
    )
    a, b = bfp.alias("a"), bfp.alias("b")
    hits_intra = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("earlier"),
            F.col("b.doc_id").alias("doc_id"),
        )
        .agg(F.count(F.lit(1)).alias("__shared"))
        .where(F.col("__shared") >= min_shared)
        .select("doc_id")
    )
    hits = hits_corpus.unionByName(hits_intra).distinct()
    return batch.join(F.broadcast(hits), "doc_id", "left_anti")


def build_corpus_index(
    corpus: DataFrame, text_col: str = "text", k: int = 8, bands: int = 4
) -> DataFrame:
    """Persistable LSH ingest index of a corpus: one row per (doc,
    band) carrying the packed k-component signature, the band bucket
    key, and the doc's content md5 — everything continuous-ingest
    screening needs, with NO text column.

    This is the production form of the "corpus side" of
    :func:`incremental_new_docs`: ~``bands`` rows x ~140 bytes per doc
    REGARDLESS of document size, so a 100 TB corpus indexes to well
    under 1 TB of parquet. Each ingest tick scans the index instead of
    the corpus (text read ZERO times per tick), and accepted docs
    append their own index rows (``build_corpus_index(accepted)`` +
    ``.write.mode("append")``) — the index is maintained incrementally,
    never recomputed. Join shape downstream is identical to the
    self-contained demo (:func:`incremental_new_docs_indexed`).
    """
    sigs = minhash_signatures(corpus, text_col, k, spread=False)
    bandf = _band_frame(sigs, k, bands)
    hashes = corpus.select("doc_id", F.md5(F.col(text_col)).alias("content_md5"))
    # both sides are slim per-doc frames (no text); the equi-join on
    # doc_id is the only exchange beyond the signature partial-minima
    return bandf.join(hashes, "doc_id")


def incremental_new_docs_indexed(
    index: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    min_est_jaccard: float = 0.5,
) -> DataFrame:
    """:func:`incremental_new_docs` against a PERSISTED corpus index
    (:func:`build_corpus_index`, typically read back from parquet):
    identical screening semantics and join shape, but the corpus text
    is read zero times per tick — the only corpus-side scan is the
    slim index table. Survivors equal the self-contained variant
    (differential-tested)."""
    cb = index.select("doc_id", "sig", "band", "key")
    corpus_hashes = index.where(F.col("band") == 0).select(
        F.col("content_md5").alias("__h")
    )
    return _screen_batch_against(
        cb, corpus_hashes, batch, text_col, k, bands, min_est_jaccard
    )


def jaccard_pairs_index(
    docs: DataFrame,
    text_col: str = "text",
    block_col: str = "source",
    shingle_n: int = 2,
    max_gram_docs: int | None = None,
    b_docs: DataFrame | None = None,
) -> DataFrame:
    """Exact in-block Jaccard for every pair sharing AT LEAST ONE
    n-gram — the inverted-index formulation of :func:`jaccard_pairs`.

    Instead of materializing all C(block,2) pairs and intersecting two
    full gram arrays per pair (O(pairs x doc_len) regardless of
    similarity), explode each doc's DISTINCT hashed grams and
    self-join on (block, gram): every join hit is one element of some
    pair's intersection, so a (doc_a, doc_b) count IS |A n B|, and
    union sizes ride along as per-doc gram counts.  Work is
    output-sensitive — sum over grams of (docs sharing it choose 2) —
    near-linear on natural corpora where most grams are unique, vs
    the all-pairs quadratic.  Zero-overlap pairs never appear, which
    is exactly right for threshold screens (their Jaccard is 0).  At
    boilerplate-heavy scale a shared gram with B in-block owners emits
    B^2 hits: cap degenerate grams with :func:`cap_hot_buckets` on
    (blk, gh) before the join, same as the banded-LSH guard.

    ``b_docs`` (a ``doc_id`` frame) restricts the RIGHT leg of the
    self-join: only pairs whose doc_b is in it are emitted, each with
    its EXACT Jaccard against all lower-id in-block docs — the hook
    :func:`threshold_curve_sampled` uses to pay only a sampled share
    of the join volume while keeping per-sampled-doc results exact.
    """
    n_part = default_parallelism(docs.sparkSession)
    tok = docs.repartition(n_part, F.col("doc_id")).select(
        "doc_id", F.col(block_col).alias("blk"), tokens(F.col(text_col)).alias("__t")
    )
    grams = (
        shingles(F.col("__t"), shingle_n)
        if shingle_n > 1
        else F.array_distinct(F.col("__t"))
    )
    g = tok.select(
        "doc_id",
        "blk",
        F.transform(grams, lambda x: F.xxhash64(x)).alias("__gh"),
    ).select(
        "doc_id",
        "blk",
        F.size("__gh").cast("long").alias("__ng"),
        # explode_OUTER, deliberately (r14): a plain explode lets
        # Catalyst's InferFiltersFromGenerate copy the whole
        # tokenize->shingle->xxhash chain into an inferred
        # `size(...) > 0 AND isnotnull(...)` filter, and predicate
        # pushdown sinks that filter BELOW the repartition exchange —
        # so the chain ran TWICE, one copy single-threaded on the
        # 1-file scan task (stage metrics: 7.1 of 12.7 s wall in a
        # 1-task stage; guide §4.4's duplicated-expression pathology,
        # Column form). No filter is inferrable from an OUTER
        # generate, so the chain stays in the ONE post-exchange
        # projection at full parallelism. Output is identical: the
        # only extra rows are (doc, NULL gh) for gram-less docs, and
        # the equi-join on gh drops nulls exactly as the inner
        # explode dropped their empty arrays.
        F.explode_outer("__gh").alias("gh"),
    )
    # optional hot-gram guard: a gram owned by B in-block docs emits
    # B^2 join hits; capped grams are dropped WHOLE (cap_hot_buckets
    # semantics) so intersection counts UNDERCOUNT for pairs relying
    # on them — the deterministic truncation trade the banded-LSH
    # path already documents. None disables (exact).
    g = cap_hot_buckets(g, ["blk", "gh"], max_gram_docs)
    a = g.select(
        F.col("blk"),
        F.col("gh"),
        F.col("doc_id").alias("doc_a"),
        F.col("__ng").alias("__na"),
    )
    b = g.select(
        F.col("blk"),
        F.col("gh"),
        F.col("doc_id").alias("doc_b"),
        F.col("__ng").alias("__nb"),
    )
    if b_docs is not None:
        b = b.join(
            b_docs.select(F.col("doc_id").alias("doc_b")), "doc_b", "leftsemi"
        )
    p = (
        a.join(b, ["blk", "gh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__inter"),
            F.first("__na").alias("__na"),
            F.first("__nb").alias("__nb"),
        )
    )
    jac = F.round(
        F.col("__inter").cast("double")
        / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double"),
        6,
    )
    return p.select("doc_a", "doc_b", jac.alias("jaccard"))


def _ppjoin_prefix(
    docs: DataFrame,
    pct: int,
    text_col: str,
    block_col: str,
    shingle_n: int,
    cache: bool = True,
    dfreq: DataFrame | None = None,
    order_by_hash: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Shared prefix construction for :func:`ppjoin_pairs` and
    :func:`ppjoin_prefix_stats`: returns ``(tok, pre)`` where ``tok``
    is the per-doc frame (gram strings + xxhash64 array) and
    ``pre`` the exploded prefix table
    ``(blk, [gram,] gh, doc_id, __ng, __pos)`` under a global
    (document-frequency asc, tie-break asc) order with int64-exact
    prefix bounds.

    Two order variants (VERDICT r10 #6):

    ``order_by_hash=False`` (the stats path): tie-break within equal
    document frequency is the gram STRING (binary UTF-8 order —
    identical in Spark and ANSI engines). The string order makes the
    prefix table itself reproducible by the DuckDB oracle so
    :func:`ppjoin_prefix_stats` can be hash-checked, not just the
    final pairs.

    ``order_by_hash=True`` (the pairs path): the prefix never touches
    gram strings at all — df counts key on the int64 ``gh``, the
    global order is (df asc, gh asc), and the per-doc top-p selection
    is ``array_sort`` of 16-byte (df, gh) structs + ``slice`` instead
    of a window ``row_number`` over string rows: only the first
    ``p = n − ceil(t·n/100) + 1`` grams are ever used, so sorting the
    full |vocab|²-sized bigram rows through an exchange-wide window
    was pure waste. The pair output is bit-identical — any consistent
    global order satisfies the prefix lemma (property-tested), and
    verification is order-independent. A 64-bit hash collision between
    distinct grams merges their df counts and ties their sort key;
    both only perturb the ORDER (still globally consistent — equal
    (df, gh) structs are interchangeable), never the verified pairs,
    the same collision posture the verification ``array_intersect``
    on hashes already takes. Candidate joins key on ``gh`` in both
    variants.

    ``cache=True`` (the pairs path — ``tok`` feeds both the prefix
    build and the verification join) caches the tokenized frame and
    applies the nonempty filter ABOVE the InMemoryRelation. The order
    matters for a subtle reason (VERDICT r9 #1 root cause): with
    ``.where(__ng > 0)`` inside the cached plan, predicate pushdown
    drags the whole interpreted shingle+hash expression below the
    repartition exchange into the parquet scan — a small corpus reads
    as ONE partition, so tokenization ran single-threaded for the
    entire corpus and then AGAIN post-shuffle for the project
    (measured 3.8s vs 0.6s at sf0.1 in bigram mode). The cache is a
    pushdown barrier; the filter above it scans cached bytes.
    ``cache=False`` (the stats path, ADVICE r9 — single consumer,
    ``tok`` discarded) skips the cache AND the filter: the prefix path
    only ever sees exploded gram rows, and an empty gram array
    explodes to zero rows, so the filter is vacuous there."""
    if not 0 < pct <= 100:
        raise ValueError("thr_pct must be in (0, 100]")
    n_part = default_parallelism(docs.sparkSession)
    grams_of = (
        (lambda t: shingles(t, shingle_n)) if shingle_n > 1 else F.array_distinct
    )
    base = (
        docs.repartition(n_part, F.col("doc_id"))
        .select(
            "doc_id",
            F.col(block_col).alias("blk"),
            grams_of(tokens(F.col(text_col))).alias("__g"),
        )
        .withColumn(
            "__gh", F.transform(F.col("__g"), lambda x: F.xxhash64(x))
        )
        .withColumn("__ng", F.size("__gh").cast("long"))
    )
    if cache:
        tok = tracked_cache(base).where(F.col("__ng") > 0)
    else:
        tok = base.where(F.col("__ng") > 0)
    src = tok if cache else base
    if order_by_hash:
        g = src.select("doc_id", "blk", "__ng", F.explode("__gh").alias("gh"))
        if dfreq is None:
            dfh = g.groupBy("blk", "gh").agg(
                F.count(F.lit(1)).cast("long").alias("__df")
            )
            gj = g.join(dfh, ["blk", "gh"])
        else:
            # External index is keyed on gram strings; hash it once.
            # groupBy-sum folds the (astronomically unlikely) distinct
            # grams colliding on gh — same merged-count semantics as
            # the dfreq-is-None branch above.
            dfh = (
                dfreq.select("blk", F.xxhash64("gram").alias("gh"), "__df")
                .groupBy("blk", "gh")
                .agg(F.sum("__df").cast("long").alias("__df"))
            )
            # LEFT join, unseen grams df 0 — same stale-index posture
            # as the string path below (ADVICE r10 #1).
            gj = g.join(dfh, ["blk", "gh"], "left").withColumn(
                "__df", F.coalesce(F.col("__df"), F.lit(0).cast("long"))
            )
        plen_i = (
            F.col("__ng") - F.expr(f"({pct} * __ng + 99) div 100") + 1
        ).cast("int")
        agged = gj.groupBy("doc_id").agg(
            F.first("blk").alias("blk"),
            F.first("__ng").alias("__ng"),
            F.array_sort(F.collect_list(F.struct("__df", "gh"))).alias(
                "__sorted"
            ),
        )
        pre = agged.select(
            "blk",
            "doc_id",
            "__ng",
            F.posexplode(F.slice("__sorted", F.lit(1), plen_i)).alias(
                "__p0", "__s"
            ),
        ).select(
            "blk",
            F.col("__s.gh").alias("gh"),
            "doc_id",
            "__ng",
            (F.col("__p0") + 1).cast("long").alias("__pos"),
        )
        return tok, pre
    g = src.select("doc_id", "blk", "__ng", F.explode("__g").alias("gram"))
    # global gram order: document frequency ascending (per block — joins
    # are in-block), ties by gram string; consistent across all docs.
    # A PERSISTED index (ppjoin_index) can be passed in — in production
    # the df table is maintained incrementally and the per-call
    # recompute below is only for self-contained queries.
    if dfreq is None:
        dfreq = g.groupBy("blk", "gram").agg(
            F.count(F.lit(1)).cast("long").alias("__df")
        )
        gj = g.join(dfreq, ["blk", "gram"])
    else:
        # Externally-supplied (possibly stale) index: an INNER join here
        # would DROP grams the index has not seen yet — they'd never
        # enter any prefix and row_number would renumber over the
        # survivors, silently breaking the prefix-filter guarantee (two
        # new docs made entirely of new grams would produce zero
        # candidates despite Jaccard 1.0).  LEFT join with df 0 instead:
        # unseen grams sort FIRST (rarest => they land in prefixes =>
        # strictly MORE candidates, never fewer), matching
        # :func:`ppjoin_screen_new_docs`'s corpus-unseen-gram handling
        # (ADVICE r10 #1).
        gj = g.join(dfreq, ["blk", "gram"], "left").withColumn(
            "__df", F.coalesce(F.col("__df"), F.lit(0).cast("long"))
        )
    pos = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("__df", "gram")
    )
    # prefix length p = ng - ceil(pct*ng/100) + 1, all int64
    plen = F.col("__ng") - F.expr(f"({pct} * __ng + 99) div 100") + 1
    pre = (
        gj
        .withColumn("__pos", pos.cast("long"))
        .where(F.col("__pos") <= plen)
        .select(
            "blk",
            "gram",
            F.xxhash64("gram").alias("gh"),
            "doc_id",
            "__ng",
            "__pos",
        )
    )
    return tok, pre


def ppjoin_index(
    docs: DataFrame,
    text_col: str = "text",
    block_col: str = "source",
    shingle_n: int = 1,
) -> DataFrame:
    """Persisted document-frequency index for the PPJoin family — the
    ``(blk, gram, __df)`` table whose ascending order defines every
    doc's prefix (VERDICT r9 #1's build-once idiom, the
    :func:`containment_index` analogue for the exact-Jaccard tier).

    In production this frame is written out and maintained
    INCREMENTALLY (df counts are additive under corpus appends:
    new docs only increment their own grams' counts), so the per-call
    recompute inside :func:`ppjoin_pairs` is paid only by the
    self-contained registered demos. Any CONSISTENT snapshot of the
    index yields correct pairs — the prefix order is an optimization
    hint, not a correctness input (result-invariance under order
    changes is property-tested), so a slightly-stale index still
    returns exact results, just with marginally longer prefixes for
    grams whose frequency grew.  Grams ABSENT from the index entirely
    (docs newer than the snapshot) get df 0 inside
    :func:`_ppjoin_prefix` — rarest, so they enter prefixes and only
    ever ADD candidates (stale-index exactness is tested with
    novel-gram docs in tests/test_round11.py).
    """
    grams_of = (
        (lambda t: shingles(t, shingle_n)) if shingle_n > 1 else F.array_distinct
    )
    n_part = default_parallelism(docs.sparkSession)
    g = (
        docs.repartition(n_part, F.col("doc_id"))
        .select(
            F.col(block_col).alias("blk"),
            F.explode(grams_of(tokens(F.col(text_col)))).alias("gram"),
        )
    )
    return g.groupBy("blk", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )


def ppjoin_prefix_stats(
    docs: DataFrame,
    thr_pct: int = 40,
    text_col: str = "text",
    block_col: str = "source",
    shingle_n: int = 2,
) -> DataFrame:
    """Fan-out observability for the UNCAPPED PPJoin prefix table —
    the :func:`hot_bucket_stats` analogue for :func:`ppjoin_pairs`
    (VERDICT r8: "no silent caps" must become "no unmonitored
    fan-out").

    The prefix filter's df-ascending gram order normally keeps hot
    grams in suffixes, so the per-``(blk, gh)`` prefix buckets stay
    small and the candidate join volume tracks the near-dup mass. But
    a pathological corpus — a block of near-identical short docs where
    EVERY gram is frequent — puts the same grams in every prefix, and
    a bucket of size B emits B² candidate hits. This one-row frame
    makes that visible BEFORE the join: ``total_buckets``,
    ``total_rows`` (sum of prefix lengths), ``max_bucket_rows`` (the
    worst fan-out source; its candidate contribution is its square),
    ``p99_bucket_rows``, and ``max_bucket_frac`` (share of prefix rows
    in the single hottest bucket). Same aggregation shape as
    :func:`hot_bucket_stats`: one map-side-combinable groupBy + a
    1-row aggregate, O(prefix rows).

    Exact-int64 except the two rounded ratio/percentile outputs.
    Results of :func:`ppjoin_pairs` are unaffected — this is a
    read-only screen over the same ``pre`` frame.
    """
    # cache=False (ADVICE r9): this path discards the tokenized frame
    # and has one downstream consumer — caching the corpus gram arrays
    # here would be pure memory/IO overhead for a read-only screen.
    _tok, pre = _ppjoin_prefix(
        docs, int(thr_pct), text_col, block_col, shingle_n, cache=False
    )
    per_bucket = pre.groupBy("blk", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("__bsz")
    )
    total_rows = F.sum("__bsz").cast("long")
    mx = F.max("__bsz").cast("long")
    return per_bucket.agg(
        F.count(F.lit(1)).cast("long").alias("total_buckets"),
        total_rows.alias("total_rows"),
        mx.alias("max_bucket_rows"),
        F.round(F.expr("percentile(__bsz, 0.99)"), 6).alias("p99_bucket_rows"),
        round_half_away6(mx.cast("double") / total_rows.cast("double")).alias(
            "max_bucket_frac"
        ),
    )


def ppjoin_pairs(
    docs: DataFrame,
    thr_pct: int = 40,
    text_col: str = "text",
    block_col: str = "source",
    shingle_n: int = 2,
    index: DataFrame | None = None,
) -> DataFrame:
    """Prefix-filtered exact threshold-Jaccard join (the AllPairs /
    PPJoin candidate strategy, VLDB'06 / WWW'08) — returns exactly the
    in-block pairs with Jaccard >= thr_pct/100, but generates
    candidates from each document's PREFIX only.

    Why this exists next to :func:`jaccard_pairs_index`: the inverted
    index explodes EVERY distinct gram, so a gram shared by B docs
    emits B^2 join hits whether or not those docs could possibly clear
    the threshold.  Prefix filtering sorts each doc's grams by a
    global (document-frequency asc, gram) order and keeps only the
    first ``p = |x| - ceil(t*|x|) + 1`` — any pair with J >= t MUST
    share a gram inside both prefixes (if all shared grams sat in x's
    suffix of length ceil(t|x|)-1 the overlap couldn't reach the
    ceil(t|x|) that J >= t forces), and because the order puts RARE
    grams first, the hottest grams land in suffixes and never join.
    At 100 TB this is the difference between the index blowing up on
    boilerplate n-grams and the join volume tracking the actual
    near-dup mass; candidates are further cut by the length filter
    ``100*min(|x|,|y|) >= pct*max(|x|,|y|)`` before verification.

    Every bound is integer arithmetic (``ceil(t*n)`` as
    ``(pct*n + 99) div 100``; the final test as
    ``100*inter >= pct*union``) so threshold boundaries are
    engine-exact — 0.4*5 in doubles is 2.0000000000000004 and a float
    ceil would silently shorten the prefix and MISS pairs.

    Verification joins candidates back to the full (cached) gram
    arrays and intersects once per candidate — output-sensitive, never
    quadratic.  Result-invariance vs the plain engine is
    property-tested (tests/test_round8b.py).

    The tokenized frame is cached (it feeds both the prefix build and
    the verification join) via :func:`tsod_spark.util.tracked_cache`;
    a long-lived session embedding this operator wraps the call in
    ``with tsod_spark.util.cache_scope():`` and exits with zero pinned
    blocks (the structural form of the old clearCache docstring
    contract — ADVICE r8 #3 / VERDICT r9 #7). bench.py and the
    registry harness keep their ``clearCache()`` hygiene.

    Prefix-bucket fan-out is observable via
    :func:`ppjoin_prefix_stats` — the prefix table is deliberately
    uncapped (df-asc ordering keeps hot grams in suffixes), so "no
    silent caps" here means "no unmonitored fan-out": surface the
    stats as a job metric next to the join.
    """
    # order_by_hash (VERDICT r10 #6): the pairs path needs no gram
    # strings and no string-reproducible order — top-p selection over
    # int64 (df, gh) structs replaces the window row_number over the
    # |vocab|²-sized bigram string rows. Output bit-identical
    # (result-invariance property test, tests/test_round8b.py).
    tok, pre = _ppjoin_prefix(
        docs,
        int(thr_pct),
        text_col,
        block_col,
        shingle_n,
        dfreq=index,
        order_by_hash=True,
    )
    pct = int(thr_pct)
    a = pre.select(
        "blk",
        "gh",
        F.col("doc_id").alias("doc_a"),
        F.col("__ng").alias("__na"),
        F.col("__pos").alias("__pa"),
    )
    b = pre.select(
        "blk",
        "gh",
        F.col("doc_id").alias("doc_b"),
        F.col("__ng").alias("__nb"),
        F.col("__pos").alias("__pb"),
    )
    hits = a.join(b, ["blk", "gh"]).where(
        (F.col("doc_a") < F.col("doc_b"))
        # length filter: J >= t forces t*max <= min (int64-exact)
        & (
            F.lit(100) * F.least("__na", "__nb")
            >= F.lit(pct) * F.greatest("__na", "__nb")
        )
    )
    # positional filter (PPJoin proper): with i = the pair's FIRST
    # common-prefix position in a (no common gram sits before it) and
    # j = likewise in b, overlap <= 1 + min(na - i, nb - j); J >= t
    # needs overlap >= ceil(pct*(na+nb)/(100+pct)) (int64-exact).
    # i and j may come from different grams — each still bounds
    # overlap on its own side, so the combined bound stays sound.
    alpha = F.expr(f"({pct} * (__na + __nb) + {100 + pct} - 1) div {100 + pct}")
    cand = (
        hits.groupBy("doc_a", "doc_b")
        .agg(
            F.first("__na").alias("__na"),
            F.first("__nb").alias("__nb"),
            F.min("__pa").alias("__i"),
            F.min("__pb").alias("__j"),
        )
        .where(
            F.lit(1)
            + F.least(F.col("__na") - F.col("__i"), F.col("__nb") - F.col("__j"))
            >= alpha
        )
        .select("doc_a", "doc_b")
    )
    fa = tok.select(
        F.col("doc_id").alias("doc_a"),
        F.col("__gh").alias("__ga"),
        F.col("__ng").alias("__na"),
    )
    fb = tok.select(
        F.col("doc_id").alias("doc_b"),
        F.col("__gh").alias("__gb"),
        F.col("__ng").alias("__nb"),
    )
    v = (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn(
            "__inter", F.size(F.array_intersect("__ga", "__gb")).cast("long")
        )
        .withColumn("__union", F.col("__na") + F.col("__nb") - F.col("__inter"))
        .where(F.lit(100) * F.col("__inter") >= F.lit(pct) * F.col("__union"))
    )
    jac = F.round(F.col("__inter").cast("double") / F.col("__union").cast("double"), 6)
    return v.select("doc_a", "doc_b", jac.alias("jaccard")).orderBy(
        "doc_a", "doc_b"
    )


def containment_pairs(
    docs: DataFrame,
    thr_pct: int = 80,
    text_col: str = "text",
    block_col: str = "source",
    shingle_n: int = 2,
    max_gram_docs: int | None = None,
) -> DataFrame:
    """Asymmetric CONTAINMENT screen — in-block pairs where one doc's
    gram set is mostly inside the other's: ``C(A->B) = |A n B| / |A|``,
    kept when ``max(C(A->B), C(B->A)) >= thr_pct/100``.

    Jaccard misses exactly these: a 50-gram quote fully embedded in a
    5000-gram article has J ~ 0.01 but containment 1.0 — the
    subset-duplicate / quote-expansion case (a training corpus keeps
    both and the small doc is pure repetition).  Winnowing catches
    shared SPANS; containment catches shared VOCABULARY mass when the
    span structure is shuffled (translations of boilerplate, templated
    rewrites).

    Same inverted-index shape as :func:`jaccard_pairs_index` (explode
    distinct hashed grams, in-block self-join — every hit is one
    intersection element), same optional hot-gram cap, and the
    threshold test is int64-exact: ``100*inter >= pct*least(na, nb)``
    (the max-containment side is always the smaller set).
    """
    pct = int(thr_pct)
    if not 0 < pct <= 100:
        raise ValueError("thr_pct must be in (0, 100]")
    n_part = default_parallelism(docs.sparkSession)
    tok = docs.repartition(n_part, F.col("doc_id")).select(
        "doc_id", F.col(block_col).alias("blk"), tokens(F.col(text_col)).alias("__t")
    )
    grams = (
        shingles(F.col("__t"), shingle_n)
        if shingle_n > 1
        else F.array_distinct(F.col("__t"))
    )
    g = tok.select(
        "doc_id",
        "blk",
        F.transform(grams, lambda x: F.xxhash64(x)).alias("__gh"),
    ).select(
        "doc_id",
        "blk",
        F.size("__gh").cast("long").alias("__ng"),
        # explode_OUTER for the same reason as jaccard_pairs_index
        # (r14): keeps InferFiltersFromGenerate from sinking the gram
        # chain below the repartition exchange; null-gh rows drop in
        # the equi-join exactly as empty arrays dropped in the inner
        # explode.
        F.explode_outer("__gh").alias("gh"),
    )
    g = cap_hot_buckets(g, ["blk", "gh"], max_gram_docs)
    a = g.select(
        F.col("blk"),
        F.col("gh"),
        F.col("doc_id").alias("doc_a"),
        F.col("__ng").alias("__na"),
    )
    b = g.select(
        F.col("blk"),
        F.col("gh"),
        F.col("doc_id").alias("doc_b"),
        F.col("__ng").alias("__nb"),
    )
    p = (
        a.join(b, ["blk", "gh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__inter"),
            F.first("__na").alias("__na"),
            F.first("__nb").alias("__nb"),
        )
        .where(
            F.lit(100) * F.col("__inter")
            >= F.lit(pct) * F.least("__na", "__nb")
        )
    )
    return p.select(
        "doc_a",
        "doc_b",
        F.col("__inter").alias("shared_grams"),
        F.round(F.col("__inter").cast("double") / F.col("__na").cast("double"), 6).alias(
            "containment_a"
        ),
        F.round(F.col("__inter").cast("double") / F.col("__nb").cast("double"), 6).alias(
            "containment_b"
        ),
    ).orderBy("doc_a", "doc_b")


def ppjoin_screen_new_docs(
    corpus: DataFrame,
    batch: DataFrame,
    thr_pct: int = 90,
    text_col: str = "text",
    block_col: str = "source",
    shingle_n: int = 1,
) -> DataFrame:
    """Continuous-ingest EXACT-threshold screen: for each new-batch
    doc, every corpus doc in its block with Jaccard >= ``thr_pct/100``
    (distinct grams), found via a ONE-SIDED prefix filter — the
    guarantee-grade companion to :func:`incremental_new_docs`
    (MinHash, estimation error) and :func:`winnow_screen_new_docs`
    (span collisions): an ingest gate that must PROVE "this doc is not
    a >= 0.9 near-dup of anything we already hold" needs the exact
    tier.

    One-sided prefix soundness: J(x,y) >= t forces overlap >=
    ceil(t*|x|); if y shared nothing in x's prefix (the
    ``|x| - ceil(t*|x|) + 1`` globally-rarest grams of x), all shared
    grams would sit in x's suffix of size ceil(t*|x|) - 1 —
    contradiction. So probing the corpus with ONLY the batch docs'
    prefix grams is exact, and no corpus-side prefix table is needed.
    The gram order is (corpus document frequency asc, gram asc);
    corpus-unseen grams get df 0 — rarest, which is correct: a gram
    the corpus has never seen cannot generate any join hit.

    Scale shape: the corpus leg is (a) one slim (blk, gram) explode ->
    groupBy for the df index — in production this index is maintained
    incrementally, the one-time build amortizes — and (b) one probe
    scan joined against the BROADCAST batch prefix table, whose hits
    are bounded by the corpus frequency of the batch's RAREST grams
    (that is the point of prefix probing: boilerplate grams never
    probe). Verification joins the bounded candidate set back to
    corpus gram arrays with the batch arrays broadcast — output-
    sensitive. The corpus never shuffles a gram array; batch-internal
    duplicates are out of scope (run :func:`ppjoin_pairs` on the batch
    for those).

    Int64-exact threshold bounds throughout (the ppjoin_pairs ceil
    discipline).
    """
    pct = int(thr_pct)
    if not 0 < pct <= 100:
        raise ValueError("thr_pct must be in (0, 100]")
    grams_of = (
        (lambda t: shingles(t, shingle_n)) if shingle_n > 1 else F.array_distinct
    )

    def tok_of(df):
        # repartition BEFORE the interpreted shingle lambdas (a small
        # corpus reads as one task and tokenization is CPU-bound), and
        # filter ABOVE the cache: a filter inside the cached plan gets
        # pushed below the exchange into the scan, running the whole
        # tokenize+shingle expression single-threaded (see
        # _ppjoin_prefix — measured 6x at sf0.1).
        n_part = default_parallelism(df.sparkSession)
        base = (
            df.repartition(n_part, F.col("doc_id"))
            .select(
                "doc_id",
                F.col(block_col).alias("blk"),
                grams_of(tokens(F.col(text_col))).alias("__g"),
            )
            .withColumn("__ng", F.size("__g").cast("long"))
        )
        return tracked_cache(base).where(F.col("__ng") > 0)

    ctok = tok_of(corpus)
    btok = tok_of(batch)
    # corpus df index: slim (blk, gram) pairs only
    cg = ctok.select("doc_id", "blk", "__ng", F.explode("__g").alias("gram"))
    dfreq = cg.groupBy("blk", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    # batch prefix under (corpus df asc, gram asc); unseen grams df 0
    bg = btok.select("doc_id", "blk", "__ng", F.explode("__g").alias("gram"))
    bj = bg.join(dfreq, ["blk", "gram"], "left").withColumn(
        "__df", F.coalesce(F.col("__df"), F.lit(0).cast("long"))
    )
    pos = F.row_number().over(Window.partitionBy("doc_id").orderBy("__df", "gram"))
    plen = F.col("__ng") - F.expr(f"({pct} * __ng + 99) div 100") + 1
    bpre = (
        bj.withColumn("__pos", pos.cast("long"))
        .where(F.col("__pos") <= plen)
        .select(
            "blk", "gram", F.col("doc_id").alias("doc_id"), F.col("__ng").alias("__nb")
        )
    )
    # probe: corpus gram explode joins the broadcast batch prefix;
    # length filter int64-exact (t*max <= min)
    cand = (
        cg.join(F.broadcast(bpre.withColumnRenamed("doc_id", "__bid")), ["blk", "gram"])
        .where(
            F.lit(100) * F.least(F.col("__ng"), F.col("__nb"))
            >= F.lit(pct) * F.greatest(F.col("__ng"), F.col("__nb"))
        )
        .select(F.col("doc_id").alias("match_id"), F.col("__bid").alias("doc_id"))
        .distinct()
    )
    fb = btok.select(
        F.col("doc_id"),
        F.col("__g").alias("__gb"),
        F.col("__ng").alias("__nb"),
    )
    fc = ctok.select(
        F.col("doc_id").alias("match_id"),
        F.col("__g").alias("__gc"),
        F.col("__ng").alias("__nc"),
    )
    v = (
        cand.join(fc, "match_id")
        .join(F.broadcast(fb), "doc_id")
        .withColumn(
            "__inter", F.size(F.array_intersect("__gb", "__gc")).cast("long")
        )
        .withColumn("__union", F.col("__nb") + F.col("__nc") - F.col("__inter"))
        .where(F.lit(100) * F.col("__inter") >= F.lit(pct) * F.col("__union"))
    )
    jac = F.round(F.col("__inter").cast("double") / F.col("__union").cast("double"), 6)
    return v.select("doc_id", "match_id", jac.alias("jaccard")).orderBy(
        "doc_id", "match_id"
    )


def containment_index(
    corpus: DataFrame,
    text_col: str = "text",
    block_col: str = "source",
    shingle_n: int = 1,
    max_gram_docs: int | None = None,
) -> DataFrame:
    """Slim corpus inverted index for the one-sided containment screen:
    one ``(blk, gh, match_id)`` row per (corpus doc, distinct gram).

    This is the frame a production pipeline PERSISTS and maintains
    incrementally (append new docs' gram rows; nothing recomputes) and
    the static side of :func:`tsod_spark.streaming.
    stream_containment_screen` — in streaming it joins every
    micro-batch, so it must never carry gram arrays or text, only the
    8-byte hash and the two ids. ``max_gram_docs`` caps boilerplate
    grams (a gram in B corpus docs emits B hits per arriving doc that
    has it); capped grams UNDERCOUNT intersections — the documented
    cap_hot_buckets trade, observable via :func:`hot_bucket_stats` on
    this frame.
    """
    n_part = default_parallelism(corpus.sparkSession)
    grams = (
        (lambda t: shingles(t, shingle_n))
        if shingle_n > 1
        else (lambda t: F.array_distinct(t))
    )
    idx = (
        corpus.repartition(n_part, F.col("doc_id"))
        .select(
            F.col("doc_id").alias("match_id"),
            F.col(block_col).alias("blk"),
            # explode_OUTER + isNotNull on the OUTPUT column instead
            # of a plain explode (r14): InferFiltersFromGenerate would
            # copy the whole gram chain into an inferred scan filter
            # and predicate pushdown sinks it below the repartition
            # exchange (single-task double evaluation — guide §4.4).
            # No filter is inferrable from an outer generate, and the
            # explicit null screen references the exploded int64 gh —
            # it cannot be pushed below the Generate — so the rows are
            # EXACTLY the inner explode's (the index artifact keeps
            # its no-null contract) at one full-parallelism pass.
            F.explode_outer(
                F.transform(
                    grams(tokens(F.col(text_col))), lambda x: F.xxhash64(x)
                )
            ).alias("gh"),
        )
        .where(F.col("gh").isNotNull())
    )
    return cap_hot_buckets(idx, ["blk", "gh"], max_gram_docs)


def containment_screen_new_docs(
    corpus: DataFrame,
    batch: DataFrame,
    thr_pct: int = 80,
    text_col: str = "text",
    block_col: str = "source",
    shingle_n: int = 1,
    index: DataFrame | None = None,
) -> DataFrame:
    """One-sided incremental CONTAINMENT screen — "is this arriving
    doc's vocabulary mostly inside something the corpus already has?":
    for each batch doc B, every in-block corpus doc C with
    ``C(B->C) = |B n C| / |B| >= thr_pct/100``, with the exact ratio.

    Closes the incremental-screen matrix (VERDICT r9 missing #4):
    ppjoin_screen_new_docs catches symmetric near-dups (Jaccard),
    winnow_screen_new_docs catches shared SPANS; this catches the
    asymmetric case both miss — a short arriving doc that is a quote /
    excerpt / template instantiation of a standing document (J ~ |B|/|C|
    can be arbitrarily small, containment is 1.0).

    Engine: the slim corpus inverted index (:func:`containment_index` —
    pass a persisted one via ``index``; the default rebuild is for the
    self-contained registered demo) equi-joins the exploded batch
    grams on ``(blk, gh)``; every join hit IS one intersection element,
    so the per-(doc, match) count is |B n C| exactly, and the threshold
    ``100*inter >= pct*|B|`` is int64-exact. The batch side is
    broadcast (an ingest batch is small by definition); the corpus
    index never shuffles. Candidates are bounded by the corpus
    document frequency of the batch's grams — output-sensitive, the
    same bound as the other screens. Corpus-internal duplication is
    out of scope (run :func:`containment_pairs` for that).
    """
    pct = int(thr_pct)
    if not 0 < pct <= 100:
        raise ValueError("thr_pct must be in (0, 100]")
    cidx = (
        index
        if index is not None
        else containment_index(corpus, text_col, block_col, shingle_n)
    )
    grams = (
        (lambda t: shingles(t, shingle_n))
        if shingle_n > 1
        else (lambda t: F.array_distinct(t))
    )
    n_part = default_parallelism(batch.sparkSession)
    btok = (
        batch.repartition(n_part, F.col("doc_id"))
        .select(
            "doc_id",
            F.col(block_col).alias("blk"),
            F.transform(
                grams(tokens(F.col(text_col))), lambda x: F.xxhash64(x)
            ).alias("__gh"),
        )
        .withColumn("__nb", F.size("__gh").cast("long"))
    )
    bg = btok.select(
        "doc_id", "blk", "__nb",
        # explode_OUTER for the same reason as jaccard_pairs_index
        # (r14): no inferrable filter means the batch gram chain is
        # not duplicated below the batch repartition; null-gh rows
        # drop in the (blk, gh) equi-join.
        F.explode_outer("__gh").alias("gh"),
    )
    hits = cidx.join(F.broadcast(bg), ["blk", "gh"])
    out = (
        hits.groupBy("doc_id", "match_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_grams"),
            F.first("__nb").alias("__nb"),
        )
        .where(F.lit(100) * F.col("shared_grams") >= F.lit(pct) * F.col("__nb"))
    )
    cont = F.round(
        F.col("shared_grams").cast("double") / F.col("__nb").cast("double"), 6
    )
    return out.select(
        "doc_id", "match_id", "shared_grams", cont.alias("containment")
    ).orderBy("doc_id", "match_id")


def lsh_tuning_curve(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    band_configs: tuple[int, ...] = (1, 2, 4, 8),
    thr_pct: int = 50,
    shingle_n: int = 3,
) -> DataFrame:
    """Band-count TUNING CURVE for the MinHash LSH tier — the
    companion to :func:`tsod_spark.pipeline.similarity
    .ivf_recall_curve` for the other approximate index in the repo:
    per banding b in ``band_configs`` (r = k/b rows per band), the
    candidate-pair volume and the recall of signature-similar pairs
    (estimated Jaccard >= thr_pct/100), so an operator reads the
    volume/recall knee and fixes (b, r) before a 100 TB run.

    Unlike the IVF curve this one needs NO certificate: MinHash here
    is seeded md5 (engine-exact by design), so every number —
    candidates, truth size, found, recall — is deterministic and
    SQL-reproducible.

    The ground-truth set costs no all-pairs scan: a pair with
    est >= thr > 0 shares at least one signature component, and at
    b = k (one row per band) sharing any component IS candidacy — so
    the truth is exactly the b=k candidate set filtered to est >= thr.
    Three invariants are provable from band nesting (each coarser
    band is a concatenation of finer ones, so a coarse-band match
    implies finer-band matches): candidate volume and found count are
    NONDECREASING in b, and recall at b = k is exactly 1.0.

    All thresholds int64 (``100*matches >= thr_pct*k``); the WHOLE
    curve is ONE band self-join (r14, guide §2.4 remove shuffles
    outright): band nesting means every config's candidate set is a
    subset of the b = k set (sharing a coarse band means sharing its
    r consecutive components, hence at least one), so the single
    finest-banding self-join materializes the superset once and each
    config's candidacy is re-derived PER PAIR ROW from the packed
    signatures — the same md5-of-concatenated-components band keys the
    per-config joins compared, evaluated on both sides of the pair.
    All 2x|configs| counts then come from one conditional-sum
    aggregate over that single pair frame, replacing |configs|
    self-join+distinct subtrees. Per-row values are unchanged (same
    md5 key equality, same int64 threshold), so every curve row equals
    the former per-config aggregate.
    """
    if k % max(band_configs) != 0 or any(k % b for b in band_configs):
        raise ValueError("every band config must divide k")
    if max(band_configs) != k:
        raise ValueError("band_configs must include k (the truth blocking)")
    cfgs = sorted(int(b) for b in band_configs)
    if any(n % p for p, n in zip(cfgs, cfgs[1:])):
        # The docstring's monotonicity invariants are proved FROM BAND
        # NESTING (each coarser band is a concatenation of finer ones),
        # which needs pairwise divisibility — k=12 with (2, 3, 12) would
        # pass the divide-k check but 2∤3 breaks nesting and the
        # registered certificate's nondecreasing pins (ADVICE r10 #4).
        raise ValueError(
            "band_configs must be pairwise nested: each config must "
            f"divide the next (got {cfgs})"
        )
    pct = int(thr_pct)
    sigs = tracked_cache(minhash_signatures(docs, text_col, k, shingle_n))
    # ONE self-join at the finest banding: its candidate set is the
    # superset of every config's (band nesting), and the distinct pair
    # frame carries both packed signatures so per-config candidacy and
    # the match count are per-row expressions, not further joins.
    bf = _band_frame(sigs, k, k)
    a, c = bf.alias("a"), bf.alias("b")
    pairs = (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("__sa"),
            F.col("b.sig").alias("__sb"),
        )
        .distinct()
    )
    matches = sum(
        F.when(
            F.substring(F.col("__sa"), i * 8 + 1, 8)
            == F.substring(F.col("__sb"), i * 8 + 1, 8),
            1,
        ).otherwise(0)
        for i in range(k)
    )
    hit = F.lit(100) * matches >= F.lit(pct * k)

    def _key(sig: str, b: int, j: int):
        # md5 band key j of config b, recomputed from the packed
        # signature — component i is the fixed-width 8-char slice i,
        # so this is md5 of the SAME concatenation _band_frame hashes.
        r = k // b
        return F.md5(
            F.concat(
                *[
                    F.substring(F.col(sig), (j * r + i) * 8 + 1, 8)
                    for i in range(r)
                ]
            )
        )

    cand = {}
    for b_ in cfgs:
        if b_ == k:
            # pair admission at b = k IS single-component key equality
            cand[b_] = F.lit(True)
        else:
            expr = None
            for j in range(b_):
                e = _key("__sa", b_, j) == _key("__sb", b_, j)
                expr = e if expr is None else (expr | e)
            cand[b_] = expr
    # coalesce: an empty candidate set (e.g. all-empty docs -> NULL
    # signatures that never join) must report 0, not NULL
    aggs = []
    for b_ in cfgs:
        aggs.append(
            F.coalesce(F.sum(cand[b_].cast("long")), F.lit(0))
            .cast("long")
            .alias(f"__nc_{b_}")
        )
        aggs.append(
            F.coalesce(F.sum((cand[b_] & hit).cast("long")), F.lit(0))
            .cast("long")
            .alias(f"__nf_{b_}")
        )
    row = pairs.agg(*aggs)
    curve = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b_).cast("long").alias("bands"),
                        F.lit(k // b_).cast("long").alias("rows_per_band"),
                        F.col(f"__nc_{b_}").alias("n_candidates"),
                        F.col(f"__nf_{k}").alias("n_true_pairs"),
                        F.col(f"__nf_{b_}").alias("n_found"),
                    )
                    for b_ in cfgs
                ]
            )
        ).alias("r")
    ).select("r.*")
    recall = F.when(
        F.col("n_true_pairs") > 0,
        F.round(
            F.col("n_found").cast("double")
            / F.col("n_true_pairs").cast("double"),
            6,
        ),
    )
    return curve.select(
        "bands",
        "rows_per_band",
        "n_candidates",
        "n_true_pairs",
        "n_found",
        recall.alias("recall"),
    ).orderBy("bands")


def threshold_curve_sampled(
    docs: DataFrame,
    grid: tuple[int, ...] = (30, 40, 50, 60, 70, 80, 90),
    rate_denom: int = 4,
    text_col: str = "text",
    block_col: str = "source",
    shingle_n: int = 2,
) -> DataFrame:
    """SAMPLED threshold tuning curve (VERDICT r10 #3) — the 100 TB
    variant of the exact ``dedup_threshold_curve``: a knob-read should
    not cost a material fraction of the dedup run it precedes (the
    exact pair pass is linear but large — 51.2M pairs / 127s at the
    sf10 probe), so this estimates the same table from a DETERMINISTIC
    stratified document sample at ~1/``rate_denom`` of the pair-join
    volume, with a binomial CI certificate column.

    Sampling (the doc_stratified_sample / doc_mixture_sample hash
    discipline): within each block, docs rank by
    ``(md5(doc_id), doc_id)`` — a content-deterministic uniform
    priority, stable under re-sharding — and the first
    ``s_blk = ceil(n_blk / rate_denom)`` enter the sample. The pair
    engine then runs with its RIGHT leg restricted to sampled docs
    (``jaccard_pairs_index(b_docs=...)``): each sampled doc's
    pair-Jaccards against ALL lower-id in-block docs are exact, so its
    drop status at every threshold is exact — only the EXPANSION to
    the full corpus is estimated. Join volume scales with the sampled
    share; nothing else about the engine changes.

    Estimators (all deterministic, engine-exact by construction):
    per-block Horvitz-Thompson expansion with int64 floor division —
    ``est = sum_blk (cnt_blk * n_blk) div s_blk`` — summed in int64
    (no cross-block float accumulation, the repo's exact-int64
    discipline); ``drop_share_est`` is ONE final division;
    ``ci95_lo``/``ci95_hi`` bound the corpus drop share with the
    pooled WILSON score interval at z = 1.96. Wilson rather than the
    textbook normal half-width because the latter COLLAPSES to +-0 at
    p-hat = 0 — measured at sf0.1: the exact curve has 7 dropped docs
    in 5000 (share 0.0014), the 25% sample catches none of them, and
    a +-0 interval would falsely exclude the truth, while Wilson's
    upper bound stays z^2/(s + z^2) ~= 0.003. Sampled-vs-exact
    agreement within the interval is pinned at sf0.1 in
    tests/test_round11.py.
    """
    if rate_denom < 1:
        raise ValueError("rate_denom must be >= 1")
    grid_vals = [int(v) for v in grid]
    blk = F.col(block_col).alias("blk")
    bstats = tracked_cache(
        docs.select(blk)
        .groupBy("blk")
        .agg(F.count(F.lit(1)).cast("long").alias("__n_blk"))
        .withColumn(
            "__s_blk", F.expr(f"(__n_blk + {rate_denom} - 1) div {rate_denom}")
        )
    )
    w = Window.partitionBy("blk").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    sample = tracked_cache(
        docs.select("doc_id", blk)
        .withColumn("__rk", F.row_number().over(w).cast("long"))
        .join(bstats, "blk")
        .where(F.col("__rk") <= F.col("__s_blk"))
        .select("doc_id", "blk")
    )
    pairs = jaccard_pairs_index(
        docs, text_col, block_col, shingle_n, b_docs=sample
    )
    # one-pass highest-bucket classification (the exact curve's shape)
    bucket = F.lit(0).cast("long")
    for v in grid_vals:
        bucket = F.when(
            F.col("jaccard") >= F.lit(float(v)) / F.lit(100.0),
            F.lit(v).cast("long"),
        ).otherwise(bucket)
    db = tracked_cache(
        pairs.select("doc_b", bucket.alias("__b"))
        .where(F.col("__b") > 0)
        .groupBy("doc_b", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        .join(
            sample.select(F.col("doc_id").alias("doc_b"), "blk"), "doc_b"
        )
    )
    pair_hist = db.groupBy("blk", "__b").agg(
        F.sum("__c").cast("long").alias("__v")
    )
    doc_hist = (
        db.groupBy("doc_b", "blk")
        .agg(F.max("__b").alias("__mb"))
        .select("blk", F.col("__mb").alias("__b"))
        .groupBy("blk", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("__v"))
    )
    grid_arr = F.array(*[F.lit(v).cast("long") for v in grid_vals])
    gb = bstats.select(
        F.explode(grid_arr).alias("thr_pct"), "blk", "__n_blk", "__s_blk"
    )

    def suffix_est(hist, raw_name, est_name):
        # per-(thr, blk) suffix sum over the <= |grid|-row per-block
        # histogram (tiny NLJ range join, the allowlisted exact-curve
        # shape), then int64 HT expansion and an int64 cross-block sum
        per_blk = (
            gb.join(
                hist,
                (hist["blk"] == gb["blk"]) & (hist["__b"] >= gb["thr_pct"]),
                "left",
            )
            .groupBy("thr_pct", gb["blk"], "__n_blk", "__s_blk")
            .agg(F.coalesce(F.sum("__v"), F.lit(0)).cast("long").alias("__cnt"))
        )
        return per_blk.groupBy("thr_pct").agg(
            F.sum("__cnt").cast("long").alias(raw_name),
            F.sum(F.expr("(__cnt * __n_blk) div __s_blk"))
            .cast("long")
            .alias(est_name),
        )
    pair_cum = suffix_est(pair_hist, "n_dup_pairs_sampled", "n_dup_pairs_est")
    doc_cum = suffix_est(doc_hist, "n_docs_dropped_sampled", "n_docs_dropped_est")
    totals = bstats.agg(
        F.sum("__n_blk").cast("long").alias("__n_docs"),
        F.sum("__s_blk").cast("long").alias("__s_tot"),
    )
    # Wilson score interval at z = 1.96, written with one fixed
    # operation order so the DuckDB oracle reproduces it bit-for-bit
    s = F.col("__s_tot").cast("double")
    p_hat = F.col("n_docs_dropped_sampled").cast("double") / s
    z = F.lit(1.96)
    z2 = z * z
    denom = F.lit(1.0) + z2 / s
    center = (p_hat + z2 / (F.lit(2.0) * s)) / denom
    half = (
        z
        * F.sqrt(
            p_hat * (F.lit(1.0) - p_hat) / s
            + z2 / (F.lit(4.0) * s * s)
        )
        / denom
    )
    return (
        pair_cum.join(doc_cum, "thr_pct")
        .crossJoin(F.broadcast(totals))
        .select(
            "thr_pct",
            F.col("__s_tot").alias("n_sampled_docs"),
            "n_dup_pairs_sampled",
            "n_dup_pairs_est",
            "n_docs_dropped_sampled",
            "n_docs_dropped_est",
            F.round(
                F.col("n_docs_dropped_est").cast("double")
                / F.col("__n_docs").cast("double"),
                6,
            ).alias("drop_share_est"),
            F.round(F.greatest(F.lit(0.0), center - half), 6).alias("ci95_lo"),
            F.round(F.least(F.lit(1.0), center + half), 6).alias("ci95_hi"),
        )
        .orderBy("thr_pct")
    )


def exact_cross_source_matrix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    canonical: bool = True,
) -> DataFrame:
    """Exact-duplicate contamination matrix ACROSS sources: for every
    unordered source pair (a <= b), the number of duplicate doc pairs
    with identical content and the number of distinct shared contents
    — the curation question :func:`dedup_rate_by_source`'s
    per-source view cannot answer: WHICH sources overlap (a crawl
    ingested twice under two names shows up as one hot off-diagonal
    cell; boilerplate shows up as a dense row).

    ``canonical=True`` (default) hashes the sorted DISTINCT lowercase
    token set — "same content modulo word order, repetition,
    whitespace, and case", the canonicalization tier between byte
    equality and MinHash (a crawl re-serialized with different
    whitespace is still an exact dup to a curation pipeline).
    ``canonical=False`` hashes raw bytes.

    Scale shape: one shuffle on the content hash, then per-(hash,
    source) counts — the per-hash frame is bounded by |sources|, so
    the within-hash pair expansion is |sources|^2 at worst, never
    doc-quadratic; the final matrix is |sources|^2 rows. Counts are
    closed-form int64 (``n_a * n_b`` cross-source, ``C(n, 2)``
    within-source), so no doc-level pair is ever materialized —
    the same "count, don't enumerate" discipline as
    :func:`hot_bucket_stats`.
    """
    if canonical:
        h = F.md5(
            F.array_join(F.array_sort(distinct_tokens(F.col(text_col))), " ")
        )
    else:
        h = F.md5(F.col(text_col))
    per = (
        docs.select(
            h.alias("__h"),
            F.col(source_col).alias("__s"),
        )
        .groupBy("__h", "__s")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    a = per.select(
        "__h", F.col("__s").alias("source_a"), F.col("__n").alias("__na")
    )
    b = per.select(
        "__h", F.col("__s").alias("source_b"), F.col("__n").alias("__nb")
    )
    j = a.join(b, "__h").where(F.col("source_a") <= F.col("source_b"))
    same = F.col("source_a") == F.col("source_b")
    pair_cnt = F.when(
        same, F.expr("(__na * (__na - 1)) div 2")
    ).otherwise(F.col("__na") * F.col("__nb")).cast("long")
    shared = F.when(same & (F.col("__na") < 2), 0).otherwise(1).cast("long")
    out = (
        j.groupBy("source_a", "source_b")
        .agg(
            F.sum(pair_cnt).cast("long").alias("dup_pairs"),
            F.sum(shared).cast("long").alias("shared_contents"),
        )
        .where(F.col("dup_pairs") > 0)
    )
    return out.orderBy("source_a", "source_b")


def source_containment(
    docs: DataFrame,
    k: int = 8,
    bands: int = 4,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """DIRECTIONAL near-dup containment between sources: for each
    ordered pair (source_a -> source_b), the number and fraction of
    source_a's docs having >= 1 MinHash candidate near-dup in
    source_b. The asymmetric read the symmetric matrices
    (:func:`exact_cross_source_matrix`; the MinHash rollup in
    queries/dedup.py's dedup_cross_source_matrix)
    can't give — a mirror site is ~100% contained in its origin while
    the origin is barely contained in the mirror, and the symmetric
    pair count looks identical either way. The decision differs too:
    high containment(a -> b) with small |a| means DROP source a;
    symmetric overlap between two big crawls means dedup the union.

    Plan: candidate pairs -> doc-source labels -> DISTINCT
    (doc, other_source) so a doc with many partners in one source
    counts once -> per ordered-pair count -> join per-source totals
    (|sources|-row broadcast). Output bounded by |sources|^2.
    """
    pairs = minhash_band_pairs(docs, k=k, bands=bands, text_col=text_col)
    src = docs.select("doc_id", F.col(source_col).alias("__src"))
    lab = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("__src").alias("__sa")
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("__src").alias("__sb")
            ),
            "doc_b",
        )
    )
    # both directions of each unordered pair
    directed = lab.select(
        F.col("doc_a").alias("doc"),
        F.col("__sa").alias("source_a"),
        F.col("__sb").alias("source_b"),
    ).unionByName(
        lab.select(
            F.col("doc_b").alias("doc"),
            F.col("__sb").alias("source_a"),
            F.col("__sa").alias("source_b"),
        )
    )
    contained = (
        directed.distinct()
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("docs_contained"))
    )
    totals = docs.groupBy(F.col(source_col).alias("source_a")).agg(
        F.count(F.lit(1)).cast("long").alias("docs_total")
    )
    return (
        contained.join(F.broadcast(totals), "source_a")
        .select(
            "source_a",
            "source_b",
            "docs_contained",
            "docs_total",
            F.round(
                F.col("docs_contained").cast("double")
                / F.col("docs_total").cast("double"),
                6,
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


def canonicalization_curve(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Dedup NORMALIZATION tuning curve — the knob-curve discipline
    (IVF nprobe, LSH bands, PQ m, threshold grid) applied to the
    canonicalization knob every exact-dedup pipeline has to fix: per
    cumulative tier (raw bytes -> whitespace-collapsed -> lowercased
    -> sorted token multiset -> sorted distinct token set), how many
    documents and duplicate groups that tier's equality surfaces.

    Monotonicity is PROVABLE, not empirical: each tier's canonical
    form is a FUNCTION of the previous tier's (collapse(text) fixes
    tokens; lower() is applied to that string; the sorted multiset is
    a function of the lowered token sequence; distinct of the sorted
    multiset), so equal forms at tier k stay equal at k+1 —
    equivalence classes only coarsen, and ``n_dup_docs`` /
    ``dup_pairs`` are nondecreasing while ``n_distinct_contents`` is
    nonincreasing (range-pinned in tests). The production read: the
    tier where dup mass JUMPS tells you what kind of duplication the
    corpus carries (byte mirrors vs re-serialized whitespace vs
    case-folded vs reshuffled boilerplate).

    Scale shape: ONE pass computes all five hashes per doc, one
    explode to (tier, hash) rows (5x the doc count, no content
    strings), one shuffle for the (tier, hash) counts, |tiers|-row
    output. Counts are closed-form int64 (C(n,2) per content).
    """
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != ""
    )
    t2s = F.array_join(toks, " ")
    t3s = F.lower(t2s)
    t4s = F.array_join(F.array_sort(F.split(t3s, " ")), " ")
    t5s = F.array_join(
        F.array_sort(F.array_distinct(F.split(t3s, " "))), " "
    )
    tier = lambda r, n, h: F.struct(  # noqa: E731
        F.lit(r).cast("long").alias("tier_rank"),
        F.lit(n).alias("tier"),
        F.md5(h).alias("__h"),
    )
    exploded = docs.select(
        F.explode(
            F.array(
                tier(1, "raw", F.col(text_col)),
                tier(2, "whitespace", t2s),
                tier(3, "lowercase", t3s),
                tier(4, "token_multiset", t4s),
                tier(5, "token_set", t5s),
            )
        ).alias("t")
    ).select("t.tier_rank", "t.tier", "t.__h")
    per_content = exploded.groupBy("tier_rank", "tier", "__h").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    return (
        per_content.groupBy("tier_rank", "tier")
        .agg(
            F.sum("__n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_contents"),
            (F.sum("__n") - F.count(F.lit(1)))
            .cast("long")
            .alias("n_dup_docs"),
            F.sum(F.when(F.col("__n") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_dup_groups"),
            F.sum(F.expr("(__n * (__n - 1)) div 2"))
            .cast("long")
            .alias("dup_pairs"),
        )
        .orderBy("tier_rank")
    )


def governance_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    k: int = 8,
    bands: int = 4,
    max_iter: int = 20,
) -> DataFrame:
    """FUSED dedup-governance rollup (VERDICT r11 #6): the single
    per-source artifact an operator reads before committing a 100 TB
    dedup, today assembled from five separate queries
    (canonicalization tiers, exact cross-source matrix, MinHash CC
    groups, canonical selection, rates + directional containment).
    One row per source:

    - ``n_docs``;
    - ``n_dup_docs_raw`` / ``n_dup_docs_canonical``: docs whose
      content hash occurs >= 2 corpus-wide at the byte tier
      (``md5(text)``) and the canonical tier (sorted distinct
      lowercase token set). raw <= canonical is PROVABLE (byte-equal
      texts have equal token sets) — the canonicalization-curve
      monotonicity specialized to the two tiers a governance decision
      actually reads;
    - ``cross_dup_pairs``: closed-form int64 count of this source's
      canonical-identical pairs with OTHER sources (n_a*n_b per
      shared hash — count, don't enumerate);
    - ``n_near_dup`` / ``near_dup_rate``: docs in a MinHash-LSH
      connected component of size >= 2 (shared CC engine);
    - ``n_canonical`` / ``n_dropped`` / ``drop_rate``: keep-best
      selection (longest text, ties to lowest doc_id) within each
      component — what a commit of this dedup would actually delete;
    - ``max_containment`` / ``top_partner``: the strongest DIRECTED
      near-dup containment of this source in any other (mirror
      detection; ties to the lexicographically smallest partner).

    Scale shape — the reason to fuse rather than join five queries:
    the corpus TEXT is scanned ONCE. A single projection computes
    both content hashes, the text length, and the token array;
    the shingle explode feeds the signature aggregate whose groupBy
    keys carry the four slim per-doc scalars through (map-side
    combine collapses to one row per doc per task), and the cached
    result — doc_id, source, 2 hashes, length, k sig components;
    ~100 bytes/doc, the same budget the sig cache alone costs —
    feeds every downstream stage: band pairs (cached once, used by
    BOTH the CC grouping and the containment counts — the naive
    assembly computes them twice), per-(tier, hash) counts, canonical
    selection, and the per-source joins (all |sources|-bounded,
    broadcast). Nothing downstream of the first aggregate ever
    touches text or tokens again.
    """
    txt = F.col(text_col)
    n_part = default_parallelism(docs.sparkSession)
    spread = docs.repartition(n_part, F.col("doc_id"))
    tok = spread.select(
        "doc_id",
        F.col(source_col).alias("source"),
        F.md5(txt).alias("__rh"),
        F.md5(F.array_join(F.array_sort(distinct_tokens(txt)), " ")).alias(
            "__ch"
        ),
        F.length(txt).cast("long").alias("__len"),
        tokens(txt).alias("__t"),
    )
    exploded = tok.select(
        "doc_id",
        "source",
        "__rh",
        "__ch",
        "__len",
        F.explode_outer(shingles(F.col("__t"), 3)).alias("sh"),
    )
    slim = tracked_cache(
        exploded.groupBy("doc_id", "source", "__rh", "__ch", "__len").agg(
            *[F.min(_component(i, F.col("sh"))).alias(f"mh{i}") for i in range(k)]
        )
    )

    # candidate pairs ONCE (cached): CC grouping + containment share it
    pairs = tracked_cache(_minhash_candidate_pairs(slim, k, bands))
    groups = pair_graph_groups(
        pairs, "doc_a", "doc_b", slim.select("doc_id"), "doc_id", max_iter
    )

    # CC + canonical-selection rollup: one window, one groupBy(source)
    w = Window.partitionBy("group_id").orderBy(F.desc("__len"), "doc_id")
    lab = (
        groups.join(slim.select("doc_id", "source", "__len"), "doc_id")
        .withColumn("__rk", F.row_number().over(w))
    )
    n = F.count(F.lit(1)).cast("long")
    nd = F.sum((F.col("group_size") > 1).cast("int")).cast("long")
    nc = F.sum((F.col("__rk") == 1).cast("int")).cast("long")
    cc = lab.groupBy("source").agg(
        n.alias("n_docs"),
        nd.alias("n_near_dup"),
        nc.alias("n_canonical"),
    )

    # both exact tiers in one (tier, hash, source) aggregate
    tiers = slim.select(
        "source",
        F.explode(
            F.array(
                F.struct(
                    F.lit("raw").alias("tier"), F.col("__rh").alias("h")
                ),
                F.struct(
                    F.lit("canonical").alias("tier"), F.col("__ch").alias("h")
                ),
            )
        ).alias("t"),
    ).select("source", "t.tier", "t.h")
    per = tiers.groupBy("tier", "h", "source").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    per_n = per.withColumn(
        "__nt", F.sum("__n").over(Window.partitionBy("tier", "h"))
    )
    tier_stats = per_n.groupBy("source").agg(
        F.sum(
            F.when((F.col("tier") == "raw") & (F.col("__nt") >= 2), F.col("__n"))
            .otherwise(0)
        )
        .cast("long")
        .alias("n_dup_docs_raw"),
        F.sum(
            F.when(
                (F.col("tier") == "canonical") & (F.col("__nt") >= 2),
                F.col("__n"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_dup_docs_canonical"),
    )

    # cross-source exact pairs (canonical tier), closed-form int64
    per_c = per.where(F.col("tier") == "canonical")
    cross = (
        per_c.select("h", "source", F.col("__n").alias("__na"))
        .join(
            per_c.select(
                "h", F.col("source").alias("__sb"), F.col("__n").alias("__nb")
            ),
            "h",
        )
        .where(F.col("source") != F.col("__sb"))
        .groupBy("source")
        .agg(
            F.sum(F.col("__na") * F.col("__nb"))
            .cast("long")
            .alias("cross_dup_pairs")
        )
    )

    # directional containment from the SAME cached pairs
    src = slim.select("doc_id", "source")
    plab = pairs.join(
        src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("__sa")),
        "doc_a",
    ).join(
        src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("__sb")),
        "doc_b",
    )
    directed = plab.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("doc"),
                    F.col("__sa").alias("source_a"),
                    F.col("__sb").alias("source_b"),
                ),
                F.struct(
                    F.col("doc_b").alias("doc"),
                    F.col("__sb").alias("source_a"),
                    F.col("__sa").alias("source_b"),
                ),
            )
        ).alias("e")
    ).select("e.doc", "e.source_a", "e.source_b")
    contained = (
        directed.where(F.col("source_a") != F.col("source_b"))
        .distinct()
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("__dc"))
    )
    totals = slim.groupBy(F.col("source").alias("source_a")).agg(
        F.count(F.lit(1)).cast("long").alias("__dt")
    )
    bw = Window.partitionBy("source_a").orderBy(
        F.desc("containment"), "source_b"
    )
    best = (
        contained.join(F.broadcast(totals), "source_a")
        .withColumn(
            "containment",
            F.round(F.col("__dc").cast("double") / F.col("__dt"), 6),
        )
        .withColumn("__bk", F.row_number().over(bw))
        .where(F.col("__bk") == 1)
        .select(
            F.col("source_a").alias("source"),
            F.col("containment").alias("max_containment"),
            F.col("source_b").alias("top_partner"),
        )
    )

    zero = F.lit(0).cast("long")
    return (
        cc.join(tier_stats, "source", "left")
        .join(cross, "source", "left")
        .join(best, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_dup_docs_raw", zero).alias("n_dup_docs_raw"),
            F.coalesce("n_dup_docs_canonical", zero).alias(
                "n_dup_docs_canonical"
            ),
            F.coalesce("cross_dup_pairs", zero).alias("cross_dup_pairs"),
            "n_near_dup",
            F.round(F.col("n_near_dup") / F.col("n_docs"), 6).alias(
                "near_dup_rate"
            ),
            "n_canonical",
            (F.col("n_docs") - F.col("n_canonical")).cast("long").alias(
                "n_dropped"
            ),
            F.round(
                (F.col("n_docs") - F.col("n_canonical")) / F.col("n_docs"), 6
            ).alias("drop_rate"),
            F.coalesce("max_containment", F.lit(0.0)).alias(
                "max_containment"
            ),
            "top_partner",
        )
        .orderBy("source")
    )


def _est_jaccard_vs(sig_col: Column, other: Column, k: int) -> Column:
    """Signature-agreement Jaccard estimate between a packed-signature
    COLUMN and another packed-signature expression (the lambda-variable
    form of :func:`_est_jaccard`, for use inside array HOFs)."""
    matches = None
    for i in range(k):
        t = (
            F.substring(sig_col, 8 * i + 1, 8)
            == F.substring(other, 8 * i + 1, 8)
        ).cast("int")
        matches = t if matches is None else matches + t
    return F.round(matches / float(k), 6)


def governance_flags(
    docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    min_est_jaccard: float = 0.5,
    max_bucket_occupants: int | None = None,
) -> DataFrame:
    """Per-document governance decision flags against a PERSISTED
    corpus index (:func:`build_corpus_index`) — the shared core of the
    batch and streaming governance rollups, built so the SAME plan
    streams unchanged (every stage is stateless Column algebra or a
    static-side join with at most one match per stream row):

    - ``is_exact_dup``: the doc's content md5 exists among the corpus
      content hashes (distinct static side -> the left join is
      row-preserving);
    - ``is_near_dup``: some LSH band bucket the doc lands in holds a
      corpus occupant with signature-agreement Jaccard >=
      ``min_est_jaccard`` — evaluated per band via a left join against
      the bucket's pre-grouped occupant-signature ARRAY (again at most
      one static row per key) and an ``exists`` HOF, so NO row
      duplication and NO re-aggregation on the stream side, unlike the
      batch screen's explode->join->distinct;
    - ``accepted``: neither.

    Intra-batch (self) duplication is deliberately out of scope: in
    continuous ingest, accepted docs append their own index rows
    between ticks (``build_corpus_index(accepted)`` + append — see
    :func:`incremental_new_docs_indexed`), and within-tick collisions
    are :func:`tsod_spark.streaming.stream_dedup_minhash`'s job.

    Scale shape: the stream side is pure per-row work
    (:func:`minhash_signatures_rowwise` — zero shuffle); the static
    side is ``1 + bands`` slim frames derived from ONE grouped
    occupant-array aggregation of the index (cached — one exchange
    over the index regardless of ``bands``) that production persists
    once, not per tick. All static legs are explicitly BROADCAST, the
    :func:`incremental_new_docs` discipline: without the hint the
    planner estimated the array-typed bucket frames over the 10 MB
    threshold and chained five SortMergeJoins, each re-shuffling the
    DOC side with every previously attached occupant array riding
    through the next exchange (r15 plan audit: 5 doc-side exchanges
    with growing array payloads -> 0; the doc side now never
    shuffles, which is also the shape a stream-static join wants —
    the static side is re-read per micro-batch, the stream side must
    not re-sort). Broadcasting bounds the static side by executor
    memory; an index too large for that is exactly the case
    ``max_bucket_occupants`` + per-band partitioned index storage
    exist for. ``max_bucket_occupants`` caps a hot bucket's occupant
    array (deterministic lowest-signatures-first truncation, the
    ``cap_hot_buckets`` discipline) so boilerplate buckets cannot make
    the near check per-doc unbounded; capped occupants UNDERCOUNT
    near-dups, the same documented trade as every capped screen.
    """
    r = k // bands
    keep = [c for c in docs.columns if c != text_col]
    # content hash rides along BEFORE the signature projection (the
    # rowwise helper keeps every non-text column and drops the text)
    sigs = minhash_signatures_rowwise(
        docs.withColumn("__h", F.md5(F.col(text_col))), text_col, k
    )
    packed = F.concat(*[F.col(f"mh{i}") for i in range(k)])
    doc = sigs.select(
        *keep,
        "__h",
        packed.alias("__sig"),
        *[
            F.md5(
                F.concat(*[F.col(f"mh{b * r + i}") for i in range(r)])
            ).alias(f"__key_{b}")
            for b in range(bands)
        ],
    )

    hashes = (
        index.where(F.col("band") == 0)
        .select(F.col("content_md5").alias("__h"))
        .distinct()
        .withColumn("__exact", F.lit(True))
    )
    out = doc.join(F.broadcast(hashes), "__h", "left")

    occ = F.collect_list("sig")
    if max_bucket_occupants is not None:
        occ = F.slice(F.array_sort(occ), 1, int(max_bucket_occupants))
    # ONE grouped occupant aggregation for all bands (filter-then-group
    # per band partitions the same rows identically, so each filtered
    # slice below is row-for-row the old per-band aggregate), cached so
    # the `bands` broadcast builds read one materialization instead of
    # re-aggregating the index per band
    buckets = tracked_cache(
        index.groupBy("band", "key").agg(occ.alias("__occ"))
    )
    for b in range(bands):
        bucket_b = (
            buckets.where(F.col("band") == b)
            .select(
                F.col("key").alias(f"__key_{b}"),
                F.col("__occ").alias(f"__occ_{b}"),
            )
        )
        out = out.join(F.broadcast(bucket_b), f"__key_{b}", "left")

    near = None
    for b in range(bands):
        hit = F.coalesce(
            F.exists(
                F.col(f"__occ_{b}"),
                lambda o: _est_jaccard_vs(F.col("__sig"), o, k)
                >= min_est_jaccard,
            ),
            F.lit(False),
        )
        near = hit if near is None else near | hit
    return out.select(
        *keep,
        F.coalesce(F.col("__exact"), F.lit(False)).alias("is_exact_dup"),
        near.alias("is_near_dup"),
    ).withColumn(
        "accepted", ~F.col("is_exact_dup") & ~F.col("is_near_dup")
    )


def governance_rollup(
    flags: DataFrame, group_col: str = "source"
) -> DataFrame:
    """Per-source governance increments over a
    :func:`governance_flags` frame: docs seen, exact dups, near-only
    dups (near AND NOT exact — the three buckets partition the docs),
    accepted, and the combined duplicate rate. One aggregation — the
    single stateful operator the streaming twin is allowed."""
    n = F.count(F.lit(1)).cast("long")
    n_exact = F.sum(F.col("is_exact_dup").cast("long")).cast("long")
    n_near = F.sum(
        (F.col("is_near_dup") & ~F.col("is_exact_dup")).cast("long")
    ).cast("long")
    n_acc = F.sum(F.col("accepted").cast("long")).cast("long")
    return flags.groupBy(group_col).agg(
        n.alias("n_docs"),
        n_exact.alias("n_exact_dups"),
        n_near.alias("n_near_dups"),
        n_acc.alias("n_accepted"),
        F.round(
            (n_exact + n_near).cast("double") / n.cast("double"), 6
        ).alias("dup_rate"),
    )


def _hamming_chunks(
    fps: DataFrame,
    id_col: str,
    fp_col: str,
    bits: int,
    max_hamming: int,
) -> DataFrame:
    """The pigeonhole chunk split shared by the batch pair engine and
    the stream-side screen probe: ``(__id, __fp, c, v)`` with one row
    per (fingerprint, chunk)."""
    n_chunks = max_hamming + 1
    if bits % n_chunks:
        raise ValueError(
            f"max_hamming + 1 = {n_chunks} must divide {bits} "
            "so pigeonhole chunks cover the radius exactly"
        )
    width = bits // n_chunks
    return fps.select(
        F.col(id_col).alias("__id"),
        F.col(fp_col).alias("__fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("c"),
                        (
                            # logical shift + AND mask (NOT `%`:
                            # Spark's % keeps the dividend sign, so
                            # the c=0 chunk of a bit-63 fingerprint
                            # would go negative and miss its bucket)
                            F.shiftrightunsigned(
                                F.col(fp_col), c * width
                            ).bitwiseAND(F.lit((1 << width) - 1))
                            if width < 64
                            else F.col(fp_col)
                        ).alias("v"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("__id", "__fp", "ck.c", "ck.v")


def hamming_chunk_index(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fingerprint",
    bits: int = 64,
    max_hamming: int = 3,
) -> DataFrame:
    """The PERSISTED side of incremental Hamming dedup: the corpus'
    fingerprints pre-split into their pigeonhole chunks,
    ``(c, v, match_id, match_fp)`` — build once per corpus release
    (n_chunks rows per fingerprint, ~4x the slim fingerprint table),
    cache or write it, and screen every new batch or stream tick
    against it with a chunk equi-join
    (:func:`tsod_spark.streaming.detect.stream_hamming_screen`) — the
    same frozen-index contract as :func:`build_corpus_index` /
    :func:`containment_index`, applied to the perceptual-hash
    families (image dHash, audio energy fingerprints)."""
    ch = _hamming_chunks(fps, id_col, fp_col, bits, max_hamming)
    return ch.select(
        "c",
        "v",
        F.col("__id").alias("match_id"),
        F.col("__fp").alias("match_fp"),
    )


def hamming_near_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "fingerprint",
    bits: int = 64,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """GENERIC pigeonhole-chunk Hamming pair engine — the
    :func:`simhash_near_pairs` banded shape generalized to any bit
    width and any fingerprint column, so OTHER fingerprint families
    plug into the same machinery (first consumer: 64-bit image dHash
    from :func:`tsod_spark.pipeline.multimodal.image_dhash` — the
    multimodal x dedup unification).

    The ``bits``-wide fingerprint splits into ``max_hamming + 1``
    equal chunks: a pair within the radius differs in fewer bits than
    there are chunks, so by pigeonhole it agrees EXACTLY on at least
    one chunk — the chunk equi-join is a FULL-RECALL candidate
    generator for the advertised radius (blocked recall is provably
    1.0, not probabilistic like MinHash banding), and
    ``bit_count(xor)`` verifies exactly. Chunks extract with a
    LOGICAL shift (``shiftrightunsigned``) so bit-63 fingerprints
    (negative int64s) chunk correctly — the 32-bit simhash engine
    never sees those.

    Returns ``(id_a, id_b, hamming)`` with id_a < id_b, distinct.
    """
    chunked = _hamming_chunks(fps, id_col, fp_col, bits, max_hamming)
    chunked = tracked_cache(cap_hot_buckets(chunked, ["c", "v"], max_bucket))
    a, b = chunked.alias("a"), chunked.alias("b")
    ham = F.bit_count(
        F.col("a.__fp").bitwiseXOR(F.col("b.__fp"))
    ).cast("long")
    return (
        a.join(
            b,
            (F.col("a.c") == F.col("b.c"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
