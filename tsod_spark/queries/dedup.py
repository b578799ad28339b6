"""Deduplication (pipeline/dedup.py).

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


def _cap_stats_sql(max_bucket: int = 2) -> str:
    ctes, _ = _mh_pairs_parts()
    drop = f"CASE WHEN bsz > {max_bucket} THEN bsz ELSE 0 END"
    return f"""WITH {ctes},
    pb AS (SELECT band, key, CAST(count(*) AS BIGINT) AS bsz
           FROM bands GROUP BY band, key)
    SELECT CAST(count(*) AS BIGINT) AS total_buckets,
           CAST(sum(CASE WHEN bsz > {max_bucket} THEN 1 ELSE 0 END) AS BIGINT)
               AS dropped_buckets,
           CAST(sum(bsz) AS BIGINT) AS total_rows,
           CAST(sum({drop}) AS BIGINT) AS dropped_rows,
           round(CAST(sum({drop}) AS DOUBLE) / sum(bsz), 6) AS dropped_row_frac
    FROM pb"""


@register("dedup_cap_drop_stats", _cap_stats_sql())
def dedup_cap_drop_stats(spark, sf_dir):
    """Truncation observability for the hot-bucket guard — the "no
    silent caps" metric: bucket/row counts the cap in
    dedup_minhash_pairs_capped would drop (same band explode, same
    cap=2, which TRIGGERS at sf0.01). At 100 TB this one-row aggregate
    is what makes LSH recall loss visible in production instead of
    only in tests; it is a map-side-combinable groupBy over the bucket
    key, runnable alongside the capped join at marginal cost."""
    sigs = dedup.minhash_signatures(table(spark, sf_dir, "documents"))
    return dedup.hot_bucket_stats(
        dedup.minhash_band_table(sigs), ["band", "key"], max_bucket=2
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




# winnowing fingerprint CTE chain: tokens -> positional 5-gram hashes
# (md5-prefix int) -> window-4 minima, distinct — ends with
# ``e(doc_id, fp)``; mirrors text.winnow_fingerprints exactly
WINNOW_E_CTE = f"""t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    g AS (SELECT doc_id,
            list_transform(range(1, len(toks) - 3),
                           i -> array_to_string(list_slice(toks, i, i + 4), ' '))
              AS grams
          FROM t),
    h AS (SELECT doc_id,
            list_transform(grams,
                           x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
          FROM g),
    f AS (SELECT doc_id,
            list_distinct(list_transform(range(1, len(hs) - 2),
                          j -> list_min(list_slice(hs, j, j + 3)))) AS fps
          FROM h),
    e AS (SELECT doc_id, unnest(fps) AS fp FROM f)"""


def _winnow_overlap_sql(max_bucket: int | None = None) -> str:
    """Overlap-pair oracle; ``max_bucket`` mirrors cap_hot_buckets on
    the fp key. n_fp (the containment denominator) is computed over the
    UNCAPPED fingerprint set, exactly like the engine."""
    cap_cte = ""
    joined = "sized"
    if max_bucket is not None:
        joined = "capped"
        cap_cte = f""",
    capped AS (SELECT doc_id, fp, n_fp FROM (
        SELECT *, count(*) OVER (PARTITION BY fp) AS bsz FROM sized)
      WHERE bsz <= {max_bucket})"""
    return f"""WITH {WINNOW_E_CTE},
    sized AS (SELECT doc_id, fp,
                     CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_fp
              FROM e){cap_cte}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS shared_fps,
           round(CAST(count(*) AS DOUBLE) / least(a.n_fp, b.n_fp), 6)
             AS containment
    FROM {joined} a JOIN {joined} b
      ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.n_fp, b.n_fp
    HAVING count(*) >= 2"""


@register("dedup_winnow_overlap", _winnow_overlap_sql())
def dedup_winnow_overlap(spark, sf_dir):
    """Partial-overlap (plagiarism-style) detection: pairs sharing >= 2
    winnowing fingerprints, with shared count and containment ratio
    shared/min(|A|,|B|). Catches SHARED SPANS (>= 8 common tokens
    guarantees a shared fingerprint) that whole-document MinHash misses
    when the overlap is a small fraction of each doc. The candidate
    generator is the same bucketed equi-join shape as the LSH families
    and accepts the same hot-bucket cap (dedup.cap_hot_buckets)."""
    return dedup.winnow_overlap_pairs(table(spark, sf_dir, "documents"))


@register("dedup_winnow_overlap_capped", _winnow_overlap_sql(max_bucket=2))
def dedup_winnow_overlap_capped(spark, sf_dir):
    """Winnow overlap pairs with the hot-bucket guard ACTIVE —
    completes the capped family (minhash/simhash twins above): whole
    fingerprint buckets above the cap are dropped before the
    self-join, while containment denominators stay computed over the
    UNCAPPED per-doc fingerprint sets. The cap (2) TRIGGERS at sf0.01
    (28 fp-buckets of size 3 exist; 25 uncapped pairs -> 22 capped) so
    the driver verifies the truncation semantics, not a no-op."""
    return dedup.winnow_overlap_pairs(
        table(spark, sf_dir, "documents"), max_bucket=2
    )


def _winnow_screen_sql(min_shared: int = 2) -> str:
    return f"""WITH {WINNOW_E_CTE},
    bf AS (SELECT * FROM e WHERE doc_id % 20 = 0),
    cf AS (SELECT * FROM e WHERE doc_id % 20 <> 0),
    hits AS (
      SELECT b.doc_id FROM cf c JOIN bf b ON c.fp = b.fp
      GROUP BY c.doc_id, b.doc_id HAVING count(*) >= {min_shared}
      UNION
      SELECT b.doc_id FROM bf a JOIN bf b
        ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id HAVING count(*) >= {min_shared})
    SELECT d.doc_id, d.source FROM documents d
    WHERE d.doc_id % 20 = 0
      AND d.doc_id NOT IN (SELECT doc_id FROM hits)"""


@register("doc_winnow_screen", _winnow_screen_sql())
def doc_winnow_screen(spark, sf_dir):
    """Continuous-ingest SPAN screening (batch = every 20th doc,
    corpus = the rest): survivors are batch docs sharing >= 2 winnowing
    fingerprints with NO corpus doc and no earlier batch doc — the
    partial-overlap complement of dedup_incremental (which screens
    whole-document near-dups; a lifted >= 8-token span collides here
    even when the rest of the document is new). Corpus side: per-row
    Column-algebra fingerprints spread across cores (one up-front text
    repartition — the few-file corpus otherwise fingerprints on a
    single scan task; a standing well-partitioned corpus passes
    spread=False for the zero-text-shuffle ingest shape), batch
    fingerprints broadcast. Streaming twin:
    streaming.stream_winnow_overlap."""
    docs = table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 20 == 0)
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    return dedup.winnow_screen_new_docs(corpus, batch).select("doc_id", "source")


@register(
    "dedup_threshold_curve",
    f"""WITH t AS (SELECT doc_id, source AS blk, {TOKS} AS toks0 FROM documents),
    d AS (SELECT doc_id, blk, {_shingle_sql('toks0', 2)} AS toks FROM t),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_filter(a.toks, t -> list_contains(b.toks, t))) AS inter,
             len(a.toks) + len(b.toks) AS tot
          FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id),
    j AS (SELECT doc_b,
             round(CAST(inter AS DOUBLE) / (tot - inter), 6) AS jac FROM p),
    grid AS (SELECT unnest([30, 40, 50, 60, 70, 80, 90]) AS thr_pct),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    hits AS (SELECT g.thr_pct, CAST(count(*) AS BIGINT) AS n_dup_pairs,
               CAST(count(DISTINCT j.doc_b) AS BIGINT) AS n_docs_dropped
             FROM j JOIN grid g
               ON j.jac >= CAST(g.thr_pct AS DOUBLE) / 100.0 GROUP BY 1)
    SELECT CAST(g.thr_pct AS BIGINT) AS thr_pct,
       CAST(coalesce(h.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
       CAST(coalesce(h.n_docs_dropped, 0) AS BIGINT) AS n_docs_dropped,
       round(CAST(coalesce(h.n_docs_dropped, 0) AS DOUBLE)
             / CAST(tot.n_docs AS DOUBLE), 6) AS drop_share
    FROM grid g CROSS JOIN tot LEFT JOIN hits h ON h.thr_pct = g.thr_pct
    ORDER BY thr_pct""",
)
def dedup_threshold_curve(spark, sf_dir):
    """Dedup threshold tuning curve: for each Jaccard cut in
    {0.30..0.90 step 0.10}, how many near-dup pairs exceed it and how
    many documents the keep-lowest-id rule would drop (a doc is dropped
    at threshold t iff SOME lower-id doc in its block matches it at
    >= t), as a share of the corpus — the "what does moving the knob
    cost" table an operator reads before picking a production
    threshold, instead of re-running the dedup pipeline per candidate
    value.  ONE blocked exact-Jaccard pair pass (the
    pair-bucket-decomposed jaccard_pairs engine, no top-k cut): each
    pair is classified once into its highest passing threshold (same
    `jac >= thr/100` comparisons — bit-identical classification),
    reduced to a CACHED doc-bounded (doc, bucket) count frame, and the
    per-threshold pair/doc counts are suffix sums over <= 8-row
    histograms (a pair passing 0.9 passes every lower cut; a doc drops
    at t iff its max bucket >= t). The r10 sf10 probe motivated this
    shape: the previous 7x threshold-grid explode + 7 countDistincts
    scanned 358M exploded rows at sf10 (152s warm); this is 127s — and
    the remaining cost is the pair pass itself, linear across measured
    decades in the candidate-hit volume (5.1M -> 51.2M pairs for
    sf1 -> sf10).  Thresholds are integer percent keys; the only
    floats are the rounded pair Jaccards compared against shared
    literals."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs_index(docs)
    grid_vals = list(range(30, 100, 10))
    grid_arr = F.array(*[F.lit(v).cast("long") for v in grid_vals])
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("__n_docs"))
    grid = tot.select(
        F.explode(grid_arr).alias("thr_pct"), F.col("__n_docs")
    )
    # ONE pass over the pair table instead of a 7x threshold-grid
    # explode + 7 countDistincts (measured at the sf10 probe: the
    # explode shape scanned 358M exploded rows and dominated the
    # query; this shape is the same two numbers from two bounded
    # aggregations). Each pair is classified once into its HIGHEST
    # passing threshold with the identical `jac >= thr/100.0`
    # comparisons (bit-identical classification — no float boundary
    # is moved), then the per-threshold counts are suffix sums of the
    # <= 8-row histograms: a pair passing at 0.9 passes every lower
    # cut, and a doc is dropped at t iff its MAX passing bucket >= t.
    bucket = F.lit(0).cast("long")
    for v in grid_vals:
        bucket = F.when(
            F.col("jaccard") >= F.lit(float(v)) / F.lit(100.0),
            F.lit(v).cast("long"),
        ).otherwise(bucket)
    from ..util import tracked_cache

    b = pairs.select("doc_b", bucket.alias("__b")).where(F.col("__b") > 0)
    # ONE pass over the pair table: reduce to the doc-bounded
    # (doc_b, bucket) count frame and cache THAT (<= 7 rows per doc);
    # both histograms below derive from it, so the expensive inverted-
    # index pair join never re-executes.
    db = tracked_cache(
        b.groupBy("doc_b", "__b").agg(
            F.count(F.lit(1)).cast("long").alias("__c")
        )
    )
    pair_hist = db.groupBy("__b").agg(F.sum("__c").cast("long").alias("__pc"))
    doc_hist = (
        db.groupBy("doc_b")
        .agg(F.max("__b").alias("__mb"))
        .groupBy("__mb")
        .agg(F.count(F.lit(1)).cast("long").alias("__dc"))
    )
    ph = pair_hist.select(
        F.col("__b").alias("__k"), F.col("__pc").alias("__v")
    )
    dh = doc_hist.select(
        F.col("__mb").alias("__k"), F.col("__dc").alias("__v")
    )

    def suffix(frame, out):
        return (
            grid.select("thr_pct")
            .join(frame, frame["__k"] >= F.col("thr_pct"), "left")
            .groupBy("thr_pct")
            .agg(F.coalesce(F.sum("__v"), F.lit(0)).cast("long").alias(out))
        )

    pair_cum = suffix(ph, "n_dup_pairs")
    doc_cum = suffix(dh, "n_docs_dropped")
    return (
        grid.join(pair_cum, "thr_pct", "left")
        .join(doc_cum, "thr_pct", "left")
        .select(
            "thr_pct",
            F.coalesce(F.col("n_dup_pairs"), F.lit(0).cast("long")).alias(
                "n_dup_pairs"
            ),
            F.coalesce(F.col("n_docs_dropped"), F.lit(0).cast("long")).alias(
                "n_docs_dropped"
            ),
            F.round(
                F.coalesce(F.col("n_docs_dropped"), F.lit(0).cast("long")).cast(
                    "double"
                )
                / F.col("__n_docs").cast("double"),
                6,
            ).alias("drop_share"),
        )
        .orderBy("thr_pct")
    )


_XSRC_CTES, _XSRC_SELECT = _mh_pairs_parts()


@register(
    "dedup_cross_source_matrix",
    f"""WITH {_XSRC_CTES},
    pairs AS ({_XSRC_SELECT}),
    lab AS (SELECT
              CASE WHEN da.source <= db.source THEN da.source
                   ELSE db.source END AS source_a,
              CASE WHEN da.source <= db.source THEN db.source
                   ELSE da.source END AS source_b,
              p.est_jaccard
            FROM pairs p
            JOIN documents da ON da.doc_id = p.doc_a
            JOIN documents db ON db.doc_id = p.doc_b)
    SELECT source_a, source_b,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(est_jaccard), 6) AS avg_est_jaccard,
       source_a <> source_b AS is_cross_source
    FROM lab GROUP BY 1, 2 ORDER BY source_a, source_b""",
)
def dedup_cross_source_matrix(spark, sf_dir):
    """Near-duplicate flow BETWEEN corpus sources: the banded-MinHash
    candidate pairs (the only dedup family whose blocking is global,
    so cross-source duplicates are visible — the Jaccard engines block
    BY source and structurally cannot see them) labeled with both
    docs' sources, normalized to an unordered (source_a <= source_b)
    matrix of pair counts and mean estimated Jaccard.  This is the
    governance question behind licensing and leakage review — "which
    source is copying from which" — answered from the pair table
    alone.  The source labels arrive by two key joins of the slim
    (doc_id, source) projection against the candidate pairs (pairs are
    LSH-bounded, far smaller than the corpus); the matrix is at most
    |sources|^2 rows."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_band_pairs(docs)
    src = docs.select("doc_id", "source")
    lab = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("__sa")
            ),
            "doc_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("__sb")
            ),
            "doc_b",
        )
        .select(
            F.when(F.col("__sa") <= F.col("__sb"), F.col("__sa"))
            .otherwise(F.col("__sb"))
            .alias("source_a"),
            F.when(F.col("__sa") <= F.col("__sb"), F.col("__sb"))
            .otherwise(F.col("__sa"))
            .alias("source_b"),
            "est_jaccard",
        )
    )
    return (
        lab.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg("est_jaccard"), 6).alias("avg_est_jaccard"),
        )
        .withColumn("is_cross_source", F.col("source_a") != F.col("source_b"))
        .orderBy("source_a", "source_b")
    )


@register(
    "dedup_ppjoin_pairs",
    f"""WITH d AS (SELECT doc_id, source AS blk, {DTOKS} AS toks
                   FROM documents WHERE len({DTOKS}) > 0),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_filter(a.toks, t -> list_contains(b.toks, t)))
                  AS BIGINT) AS inter,
             CAST(len(a.toks) + len(b.toks) AS BIGINT) AS tot
          FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
       round(CAST(inter AS DOUBLE) / CAST(tot - inter AS DOUBLE), 6) AS jaccard
    FROM p WHERE 100 * inter >= 90 * (tot - inter)
    ORDER BY doc_a, doc_b""",
)
def dedup_ppjoin_pairs(spark, sf_dir):
    """Exact threshold-Jaccard pairs (J >= 0.90, in-block distinct
    unigrams) via PPJoin-style prefix filtering: each doc joins on only
    its ``|x| - ceil(0.9|x|) + 1`` globally-rarest grams — any
    qualifying pair provably shares a prefix gram, and boilerplate
    grams (the B^2-hit hazard of the full inverted index) sit in
    suffixes and never generate candidates.  All threshold bounds in
    int64 (``100*inter >= pct*union``), so the result is bit-identical
    to a plain exact-Jaccard filter — which is exactly what the oracle
    computes: the optimization must be result-invariant.  The property
    test (tests/test_round8b.py) additionally pins equality against
    jaccard_pairs_index output at the same cut."""
    return dedup.ppjoin_pairs(
        table(spark, sf_dir, "documents"), thr_pct=90, shingle_n=1
    )


@register(
    "dedup_ppjoin_groups",
    f"""WITH RECURSIVE d AS (SELECT doc_id, source AS blk, {DTOKS} AS toks
                   FROM documents WHERE len({DTOKS}) > 0),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
          WHERE 100 * len(list_filter(a.toks, t -> list_contains(b.toks, t)))
             >= 90 * (len(a.toks) + len(b.toks)
                 - len(list_filter(a.toks, t -> list_contains(b.toks, t))))),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM p
              UNION SELECT doc_b, doc_a FROM p),
    reach(doc, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.doc),
    comp AS (SELECT doc, min(root) AS group_id FROM reach GROUP BY doc)
    SELECT doc AS doc_id, group_id,
           CAST(count(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size
    FROM comp""",
)
def dedup_ppjoin_groups(spark, sf_dir):
    """Connected components over the EXACT threshold-Jaccard pair graph
    (J >= 0.90 unigrams via the prefix-filtered ppjoin engine) — the
    guarantee-grade near-dup clustering: unlike the MinHash/SimHash
    group families these edges have no estimation error, so group
    membership is exactly 'transitively connected at >= 0.90'.  Same
    shared min-label-propagation CC engine (driver short-circuit below
    the edge bound, iterative at scale), min-id labels hash-matching
    the recursive-CTE oracle."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.ppjoin_pairs(docs, thr_pct=90, shingle_n=1).select(
        "doc_a", "doc_b"
    )
    return dedup.pair_graph_groups(pairs, "doc_a", "doc_b", docs, "doc_id")


@register(
    "dedup_ppjoin_prefix_stats",
    f"""WITH d AS (SELECT doc_id, source AS blk, {DTOKS} AS toks FROM documents
                   WHERE len({DTOKS}) > 0),
    g AS (SELECT doc_id, blk, CAST(len(toks) AS BIGINT) AS ng,
                 unnest(toks) AS gram FROM d),
    df AS (SELECT blk, gram, CAST(count(*) AS BIGINT) AS dfc
           FROM g GROUP BY 1, 2),
    pos AS (SELECT g.doc_id, g.blk, g.gram, g.ng,
              CAST(row_number() OVER (PARTITION BY g.doc_id
                   ORDER BY df.dfc, g.gram) AS BIGINT) AS pos
            FROM g JOIN df ON g.blk = df.blk AND g.gram = df.gram),
    pre AS (SELECT * FROM pos WHERE pos <= ng - ((90 * ng + 99) // 100) + 1),
    pb AS (SELECT blk, gram, CAST(count(*) AS BIGINT) AS bsz
           FROM pre GROUP BY 1, 2),
    agg AS (SELECT CAST(count(*) AS BIGINT) AS total_buckets,
              CAST(sum(bsz) AS BIGINT) AS total_rows,
              CAST(max(bsz) AS BIGINT) AS max_bucket_rows,
              list_sort(list(CAST(bsz AS DOUBLE))) AS arr
            FROM pb)
    SELECT total_buckets, total_rows, max_bucket_rows,
       round({spark_quantile_sql('arr', 0.99)}, 6) AS p99_bucket_rows,
       round(CAST(max_bucket_rows AS DOUBLE) / CAST(total_rows AS DOUBLE), 6)
           AS max_bucket_frac
    FROM agg""",
)
def dedup_ppjoin_prefix_stats(spark, sf_dir):
    """Fan-out observability for the uncapped PPJoin prefix table
    (VERDICT r8 #6): per-(block, gram) prefix-bucket size distribution
    BEFORE the candidate join — a bucket of size B contributes B²
    candidate hits, so ``max_bucket_rows``/``max_bucket_frac`` is the
    early-warning metric for a corpus whose rare-gram distribution
    degenerates (e.g. a block of near-identical short docs where every
    gram is frequent).  The prefix construction itself (df-asc order,
    gram-string tie-break, int64-exact ceil bounds) is replicated by
    the oracle verbatim, so this check pins the PREFIX TABLE, not just
    the result-invariant pair output that dedup_ppjoin_pairs pins.
    One groupBy + a 1-row aggregate over prefix rows — O(corpus grams),
    map-side combinable, scale-safe."""
    return dedup.ppjoin_prefix_stats(
        table(spark, sf_dir, "documents"), thr_pct=90, shingle_n=1
    )


@register(
    "dedup_containment_pairs",
    f"""WITH d AS (SELECT doc_id, source AS blk, {DTOKS} AS toks FROM documents),
    p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(len(list_filter(a.toks, t -> list_contains(b.toks, t)))
                  AS BIGINT) AS inter,
             CAST(len(a.toks) AS BIGINT) AS na,
             CAST(len(b.toks) AS BIGINT) AS nb
          FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, inter AS shared_grams,
       round(CAST(inter AS DOUBLE) / CAST(na AS DOUBLE), 6) AS containment_a,
       round(CAST(inter AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS containment_b
    FROM p WHERE inter > 0 AND 100 * inter >= 100 * least(na, nb)
    ORDER BY doc_a, doc_b""",
)
def dedup_containment_pairs(spark, sf_dir):
    """Asymmetric vocabulary-containment screen at the strict setting:
    in-block pairs where the smaller doc's ENTIRE distinct-token set
    appears in the larger (max containment = 1.0) — subset duplicates
    and quote-expansions that Jaccard structurally misses (a 50-gram
    quote inside a 5000-gram article has J ~ 0.01, containment 1.0).
    Complements winnowing (shared SPANS) with shared VOCABULARY mass
    when span structure is shuffled.  Same inverted-index engine as
    jaccard_pairs_index (a join hit IS one intersection element), same
    optional hot-gram cap; the screen `100*inter >= pct*least(na,nb)`
    is int64-exact, and both directional ratios are emitted so the
    caller sees which side is the subset."""
    return dedup.containment_pairs(
        table(spark, sf_dir, "documents"), thr_pct=100, shingle_n=1
    )
