"""Round-13 registrations: persisted-index ANN serving (VERDICT r12
#2) — the production shape where the IVF+PQ index is built ONCE,
written to cell-partitioned parquet + metadata JSON, and every query
serves from the stored codes with partition pruning, never retraining
the quantizer inside the query plan (the reference's fit-offline /
save / load-in-production idiom,
/root/reference/docs/getting_started.rst:40-51)."""

from __future__ import annotations

import os

from ..pipeline import similarity
from ._base import register, table
from .similarity import _EXACT_TOPK_CERT, EMB_D as _EMB_D_IMPORT

_INDEX_ROOT = os.environ.get(
    "SPARK_GRAFT_INDEX_ROOT", "/root/repo/spark-warehouse/ann_index"
)


def _source_fingerprint(src: str) -> str:
    """sha256 of the fixture parquet's CONTENT (file bytes; sorted
    relative-name + bytes for a directory-shaped table). The staleness
    gate compares this, not mtimes: a regenerated fixture with an
    identical-or-older mtime (clock skew, archive extraction) must
    still trigger a rebuild — serving a fresh fixture from a stale
    index would silently weaken the exact-twin certificates."""
    import hashlib

    h = hashlib.sha256()
    if os.path.isdir(src):
        for root, _dirs, files in sorted(os.walk(src)):
            for name in sorted(files):
                p = os.path.join(root, name)
                h.update(os.path.relpath(p, src).encode())
                with open(p, "rb") as f:
                    for chunk in iter(lambda: f.read(1 << 20), b""):
                        h.update(chunk)
    else:
        with open(src, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
    return h.hexdigest()


def persisted_index_path(spark, sf_dir: str, encoding: str = "flat") -> str:
    """Build-once gate for the registered demos: the index for a
    fixture directory lives under the (gitignored) warehouse, keyed by
    the fixture's ABSOLUTE path hash (two roots sharing a basename
    must not collide on one cache slot) plus the encoding, and is
    rebuilt when missing, encoded differently, or whenever the
    fixture's embeddings parquet CONTENT no longer matches the
    fingerprint recorded in meta.json at build time. Production
    replaces this gate with pipeline-versioned index releases; the
    serve path is identical either way."""
    import hashlib
    import json

    abs_dir = os.path.abspath(os.path.normpath(sf_dir))
    sf_name = os.path.basename(abs_dir)
    key = hashlib.sha256(abs_dir.encode()).hexdigest()[:10]
    suffix = "" if encoding == "flat" else f"-{encoding}"
    path = os.path.join(_INDEX_ROOT, f"{sf_name}-{key}{suffix}")
    meta_path = os.path.join(path, "meta.json")
    src = os.path.join(sf_dir, "embeddings.parquet")
    fp = _source_fingerprint(src)
    stale = True
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        stale = (
            meta.get("source_fingerprint") != fp
            or meta.get("encoding", "flat") != encoding
        )
    if stale:
        similarity.ivfpq_index_write(
            table(spark, sf_dir, "embeddings"),
            path,
            encoding=encoding,
            extra_meta={"source_fingerprint": fp, "source_path": abs_dir},
        )
    return path


@register("emb_ivfpq_persisted_topk", _EXACT_TOPK_CERT)
def emb_ivfpq_persisted_topk(spark, sf_dir):
    """ANN top-10 served from the PERSISTED IVF+PQ index (VERDICT r12
    #2): metadata (centroids/codebooks — kilobytes) loads on the
    driver, the query routes to n_probe=6 of 16 cells from the
    metadata alone, and the codes scan reads ONLY those cells' parquet
    files via partition pruning (pinned in tests/test_round13.py:
    PartitionFilters carries exactly the probed cells and
    input_file_name() proves only those cell directories are opened).
    ADC ranks
    the 16-byte codes; floats are read only for the broadcast
    shortlist's exact re-rank. Same certificate shape as
    emb_ivfpq_topk (exact brute-force top-10 rows + recall_ok) and
    row-for-row equal to it at identical params/seed
    (differential-tested) — the difference is WHERE the codes come
    from: emb_ivfpq_topk retrains+re-encodes inside every query plan
    (self-containment demo); this query is the 100 TB shape, where the
    build is a scheduled ingest job and serving touches
    n_probe/n_cells of the stored bytes."""
    emb = table(spark, sf_dir, "embeddings")
    path = persisted_index_path(spark, sf_dir)
    ann = similarity.ivfpq_persisted_topk(spark, path, emb, n_probe=6)
    return similarity.recall_certificate(emb, ann, min_recall=0.3)


def _gov_increments_sql(k: int = 8, bands: int = 4, tau: float = 0.5) -> str:
    """Brute-force DuckDB twin of governance_flags + governance_rollup
    on the %7 batch/corpus split: exact = md5(text) hit against any
    INDEXED corpus doc (docs with >= 1 shingle — explode->groupBy
    signatures drop shingle-less docs from the index, mirrored here;
    every fixture doc has >= 3 tokens so the restriction is currently
    vacuous), near = any same-band bucket collision with a corpus doc
    at signature-agreement est >= tau."""
    from .dedup import MH_BASE, _mh_cols_sql

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
    est = f"round(({matches}) / {float(k)}, 6)"
    exact_rate = "CAST(sum(CAST(is_exact AS INT)) AS BIGINT)"
    nearo_rate = "CAST(sum(CAST(is_near AND NOT is_exact AS INT)) AS BIGINT)"
    return f"""{MH_BASE},
    sig AS (SELECT doc_id, {_mh_cols_sql(k)} FROM d),
    bands AS ({bands_cte}),
    bb AS (SELECT * FROM bands WHERE doc_id % 7 = 0),
    cb AS (SELECT * FROM bands WHERE doc_id % 7 <> 0),
    near AS (SELECT DISTINCT b.doc_id FROM cb a JOIN bb b
               ON a.band = b.band AND a.key = b.key WHERE {est} >= {tau}),
    exact AS (SELECT DISTINCT b.doc_id FROM documents a JOIN documents b
                ON md5(a.text) = md5(b.text)
              WHERE a.doc_id % 7 <> 0 AND b.doc_id % 7 = 0
                AND a.doc_id IN (SELECT doc_id FROM d WHERE len(dtoks) > 0)),
    f AS (SELECT doc_id, source,
            doc_id IN (SELECT doc_id FROM exact) AS is_exact,
            doc_id IN (SELECT doc_id FROM near) AS is_near
          FROM documents WHERE doc_id % 7 = 0)
    SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       {exact_rate} AS n_exact_dups,
       {nearo_rate} AS n_near_dups,
       CAST(sum(CAST(NOT is_exact AND NOT is_near AS INT)) AS BIGINT)
         AS n_accepted,
       round(CAST({exact_rate} + {nearo_rate} AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS dup_rate
    FROM f GROUP BY source ORDER BY source"""


@register("dedup_governance_increments", _gov_increments_sql())
def dedup_governance_increments(spark, sf_dir):
    """Per-source governance INCREMENTS of one ingest tick (VERDICT
    r12 #6's batch half): the %7 batch screened against the persisted
    LSH index of the standing corpus
    (pipeline.dedup.build_corpus_index), rolled up per source as docs
    seen / exact dups / near-only dups / accepted / dup rate — exactly
    what the streaming twin (streaming.stream_governance_rollup, the
    41st twin, batch-equivalence tested in tests/test_round13.py)
    emits cumulatively per micro-batch. The flag engine
    (pipeline.dedup.governance_flags) is row-preserving by
    construction: a distinct-hash left join plus per-band left joins
    against pre-grouped occupant-signature arrays checked with an
    exists HOF — no explode fan-out, no re-aggregation, which is what
    lets the SAME plan run unchanged under Structured Streaming's
    single-stateful-operator rule. Corpus text is scanned once (the
    cached slim index is reused by the hash set and all four band
    frames); the batch side is scanned once more."""
    from pyspark.sql import functions as F

    from ..pipeline import dedup
    from ..util import tracked_cache

    from ..util import default_parallelism

    docs = table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    batch = docs.where(F.col("doc_id") % 7 == 0)
    # spread the corpus before indexing: build_corpus_index hashes at
    # scan parallelism (spread=False — right for a corpus at rest in
    # many files), but the demo fixture is ONE parquet file = one task
    # for the CPU-bound shingle+md5 pass; signatures are per-doc
    # deterministic so results are partition-independent (r14, guide
    # §2 input skew / §4 per-task work)
    idx = tracked_cache(
        dedup.build_corpus_index(
            corpus.repartition(
                default_parallelism(spark), F.col("doc_id")
            )
        )
    )
    # spread the batch side too (r15): with every static leg broadcast
    # the doc side has NO exchange left, so its rowwise minhash + four
    # exists-HOF probes run entirely on the single scan task of the
    # one-file fixture (stage profile: 0.69s 1-task stage). Same
    # partition-independence argument as the corpus spread.
    flags = dedup.governance_flags(
        batch.repartition(default_parallelism(spark), F.col("doc_id")),
        idx,
    )
    return dedup.governance_rollup(flags).orderBy("source")


@register(
    "emb_ivfpq_persisted_recall_curve",
    """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS total FROM embeddings),
    g AS (SELECT unnest([1, 2, 4, 8, 16]) AS np)
    SELECT CAST(np AS BIGINT) AS n_probe, CAST(np AS BIGINT) AS cells_read,
       TRUE AS recall_floor_ok, TRUE AS scan_monotone_ok,
       CASE WHEN np = 16 THEN total - 1 ELSE NULL END
         AS full_probe_rows_scanned
    FROM g CROSS JOIN n ORDER BY n_probe""",
)
def emb_ivfpq_persisted_recall_curve(spark, sf_dir):
    """n_probe TUNING CURVE over the PERSISTED IVF+PQ index — the
    serve-side twin of emb_ivf_recall_curve, run against the index
    that will actually serve: per n_probe in {1,2,4,8,16}, candidates
    come from the stored codes (the encode was paid once at build
    time — nothing retrains or re-encodes; since r14 the whole curve
    is ONE full codes scan ADC-scored once — probe-ranked per cell,
    per-width window shortlists, one fused refine — which is
    I/O-optimal for a sweep whose widest probe reads every cell
    anyway, cheap enough to re-run after every index release at
    100 TB; per-probe SERVING keeps the partition-pruned scan,
    emb_ivfpq_persisted_topk). Certificates: (a) recall@10 >= a
    measured-stable per-level floor (measured 0.0/0.2/0.4/0.5/0.6
    across the three fixtures; floors set at half: 0/0.1/0.2/0.25/
    0.3), (b) rows_scanned NONDECREASING (probe sets are nested —
    provable), and (c) the full-probe scan anchor is EXACT and
    SQL-reproducible: at n_probe = n_cells every cell is read so
    rows_scanned = N - 1. NOTE the deliberate differences from the
    IVF curve: recall is NOT certified monotone (ADC ranks by
    quantized distance, so a wider probe can admit a candidate whose
    ADC beats an exact member's — the displacement argument only
    holds in the exact metric; measured non-monotone at sf0.01:
    1.0 -> 0.9 -> 0.8) and there is NO full-probe recall=1.0 anchor
    (the k*refine ADC shortlist can exclude an exact member even with
    every cell probed). The raw curve stays available via
    pipeline.similarity.ivfpq_persisted_recall_curve."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..util import cache_scope

    floors = {1: 0.0, 2: 0.1, 4: 0.2, 8: 0.25, 16: 0.3}
    emb = table(spark, sf_dir, "embeddings")
    path = persisted_index_path(spark, sf_dir)
    with cache_scope():
        curve = similarity.ivfpq_persisted_recall_curve(spark, path, emb)
        floor_col = F.create_map(
            *[F.lit(x) for kv in floors.items() for x in kv]
        )[F.col("n_probe").cast("int")]
        w = Window.orderBy("n_probe")
        out = curve.select(
            "n_probe",
            "cells_read",
            (F.col("recall_k") >= floor_col).alias("recall_floor_ok"),
            F.coalesce(
                F.col("rows_scanned") >= F.lag("rows_scanned").over(w),
                F.lit(True),
            ).alias("scan_monotone_ok"),
            F.when(F.col("n_probe") == 16, F.col("rows_scanned")).alias(
                "full_probe_rows_scanned"
            ),
        ).orderBy("n_probe")
        # materialize inside the scope so the ground-truth cache drops
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


@register("emb_ivfpq_residual_topk", _EXACT_TOPK_CERT)
def emb_ivfpq_residual_topk(spark, sf_dir):
    """RESIDUAL-encoded IVF+PQ top-10 (the canonical FAISS
    ``IVFxx,PQyy`` composition): PQ codes quantize
    ``x - centroid[cell(x)]`` instead of the raw vector, buying
    strictly lower quantization distortion at identical (m, k)
    (measured ~10% on every fixture, pinned in tests) at the cost of a
    per-PROBED-CELL ADC table at serve time (n_probe small broadcast
    tables instead of one — the query residual differs per cell).
    Same exact-top-10 certificate as the flat emb_ivfpq_topk;
    measured recall@10 at n_probe=6: 0.4/0.9/0.6 across the fixtures
    (threshold 0.3 — comparable to flat, better at the largest
    fixture, noisier at the 500-vector toy where per-cell codebooks
    starve for sample). The build output schema matches the flat
    build, so ivfpq_index_write's cell-partitioned persistence and
    partition-pruned serving apply unchanged."""
    emb = table(spark, sf_dir, "embeddings")
    return similarity.recall_certificate(
        emb, similarity.ivfpq_residual_topk(emb, n_probe=6), min_recall=0.3
    )


@register(
    "dedup_embedding_cell_block_stats",
    f"""WITH v AS (SELECT vec_id, {{EMB_D}} AS ve FROM embeddings),
    p AS (SELECT a.vec_id AS va, b.vec_id AS vb
          FROM v a JOIN v b ON a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.ve, b.ve)
                 / (sqrt(list_dot_product(a.ve, a.ve))
                    * sqrt(list_dot_product(b.ve, b.ve))), 6) >= 0.3)
    SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_exact_pairs,
       CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vectors,
       TRUE AS blocked_coverage_ok,
       TRUE AS candidate_ratio_ok""".replace("{EMB_D}", _EMB_D_IMPORT),
)
def dedup_embedding_cell_block_stats(spark, sf_dir):
    """Cell-blocked semantic-dedup certificate (the SemDeDup blocking
    pattern, fed by the PERSISTED ANN index): reusing the IVF coarse
    cells as dedup blocks, one row certifies (a) the same-cell
    blocking recovers >= 20% of the exact cosine>=0.3 near-dup pairs
    (measured 0.24-0.32 across fixtures — tau=0.3 is the loose
    fixture-scale threshold; production tau~0.9 pairs share cells
    almost surely, and top-2 multi-probe lifts coverage ~2.2x at
    ~3.8x candidate cost — measured, not prose:
    dedup_embedding_multiprobe_stats) and (b) the blocked path
    examines <= 15% of all
    C(N,2) pairs (measured 7-9% with 16 cells — the quadratic cut
    that makes blocked dedup runnable when all-pairs is not). The
    exact pair count (hash-anchored, brute force) is the TEST-SCALE
    certificate cost, the recall_certificate contract; at 100 TB only
    the blocked equi-join runs. The cells come from the SAME persisted
    index emb_ivfpq_persisted_topk serves — one index, two workloads
    (search + dedup blocking).

    Regime boundary (VERDICT r13 #3): above 100k vectors the exact
    side switches to the seeded stratified pair sample
    (embedding_cell_block_stats_sampled — the threshold_curve_sampled
    precedent), so the certificate itself scales; the driver matrix
    is hard-bounded either way. All driver fixtures (<=20k vectors at
    sf1) run exact; the sf10 SCALE probe (200k) runs sampled."""
    emb = table(spark, sf_dir, "embeddings")
    path = persisted_index_path(spark, sf_dir)
    codes, _meta = similarity.ivfpq_index_load(spark, path)
    return similarity.embedding_cell_block_stats(
        emb, codes.select("vec_id", "cell"), auto_sample=True
    )
