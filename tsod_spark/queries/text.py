"""Text analysis (pipeline/text.py).

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
    table,
)


# text analysis (pipeline/text.py)


@register(
    "doc_stats",
    f"""WITH d AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_words,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq_words,
           round(len(list_distinct(toks)) / len(toks), 6) AS type_token_ratio,
           round(CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) / len(toks), 6) AS mean_word_len,
           round(least(length(text) / 500.0, 1.0) * (len(list_distinct(toks)) / len(toks)), 6) AS quality_score
    FROM d""",
)
def doc_stats(spark, sf_dir):
    return text.text_stats(table(spark, sf_dir, "documents"))


_SW = ", ".join(f"'{s}'" for s in text.STOPWORDS_EN)


@register(
    "doc_budget_select",
    f"""WITH d AS (SELECT doc_id, source AS part, {TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, part, CAST(len(toks) AS BIGINT) AS n_tokens,
            CASE WHEN len(toks) > 0
                 THEN round(len(list_filter(toks, x -> x IN ({_SW})))
                            / CAST(len(toks) AS DOUBLE), 6) END AS quality
        FROM d),
    r AS (SELECT *, coalesce(sum(n_tokens) OVER w_rank, 0) AS cb,
            CAST(row_number() OVER (PARTITION BY part
                 ORDER BY quality DESC NULLS LAST, doc_id) AS BIGINT) AS sel_rank
        FROM s
        WINDOW w_rank AS (PARTITION BY part
                          ORDER BY quality DESC NULLS LAST, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT doc_id, part, n_tokens, quality, sel_rank
    FROM r WHERE cb < 600""",
)
def doc_budget_select(spark, sf_dir):
    """Token-budget-aware curation: per source, greedily keep the
    highest-stopword-ratio (fluency-proxy) docs until a 600-token
    budget fills (roughly the top 40% of each source's tokens, so the
    cut is non-vacuous at every test scale) — quality-ranked selection via a windowed exact-int
    cumsum, no global sort."""
    return curate.budget_select(table(spark, sf_dir, "documents"), token_budget=600)


@register(
    "doc_quality",
    f"""WITH d AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
            CAST(length(text) AS BIGINT) AS n_chars,
            CAST(len(toks) AS BIGINT) AS n_words,
            length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
            length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
            length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
            len(list_filter(toks, x -> x IN ({_SW}))) AS n_stop
        FROM d),
    r AS (SELECT doc_id, n_chars, n_words,
            CASE WHEN n_chars > 0 THEN round(n_punct / n_chars, 6) END AS punct_ratio,
            CASE WHEN n_chars > 0 THEN round(n_upper / n_chars, 6) END AS upper_ratio,
            CASE WHEN n_chars > 0 THEN round(n_digit / n_chars, 6) END AS digit_ratio,
            CASE WHEN n_words > 0 THEN round(n_stop / n_words, 6) END AS stopword_ratio
        FROM s)
    SELECT *, (n_words < 5 OR coalesce(stopword_ratio < 0.01, TRUE)
               OR coalesce(punct_ratio > 0.2, TRUE)) AS is_low_quality
    FROM r""",
)
def doc_quality(spark, sf_dir):
    return text.quality_signals(table(spark, sf_dir, "documents"))


@register(
    "doc_token_counts",
    f"""SELECT doc_id,
           CAST(len({TOKS}) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '{text.BPE_TOKEN_RE}')) AS BIGINT) AS bpe_tokens
    FROM documents""",
)
def doc_token_counts(spark, sf_dir):
    return text.token_counts(table(spark, sf_dir, "documents"))


def _lang_sql() -> str:
    langs = list(text.LANG_MARKERS)
    scores = []
    for lang, markers in text.LANG_MARKERS.items():
        in_list = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            f"CAST(len(list_filter(toks, x -> x IN ({in_list}))) AS BIGINT) AS score_{lang}"
        )
    whens = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"score_{lang} >= score_{l2}" for l2 in langs[i + 1 :])
        whens.append(f"WHEN {conds} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{langs[-1]}' END"
    return f"""WITH d AS (SELECT doc_id, lang, {TOKS} AS toks FROM documents),
    s AS (SELECT doc_id, lang, {', '.join(scores)} FROM d)
    SELECT doc_id, {', '.join('score_' + lang for lang in langs)},
           {case} AS predicted_lang,
           ({case}) = lang AS matches_label
    FROM s"""


@register("doc_lang_id", _lang_sql())
def doc_lang_id(spark, sf_dir):
    return text.lang_id(table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprints",
    f"""WITH d AS (SELECT doc_id, text, list_sort({DTOKS}) AS toks FROM documents)
    SELECT doc_id,
           md5(text) AS content_md5,
           md5(array_to_string(toks, ' ')) AS bag_md5,
           CAST(list_sum(list_transform(toks, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)) % 2147483647 AS BIGINT) AS bag_hash
    FROM d""",
)
def doc_fingerprints(spark, sf_dir):
    return text.fingerprints(table(spark, sf_dir, "documents"))


@register(
    "doc_repetition",
    f"""WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
    g AS (SELECT doc_id, toks,
            list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i + 1]) AS g2,
            list_transform(range(1, len(toks) - 1),
                           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g3
          FROM t),
    m AS (SELECT doc_id,
            CAST(len(toks) AS BIGINT) AS n_tokens,
            CASE WHEN len(toks) > 0 THEN round(
              list_max(list_transform(list_distinct(toks),
                                      d -> len(list_filter(toks, x -> x = d))))
              / len(toks), 6) END AS top_unigram_share,
            CASE WHEN len(g2) > 0 THEN round(1 - len(list_distinct(g2)) / len(g2), 6) END AS dup_2gram_frac,
            CASE WHEN len(g3) > 0 THEN round(1 - len(list_distinct(g3)) / len(g3), 6) END AS dup_3gram_frac
          FROM g)
    SELECT *,
           coalesce(n_tokens >= 10 AND top_unigram_share > 0.2, FALSE)
           OR coalesce(dup_2gram_frac > 0.4, FALSE)
           OR coalesce(dup_3gram_frac > 0.3, FALSE) AS is_repetitive
    FROM m""",
)
def doc_repetition(spark, sf_dir):
    """Gopher-style repetition quality filters (top-unigram share,
    duplicate n-gram fractions) — pure column algebra, shuffle-free."""
    return text.repetition_signals(table(spark, sf_dir, "documents"))


from ..pipeline import curate  # noqa: E402

_RED = "'[REDACTED]', 'g'"
_EM = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PH = r"\+?[0-9][0-9\- ]{7,}[0-9]"


@register(
    "doc_redact",
    f"""WITH t AS (SELECT doc_id, lower(text) AS txt FROM documents)
    SELECT doc_id,
      CAST(len(regexp_extract_all(txt, '{_EM}')) AS BIGINT) AS n_emails,
      CAST(len(regexp_extract_all(txt, '{_PH}')) AS BIGINT) AS n_phones,
      CAST(len(regexp_extract_all(txt, '\\bcustomer\\b'))
           + len(regexp_extract_all(txt, '\\bsupplier\\b')) AS BIGINT) AS n_terms,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        txt, '{_EM}', {_RED}), '{_PH}', {_RED}),
        '\\bcustomer\\b', {_RED}), '\\bsupplier\\b', {_RED}) AS redacted_text
    FROM t""",
)
def doc_redact(spark, sf_dir):
    """Regex-class (email/phone) + denylist-term redaction with match
    counts — one chained regexp_replace pass, shuffle-free."""
    return curate.redact(table(spark, sf_dir, "documents"))


@register(
    "doc_decontaminate",
    f"""WITH t AS (SELECT doc_id, source, {TOKS} AS toks0 FROM documents),
    d AS (SELECT doc_id, source, {{}} AS gs FROM t),
    bg AS (SELECT DISTINCT unnest(gs) AS g FROM d WHERE source = 'src0'),
    c AS (SELECT doc_id, gs FROM d WHERE source <> 'src0'),
    dg AS (SELECT doc_id, unnest(gs) AS g FROM c),
    h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
          FROM dg JOIN bg USING (g) GROUP BY 1)
    SELECT c.doc_id, CAST(len(gs) AS BIGINT) AS n_grams,
           coalesce(n_hits, 0) AS n_contaminated,
           CASE WHEN len(gs) > 0
                THEN round(coalesce(n_hits, 0) / len(gs), 6) END AS contaminated_frac,
           coalesce(n_hits, 0) > 0 AS is_contaminated
    FROM c LEFT JOIN h ON c.doc_id = h.doc_id""".format(_shingle_sql("toks0", 5)),
)
def doc_decontaminate(spark, sf_dir):
    """GPT-3-style benchmark decontamination: distinct 5-gram collision
    against the (broadcast) src0 benchmark slice — no corpus shuffle."""
    docs = table(spark, sf_dir, "documents")
    return curate.decontaminate(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
        n=5,
    )


@register(
    "doc_split_assign",
    """SELECT doc_id,
           ('0x' || substr(md5(text), 1, 4))::BIGINT % 10 AS bucket,
           CASE WHEN ('0x' || substr(md5(text), 1, 4))::BIGINT % 10 < 8 THEN 'train'
                WHEN ('0x' || substr(md5(text), 1, 4))::BIGINT % 10 < 9 THEN 'val'
                ELSE 'test' END AS split
    FROM documents""",
)
def doc_split_assign(spark, sf_dir):
    """Deterministic content-hash train/val/test assignment (stable
    under re-sharding and corpus growth)."""
    return curate.split_assign(table(spark, sf_dir, "documents"))


@register(
    "doc_pack_sequences",
    f"""WITH t AS (SELECT doc_id, source AS part,
                  CAST(len({TOKS}) AS BIGINT) AS n_tokens FROM documents),
    c AS (SELECT *, coalesce(sum(n_tokens) OVER (
            PARTITION BY part ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM t)
    SELECT doc_id, part, n_tokens,
           CAST(floor(cb / 256) AS BIGINT) AS seq_id,
           CAST(cb % 256 AS BIGINT) AS seq_offset,
           CASE WHEN n_tokens > 0
                THEN floor((cb + n_tokens - 1) / 256) > floor(cb / 256)
                ELSE FALSE END AS straddles_boundary
    FROM c""",
)
def doc_pack_sequences(spark, sf_dir):
    """Greedy in-order token-budget sequence packing per source
    partition (windowed cumsum, no global sort)."""
    return curate.pack_sequences(table(spark, sf_dir, "documents"))


@register(
    "doc_lm_rarity",
    f"""WITH ref AS (SELECT unnest({TOKS}) AS w FROM documents
                    WHERE source IN ('src0', 'src1', 'src2')),
    rc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ref GROUP BY w),
    dt AS (SELECT doc_id, unnest({TOKS}) AS w FROM documents
           WHERE source NOT IN ('src0', 'src1', 'src2')),
    j AS (SELECT doc_id, dt.w, rc.c FROM dt LEFT JOIN rc USING (w))
    SELECT doc_id, CAST(count(w) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END)
                 / CAST(count(w) AS DOUBLE), 6) AS oov_rate,
           round(quantile_cont(coalesce(c, 0), 0.5), 6) AS median_ref_count
    FROM j GROUP BY doc_id""",
)
def doc_lm_rarity(spark, sf_dir):
    """Reference-LM rarity scoring (CCNet-style quality filter): exact
    OOV counts + median reference frequency per doc against a unigram
    LM built from three reference sources — integer statistics and an
    order statistic instead of float log-prob sums, so the oracle
    matches exactly."""
    docs = table(spark, sf_dir, "documents")
    ref_sources = ("src0", "src1", "src2")
    return text.lm_rarity(
        docs.where(~F.col("source").isin(*ref_sources)),
        docs.where(F.col("source").isin(*ref_sources)),
    )


@register(
    "doc_tfidf_topk",
    f"""WITH tk AS (SELECT doc_id, unnest({TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM tk GROUP BY 1, 2),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents),
    s AS (SELECT doc_id, tf.term, tf, df,
                 round(tf * ln((nd + 1) / (df + 1)), 6) AS tfidf
          FROM tf JOIN dfq USING (term) CROSS JOIN n),
    r AS (SELECT *, CAST(row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rk
          FROM s)
    SELECT doc_id, term, tf, df, tfidf, rk FROM r WHERE rk <= 5""",
)
def doc_tfidf_topk(spark, sf_dir):
    """Top-5 TF-IDF keywords per doc (round-before-rank keeps the
    cross-engine top-k stable)."""
    return text.tfidf_topk(table(spark, sf_dir, "documents"))


BM25_TERMS = ("spark", "window", "merge")


@register(
    "doc_bm25_search",
    f"""WITH tk AS (SELECT doc_id, {TOKS} AS toks FROM documents),
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
                  6) AS score,
            CAST(count(*) AS BIGINT) AS n_terms_hit
          FROM tf JOIN dfq USING (term) CROSS JOIN st GROUP BY doc_id),
    r AS (SELECT *, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                         AS BIGINT) AS rk FROM s)
    SELECT doc_id, score, n_terms_hit, rk FROM r WHERE rk <= 20""",
)
def doc_bm25_search(spark, sf_dir):
    """Okapi BM25 full-text ranking for a fixed 3-term query: postings
    filtered to the broadcast term set before any shuffle, exact
    bigint dl·N/Σdl length normalization (see text.bm25_search)."""
    return text.bm25_search(table(spark, sf_dir, "documents"), list(BM25_TERMS))


@register(
    "doc_vocab_overlap",
    f"""WITH tk AS (SELECT source, {TOKS} AS toks FROM documents),
    v AS (SELECT DISTINCT source AS g, unnest({_shingle_sql('toks', 2)}) AS gram
          FROM tk),
    sz AS (SELECT s.g, CAST(coalesce(c.vsz, 0) AS BIGINT) AS vsz
           FROM (SELECT DISTINCT source AS g FROM documents) s
           LEFT JOIN (SELECT g, count(*) AS vsz FROM v GROUP BY g) c
             USING (g)),
    inter AS (SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS n_common
              FROM v a JOIN v b USING (gram) WHERE a.g < b.g GROUP BY 1, 2),
    p AS (SELECT sa.g AS source_a, sb.g AS source_b,
                 sa.vsz AS vocab_a, sb.vsz AS vocab_b
          FROM sz sa CROSS JOIN sz sb WHERE sa.g < sb.g)
    SELECT source_a, source_b, vocab_a, vocab_b,
           CAST(coalesce(n_common, 0) AS BIGINT) AS n_common,
           CASE WHEN vocab_a + vocab_b - coalesce(n_common, 0) > 0
                THEN round(coalesce(n_common, 0)
                     / CAST(vocab_a + vocab_b - coalesce(n_common, 0) AS DOUBLE),
                     6)
                ELSE 0.0 END AS jaccard
    FROM p LEFT JOIN inter ON source_a = ga AND source_b = gb""",
)
def doc_vocab_overlap(spark, sf_dir):
    """Pairwise bigram-vocabulary Jaccard between the 20 sources —
    corpus collapses to a distinct (source, gram) vocabulary first, so
    the self-join runs on vocab scale, not corpus scale."""
    return text.vocab_overlap(table(spark, sf_dir, "documents"))


_SW = "('the', 'a', 'an', 'of', 'and', 'to', 'in', 'is', 'it', 'that')"


@register(
    "doc_curation_pipeline",
    f"""WITH base AS (SELECT doc_id, text, source FROM documents
                     WHERE source <> 'src0'),
    tq AS (SELECT doc_id, text, source, {TOKS} AS toks FROM base),
    qs AS (SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(length(text) AS BIGINT) AS n_chars,
             length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
             len(list_filter(toks, x -> x IN {_SW})) AS n_stop
           FROM tq),
    ql AS (SELECT doc_id, (n_words < 5
            OR coalesce(CASE WHEN n_words > 0 THEN round(n_stop / n_words, 6) END < 0.01, TRUE)
            OR coalesce(CASE WHEN n_chars > 0 THEN round(n_punct / n_chars, 6) END > 0.2, TRUE)) AS low
           FROM qs),
    rg AS (SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS g2,
             list_transform(range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g3
           FROM tq),
    rm AS (SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) > 0 THEN round(
               list_max(list_transform(list_distinct(toks),
                                       d -> len(list_filter(toks, x -> x = d))))
               / len(toks), 6) END AS tus,
             CASE WHEN len(g2) > 0 THEN round(1 - len(list_distinct(g2)) / len(g2), 6) END AS d2,
             CASE WHEN len(g3) > 0 THEN round(1 - len(list_distinct(g3)) / len(g3), 6) END AS d3
           FROM rg),
    rp AS (SELECT doc_id, (coalesce(n_tokens >= 10 AND tus > 0.2, FALSE)
            OR coalesce(d2 > 0.4, FALSE) OR coalesce(d3 > 0.3, FALSE)) AS rep
           FROM rm),
    dk AS (SELECT doc_id, doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS keep_dup
           FROM base),
    bg AS (SELECT DISTINCT unnest({_shingle_sql('toks', 5)}) AS g
           FROM (SELECT {TOKS} AS toks FROM documents WHERE source = 'src0')),
    dg AS (SELECT doc_id, unnest({_shingle_sql('toks', 5)}) AS g FROM tq),
    ch AS (SELECT DISTINCT doc_id FROM dg JOIN bg USING (g)),
    kept AS (SELECT b.doc_id, b.text, b.source FROM base b
             JOIN ql USING (doc_id) JOIN rp USING (doc_id) JOIN dk USING (doc_id)
             WHERE keep_dup AND NOT low AND NOT rep
               AND b.doc_id NOT IN (SELECT doc_id FROM ch)),
    kt AS (SELECT doc_id, source AS part, text,
                  CAST(len({TOKS}) AS BIGINT) AS n_tokens FROM kept),
    kc AS (SELECT *, coalesce(sum(n_tokens) OVER (
             PARTITION BY part ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM kt)
    SELECT doc_id, part, n_tokens,
           CAST(floor(cb / 256) AS BIGINT) AS seq_id,
           CAST(cb % 256 AS BIGINT) AS seq_offset,
           CASE WHEN ('0x' || substr(md5(text), 1, 4))::BIGINT % 10 < 8 THEN 'train'
                WHEN ('0x' || substr(md5(text), 1, 4))::BIGINT % 10 < 9 THEN 'val'
                ELSE 'test' END AS split
    FROM kc""",
)
def doc_curation_pipeline(spark, sf_dir):
    """End-to-end curation composition: quality + repetition + exact-
    dup keeper + decontamination filters, then split assignment and
    sequence packing of the survivors — one lazy Catalyst DAG."""
    docs = table(spark, sf_dir, "documents")
    return curate.curation_pipeline(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
    )




_WINNOW_FPS_CTE = f"""t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
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
          FROM h)"""


@register(
    "doc_winnow_fingerprints",
    f"""WITH {_WINNOW_FPS_CTE}
    SELECT doc_id, unnest(fps) AS fp FROM f""",
)
def doc_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (MOSS, Schleimer et al. SIGMOD'03): the
    minimum 32-bit k-gram hash of every sliding window of 4
    consecutive word-5-gram hashes, distinct per doc. Guarantees any
    shared token run of >= window+k-1 = 8 tokens shares a fingerprint
    while keeping ~2/(window+1) of grams. Pure per-row Column algebra
    (each HOF stage in its own projection), one explode."""
    return text.winnow_fingerprints(table(spark, sf_dir, "documents"))
