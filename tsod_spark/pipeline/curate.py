"""Corpus-curation operators: PII-style redaction, benchmark
decontamination, deterministic split assignment.

These are the corpus-hygiene steps of a pretraining-data pipeline
(reference has no text surface at all — SURVEY §2.4; this family is a
north-star addition alongside dedup/quality/similarity):

- **redact**: regex classes (email, phone) + a denylist term
  dictionary, replaced in one pass of chained ``regexp_replace`` —
  pure column algebra, shuffle-free, any SQL engine reproduces it.
- **decontaminate**: the GPT-3/Dolma-style n-gram collision check.
  Benchmark suites are tiny next to a 100 TB corpus, so the distinct
  benchmark n-gram set BROADCASTS; the corpus explodes its distinct
  n-grams once and hash-joins locally — no corpus shuffle, no
  all-pairs anything. Contamination = any shared n-gram.
- **split_assign**: content-hash bucketing (md5 mod) into
  train/val/test. Keyed on the text itself, not row position, so the
  assignment is stable under re-partitioning, re-sharding, and
  incremental corpus growth — the property that makes holdout splits
  reproducible at scale. Exactly reproducible in any engine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..util import default_parallelism
from .text import all_shingles, tokens

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9\- ]{7,}[0-9]"
REDACTED = "[REDACTED]"


def redact(
    docs: DataFrame,
    text_col: str = "text",
    terms: Sequence[str] = ("customer", "supplier"),
) -> DataFrame:
    """Count and mask email/phone patterns and denylist terms.

    Term matches are word-bounded (``\\b``); both Java and RE2 regex
    engines agree on every construct used here.
    """
    txt = F.lower(F.col(text_col))
    n_emails = F.size(F.regexp_extract_all(txt, F.lit(EMAIL_RE), 0))
    n_phones = F.size(F.regexp_extract_all(txt, F.lit(PHONE_RE), 0))
    term_res = [rf"\b{t}\b" for t in terms]
    n_terms = sum(
        F.size(F.regexp_extract_all(txt, F.lit(tr), 0)) for tr in term_res
    )
    red = F.regexp_replace(txt, EMAIL_RE, REDACTED)
    red = F.regexp_replace(red, PHONE_RE, REDACTED)
    for tr in term_res:
        red = F.regexp_replace(red, tr, REDACTED)
    return docs.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
        n_terms.cast("long").alias("n_terms"),
        red.alias("redacted_text"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
    spread: bool = True,
) -> DataFrame:
    """Flag corpus docs sharing any word n-gram with a benchmark set.

    Per doc: distinct n-gram count, how many collide with the
    benchmark, the collision fraction, and the contaminated flag.

    ``spread`` (the minhash_signatures contract): the default
    repartitions the corpus text once so the tokenize+shingle chain —
    this operator's CPU — is not capped at the scan's task count (a
    few-file corpus is one task); the per-doc aggregate then reuses
    that doc_id partitioning, so the exchange replaces the one the
    grouped count would have needed anyway. ``spread=False`` restores
    the zero-text-shuffle marking for corpora already well-partitioned
    at rest.
    """
    bench_grams = (
        benchmark.select(tokens(F.col(text_col)).alias("__t"))
        .select(
            F.explode(F.array_distinct(all_shingles(F.col("__t"), n))).alias("g")
        )
        .distinct()
    )
    # ONE gram pass over the corpus: explode_outer keeps gram-less docs
    # (NULL g), the broadcast left join marks collisions in place, and
    # the per-doc counts come from the same grouped aggregate — the
    # r1 shape (separate size(__gs) scan + hits join-back on doc_id)
    # computed the gram expression three times, 47s vs 3s at sf0.1.
    # Tokenize in a staged select so the gram expression's internal
    # size guards reference a materialized array, not re-tokenizations.
    if spread:
        docs = docs.repartition(
            default_parallelism(docs.sparkSession), F.col("doc_id")
        )
    doc_grams = docs.select(
        "doc_id", tokens(F.col(text_col)).alias("__t")
    ).select(
        "doc_id",
        F.explode_outer(F.array_distinct(all_shingles(F.col("__t"), n))).alias("g"),
    )
    marked = doc_grams.join(
        F.broadcast(bench_grams.select("g", F.lit(1).alias("__hit"))), "g", "left"
    )
    n_grams = F.count("g").cast("long")
    n_hits = F.coalesce(F.sum("__hit"), F.lit(0)).cast("long")
    return marked.groupBy("doc_id").agg(
        n_grams.alias("n_grams"),
        n_hits.alias("n_contaminated"),
        F.when(n_grams > 0, F.round(n_hits / n_grams, 6)).alias("contaminated_frac"),
        (n_hits > 0).alias("is_contaminated"),
    )


def split_assign(
    docs: DataFrame,
    text_col: str = "text",
    buckets: int = 10,
    train_hi: int = 8,
    val_hi: int = 9,
) -> DataFrame:
    """Deterministic content-hash train/val/test assignment.

    bucket = first 4 md5 hex chars of the text, mod ``buckets``;
    [0, train_hi) -> train, [train_hi, val_hi) -> val, rest -> test.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 4), 16, 10).cast("long")
        % buckets
    )
    split = (
        F.when(bucket < train_hi, "train")
        .when(bucket < val_hi, "val")
        .otherwise("test")
    )
    return docs.select(
        "doc_id", bucket.alias("bucket"), split.alias("split")
    )


def pack_sequences(
    docs: DataFrame,
    text_col: str = "text",
    budget: int = 256,
    part_col: str = "source",
) -> DataFrame:
    """Greedy in-order sequence packing: concatenate documents along
    the ``doc_id`` order within each ``part_col`` partition and cut
    fixed token-budget training sequences — the standard concat-and-
    split batch-prep step for pretraining.

    Per doc: its sequence id, token offset inside that sequence, and
    whether it straddles a sequence boundary (gets split). Packing is
    windowed per partition column, NOT a global sort — each source
    packs independently, so the 100 TB corpus never funnels through
    one reducer. floor() is applied explicitly on both engines (DuckDB
    CAST rounds, Spark CAST truncates — floor is the portable choice);
    cumulative token counts stay exact in doubles below 2^53, far
    above any per-source corpus.
    """
    from pyspark.sql import Window

    n = F.size(tokens(F.col(text_col))).cast("long")
    base = docs.select("doc_id", F.col(part_col).alias("part"), n.alias("n_tokens"))
    w = (
        Window.partitionBy("part")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    seq_id = F.floor(cum_before / budget).cast("long")
    offset = (cum_before % budget).cast("long")
    end_seq = F.floor((cum_before + F.col("n_tokens") - 1) / budget).cast("long")
    return base.select(
        "doc_id",
        "part",
        "n_tokens",
        seq_id.alias("seq_id"),
        offset.alias("seq_offset"),
        F.when(F.col("n_tokens") > 0, end_seq > seq_id)
        .otherwise(F.lit(False))
        .alias("straddles_boundary"),
    )


def curation_pipeline(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    budget: int = 256,
) -> DataFrame:
    """End-to-end corpus curation as ONE lazy plan: quality filter ->
    repetition filter -> exact-dup keeper -> benchmark decontamination
    -> deterministic split -> sequence packing of the survivors.

    Shape, tuned at sf0.1 (26s naive -> ~6s):

    - tokenization is staged into a materialized column (every signal
      references the token array repeatedly; inlined it re-tokenizes
      per reference), and every per-doc signal plus ``md5(text)`` is
      computed BEFORE the dup-keeper window so the exchange carries
      six slim scalar columns — not token/gram arrays or the text.
    - decontamination is an explode + broadcast-join semi-join whose
      hit set anti-joins back (broadcast — contaminated ids are few).
      The per-row ``arrays_overlap`` against the broadcast benchmark
      array was O(|bench|) string probes PER DOC (57M at sf0.1, 2.6s;
      grows with benchmark size); the exploded join is O(actual
      grams) and is the shape that survives a big benchmark suite.
      It costs a second (columnar, cheap) scan of the corpus — the
      measured trade.
    - the corpus text is spread once up front (r15): BOTH corpus legs
      — the signal chain feeding the dup window and the contamination
      gram explode — are tokenize-bound, and a few-file corpus runs
      them on one scan task each; the repartition costs two text-
      carrying exchanges (one per leg's scan) and parallelizes the
      chain that dominates this operator. A corpus well-partitioned
      at rest would skip it, and at that scale the exchange is the
      same no-op-shaped round-robin of bytes the bigram pass uses.
    - beyond those: the md5 dup window, the per-source packing window,
      and the tiny hit-id distinct — slim scalar columns only.
    """
    from pyspark.sql import Window

    from .text import (
        STOPWORDS_EN,
        PUNCT_CLASS,
        all_shingles,
        dup_ngram_frac,
        tokens,
        top_token_count,
    )

    txt = F.col(text_col)
    docs = docs.repartition(
        default_parallelism(docs.sparkSession), F.col("doc_id")
    )
    bench_grams = (
        benchmark.select(tokens(txt).alias("__t"))
        .select(
            F.explode(F.array_distinct(all_shingles(F.col("__t"), 5))).alias("g")
        )
        .distinct()
    )
    tok = docs.select("doc_id", text_col, "source", tokens(txt).alias("__t"))
    contam_ids = (
        tok.select(
            "doc_id",
            F.explode(F.array_distinct(all_shingles(F.col("__t"), 5))).alias("g"),
        )
        .join(F.broadcast(bench_grams), "g")
        .select("doc_id")
        .distinct()
    )
    t = F.col("__t")
    n_words = F.size(t)
    n_chars = F.length(txt)
    n_punct = n_chars - F.length(F.regexp_replace(txt, PUNCT_CLASS, ""))
    sw = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    ratio = lambda num, den: F.when(den > 0, F.round(num / den, 6))  # noqa: E731
    low = (
        (n_words < 5)
        | F.coalesce(ratio(n_stop, n_words) < 0.01, F.lit(True))
        | F.coalesce(ratio(n_punct, n_chars) > 0.2, F.lit(True))
    )
    # each repetition signal referenced exactly once, each building its
    # gram array exactly once over the materialized tokens
    # (dup_ngram_frac/top_token_count shapes)
    rep = (
        F.coalesce(
            (n_words >= 10)
            & (F.when(n_words > 0, F.round(top_token_count(t) / n_words, 6)) > 0.2),
            F.lit(False),
        )
        | F.coalesce(dup_ngram_frac(t, 2) > 0.4, F.lit(False))
        | F.coalesce(dup_ngram_frac(t, 3) > 0.3, F.lit(False))
    )
    base = tok.select(
        "doc_id",
        F.col("source").alias("part"),
        F.md5(txt).alias("__h"),
        n_words.cast("long").alias("n_tokens"),
        low.alias("__low"),
        rep.alias("__rep"),
    )
    dup_w = Window.partitionBy("__h")
    kept = (
        base.withColumn("__keep_dup", F.col("doc_id") == F.min("doc_id").over(dup_w))
        .where(F.col("__keep_dup") & ~F.col("__low") & ~F.col("__rep"))
        .join(F.broadcast(contam_ids), "doc_id", "left_anti")
    )
    # packing + split computed inline on the one kept frame —
    # pack_sequences/split_assign as separate calls would re-derive
    # `kept` (and rescan the corpus) once per branch; the split bucket
    # reuses the dup-keeper's md5
    pw = (
        Window.partitionBy("part")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cb = F.coalesce(F.sum("n_tokens").over(pw), F.lit(0).cast("long"))
    bucket = F.conv(F.substring(F.col("__h"), 1, 4), 16, 10).cast("long") % 10
    return kept.select(
        "doc_id",
        "part",
        "n_tokens",
        F.floor(cb / budget).cast("long").alias("seq_id"),
        (cb % budget).cast("long").alias("seq_offset"),
        F.when(bucket < 8, "train")
        .when(bucket < 9, "val")
        .otherwise("test")
        .alias("split"),
    )


def budget_select(
    docs: DataFrame,
    token_budget: int = 2000,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Token-budget-aware selection: per source, keep the
    highest-quality documents until the token budget fills — the
    "best data under a compute budget" step of curation pipelines
    (quality-ranked greedy take, the shape behind data-pruning /
    curriculum papers).

    Quality key = stopword ratio (a cheap fluency proxy — swap in any
    deterministic per-doc score); a doc is kept while the cumulative
    token count of better-ranked docs is under budget (windowed exact
    int64 cumsum, same discipline as pack_sequences). One window
    shuffle per the per-source partition; NO global sort — at 100 TB
    each source ranks independently.
    """
    from .text import STOPWORDS_EN, tokens

    t = tokens(F.col(text_col))
    n_tokens = F.size(t).cast("long")
    sw = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    quality = F.when(F.size(t) > 0, F.round(n_stop / F.size(t), 6))
    staged = docs.select(
        "doc_id",
        F.col(source_col).alias("part"),
        n_tokens.alias("n_tokens"),
        quality.alias("quality"),
    )
    w = Window.partitionBy("part").orderBy(
        F.col("quality").desc_nulls_last(), "doc_id"
    )
    cb = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return (
        staged.withColumn("__cb", cb)
        .where(F.col("__cb") < token_budget)
        .select(
            "doc_id",
            "part",
            "n_tokens",
            "quality",
            F.row_number().over(w).cast("long").alias("sel_rank"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    target_frac: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-reweighted source mixture (the multilingual-LM /
    data-mixture construction step): sampling probability per source
    ``p_s ∝ sqrt(n_s)`` (temperature α=0.5 — upweights small sources,
    downweights giants), scaled so the expected kept fraction of the
    whole corpus is ``target_frac``. Per-doc keep decisions are
    content-hash Bernoulli draws, so the sample is deterministic,
    engine-independent, and stable under re-sharding.

    Scale shape: per-source counts are a TINY aggregate (one row per
    source) that BROADCASTS back onto the corpus — the fact table never
    shuffles. The u < r comparison is done in exact int64 space
    (32-bit hash vs a floor'd threshold); sqrt/mul/div are
    correctly-rounded IEEE ops, so any engine derives the identical
    threshold from the identical counts.
    """
    counts = docs.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__ns")
    )
    # corpus totals via an unpartitioned window over the TINY per-source
    # frame (one row per source) — not over the corpus. Sum of sqrt's
    # accumulates in exact integer micro-units: float addition is
    # order-sensitive and partial-aggregation order differs across
    # engines/runs — the same discipline as the money paths.
    wa = Window.partitionBy()
    rates = counts.select(
        "__src",
        F.floor(
            F.least(
                F.lit(1.0),
                (F.lit(target_frac) * F.sum("__ns").over(wa))
                / (
                    (
                        F.sum(F.round(F.sqrt("__ns") * 1e6).cast("long")).over(wa)
                        / F.lit(1000000.0)
                    )
                    * F.sqrt("__ns")
                ),
            )
            * F.lit(4294967296.0)
        ).alias("__thr"),
    )
    h32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        docs.join(F.broadcast(rates), docs[source_col] == F.col("__src"))
        .where(h32 < F.col("__thr"))
        .select(F.col(id_col), F.col(source_col))
    )


def stratified_sample(
    docs: DataFrame,
    per_stratum: int = 10,
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """Exact-quota stratified sampling: the ``per_stratum``
    lowest-content-hash docs from every stratum — deterministic,
    engine-independent, exact row counts (unlike Bernoulli sampling's
    binomial jitter), stable under re-sharding. One window shuffle
    keyed by the stratum; rank truncation happens map-side-ish via the
    window, nothing else moves.
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(h, id_col)
    return (
        docs.select(
            F.col(id_col),
            F.col(stratum_col),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= per_stratum)
        .select(id_col, stratum_col, F.col("rk").cast("bigint").alias("rk"))
    )


def weighted_sample(
    docs: DataFrame,
    k: int = 50,
    weight_col: str = "n_chars",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling WITHOUT replacement:
    every row gets key ``-ln(u) / w`` (an Exp(w) draw, so the k
    smallest keys are a true weighted sample) with ``u`` a
    DETERMINISTIC content-hash uniform — rerunning on a re-sharded or
    re-ordered corpus selects the identical rows, which is what makes
    a 100 TB sampling job reproducible and auditable.

    Plan: one scan computing the key, then a global smallest-k via
    orderBy+limit => TakeOrderedAndProject (per-partition heap, k-row
    driver merge) — no single-partition window, no full sort. The
    ``-ln(u)`` term (range ~(0, 22]) rounds to 9 decimals BEFORE the
    divide so cross-engine libm ln() last-ulp differences can't flip
    the order; rounding the quotient itself would collapse keys onto
    an absolute 1e-6 grid for large weights and degrade the E-S
    property to a doc_id sort. IEEE division by the exact integer
    weight is then bit-deterministic across engines.
    """
    h32 = F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast(
        "long"
    )
    u = (h32 + 0.5) / 4294967296.0
    key = F.round(-F.log(u), 9) / F.col(weight_col)
    top = (
        docs.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            key.alias("es_key"),
        )
        .orderBy("es_key", id_col)
        .limit(k)
    )
    w = Window.orderBy("es_key", id_col)
    return top.withColumn("rk", F.row_number().over(w).cast("long"))


def contamination_stats(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
    group_col: str = "source",
) -> DataFrame:
    """Eval-integrity report: per ``group_col`` (source/domain), how
    much of the corpus collides with the benchmark n-gram set — the
    table a data-governance review reads before a training run
    ("which supplier's crawl is leaking the eval sets?").

    Same broadcast-benchmark shape as :func:`decontaminate` (the
    corpus never shuffles for the marking; only the tiny per-doc flag
    frame aggregates by group), plus a per-group contamination rate
    in exact int64 counts with one final rounded division.
    """
    per_doc = decontaminate(docs, benchmark, text_col, n)
    flagged = docs.select("doc_id", group_col).join(
        per_doc.select("doc_id", "is_contaminated"), "doc_id"
    )
    n_docs = F.count(F.lit(1)).cast("long")
    n_bad = F.sum(F.col("is_contaminated").cast("int")).cast("long")
    return (
        flagged.groupBy(group_col)
        .agg(
            n_docs.alias("n_docs"),
            n_bad.alias("n_contaminated"),
            F.round(n_bad / n_docs, 6).alias("contamination_rate"),
        )
    )


def quality_budget_curve(
    docs: DataFrame,
    by: "tuple[str, ...]" = (),
    text_col: str = "text",
    grid: "tuple[int, ...]" = tuple(range(0, 101, 10)),
) -> DataFrame:
    """Quality-knob budget curve (optionally per group): for each
    minimum-stopword-ratio cut ``thr_milli`` (per-mille), surviving
    doc/token counts and shares — the "what does tightening the
    filter cost in training tokens" table, computed without ever
    materializing a float ratio: the compare is
    ``1000 * n_stop >= thr_milli * n_words`` in int64, engine-exact on
    boundary docs. Empty-token docs are excluded from both sides (they
    are dropped at any setting). Shares are per group when ``by`` is
    given.

    Plan: one corpus scan computes (n_words, n_stop) map-side, a
    |grid|x explode over the slim per-doc stat frame (never the
    text), one groupBy, and a left join back onto the (group x grid)
    frame so zero-survivor thresholds still report 0.
    """
    from .text import STOPWORDS_EN, tokens

    keys = list(by)
    t = tokens(F.col(text_col))
    sw = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    s = docs.select(
        *keys,
        F.size(t).cast("long").alias("n_words"),
        F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
        .cast("long")
        .alias("n_stop"),
    ).where(F.col("n_words") > 0)
    grid_arr = F.array(*[F.lit(int(v)).cast("long") for v in grid])
    tot = s.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("__nd"),
        F.sum("n_words").cast("long").alias("__nt"),
    )
    gridf = tot.select(
        *keys, F.explode(grid_arr).alias("thr_milli"), "__nd", "__nt"
    )
    hits = (
        s.select(*keys, "n_words", "n_stop", F.explode(grid_arr).alias("thr_milli"))
        .where(
            F.lit(1000) * F.col("n_stop") >= F.col("thr_milli") * F.col("n_words")
        )
        .groupBy(*keys, "thr_milli")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__docs"),
            F.sum("n_words").cast("long").alias("__toks"),
        )
    )
    zero = F.lit(0).cast("long")
    return (
        gridf.join(hits, keys + ["thr_milli"], "left")
        .select(
            *keys,
            "thr_milli",
            F.coalesce(F.col("__docs"), zero).alias("n_docs_kept"),
            F.coalesce(F.col("__toks"), zero).alias("n_tokens_kept"),
            F.round(
                F.coalesce(F.col("__docs"), zero).cast("double")
                / F.col("__nd").cast("double"),
                6,
            ).alias("doc_share"),
            F.round(
                F.coalesce(F.col("__toks"), zero).cast("double")
                / F.col("__nt").cast("double"),
                6,
            ).alias("token_share"),
        )
        .orderBy(*keys, "thr_milli")
    )


def pack_loss_mask(
    docs: DataFrame,
    text_col: str = "text",
    budget: int = 256,
    part_col: str = "source",
) -> DataFrame:
    """Per-packed-SEQUENCE token accounting for the concat-and-split
    packing of :func:`pack_sequences` (VERDICT r9 #8) — the loss-mask
    budget sheet a training-data pipeline reads before fixing the
    context length: for every (partition, seq_id) training sequence,

    - ``n_docs``: documents contributing >= 1 token;
    - ``n_kept``: tokens that train with loss ON — a doc's tokens in
      the sequence where it STARTS;
    - ``n_masked``: continuation-fragment tokens — a doc that
      straddles a boundary resumes mid-thought in the next sequence,
      and the standard treatment is to keep the tokens (they fill the
      context) but MASK their loss; per sequence this is the token
      mass whose compute is spent without a training signal;
    - ``n_pad``: budget minus tokens present (nonzero only on each
      partition's final, partial sequence);
    - ``boundary_crossings``: docs entering this sequence as a
      continuation (n_masked's doc count).

    Conservation (property-tested): per partition,
    ``sum(n_kept + n_masked) = total corpus tokens`` and per sequence
    ``n_kept + n_masked + n_pad = budget`` — nothing silently dropped.

    Everything is int64: the per-partition cumulative offset ``cb``
    places doc tokens at [cb, cb + n); integer division by the budget
    gives its first/last sequence; the doc's token mass inside
    sequence s is ``least((s+1)*B, cb+n) - greatest(s*B, cb)``. A doc
    spanning m sequences explodes to m rows, so total fan-out is
    n_seqs + n_docs, not tokens. Same scale contract as
    pack_sequences: windowed per partition column, never a global
    sort.
    """
    n = F.size(tokens(F.col(text_col))).cast("long")
    base = docs.select(
        "doc_id", F.col(part_col).alias("part"), n.alias("n_tokens")
    )
    w = (
        Window.partitionBy("part")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cb = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long")).cast(
        "long"
    )
    d = (
        base.select("doc_id", "part", "n_tokens", cb.alias("__cb"))
        .where(F.col("n_tokens") > 0)
        .withColumn("__s0", F.expr(f"__cb div {budget}"))
        .withColumn(
            "__s1", F.expr(f"(__cb + n_tokens - 1) div {budget}")
        )
    )
    ex = d.select(
        "part",
        "n_tokens",
        "__cb",
        "__s0",
        F.explode(F.sequence("__s0", "__s1")).alias("seq_id"),
    )
    tok_in = F.least(
        (F.col("seq_id") + 1) * budget, F.col("__cb") + F.col("n_tokens")
    ) - F.greatest(F.col("seq_id") * budget, F.col("__cb"))
    cont = F.col("seq_id") > F.col("__s0")
    per = ex.groupBy("part", "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(tok_in).cast("long").alias("__present"),
        F.sum(F.when(cont, tok_in).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_masked"),
        F.sum(F.when(cont, 1).otherwise(0))
        .cast("long")
        .alias("boundary_crossings"),
    )
    return per.select(
        "part",
        "seq_id",
        "n_docs",
        (F.col("__present") - F.col("n_masked")).alias("n_kept"),
        "n_masked",
        (F.lit(budget).cast("long") - F.col("__present")).alias("n_pad"),
        "boundary_crossings",
    ).orderBy("part", "seq_id")
