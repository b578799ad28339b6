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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
) -> DataFrame:
    """Flag corpus docs sharing any word n-gram with a benchmark set.

    Per doc: distinct n-gram count, how many collide with the
    benchmark, the collision fraction, and the contaminated flag.
    """
    grams = F.array_distinct(all_shingles(tokens(F.col(text_col)), n))
    bench_grams = (
        benchmark.select(F.explode(grams).alias("g")).distinct()
    )
    base = docs.select("doc_id", grams.alias("__gs"))
    doc_grams = base.select("doc_id", F.explode("__gs").alias("g"))
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    n_grams = F.size("__gs").cast("long")
    n_hits = F.coalesce(F.col("__hits"), F.lit(0)).cast("long")
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n_grams.alias("n_grams"),
            n_hits.alias("n_contaminated"),
            F.when(
                n_grams > 0, F.round(n_hits / n_grams, 6)
            ).alias("contaminated_frac"),
            (n_hits > 0).alias("is_contaminated"),
        )
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

    This is the composition story: the corpus is scanned ONCE. Every
    per-doc signal (quality ratios, repetition fractions, the split
    bucket) is row-local column algebra computed inline; the benchmark
    n-gram set is aggregated to a single broadcast row and checked
    with ``arrays_overlap`` (no join-back on doc_id); only two real
    shuffles remain at any corpus size — the md5 dup-keeper window and
    the per-source packing window. A naive join-the-operators
    composition costs 9 exchanges and 12 scans of the corpus
    (measured); this fused plan is the difference between a pipeline
    and a pile of queries at 100 TB.
    """
    from pyspark.sql import Window

    from .text import STOPWORDS_EN, PUNCT_CLASS, all_shingles, tokens

    txt = F.col(text_col)
    bench_row = (
        benchmark.select(
            F.explode(
                F.array_distinct(all_shingles(tokens(txt), 5))
            ).alias("g")
        )
        .distinct()
        .agg(F.collect_list("g").alias("__bench"))
    )
    base = docs.select(
        "doc_id",
        text_col,
        "source",
        tokens(txt).alias("__t"),
        F.array_distinct(all_shingles(tokens(txt), 5)).alias("__g"),
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
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(t), lambda d: F.size(F.filter(t, lambda x: x == d))
        )
    )
    g2, g3 = all_shingles(t, 2), all_shingles(t, 3)
    dup_frac = lambda g: F.when(  # noqa: E731
        F.size(g) > 0, F.round(1 - F.size(F.array_distinct(g)) / F.size(g), 6)
    )
    rep = (
        F.coalesce(
            (n_words >= 10) & (F.when(n_words > 0, F.round(top_cnt / n_words, 6)) > 0.2),
            F.lit(False),
        )
        | F.coalesce(dup_frac(g2) > 0.4, F.lit(False))
        | F.coalesce(dup_frac(g3) > 0.3, F.lit(False))
    )
    dup_w = Window.partitionBy(F.md5(txt))
    kept = (
        base.crossJoin(F.broadcast(bench_row))
        .withColumn("__keep_dup", F.col("doc_id") == F.min("doc_id").over(dup_w))
        .where(
            F.col("__keep_dup")
            & ~low
            & ~rep
            & ~F.arrays_overlap("__g", "__bench")
        )
        .select("doc_id", text_col, "source")
    )
    # packing + split computed inline on the one kept frame —
    # pack_sequences/split_assign as separate calls would re-derive
    # `kept` (and rescan the corpus) once per branch
    n = F.size(tokens(txt)).cast("long")
    kt = kept.select(
        "doc_id",
        F.col("source").alias("part"),
        txt.alias("__txt"),
        n.alias("n_tokens"),
    )
    pw = (
        Window.partitionBy("part")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cb = F.coalesce(F.sum("n_tokens").over(pw), F.lit(0).cast("long"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("__txt")), 1, 4), 16, 10).cast("long") % 10
    )
    return kt.select(
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
