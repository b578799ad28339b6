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
- **SimHash**: 16-bit fingerprint; near-dup candidates via the
  pigeonhole chunk join (hamming<=k pairs must agree on one of k+1
  chunks), then exact ``bit_count(xor)`` filter.
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

from .text import distinct_tokens

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


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", k: int = 8
) -> DataFrame:
    toks = distinct_tokens(F.col(text_col))
    return docs.select(
        "doc_id",
        *[minhash_expr(toks, i).alias(f"mh{i}") for i in range(k)],
    )


def minhash_band_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    min_est_jaccard: float = 0.0,
) -> DataFrame:
    """LSH candidate pairs + estimated Jaccard (matching components / k).

    Explode per-band keys, self-join on (band, key) — the only shuffle
    moves (band_id, 32-byte hash, doc_id) triples.
    """
    r = k // bands
    sigs = minhash_signatures(docs, text_col, k)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat(*[F.col(f"mh{b * r + i}") for i in range(r)])).alias("key"),
        )
        for b in range(bands)
    ]
    exploded = sigs.select(
        "doc_id",
        *[F.col(f"mh{i}") for i in range(k)],
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select("doc_id", *[f"mh{i}" for i in range(k)], "bk.band", "bk.key")

    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[
                (F.col(f"a.mh{i}") == F.col(f"b.mh{i}")).cast("int").alias(f"m{i}")
                for i in range(k)
            ],
        )
        .distinct()
    )
    est = sum(F.col(f"m{i}") for i in range(k)) / float(k)
    out = pairs.select("doc_a", "doc_b", F.round(est, 6).alias("est_jaccard"))
    # aggregate over duplicate (a,b) from multiple matching bands happened
    # via distinct above; filter by estimate last.
    return out.where(F.col("est_jaccard") >= min_est_jaccard).distinct()


def simhash16(toks: Column) -> Column:
    """16-bit SimHash over a distinct-token array.

    Bit b is set when at least half the tokens' md5 hex digit at
    position b has its high bit set (majority vote with deterministic
    >=-half tie-break). Pure column algebra, engine-portable.
    """
    n = F.size(toks)
    high = F.array(*[F.lit(c) for c in "89abcdef"])
    bits = []
    for b in range(16):
        cnt = F.size(
            F.filter(toks, lambda t: F.array_contains(high, F.substring(F.md5(t), b + 1, 1)))
        )
        bits.append(F.when(cnt * 2 >= n, F.lit(1 << b)).otherwise(F.lit(0)))
    return sum(bits).cast("int")


def simhash_fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id", simhash16(distinct_tokens(F.col(text_col))).alias("simhash")
    )


def simhash_near_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance via pigeonhole chunks.

    Two 8-bit chunks: any pair with hamming <= 8 agrees on... no — the
    pigeonhole guarantee is hamming <= 1 for 2 chunks; we use the chunk
    join as a *candidate* generator and verify with exact bit_count, so
    recall is partial by design at this chunk count (documented; raise
    chunk count for higher recall at higher shuffle cost).
    """
    sigs = simhash_fingerprints(docs, text_col)
    sigs = sigs.select(
        "doc_id",
        "simhash",
        F.shiftright(F.col("simhash"), 8).alias("chunk_hi"),
        (F.col("simhash") % 256).alias("chunk_lo"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = a.join(
        b,
        ((F.col("a.chunk_hi") == F.col("b.chunk_hi")) | (F.col("a.chunk_lo") == F.col("b.chunk_lo")))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        cand.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    block_col: str = "source",
    top_n: int = 20,
) -> DataFrame:
    """Exact distinct-token Jaccard for pairs within a blocking key.

    Blocking bounds the quadratic term: C(n,2) within each block
    instead of globally. intersection/union computed with
    filter+contains (identical semantics in SQL engines' list ops).
    """
    base = docs.select(
        "doc_id", F.col(block_col).alias("blk"), distinct_tokens(F.col(text_col)).alias("toks")
    )
    a, b = base.alias("a"), base.alias("b")
    inter = F.size(
        F.filter(F.col("a.toks"), lambda t: F.array_contains(F.col("b.toks"), t))
    )
    union = F.size(F.col("a.toks")) + F.size(F.col("b.toks")) - inter
    jac = F.round(inter.cast("double") / union, 6)
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
        .limit(top_n)
    )
