"""Corpus import/export — the last mile of the curation pipeline.

A curated training corpus leaves the engine as hive-partitioned
parquet (``split=…/source=…``) plus a driver-written manifest of
per-partition row/token counts — the layout a downstream training
job's data loader shards by, and the manifest its admission checks
read. JSONL (one doc per line) is supported for interop with
text-pipeline tooling.

Scale notes: the stats pass is one aggregation over slim columns (the
text column never moves for stats); ``maxRecordsPerFile`` bounds
individual file sizes so a skewed source cannot produce an unsplittable
multi-GB file; partition columns must be low-cardinality (split ×
source), never content-derived ids.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_corpus(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("split",),
    token_col: str | None = "n_tokens",
    max_records_per_file: int = 1_000_000,
    mode: str = "error",
) -> dict:
    """Write a curated corpus as hive-partitioned parquet + manifest.

    Returns the manifest dict (also written to ``{path}/_manifest.json``):
    total and per-partition row counts, plus token sums when
    ``token_col`` exists in the frame.
    """
    (
        df.write.partitionBy(*partition_by)
        .option("maxRecordsPerFile", max_records_per_file)
        .mode(mode)
        .parquet(path)
    )
    # Manifest stats come from re-reading the WRITTEN output, not from
    # re-executing df's plan: a non-deterministic input (unseeded
    # sampling, current-timestamp columns) would recompute between two
    # actions and the manifest could disagree with the parquet on disk.
    # The re-read is footer/partition-column cheap (column-pruned scan).
    written = df.sparkSession.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if token_col and token_col in written.columns:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    stats_rows = written.groupBy(*partition_by).agg(*aggs).collect()
    partitions = [
        {
            **{c: r[c] for c in partition_by},
            **{k: r[k] for k in r.asDict() if k not in partition_by},
        }
        for r in sorted(stats_rows, key=lambda r: tuple(str(r[c]) for c in partition_by))
    ]
    manifest = {
        "format": "parquet",
        "partition_by": list(partition_by),
        "n_docs": sum(p["n_docs"] for p in partitions),
        "partitions": partitions,
    }
    if any("n_tokens" in p for p in partitions):
        manifest["n_tokens"] = sum(p.get("n_tokens") or 0 for p in partitions)
    _write_text(df.sparkSession, f"{path}/_manifest.json", json.dumps(manifest, indent=2))
    return manifest


def _write_text(spark: SparkSession, file_path: str, text: str) -> None:
    """Driver-side small-file write next to the data: plain open() for
    local paths, Hadoop FS API for remote schemes (s3a://, hdfs://)."""
    if "://" not in file_path or file_path.startswith("file:"):
        local = file_path.removeprefix("file:")
        with open(local, "w", encoding="utf-8") as f:
            f.write(text)
        return
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(file_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jvm_path, True)
    try:
        for b in text.encode("utf-8"):
            out.write(b)
    finally:
        out.close()


def _read_text(spark: SparkSession, file_path: str) -> str:
    """Counterpart of :func:`_write_text`. The leading-underscore name
    (`_manifest.json`) is deliberate: Hadoop-convention hidden files
    are skipped by the parquet scan of the same directory, so a plain
    ``spark.read.text`` cannot read them either — hence direct IO."""
    if "://" not in file_path or file_path.startswith("file:"):
        with open(file_path.removeprefix("file:"), encoding="utf-8") as f:
            return f.read()
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(file_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(jvm_path)
    try:
        data = bytearray()
        while True:
            b = stream.read()  # single-byte reads: manifest is tiny
            if b < 0:
                break
            data.append(b)
    finally:
        stream.close()
    return bytes(data).decode("utf-8")


def read_corpus(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """Read back a corpus written by :func:`write_corpus` with its
    manifest (partition columns are restored by the parquet reader)."""
    df = spark.read.parquet(path)
    return df, json.loads(_read_text(spark, f"{path}/_manifest.json"))


def write_jsonl(df: DataFrame, path: str, mode: str = "error") -> None:
    """One-doc-per-line JSON export (text-pipeline interop)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSONL corpus ingest; pass an explicit schema at scale (schema
    inference scans the data twice)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
