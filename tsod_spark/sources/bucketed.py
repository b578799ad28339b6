"""Bucketed storage — co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of a fact-fact join (orders x lineitem) is
shuffling both sides on the join key, every query. Writing both tables
bucketed (and sorted) by that key moves the shuffle to WRITE time,
once: every later equi-join or groupBy on the key reads co-located
buckets and the plan shows no Exchange (asserted in
tests/test_bucketed.py).

Rules of thumb encoded here:

- bucket count is fixed at write time and bounds join parallelism —
  size it to ~128-256 MB per bucket at the target scale, and give both
  join sides the SAME count (different counts force a shuffle on one
  side);
- ``sortBy`` the bucket key so the sort-merge join also skips its
  sort;
- bucketed tables live in the session catalog (Spark's bucketing
  metadata is table-level, not file-level — a bare parquet path loses
  it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) by
    ``bucket_col`` into the session catalog."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table back WITH its bucketing metadata (reading
    the parquet path directly would discard it)."""
    return spark.table(table_name)
