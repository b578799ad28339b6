"""Partition-aware parquet sink.

The reference persists nothing but joblib'd detector objects
(/root/reference/tsod/base.py:95-104); an engine run at scale needs a
real landing path. The one non-obvious part is small-file control:
``df.write.partitionBy(cols)`` makes EVERY task write a file into
EVERY output partition it holds rows for — at 1000 tasks x 365 days
that is 365k files per day of output. Repartitioning on the partition
columns first routes each output partition to (a controlled number
of) tasks, so file count is ``partitions x files_per_partition`` by
construction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    files_per_partition: int = 1,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as hive-partitioned parquet with bounded file counts.

    ``files_per_partition > 1`` spreads each output partition over that
    many tasks (for partitions too big for one task/file); a salt column
    exists only inside the shuffle and never lands on disk.
    ``sort_cols`` applies a per-file sort (``sortWithinPartitions``) so
    parquet row-group min/max statistics become selective for range
    predicates on those columns — the cheap substitute for full
    Z-ordering.
    """
    cols = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        salt = (F.rand(seed=42) * files_per_partition).cast("int")
        routed = df.repartition(*cols, salt.alias("__salt"))
    else:
        routed = df.repartition(*cols)
    if sort_cols:
        routed = routed.sortWithinPartitions(*partition_cols, *sort_cols)
    routed.write.partitionBy(*partition_cols).mode(mode).parquet(path)
