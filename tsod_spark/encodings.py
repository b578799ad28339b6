"""Timestamp-encoding normalization — the single choke point.

The driver's parquet fixtures have shipped ``ts`` in three different
physical encodings across rounds:

- ``TIMESTAMP(MICROS)`` with UTC adjustment → Spark ``timestamp``;
- ``TIMESTAMP(MICROS)`` without timezone → Spark ``timestamp_ntz``;
- ``TIMESTAMP(NANOS)`` → Spark reads as ``bigint`` under
  ``spark.sql.legacy.parquet.nanosAsLong`` (truncate to micros, which
  is what micro-native SQL engines reading the same file do).

Every operator in the engine assumes a plain ``timestamp`` column
(``F.unix_micros`` and range-window ordering require it). All ingest
paths — ``registry.table``, the public parquet reader, test fixtures —
must funnel through :func:`normalize_ts` so the assumption lives in
exactly one place. Session timezone is pinned to UTC (``conf.py``), so
the NTZ→timestamp cast is a pure reinterpretation, not a wall-clock
shift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType


def normalize_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Coerce ``ts_col`` to plain ``timestamp`` whatever the encoding."""
    if ts_col not in df.columns:
        return df
    dt = df.schema[ts_col].dataType
    if isinstance(dt, LongType):  # TIMESTAMP(NANOS) read via nanosAsLong
        return df.withColumn(ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def read_table(spark: SparkSession, path: str, ts_col: str = "ts") -> DataFrame:
    """Read a parquet table with ``ts_col`` normalized to ``timestamp``."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_ts(spark.read.parquet(path), ts_col)
