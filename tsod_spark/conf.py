"""Cluster session configuration for the engine at scale.

The repo's tests run on ``local[N]``; this module is the single place
that encodes how the same plans should be configured on a real
multi-executor cluster against ~100 TB. Everything here is standard
Spark configuration — no custom scheduler, no bespoke runtime.

Rationale per knob (all measured/derived, not folklore):

- **AQE on** (+skew-join): runtime re-planning converts our
  statically-chosen shuffle partition counts into right-sized ones,
  and splits the hot LSH band / stopword term partitions the dedup
  and TF-IDF operators create.
- **shuffle.partitions ~ 2-3x total cores**: the window detectors
  partition by series key and the dedup family by band/bucket —
  both generate many small-ish tasks; AQE coalesces the excess.
- **files.maxPartitionBytes 256m**: scan tasks sized so a full
  row-group of the wide ``documents``/``lineitem`` tables plus
  decode overhead fits executor memory alongside a shuffle buffer.
- **broadcastJoinThreshold 64m**: every dimension table join in the
  TPC-H family and the benchmark n-gram set in decontamination are
  designed to broadcast; the default 10m is too small for the
  benchmark-set pattern at real benchmark sizes.
- **parquet nanosAsLong**: fixture parquet has shipped ``ts`` as
  TIMESTAMP(NANOS) in some rounds; all encodings are normalized in
  ``tsod_spark.encodings.normalize_ts``.
- **session timeZone UTC**: makes the TIMESTAMP_NTZ → TIMESTAMP cast
  in ``encodings.normalize_ts`` a pure reinterpretation.
"""

from __future__ import annotations


def recommended_conf(
    total_cores: int = 32,
    shuffle_partition_factor: int = 3,
) -> dict[str, str]:
    """Config dict for a cluster session running these plans at scale."""
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.shuffle.partitions": str(total_cores * shuffle_partition_factor),
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    }


def build_session(app_name: str = "tsod_spark", master: str | None = None,
                  total_cores: int = 32):
    """SparkSession with the recommended configuration applied.

    ``master=None`` defers to the environment (spark-submit / cluster
    manager); tests pass ``local[N]``.
    """
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    for k, v in recommended_conf(total_cores).items():
        b = b.config(k, v)
    return b.getOrCreate()
