"""Small engine-facing helpers shared across operator modules."""

from __future__ import annotations

from pyspark.sql import SparkSession


def default_parallelism(spark: SparkSession) -> int:
    """Cluster default parallelism, with a Connect-safe fallback.

    ``sparkContext`` only exists on classic sessions; under Spark
    Connect the shuffle-partition setting is the honest equivalent for
    "how many ways should CPU-bound per-row work spread".
    """
    try:
        return spark.sparkContext.defaultParallelism
    except Exception:
        try:
            return int(spark.conf.get("spark.sql.shuffle.partitions"))
        except Exception:
            return 200
