"""Small engine-facing helpers shared across operator modules."""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def round_half_away6(col: Column) -> Column:
    """round(x, 6) as multiply-then-round-half-away-from-zero
    (``floor(|x|*1e6 + 0.5)``) — the algorithm DuckDB (and most
    databases) use for DOUBLE rounding. Spark's ``F.round`` is Java
    BigDecimal HALF_UP on the shortest decimal repr and disagrees on
    dyadic-heavy boundary values, so operators whose rounded ratios
    must stay reproducible by an ANSI oracle (arbitrary denominators:
    containment = shared/min(n), EWMA weights, ...) round with this
    instead of ``F.round``."""
    return (
        F.when(col >= 0, F.floor(col * 1e6 + 0.5)).otherwise(
            -F.floor(-col * 1e6 + 0.5)
        )
        / 1e6
    )


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
