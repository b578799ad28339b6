"""Skew mitigation for hot join keys.

AQE's skew-join split (``spark.sql.adaptive.skewJoin``) handles most
runtime skew and is enabled in bench/test sessions. Salting is the
explicit fallback for the pathological case AQE can't fix: a single
join key so hot that ONE task would receive a large fraction of the
data (AQE can split the partition, but every split still collides on
the same hash bucket of the build side at exchange time in some join
shapes, and pre-AQE engines lack even that).

``salted_join`` rewrites ``big ⋈ small ON key`` as::

    big':   salt = xxhash64(row) % n        (deterministic, no rand())
    small': exploded n times, one copy per salt value
    big' ⋈ small' ON (key, salt)

The hot key's rows now spread across ``n`` shuffle partitions at the
cost of replicating the small side ``n`` times — use when small is
genuinely small (it usually is next to a skewed fact table).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted across ``n_salts`` buckets.

    Output columns match ``big.join(small, on, how)`` (salt columns are
    internal). Deterministic: the salt is a hash of the big row, not
    ``rand()``, so retried tasks produce identical assignments.
    """
    on = list(on)
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % n_salts).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, on + ["__salt"], how).drop("__salt")
