"""Small engine-facing helpers shared across operator modules."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tracked caching (ADVICE r8 #3 / VERDICT r9 #7, structural form)
#
# Dedup/similarity operators cache() frames that feed two consumers (a
# prefix build and a verification join); the returned DataFrame is lazy,
# so the operator itself cannot unpersist. The old contract was a
# docstring ("callers should clearCache()"); this replaces it with code:
# every pipeline cache routes through tracked_cache(), and callers
# embedding operators in a long-lived session wrap calls in
# cache_scope() — on exit, every frame cached INSIDE the scope is
# unpersisted, nothing else (unlike spark.catalog.clearCache(), user
# caches outside the scope survive). The registry harness and bench.py
# keep their clearCache() hygiene; the scope is for everyone else.

_TRACKED_CACHES: list[DataFrame] = []


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + registration for scope-exit unpersist."""
    df = df.cache()
    _TRACKED_CACHES.append(df)
    return df


def unpersist_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked cache; returns how many were dropped."""
    n = 0
    while _TRACKED_CACHES:
        df = _TRACKED_CACHES.pop()
        try:
            df.unpersist(blocking)
            n += 1
        except Exception:  # session already stopped — nothing pinned
            pass
    return n


@contextmanager
def cache_scope():
    """Scope whose exit unpersists every pipeline cache created inside.

    ``with cache_scope(): pairs = ppjoin_pairs(docs).collect()`` leaves
    zero pinned blocks behind regardless of how many internal frames
    the operator cached. Nested scopes unpersist only their own frames.
    """
    mark = len(_TRACKED_CACHES)
    try:
        yield
    finally:
        while len(_TRACKED_CACHES) > mark:
            df = _TRACKED_CACHES.pop()
            try:
                df.unpersist(False)
            except Exception:
                pass


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


def py_round6(v):
    """Python-side scalar twin of Spark ``F.round(col, 6)``: Java
    BigDecimal HALF_UP on the shortest decimal repr of the double.

    Builtin ``round()`` is banker's half-even and disagrees with
    ``F.round`` on exact decimal halves (81/128 = 0.6328125 rounds to
    .632812 vs F.round's .632813), so streaming twins that emit floats
    with ``round()`` while their batch twins round with ``F.round``
    break the documented bit-identical stream/batch parity (ADVICE
    r8). Every streaming emission site routes through this instead.
    None/NaN/±inf pass through unchanged, like ``F.round``.
    """
    if v is None:
        return None
    v = float(v)
    if v != v or v == float("inf") or v == float("-inf"):
        return v
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
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
