"""Driver-facing query registry: Spark query builders + DuckDB oracle SQL.

Every operator from SURVEY.md §2 (and the LLM-pipeline additions) gets a
``(spark, sf_dir) -> DataFrame`` builder here plus, where SQL can
express it, an ANSI-SQL twin with IDENTICAL semantics:

- anomaly flags are booleans (exact), keys are ints (exact);
- money sums run in integer cents (bit-exact across engines regardless
  of partial-aggregation order);
- unavoidable float outputs (quantiles, stddev, cosine) are computed
  with the same operation order/association in both engines and
  rounded to 6 decimals;
- integer outputs are cast to 64-bit on both sides.

Column names are aliased identically on both sides (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..analytics import temporal, tpch
from ..detectors import (
    CombinedDetector,
    ConstantGradientDetector,
    ConstantValueDetector,
    DiffDetector,
    GradientDetector,
    HampelDetector,
    RangeDetector,
    RollingStandardDeviationDetector,
)
from ..detectors.gradient import gradient_col
from ..encodings import read_table
from ..expressions import as_pred
from ..features import create_dataset, lag_time_series
from ..frame import TimeSeriesFrame
from ..pipeline import dedup, multimodal, similarity, text

# ---------------------------------------------------------------------------
# helpers


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table, normalizing timestamp encodings.

    The driver's events.parquet has shipped ``ts`` as TIMESTAMP(NANOS),
    TIMESTAMP(MICROS)-UTC, and TIMESTAMP(MICROS)-NTZ across rounds; all
    three are coerced to plain ``timestamp`` in one shared helper
    (:mod:`tsod_spark.encodings`) so every downstream ``unix_micros`` /
    range-window call site sees one type."""
    return read_table(spark, f"{sf_dir}/{name}.parquet")


def events_tsf(spark: SparkSession, sf_dir: str) -> TimeSeriesFrame:
    return TimeSeriesFrame(
        table(spark, sf_dir, "events"),
        ts_col="ts",
        value_col="value",
        series=["user_id"],
        tiebreak=["event_id"],
    )


# oracle fragments ----------------------------------------------------------

E_CTE = (
    "WITH e AS (SELECT event_id, user_id, event_type, ts, "
    "CASE WHEN isnan(value) THEN NULL ELSE value END AS v FROM events)"
)
W = "PARTITION BY user_id ORDER BY ts, event_id"
P = "PARTITION BY user_id"
TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
DTOKS = f"list_distinct({TOKS})"


def _shingle_sql(toks: str = "toks", n: int = 3) -> str:
    """Distinct word n-gram shingles of token-list column ``toks``
    (DuckDB range(a,b) is empty when b <= a, matching the Spark guard)."""
    gram = " || ' ' || ".join(f"{toks}[i + {j}]" if j else f"{toks}[i]" for j in range(n))
    return f"list_distinct(list_transform(range(1, len({toks}) - {n - 2}), i -> {gram}))"
HIGH_HEX = "('8','9','a','b','c','d','e','f')"


def spark_quantile_sql(arr: str, q: float) -> str:
    """DuckDB expression reproducing Spark ``percentile`` BIT-EXACTLY
    over a sorted 1-based list column ``arr``:
    ``lower + (upper - lower) * frac`` with ``pos = q * (len - 1)`` in
    DOUBLE math.

    Two traps this sidesteps (both bit at sf0.1):
    - DuckDB ``quantile_cont`` interpolates as the two-product
      ``lower*(1-f) + upper*f``, which diverges by 1 ulp when the
      quantile lands on a repeated data value (lower == upper) — a
      strict comparison against the threshold then flips exactly on
      the boundary row (ts_range_quantile: lo = 0.88 vs
      0.8800000000000001 at sf0.1).
    - a bare ``0.02`` literal parses as DECIMAL in DuckDB, making the
      position arithmetic exact-decimal while Spark's is double —
      hence the explicit CAST.

    ``coalesce(..., 0)`` covers frac == 0 at the list tail, where
    ``arr[i + 2]`` is out of range and DuckDB returns NULL; an empty
    list yields NULL overall (callers coalesce the comparison)."""
    h = f"(CAST({q} AS DOUBLE) * (len({arr}) - 1))"
    i = f"CAST(floor({h}) AS BIGINT)"
    lower = f"{arr}[{i} + 1]"
    upper = f"{arr}[{i} + 2]"
    return (
        f"({lower} + coalesce(({upper} - {lower}) * ({h} - floor({h})), 0))"
    )


def duck_round6(col: Column) -> Column:
    """round(x, 6) mirroring DuckDB's multiply-then-round-half-away
    double algorithm (floor(|x|*1e6 + 0.5)) — Spark's F.round is Java
    BigDecimal HALF_UP on the shortest decimal repr and disagrees on
    dyadic-heavy values (see ts_ewma; verify-skill gotcha). Shared
    with the operator layer as :func:`tsod_spark.util.round_half_away6`."""
    from ..util import round_half_away6

    return round_half_away6(col)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        # A silent overwrite would hand one name's oracle to another
        # query's plan and drop a registered operator from the
        # registry without any test noticing — fail loudly instead
        # (nearly happened r11: a second "dedup_cross_source_matrix").
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn

    return deco


