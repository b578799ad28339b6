"""TimeSeriesFrame — the engine's typed handle on a time-series DataFrame.

Replaces the reference's ``pandas.Series + DatetimeIndex`` contract
(/root/reference/tsod/base.py:74-80, docs/getting_started.rst:6) with a
Spark-native one:

- ``(ts TIMESTAMP, value DOUBLE)`` columns, named explicitly;
- an optional ``series`` key list — the multi-series generalization the
  reference lacks. On a cluster this is what keeps window work
  partitioned: ``Window.partitionBy(*series).orderBy(ts, *tiebreak)``
  shuffles once per plan and every detector window reuses that same
  sort (Catalyst collapses identical window specs), so a Combined
  detector over N children still costs one shuffle.
- NaN -> NULL normalization applied once at wrap time (SURVEY §1.3).

A single un-keyed series degenerates to one partition — the documented
reference-parity mode, acceptable at reference scale and the reason
``series`` is first-class for everything at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from .exceptions import NonMonotonicTimeStampsError, NonUniqueTimeStampsError, WrongInputDataTypeError
from .expressions import nan_to_null


class TimeSeriesFrame:
    def __init__(
        self,
        df: DataFrame,
        ts_col: str = "ts",
        value_col: str = "value",
        series: Sequence[str] = (),
        tiebreak: Sequence[str] = (),
        normalize: bool = True,
    ):
        if not isinstance(df, DataFrame):
            raise WrongInputDataTypeError()
        missing = {ts_col, value_col, *series, *tiebreak} - set(df.columns)
        if missing:
            raise WrongInputDataTypeError(f"Missing columns: {sorted(missing)}")
        if normalize:
            df = df.withColumn(value_col, nan_to_null(F.col(value_col).cast("double")))
        self.df = df
        self.ts_col = ts_col
        self.value_col = value_col
        self.series = list(series)
        self.tiebreak = list(tiebreak)

    # -- column handles -------------------------------------------------
    @property
    def ts(self) -> Column:
        return F.col(self.ts_col)

    @property
    def value(self) -> Column:
        return F.col(self.value_col)

    # -- windows --------------------------------------------------------
    def w(self) -> WindowSpec:
        """Ordered per-series window: the one sort every detector shares."""
        base = Window.partitionBy(*self.series) if self.series else Window.partitionBy(F.lit(0))
        return base.orderBy(self.ts_col, *self.tiebreak)

    def w_all(self) -> WindowSpec:
        """Whole-series frame (for single-pass per-series 'fit')."""
        return self.w().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    # -- derived --------------------------------------------------------
    def with_df(self, df: DataFrame) -> "TimeSeriesFrame":
        out = TimeSeriesFrame.__new__(TimeSeriesFrame)
        out.df = df
        out.ts_col, out.value_col = self.ts_col, self.value_col
        out.series, out.tiebreak = list(self.series), list(self.tiebreak)
        return out

    def with_column(self, name: str, col: Column) -> "TimeSeriesFrame":
        return self.with_df(self.df.withColumn(name, col))

    # -- validation -----------------------------------------------------
    def validate_timestamps(self) -> "TimeSeriesFrame":
        """Eagerly assert strictly increasing, unique timestamps per series.

        Mirrors /root/reference/tsod/base.py:85-87 (``dt.min() < 1e-15``
        -> raise) but as a cheap aggregation pre-pass, and actually
        raises the reference's dormant NonUniqueTimeStampsError
        (/root/reference/tsod/custom_exceptions.py:31-34) on duplicates.
        """
        dup = (
            self.df.groupBy(*self.series, self.ts_col)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise NonUniqueTimeStampsError()
        prev = F.lag(self.ts).over(self.w())
        bad = (
            self.df.select(
                F.when(self.ts <= prev, True).alias("bad")
            )
            .where(F.col("bad"))
            .limit(1)
            .count()
        )
        if bad:
            raise NonMonotonicTimeStampsError()
        return self
