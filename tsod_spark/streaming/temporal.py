"""Streaming twins of the batch temporal operators (SURVEY §7 phase S).

Canonical continuous-pipeline shapes, each the streaming counterpart
of a batch operator in :mod:`tsod_spark.analytics.temporal` /
:mod:`tsod_spark.analytics.olap`, with row-for-row batch-equivalence
tests in ``tests/test_streaming.py`` (plus
:func:`stream_attribution_join`, the watermarked stream-stream
interval join whose time bound is the state-retention contract):

- :func:`stream_ewma` — the sequential recurrence. Per-series state is
  ONE double (the running smoothed value) plus a (ts, tiebreak) cursor;
  the recurrence continues bit-identically across micro-batches because
  ``y_t = (1-α)·y_{t-1} + α·x_t`` only needs ``y_{t-1}``.
- :func:`stream_latest_by_key` — CDC keep-last compaction
  (`transformWithState`-style keep-last expressed on
  ``applyInPandasWithState``). State is exactly one row per key; each
  micro-batch emits a key only when its latest row changed — an upsert
  changelog, which is what a downstream merge-on-read sink consumes.
- :func:`stream_rollup_hierarchy` — hypertable continuous aggregates:
  the finest level is a watermarked windowed aggregation over raw rows;
  every coarser level re-aggregates the finer level's exact integer-cent
  partials (chained stateful operators, append mode) — the raw stream is
  consumed ONCE no matter how many levels, mirroring the batch
  one-scan property.

- :func:`stream_cusum` — Page's-test drift detection. State per series
  is ONE int64 (the exact integer-cent running sum), so the excursion
  continues bit-identically across micro-batches; every arriving row
  emits its flag (batch twin: the ``ts_cusum`` registry query).

- :func:`stream_time_weighted_avg` — irregular-sampling TWA. State per
  series is the open bucket's exact integer accumulators + the last
  observation; buckets close (and emit once, append-style) when a
  later-bucket observation arrives, because the batch semantics give a
  bucket's last observation zero weight — no future row can change a
  closed bucket.

Scale notes: EWMA state is O(1) per series and keep-last state is one
row per key — key COUNT is the only growth axis, bounded by
``idle_timeout`` eviction where offered. The rollup's state is O(open
windows × keys) with watermark eviction, independent of stream length.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..util import py_round6
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_LEVEL_DURATION = {
    "minute": "1 minute",
    "hour": "1 hour",
    "day": "1 day",
    "week": "7 days",
}


def stream_ewma(
    stream_df: DataFrame,
    alpha: float = 0.25,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    out_col: str = "ewma",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming per-series EWMA, batch twin of ``temporal.ewma``.

    ``y_t = (1-α)·y_{t-1} + α·x_t`` over non-null values in
    (ts, tiebreak) order; null/NaN rows carry the previous smoothed
    value forward (null before the first observation). The recurrence
    is causal, so every row emits in the micro-batch it arrives in; the
    continuation is bit-identical to the batch pandas ``ewm`` kernel
    because each step only reads the prior smoothed value, which IS the
    state (pandas computes ``((1-α)y + αx)/((1-α)+α)`` — for α with an
    exact-double complement the denominator is exactly 1).

    Rows at or before the per-series (ts, tiebreak) cursor would land
    before already-emitted positions and are dropped — bound disorder
    upstream with ``withWatermark`` (same contract as ``stream_detect``).
    """
    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField(tiebreak, stream_df.schema[tiebreak].dataType),
            StructField("ts", stream_df.schema[ts_col].dataType),
            StructField(out_col, DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("y", DoubleType()),
            StructField("has_y", BooleanType()),
            StructField("cur_ts", LongType()),  # micros
            StructField("cur_tb", LongType()),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col, tiebreak], kind="mergesort")
        if state.exists:
            y, has_y, cur_ts, cur_tb = state.get
        else:
            y, has_y, cur_ts, cur_tb = 0.0, False, None, None

        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        new_tb = new[tiebreak].astype("int64")
        if cur_ts is not None:
            ok = (new_ts > cur_ts) | ((new_ts == cur_ts) & (new_tb > cur_tb))
            if not ok.all():
                new = new[ok.to_numpy()]
                new_ts, new_tb = new_ts[ok], new_tb[ok]
            if len(new) == 0:
                if idle_timeout is not None:
                    state.setTimeoutDuration(idle_timeout)
                return

        v = new[value_col].astype(float)
        compact = v.dropna()
        if len(compact):
            if has_y:
                # prepend the state as observation 0 (ewm's y_0 = x_0
                # seed), then drop it — exact continuation of the batch
                # recurrence across the micro-batch boundary
                seeded = pd.concat([pd.Series([y]), compact], ignore_index=True)
                smoothed = seeded.ewm(alpha=alpha, adjust=False).mean().iloc[1:]
                smoothed.index = compact.index
            else:
                smoothed = compact.ewm(alpha=alpha, adjust=False).mean()
            out_y = smoothed.reindex(v.index).ffill()
            if has_y:
                out_y = out_y.fillna(y)
            y, has_y = float(smoothed.iloc[-1]), True
        else:
            out_y = pd.Series([y if has_y else None] * len(v), index=v.index, dtype=float)

        state.update((y, has_y, int(new_ts.iloc[-1]), int(new_tb.iloc[-1])))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        yield pd.DataFrame(
            {
                **{c: key[i] for i, c in enumerate(series)},
                tiebreak: new[tiebreak].to_numpy(),
                "ts": new[ts_col].to_numpy(),
                out_col: out_y.to_numpy(),
            }
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_holt(
    stream_df: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.25,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming Holt linear-trend smoothing, batch twin of
    ``temporal.holt``. Per-series state is the (level, trend) pair plus
    the (ts, tiebreak) cursor — the two-state recurrence continues
    bit-identically across micro-batches because each step only reads
    the prior pair, which IS the state. Null/NaN rows carry state
    forward; rows at or before the cursor are dropped (same disorder
    contract as :func:`stream_ewma`)."""
    import math  # noqa: PLC0415

    series = list(series)
    a, b = float(alpha), float(beta)
    ca, cb = 1.0 - a, 1.0 - b
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField(tiebreak, stream_df.schema[tiebreak].dataType),
            StructField("ts", stream_df.schema[ts_col].dataType),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("l", DoubleType()),
            StructField("t", DoubleType()),
            StructField("has", BooleanType()),
            StructField("cur_ts", LongType()),
            StructField("cur_tb", LongType()),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col, tiebreak], kind="mergesort")
        if state.exists:
            l, t, has, cur_ts, cur_tb = state.get
        else:
            l, t, has, cur_ts, cur_tb = 0.0, 0.0, False, None, None

        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        new_tb = new[tiebreak].astype("int64")
        if cur_ts is not None:
            ok = (new_ts > cur_ts) | ((new_ts == cur_ts) & (new_tb > cur_tb))
            if not ok.all():
                new = new[ok.to_numpy()]
                new_ts, new_tb = new_ts[ok], new_tb[ok]
            if len(new) == 0:
                if idle_timeout is not None:
                    state.setTimeoutDuration(idle_timeout)
                return

        v = new[value_col].astype(float).to_numpy()
        lv, tr = [], []
        if not has:
            l = t = math.nan
        for y in v:
            if not math.isnan(y):
                if math.isnan(l):
                    l, t = y, 0.0
                else:
                    nl = a * y + ca * (l + t)
                    t = b * (nl - l) + cb * t
                    l = nl
            lv.append(l)
            tr.append(t)
        has = not math.isnan(l)
        state.update(
            (
                l if has else 0.0,
                t if has else 0.0,
                has,
                int(new_ts.iloc[-1]),
                int(new_tb.iloc[-1]),
            )
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        yield pd.DataFrame(
            {
                **{c: key[i] for i, c in enumerate(series)},
                tiebreak: new[tiebreak].to_numpy(),
                "ts": new[ts_col].to_numpy(),
                "level": lv,
                "trend": tr,
            }
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_latest_by_key(
    stream_df: DataFrame,
    keys: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming CDC keep-last, batch twin of ``olap.latest_by_key``.

    State per key is exactly ONE row (the current latest by event time,
    ties broken by the highest ``tiebreak``); a micro-batch emits a key
    only when its latest row CHANGED — the output is an upsert
    changelog whose last emission per key equals the batch keep-last
    result over the same rows. Unlike the stream-side window
    formulation (unsupported on streams), this needs no sort and no
    shuffle beyond the keyed grouping; state size scales with key
    cardinality only (bound churn with ``idle_timeout``).
    """
    keys = list(keys)
    carry = [c for c in stream_df.columns if c not in keys]
    key_fields = [stream_df.schema[c] for c in keys]
    carry_fields = [stream_df.schema[c] for c in carry]
    out_schema = StructType(key_fields + carry_fields)
    # state stores ts as micros + the tiebreak + the carried row values
    state_schema = StructType(
        [StructField("cur_ts", LongType()), StructField("cur_tb", LongType())]
        + [StructField(f"v_{f.name}", f.dataType) for f in carry_fields]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        ts_us = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        tb = new[tiebreak].astype("int64")
        best = new.assign(__ts=ts_us, __tb=tb).sort_values(["__ts", "__tb"]).iloc[-1]
        if state.exists:
            cur = state.get
            if (best["__ts"], best["__tb"]) <= (cur[0], cur[1]):
                if idle_timeout is not None:
                    state.setTimeoutDuration(idle_timeout)
                return
        state.update(
            (int(best["__ts"]), int(best["__tb"]))
            + tuple(best[c] for c in carry)
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        yield pd.DataFrame(
            [{**{c: key[i] for i, c in enumerate(keys)}, **{c: best[c] for c in carry}}]
        )

    return stream_df.groupBy(*keys).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_attribution_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str] = ("user_id",),
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    max_delay: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each left event with
    the right-stream events that follow it within ``max_delay`` on the
    same key (the click-attribution / trigger-response shape).

    Both sides carry watermarks and the join condition time-bounds the
    match window, so Spark can evict buffered rows once the watermark
    passes ``left_ts + max_delay`` — state is O(events per delay
    window x keys), not O(stream history). Without the time bound a
    stream-stream join must buffer both streams forever; the interval
    condition IS the state-retention contract.
    """
    keys = list(keys)
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys] + [
        F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"),
        F.col(f"r.{right_ts}")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}"),
    ]
    return lw.join(rw, cond, "inner").select(
        *[F.col(f"l.{k}") for k in keys],
        *[F.col(f"l.{c}") for c in left.columns if c not in keys],
        *[F.col(f"r.{c}") for c in right.columns if c not in keys],
    )


def stream_histogram_drift(
    stream_df: DataFrame,
    reference: DataFrame,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    bin_width: float = 10.0,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming distribution-drift monitoring: per event-time window
    and key, the L1 distance between the window's value histogram and
    a STATIC reference snapshot's — the continuous twin of the batch
    ``olap.histogram_drift`` tick.

    Shape: a watermarked windowed (key, bin) count, a chained
    append-mode aggregation collecting each window's bins, then a
    stream-static broadcast join against the reference's per-key bin
    map (tiny — one row per key) and a pure-HOF fold computing
    ``sum |n·T_ref - ref(bin)·T_win|`` over the union of bins in EXACT
    integer space, divided once. Every per-window emission is final
    (append mode) and engine-deterministic for the same rows.
    """
    keys = list(keys)
    v = F.when(
        F.isnan(value_col) | F.col(value_col).isNull(), None
    ).otherwise(F.col(value_col))
    binc = F.floor(v / bin_width).cast("long")

    ref_hist = (
        reference.withColumn("__bin", binc)
        .where(F.col("__bin").isNotNull())
        .groupBy(*keys, "__bin")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .groupBy(*keys)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__bin", "__n"))
            ).alias("__ref"),
            F.sum("__n").cast("long").alias("__tref"),
        )
    )

    win_bins = (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("__bin", binc)
        .where(F.col("__bin").isNotNull())
        .groupBy(F.window(ts_col, window).alias("win"), *keys, "__bin")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    collected = win_bins.groupBy("win", *keys).agg(
        F.collect_list(F.struct("__bin", "__n")).alias("__bins")
    )

    joined = collected.join(F.broadcast(ref_hist), keys, "inner")
    t_win = F.aggregate(
        "__bins", F.lit(0).cast("long"), lambda acc, e: acc + e["__n"]
    )
    stream_bin_ids = F.transform("__bins", lambda e: e["__bin"])
    # bins present in the window: |n*T_ref - ref(bin)*T_win|
    part_stream = F.aggregate(
        "__bins",
        F.lit(0).cast("long"),
        lambda acc, e: acc
        + F.abs(
            e["__n"] * F.col("__tref")
            - F.coalesce(F.element_at("__ref", e["__bin"]), F.lit(0))
            * F.col("__twin")
        ),
    )
    # reference-only bins: ref(bin)*T_win each
    part_ref_only = F.aggregate(
        F.map_values(
            F.map_filter(
                "__ref", lambda b, _: ~F.array_contains(stream_bin_ids, b)
            )
        ),
        F.lit(0).cast("long"),
        lambda acc, n: acc + n * F.col("__twin"),
    )
    return (
        joined.withColumn("__twin", t_win)
        .select(
            F.col("win.start").alias("bucket"),
            *keys,
            F.col("__twin").alias("n_window"),
            F.col("__tref").alias("n_reference"),
            F.round(
                (part_stream + part_ref_only)
                / (F.col("__twin").cast("double") * F.col("__tref")),
                6,
            ).alias("l1_drift"),
        )
    )


def stream_rollup_hierarchy(
    stream_df: DataFrame,
    keys: Sequence[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    levels: Sequence[str] = ("hour", "day"),
    watermark: str = "2 hours",
) -> dict[str, DataFrame]:
    """Streaming hypertable rollup, batch twin of
    ``temporal.rollup_hierarchy``.

    Returns ``{level: DataFrame}`` — one continuous aggregate per level,
    each meant for its own sink/table (exactly how materialized
    continuous aggregates deploy). The finest level aggregates the raw
    watermarked stream into tumbling windows; every coarser level
    re-windows the FINER level's partials (chained stateful operators —
    append mode required), so the raw stream is consumed once no matter
    how many levels, and counts/sums stay exact because the partials
    are associative integer cents.

    Append mode means a window emits exactly once, when the watermark
    passes its end — emitted rows are final and equal the batch rollup
    for the same bucket (asserted in tests); still-open windows at the
    head of the stream simply haven't emitted yet.
    """
    from ..expressions import nan_to_null

    cents = F.round(nan_to_null(F.col(value_col)) * 100).cast("long")
    finest, *coarser = levels
    cur = (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, _LEVEL_DURATION[finest]).alias("win"), *keys)
        .agg(
            F.count(cents).alias("n"),
            F.sum(cents).alias("sum_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
        )
    )

    def finish(df: DataFrame, level: str) -> DataFrame:
        return df.select(
            F.lit(level).alias("level"),
            *keys,
            F.col("win.start").alias("bucket"),
            F.col("n").cast("long").alias("n"),
            F.round(F.col("sum_cents") / 100.0, 6).alias("sum_value"),
            F.round(F.col("min_cents") / 100.0, 6).alias("min_value"),
            F.round(F.col("max_cents") / 100.0, 6).alias("max_value"),
            F.round(F.col("sum_cents") / (100.0 * F.col("n")), 6).alias("avg_value"),
        )

    out = {finest: finish(cur, finest)}
    for lvl in coarser:
        cur = cur.groupBy(
            F.window(F.col("win"), _LEVEL_DURATION[lvl]).alias("win"), *keys
        ).agg(
            F.sum("n").alias("n"),
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        )
        out[lvl] = finish(cur, lvl)
    return out


def stream_time_weighted_avg(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    bucket_micros: int = 3_600_000_000,
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming per-series hourly time-weighted average, batch twin of
    ``temporal.time_weighted_avg``.

    State per series is O(1): the open bucket's exact integer
    accumulators (Σweight micros, Σcents·weight, Σcents, n) plus the
    last observation's (ts, cents) — the only thing the next weight
    needs. A bucket is FINAL exactly when the first observation of a
    later bucket arrives for that series (the batch semantics give the
    bucket's last observation zero weight, so no future row can change
    a closed bucket), and emits once, append-style. The float division
    happens OUTSIDE the kernel in the same Spark Column expression the
    batch operator uses, so emitted rows are bit-identical to the
    batch result for every closed bucket.

    Rows at or before the per-series (ts, tiebreak) cursor are dropped
    (same disorder contract as ``stream_ewma``); the open bucket at
    stream head has not emitted yet.
    """
    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("bucket_micros", LongType()),
            StructField("n_events", LongType()),
            StructField("sw", LongType()),
            StructField("scw", LongType()),
            StructField("sc", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("bucket", LongType()),
            StructField("prev_ts", LongType()),
            StructField("prev_c", LongType()),
            StructField("sw", LongType()),
            StructField("scw", LongType()),
            StructField("sc", LongType()),
            StructField("n", LongType()),
            StructField("cur_tb", LongType()),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col, tiebreak], kind="mergesort")
        if state.exists:
            bucket, prev_ts, prev_c, sw, scw, sc, n, cur_tb = state.get
        else:
            bucket = prev_ts = prev_c = cur_tb = None
            sw = scw = sc = n = 0

        ts_us = (pd.to_datetime(new[ts_col]).astype("int64") // 1000).to_numpy()
        tb = new[tiebreak].astype("int64").to_numpy()
        vals = new[value_col].astype(float).to_numpy()

        closed = []
        for t, b, v in zip(ts_us, tb, vals):
            if prev_ts is not None and (t, b) <= (prev_ts, cur_tb):
                continue  # disorder: behind the cursor
            cur_tb = int(b)
            if v != v:  # NaN: invisible to the aggregate, cursor moves
                prev_ts = int(t) if prev_ts is None else prev_ts
                continue
            c = int(
                -int(-v * 100 + 0.5) if v < 0 else int(v * 100 + 0.5)
            )  # round-half-away == F.round on cents
            bk = (t // bucket_micros) * bucket_micros
            if bucket is None:
                bucket, prev_ts, prev_c = int(bk), int(t), c
                sw, scw, sc, n = 0, 0, c, 1
            elif bk == bucket:
                w = int(t) - prev_ts
                sw += w
                scw += prev_c * w
                sc += c
                n += 1
                prev_ts, prev_c = int(t), c
            else:
                closed.append((bucket, n, sw, scw, sc))
                bucket, prev_ts, prev_c = int(bk), int(t), c
                sw, scw, sc, n = 0, 0, c, 1

        state.update((bucket, prev_ts, prev_c, sw, scw, sc, n, cur_tb))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        if closed:
            yield pd.DataFrame(
                {
                    **{c_: key[i] for i, c_ in enumerate(series)},
                    "bucket_micros": [r[0] for r in closed],
                    "n_events": [r[1] for r in closed],
                    "sw": [r[2] for r in closed],
                    "scw": [r[3] for r in closed],
                    "sc": [r[4] for r in closed],
                }
            )

    raw = stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
    # identical Column expression to the batch operator => bit-identical
    twa = F.when(
        F.col("sw") > 0, F.col("scw") / F.col("sw").cast("double") / 100.0
    ).otherwise(F.col("sc").cast("double") / F.col("n_events") / 100.0)
    return raw.select(
        *series,
        F.timestamp_micros(F.col("bucket_micros")).alias("bucket"),
        "n_events",
        F.round(twa, 6).alias("time_weighted_avg"),
    )


def stream_cusum(
    stream_df: DataFrame,
    target: float = 150.0,
    h: float = 5000.0,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming CUSUM drift detector — the twin of the batch
    ``ts_cusum`` query (Page's test without reset): per-series running
    sum of integer-cent deviations from ``target``, every arriving row
    flagged when the excursion exceeds ``h``.

    State per series is ONE int64 (the running sum, exact — no float
    accumulation drift across micro-batches, the ts_cusum discipline)
    plus a seen-any-observation bit and the (ts, tiebreak) cursor.
    Null/NaN rows contribute nothing but still emit (flagged by the
    current excursion, exactly like the batch window sum); rows before
    the first observation emit False (the batch NULL-sum coalesce).
    Rows at or behind the cursor are dropped — bound disorder upstream
    with ``withWatermark`` (the stream_detect contract).
    """
    import numpy as np

    series = list(series)
    target_c = int(round(target * 100))
    h_c = int(round(h * 100))
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField(tiebreak, stream_df.schema[tiebreak].dataType),
            StructField("ts", stream_df.schema[ts_col].dataType),
            StructField("is_anomaly", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("s", LongType()),
            StructField("seen", BooleanType()),
            StructField("cur_ts", LongType()),
            StructField("cur_tb", LongType()),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col, tiebreak], kind="mergesort")
        if state.exists:
            s, seen, cur_ts, cur_tb = state.get
        else:
            s, seen, cur_ts, cur_tb = 0, False, None, None

        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        new_tb = new[tiebreak].astype("int64")
        if cur_ts is not None:
            ok = (new_ts > cur_ts) | ((new_ts == cur_ts) & (new_tb > cur_tb))
            if not ok.all():
                new = new[ok.to_numpy()]
                new_ts, new_tb = new_ts[ok], new_tb[ok]
            if len(new) == 0:
                if idle_timeout is not None:
                    state.setTimeoutDuration(idle_timeout)
                return

        v = new[value_col].astype(float).to_numpy()
        obs = ~np.isnan(v)
        # integer cents, rounded half-away-from-zero (Spark F.round's
        # HALF_UP on the value's decimal repr) — the running sum stays
        # exact int64 across any number of micro-batches
        cents = np.zeros(len(v), dtype="int64")
        av = np.abs(v[obs]) * 100
        cents[obs] = (np.sign(v[obs]) * np.floor(av + 0.5)).astype("int64") - target_c
        run = cents.cumsum() + s
        seen_mask = (obs.cumsum() > 0) | seen
        flags = seen_mask & (np.abs(run) > h_c)

        state.update(
            (int(run[-1]), bool(seen or obs.any()), int(new_ts.iloc[-1]), int(new_tb.iloc[-1]))
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        yield pd.DataFrame(
            {
                **{c: key[i] for i, c in enumerate(series)},
                tiebreak: new[tiebreak].to_numpy(),
                "ts": new[ts_col].to_numpy(),
                "is_anomaly": flags,
            }
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_type_entropy(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    type_col: str = "event_type",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming behavioral-diversity monitor — the continuous twin of
    the batch ``events_type_entropy`` query: per series key, a running
    Shannon entropy / evenness / perplexity of the event-type mix,
    re-emitted as a snapshot row every micro-batch in which the key
    received rows (update mode: the LAST emission per key over the
    same rows equals the batch result).

    State per key is the exact int64 type-count vector stored as two
    parallel arrays (types, counts) — bounded by the type vocabulary,
    never by row count, and mergeable across micro-batches by plain
    addition (the same count-moment identity H = ln N - sum(c ln c)/N
    the batch operator uses, so no per-batch probability renormalizing
    and no float accumulation drift: floats are derived fresh from the
    exact counts at every emission).  Order-insensitive by
    construction, so no (ts, tiebreak) cursor is needed; upstream
    exactly-once delivery is assumed (duplicates inflate counts, as
    they would the batch GROUP BY).
    """
    import math

    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("n_events", LongType()),
            StructField("k_types", LongType()),
            StructField("entropy_nats", DoubleType()),
            StructField("entropy_norm", DoubleType()),
            StructField("perplexity", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("types", ArrayType(StringType())),
            StructField("counts", ArrayType(LongType())),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        if state.exists:
            types, counts = state.get
            cnt = dict(zip(list(types), [int(c) for c in counts]))
        else:
            cnt = {}
        for t, c in new[type_col].value_counts().items():
            cnt[t] = cnt.get(t, 0) + int(c)
        state.update((list(cnt.keys()), list(cnt.values())))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        n = sum(cnt.values())
        k = len(cnt)
        h = math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
        yield pd.DataFrame(
            [
                {
                    **{c: key[i] for i, c in enumerate(series)},
                    "n_events": n,
                    "k_types": k,
                    "entropy_nats": py_round6(h),
                    "entropy_norm": py_round6(h / math.log(k)) if k > 1 else None,
                    "perplexity": py_round6(math.exp(h)),
                }
            ]
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_dispersion(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming arrival-process drift monitor — the continuous twin
    of the batch ``events_dispersion`` query: per series key, the
    running Poisson index of dispersion D = var/mean of hourly event
    counts over the key's full observed hour span (empty hours count
    as zeros), re-emitted as a snapshot every micro-batch the key
    receives rows.

    State per key is the exact int64 per-hour count vector (two
    parallel arrays, bounded by the key's span in HOURS — the same
    frame the batch operator aggregates, never the row count).  A
    scalar-moment state (t, q, min/max) would NOT merge correctly:
    micro-batch boundaries split hours, and folding a split hour into
    q needs the hour's previous count — so the counts themselves are
    the minimal mergeable state.  Counts merge by addition; all floats
    derive fresh from the exact counts at emission (the
    stream_type_entropy discipline), so the last emission per key over
    the same rows equals the batch result.
    """
    import math  # noqa: F401  (kept for parity with sibling monitors)

    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("n_buckets", LongType()),
            StructField("n_events", LongType()),
            StructField("mean_per_hour", DoubleType()),
            StructField("dispersion", DoubleType()),
            StructField("overdispersed", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("hbs", ArrayType(LongType())),
            StructField("counts", ArrayType(LongType())),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        if state.exists:
            hbs, counts = state.get
            cnt = dict(zip([int(h) for h in hbs], [int(c) for c in counts]))
        else:
            cnt = {}
        hb = pd.to_datetime(new[ts_col]).astype("int64") // 1000 // 3600000000
        for h, c in hb.value_counts().items():
            cnt[int(h)] = cnt.get(int(h), 0) + int(c)
        state.update((list(cnt.keys()), list(cnt.values())))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        span = max(cnt) - min(cnt) + 1
        t = sum(cnt.values())
        q = sum(c * c for c in cnt.values())
        disp = (span * q - t * t) / (span * t)
        over = (
            span > 1
            and disp > 1.0 + 2.0 * (2.0 / (span - 1)) ** 0.5
        )
        yield pd.DataFrame(
            [
                {
                    **{c: key[i] for i, c in enumerate(series)},
                    "n_buckets": span,
                    "n_events": t,
                    "mean_per_hour": py_round6(t / span),
                    "dispersion": py_round6(disp),
                    "overdispersed": bool(over),
                }
            ]
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_holt_winters(
    stream_df: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    period: int = 24,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming additive Holt-Winters — the continuous twin of
    ``temporal.holt_winters``, same calendar-hour-anchored seasonals.

    The batch operator smooths HOURLY cent totals, so the streaming
    version folds whole buckets: rows accumulate into the key's
    PENDING hour as an exact int64 cent sum, and the first row of a
    LATER hour closes it — one (hour_bucket, level, trend, season)
    emission per closed bucket, append-once (the time_weighted_avg
    bucket-close contract).  Each key's final bucket stays pending
    until later data closes it, which is the honest streaming
    semantics for an aggregate-then-smooth operator: the bucket sum
    isn't final until the bucket is over.

    State per key: (level, trend, the ``period``-slot seasonal
    vector, the pending bucket id + exact int64 pending sum, and the
    (ts, tiebreak) disorder cursor).  Closed-bucket emissions are
    bit-identical to the batch kernel on the same rows because the
    fold order and the dyadic recurrence match term-for-term and the
    bucket sums are integers in both.
    """
    import math  # noqa: PLC0415

    series = list(series)
    a, b, g = float(alpha), float(beta), float(gamma)
    ca, cb, cg = 1.0 - a, 1.0 - b, 1.0 - g
    m = int(period)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("hour_bucket", LongType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("season", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("l", DoubleType()),
            StructField("t", DoubleType()),
            StructField("s", ArrayType(DoubleType())),
            StructField("has", BooleanType()),
            StructField("pend_hb", LongType()),
            StructField("pend_sum", LongType()),
            StructField("cur_ts", LongType()),
            StructField("cur_tb", LongType()),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col, tiebreak], kind="mergesort")
        if state.exists:
            l, t, s, has, pend_hb, pend_sum, cur_ts, cur_tb = state.get
            s = [float(x) for x in s]
        else:
            l, t, s, has = 0.0, 0.0, [0.0] * m, False
            pend_hb, pend_sum, cur_ts, cur_tb = None, 0, None, None

        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        new_tb = new[tiebreak].astype("int64")
        if cur_ts is not None:
            ok = (new_ts > cur_ts) | ((new_ts == cur_ts) & (new_tb > cur_tb))
            if not ok.all():
                new = new[ok.to_numpy()]
                new_ts, new_tb = new_ts[ok], new_tb[ok]
            if len(new) == 0:
                if idle_timeout is not None:
                    state.setTimeoutDuration(idle_timeout)
                return

        emitted = []

        def fold(hb: int, total: int):
            nonlocal l, t, has
            y = float(total)
            h = int(hb % m)
            if not has:
                l, t = y, 0.0
                s[h] = g * (y - l) + cg * s[h]  # exactly 0.0
                has = True
            else:
                nl = a * (y - s[h]) + ca * (l + t)
                t = b * (nl - l) + cb * t
                s[h] = g * (y - nl) + cg * s[h]
                l = nl
            emitted.append((hb, l, t, s[h]))

        vals = new[value_col].astype(float).to_numpy()
        hbs = (new_ts // 3_600_000_000).to_numpy()
        for y, hb in zip(vals, hbs):
            if math.isnan(y):
                continue
            # half-away-from-zero, matching F.round in the batch twin
            # (Python round() is banker's half-even: 0.125*100 = 12.5
            # would quantize 12 vs the batch's 13 and the one-cent skew
            # compounds through level/trend/season state)
            c = (-1 if y < 0 else 1) * int(math.floor(abs(y) * 100 + 0.5))
            if pend_hb is None:
                pend_hb, pend_sum = int(hb), c
            elif int(hb) == pend_hb:
                pend_sum += c
            else:
                fold(pend_hb, pend_sum)
                pend_hb, pend_sum = int(hb), c

        state.update(
            (
                l, t, s, has,
                pend_hb, pend_sum,
                int(new_ts.iloc[-1]), int(new_tb.iloc[-1]),
            )
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        if emitted:
            yield pd.DataFrame(
                [
                    {
                        **{c2: key[i] for i, c2 in enumerate(series)},
                        "hour_bucket": hb,
                        "level": lv,
                        "trend": tr,
                        "season": se,
                    }
                    for hb, lv, tr, se in emitted
                ]
            )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_peaks(
    stream_df: DataFrame,
    span: int = 3,
    base_span: int = 12,
    min_height_cents: int = 500,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming peak/valley detection — the continuous twin of the
    batch ``ts_peaks`` query, with the non-causal lookahead made
    explicit: a bucket's verdict needs every bucket within
    ``+base_span`` hours, so a bucket is DECIDED (and emitted, append-
    once) as soon as a LATER bucket opens beyond that horizon — in-
    order bucket arrival guarantees nothing can still land inside the
    frame.  Gaps are handled exactly like the batch RANGE frames:
    a missing hour simply isn't in the buffer, it neither creates nor
    hides extrema.

    State per key: the pending hour's exact int64 cent sum plus the
    buffer of closed (hour, sum) buckets still inside some undecided
    bucket's ±base_span window — O(2·base_span + undecided span), not
    O(stream length).  Decisions replay the batch rule verbatim on
    the buffer (unique extremum of ±span, |mean offset| over
    ±base_span ≥ the floor), so the emitted set equals the batch
    result restricted to decidable buckets (each key's trailing
    ``base_span`` hours stay pending — the honest cost of a
    non-causal operator on a stream).
    """
    import math  # noqa: PLC0415

    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("hour_bucket", LongType()),
            StructField("y_cents", LongType()),
            StructField("kind", StringType()),
            StructField("height_cents", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("hbs", ArrayType(LongType())),
            StructField("ys", ArrayType(LongType())),
            StructField("decided_to", LongType()),
            StructField("pend_hb", LongType()),
            StructField("pend_sum", LongType()),
            StructField("cur_ts", LongType()),
            StructField("cur_tb", LongType()),
        ]
    )
    thr = float(min_height_cents)

    def decide(buf: dict, b: int):
        """Batch ts_peaks rule on the buffer for bucket b."""
        y = buf[b]
        frame = [buf[h] for h in range(b - span, b + span + 1) if h in buf]
        mx, mn = max(frame), min(frame)
        base = [buf[h] for h in range(b - base_span, b + base_span + 1) if h in buf]
        height = (len(base) * y - sum(base)) / float(len(base))
        if y == mx and frame.count(mx) == 1 and height >= thr:
            return ("peak", height)
        if y == mn and frame.count(mn) == 1 and height <= -thr:
            return ("valley", height)
        return None

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col, tiebreak], kind="mergesort")
        if state.exists:
            hbs, ys, decided_to, pend_hb, pend_sum, cur_ts, cur_tb = state.get
            buf = dict(zip([int(h) for h in hbs], [int(v) for v in ys]))
        else:
            buf, decided_to = {}, None
            pend_hb, pend_sum, cur_ts, cur_tb = None, 0, None, None

        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        new_tb = new[tiebreak].astype("int64")
        if cur_ts is not None:
            ok = (new_ts > cur_ts) | ((new_ts == cur_ts) & (new_tb > cur_tb))
            if not ok.all():
                new = new[ok.to_numpy()]
                new_ts, new_tb = new_ts[ok], new_tb[ok]
            if len(new) == 0:
                if idle_timeout is not None:
                    state.setTimeoutDuration(idle_timeout)
                return

        emitted = []

        def advance(new_hb: int):
            nonlocal pend_hb, pend_sum, decided_to
            # close the pending bucket into the buffer, then decide
            # everything whose +base_span horizon the NEW bucket passes
            buf[pend_hb] = pend_sum
            for b in sorted(h for h in buf if h + base_span < new_hb
                            and (decided_to is None or h > decided_to)):
                v = decide(buf, b)
                if v is not None:
                    emitted.append((b, buf[b], v[0], v[1]))
                decided_to = b
            # prune: keep only buckets still inside some undecided
            # bucket's base window
            lo = (decided_to + 1 if decided_to is not None else min(buf)) - base_span
            for h in [h for h in buf if h < lo]:
                del buf[h]
            pend_hb, pend_sum = new_hb, 0

        vals = new[value_col].astype(float).to_numpy()
        hbs_arr = (new_ts // 3_600_000_000).to_numpy()
        for y, hb in zip(vals, hbs_arr):
            if math.isnan(y):
                continue
            # half-away-from-zero, matching F.round in the batch twin
            c = (-1 if y < 0 else 1) * int(math.floor(abs(y) * 100 + 0.5))
            if pend_hb is None:
                pend_hb, pend_sum = int(hb), 0
            elif int(hb) != pend_hb:
                advance(int(hb))
            pend_sum += c

        state.update(
            (
                list(buf.keys()), list(buf.values()),
                decided_to, pend_hb, pend_sum,
                int(new_ts.iloc[-1]), int(new_tb.iloc[-1]),
            )
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        if emitted:
            yield pd.DataFrame(
                [
                    {
                        **{c2: key[i] for i, c2 in enumerate(series)},
                        "hour_bucket": b,
                        "y_cents": yc,
                        "kind": kind,
                        "height_cents": py_round6(h),
                    }
                    for b, yc, kind, h in emitted
                ]
            )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_benford(
    stream_df: DataFrame,
    series: Sequence[str] = ("event_type",),
    value_col: str = "value",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming Benford conformance screen — the continuous twin of
    the batch ``events_benford`` query: per key, a running leading-
    digit histogram of the non-zero integer-cent magnitudes, re-scored
    every micro-batch (update mode: the LAST emission per key over the
    same rows equals the batch row).

    State per key is the exact int64 9-slot digit-count vector —
    mergeable across micro-batches by plain addition and
    order-insensitive by construction (no cursor needed).  The
    chi-square statistic is derived fresh from the exact counts at
    every emission with the SAME fixed term order and literal Benford
    probabilities as the batch plan, so closed snapshots are
    bit-identical.  Fraud/sensor-fault monitors run exactly this as a
    continuous control chart: the flag flips the moment the digit mix
    drifts off the log-law, without rescanning history.
    """
    import numpy as np

    from ..queries.round7 import _BENFORD_P

    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("n", LongType()),
            StructField("chi2", DoubleType()),
            StructField("benford_flag", BooleanType()),
        ]
    )
    state_schema = StructType([StructField("counts", ArrayType(LongType()))])

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        counts = [int(c) for c in state.get[0]] if state.exists else [0] * 9
        v = new[value_col].astype(float).to_numpy()
        obs = ~np.isnan(v)
        av = np.abs(v[obs]) * 100
        # half-away-from-zero cents, the shared stream-kernel quantizer
        cents = (np.sign(v[obs]) * np.floor(av + 0.5)).astype("int64")
        cents = cents[cents != 0]
        for c in cents:
            counts[int(str(abs(int(c)))[0]) - 1] += 1
        n = sum(counts)
        if n == 0:
            if idle_timeout is not None:
                state.setTimeoutDuration(idle_timeout)
            return
        state.update((counts,))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        # identical term order + literals as the batch chi2 fold
        chi2 = None
        nd = float(n)
        for o, p in zip(counts, _BENFORD_P):
            term = (float(o) - nd * p) * (float(o) - nd * p) / (nd * p)
            chi2 = term if chi2 is None else chi2 + term
        yield pd.DataFrame(
            [
                {
                    **{c: key[i] for i, c in enumerate(series)},
                    "n": n,
                    "chi2": py_round6(chi2),
                    "benford_flag": bool(chi2 > 15.507),
                }
            ]
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_interarrival(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming arrival-process profiler — the continuous twin of the
    batch ``events_interarrival`` query: per series, running mean/std
    inter-arrival gap (whole seconds), coefficient of variation, and
    Goh-Barabasi burstiness, re-emitted every micro-batch that adds at
    least one gap (update mode: last emission equals the batch row).

    State per key is three exact int64 moments (gap count, sum,
    sum-of-squares) plus the last-arrival cursor — the gap between the
    previous micro-batch's final event and the next batch's first event
    is accounted exactly, and all floats are derived fresh from the
    integer moments at emission (the batch operator's ``n·q − t²``
    identity), so snapshots are bit-identical to batch over the same
    rows.  Rows at or behind the cursor are dropped (the stream_detect
    disorder contract).
    """
    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("n_gaps", LongType()),
            StructField("mean_gap_s", DoubleType()),
            StructField("std_gap_s", DoubleType()),
            StructField("cv", DoubleType()),
            StructField("burstiness", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("t", LongType()),
            StructField("q", LongType()),
            StructField("cur_ts", LongType()),
            StructField("cur_tb", LongType()),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        import math

        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col, tiebreak], kind="mergesort")
        if state.exists:
            n, t, q, cur_ts, cur_tb = state.get
            n, t, q = int(n), int(t), int(q)
        else:
            n, t, q, cur_ts, cur_tb = 0, 0, 0, None, None
        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        new_tb = new[tiebreak].astype("int64")
        if cur_ts is not None:
            ok = (new_ts > cur_ts) | ((new_ts == cur_ts) & (new_tb > cur_tb))
            new_ts, new_tb = new_ts[ok], new_tb[ok]
        if len(new_ts) == 0:
            if idle_timeout is not None:
                state.setTimeoutDuration(idle_timeout)
            return
        ts_list = [int(x) for x in new_ts.to_numpy()]
        prev = int(cur_ts) if cur_ts is not None else None
        for micros in ts_list:
            if prev is not None:
                gap = (micros - prev) // 1_000_000
                n += 1
                t += gap
                q += gap * gap
            prev = micros
        state.update((n, t, q, ts_list[-1], int(new_tb.iloc[-1])))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        if n == 0:
            return
        root = math.sqrt(float(n * q - t * t))
        yield pd.DataFrame(
            [
                {
                    **{c: key[i] for i, c in enumerate(series)},
                    "n_gaps": n,
                    "mean_gap_s": py_round6(t / n),
                    "std_gap_s": py_round6(root / n),
                    "cv": py_round6(root / t) if t > 0 else None,
                    "burstiness": (
                        py_round6((root - float(t)) / (root + float(t)))
                        if root + float(t) > 0
                        else None
                    ),
                }
            ]
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_record_stats(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak: str = "event_id",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming record-counting trend screen — the continuous twin of
    the batch ``ts_record_stats`` query: per series, running counts of
    strict record highs/lows vs the iid-expected ``ln n + gamma +
    1/(2n)``, re-emitted every micro-batch with observations (update
    mode: last emission equals the batch row).

    Records are inherently ONLINE — the detector is just (current max,
    current min, two counters, n), all exact int64, so the stream twin
    carries no approximation at all; the cross-batch boundary is the
    same comparison as any other step.  Rows at or behind the
    (ts, tiebreak) cursor are dropped (stream_detect contract); NaN
    rows are skipped exactly like the batch NULL filter.
    """
    import math

    import numpy as np

    from ..queries.round8 import _EULER_GAMMA

    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("n_obs", LongType()),
            StructField("hi_records", LongType()),
            StructField("lo_records", LongType()),
            StructField("expected_records", DoubleType()),
            StructField("hi_ratio", DoubleType()),
            StructField("lo_ratio", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("hi", LongType()),
            StructField("lo", LongType()),
            StructField("mx", LongType()),
            StructField("mn", LongType()),
            StructField("seen", BooleanType()),
            StructField("cur_ts", LongType()),
            StructField("cur_tb", LongType()),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col, tiebreak], kind="mergesort")
        if state.exists:
            n, hi, lo, mx, mn, seen, cur_ts, cur_tb = state.get
            n, hi, lo = int(n), int(hi), int(lo)
        else:
            n, hi, lo, mx, mn, seen, cur_ts, cur_tb = 0, 0, 0, 0, 0, False, None, None
        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        new_tb = new[tiebreak].astype("int64")
        if cur_ts is not None:
            ok = (new_ts > cur_ts) | ((new_ts == cur_ts) & (new_tb > cur_tb))
            new = new[ok.to_numpy()]
            new_ts, new_tb = new_ts[ok], new_tb[ok]
        if len(new) == 0:
            if idle_timeout is not None:
                state.setTimeoutDuration(idle_timeout)
            return
        v = new[value_col].astype(float).to_numpy()
        obs = ~np.isnan(v)
        av = np.abs(v[obs]) * 100
        cents = (np.sign(v[obs]) * np.floor(av + 0.5)).astype("int64")
        for c in cents:
            c = int(c)
            if not seen:
                # the first observation is both a record high and low
                # (NULL prefix in the batch window formulation)
                hi += 1
                lo += 1
                mx = mn = c
                seen = True
            else:
                if c > mx:
                    hi += 1
                    mx = c
                if c < mn:
                    lo += 1
                    mn = c
            n += 1
        state.update(
            (n, hi, lo, int(mx), int(mn), bool(seen), int(new_ts.iloc[-1]), int(new_tb.iloc[-1]))
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        if n == 0:
            return
        nd = float(n)
        exp_rec = math.log(nd) + float(_EULER_GAMMA) + 1.0 / (2.0 * nd)
        yield pd.DataFrame(
            [
                {
                    **{c: key[i] for i, c in enumerate(series)},
                    "n_obs": n,
                    "hi_records": hi,
                    "lo_records": lo,
                    "expected_records": py_round6(exp_rec),
                    "hi_ratio": py_round6(hi / exp_rec),
                    "lo_ratio": py_round6(lo / exp_rec),
                }
            ]
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_markov_counts(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming first-order transition-count changelog — the online
    feeder of the batch ``events_markov`` matrix: per series, exact
    int64 counts of (from_type -> to_type) steps in (ts, tiebreak)
    order, the full per-key snapshot re-emitted every micro-batch that
    adds at least one transition (update mode; counts are monotone, so
    the max-count row per (key, from, to) is the final state).

    State per key is the last event type plus the (from, to, count)
    triple list — bounded by the type vocabulary squared, never by row
    count; the cross-micro-batch boundary transition (last event of
    batch k -> first event of batch k+1) is counted exactly once via
    the carried last type.  Downstream, conditional probabilities and
    lifts are pure derivations of these counts (the batch plan's own
    structure), so a periodic batch read of the changelog reproduces
    events_markov bit-for-bit.
    """
    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("from_type", StringType()),
            StructField("to_type", StringType()),
            StructField("transitions", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("last", StringType()),
            StructField("froms", ArrayType(StringType())),
            StructField("tos", ArrayType(StringType())),
            StructField("cnts", ArrayType(LongType())),
            StructField("cur_ts", LongType()),
            StructField("cur_tb", LongType()),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col, tiebreak], kind="mergesort")
        if state.exists:
            last, froms, tos, cnts, cur_ts, cur_tb = state.get
            counts = {
                (f, t): int(c) for f, t, c in zip(list(froms), list(tos), list(cnts))
            }
        else:
            last, counts, cur_ts, cur_tb = None, {}, None, None
        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        new_tb = new[tiebreak].astype("int64")
        if cur_ts is not None:
            ok = (new_ts > cur_ts) | ((new_ts == cur_ts) & (new_tb > cur_tb))
            new = new[ok.to_numpy()]
            new_ts, new_tb = new_ts[ok], new_tb[ok]
        if len(new) == 0:
            if idle_timeout is not None:
                state.setTimeoutDuration(idle_timeout)
            return
        added = False
        for t in new[type_col].astype(str):
            if last is not None:
                counts[(last, t)] = counts.get((last, t), 0) + 1
                added = True
            last = t
        state.update(
            (
                last,
                [f for f, _ in counts],
                [t for _, t in counts],
                [counts[k] for k in counts],
                int(new_ts.iloc[-1]),
                int(new_tb.iloc[-1]),
            )
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        if not added:
            return
        yield pd.DataFrame(
            [
                {
                    **{c: key[i] for i, c in enumerate(series)},
                    "from_type": f,
                    "to_type": t,
                    "transitions": c,
                }
                for (f, t), c in counts.items()
            ]
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_permutation_entropy(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming ordinal-pattern complexity — the continuous twin of
    the batch ``ts_permutation_entropy`` query: per series, the
    Bandt-Pompe m=3 pattern distribution over consecutive CLOSED
    hourly-cent buckets, re-scored each micro-batch (update mode; the
    last emission equals the batch query restricted to closed buckets,
    i.e. every hour before the series' latest open one).

    State per key: the pending (hour, exact cent sum) bucket, the last
    two closed buckets, and the exact int64 pattern-count vector
    (bounded at 6 entries).  A bucket closes when a later-hour row
    arrives (the stream_holt_winters fold); a closed bucket extends a
    triple only when the three hours are consecutive (the batch gap
    rule).  Entropy derives fresh from the exact counts per emission —
    the count-moment identity, no float state.
    """
    import math

    import numpy as np

    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("n_triples", LongType()),
            StructField("k_patterns", LongType()),
            StructField("pe_nats", DoubleType()),
            StructField("pe_norm", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("pend_hb", LongType()),
            StructField("pend_sum", LongType()),
            StructField("hbs", ArrayType(LongType())),   # last 2 closed hours
            StructField("ys", ArrayType(LongType())),    # their cent sums
            StructField("pats", ArrayType(LongType())),
            StructField("cnts", ArrayType(LongType())),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col], kind="mergesort")
        if state.exists:
            pend_hb, pend_sum, hbs, ys, pats, cnts = state.get
            hist = list(zip([int(h) for h in hbs], [int(y) for y in ys]))
            counts = {int(p): int(c) for p, c in zip(list(pats), list(cnts))}
        else:
            pend_hb, pend_sum, hist, counts = None, 0, [], {}

        def close(hb0: int, y0: int) -> None:
            nonlocal hist
            if len(hist) == 2 and hist[0][0] == hb0 - 2 and hist[1][0] == hb0 - 1:
                x = [hist[0][1], hist[1][1], y0]
                r1 = (x[1] < x[0]) + (x[2] < x[0])
                r2 = (x[0] <= x[1]) + (x[2] < x[1])
                r3 = (x[0] <= x[2]) + (x[1] <= x[2])
                p = 9 * r1 + 3 * r2 + r3
                counts[p] = counts.get(p, 0) + 1
            hist = (hist + [(hb0, y0)])[-2:]

        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        vals = new[value_col].astype(float).to_numpy()
        hbs_arr = (new_ts // 3_600_000_000).to_numpy()
        for y, hb in zip(vals, hbs_arr):
            if math.isnan(y):
                continue
            hb = int(hb)
            # half-away-from-zero, matching F.round in the batch twin
            c = (-1 if y < 0 else 1) * int(np.floor(abs(y) * 100 + 0.5))
            if pend_hb is None:
                pend_hb, pend_sum = hb, c
            elif hb == pend_hb:
                pend_sum += c
            elif hb > pend_hb:
                close(int(pend_hb), int(pend_sum))
                pend_hb, pend_sum = hb, c
            # hb < pend_hb: late row behind the open bucket — dropped
            # (bound disorder upstream with withWatermark)
        state.update(
            (
                int(pend_hb) if pend_hb is not None else None,
                int(pend_sum),
                [h for h, _ in hist],
                [y for _, y in hist],
                list(counts.keys()),
                list(counts.values()),
            )
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        n = sum(counts.values())
        if n == 0:
            return
        k = len(counts)
        h = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
        yield pd.DataFrame(
            [
                {
                    **{c: key[i] for i, c in enumerate(series)},
                    "n_triples": n,
                    "k_patterns": k,
                    "pe_nats": py_round6(h),
                    "pe_norm": py_round6(h / math.log(6.0)),
                }
            ]
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_periodogram(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    periods: Sequence[int] = (6, 8, 12, 24, 48, 168),
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming candidate-period spectral monitor — the continuous
    twin of the batch ``ts_periodogram`` query over CLOSED hourly
    buckets (the stream_holt_winters fold).

    The batch statistic z-normalizes with WHOLE-series moments, which
    looks unstreamable — but the trig sums decompose:
    ``sum z*cos = (sum y*cos - mu*sum cos) / sigma``, so per-key state
    is just the exact int64 moment triple (n, t, q) plus, per
    candidate period, the four raw running sums ``(y*cos, cos, y*sin,
    sin)`` over closed buckets — ALL mergeable by plain addition, and
    mu/sigma/power are re-derived fresh at every emission.  Each
    micro-batch that closes at least one bucket re-emits the full
    period table with the recomputed powers and the dominant flag
    (update mode; ranked by ROUNDED power like the batch plan).
    Angles use ``hb mod p`` — the same small libm arguments as batch.

    Parity contract: counts and state sums are exact, but the power
    recombination ``(sum y*cos - mu*sum cos)/sigma`` associates float
    additions differently than the batch ``sum z*cos``, so stream vs
    batch powers agree only to ~1e-13 relative — a value sitting on a
    6th-decimal rounding boundary can round one ulp apart, and since
    ``is_dominant`` ranks rounded powers, dominance can flip when the
    top-2 powers are within that tolerance.  Compare powers with a
    small absolute tolerance and only expect dominance equality when
    the top-2 gap clears it (tests/test_streaming.py does exactly
    this); the emitted flag is always internally consistent with the
    emitted rounded powers.
    """
    import math

    series = list(series)
    plist = [int(p) for p in periods]
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("period", LongType()),
            StructField("n_hours", LongType()),
            StructField("power", DoubleType()),
            StructField("power_share", DoubleType()),
            StructField("is_dominant", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("pend_hb", LongType()),
            StructField("pend_sum", LongType()),
            StructField("n", LongType()),
            StructField("t", LongType()),
            StructField("q", LongType()),
            StructField("yc", ArrayType(DoubleType())),
            StructField("cs", ArrayType(DoubleType())),
            StructField("ys", ArrayType(DoubleType())),
            StructField("sn", ArrayType(DoubleType())),
        ]
    )
    two_pi = 2 * math.pi

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col], kind="mergesort")
        k = len(plist)
        if state.exists:
            pend_hb, pend_sum, n, t, q, yc, cs, ys, sn = state.get
            n, t, q = int(n), int(t), int(q)
            yc, cs, ys, sn = (list(map(float, a)) for a in (yc, cs, ys, sn))
        else:
            pend_hb, pend_sum = None, 0
            n = t = q = 0
            yc, cs, ys, sn = [0.0] * k, [0.0] * k, [0.0] * k, [0.0] * k

        def close(hb0: int, y0: int) -> None:
            nonlocal n, t, q
            n += 1
            t += y0
            q += y0 * y0
            for i, p in enumerate(plist):
                ang = two_pi * float(hb0 % p) / float(p)
                c, s2 = math.cos(ang), math.sin(ang)
                yc[i] += y0 * c
                cs[i] += c
                ys[i] += y0 * s2
                sn[i] += s2

        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        vals = new[value_col].astype(float).to_numpy()
        hbs_arr = (new_ts // 3_600_000_000).to_numpy()
        closed_any = False
        for y, hb in zip(vals, hbs_arr):
            if math.isnan(y):
                continue
            hb = int(hb)
            c = (-1 if y < 0 else 1) * int(math.floor(abs(y) * 100 + 0.5))
            if pend_hb is None:
                pend_hb, pend_sum = hb, c
            elif hb == pend_hb:
                pend_sum += c
            elif hb > pend_hb:
                close(int(pend_hb), int(pend_sum))
                closed_any = True
                pend_hb, pend_sum = hb, c
        state.update(
            (
                int(pend_hb) if pend_hb is not None else None,
                int(pend_sum),
                n,
                t,
                q,
                yc,
                cs,
                ys,
                sn,
            )
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        if not closed_any or n == 0:
            return
        var = (q - (t * t) / n) / n
        if var <= 0:
            return
        mu, sd = t / n, math.sqrt(var)
        powers = []
        for i, p in enumerate(plist):
            a = (yc[i] - mu * cs[i]) / sd
            b = (ys[i] - mu * sn[i]) / sd
            powers.append(py_round6((a * a + b * b) / n))
        tot = sum(powers)
        dom = min(
            range(k), key=lambda i: (-powers[i], plist[i])
        )  # rounded powers, ties to shorter period — the batch rule
        yield pd.DataFrame(
            [
                {
                    **{c: key[j] for j, c in enumerate(series)},
                    "period": plist[i],
                    "n_hours": n,
                    "power": powers[i],
                    "power_share": py_round6(powers[i] / tot) if tot > 0 else None,
                    "is_dominant": i == dom,
                }
                for i in range(k)
            ]
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_conformal_snaive(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming split-conformal anomaly interval on the seasonal-naive
    forecaster — the continuous twin of the batch ``ts_conformal_snaive``
    query, and the repo's flagship calibrated streaming detector: the
    reference's vision is real-time anomaly detection
    (/root/reference/README.md:42), and conformal calibration is the
    one detector family whose flag rate carries a finite-sample
    guarantee instead of a tuned threshold.

    Semantics (identical to batch, over CLOSED hourly buckets): fold
    events into per-(series, hour) integer-cent sums; when bucket
    ``hb`` closes and bucket ``hb-24`` existed, the seasonal-naive
    residual ``|x(hb) - x(hb-24)|`` joins the CALIBRATION multiset when
    ``hb % 5 != 0`` and the TEST multiset otherwise. Every emission
    recomputes the exact conformal quantile — the
    ``((n_cal+1)*8+9) div 10``-th smallest calibration residual
    (alpha = 0.2, an int64 order statistic; the VALUE is tie-order
    independent even though the batch plan tie-breaks rows by hour) —
    and scores the full test multiset against it. A series whose
    conformal rank exceeds ``n_cal`` emits NOTHING: refusing to
    certify until n_cal >= 9 is the correct conformal contract, not a
    missing-data bug.

    100 TB state story: the fold compresses event volume to CALENDAR
    HOURS — per-series state is the open bucket, a 24-entry ring of
    recent closed buckets (the gap-safe hb-24 lookup), and the two
    residual multisets, which grow with hours elapsed (8,760/year),
    NOT with event count. A year of per-second events (31.5M rows) is
    ~7k calibration ints per series. The alpha-tail refinement (only
    the top ~n/5 residuals determine the quantile) could trim another
    5x but cannot be maintained exactly under a growing rank cutoff
    (a discarded residual can re-enter the tail when the cutoff
    grows), so the exact full multiset is kept — the honest trade at
    this state size.

    All arithmetic is integer until the one coverage division
    (py_round6 — the F.round twin). Null/NaN values contribute nothing
    to buckets, like the batch ``sum`` + ``isNotNull`` gate.
    """
    import math  # noqa: PLC0415

    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("n_cal", LongType()),
            StructField("qhat_cents", LongType()),
            StructField("n_test", LongType()),
            StructField("n_flagged", LongType()),
            StructField("coverage", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("pend_hb", LongType()),
            StructField("pend_sum", LongType()),
            StructField("rhbs", ArrayType(LongType())),
            StructField("rxs", ArrayType(LongType())),
            StructField("cal", ArrayType(LongType())),
            StructField("test", ArrayType(LongType())),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col], kind="mergesort")
        if state.exists:
            pend_hb, pend_sum, rhbs, rxs, cal, test = state.get
            recent = dict(zip([int(h) for h in rhbs], [int(x) for x in rxs]))
            cal = [int(v) for v in cal]
            test = [int(v) for v in test]
        else:
            pend_hb, pend_sum = None, 0
            recent = {}
            cal, test = [], []

        closed_any = False

        def close(hb0: int, x0: int) -> None:
            nonlocal closed_any
            closed_any = True
            prev = recent.get(hb0 - 24)
            if prev is not None:
                resid = abs(x0 - prev)
                (test if hb0 % 5 == 0 else cal).append(resid)
            recent[hb0] = x0
            # future closes are > hb0 and need lookups >= hb0 - 23
            for k2 in [k3 for k3 in recent if k3 < hb0 - 23]:
                del recent[k2]

        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        vals = new[value_col].astype(float).to_numpy()
        hbs_arr = (new_ts // 3_600_000_000).to_numpy()
        for y, hb in zip(vals, hbs_arr):
            if math.isnan(y):
                continue
            hb = int(hb)
            c = (-1 if y < 0 else 1) * int(math.floor(abs(y) * 100 + 0.5))
            if pend_hb is None:
                pend_hb, pend_sum = hb, c
            elif hb == pend_hb:
                pend_sum += c
            elif hb > pend_hb:
                close(int(pend_hb), int(pend_sum))
                pend_hb, pend_sum = hb, c
        rh = sorted(recent)
        state.update(
            (
                int(pend_hb) if pend_hb is not None else None,
                int(pend_sum),
                rh,
                [recent[h] for h in rh],
                cal,
                test,
            )
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        if not closed_any:
            return
        n_cal = len(cal)
        k = ((n_cal + 1) * 8 + 9) // 10
        if n_cal == 0 or k > n_cal:
            return  # refuse to certify: too few calibration residuals
        qhat = sorted(cal)[k - 1]
        n_test = len(test)
        cov = sum(1 for v in test if v <= qhat)
        yield pd.DataFrame(
            [
                {
                    **{c2: key[i] for i, c2 in enumerate(series)},
                    "n_cal": n_cal,
                    "qhat_cents": qhat,
                    "n_test": n_test,
                    "n_flagged": n_test - cov,
                    "coverage": py_round6(cov / n_test) if n_test > 0 else None,
                }
            ]
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_conformal_by_segment(
    stream_df: DataFrame,
    seg_col: str = "event_type",
    cohort_col: str = "cohort",
    ts_col: str = "ts",
    value_col: str = "value",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming split-conformal calibration PER (segment, cohort) —
    the continuous twin of the batch ``ts_conformal_by_segment`` query
    (VERDICT r10 #8): a segment whose residual scale differs gets its
    own exact order-statistic q-hat instead of inheriting a pooled
    quantile.

    This is a KEYED INSTANTIATION of :func:`stream_conformal_snaive`
    — the kernel is already grain-agnostic (its state is one
    calendar-hour-bounded residual multiset per GROUP KEY, whatever
    the key is), so the per-segment variant changes only the grouping:
    state is keyed by ``(segment, cohort)``, exactly the batch query's
    grain, and every per-key emission carries the same exact int64
    fields. Batch equivalence across micro-batch boundaries is tested
    in tests/test_streaming.py (the conformal_snaive_by differential —
    same closed-bucket convention, field-exact compare)."""
    return stream_conformal_snaive(
        stream_df,
        series=(seg_col, cohort_col),
        ts_col=ts_col,
        value_col=value_col,
        idle_timeout=idle_timeout,
    )


def stream_conformal_curve(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    alphas: Sequence[int] = (10, 20, 30, 40, 50),
    ts_col: str = "ts",
    value_col: str = "value",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming conformal CALIBRATION CURVE — the continuous twin of
    the batch ``ts_conformal_curve`` query (VERDICT r11 #7): per
    micro-batch that closes at least one hourly bucket, one row per
    (series, alpha_pct) with the exact per-alpha conformal quantile
    (rank ``((n_cal+1)(100-a)+99) div 100`` as an int64 order
    statistic), held-out flag count, and empirical coverage.

    This is the alpha-GRID instantiation of
    :func:`stream_conformal_snaive`'s kernel — the state is the SAME
    calendar-hour-bounded residual multiset (open bucket, 24-hour
    recent ring, calibration + test residual lists); only the
    emission-time rank read gains a grid loop, so the marginal cost
    over the single-alpha monitor is |alphas| sorted-list lookups per
    emission, zero extra state. A (series, alpha) cell whose rank
    exceeds ``n_cal`` emits NOTHING — the same refuse-to-certify
    contract as batch (alpha=0.1 needs n_cal >= 9; tighter alphas
    certify earlier). At alpha=0.2 every field reproduces
    stream_conformal_snaive exactly.

    Batch equivalence across micro-batch boundaries is field-exact
    (tests/test_streaming.py): residuals are exact int64 cents, the
    quantile VALUE is tie-order independent, coverage rounds through
    py_round6 (the F.round twin).
    """
    import math  # noqa: PLC0415

    series = list(series)
    alphas = [int(a) for a in alphas]
    if any(not 0 < a < 100 for a in alphas):
        raise ValueError(f"alphas must be integer percents in (0, 100): {alphas}")
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("alpha_pct", LongType()),
            StructField("n_cal", LongType()),
            StructField("qhat_cents", LongType()),
            StructField("n_test", LongType()),
            StructField("n_flagged", LongType()),
            StructField("coverage", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("pend_hb", LongType()),
            StructField("pend_sum", LongType()),
            StructField("rhbs", ArrayType(LongType())),
            StructField("rxs", ArrayType(LongType())),
            StructField("cal", ArrayType(LongType())),
            StructField("test", ArrayType(LongType())),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col], kind="mergesort")
        if state.exists:
            pend_hb, pend_sum, rhbs, rxs, cal, test = state.get
            recent = dict(zip([int(h) for h in rhbs], [int(x) for x in rxs]))
            cal = [int(v) for v in cal]
            test = [int(v) for v in test]
        else:
            pend_hb, pend_sum = None, 0
            recent = {}
            cal, test = [], []

        closed_any = False

        def close(hb0: int, x0: int) -> None:
            nonlocal closed_any
            closed_any = True
            prev = recent.get(hb0 - 24)
            if prev is not None:
                resid = abs(x0 - prev)
                (test if hb0 % 5 == 0 else cal).append(resid)
            recent[hb0] = x0
            for k2 in [k3 for k3 in recent if k3 < hb0 - 23]:
                del recent[k2]

        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        vals = new[value_col].astype(float).to_numpy()
        hbs_arr = (new_ts // 3_600_000_000).to_numpy()
        for y, hb in zip(vals, hbs_arr):
            if math.isnan(y):
                continue
            hb = int(hb)
            c = (-1 if y < 0 else 1) * int(math.floor(abs(y) * 100 + 0.5))
            if pend_hb is None:
                pend_hb, pend_sum = hb, c
            elif hb == pend_hb:
                pend_sum += c
            elif hb > pend_hb:
                close(int(pend_hb), int(pend_sum))
                pend_hb, pend_sum = hb, c
        rh = sorted(recent)
        state.update(
            (
                int(pend_hb) if pend_hb is not None else None,
                int(pend_sum),
                rh,
                [recent[h] for h in rh],
                cal,
                test,
            )
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        if not closed_any:
            return
        n_cal = len(cal)
        if n_cal == 0:
            return
        scal = sorted(cal)
        n_test = len(test)
        rows = []
        for a in alphas:
            k = ((n_cal + 1) * (100 - a) + 99) // 100
            if k > n_cal:
                continue  # refuse to certify this alpha
            qhat = scal[k - 1]
            cov = sum(1 for v in test if v <= qhat)
            rows.append(
                {
                    **{c2: key[i] for i, c2 in enumerate(series)},
                    "alpha_pct": a,
                    "n_cal": n_cal,
                    "qhat_cents": qhat,
                    "n_test": n_test,
                    "n_flagged": n_test - cov,
                    "coverage": py_round6(cov / n_test) if n_test > 0 else None,
                }
            )
        if rows:
            yield pd.DataFrame(rows)

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_sax(
    stream_df: DataFrame,
    series: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    top_k: int = 3,
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming top-k SAX motifs — the continuous twin of the batch
    ``ts_sax_motifs`` query: after every micro-batch that closes at
    least one hourly bucket, re-emit the series' dominant 3-hour
    symbolic words (the recurring local shapes a symbolic pre-filter
    hands to motif/discord mining).

    Unlike the periodogram (whose z-normalized trig sums decompose
    into mergeable raw sums), SAX symbols CANNOT be folded
    incrementally: each symbol compares ``(y - mu)/sigma`` against the
    N(0,1) quartiles with the WHOLE-series mu/sigma, so every closed
    bucket's letter can flip as the moments evolve. The honest exact
    state is therefore the closed-bucket series itself — (hb, y) int64
    pairs — which the fold bounds by CALENDAR HOURS (8,760/year per
    series), not event volume; symbols, gap-guarded triples, and word
    counts are recomputed at emission from <= that many rows. A
    sliding/decayed variant could bound state further but would no
    longer equal the batch query, whose contract is whole-series
    normalization.

    Emission matches batch bit-for-bit on closed buckets: identical
    double expressions for mu/sigma/z (the type_corr overflow-safe
    central-moment form), the exact N(0,1) quartile literal, the
    (count desc, word) tie order, and py_round6 shares. Variance-0
    series emit nothing (no shape information).
    """
    import math  # noqa: PLC0415

    brk = 0.6744897501960817  # exact N(0,1) quartile — _SAX_BRK literal
    series = list(series)
    key_fields = [stream_df.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("n_hours", LongType()),
            StructField("rank", LongType()),
            StructField("word", StringType()),
            StructField("n_word", LongType()),
            StructField("share", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("pend_hb", LongType()),
            StructField("pend_sum", LongType()),
            StructField("hbs", ArrayType(LongType())),
            StructField("ys", ArrayType(LongType())),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        new = new.sort_values([ts_col], kind="mergesort")
        if state.exists:
            pend_hb, pend_sum, hbs, ys = state.get
            hbs = [int(h) for h in hbs]
            ys = [int(v) for v in ys]
        else:
            pend_hb, pend_sum = None, 0
            hbs, ys = [], []

        closed_any = False
        new_ts = pd.to_datetime(new[ts_col]).astype("int64") // 1000
        vals = new[value_col].astype(float).to_numpy()
        hbs_arr = (new_ts // 3_600_000_000).to_numpy()
        for y, hb in zip(vals, hbs_arr):
            if math.isnan(y):
                continue
            hb = int(hb)
            c = (-1 if y < 0 else 1) * int(math.floor(abs(y) * 100 + 0.5))
            if pend_hb is None:
                pend_hb, pend_sum = hb, c
            elif hb == pend_hb:
                pend_sum += c
            elif hb > pend_hb:
                hbs.append(int(pend_hb))
                ys.append(int(pend_sum))
                closed_any = True
                pend_hb, pend_sum = hb, c
        state.update(
            (
                int(pend_hb) if pend_hb is not None else None,
                int(pend_sum),
                hbs,
                ys,
            )
        )
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        n = len(ys)
        if not closed_any or n == 0:
            return
        nd = float(n)
        td = float(sum(ys))
        qd = float(sum(v * v for v in ys))
        var = (qd - td * td / nd) / nd
        if var <= 0:
            return
        mu, sd = td / nd, math.sqrt(var)
        syms = []
        for v in ys:
            z = (float(v) - mu) / sd
            syms.append("a" if z < -brk else "b" if z < 0 else "c" if z < brk else "d")
        counts: dict = {}
        for i in range(n - 2):
            if hbs[i + 1] == hbs[i] + 1 and hbs[i + 2] == hbs[i] + 2:
                w = syms[i] + syms[i + 1] + syms[i + 2]
                counts[w] = counts.get(w, 0) + 1
        if not counts:
            return
        tot = sum(counts.values())
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        yield pd.DataFrame(
            [
                {
                    **{c2: key[j] for j, c2 in enumerate(series)},
                    "n_hours": n,
                    "rank": r + 1,
                    "word": w,
                    "n_word": cnt,
                    "share": py_round6(cnt / tot),
                }
                for r, (w, cnt) in enumerate(ranked)
            ]
        )

    return stream_df.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_quality_budget(
    stream_df: DataFrame,
    series: Sequence[str] = ("source",),
    text_col: str = "text",
    grid: Sequence[int] = tuple(range(0, 101, 10)),
    idle_timeout: str | None = None,
) -> DataFrame:
    """Streaming quality-knob budget curve per source — the continuous
    twin of the batch ``doc_quality_budget_curve`` engine
    (``pipeline.curate.quality_budget_curve`` with ``by=(source,)``):
    as documents arrive, maintain for every stopword-ratio cut the
    surviving doc/token counts and re-emit the full curve.

    The curve is exactly mergeable with O(1) state: the threshold
    compare ``1000*n_stop >= thr*n_words`` is per-document, so per
    (source, threshold) the survivors are plain counters — state is
    ``2*(|grid|+1)`` int64s per source, independent of corpus size
    (the cheapest state profile of any twin in this module). Shares
    derive fresh at emission via py_round6 (the F.round twin), so
    stream emissions equal the batch curve over the same prefix of
    documents bit-for-bit. Empty-token docs contribute nothing, like
    the batch ``n_words > 0`` gate.

    Tokenization happens JVM-side before the stateful operator (the
    same ``tokens()`` Column expression as batch) — the Python state
    kernel only ever sees two small integers per document.
    """
    from ..pipeline.text import STOPWORDS_EN, tokens

    glist = [int(v) for v in grid]
    k = len(glist)
    series = list(series)
    t = tokens(F.col(text_col))
    sw = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    slim = stream_df.select(
        *series,
        F.size(t).cast("long").alias("__nw"),
        F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
        .cast("long")
        .alias("__ns"),
    ).where(F.col("__nw") > 0)
    key_fields = [slim.schema[c] for c in series]
    out_schema = StructType(
        key_fields
        + [
            StructField("thr_milli", LongType()),
            StructField("n_docs_kept", LongType()),
            StructField("n_tokens_kept", LongType()),
            StructField("doc_share", DoubleType()),
            StructField("token_share", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("nd", LongType()),
            StructField("nt", LongType()),
            StructField("docs", ArrayType(LongType())),
            StructField("toks", ArrayType(LongType())),
        ]
    )

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        if state.exists:
            nd, nt, docs, toks = state.get
            nd, nt = int(nd), int(nt)
            docs = [int(v) for v in docs]
            toks = [int(v) for v in toks]
        else:
            nd = nt = 0
            docs, toks = [0] * k, [0] * k
        for nw, ns in zip(
            new["__nw"].astype("int64"), new["__ns"].astype("int64")
        ):
            nw, ns = int(nw), int(ns)
            nd += 1
            nt += nw
            for i, thr in enumerate(glist):
                if 1000 * ns >= thr * nw:
                    docs[i] += 1
                    toks[i] += nw
        state.update((nd, nt, docs, toks))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        yield pd.DataFrame(
            [
                {
                    **{c: key[j] for j, c in enumerate(series)},
                    "thr_milli": thr,
                    "n_docs_kept": docs[i],
                    "n_tokens_kept": toks[i],
                    "doc_share": py_round6(docs[i] / nd),
                    "token_share": py_round6(toks[i] / nt),
                }
                for i, thr in enumerate(glist)
            ]
        )

    return slim.groupBy(*series).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )



def _check_ref_keys(ref_stats, seg_col) -> None:
    """Fail LOUDLY on a ref_stats/seg_col shape mismatch: with seg_col
    the keys must be (type, segment) 2-tuples (the
    ``*_ref_stats(e, seg_col=...)`` shape) — a global string-keyed dict
    would be silently sliced into garbage keys ((k[0], k[1]) of a
    STRING is two characters) and the monitor would emit nothing
    forever while looking healthy. The named-error posture of ADVICE
    r10 #5."""
    if not ref_stats:
        return
    # Validate EVERY key, not just the first (ADVICE r11 #3): a dict
    # with mixed string/tuple keys would pass a first-key check and the
    # mismatched entries would be silently normalized into
    # never-matching lookup keys.
    for k in ref_stats:
        if seg_col is not None and not (
            isinstance(k, tuple) and len(k) == 2
        ):
            raise ValueError(
                f"seg_col={seg_col!r} requires (type, segment)-tuple "
                f"ref_stats keys (build with *_ref_stats(e, "
                f"seg_col=...)); got {k!r}"
            )
        if seg_col is None and isinstance(k, tuple):
            raise ValueError(
                f"ref_stats has tuple key {k!r} (a by-segment "
                "reference) but no seg_col was given — pass seg_col or "
                "rebuild the reference without one"
            )


def stream_psi_drift(
    stream_df: DataFrame,
    ref_stats: "dict[str, tuple[list[float], list[int], int]]",
    type_col: str = "event_type",
    value_col: str = "value",
    idle_timeout: str | None = None,
    seg_col: str | None = None,
) -> DataFrame:
    """Streaming Population Stability Index against a FROZEN reference
    — the production deployment shape of the batch ``events_psi_drift``
    query: the reference decile boundaries and bucket counts come from
    a batch job over the training/reference window (``ref_stats``:
    ``{type: (bounds9, ref_counts10, n_ref)}``, bounds already rounded
    half-away to 6 decimals — the batch query's own convention), and
    the stream maintains ONLY the current-window bucket counters,
    re-emitting PSI per micro-batch.

    This is deliberately parameterized rather than self-calibrating: a
    monitor that re-derives its reference from the stream it monitors
    drifts WITH the data and never alarms. State per type is 10 int64
    counters — O(1), the stream_quality_budget profile. Bucket
    assignment, Laplace smoothing, and the int64 nano-unit term
    quantization are byte-for-byte the batch formulas, so an emission
    after the stream has consumed exactly the batch query's
    current-half rows equals the batch PSI exactly (the
    batch-equivalence test does precisely that).

    NaN/null values contribute nothing (the batch ``vc IS NOT NULL``
    gate).

    ``seg_col``: the keyed (type, segment) instantiation — same
    contract as :func:`stream_wasserstein_drift`'s ``seg_col``
    (tuple-keyed ``ref_stats`` from ``psi_ref_stats(e, seg_col=...)``,
    segment column in the emission); per-key state stays 10 int64
    counters, segment-local reference deciles.
    """
    import math  # noqa: PLC0415

    seg_fields = (
        [StructField(seg_col, stream_df.schema[seg_col].dataType)]
        if seg_col
        else []
    )
    out_schema = StructType(
        [
            StructField(type_col, StringType()),
            *seg_fields,
            StructField("n_ref", LongType()),
            StructField("n_cur", LongType()),
            StructField("psi", DoubleType()),
            StructField("drift_flag", BooleanType()),
        ]
    )
    state_schema = StructType([StructField("counts", ArrayType(LongType()))])

    _check_ref_keys(ref_stats, seg_col)

    def _norm(v):
        return (
            [float(b) for b in v[0]],
            [int(c) for c in v[1]],
            int(v[2]),
        )

    if seg_col:
        ref = {(str(k[0]), k[1]): _norm(v) for k, v in ref_stats.items()}
    else:
        ref = {str(k): _norm(v) for k, v in ref_stats.items()}

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        et = key[0]
        lk = (key[0], key[1]) if seg_col else key[0]
        if lk not in ref:
            return  # no reference: cannot score drift for this key
        bounds, ref_counts, n_ref = ref[lk]
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        counts = (
            [int(c) for c in state.get[0]] if state.exists else [0] * 10
        )
        for y in new[value_col].astype(float):
            if math.isnan(y):
                continue
            vc = (-1 if y < 0 else 1) * int(math.floor(abs(y) * 100 + 0.5))
            b = 1 + sum(1 for x in bounds if float(vc) > x)
            counts[min(b, 10) - 1] += 1
        state.update((counts,))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        n_cur = sum(counts)
        acc_u = 0
        for i in range(10):
            # skip buckets empty in BOTH halves (ADVICE r9): the batch
            # counts frame only has rows for (type, bucket) observed in
            # at least one half, so when tied decile boundaries make a
            # bucket structurally unreachable the batch omits its
            # (nonzero) smoothed term — match that exactly or the
            # documented stream == batch contract breaks.
            if ref_counts[i] == 0 and counts[i] == 0:
                continue
            p = (ref_counts[i] + 1) / (n_ref + 10)
            q = (counts[i] + 1) / (n_cur + 10)
            acc_u += int(math.floor((q - p) * math.log(q / p) * 1e9 + 0.5))
        psi = py_round6(acc_u / 1e9)
        row = {type_col: et}
        if seg_col:
            row[seg_col] = key[1]
        row.update(
            {
                "n_ref": n_ref,
                "n_cur": n_cur,
                "psi": psi,
                "drift_flag": bool(psi > 0.2),
            }
        )
        yield pd.DataFrame([row])

    group_cols = [type_col] + ([seg_col] if seg_col else [])
    return stream_df.groupBy(*group_cols).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_wasserstein_drift(
    stream_df: DataFrame,
    ref_stats: "dict[str, tuple[list[int], list[int], int]]",
    type_col: str = "event_type",
    value_col: str = "value",
    flag_norm: float = 0.1,
    idle_timeout: str | None = None,
    seg_col: str | None = None,
) -> DataFrame:
    """Streaming exact 1-Wasserstein drift against a FROZEN reference
    — the deployment twin of the batch ``events_wasserstein_drift``
    (the frozen-reference pattern of :func:`stream_psi_drift`):
    ``ref_stats`` is ``{type: (cents, counts, n_ref)}`` from a batch
    job over the reference window (``w1_ref_stats``), and the stream
    maintains the current window's per-cent counts, re-emitting the
    EXACT W1 per micro-batch.

    Honest state contract: exact W1 integrates over the merged value
    domain, so state per type is one int64 counter per DISTINCT cent
    seen — bounded by the value DOMAIN, not the event volume (cent
    quantization bounds it structurally: a $0-$1000 metric is <= 100k
    counters). That is the price of exactness over PSI's 10 fixed
    buckets; a domain wider than memory wants the batch monitor on
    rollups instead.

    An emission after the stream has consumed exactly the batch
    query's current-half rows equals the batch row bit-for-bit: same
    int64 numerators ``|cum_ref*n_cur - cum_cur*n_ref| * gap``, same
    single trailing division, floats through ``py_round6`` (the
    F.round twin). NaN/null values contribute nothing (the batch
    ``vc IS NOT NULL`` gate).

    ``seg_col`` (the keyed instantiation, VERDICT r10 #7/#8 pattern):
    state and scoring key on (type, segment) instead of type —
    ``ref_stats`` keys become ``(type, seg)`` tuples (the
    ``w1_ref_stats(e, seg_col=...)`` shape) and the emission carries
    the segment column. Per-key state stays one int64 per distinct
    cent; the key space multiplies by |segments|, the per-key domain
    usually SHRINKS (a segment sees a subset of the value domain).
    Batch-equivalence vs events_wasserstein_drift_by_segment is
    tested the same way as the global twin.
    """
    import math  # noqa: PLC0415

    seg_fields = (
        [StructField(seg_col, stream_df.schema[seg_col].dataType)]
        if seg_col
        else []
    )
    out_schema = StructType(
        [
            StructField(type_col, StringType()),
            *seg_fields,
            StructField("n_ref", LongType()),
            StructField("n_cur", LongType()),
            StructField("w1_value", DoubleType()),
            StructField("w1_norm", DoubleType()),
            StructField("drift_flag", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("cents", ArrayType(LongType())),
            StructField("counts", ArrayType(LongType())),
        ]
    )
    _check_ref_keys(ref_stats, seg_col)

    def _norm(v):
        return (
            [int(c) for c in v[0]],
            [int(c) for c in v[1]],
            int(v[2]),
        )

    if seg_col:
        ref = {(str(t[0]), t[1]): _norm(v) for t, v in ref_stats.items()}
    else:
        ref = {str(t): _norm(v) for t, v in ref_stats.items()}

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        et = key[0]
        lk = (key[0], key[1]) if seg_col else key[0]
        if lk not in ref:
            return
        rcents, rcounts, n_ref = ref[lk]
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        if state.exists:
            sc, sn = state.get
            cur = dict(zip([int(x) for x in sc], [int(x) for x in sn]))
        else:
            cur = {}
        for y in new[value_col].astype(float):
            if math.isnan(y):
                continue
            vc = (-1 if y < 0 else 1) * int(math.floor(abs(y) * 100 + 0.5))
            cur[vc] = cur.get(vc, 0) + 1
        ks = sorted(cur)
        state.update(([int(x) for x in ks], [int(cur[x]) for x in ks]))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        n_cur = sum(cur.values())
        rmap = dict(zip(rcents, rcounts))
        merged = sorted(set(rcents) | set(cur))
        if n_cur == 0 or n_ref == 0 or len(merged) < 2:
            return
        s = 0
        cumr = cumc = 0
        for i, v in enumerate(merged[:-1]):
            cumr += rmap.get(v, 0)
            cumc += cur.get(v, 0)
            s += abs(cumr * n_cur - cumc * n_ref) * (merged[i + 1] - v)
        span = merged[-1] - merged[0]
        w1 = py_round6(s / (n_ref * n_cur * 100.0))
        w1n = py_round6(s / (n_ref * n_cur * float(span)))
        row = {type_col: et}
        if seg_col:
            row[seg_col] = key[1]
        row.update(
            {
                "n_ref": n_ref,
                "n_cur": n_cur,
                "w1_value": w1,
                "w1_norm": w1n,
                "drift_flag": bool(w1n > flag_norm),
            }
        )
        yield pd.DataFrame([row])

    group_cols = [type_col] + ([seg_col] if seg_col else [])
    return stream_df.groupBy(*group_cols).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def stream_ks_drift(
    stream_df: DataFrame,
    ref_stats: "dict[str, tuple[list[int], list[int], int]]",
    type_col: str = "event_type",
    value_col: str = "value",
    alpha_coeff: float = 1.358,
    idle_timeout: str | None = None,
    seg_col: str | None = None,
) -> DataFrame:
    """Streaming two-sample Kolmogorov-Smirnov drift against a FROZEN
    reference — completes the streaming drift triple next to
    :func:`stream_psi_drift` (binned mass movement) and
    :func:`stream_wasserstein_drift` (distance moved): per micro-batch,
    the exact KS distance between the reference ECDF (``ref_stats`` =
    ``{type: (cents, counts, n_ref)}`` from ``w1_ref_stats`` — the
    same frozen frame the W1 twin uses) and the current window, the
    cent value where the gap peaks, and the alpha = 0.05 rejection
    flag with the standard ``c(alpha) * sqrt((n1+n2)/(n1*n2))``
    critical value.

    Note the deployment-shape difference vs the batch
    ``events_ks_drift`` (each type vs the REST of the population,
    within one snapshot): this is the MONITOR form — current window
    vs a frozen training/reference window per type — so its
    correctness gate is the pure-python two-sample KS reference in
    tests, not the batch query (they answer different questions; the
    PSI/W1 twins' batch queries already pin the half-split frame this
    one shares).

    State per type is one int64 counter per distinct cent seen — the
    :func:`stream_wasserstein_drift` contract, bounded by the value
    DOMAIN; exact ECDFs need it (KS over sketches would silently
    change the statistic). The KS distance itself is computed with
    int64 numerators (``|cum_ref * n_cur - cum_cur * n_ref|`` over the
    merged domain, max then ONE division), so the reported value is
    aggregation-order-exact like the batch drift family.

    ``seg_col``: the keyed (type, segment) instantiation — same
    contract as :func:`stream_wasserstein_drift`'s ``seg_col``
    (tuple-keyed ``ref_stats``, segment column in the emission,
    per-key state unchanged).
    """
    import math  # noqa: PLC0415

    seg_fields = (
        [StructField(seg_col, stream_df.schema[seg_col].dataType)]
        if seg_col
        else []
    )
    out_schema = StructType(
        [
            StructField(type_col, StringType()),
            *seg_fields,
            StructField("n_ref", LongType()),
            StructField("n_cur", LongType()),
            StructField("ks", DoubleType()),
            StructField("ks_at_cent", LongType()),
            StructField("drift_flag", BooleanType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("cents", ArrayType(LongType())),
            StructField("counts", ArrayType(LongType())),
        ]
    )

    _check_ref_keys(ref_stats, seg_col)

    def _norm(v):
        return ([int(c) for c in v[0]], [int(c) for c in v[1]], int(v[2]))

    if seg_col:
        ref = {(str(t[0]), t[1]): _norm(v) for t, v in ref_stats.items()}
    else:
        ref = {str(t): _norm(v) for t, v in ref_stats.items()}

    def process(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        et = key[0]
        lk = (key[0], key[1]) if seg_col else key[0]
        if lk not in ref:
            return
        rcents, rcounts, n_ref = ref[lk]
        new = pd.concat(list(pdfs), ignore_index=True) if pdfs else pd.DataFrame()
        if len(new) == 0:
            return
        if state.exists:
            sc, sn = state.get
            cur = dict(zip([int(x) for x in sc], [int(x) for x in sn]))
        else:
            cur = {}
        for y in new[value_col].astype(float):
            if math.isnan(y):
                continue
            vc = (-1 if y < 0 else 1) * int(math.floor(abs(y) * 100 + 0.5))
            cur[vc] = cur.get(vc, 0) + 1
        ks_keys = sorted(cur)
        state.update(([int(x) for x in ks_keys], [int(cur[x]) for x in ks_keys]))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)
        n_cur = sum(cur.values())
        if n_cur == 0 or n_ref == 0:
            return
        rmap = dict(zip(rcents, rcounts))
        merged = sorted(set(rcents) | set(cur))
        best_num = -1
        best_v = merged[0]
        cumr = cumc = 0
        for v in merged:
            cumr += rmap.get(v, 0)
            cumc += cur.get(v, 0)
            num = abs(cumr * n_cur - cumc * n_ref)
            if num > best_num:
                best_num, best_v = num, v
        ks = py_round6(best_num / (n_ref * n_cur))
        crit = alpha_coeff * math.sqrt(
            (n_ref + n_cur) / (n_ref * n_cur)
        )
        row = {type_col: et}
        if seg_col:
            row[seg_col] = key[1]
        row.update(
            {
                "n_ref": n_ref,
                "n_cur": n_cur,
                "ks": ks,
                "ks_at_cent": int(best_v),
                "drift_flag": bool(best_num / (n_ref * n_cur) > crit),
            }
        )
        yield pd.DataFrame([row])

    group_cols = [type_col] + ([seg_col] if seg_col else [])
    return stream_df.groupBy(*group_cols).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
