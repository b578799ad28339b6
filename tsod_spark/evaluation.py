"""Detector evaluation against independent labels.

The reference validates detectors by eye against CMEMS QC flags
(notebooks/cmems.ipynb plots PSAL colored by flag). This module makes
that quantitative and distributed: run any detector, join its
``is_anomaly`` output to a boolean label column, and produce the
confusion counts + precision/recall/F1 in ONE aggregation — no
collect, no per-row Python, so it evaluates on the full corpus at any
scale (model-selection sweeps are a ``CombinedDetector``-style loop of
lazy plans, not a driver-side grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .frame import TimeSeriesFrame


def confusion(flags: DataFrame, label_col: str, pred_col: str = "is_anomaly") -> DataFrame:
    """1-row confusion counts + metrics from a detector output frame
    that carries a boolean ground-truth ``label_col``."""
    p = F.coalesce(F.col(pred_col), F.lit(False)).cast("int")
    y = F.coalesce(F.col(label_col), F.lit(False)).cast("int")
    agg = flags.agg(
        F.sum(p * y).cast("long").alias("tp"),
        F.sum(p * (1 - y)).cast("long").alias("fp"),
        F.sum((1 - p) * y).cast("long").alias("fn"),
        F.sum((1 - p) * (1 - y)).cast("long").alias("tn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    prec = F.when(tp + fp > 0, tp / (tp + fp))
    rec = F.when(tp + fn > 0, tp / (tp + fn))
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)), 6
        ).alias("f1"),
    )


def evaluate_detector(
    detector, tsf: TimeSeriesFrame, label_col: str
) -> DataFrame:
    """Detect on ``tsf`` (whose frame carries ``label_col``) and score
    against it. Returns the 1-row confusion/metrics frame."""
    flags = detector.detect(tsf)
    if label_col not in flags.columns:  # detectors pass input cols through
        keys = [*tsf.series, "ts"]
        flags = flags.join(tsf.df.select(*keys, label_col), keys)
    return confusion(flags, label_col)


def evaluate_many(
    detectors: dict[str, object], tsf: TimeSeriesFrame, label_col: str
) -> DataFrame:
    """Model-selection sweep: one labeled metrics row per detector.
    Each detector contributes an independent lazy plan; the union is
    a single job when the caller executes it."""
    out = None
    for name, det in detectors.items():
        row = evaluate_detector(det, tsf, label_col).withColumn(
            "detector", F.lit(name)
        )
        out = row if out is None else out.unionByName(row)
    return out.select("detector", "tp", "fp", "fn", "tn", "precision", "recall", "f1")
