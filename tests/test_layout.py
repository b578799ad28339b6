"""Z-order layout: verify the written parquet's min-max statistics
actually prune a multi-dimensional box predicate, against a time-sorted
layout as the control."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tsod_spark.registry import table
from tsod_spark.sources.layout import zorder_write

SF = "/root/testdata/sf0.001"


def candidate_files(path: str, box: dict[str, tuple[float, float]]) -> tuple[int, int]:
    """(files whose stats overlap the box, total files)."""
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        overlaps = True
        for col, (lo, hi) in box.items():
            mn = min(
                md.row_group(g).column(names[col]).statistics.min
                for g in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(g).column(names[col]).statistics.max
                for g in range(md.num_row_groups)
            )
            if mx < lo or mn > hi:
                overlaps = False
                break
        if overlaps:
            hit += 1
    return hit, len(files)


def test_zorder_prunes_box_predicate(spark, tmp_path):
    events = table(spark, SF, "events").select("event_id", "user_id", "ts", "value")
    events = events.where(~F.isnan("value"))

    z_path = str(tmp_path / "zorder")
    t_path = str(tmp_path / "time_sorted")
    zorder_write(events, z_path, ["user_id", "value"], num_files=16)
    (
        events.repartitionByRange(16, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(t_path)
    )

    # a ~1/16 x ~1/4 box on (user_id, value)
    box = {"user_id": (10, 19), "value": (0.0, 80.0)}
    z_hit, z_total = candidate_files(z_path, box)
    t_hit, t_total = candidate_files(t_path, box)
    assert z_total == t_total == 16

    # correctness: both layouts return identical rows for the predicate
    pred = (
        (F.col("user_id") >= 10) & (F.col("user_id") <= 19)
        & (F.col("value") >= 0.0) & (F.col("value") <= 80.0)
    )
    z_rows = {r["event_id"] for r in spark.read.parquet(z_path).where(pred).collect()}
    t_rows = {r["event_id"] for r in spark.read.parquet(t_path).where(pred).collect()}
    assert z_rows == t_rows and len(z_rows) > 0

    # the point of the layout: stats prune most z-files, and strictly
    # more than the time-sorted control (where every file spans all
    # users and values)
    assert t_hit == t_total, (t_hit, t_total)
    assert z_hit <= z_total // 2, (z_hit, z_total)
