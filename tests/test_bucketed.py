"""Bucketed-storage tests: the join/agg shuffle disappears.

The point of sources/bucketed.py is physical: same-bucketed tables
equi-join with ZERO Exchange operators. These tests assert that on the
actual optimized plans, not by inspection.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tsod_spark.sources.bucketed import read_table, save_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    tmp = tempfile.mkdtemp(prefix="bucketed_")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    save_bucketed(orders, "orders_b", "o_orderkey", 4, path=f"{tmp}/orders_b")
    save_bucketed(lineitem, "lineitem_b", "l_orderkey", 4, path=f"{tmp}/lineitem_b")
    yield spark
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(tmp, ignore_errors=True)


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    o = read_table(spark, "orders_b")
    li = read_table(spark, "lineitem_b")
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).groupBy(
        "o_orderpriority"
    ).count()
    p = plan(joined)
    join_part = p.split("HashAggregate")[0]
    assert "Exchange" not in join_part, f"join still shuffles:\n{join_part}"
    # and it returns the same rows as the shuffled join
    plain = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_groupby_on_key_has_no_exchange(bucketed):
    spark = bucketed
    li = read_table(spark, "lineitem_b")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert "Exchange" not in plan(agg)
