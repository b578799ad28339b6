import datetime
import math

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("tsod_spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        # 165 codegen-heavy plans overflow the JVM's default 240m JIT
        # code cache mid-session; once it fills, compilation stops and
        # CPU-bound generated code (md5 dedup pipelines) runs
        # interpreted 3-7x slower -- the root cause of the CC-family
        # run-to-run variance (measured: pairs phase 3s->10s across
        # trials, steady 1.6s with this flag).
        .config("spark.driver.extraJavaOptions", "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing")
        .getOrCreate()
    )
    yield s
    s.stop()


def hourly_series(spark, values, start="2020-01-01 00:00:00"):
    """(ts, value) DataFrame with hourly timestamps, NaN for missing —
    the shape of every reference golden fixture (FIXTURES.md)."""
    t0 = datetime.datetime.fromisoformat(start)
    rows = [
        (t0 + datetime.timedelta(hours=i), float("nan") if v is None else float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "ts timestamp, value double")


def detected_mask(df, n):
    """Collect is_anomaly ordered by ts into a python list of bools."""
    rows = df.orderBy("ts").select("is_anomaly").collect()
    assert len(rows) == n
    return [bool(r.is_anomaly) for r in rows]


NAN = math.nan
