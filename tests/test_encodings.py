"""Encoding-matrix regression net for timestamp normalization.

The driver's fixture parquet has shipped ``ts`` in three physical
encodings across rounds (TIMESTAMP(NANOS), TIMESTAMP(MICROS)-UTC,
TIMESTAMP(MICROS)-NTZ); each flip broke a different un-normalized call
site. This test writes the same events slice in all three encodings and
asserts the engine produces byte-identical results through
``registry.table`` / ``read_parquet_timeseries`` — the net that catches
the next flip before the driver does.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from tsod_spark import registry
from tsod_spark.detectors import DiffDetector
from tsod_spark.sources.readers import read_parquet_timeseries

SF = "/root/testdata/sf0.001"

ENCODINGS = ["micros_utc", "micros_ntz", "nanos"]


@pytest.fixture(scope="module")
def encoded_dirs(spark, tmp_path_factory):
    """The same 2000-row events slice written under each ts encoding."""
    base = tmp_path_factory.mktemp("ts_encodings")
    src = (
        registry.table(spark, SF, "events")
        .orderBy("ts", "event_id")
        .limit(2000)
        .toPandas()
    )
    tbl = pa.Table.from_pandas(src, preserve_index=False)
    i = tbl.schema.get_field_index("ts")
    variants = {
        "micros_utc": tbl.set_column(
            i, pa.field("ts", pa.timestamp("us", tz="UTC")),
            tbl.column(i).cast(pa.timestamp("us", tz="UTC"))),
        "micros_ntz": tbl.set_column(
            i, pa.field("ts", pa.timestamp("us")),
            tbl.column(i).cast(pa.timestamp("us"))),
        "nanos": tbl.set_column(
            i, pa.field("ts", pa.timestamp("ns")),
            tbl.column(i).cast(pa.timestamp("ns"))),
    }
    dirs = {}
    for name, t in variants.items():
        d = base / name
        d.mkdir()
        pq.write_table(t, d / "events.parquet", store_schema=False)
        dirs[name] = str(d)
    return dirs


def _physical_type(path):
    return pq.read_schema(f"{path}/events.parquet").field("ts").type


def test_fixture_encodings_differ_on_disk(encoded_dirs):
    types = {n: str(_physical_type(d)) for n, d in encoded_dirs.items()}
    assert types["micros_utc"] == "timestamp[us, tz=UTC]"
    assert types["micros_ntz"] == "timestamp[us]"
    assert types["nanos"] == "timestamp[ns]"


@pytest.mark.parametrize("enc", ENCODINGS)
def test_table_normalizes_to_timestamp(spark, encoded_dirs, enc):
    df = registry.table(spark, encoded_dirs[enc], "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    # unix_micros is the operator-side requirement that NTZ/bigint break
    assert df.select(F.unix_micros("ts")).first()[0] is not None


def test_detector_results_identical_across_encodings(spark, encoded_dirs):
    det = DiffDetector(50.0)
    results = {}
    for enc, d in encoded_dirs.items():
        tsf = read_parquet_timeseries(spark, f"{d}/events.parquet",
                                      series=["user_id"])
        rows = (
            det.detect(tsf)
            .select("user_id", F.unix_micros("ts").alias("us"), "is_anomaly")
            .orderBy("user_id", "us")
            .collect()
        )
        results[enc] = [(r.user_id, r.us, r.is_anomaly) for r in rows]
    assert results["micros_utc"] == results["micros_ntz"] == results["nanos"]
    assert len(results["nanos"]) >= 1000
    assert any(r[2] for r in results["nanos"])


def test_sliding_window_query_runs_on_ntz(spark, encoded_dirs):
    """The exact round-2 failure: a range window ordered by unix_micros
    over NTZ-encoded events (events_sliding_1h / bench crash)."""
    out = registry.QUERIES["events_sliding_1h"](spark, encoded_dirs["micros_ntz"])
    assert out.count() > 0
