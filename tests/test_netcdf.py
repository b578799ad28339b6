"""Stdlib NetCDF classic codec + CMEMS QC-flag ingest path.

The reference's CMEMS notebook reads ``PSAL``/``PSAL_QC`` over TIME
from an in-situ station file (/root/reference/notebooks/cmems.ipynb;
fixture tests/data/BO_TS_MO_FINO2.nc). xarray is absent in this
container, so these tests exercise the pure-stdlib classic codec
(`tsod_spark.sources.netcdf3`) end-to-end: writer → parser →
``decode_cmems`` → the distributed ``read_netcdf_fleet`` path →
QC-validated detector run.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tsod_spark.sources.netcdf3 import (
    NC_BYTE,
    NC_CHAR,
    NC_DOUBLE,
    NC_FLOAT,
    NC_SHORT,
    build_netcdf3,
    decode_cmems,
    parse_netcdf3,
    time_axis_to_timestamps,
)


def cmems_station_bytes(n=48, station=0, fill_at=(5,), bad_qc_at=(7,)):
    """A CMEMS-shaped classic file: TIME (days since 1950), DEPTH
    singleton, PSAL packed as short with scale/offset + _FillValue,
    PSAL_QC bytes (flag 1 = good)."""
    time = 25000.0 + station + np.arange(n) / 24.0  # hourly, days since 1950
    psal_raw = (3000 + 10 * np.arange(n) + station).astype("i2")  # packed
    psal_raw[list(fill_at)] = -32767
    qc = np.ones(n, "i1")
    qc[list(bad_qc_at)] = 4
    return build_netcdf3(
        variables={
            "TIME": {
                "data": time,
                "dims": ["TIME"],
                "nc_type": NC_DOUBLE,
                "attrs": {"units": (NC_CHAR, "days since 1950-01-01T00:00:00Z")},
            },
            "DEPH": {"data": np.array([2.0]), "dims": ["DEPTH"], "nc_type": NC_FLOAT},
            "PSAL": {
                "data": psal_raw,
                "dims": ["TIME", "DEPTH"],
                "nc_type": NC_SHORT,
                "attrs": {
                    "scale_factor": (NC_DOUBLE, 0.001),
                    "add_offset": (NC_DOUBLE, 30.0),
                    "_FillValue": (NC_SHORT, -32767),
                },
            },
            "PSAL_QC": {"data": qc, "dims": ["TIME", "DEPTH"], "nc_type": NC_BYTE},
        },
        dims=[("TIME", n), ("DEPTH", 1)],
        global_attrs={"institution": (NC_CHAR, "synthetic CMEMS station")},
    )


def test_parse_roundtrip_header_and_data():
    raw = cmems_station_bytes(n=10)
    ds = parse_netcdf3(raw)
    assert dict(ds["dims"]) == {"TIME": 10, "DEPTH": 1}
    assert ds["attrs"]["institution"] == "synthetic CMEMS station"
    assert ds["vars"]["PSAL"]["dims"] == ["TIME", "DEPTH"]
    assert ds["vars"]["PSAL"]["data"].shape == (10, 1)
    assert ds["vars"]["TIME"]["attrs"]["units"].startswith("days since 1950")
    np.testing.assert_array_equal(
        ds["vars"]["PSAL_QC"]["data"].ravel()[:8], [1, 1, 1, 1, 1, 1, 1, 4]
    )


def test_decode_cmems_packing_fill_and_time():
    pdf = decode_cmems(cmems_station_bytes(n=24))
    assert list(pdf.columns) == ["ts", "value", "qc"]
    assert len(pdf) == 24
    # CF packing: raw*scale + offset; raw 3000 -> 33.0 psu
    assert pdf["value"].iloc[0] == pytest.approx(33.0)
    assert pdf["value"].iloc[1] == pytest.approx(33.01)
    assert np.isnan(pdf["value"].iloc[5])  # _FillValue masked
    assert pdf["qc"].tolist().count(4) == 1
    # days-since-1950 epoch, hourly cadence
    assert pdf["ts"].iloc[0] == pd.Timestamp("1950-01-01") + pd.Timedelta(days=25000)
    assert (pdf["ts"].iloc[1] - pdf["ts"].iloc[0]) == pd.Timedelta(hours=1)


def test_time_units_variants():
    got = time_axis_to_timestamps(np.array([0.0, 90.0]), "seconds since 2020-01-01")
    assert got.iloc[1] == pd.Timestamp("2020-01-01 00:01:30")
    got = time_axis_to_timestamps(np.array([36.0]), "hours since 2020-02-28 12:00:00")
    assert got.iloc[0] == pd.Timestamp("2020-03-01 00:00:00")
    with pytest.raises(ValueError):
        time_axis_to_timestamps(np.array([1.0]), "fortnights since 2020-01-01")


def test_non_netcdf_bytes_rejected():
    with pytest.raises(ValueError):
        parse_netcdf3(b"\x89HDF\r\n\x1a\nnot-classic")


def test_driver_side_reader(spark, tmp_path):
    p = tmp_path / "station.nc"
    p.write_bytes(cmems_station_bytes(n=12))
    from tsod_spark.sources import read_netcdf_timeseries

    df = read_netcdf_timeseries(spark, str(p), "PSAL")
    rows = df.orderBy("ts").collect()
    assert len(rows) == 12
    assert rows[0].value == pytest.approx(33.0)
    assert rows[7].qc == 4


def test_fleet_ingest_real_decoder_qc_detector(spark, tmp_path):
    """The full distributed path on REAL classic bytes: binaryFile →
    mapInPandas stdlib decode → QC projection → detector over the
    good-flag subset (the reference notebook's workflow)."""
    from tsod_spark.detectors import RangeDetector
    from tsod_spark.frame import TimeSeriesFrame
    from tsod_spark.sources import qc_flag_projection, read_netcdf_fleet

    fleet = tmp_path / "fleet"
    fleet.mkdir()
    for s in range(3):
        (fleet / f"station{s}.nc").write_bytes(cmems_station_bytes(n=48, station=s))

    out = read_netcdf_fleet(spark, str(fleet / "*.nc"), variable="PSAL")
    got = qc_flag_projection(out)
    rows = got.collect()
    assert len(rows) == 3 * 48
    assert sum(not r.qc_is_good for r in rows) == 3  # one bad flag per station
    assert len({r.source for r in rows}) == 3

    good = got.where("qc_is_good AND NOT isnan(value)")
    tsf = TimeSeriesFrame(good, series=["source"])
    flagged = RangeDetector(min_value=33.0, max_value=33.4).detect(tsf)
    n_anom = flagged.where("is_anomaly").count()
    # values run 33.0 .. ~33.47 per station: the top of each series trips
    assert n_anom > 0
    assert flagged.count() == good.count()


# ---- NetCDF-4 / HDF5: the reference's ACTUAL committed fixture --------

REF_NC = "/root/reference/tests/data/BO_TS_MO_FINO2.nc"


def test_hdf5_reader_decodes_reference_fixture():
    """The stdlib HDF5 subset reader decodes the reference's committed
    CMEMS station file (notebooks/cmems.ipynb, tests/data/
    BO_TS_MO_FINO2.nc): full PSAL series with CF packing and QC
    companions — no xarray/h5py/netCDF4 anywhere."""
    from tsod_spark.sources.hdf5 import H5File, decode_cmems_hdf5

    content = open(REF_NC, "rb").read()
    f = H5File(content)
    links = f.links(f.root_addr)
    assert {"TIME", "PSAL", "PSAL_QC", "TEMP", "TEMP_QC"} <= set(links)

    pdf = decode_cmems_hdf5(content)
    assert len(pdf) == 34797
    assert str(pdf["ts"].iloc[0]) == "2015-10-01 00:00:00"
    # Baltic surface salinity ≈ 8 PSU: packing applied correctly
    assert 7.5 < pdf["value"].dropna().median() < 9.5
    # CMEMS QC flag vocabulary; fill rows carry qc=9 (missing)
    assert set(pdf["qc"].unique()) <= {0, 1, 2, 3, 4, 5, 6, 7, 8, 9}
    assert (pdf["value"].isna() == (pdf["qc"] == 9)).all()


def test_hdf5_reader_other_variables():
    from tsod_spark.sources.hdf5 import decode_cmems_hdf5

    content = open(REF_NC, "rb").read()
    temp = decode_cmems_hdf5(content, variable="TEMP")
    assert len(temp) == 34797
    assert 0.0 < temp["value"].dropna().median() < 25.0  # Baltic SST


def test_reference_notebook_workflow_on_spark(spark):
    """The cmems.ipynb workflow end-to-end on the engine: ingest the
    real station file distributed, project QC, validate a detector
    against the independent QC labels (flag 1 = good)."""
    from tsod_spark.detectors import RangeDetector
    from tsod_spark.frame import TimeSeriesFrame
    from tsod_spark.sources import qc_flag_projection, read_netcdf_fleet

    out = read_netcdf_fleet(spark, REF_NC, variable="PSAL")
    got = qc_flag_projection(out)
    assert got.count() == 34797
    by_flag = {r["qc"]: r["n"] for r in got.groupBy("qc").agg(
        F.count("*").alias("n")).collect()}
    assert by_flag[1] == 23488 and by_flag[9] == 9271

    good = got.where("qc_is_good AND NOT isnan(value) AND value IS NOT NULL")
    tsf = TimeSeriesFrame(good.withColumn("station", F.lit("FINO2")),
                          series=["station"])
    det = RangeDetector(quantiles=[0.001, 0.999]).fit(tsf)
    flagged = det.detect(tsf)
    n = flagged.count()
    n_anom = flagged.where("is_anomaly").count()
    assert n == 23488 and 0 < n_anom < n * 0.01


def test_python_datasource_matches_fleet_reader(spark):
    """spark.read.format('netcdf_timeseries') — the Spark-4 Python
    DataSource — returns the same rows as read_netcdf_fleet on the
    reference's real CMEMS fixture (one InputPartition per file, Arrow
    batch emission)."""
    from tsod_spark.sources import NetCDFTimeseriesDataSource, read_netcdf_fleet

    spark.dataSource.register(NetCDFTimeseriesDataSource)
    ds = (
        spark.read.format("netcdf_timeseries")
        .option("variable", "PSAL")
        .load(REF_NC)
    )
    got = {(r.ts, r.value, r.qc) for r in ds.collect()}
    fleet = read_netcdf_fleet(spark, REF_NC, variable="PSAL")
    expected = {(r.ts, r.value, r.qc) for r in fleet.collect()}
    assert got == expected and len(got) > 100
    assert ds.rdd.getNumPartitions() == 1  # one file -> one partition
