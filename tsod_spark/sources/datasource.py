"""Spark 4 Python DataSource for NetCDF time-series fleets.

The idiomatic ingestion surface for the reference's CMEMS workflow
(`/root/reference/notebooks/cmems.ipynb` reads one station file with
xarray; a cluster reads thousands):

    spark.dataSource.register(NetCDFTimeseriesDataSource)
    df = (spark.read.format("netcdf_timeseries")
          .option("variable", "PSAL")
          .load("/data/stations/*.nc"))

Same output contract as :func:`tsod_spark.sources.read_netcdf_fleet`
(``source, ts, value, qc``), but as a first-class source: Catalyst
sees a real scan node, the file list becomes one InputPartition per
file (NetCDF is not splittable — a FLEET of them parallelizes
perfectly), and each partition decodes with the pure-stdlib
NetCDF-3 / HDF5-subset codecs and yields one Arrow batch (zero
per-row Python overhead).

File listing runs on the driver via glob — the same place Spark's
built-in FileIndex runs; for object stores swap the lister, the
partition/decode shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

NETCDF_DS_SCHEMA = "source string, ts timestamp_ntz, value double, qc int"


class NetCDFTimeseriesDataSource(DataSource):
    """``format("netcdf_timeseries")`` — options:

    - ``path`` (or ``load(path)``): file path or glob;
    - ``variable`` (default ``PSAL``): the data variable to extract;
    - ``qc_suffix`` (default ``_QC``): companion QC-flag variable
      suffix (CMEMS layout).
    """

    @classmethod
    def name(cls) -> str:
        return "netcdf_timeseries"

    def schema(self) -> str:
        return NETCDF_DS_SCHEMA

    def reader(self, schema) -> "NetCDFTimeseriesReader":
        return NetCDFTimeseriesReader(self.options)


class NetCDFTimeseriesReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options.get("path")
        if not self._path:
            from ..exceptions import WrongInputDataTypeError

            raise WrongInputDataTypeError(
                "netcdf_timeseries needs a path: .load('/dir/*.nc')"
            )
        self._variable = options.get("variable", "PSAL")
        self._qc_suffix = options.get("qc_suffix", "_QC")

    def partitions(self):
        import glob
        import os

        path = self._path
        if os.path.isdir(path):
            path = os.path.join(path, "*.nc")
        files = sorted(glob.glob(path))
        if not files:
            from ..exceptions import WrongInputDataTypeError

            raise WrongInputDataTypeError(f"no files match {self._path}")
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        import pyarrow as pa

        from .readers import _decode_netcdf_bytes

        path = partition.value
        with open(path, "rb") as f:
            content = f.read()
        pdf = _decode_netcdf_bytes(content, self._variable, self._qc_suffix)
        yield pa.RecordBatch.from_pydict(
            {
                "source": [path] * len(pdf),
                "ts": pa.Array.from_pandas(pdf["ts"], type=pa.timestamp("us")),
                "value": pa.Array.from_pandas(
                    pdf["value"], type=pa.float64()
                ),
                "qc": pa.Array.from_pandas(pdf["qc"], type=pa.int32()),
            }
        )
