"""Time-series ingest — the reference's source formats, Spark-native.

Reference ingest surface (SURVEY §1.2):

- CSV with a datetime index column (``datetime,value`` header) —
  ``pd.read_csv(parse_dates=True, index_col=0)`` in
  /root/reference/tests/test_detectors.py:179-183;
- CMEMS in-situ NetCDF with QC-flag companion variables
  (/root/reference/notebooks/cmems.ipynb);
- MIKE Dfs0 via mikeio (/root/reference/docs/getting_started.rst:64-67).

NetCDF/Dfs0 have no distributed Spark reader; the right cluster shape
is a converter job (driver-side xarray/mikeio decode of each file —
they are single-machine formats — then parallel parquet write). The
converters here are import-gated: xarray/mikeio are not in this
container, so they raise a clear error unless the libraries exist.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..encodings import read_table
from ..util import default_parallelism
from ..frame import TimeSeriesFrame


def read_csv_timeseries(
    spark: SparkSession,
    path: str,
    ts_col: str | None = None,
    value_col: str | None = None,
    series: list[str] | None = None,
) -> TimeSeriesFrame:
    """CSV with a leading datetime column (the reference's
    ``datetime,value`` shape). Columns default to the first two."""
    df = spark.read.csv(path, header=True, inferSchema=True)
    cols = df.columns
    ts_col = ts_col or cols[0]
    value_col = value_col or cols[1]
    df = df.withColumn(ts_col, F.to_timestamp(F.col(ts_col)))
    df = df.withColumnRenamed(ts_col, "ts").withColumnRenamed(value_col, "value")
    return TimeSeriesFrame(df, series=series or [])


def read_parquet_timeseries(
    spark: SparkSession,
    path: str,
    ts_col: str = "ts",
    value_col: str = "value",
    series: list[str] | None = None,
) -> TimeSeriesFrame:
    """Parquet reader normalizing all three ts encodings the fixtures
    have shipped (nanos-as-bigint, micros-UTC, micros-NTZ) through the
    shared :mod:`tsod_spark.encodings` helper."""
    df = read_table(spark, path, ts_col=ts_col)
    if ts_col != "ts":
        df = df.withColumnRenamed(ts_col, "ts")
    if value_col != "value":
        df = df.withColumnRenamed(value_col, "value")
    return TimeSeriesFrame(df, series=series or [])


def read_netcdf_timeseries(
    spark: SparkSession, path: str, variable: str, qc_suffix: str = "_QC"
) -> DataFrame:
    """CMEMS-style NetCDF -> DataFrame(ts, value, qc) converter job.

    Decodes on the driver (NetCDF is not splittable) and parallelizes
    the rows; for fleets of files, run one decode per file inside
    ``spark.read.format("binaryFile")`` + mapInPandas instead
    (:func:`read_netcdf_fleet`).

    Classic-format files (CDF-1/CDF-2 magic) decode with the pure-stdlib
    codec in :mod:`tsod_spark.sources.netcdf3`; NetCDF-4/HDF5 files fall
    back to xarray (not installed in this container).
    """
    with open(path, "rb") as f:
        content = f.read()
    pdf = _decode_netcdf_bytes(content, variable, qc_suffix)
    return spark.createDataFrame(pdf)


def _decode_netcdf_bytes(content: bytes, variable: str, qc_suffix: str):
    """Classic files via the stdlib NetCDF-3 codec; NetCDF-4/HDF5 via
    the stdlib HDF5 subset reader (covers what netCDF-C emits for
    CMEMS station files), falling back to xarray only for HDF5
    features outside that subset."""
    if content[:3] == b"CDF":
        from .netcdf3 import decode_cmems  # noqa: PLC0415

        return decode_cmems(content, variable, qc_suffix)
    unsupported = None
    if content[:8] == b"\x89HDF\r\n\x1a\n":
        from .hdf5 import UnsupportedHDF5, decode_cmems_hdf5  # noqa: PLC0415

        try:
            return decode_cmems_hdf5(content, variable, qc_suffix)
        except (UnsupportedHDF5, struct.error, IndexError, ValueError) as e:
            # malformed/truncated files surface low-level decode errors;
            # route them to the xarray fallback (or its clear
            # NotImplementedError) instead of propagating raw
            unsupported = e
    try:
        import io  # noqa: PLC0415

        import xarray as xr  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - xarray absent here
        raise NotImplementedError(
            "this NetCDF payload needs xarray (not installed in this "
            f"environment); stdlib decode failed with: {unsupported}"
        ) from e
    ds = xr.open_dataset(io.BytesIO(content))  # pragma: no cover
    pdf = ds[[variable, variable + qc_suffix]].to_dataframe().reset_index()
    pdf.columns = ["ts", "value", "qc"]
    return pdf


NETCDF_FLEET_SCHEMA = (
    "source string, ts timestamp, value double, qc int"
)


def read_netcdf_fleet(
    spark: SparkSession,
    glob_path: str,
    variable: str = "PSAL",
    qc_suffix: str = "_QC",
    decoder=None,
) -> DataFrame:
    """Fleet-scale NetCDF ingest: one decode task per file, distributed.

    ``binaryFile`` lists the fleet and ships each file's bytes to an
    executor; ``mapInPandas`` decodes per file inside the Arrow batch
    loop — the scale shape for thousands of station files (NetCDF is
    not splittable, but a FLEET of them parallelizes perfectly; driver
    decode as in :func:`read_netcdf_timeseries` would serialize).

    Output rows are ``(source, ts, value, qc)`` — the CMEMS companion
    QC-flag layout (variable + variable_QC over the TIME dim, as in
    /root/reference/notebooks/cmems.ipynb and fixture
    tests/data/BO_TS_MO_FINO2.nc). ``decoder(content: bytes) ->
    pandas.DataFrame[ts, value, qc]`` is injectable; the default
    decodes classic files with the stdlib :mod:`.netcdf3` codec and
    needs xarray only for NetCDF-4/HDF5 payloads.
    """
    import pandas as pd

    if decoder is None:

        def decoder(content: bytes):
            return _decode_netcdf_bytes(content, variable, qc_suffix)

    def batches(it):
        for pdf in it:
            for path, content in zip(pdf["path"], pdf["content"]):
                out = decoder(bytes(content))
                out = out.assign(source=path)[["source", "ts", "value", "qc"]]
                yield pd.DataFrame(out)

    files = spark.read.format("binaryFile").load(glob_path)
    # one decode task per file: binaryFile packs small files together,
    # so spread them before the Python stage
    n = default_parallelism(spark)
    files = files.select("path", "content").repartition(n, "path")
    return files.mapInPandas(batches, NETCDF_FLEET_SCHEMA)


def read_dfs0_timeseries(spark: SparkSession, path: str, item: int = 0) -> DataFrame:
    """MIKE Dfs0 converter job (same pattern as NetCDF)."""
    try:
        import mikeio  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - mikeio absent here
        raise NotImplementedError(
            "Dfs0 ingest needs mikeio (not installed in this environment)"
        ) from e
    ds = mikeio.read(path)  # pragma: no cover
    pdf = ds[item].to_dataframe().reset_index()
    pdf.columns = ["ts", "value"]
    return spark.createDataFrame(pdf)


def qc_flag_projection(df: DataFrame, good_flags: tuple[int, ...] = (1,)) -> DataFrame:
    """CMEMS QC semantics: flag 1 = good data; everything else suspect
    (F-QCFLAGS fixture). Adds ``qc_is_good`` for validating detectors
    against independent labels."""
    return df.withColumn("qc_is_good", F.col("qc").isin(*good_flags))
