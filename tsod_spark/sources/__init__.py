from .readers import (  # noqa: F401
    read_csv_timeseries,
    read_netcdf_fleet,
    read_netcdf_timeseries,
    read_dfs0_timeseries,
    read_parquet_timeseries,
    qc_flag_projection,
)
from .datasource import NetCDFTimeseriesDataSource  # noqa: F401
from .writers import write_partitioned  # noqa: F401
