"""Driver entry points.

Part of the driver-facing query registry (see ``tsod_spark.registry``,
the facade that imports every family module in registration order and
owns the verification rotation). Registration side-effects populate
``tsod_spark.queries._base.QUERIES`` / ``ORACLE``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ..analytics import temporal, tpch  # noqa: F401
from ..detectors import (  # noqa: F401
    CombinedDetector,
    ConstantGradientDetector,
    ConstantValueDetector,
    DiffDetector,
    GradientDetector,
    HampelDetector,
    RangeDetector,
    RollingStandardDeviationDetector,
)
from ..detectors.gradient import gradient_col  # noqa: F401
from ..expressions import as_pred  # noqa: F401
from ..features import create_dataset, lag_time_series  # noqa: F401
from ..frame import TimeSeriesFrame  # noqa: F401
from ..pipeline import dedup, multimodal, similarity, text  # noqa: F401
from ._base import (  # noqa: F401
    DTOKS,
    E_CTE,
    HIGH_HEX,
    P,
    TOKS,
    W,
    _shingle_sql,
    duck_round6,
    events_tsf,
    register,
    table,
)


# driver entry points


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combined anomaly sweep over the events stream — the engine's
    flagship: one fused plan, five detectors, one shuffle."""
    det = CombinedDetector(
        [
            RangeDetector(1.0, 300.0),
            DiffDetector(80.0),
            GradientDetector(0.005),
            ConstantValueDetector(3, 5.0),
            HampelDetector(5, 3),
        ]
    )
    return det.detect(events_tsf(spark, sf_dir))


