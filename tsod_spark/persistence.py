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
    SeasonalResidualDetector,
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
        SeasonalResidualDetector,
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
    "SeasonalResidualDetector": {
        "_trend_window": "trend_window",
        "_quantile": "quantile",
        "_phase_unit": "phase_unit",
    },
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
    out = {"type": name, "params": params}
    if detector._params is not None:
        # globally-fitted state that does NOT mirror a constructor
        # kwarg (e.g. the seasonal profile + threshold) — JSON-safe
        # scalars and lists by construction
        out["fitted"] = detector._params
    return out


def from_dict(d: dict) -> SparkDetector:
    cls = _REGISTRY[d["type"]]
    if d["type"] == "CombinedDetector":
        return CombinedDetector([from_dict(c) for c in d["detectors"]])
    det = cls(**{k: _decode(v) for k, v in d["params"].items()})
    if d.get("fitted") is not None:
        det._params = d["fitted"]
    return det


def _walk(detector: SparkDetector):
    """Yield leaf detectors in deterministic (depth-first) order."""
    if type(detector).__name__ == "CombinedDetector":
        for child in detector:
            yield from _walk(child)
    else:
        yield detector


def save(detector: SparkDetector, path) -> None:
    """Save a detector for later use (cf. base.py:95-104).

    Per-series fitted state (``_params_df``) is written as a parquet
    sidecar per leaf detector at ``{path}.params/{i}``, with the
    session-scoped ``__{uid}_`` column prefixes stripped so a reload
    in a fresh session can re-prefix for its own uids. Scalar fitted
    state rides in the JSON (fit copies it into the constructor
    attrs).
    """
    doc = {"spec": to_dict(detector), "sidecars": []}
    for i, leaf in enumerate(_walk(detector)):
        if leaf._params_df is None:
            continue
        prefix = f"__{leaf._uid}_"
        pdf = leaf._params_df
        renames = {
            c: c[len(prefix):] for c in pdf.columns if c.startswith(prefix)
        }
        for old, new in renames.items():
            pdf = pdf.withColumnRenamed(old, new)
        sidecar = f"{path}.params/{i}"
        pdf.coalesce(1).write.mode("overwrite").parquet(sidecar)
        doc["sidecars"].append(
            {"leaf": i, "path": sidecar, "param_cols": sorted(renames.values())}
        )
    Path(path).write_text(json.dumps(doc, indent=2))


def load(path, spark=None) -> SparkDetector:
    """Load a saved detector (cf. base.py:13-22).

    Sidecar parquet params are re-read lazily and re-prefixed for the
    fresh instance's uids; pass ``spark`` explicitly when no session
    is active.
    """
    doc = json.loads(Path(path).read_text())
    if "spec" not in doc:  # pre-sidecar format
        return from_dict(doc)
    detector = from_dict(doc["spec"])
    if doc["sidecars"]:
        if spark is None:
            from pyspark.sql import SparkSession

            spark = SparkSession.getActiveSession()
            if spark is None:
                raise RuntimeError(
                    "loading per-series fitted params needs a SparkSession"
                )
        leaves = list(_walk(detector))
        for sc in doc["sidecars"]:
            leaf = leaves[sc["leaf"]]
            pdf = spark.read.parquet(sc["path"])
            for name in sc["param_cols"]:
                pdf = pdf.withColumnRenamed(name, leaf.tmp(name))
            leaf._params_df = pdf
    return detector


# ---------------------------------------------------------------------------
# one-way joblib import (migration from reference-era saved detectors)

# reference pickle attribute -> our constructor kwarg; includes attrs
# the JSON path never writes because the reference always pickles them
_JOBLIB_ATTRS = {
    name: dict(attrs)
    for name, attrs in _PARAM_ATTRS.items()
}
_JOBLIB_ATTRS["ConstantGradientDetector"]["_window_size"] = "window_size"


def _restricted_joblib_load(content: bytes):
    """Unpickle a reference ``Detector.save`` artifact WITHOUT importing
    or executing reference code: every ``tsod.*`` class resolves to an
    inert attribute-bag stub, numpy scalar reconstruction is allowed
    (fitted thresholds pickle as numpy float64), everything else is
    rejected. joblib's default (uncompressed) dump is a plain pickle
    stream (reference base.py:104 ``joblib.dump(self, path)``);
    zlib/gzip-compressed variants are unwrapped first."""
    import io
    import pickle

    if content[:2] == b"\x1f\x8b":  # joblib compress= writes gzip frames
        import gzip

        content = gzip.decompress(content)
    elif content[:1] == b"x":  # bare zlib stream
        import zlib

        content = zlib.decompress(content)

    class _Stub:
        def __init__(self, *a, **k):
            pass

    stubs: dict[str, type] = {}

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if module.split(".")[0] == "tsod":
                if name not in stubs:
                    stubs[name] = type(name, (_Stub,), {})
                return stubs[name]
            if (module, name) in {
                ("numpy.core.multiarray", "scalar"),
                ("numpy._core.multiarray", "scalar"),
                ("numpy", "dtype"),
                ("numpy", "float64"),
                ("numpy", "int64"),
                ("numpy", "bool_"),
            }:
                import importlib

                return getattr(importlib.import_module(module), name)
            raise pickle.UnpicklingError(
                f"joblib import only accepts tsod detector classes and numpy "
                f"scalars; refusing {module}.{name}"
            )

    return _Unpickler(io.BytesIO(content)).load()


def _plain(x):
    """numpy scalar -> python scalar, recursively through lists."""
    if isinstance(x, list):
        return [_plain(v) for v in x]
    if hasattr(x, "item"):
        return x.item()
    return x


def _stub_to_detector(stub) -> SparkDetector:
    name = type(stub).__name__
    if name == "CombinedDetector":
        return CombinedDetector([_stub_to_detector(c) for c in stub._detectors])
    if name not in _JOBLIB_ATTRS:
        raise ValueError(f"unsupported reference detector in joblib: {name}")
    kwargs = {
        kwarg: _plain(getattr(stub, attr))
        for attr, kwarg in _JOBLIB_ATTRS[name].items()
        if hasattr(stub, attr)
    }
    return _REGISTRY[name](**kwargs)


def import_joblib(path) -> SparkDetector:
    """One-way importer for reference ``.joblib`` saves (base.py:95-104):
    users migrating keep their fitted thresholds without ever executing
    the pickled code. Re-save with :func:`save` for the JSON format."""
    return _stub_to_detector(_restricted_joblib_load(Path(path).read_bytes()))
