"""Pure-stdlib NetCDF classic (CDF-1/CDF-2) codec for CMEMS-style files.

The reference ingests CMEMS in-situ NetCDF with QC-flag companion
variables (/root/reference/notebooks/cmems.ipynb: ``ds['PSAL']`` +
``ds['PSAL_QC']`` over the TIME dimension). xarray/netCDF4 are not in
this container, so this module implements the public NetCDF *classic*
on-disk format (the CDF magic, as published in the NetCDF
specification) with nothing but ``struct``/``numpy``:

- :func:`parse_netcdf3` — full header + data decode of a classic file
  (dims, attributes, fixed and record variables, CDF-2 64-bit offsets);
- :func:`decode_cmems` — the CMEMS pattern on top: pick ``variable`` +
  ``variable_QC``, squeeze singleton dims, apply ``scale_factor`` /
  ``add_offset`` / ``_FillValue``, convert the ``units``-annotated TIME
  axis ("days|hours|seconds since <epoch>") to timestamps → a pandas
  frame ``(ts, value, qc)``;
- :func:`build_netcdf3` — the matching writer (used by tests to
  synthesize CMEMS-shaped fixtures, and usable as a classic-format
  sink for interop with reference-era tooling).

NetCDF-4 files are HDF5 containers (magic ``\\x89HDF``) — a different
format; the readers fall back to xarray for those.
"""

from __future__ import annotations

import datetime
import re
import struct

import numpy as np
import pandas as pd

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_DTYPES = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.u32()
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += (n + 3) // 4 * 4  # names pad to 4-byte boundary
        return s

    def values(self, nc_type: int, nelems: int):
        dt = _DTYPES[nc_type]
        nbytes = dt.itemsize * nelems
        arr = np.frombuffer(self.buf, dt, nelems, self.pos)
        self.pos += (nbytes + 3) // 4 * 4
        if nc_type == NC_CHAR:
            return arr.tobytes().decode("utf-8", errors="replace")
        return arr

    def att_list(self) -> dict:
        tag, count = self.u32(), self.u32()
        if tag == 0:  # ABSENT
            return {}
        assert tag == _NC_ATTRIBUTE, f"bad attribute tag {tag:#x}"
        out = {}
        for _ in range(count):
            nm = self.name()
            t, n = self.u32(), self.u32()
            v = self.values(t, n)
            out[nm] = v if isinstance(v, str) else (v[0] if len(v) == 1 else v)
        return out


def parse_netcdf3(content: bytes) -> dict:
    """Decode a classic NetCDF file into
    ``{dims, attrs, vars: {name: {data, attrs, dims}}}``."""
    if content[:3] != b"CDF" or content[3] not in (1, 2):
        raise ValueError(
            "not a NetCDF classic file (CDF-1/CDF-2 magic); NetCDF-4/HDF5 "
            "needs the xarray path"
        )
    wide = content[3] == 2  # CDF-2: 64-bit begin offsets
    r = _Reader(content)
    r.pos = 4
    numrecs = r.u32()  # 0xFFFFFFFF = STREAMING (records counted below)

    dims: list[tuple[str, int]] = []
    tag, count = r.u32(), r.u32()
    if tag == _NC_DIMENSION:
        for _ in range(count):
            dims.append((r.name(), r.u32()))
    else:
        assert tag == 0
    attrs = r.att_list()

    variables: dict[str, dict] = {}
    rec_vars: list[dict] = []
    tag, count = r.u32(), r.u32()
    if tag != 0:
        assert tag == _NC_VARIABLE, f"bad variable tag {tag:#x}"
        for _ in range(count):
            nm = r.name()
            ndims = r.u32()
            dimids = [r.u32() for _ in range(ndims)]
            vattrs = r.att_list()
            nc_type = r.u32()
            vsize = r.u32()
            begin = r.i64() if wide else r.u32()
            v = {
                "name": nm,
                "dims": [dims[i][0] for i in dimids],
                "shape": [dims[i][1] for i in dimids],
                "attrs": vattrs,
                "nc_type": nc_type,
                "vsize": vsize,
                "begin": begin,
            }
            variables[nm] = v
            if v["shape"] and v["shape"][0] == 0:  # record dim has size 0
                rec_vars.append(v)

    if numrecs == 0xFFFFFFFF and rec_vars:  # STREAMING: infer record count
        stride = sum(v["vsize"] for v in rec_vars)
        first = min(v["begin"] for v in rec_vars)
        numrecs = (len(content) - first) // stride

    out_vars = {}
    for v in variables.values():
        dt = _DTYPES[v["nc_type"]]
        if v in rec_vars:
            shape = [numrecs] + v["shape"][1:]
            per_rec = int(np.prod(v["shape"][1:], dtype=np.int64))
            if len(rec_vars) == 1:
                # sole record variable: records are contiguous, unpadded
                data = np.frombuffer(
                    content, dt, numrecs * per_rec, v["begin"]
                ).reshape(shape)
            else:
                stride = sum(rv["vsize"] for rv in rec_vars)
                data = np.empty(shape, dt.newbyteorder("="))
                for rec in range(numrecs):
                    data[rec] = np.frombuffer(
                        content, dt, per_rec, v["begin"] + rec * stride
                    ).reshape(shape[1:])
        else:
            n = int(np.prod(v["shape"], dtype=np.int64)) if v["shape"] else 1
            data = np.frombuffer(content, dt, n, v["begin"]).reshape(v["shape"])
        out_vars[v["name"]] = {"data": data, "attrs": v["attrs"], "dims": v["dims"]}
    return {"dims": dims, "attrs": attrs, "vars": out_vars}


_EPOCH_RE = re.compile(
    r"(?P<unit>second|minute|hour|day)s?\s+since\s+"
    r"(?P<date>\d{4}-\d{1,2}-\d{1,2})(?:[T ](?P<time>\d{1,2}:\d{2}(?::\d{2})?))?"
)
_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def time_axis_to_timestamps(values: np.ndarray, units: str) -> pd.Series:
    """CF-style ``"<unit>s since <epoch>"`` axis → naive-UTC timestamps."""
    m = _EPOCH_RE.search(units)
    if not m:
        raise ValueError(f"unsupported time units: {units!r}")
    epoch = datetime.datetime.fromisoformat(
        m.group("date") + ("T" + m.group("time") if m.group("time") else "T00:00:00")
    )
    secs = np.asarray(values, dtype="f8") * _UNIT_SECONDS[m.group("unit")]
    return pd.Series(
        pd.Timestamp(epoch).to_datetime64() + (secs * 1e6).round().astype("timedelta64[us]")
    )


def _squeeze(a: np.ndarray) -> np.ndarray:
    a = np.squeeze(a)
    if a.ndim != 1:
        raise ValueError(f"variable not 1-D after squeezing singletons: shape {a.shape}")
    return a


def decode_cmems(
    content: bytes,
    variable: str = "PSAL",
    qc_suffix: str = "_QC",
    time_var: str = "TIME",
) -> pd.DataFrame:
    """CMEMS companion-QC decode → ``DataFrame(ts, value, qc)``.

    Applies ``scale_factor``/``add_offset``/``_FillValue`` (CF packing)
    to the data variable; QC flags pass through as small ints (flag 1 =
    good data, per the CMEMS convention the reference notebook uses).
    """
    ds = parse_netcdf3(content)
    t = ds["vars"][time_var]
    ts = time_axis_to_timestamps(_squeeze(t["data"]), t["attrs"].get("units", ""))
    v = ds["vars"][variable]
    vals = _squeeze(v["data"]).astype("f8")
    fill = v["attrs"].get("_FillValue")
    if fill is not None:
        vals = np.where(_squeeze(v["data"]) == fill, np.nan, vals)
    vals = vals * float(v["attrs"].get("scale_factor", 1.0)) + float(
        v["attrs"].get("add_offset", 0.0)
    )
    qc = ds["vars"].get(variable + qc_suffix)
    qcv = (
        _squeeze(qc["data"]).astype("i4")
        if qc is not None
        else np.full(len(vals), -1, "i4")
    )
    return pd.DataFrame({"ts": ts, "value": vals, "qc": qcv})


# ---------------------------------------------------------------------------
# writer (classic CDF-1) — test-fixture synthesis + interop sink


def _pad(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">I", len(b)) + _pad(b)


def _att_value(nc_type: int, v) -> tuple[int, bytes]:
    if nc_type == NC_CHAR:
        b = v.encode("utf-8")
        return len(b), _pad(b)
    arr = np.atleast_1d(np.asarray(v)).astype(_DTYPES[nc_type])
    return len(arr), _pad(arr.tobytes())


def _att_list(attrs: dict[str, tuple[int, object]]) -> bytes:
    if not attrs:
        return struct.pack(">II", 0, 0)
    out = [struct.pack(">II", _NC_ATTRIBUTE, len(attrs))]
    for nm, (t, v) in attrs.items():
        n, payload = _att_value(t, v)
        out.append(_name(nm) + struct.pack(">II", t, n) + payload)
    return b"".join(out)


def build_netcdf3(
    variables: dict[str, dict],
    dims: list[tuple[str, int]],
    global_attrs: dict[str, tuple[int, object]] | None = None,
) -> bytes:
    """Serialize fixed-size variables into a classic CDF-1 file.

    ``variables[name] = {data: np.ndarray, dims: [dim names],
    nc_type: NC_*, attrs: {name: (NC_*, value)}}``. Dims are all fixed
    (no record dim) — sufficient for CMEMS-shaped station files.
    """
    header = [b"CDF\x01", struct.pack(">I", 0)]  # numrecs=0, no record dim
    header.append(struct.pack(">II", _NC_DIMENSION, len(dims)))
    for nm, size in dims:
        header.append(_name(nm) + struct.pack(">I", size))
    header.append(_att_list(global_attrs or {}))

    dim_index = {nm: i for i, (nm, _) in enumerate(dims)}
    var_entries = []
    for nm, v in variables.items():
        dt = _DTYPES[v["nc_type"]]
        data = np.ascontiguousarray(np.asarray(v["data"]).astype(dt))
        payload = _pad(data.tobytes())
        body = (
            _name(nm)
            + struct.pack(">I", len(v["dims"]))
            + b"".join(struct.pack(">I", dim_index[d]) for d in v["dims"])
            + _att_list(v.get("attrs", {}))
            + struct.pack(">II", v["nc_type"], len(payload))
        )
        var_entries.append((body, payload))

    header.append(struct.pack(">II", _NC_VARIABLE, len(var_entries)))
    fixed = b"".join(header) + b"".join(
        body + struct.pack(">I", 0) for body, _ in var_entries
    )
    # second pass with real begin offsets (header size now known)
    offset, begins = len(fixed), []
    for _, payload in var_entries:
        begins.append(offset)
        offset += len(payload)
    out = b"".join(header) + b"".join(
        body + struct.pack(">I", begin) for (body, _), begin in zip(var_entries, begins)
    )
    return out + b"".join(payload for _, payload in var_entries)
