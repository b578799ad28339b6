"""Minimal pure-stdlib HDF5 reader — enough for NetCDF-4/CMEMS files.

NetCDF-4 files are HDF5 containers; the reference's committed CMEMS
fixture (tests/data/BO_TS_MO_FINO2.nc, read in notebooks/cmems.ipynb)
is one. xarray/h5py/netCDF4 are not in this container, so this module
implements the published HDF5 file format subset those files use:

- superblock v0–v3, v1 and v2 object headers (+ OCHK continuations);
- group links: inline Link messages AND dense storage (fractal heap +
  v2 b-tree type-5 records);
- attributes: compact Attribute messages AND dense storage (fractal
  heap + v2 b-tree type-8 records);
- datatypes: fixed-point, IEEE float, fixed-length strings;
- dataspace v1/v2; layout v3 contiguous and chunked (v1 b-tree chunk
  index); deflate and shuffle filters (zlib is stdlib).

Anything outside this subset raises ``UnsupportedHDF5`` with the
feature name, so callers can fall back to a full library when one is
installed. Scope note: fractal heaps are only read in their
single-direct-block form (what netCDF-C emits for the handful of
links/attributes per variable a station file has); multi-block heaps
raise.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

UNDEF = 0xFFFFFFFFFFFFFFFF


class UnsupportedHDF5(NotImplementedError):
    pass


class H5File:
    def __init__(self, content: bytes):
        self.buf = content
        if content[:8] != b"\x89HDF\r\n\x1a\n":
            raise ValueError("not an HDF5 file")
        ver = content[8]
        if ver in (0, 1):
            # v0/v1: sizes at 13/14; v1 inserts 4 extra bytes (Indexed
            # Storage Internal Node K + reserved) before the address block
            self.off_size, self.len_size = content[13], content[14]
            base = 24 if ver == 0 else 28
            end_addrs = base + 4 * self.off_size
            # root group symbol table entry: link name offset, header addr
            self.root_addr = struct.unpack_from(
                "<Q", content, end_addrs + self.off_size
            )[0]
        elif ver in (2, 3):
            self.off_size, self.len_size = content[9], content[10]
            self.root_addr = struct.unpack_from("<Q", content, 12 + 24)[0]
        else:
            raise UnsupportedHDF5(f"superblock version {ver}")
        if (self.off_size, self.len_size) != (8, 8):
            raise UnsupportedHDF5("non-8-byte offsets/lengths")

    # -- object headers ------------------------------------------------

    def messages(self, addr: int) -> list[tuple[int, bytes]]:
        """All (type, body) messages of the object header at ``addr``,
        following continuation blocks."""
        buf = self.buf
        if buf[addr : addr + 4] == b"OHDR":
            return self._messages_v2(addr)
        return self._messages_v1(addr)

    def _messages_v2(self, addr: int) -> list[tuple[int, bytes]]:
        buf = self.buf
        flags = buf[addr + 5]
        pos = addr + 6
        if flags & 0x20:
            pos += 16  # timestamps
        if flags & 0x10:
            pos += 4  # compact/dense attr phase-change values
        szb = 1 << (flags & 0x3)
        size = int.from_bytes(buf[pos : pos + szb], "little")
        pos += szb
        track = bool(flags & 0x4)
        out: list[tuple[int, bytes]] = []
        self._read_msg_block_v2(pos, pos + size, track, out)
        return out

    def _read_msg_block_v2(self, pos, end, track, out):
        buf = self.buf
        while pos + 4 <= end - 4:  # trailing 4 = gap/checksum guard
            mtype = buf[pos]
            msize = struct.unpack_from("<H", buf, pos + 1)[0]
            pos += 4
            if track:
                pos += 2
            body = buf[pos : pos + msize]
            pos += msize
            if mtype == 0x10:  # continuation: OCHK block elsewhere
                caddr, clen = struct.unpack_from("<QQ", body, 0)
                if self.buf[caddr : caddr + 4] != b"OCHK":
                    raise UnsupportedHDF5("v2 continuation without OCHK")
                self._read_msg_block_v2(caddr + 4, caddr + clen - 4, track, out)
            else:
                out.append((mtype, body))

    def _messages_v1(self, addr: int) -> list[tuple[int, bytes]]:
        buf = self.buf
        ver, _, nmsgs, _refs, hsize = struct.unpack_from("<BBHII", buf, addr)
        if ver != 1:
            raise UnsupportedHDF5(f"object header version {ver}")
        out: list[tuple[int, bytes]] = []
        blocks = [(addr + 16, hsize)]  # v1 header body is 8-byte aligned
        while blocks and len(out) < nmsgs + 64:
            pos, remaining = blocks.pop(0)
            end = pos + remaining
            while pos + 8 <= end:
                mtype, msize, _mflags = struct.unpack_from("<HHB", buf, pos)
                pos += 8
                body = buf[pos : pos + msize]
                pos += msize
                if mtype == 0x10:
                    caddr, clen = struct.unpack_from("<QQ", body, 0)
                    blocks.append((caddr, clen))
                elif mtype != 0:
                    out.append((mtype, body))
        return out

    # -- fractal heap / v2 b-tree (dense links & attributes) -----------

    def _frhp(self, addr: int) -> dict:
        buf = self.buf
        if buf[addr : addr + 4] != b"FRHP":
            raise UnsupportedHDF5("missing FRHP signature")
        p = addr + 22 + 24 + 32 + 32
        p += 2  # table width
        _start_sz, max_direct = struct.unpack_from("<QQ", buf, p)
        p += 16
        max_heap_bits = struct.unpack_from("<H", buf, p)[0]
        p += 4  # + starting # rows (2)
        root_addr = struct.unpack_from("<Q", buf, p)[0]
        p += 8
        cur_rows = struct.unpack_from("<H", buf, p)[0]
        if cur_rows != 0:
            raise UnsupportedHDF5("multi-block fractal heap")
        if buf[root_addr : root_addr + 4] != b"FHDB":
            raise UnsupportedHDF5("fractal heap root is not a direct block")
        return {
            "root": root_addr,
            "off_bytes": (max_heap_bits + 7) // 8,
            "len_bytes": (max(max_direct - 1, 1).bit_length() + 7) // 8,
        }

    def _heap_object(self, heap: dict, heap_id: bytes) -> bytes:
        idtype = (heap_id[0] >> 4) & 0x3
        if idtype != 0:
            raise UnsupportedHDF5("non-managed fractal heap object")
        ob, lb = heap["off_bytes"], heap["len_bytes"]
        off = int.from_bytes(heap_id[1 : 1 + ob], "little")
        ln = int.from_bytes(heap_id[1 + ob : 1 + ob + lb], "little")
        start = heap["root"] + off  # single direct block: offset 0 at block start
        return self.buf[start : start + ln]

    def _btree_v2_records(self, addr: int) -> list[bytes]:
        buf = self.buf
        if buf[addr : addr + 4] != b"BTHD":
            raise UnsupportedHDF5("missing BTHD signature")
        _node_size, rec_size = struct.unpack_from("<IH", buf, addr + 6)
        depth = struct.unpack_from("<H", buf, addr + 12)[0]
        if depth != 0:
            raise UnsupportedHDF5("multi-level v2 b-tree")
        root_addr, root_nrec = struct.unpack_from("<QH", buf, addr + 16)
        if buf[root_addr : root_addr + 4] != b"BTLF":
            raise UnsupportedHDF5("v2 b-tree root is not a leaf")
        p = root_addr + 6
        return [buf[p + i * rec_size : p + (i + 1) * rec_size] for i in range(root_nrec)]

    # -- groups --------------------------------------------------------

    def links(self, addr: int) -> dict[str, int]:
        """name -> object header address for every hard link of the
        group at ``addr`` (inline Link messages or dense storage)."""
        out: dict[str, int] = {}
        link_info = None
        for mtype, body in self.messages(addr):
            if mtype == 0x6:
                name, tgt = self._parse_link(body)
                if tgt is not None:
                    out[name] = tgt
            elif mtype == 0x2:
                link_info = body
        if link_info is not None and not out:
            flags = link_info[1]
            p = 2 + (8 if flags & 0x1 else 0)
            heap_addr, name_bt = struct.unpack_from("<QQ", link_info, p)
            if heap_addr != UNDEF:
                heap = self._frhp(heap_addr)
                for rec in self._btree_v2_records(name_bt):
                    # type-5 record: hash(4) + heap id(7)
                    name, tgt = self._parse_link(self._heap_object(heap, rec[4:]))
                    if tgt is not None:
                        out[name] = tgt
        return out

    def _parse_link(self, body: bytes):
        flags = body[1]
        p = 2
        ltype = 0
        if flags & 0x8:
            ltype = body[p]
            p += 1
        if flags & 0x4:
            p += 8  # creation order
        if flags & 0x10:
            p += 1  # charset
        nsz = 1 << (flags & 0x3)
        nl = int.from_bytes(body[p : p + nsz], "little")
        p += nsz
        name = body[p : p + nl].decode("utf-8")
        p += nl
        if ltype != 0:
            return name, None  # soft/external links: not needed
        return name, struct.unpack_from("<Q", body, p)[0]

    # -- datatypes / dataspace -----------------------------------------

    @staticmethod
    def _dtype(body: bytes) -> np.dtype:
        cls = body[0] & 0xF
        bits0 = body[1]
        size = struct.unpack_from("<I", body, 4)[0]
        endian = ">" if (bits0 & 0x1) else "<"
        if cls == 0:  # fixed-point
            signed = "i" if (bits0 & 0x8) else "u"
            return np.dtype(f"{endian}{signed}{size}")
        if cls == 1:  # float
            return np.dtype(f"{endian}f{size}")
        if cls == 3:  # fixed string
            return np.dtype(f"S{size}")
        raise UnsupportedHDF5(f"datatype class {cls}")

    @staticmethod
    def _dataspace(body: bytes) -> list[int]:
        ver = body[0]
        if ver == 1:
            rank, flags = body[1], body[2]
            p = 8
        elif ver == 2:
            rank, flags = body[1], body[2]
            p = 4
        else:
            raise UnsupportedHDF5(f"dataspace version {ver}")
        return [struct.unpack_from("<Q", body, p + 8 * i)[0] for i in range(rank)]

    # -- attributes ----------------------------------------------------

    def attrs(self, addr: int) -> dict:
        out: dict = {}
        attr_info = None
        for mtype, body in self.messages(addr):
            if mtype == 0xC:
                kv = self._parse_attr(body)
                if kv is not None:
                    out[kv[0]] = kv[1]
            elif mtype == 0x15:
                attr_info = body
        if attr_info is not None:
            flags = attr_info[1]
            p = 2 + (2 if flags & 0x1 else 0)
            heap_addr, name_bt = struct.unpack_from("<QQ", attr_info, p)
            if heap_addr != UNDEF:
                heap = self._frhp(heap_addr)
                for rec in self._btree_v2_records(name_bt):
                    # type-8 record: heap id(8) + flags(1) + corder(4) + hash(4)
                    kv = self._parse_attr(self._heap_object(heap, rec[:8]))
                    if kv is not None:
                        out[kv[0]] = kv[1]
        return out

    def _parse_attr(self, body: bytes):
        ver = body[0]
        if ver == 1:
            nsz, dtsz, dssz = struct.unpack_from("<HHH", body, 2)
            p = 8
            pad = lambda n: (n + 7) // 8 * 8  # noqa: E731
        elif ver == 3:
            # flags bits 0/1 mark shared datatype/dataspace: the message
            # body then holds a shared-message reference, not an inline
            # definition — fall back rather than misparse it.
            if body[1] & 0x3:
                raise UnsupportedHDF5("shared datatype/dataspace attribute")
            nsz, dtsz, dssz = struct.unpack_from("<HHH", body, 2)
            p = 9  # + charset byte
            pad = lambda n: n  # noqa: E731
        else:
            raise UnsupportedHDF5(f"attribute version {ver}")
        name = body[p : p + nsz].split(b"\x00")[0].decode("utf-8")
        p += pad(nsz)
        dt_body = body[p : p + dtsz]
        p += pad(dtsz)
        ds_body = body[p : p + dssz]
        p += pad(dssz)
        try:
            dt = self._dtype(dt_body)
            shape = self._dataspace(ds_body)
        except UnsupportedHDF5:
            return None  # e.g. DIMENSION_LIST vlen references — skip
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        raw = body[p : p + n * dt.itemsize]
        if dt.kind == "S":
            return name, raw.split(b"\x00")[0].decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dt, n)
        return name, arr[0].item() if n == 1 else arr

    # -- dataset data --------------------------------------------------

    def dataset(self, addr: int) -> dict:
        dt = shape = layout = None
        filters: list[int] = []
        for mtype, body in self.messages(addr):
            if mtype == 0x1:
                shape = self._dataspace(body)
            elif mtype == 0x3:
                dt = self._dtype(body)
            elif mtype == 0x8:
                layout = body
            elif mtype == 0xB:
                filters = self._parse_filters(body)
        if dt is None or shape is None or layout is None:
            raise UnsupportedHDF5("dataset missing datatype/dataspace/layout")
        data = self._read_data(layout, filters, dt, shape)
        return {"shape": shape, "dtype": dt, "data": data, "attrs": self.attrs(addr)}

    @staticmethod
    def _parse_filters(body: bytes) -> list[int]:
        ver, nf = body[0], body[1]
        ids = []
        p = 8 if ver == 1 else 2
        for _ in range(nf):
            fid, = struct.unpack_from("<H", body, p)
            p += 2
            if ver == 1 or fid >= 256:
                namelen = struct.unpack_from("<H", body, p)[0]
                p += 2
            else:
                namelen = 0
            _flags, ncv = struct.unpack_from("<HH", body, p)
            p += 4 + namelen + 4 * ncv
            if ver == 1 and ncv % 2:
                p += 4
            ids.append(fid)
        return ids

    def _apply_filters(self, raw: bytes, filters: list[int], dt: np.dtype) -> bytes:
        for fid in reversed(filters):
            if fid == 1:
                raw = zlib.decompress(raw)
            elif fid == 2:  # shuffle: de-interleave bytes per element
                n = len(raw) // dt.itemsize
                raw = (
                    np.frombuffer(raw, "u1")
                    .reshape(dt.itemsize, n)
                    .T.tobytes()
                )
            else:
                raise UnsupportedHDF5(f"filter id {fid}")
        return raw

    def _read_data(self, layout: bytes, filters, dt: np.dtype, shape) -> np.ndarray:
        ver, cls = layout[0], layout[1]
        if ver != 3:
            raise UnsupportedHDF5(f"layout version {ver}")
        n = int(np.prod(shape, dtype=np.int64)) if shape else 1
        if cls == 1:  # contiguous
            addr, size = struct.unpack_from("<QQ", layout, 2)
            raw = self.buf[addr : addr + size]
            return np.frombuffer(raw, dt, n).reshape(shape)
        if cls == 0:  # compact
            size = struct.unpack_from("<H", layout, 2)[0]
            return np.frombuffer(layout[4 : 4 + size], dt, n).reshape(shape)
        if cls != 2:
            raise UnsupportedHDF5(f"layout class {cls}")
        ndims = layout[2]  # rank + 1
        bt_addr = struct.unpack_from("<Q", layout, 3)[0]
        chunk_dims = [
            struct.unpack_from("<I", layout, 11 + 4 * i)[0] for i in range(ndims - 1)
        ]
        out = np.zeros(shape, dt)
        for off, size, caddr in self._chunks(bt_addr, ndims):
            raw = self._apply_filters(self.buf[caddr : caddr + size], filters, dt)
            arr = np.frombuffer(raw, dt)[: int(np.prod(chunk_dims, dtype=np.int64))]
            arr = arr.reshape(chunk_dims)
            sel = tuple(
                slice(o, min(o + c, s)) for o, c, s in zip(off, chunk_dims, shape)
            )
            out[sel] = arr[tuple(slice(0, s.stop - s.start) for s in sel)]
        return out

    def _chunks(self, addr: int, ndims: int):
        """Yield (offsets, stored_size, file_addr) from a v1 chunk b-tree."""
        buf = self.buf
        if buf[addr : addr + 4] != b"TREE":
            raise UnsupportedHDF5("missing TREE signature")
        _nt, level, n = struct.unpack_from("<BBH", buf, addr + 4)
        p = addr + 8 + 16  # skip left/right sibling addrs
        for _ in range(n):
            size, _mask = struct.unpack_from("<II", buf, p)
            p += 8
            offs = struct.unpack_from("<" + "Q" * ndims, buf, p)
            p += 8 * ndims
            child = struct.unpack_from("<Q", buf, p)[0]
            p += 8
            if level == 0:
                yield offs[:-1], size, child
            else:
                yield from self._chunks(child, ndims)


def decode_cmems_hdf5(
    content: bytes,
    variable: str = "PSAL",
    qc_suffix: str = "_QC",
    time_var: str = "TIME",
):
    """CMEMS companion-QC decode of a NetCDF-4/HDF5 station file →
    ``DataFrame(ts, value, qc)`` — the same contract as
    :func:`tsod_spark.sources.netcdf3.decode_cmems`, including CF
    packing (scale_factor/add_offset/_FillValue) and units-since time
    decode. Multi-depth variables take depth level 0 (the reference
    notebook's ``.isel(DEPTH=0)`` convention)."""
    import pandas as pd

    from .netcdf3 import time_axis_to_timestamps

    f = H5File(content)
    links = f.links(f.root_addr)
    t = f.dataset(links[time_var])
    ts = time_axis_to_timestamps(
        np.asarray(t["data"]).reshape(-1), t["attrs"].get("units", "")
    )
    v = f.dataset(links[variable])
    raw = np.asarray(v["data"])
    if raw.ndim > 1:
        raw = raw[(slice(None),) + (0,) * (raw.ndim - 1)]
    vals = raw.astype("f8")
    fill = v["attrs"].get("_FillValue")
    if fill is not None:
        vals = np.where(raw == fill, np.nan, vals)
    vals = vals * float(v["attrs"].get("scale_factor", 1.0)) + float(
        v["attrs"].get("add_offset", 0.0)
    )
    qc_name = variable + qc_suffix
    if qc_name in links:
        q = np.asarray(f.dataset(links[qc_name])["data"])
        if q.ndim > 1:
            q = q[(slice(None),) + (0,) * (q.ndim - 1)]
        qcv = q.astype("i4")
    else:
        qcv = np.full(len(vals), -1, "i4")
    return pd.DataFrame({"ts": ts, "value": vals, "qc": qcv})
