"""FlatGeobuf container codec — hand-rolled flatbuffers read/write.

FlatGeobuf is a public spec (flatgeobuf.org; BSD): ``fgb\\x03fgb\\x00``
magic, a size-prefixed flatbuffer Header (name, geometry type, column
schema, feature count, index node size), an optional packed Hilbert R-tree
(40-byte nodes: 4×f64 bbox + u64 byte offset), then size-prefixed
flatbuffer Feature records (Geometry: ends/xy vectors; properties: packed
(u16 column-index, value) bytes).

No flatbuffers library is available in this container, so this module
implements the minimal generic flatbuffers table walk (vtable → field
offsets) and a deterministic single-layout builder for the writer. Field
ids follow the published .fbs schema; the reference reads the format via
GDAL (st_read.cpp driver list).
"""

from __future__ import annotations

import math
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from .core import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)

MAGIC = b"fgb\x03fgb\x00"

# ColumnType enum (schema order)
CT_BYTE, CT_UBYTE, CT_BOOL, CT_SHORT, CT_USHORT, CT_INT, CT_UINT, \
    CT_LONG, CT_ULONG, CT_FLOAT, CT_DOUBLE, CT_STRING, CT_JSON, \
    CT_DATETIME, CT_BINARY = range(15)

_CT_FMT = {
    CT_BYTE: ("<b", 1), CT_UBYTE: ("<B", 1), CT_BOOL: ("<B", 1),
    CT_SHORT: ("<h", 2), CT_USHORT: ("<H", 2), CT_INT: ("<i", 4),
    CT_UINT: ("<I", 4), CT_LONG: ("<q", 8), CT_ULONG: ("<Q", 8),
    CT_FLOAT: ("<f", 4), CT_DOUBLE: ("<d", 8),
}

# GeometryType enum
GT_UNKNOWN, GT_POINT, GT_LINESTRING, GT_POLYGON, GT_MULTIPOINT, \
    GT_MULTILINESTRING, GT_MULTIPOLYGON, GT_GEOMETRYCOLLECTION = range(8)


def _u16(b, o):
    return struct.unpack_from("<H", b, o)[0]


def _u32(b, o):
    return struct.unpack_from("<I", b, o)[0]


def _i32(b, o):
    return struct.unpack_from("<i", b, o)[0]


class _Table:
    """Generic flatbuffers table accessor (vtable walk)."""

    __slots__ = ("buf", "pos", "vt", "vtsize")

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.vt = pos - _i32(buf, pos)
        self.vtsize = _u16(buf, self.vt)

    def _field(self, fid: int) -> int:
        slot = 4 + fid * 2
        if slot + 2 > self.vtsize:
            return 0
        off = _u16(self.buf, self.vt + slot)
        return self.pos + off if off else 0

    def scalar(self, fid: int, fmt: str, default):
        at = self._field(fid)
        if not at:
            return default
        return struct.unpack_from(fmt, self.buf, at)[0]

    def indirect(self, fid: int) -> Optional[int]:
        at = self._field(fid)
        if not at:
            return None
        return at + _u32(self.buf, at)

    def string(self, fid: int) -> Optional[str]:
        o = self.indirect(fid)
        if o is None:
            return None
        n = _u32(self.buf, o)
        return self.buf[o + 4:o + 4 + n].decode("utf-8")

    def vector(self, fid: int) -> Optional[Tuple[int, int]]:
        """(element_start, length) of a vector field."""
        o = self.indirect(fid)
        if o is None:
            return None
        return o + 4, _u32(self.buf, o)

    def vector_f64(self, fid: int) -> Optional[np.ndarray]:
        v = self.vector(fid)
        if v is None:
            return None
        start, n = v
        return np.frombuffer(self.buf, dtype="<f8", count=n, offset=start)

    def vector_u32(self, fid: int) -> Optional[np.ndarray]:
        v = self.vector(fid)
        if v is None:
            return None
        start, n = v
        return np.frombuffer(self.buf, dtype="<u4", count=n, offset=start)

    def table_vector(self, fid: int) -> List["_Table"]:
        v = self.vector(fid)
        if v is None:
            return []
        start, n = v
        out = []
        for i in range(n):
            at = start + 4 * i
            out.append(_Table(self.buf, at + _u32(self.buf, at)))
        return out


def _root(buf: bytes) -> _Table:
    return _Table(buf, _u32(buf, 0))


# --------------------------------------------------------------- header

def parse_header(buf: bytes) -> Dict:
    """Header flatbuffer → dict(name, geometry_type, columns, features_count,
    index_node_size, envelope)."""
    t = _root(buf)
    cols = []
    for c in t.table_vector(7):
        cols.append({"name": c.string(0), "type": c.scalar(1, "<B", 0)})
    env = t.vector_f64(1)
    return {
        "name": t.string(0),
        "envelope": None if env is None else tuple(env.tolist()),
        "geometry_type": t.scalar(2, "<B", 0),
        "has_z": bool(t.scalar(3, "<B", 0)),
        "columns": cols,
        "features_count": t.scalar(8, "<Q", 0),
        "index_node_size": t.scalar(9, "<H", 16),
    }


def index_size(num_items: int, node_size: int) -> int:
    """Byte size of the packed R-tree (40-byte nodes, all levels)."""
    if num_items == 0 or node_size == 0:
        return 0
    n = num_items
    total = n
    while n != 1:
        n = math.ceil(n / node_size)
        total += n
    return total * 40


def leaf_offsets(buf: bytes, num_items: int, node_size: int) -> np.ndarray:
    """Feature byte offsets from the packed index's leaf level (the leaves
    are the LAST num_items nodes)."""
    total = index_size(num_items, node_size) // 40
    arr = np.frombuffer(
        buf, dtype=np.dtype([("box", "<f8", 4), ("off", "<u8")]),
        count=total,
    )
    return arr["off"][total - num_items:].astype(np.int64)


# --------------------------------------------------------------- geometry

def _parse_geometry(t: _Table, gtype: int) -> Geometry:
    if gtype == GT_UNKNOWN:
        gtype = t.scalar(6, "<B", 0)
    xy = t.vector_f64(1)
    ends = t.vector_u32(0)
    if gtype == GT_POINT:
        if xy is None or len(xy) < 2:
            return Geometry.empty(POINT)
        return Geometry.point(float(xy[0]), float(xy[1]))
    if gtype == GT_MULTIPOINT:
        if xy is None:
            return Geometry.empty(MULTIPOINT)
        pts = [Geometry.point(float(xy[2 * i]), float(xy[2 * i + 1]))
               for i in range(len(xy) // 2)]
        return Geometry.collection(MULTIPOINT, pts)
    if gtype == GT_LINESTRING:
        if xy is None:
            return Geometry.empty(LINESTRING)
        return Geometry(LINESTRING, coords=xy.reshape(-1, 2).copy())
    if gtype == GT_MULTILINESTRING:
        if xy is None:
            return Geometry.empty(MULTILINESTRING)
        coords = xy.reshape(-1, 2)
        parts = []
        prev = 0
        for e in (ends.tolist() if ends is not None else [len(coords)]):
            parts.append(Geometry(LINESTRING, coords=coords[prev:e].copy()))
            prev = e
        return Geometry.collection(MULTILINESTRING, parts)
    if gtype == GT_POLYGON:
        if xy is None:
            return Geometry.empty(POLYGON)
        coords = xy.reshape(-1, 2)
        rings = []
        prev = 0
        for e in (ends.tolist() if ends is not None else [len(coords)]):
            rings.append(coords[prev:e].copy())
            prev = e
        return Geometry(POLYGON, rings=rings)
    if gtype in (GT_MULTIPOLYGON, GT_GEOMETRYCOLLECTION):
        parts = [_parse_geometry(p, GT_UNKNOWN) for p in t.table_vector(7)]
        kind = MULTIPOLYGON if gtype == GT_MULTIPOLYGON else GEOMETRYCOLLECTION
        return Geometry.collection(kind, parts)
    raise ValueError(f"unsupported FlatGeobuf geometry type {gtype}")


def _parse_properties(data: bytes, columns: List[Dict]) -> Dict:
    out: Dict = {}
    i = 0
    n = len(data)
    while i + 2 <= n:
        ci = struct.unpack_from("<H", data, i)[0]
        i += 2
        col = columns[ci]
        ct = col["type"]
        if ct in _CT_FMT:
            fmt, sz = _CT_FMT[ct]
            v = struct.unpack_from(fmt, data, i)[0]
            if ct == CT_BOOL:
                v = bool(v)
            i += sz
        elif ct in (CT_STRING, CT_JSON, CT_DATETIME):
            ln = struct.unpack_from("<I", data, i)[0]
            v = data[i + 4:i + 4 + ln].decode("utf-8")
            i += 4 + ln
        elif ct == CT_BINARY:
            ln = struct.unpack_from("<I", data, i)[0]
            v = data[i + 4:i + 4 + ln]
            i += 4 + ln
        else:
            raise ValueError(f"unsupported FlatGeobuf column type {ct}")
        out[col["name"]] = v
    return out


def read_feature(buf: bytes, columns: List[Dict], gtype: int) -> Tuple[Geometry, Dict]:
    t = _root(buf)
    gt = t.indirect(0)
    geom = (
        _parse_geometry(_Table(buf, gt), gtype) if gt is not None else None
    )
    props = {}
    v = t.vector(1)
    if v is not None:
        start, n = v
        props = _parse_properties(buf[start:start + n], columns)
    return geom, props


def scan_features(path: str, start: int, end: Optional[int],
                  columns: List[Dict], gtype: int):
    """Yield (geometry, props) for size-prefixed features in [start, end)."""
    with open(path, "rb") as fh:
        fh.seek(0, 2)
        fsize = fh.tell()
        stop = fsize if end is None else min(end, fsize)
        pos = start
        while pos + 4 <= stop:
            fh.seek(pos)
            ln = struct.unpack("<I", fh.read(4))[0]
            data = fh.read(ln)
            yield read_feature(data, columns, gtype)
            pos += 4 + ln


# ================================================================= writer

class _Builder:
    """Minimal flatbuffer builder, laid out FORWARD with patched offsets:
    parents are written before children, and every u32 offset field/vector
    slot is patched to (child_pos − slot_pos) once the child is written —
    satisfying the format's forward-pointing unsigned offsets for readers
    that do the standard vtable walk."""

    def __init__(self):
        self.buf = bytearray(4)  # root offset placeholder

    def _align(self, n: int):
        while len(self.buf) % n:
            self.buf.append(0)

    # -- tables ----------------------------------------------------------
    def table(self, fields):
        """fields: list of (fid, fmt, value, is_offset). Offset fields get a
        zero placeholder; returns (table_pos, {fid: patch_pos})."""
        fields = [f for f in fields if f[2] is not None]
        nslots = (max(f[0] for f in fields) + 1) if fields else 0
        offsets_in_table = {}
        cursor = 4
        for fid, fmt, _v, _o in sorted(fields,
                                       key=lambda f: -struct.calcsize(f[1])):
            sz = struct.calcsize(fmt)
            cursor += (-cursor) % sz
            offsets_in_table[fid] = cursor
            cursor += sz
        vt_size = 4 + 2 * nslots
        self._align(2)
        vt_pos = len(self.buf)
        self.buf += struct.pack("<HH", vt_size, cursor)
        for fid in range(nslots):
            self.buf += struct.pack("<H", offsets_in_table.get(fid, 0))
        self._align(4)
        tbl_pos = len(self.buf)
        self.buf += struct.pack("<i", tbl_pos - vt_pos)
        body = bytearray(cursor - 4)
        patches = {}
        for fid, fmt, val, is_off in fields:
            at = offsets_in_table[fid] - 4
            if is_off:
                patches[fid] = tbl_pos + offsets_in_table[fid]
            else:
                struct.pack_into(fmt, body, at, val)
        self.buf += bytes(body)
        return tbl_pos, patches

    def patch(self, slot_pos: int, target_pos: int):
        struct.pack_into("<I", self.buf, slot_pos, target_pos - slot_pos)

    # -- out-of-line data (written after the referencing table) ----------
    def f64_vector(self, vals: np.ndarray) -> int:
        # u32 length immediately before 8-aligned elements
        self._align(4)
        if (len(self.buf) + 4) % 8:
            self.buf += b"\x00" * 4
        pos = len(self.buf)
        self.buf += struct.pack("<I", len(vals))
        self.buf += np.ascontiguousarray(vals, dtype="<f8").tobytes()
        return pos

    def u32_vector(self, vals) -> int:
        self._align(4)
        pos = len(self.buf)
        self.buf += struct.pack("<I", len(vals))
        for v in vals:
            self.buf += struct.pack("<I", int(v))
        return pos

    def bytes_vector(self, data: bytes) -> int:
        self._align(4)
        pos = len(self.buf)
        self.buf += struct.pack("<I", len(data)) + data
        return pos

    def string(self, sv: str) -> int:
        b = sv.encode("utf-8")
        self._align(4)
        pos = len(self.buf)
        self.buf += struct.pack("<I", len(b)) + b + b"\x00"
        return pos

    def offset_vector_placeholder(self, n: int):
        """Vector of n table offsets, zeroed; returns (vec_pos, slot_posns)."""
        self._align(4)
        pos = len(self.buf)
        self.buf += struct.pack("<I", n)
        slots = []
        for _ in range(n):
            slots.append(len(self.buf))
            self.buf += b"\x00\x00\x00\x00"
        return pos, slots

    def finish(self, root_pos: int) -> bytes:
        struct.pack_into("<I", self.buf, 0, root_pos)
        return bytes(self.buf)


def _write_geometry(b: _Builder, g: Geometry) -> int:
    """Write a Geometry table (+ its vectors / child parts); returns pos."""

    def flat(arrs) -> np.ndarray:
        if not arrs:
            return np.zeros(0)
        return np.concatenate([np.asarray(a)[:, :2].reshape(-1) for a in arrs])

    if g.type_id == POINT:
        xy = (np.zeros(0) if g.is_empty()
              else np.asarray(g.coords[:2], dtype=np.float64))
        pos, pat = b.table([(1, "<I", 0, True), (6, "<B", GT_POINT, False)])
        b.patch(pat[1], b.f64_vector(xy))
        return pos
    if g.type_id == LINESTRING:
        pos, pat = b.table([(1, "<I", 0, True),
                            (6, "<B", GT_LINESTRING, False)])
        b.patch(pat[1], b.f64_vector(g.coords[:, :2].reshape(-1)))
        return pos
    if g.type_id == POLYGON:
        rings = g.rings or []
        fields = [(1, "<I", 0, True), (6, "<B", GT_POLYGON, False)]
        if len(rings) > 1:
            fields.insert(0, (0, "<I", 0, True))
        pos, pat = b.table(fields)
        if len(rings) > 1:
            b.patch(pat[0], b.u32_vector(np.cumsum([len(r) for r in rings])))
        b.patch(pat[1], b.f64_vector(flat(rings)))
        return pos
    if g.type_id == MULTIPOINT:
        xs = flat([p.coords.reshape(1, -1) for p in (g.parts or [])
                   if not p.is_empty()])
        pos, pat = b.table([(1, "<I", 0, True),
                            (6, "<B", GT_MULTIPOINT, False)])
        b.patch(pat[1], b.f64_vector(xs))
        return pos
    if g.type_id == MULTILINESTRING:
        parts = [p.coords for p in (g.parts or [])]
        fields = [(1, "<I", 0, True), (6, "<B", GT_MULTILINESTRING, False)]
        if len(parts) > 1:
            fields.insert(0, (0, "<I", 0, True))
        pos, pat = b.table(fields)
        if len(parts) > 1:
            b.patch(pat[0], b.u32_vector(np.cumsum([len(c) for c in parts])))
        b.patch(pat[1], b.f64_vector(flat(parts)))
        return pos
    if g.type_id in (MULTIPOLYGON, GEOMETRYCOLLECTION):
        gt = GT_MULTIPOLYGON if g.type_id == MULTIPOLYGON else GT_GEOMETRYCOLLECTION
        parts = [p for p in (g.parts or [])]
        pos, pat = b.table([(6, "<B", gt, False), (7, "<I", 0, True)])
        vec_pos, slots = b.offset_vector_placeholder(len(parts))
        b.patch(pat[7], vec_pos)
        for slot, p in zip(slots, parts):
            b.patch(slot, _write_geometry(b, p))
        return pos
    raise ValueError(f"unsupported geometry for FlatGeobuf write: {g.type_id}")


def build_feature(g: Optional[Geometry], props: bytes) -> bytes:
    b = _Builder()
    fields = []
    if g is not None:
        fields.append((0, "<I", 0, True))
    if props:
        fields.append((1, "<I", 0, True))
    pos, pat = b.table(fields)
    if g is not None:
        b.patch(pat[0], _write_geometry(b, g))
    if props:
        b.patch(pat[1], b.bytes_vector(props))
    return b.finish(pos)


def build_header(name: str, gtype: int, columns, count: int,
                 envelope=None) -> bytes:
    b = _Builder()
    fields = [(0, "<I", 0, True),
              (2, "<B", gtype, False),
              (8, "<Q", count, False),
              (9, "<H", 0, False)]  # index_node_size 0 = no index
    if envelope is not None:
        fields.append((1, "<I", 0, True))
    if columns:
        fields.append((7, "<I", 0, True))
    pos, pat = b.table(fields)
    b.patch(pat[0], b.string(name))
    if envelope is not None:
        b.patch(pat[1], b.f64_vector(np.asarray(envelope, dtype=np.float64)))
    if columns:
        vec_pos, slots = b.offset_vector_placeholder(len(columns))
        b.patch(pat[7], vec_pos)
        for slot, (cname, ct) in zip(slots, columns):
            cpos, cpat = b.table([(0, "<I", 0, True), (1, "<B", ct, False)])
            b.patch(slot, cpos)
            b.patch(cpat[0], b.string(cname))
    return b.finish(pos)


def encode_properties(values, col_types) -> bytes:
    out = bytearray()
    for i, (v, ct) in enumerate(zip(values, col_types)):
        if v is None:
            continue
        out += struct.pack("<H", i)
        if ct in _CT_FMT:
            fmt, _sz = _CT_FMT[ct]
            out += struct.pack(fmt,
                               float(v) if ct in (CT_DOUBLE, CT_FLOAT) else int(v))
        elif ct in (CT_STRING, CT_JSON, CT_DATETIME):
            bts = str(v).encode("utf-8")
            out += struct.pack("<I", len(bts)) + bts
        elif ct == CT_BINARY:
            bts = bytes(v)
            out += struct.pack("<I", len(bts)) + bts
    return bytes(out)
