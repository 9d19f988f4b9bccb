"""OpenFileGDB (.gdbtable / .gdbtablx) codec — pure stdlib+numpy.

The ESRI File Geodatabase binary layout is publicly documented (the
OpenFileGDB driver's reverse-engineered spec by Even Rouault, the basis of
GDAL/OGR's reader and of QGIS support). The reference reads/writes GDB
through GDAL (``spatial/src/spatial/gdal/functions/st_read.cpp:612-641``,
``test/sql/gdal/st_read_gdb.test``); this module is a from-scratch Python
implementation of the subset the engine needs:

* **.gdbtablx**: 16-byte header ``(magic=3, n1024Blocks, nrows,
  size_offset)`` then ``n1024Blocks*1024`` little-endian offsets of
  ``size_offset`` bytes each (0 = absent row), then a trailer.
* **.gdbtable**: 40-byte header (magic=3, nrows, file size @24, field
  descriptor offset @32), a field-descriptor section, then rows at the
  offsets recorded in the tablx: ``uint32 blob_size`` + null bitmap (one
  bit per *nullable* field, set = NULL, LSB first) + field values.
* Field types: 0 int16, 1 int32, 2 float32, 3 float64, 4 string
  (varuint byte length + UTF-8), 5 datetime (float64 days since
  1899-12-30), 6 objectid (implicit, not stored in rows), 7 geometry
  (varuint blob length + shape blob), 8 binary.
* Geometry blobs: varuint shapefile-style type code (1 point,
  8 multipoint, 3 polyline, 5 polygon), coordinates quantized to
  ``round((v - origin) * scale)`` and stored as FGDB varints — unsigned
  base-128 for absolutes/counts, and the FGDB *signed* varint (sign in
  bit 6 of the first byte, continuation in bit 7 of every byte) for
  per-vertex deltas.

Z/M coordinates, curves, compressed .gdbtable (.cdf) and the block bitmap
for sparse tablx files are not implemented; readers raise with a clear
message when they are encountered.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .core import (Geometry, LINESTRING, MULTILINESTRING, MULTIPOINT,
                   MULTIPOLYGON, POINT, POLYGON)
from .shp import _assemble_polygon, _ring_is_cw

MAGIC = 3
# quantization defaults (the values GDAL's OpenFileGDB writer uses)
XORIGIN = -400.0
YORIGIN = -400.0
XYSCALE = 1.0e9
XYTOLERANCE = 1.0e-9

FT_INT16 = 0
FT_INT32 = 1
FT_FLOAT32 = 2
FT_FLOAT64 = 3
FT_STRING = 4
FT_DATETIME = 5
FT_OBJECTID = 6
FT_GEOMETRY = 7
FT_BINARY = 8

# layer geometry type byte in the field section (FGDB enum)
LGEOM = {"NONE": 0, "POINT": 1, "MULTIPOINT": 2, "POLYLINE": 3, "POLYGON": 4}


@dataclass
class FieldDef:
    name: str
    ftype: int
    nullable: bool = True
    max_length: int = 0          # strings
    # geometry-only quantization grid
    xorigin: float = XORIGIN
    yorigin: float = YORIGIN
    xyscale: float = XYSCALE
    wkt: str = ""


# ------------------------------------------------------------- varints

def _enc_varuint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    if v < 0:
        raise ValueError(
            "FGDB varuint cannot encode a negative value — coordinate "
            "below the layer's x/y origin (writers must pick origins "
            "<= the data minimum)")
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_varuint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _enc_svarint(v: int) -> bytes:
    """FGDB signed varint: bit 6 of the FIRST byte is the sign, bit 7 of
    every byte is the continuation flag; 6 value bits in the first byte,
    7 in each later byte."""
    v = int(v)
    sign = 0x40 if v < 0 else 0
    v = -v if v < 0 else v
    first = (v & 0x3F) | sign
    v >>= 6
    out = bytearray()
    if v:
        out.append(first | 0x80)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    else:
        out.append(first)
    return bytes(out)


def _dec_svarint(buf: bytes, pos: int) -> Tuple[int, int]:
    b = buf[pos]
    pos += 1
    sign = b & 0x40
    result = b & 0x3F
    shift = 6
    while b & 0x80:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        shift += 7
    return (-result if sign else result), pos


# ------------------------------------------------------- geometry blobs

def _scaled(v: float, origin: float, scale: float) -> int:
    return int(round((v - origin) * scale))


def encode_shape(g: Optional[Geometry], fd: FieldDef) -> bytes:
    """Geometry → FGDB shape blob (XY only)."""
    xo, yo, s = fd.xorigin, fd.yorigin, fd.xyscale
    if g is None or g.is_empty():
        return _enc_varuint(1) + _enc_varuint(0) + _enc_varuint(0)
    t = g.type_id
    if t == POINT:
        return (_enc_varuint(1)
                + _enc_varuint(_scaled(float(g.coords[0]), xo, s) + 1)
                + _enc_varuint(_scaled(float(g.coords[1]), yo, s) + 1))
    if t == MULTIPOINT:
        pts = np.vstack([p.coords[:2] for p in g.parts])
        return _enc_varuint(8) + _enc_varuint(len(pts)) + _xy_body(pts, None, xo, yo, s)
    if t in (LINESTRING, MULTILINESTRING):
        parts = ([g.coords[:, :2]] if t == LINESTRING
                 else [p.coords[:, :2] for p in g.parts])
        code = 3
    elif t in (POLYGON, MULTIPOLYGON):
        # (ring, is_shell): each polygon's first ring is its shell, the
        # rest are holes; FGDB follows the shapefile winding convention
        # (shells CW, holes CCW — the same rule the .shp sink applies)
        tagged = []
        polys = [g] if t == POLYGON else g.parts
        for p in polys:
            for i, r in enumerate(p.rings):
                tagged.append((r[:, :2], i == 0))
        fixed = []
        for r, is_shell in tagged:
            cw = _ring_is_cw(r)
            if (is_shell and not cw) or (not is_shell and cw):
                r = r[::-1]
            fixed.append(r)
        parts, code = fixed, 5
    else:
        raise NotImplementedError(
            f"GDB shape encode: unsupported geometry type {g.type_name()}")
    pts = np.vstack(parts)
    out = bytearray(_enc_varuint(code))
    out += _enc_varuint(len(pts))
    out += _enc_varuint(len(parts))
    out += _xy_body(pts, [len(p) for p in parts], xo, yo, s)
    return bytes(out)


def _xy_body(pts: np.ndarray, part_sizes: Optional[List[int]],
             xo: float, yo: float, s: float) -> bytes:
    sx = np.round((pts[:, 0] - xo) * s).astype(np.int64)
    sy = np.round((pts[:, 1] - yo) * s).astype(np.int64)
    out = bytearray()
    # bbox: absolute mins, then extents (all varuint)
    out += _enc_varuint(int(sx.min()))
    out += _enc_varuint(int(sy.min()))
    out += _enc_varuint(int(sx.max() - sx.min()))
    out += _enc_varuint(int(sy.max() - sy.min()))
    if part_sizes is not None and len(part_sizes) > 1:
        for n in part_sizes[:-1]:
            out += _enc_varuint(n)
    px = py = 0
    for i in range(len(sx)):
        out += _enc_svarint(int(sx[i]) - px)
        out += _enc_svarint(int(sy[i]) - py)
        px, py = int(sx[i]), int(sy[i])
    return bytes(out)


def decode_shape(blob: bytes, fd: FieldDef) -> Optional[Geometry]:
    xo, yo, s = fd.xorigin, fd.yorigin, fd.xyscale
    code, pos = _dec_varuint(blob, 0)
    base = code & 0xFF
    if base in (9, 11, 21):   # pointz / pointzm / pointm
        raise NotImplementedError("GDB Z/M point shapes not supported")
    if base == 1:
        vx, pos = _dec_varuint(blob, pos)
        vy, pos = _dec_varuint(blob, pos)
        if vx == 0 and vy == 0:
            return Geometry.empty(POINT)
        return Geometry.point((vx - 1) / s + xo, (vy - 1) / s + yo)
    if base == 8:
        n, pos = _dec_varuint(blob, pos)
        pts, pos = _dec_xy(blob, pos, n, s, xo, yo)
        return Geometry.collection(
            MULTIPOINT, [Geometry.point(x, y) for x, y in pts])
    if base in (3, 5, 13, 15, 23, 25, 50, 51, 54):
        if base not in (3, 5):
            raise NotImplementedError(
                f"GDB shape type {base} (Z/M/curve) not supported")
        n, pos = _dec_varuint(blob, pos)
        if n == 0:
            return Geometry.empty(LINESTRING if base == 3 else POLYGON)
        nparts, pos = _dec_varuint(blob, pos)
        # bbox (skip)
        for _ in range(4):
            _, pos = _dec_varuint(blob, pos)
        sizes = []
        for _ in range(max(nparts - 1, 0)):
            v, pos = _dec_varuint(blob, pos)
            sizes.append(v)
        sizes.append(n - sum(sizes))
        pts, pos = _dec_xy(blob, pos, n, s, xo, yo, skip_bbox=True)
        arrs = []
        at = 0
        for sz in sizes:
            arrs.append(pts[at:at + sz])
            at += sz
        if base == 3:
            lines = [Geometry.linestring(a) for a in arrs]
            return lines[0] if len(lines) == 1 else Geometry.collection(
                MULTILINESTRING, lines)
        return _assemble_polygon(arrs)
    raise NotImplementedError(f"GDB shape type {base} not supported")


def _dec_xy(blob: bytes, pos: int, n: int, s: float, xo: float, yo: float,
            skip_bbox: bool = False) -> Tuple[np.ndarray, int]:
    if not skip_bbox:
        for _ in range(4):
            _, pos = _dec_varuint(blob, pos)
    out = np.empty((n, 2), dtype=np.float64)
    px = py = 0
    for i in range(n):
        dx, pos = _dec_svarint(blob, pos)
        dy, pos = _dec_svarint(blob, pos)
        px += dx
        py += dy
        out[i, 0] = px / s + xo
        out[i, 1] = py / s + yo
    return out, pos


# ----------------------------------------------------- field descriptors

def _enc_utf16(txt: str) -> bytes:
    return txt.encode("utf-16-le")


def encode_fields(fields: Sequence[FieldDef], layer_geom: str) -> bytes:
    body = bytearray()
    body += struct.pack("<i", 4)                     # version (FGDB 10)
    body += bytes([LGEOM.get(layer_geom, 0), 3, 0, 0])
    body += struct.pack("<H", len(fields))
    for f in fields:
        nm = _enc_utf16(f.name)
        body += bytes([len(f.name)]) + nm
        body += bytes([0])                           # no alias
        body += bytes([f.ftype])
        flag = 0x1 if f.nullable else 0x0
        if f.ftype in (FT_INT16, FT_INT32, FT_FLOAT32, FT_FLOAT64,
                       FT_DATETIME):
            width = {FT_INT16: 2, FT_INT32: 4, FT_FLOAT32: 4,
                     FT_FLOAT64: 8, FT_DATETIME: 8}[f.ftype]
            body += bytes([width, flag])
        elif f.ftype == FT_STRING:
            body += struct.pack("<I", f.max_length or 65536)
            body += bytes([flag])
        elif f.ftype == FT_OBJECTID:
            body += bytes([4, 2])
        elif f.ftype == FT_BINARY:
            body += bytes([0, flag])
        elif f.ftype == FT_GEOMETRY:
            body += bytes([0, flag | 0x2])
            wkt = _enc_utf16(f.wkt or "")
            body += struct.pack("<H", len(wkt)) + wkt
            body += bytes([0])                       # flags3: XY only
            body += struct.pack("<d", f.xorigin)
            body += struct.pack("<d", f.yorigin)
            body += struct.pack("<d", f.xyscale)
            body += struct.pack("<d", XYTOLERANCE)   # xytolerance
            # layer bbox placeholder (updated by writers that track it)
            body += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
            # spatial-grid trailer: 0x00 + count + grid sizes
            body += bytes([0]) + struct.pack("<I", 1) + struct.pack("<d", 1.0)
        else:
            raise NotImplementedError(f"GDB field type {f.ftype}")
    return struct.pack("<i", len(body)) + bytes(body)


def decode_fields(buf: bytes, offset: int) -> Tuple[List[FieldDef], int]:
    """(fields, end_offset) from the field-descriptor section at offset."""
    (size,) = struct.unpack_from("<i", buf, offset)
    pos = offset + 4
    end = pos + size
    version = struct.unpack_from("<i", buf, pos)[0] & 0xFFFF
    if version not in (3, 4):
        raise ValueError(f"unsupported gdbtable version {version}")
    pos += 4
    pos += 4  # layer flags
    (nfields,) = struct.unpack_from("<H", buf, pos)
    pos += 2
    fields: List[FieldDef] = []
    for _ in range(nfields):
        nlen = buf[pos]
        pos += 1
        name = buf[pos:pos + nlen * 2].decode("utf-16-le")
        pos += nlen * 2
        alen = buf[pos]
        pos += 1 + alen * 2
        ftype = buf[pos]
        pos += 1
        fd = FieldDef(name, ftype)
        if ftype in (FT_INT16, FT_INT32, FT_FLOAT32, FT_FLOAT64,
                     FT_DATETIME):
            width, flag = buf[pos], buf[pos + 1]
            pos += 2
            fd.nullable = bool(flag & 0x1)
            if flag & 0x4:
                dlen = buf[pos]
                pos += 1 + dlen
        elif ftype == FT_STRING:
            (fd.max_length,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            flag = buf[pos]
            pos += 1
            fd.nullable = bool(flag & 0x1)
            if flag & 0x4:
                dlen, pos = _dec_varuint(buf, pos)
                pos += dlen
        elif ftype == FT_OBJECTID:
            pos += 2
            fd.nullable = False
        elif ftype == FT_BINARY:
            flag = buf[pos + 1]
            pos += 2
            fd.nullable = bool(flag & 0x1)
        elif ftype == FT_GEOMETRY:
            flag = buf[pos + 1]
            pos += 2
            fd.nullable = bool(flag & 0x1)
            (wlen,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            fd.wkt = buf[pos:pos + wlen].decode("utf-16-le")
            pos += wlen
            flags3 = buf[pos]
            pos += 1
            if flags3 & 0x6:
                raise NotImplementedError("GDB Z/M geometry columns "
                                          "not supported")
            fd.xorigin, fd.yorigin, fd.xyscale = struct.unpack_from(
                "<3d", buf, pos)
            pos += 24
            pos += 8            # xytolerance
            pos += 32           # layer bbox
            pos += 1            # 0x00
            (ngrid,) = struct.unpack_from("<I", buf, pos)
            pos += 4 + 8 * ngrid
        else:
            raise NotImplementedError(f"GDB field type {ftype} unsupported")
        fields.append(fd)
    return fields, end


# --------------------------------------------------------------- rows

def encode_row(fields: Sequence[FieldDef], values: Sequence) -> bytes:
    nullable = [f for f in fields if f.nullable]
    bitmap = bytearray((len(nullable) + 7) // 8)
    body = bytearray()
    ni = 0
    for f, v in zip(fields, values):
        if f.ftype == FT_OBJECTID:
            continue  # implicit
        if f.nullable:
            if v is None:
                bitmap[ni // 8] |= 1 << (ni % 8)
                ni += 1
                continue
            ni += 1
        elif v is None:
            raise ValueError(f"NULL in non-nullable field {f.name}")
        if f.ftype == FT_INT16:
            body += struct.pack("<h", int(v))
        elif f.ftype == FT_INT32:
            body += struct.pack("<i", int(v))
        elif f.ftype == FT_FLOAT32:
            body += struct.pack("<f", float(v))
        elif f.ftype in (FT_FLOAT64, FT_DATETIME):
            body += struct.pack("<d", float(v))
        elif f.ftype == FT_STRING:
            enc = str(v).encode("utf-8")
            body += _enc_varuint(len(enc)) + enc
        elif f.ftype == FT_BINARY:
            body += _enc_varuint(len(v)) + bytes(v)
        elif f.ftype == FT_GEOMETRY:
            blob = v if isinstance(v, (bytes, bytearray)) else encode_shape(v, f)
            body += _enc_varuint(len(blob)) + bytes(blob)
        else:
            raise NotImplementedError(f"GDB encode type {f.ftype}")
    payload = bytes(bitmap) + bytes(body)
    return struct.pack("<I", len(payload)) + payload


def decode_row(buf: bytes, offset: int, fields: Sequence[FieldDef],
               rowid: int, raw_shape: bool = False) -> tuple:
    (size,) = struct.unpack_from("<I", buf, offset)
    pos = offset + 4
    end = pos + size
    n_nullable = sum(1 for f in fields if f.nullable)
    nbytes = (n_nullable + 7) // 8
    bitmap = buf[pos:pos + nbytes]
    pos += nbytes
    out = []
    ni = 0
    for f in fields:
        if f.ftype == FT_OBJECTID:
            out.append(rowid)
            continue
        if f.nullable:
            isnull = bool(bitmap[ni // 8] & (1 << (ni % 8)))
            ni += 1
            if isnull:
                out.append(None)
                continue
        if f.ftype == FT_INT16:
            out.append(struct.unpack_from("<h", buf, pos)[0])
            pos += 2
        elif f.ftype == FT_INT32:
            out.append(struct.unpack_from("<i", buf, pos)[0])
            pos += 4
        elif f.ftype == FT_FLOAT32:
            out.append(struct.unpack_from("<f", buf, pos)[0])
            pos += 4
        elif f.ftype in (FT_FLOAT64, FT_DATETIME):
            out.append(struct.unpack_from("<d", buf, pos)[0])
            pos += 8
        elif f.ftype == FT_STRING:
            n, pos = _dec_varuint(buf, pos)
            out.append(buf[pos:pos + n].decode("utf-8"))
            pos += n
        elif f.ftype == FT_BINARY:
            n, pos = _dec_varuint(buf, pos)
            out.append(bytes(buf[pos:pos + n]))
            pos += n
        elif f.ftype == FT_GEOMETRY:
            n, pos = _dec_varuint(buf, pos)
            blob = buf[pos:pos + n]
            pos += n
            out.append(bytes(blob) if raw_shape else decode_shape(blob, f))
        else:
            raise NotImplementedError(f"GDB decode type {f.ftype}")
    if pos > end:
        raise ValueError("gdbtable row overran its declared size")
    return tuple(out)


# ------------------------------------------------------------ files

def write_table(base: str, fields: Sequence[FieldDef],
                rows: Sequence[Sequence], layer_geom: str = "NONE") -> None:
    """Write ``base + '.gdbtable'`` and ``base + '.gdbtablx'``."""
    fsec = encode_fields(fields, layer_geom)
    offsets: List[int] = []
    body = bytearray()
    start = 40 + len(fsec)
    for r in rows:
        offsets.append(start + len(body))
        body += encode_row(fields, r)
    total = 40 + len(fsec) + len(body)
    hdr = struct.pack("<iiiiii", MAGIC, len(rows), 4, 0, 0, 0)
    hdr += struct.pack("<q", total)
    hdr += struct.pack("<q", 40)
    with open(base + ".gdbtable", "wb") as fh:
        fh.write(hdr + fsec + bytes(body))
    # tablx: pad the offset array to whole 1024-row blocks
    n = len(rows)
    nblocks = max(1, (n + 1023) // 1024)
    with open(base + ".gdbtablx", "wb") as fh:
        fh.write(struct.pack("<iiii", MAGIC, nblocks, n, 5))
        for i in range(nblocks * 1024):
            off = offsets[i] if i < n else 0
            fh.write(struct.pack("<Q", off)[:5])
        fh.write(struct.pack("<iiii", 0, 0, 0, 0))   # trailer (no bitmap)


def read_tablx(path: str) -> np.ndarray:
    """Row offsets (int64, 0 = absent) from a .gdbtablx file."""
    with open(path, "rb") as fh:
        hdr = fh.read(16)
        magic, nblocks, nrows, osize = struct.unpack("<iiii", hdr)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a gdbtablx")
        if osize not in (4, 5, 6):
            raise ValueError(f"{path}: bad offset size {osize}")
        need = nblocks * 1024
        if need * osize < nrows * osize:
            raise NotImplementedError(
                f"{path}: sparse tablx (block bitmap) not supported")
        raw = fh.read(need * osize)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(need, osize)
    out = np.zeros(need, dtype=np.int64)
    for b in range(osize):
        out |= arr[:, b].astype(np.int64) << (8 * b)
    return out[:nrows]


def read_header_and_fields(path: str) -> Tuple[int, List[FieldDef]]:
    """(n_valid_rows, fields) from a .gdbtable file — header + field
    section only (never the row data; bind stays footer-class I/O)."""
    with open(path, "rb") as fh:
        hdr = fh.read(40)
        if len(hdr) < 40:
            raise ValueError(f"{path}: not a gdbtable")
        magic, nrows = struct.unpack_from("<ii", hdr, 0)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a gdbtable")
        (fdo,) = struct.unpack_from("<q", hdr, 32)
        fh.seek(fdo)
        (size,) = struct.unpack("<i", fh.read(4))
        sec = fh.read(size)
    fields, _ = decode_fields(struct.pack("<i", size) + sec, 0)
    return nrows, fields


def read_rows(path: str, fields: Sequence[FieldDef], offsets: np.ndarray,
              first_rowid: int = 1, raw_shape: bool = False) -> List[tuple]:
    """Decode the rows at the given gdbtable offsets (0 entries skipped).

    Reads only the byte span covering this offset range, not the whole
    file — a task scanning rows [lo, hi) of a multi-GB table touches just
    its slice (rows are laid out in rowid order by writers, so the span
    is tight; a reordered file still decodes, only reading more)."""
    live = [int(o) for o in offsets if o != 0]
    out: List[tuple] = []
    if not live:
        return out
    start = min(live)
    last = max(live)
    with open(path, "rb") as fh:
        # last row's size header tells where the span ends
        fh.seek(last)
        (last_size,) = struct.unpack("<I", fh.read(4))
        end = last + 4 + last_size
        fh.seek(start)
        buf = fh.read(end - start)
    for i, off in enumerate(offsets):
        if off == 0:
            continue
        out.append(decode_row(buf, int(off) - start, fields,
                              first_rowid + i, raw_shape=raw_shape))
    return out


# ---------------------------------------------------------- catalog

SYSTEM_TABLES = [
    "GDB_SystemCatalog", "GDB_DBTune", "GDB_SpatialRefs", "GDB_Items",
    "GDB_ItemTypes", "GDB_ItemRelationships", "GDB_ItemRelationshipTypes",
    "GDB_ReplicaLog",
]


def catalog_fields() -> List[FieldDef]:
    return [FieldDef("ID", FT_OBJECTID, nullable=False),
            FieldDef("Name", FT_STRING),
            FieldDef("FileFormat", FT_INT32)]


def table_file(gdb_dir: str, rowid: int) -> str:
    return os.path.join(gdb_dir, f"a{rowid:08x}")


def read_catalog(gdb_dir: str) -> List[Tuple[int, str]]:
    """[(rowid, table_name)] from GDB_SystemCatalog (a00000001)."""
    base = table_file(gdb_dir, 1)
    _, fields = read_header_and_fields(base + ".gdbtable")
    offs = read_tablx(base + ".gdbtablx")
    rows = read_rows(base + ".gdbtable", fields, offs)
    names = {f.name.lower(): i for i, f in enumerate(fields)}
    ncol = names.get("name", 1)
    idcol = names.get("id", 0)
    return [(int(r[idcol]), str(r[ncol])) for r in rows]


def layer_names(gdb_dir: str) -> List[str]:
    return [n for rid, n in read_catalog(gdb_dir)
            if rid >= 9 and not n.upper().startswith("GDB_")]
