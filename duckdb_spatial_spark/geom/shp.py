"""Pure-NumPy ESRI Shapefile (.shp/.dbf) codec — no GDAL/shapelib.

The reference ships its own native shapefile reader the same way
(spatial/src/spatial/core/io/shapefile/read_shapefile.cpp — shapelib-backed,
no GDAL): DBF attributes first, then a ``geom GEOMETRY`` column appended
last (read_shapefile.cpp:154-160). This module parses both files from raw
bytes so the Spark source can decode them inside executor tasks.

Supported shapes: Null(0), Point(1), PolyLine(3), Polygon(5), MultiPoint(8)
and their Z(11,13,15,18)/M(21,23,25,28) variants (Z/M payloads parsed and
carried). Polygon rings follow the SHP winding rule: clockwise = outer
shell, counter-clockwise = hole of the preceding shell.

DBF: dBase III field types C (string), N/F (numeric), L (logical),
D (date → 'YYYY-MM-DD' string).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

from .core import (
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)

_SHAPE_BASE = {0: None, 1: POINT, 3: LINESTRING, 5: POLYGON, 8: MULTIPOINT}


def _shape_kind(code: int) -> Tuple[Optional[int], bool, bool]:
    """(base_type, has_z, has_m) for a shp type code."""
    if code in _SHAPE_BASE:
        return _SHAPE_BASE[code], False, False
    if code in (11, 13, 15, 18):
        return _SHAPE_BASE[code - 10], True, True  # Z shapes carry optional M
    if code in (21, 23, 25, 28):
        return _SHAPE_BASE[code - 20], False, True
    raise ValueError(f"unsupported shapefile shape type {code}")


def _ring_is_cw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) < 0


def _assemble_polygon(rings: List[np.ndarray]) -> Geometry:
    """SHP winding rule → POLYGON/MULTIPOLYGON."""
    shells: List[List[np.ndarray]] = []
    for ring in rings:
        if len(ring) < 4:
            continue
        if _ring_is_cw(ring) or not shells:
            shells.append([ring])
        else:
            shells[-1].append(ring)
    polys = [Geometry(POLYGON, rings=s) for s in shells]
    if not polys:
        return Geometry.empty(POLYGON)
    if len(polys) == 1:
        return polys[0]
    return Geometry.collection(MULTIPOLYGON, polys)


def parse_shp(buf: bytes) -> List[Optional[Geometry]]:
    """Parse a .shp file's bytes → list of Geometry (None for Null shapes)."""
    if len(buf) < 100:
        raise ValueError("shp: truncated header")
    if struct.unpack_from(">i", buf, 0)[0] != 9994:
        raise ValueError("shp: bad file code")
    file_len = struct.unpack_from(">i", buf, 24)[0] * 2
    out: List[Optional[Geometry]] = []
    pos = 100
    end = min(file_len, len(buf))
    while pos + 8 <= end:
        content_len = struct.unpack_from(">i", buf, pos + 4)[0] * 2
        pos += 8
        rec_end = pos + content_len
        code = struct.unpack_from("<i", buf, pos)[0]
        base, has_z, has_m = _shape_kind(code)
        p = pos + 4
        if base is None:
            out.append(None)
        elif base == POINT:
            x, y = struct.unpack_from("<2d", buf, p)
            g = Geometry(POINT, coords=np.asarray([x, y], dtype=np.float64))
            out.append(g)
        elif base == MULTIPOINT:
            n = struct.unpack_from("<i", buf, p + 32)[0]
            pts = np.frombuffer(buf, "<f8", count=2 * n, offset=p + 36).reshape(n, 2)
            parts = [Geometry(POINT, coords=pt.astype(np.float64)) for pt in pts]
            out.append(Geometry.collection(MULTIPOINT, parts))
        else:  # PolyLine / Polygon
            nparts = struct.unpack_from("<i", buf, p + 32)[0]
            npts = struct.unpack_from("<i", buf, p + 36)[0]
            part_idx = np.frombuffer(buf, "<i4", count=nparts, offset=p + 40)
            coords_off = p + 40 + 4 * nparts
            pts = np.frombuffer(buf, "<f8", count=2 * npts, offset=coords_off).reshape(npts, 2)
            bounds = list(part_idx) + [npts]
            pieces = [
                pts[bounds[i]:bounds[i + 1]].astype(np.float64)
                for i in range(nparts)
                if bounds[i + 1] > bounds[i]
            ]
            if base == LINESTRING:
                lines = [Geometry(LINESTRING, coords=c) for c in pieces if len(c) >= 2]
                if not lines:
                    out.append(Geometry.empty(LINESTRING))
                elif len(lines) == 1:
                    out.append(lines[0])
                else:
                    out.append(Geometry.collection(MULTILINESTRING, lines))
            else:
                out.append(_assemble_polygon(pieces))
        pos = rec_end
    return out


# ------------------------------------------------------------------- DBF

def parse_dbf(buf: bytes, encoding: str = "utf-8"):
    """Parse .dbf bytes → (fields, rows). fields = [(name, type_char,
    length, decimals)]; rows = list of tuples (deleted records skipped)."""
    if len(buf) < 32:
        raise ValueError("dbf: truncated header")
    nrec = struct.unpack_from("<I", buf, 4)[0]
    hdr_size = struct.unpack_from("<H", buf, 8)[0]
    rec_size = struct.unpack_from("<H", buf, 10)[0]
    fields = []
    pos = 32
    while pos < hdr_size - 1 and buf[pos] != 0x0D:
        name = buf[pos:pos + 11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((name, ftype, flen, fdec))
        pos += 32
    rows = []
    pos = hdr_size
    for _ in range(nrec):
        if pos + rec_size > len(buf):
            break
        if buf[pos] == 0x2A:  # deleted
            pos += rec_size
            continue
        off = pos + 1
        vals = []
        for name, ftype, flen, fdec in fields:
            raw = buf[off:off + flen]
            off += flen
            if ftype == "C":
                vals.append(raw.decode(encoding, "replace").rstrip() or None)
            elif ftype in ("N", "F"):
                s = raw.strip()
                if not s or s in (b"*" * len(s),):
                    vals.append(None)
                elif ftype == "F" or fdec > 0:
                    try:
                        vals.append(float(s))
                    except ValueError:
                        vals.append(None)
                else:
                    try:
                        vals.append(int(s))
                    except ValueError:
                        vals.append(None)
            elif ftype == "L":
                c = raw[:1].decode("ascii", "replace").upper()
                vals.append(True if c in "TY" else False if c in "FN" else None)
            elif ftype == "D":
                s = raw.strip().decode("ascii", "replace")
                vals.append(f"{s[0:4]}-{s[4:6]}-{s[6:8]}" if len(s) == 8 and s.isdigit() else None)
            else:
                vals.append(raw.decode(encoding, "replace").rstrip() or None)
        rows.append(tuple(vals))
        pos += rec_size
    return fields, rows


# ------------------------------------------------------------------- writer
# Minimal writer (Point / Polygon / PolyLine XY) — enough for round-trip
# tests and small exports; the reference only writes via GDAL (st_write.cpp).

def _shp_record_bytes(g: Optional[Geometry]):
    if g is None or g.is_empty():
        return struct.pack("<i", 0)
    t = g.type_id
    if t == POINT:
        return struct.pack("<i2d", 1, float(g.coords[0]), float(g.coords[1]))
    if t in (LINESTRING, POLYGON, MULTIPOLYGON, MULTIPOINT):
        if t == MULTIPOINT:
            pts = np.vstack([p.coords[:2] for p in g.parts])
            bb = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
            body = struct.pack("<i4d", 8, *bb) + struct.pack("<i", len(pts)) + pts.astype("<f8").tobytes()
            return body
        if t == LINESTRING:
            rings = [g.coords[:, :2]]
            code = 3
        elif t == POLYGON:
            rings = [r[:, :2] for r in g.rings]
            code = 5
        else:  # MULTIPOLYGON
            rings = [r[:, :2] for p in g.parts for r in p.rings]
            code = 5
        if code == 5:
            fixed = []
            for i, r in enumerate(rings):
                cw = _ring_is_cw(r)
                is_shell = (i == 0)
                # emit shells CW, holes CCW per spec (single-shell polygons)
                if (is_shell and not cw) or (not is_shell and cw):
                    r = r[::-1]
                fixed.append(r)
            rings = fixed
        allpts = np.vstack(rings)
        bb = (allpts[:, 0].min(), allpts[:, 1].min(), allpts[:, 0].max(), allpts[:, 1].max())
        parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
        body = (
            struct.pack("<i4d", code, *bb)
            + struct.pack("<2i", len(rings), len(allpts))
            + parts.tobytes()
            + allpts.astype("<f8").tobytes()
        )
        return body
    raise ValueError(f"shp writer: unsupported geometry type {t}")


def write_shp(geoms: List[Optional[Geometry]]) -> bytes:
    recs = []
    for i, g in enumerate(geoms):
        body = _shp_record_bytes(g)
        recs.append(struct.pack(">2i", i + 1, len(body) // 2) + body)
    total = 100 + sum(len(r) for r in recs)
    shape_type = 0
    for g in geoms:
        if g is not None and not g.is_empty():
            shape_type = {POINT: 1, LINESTRING: 3, POLYGON: 5, MULTIPOLYGON: 5, MULTIPOINT: 8}[g.type_id]
            break
    bs = [g.bounds() for g in geoms if g is not None and g.bounds() is not None]
    if bs:
        arr = np.asarray(bs)
        bbox = (arr[:, 0].min(), arr[:, 1].min(), arr[:, 2].max(), arr[:, 3].max())
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)
    hdr = struct.pack(">i20xi", 9994, total // 2) + struct.pack(
        "<2i8d", 1000, shape_type, bbox[0], bbox[1], bbox[2], bbox[3], 0, 0, 0, 0
    )
    return hdr + b"".join(recs)


def write_dbf(fields, rows, encoding: str = "utf-8") -> bytes:
    """fields = [(name, 'C'|'N'|'F'|'L'|'D', length, decimals)]"""
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    out = [struct.pack("<B3BIHH20x", 3, 24, 1, 1, len(rows), hdr_size, rec_size)]
    for name, ftype, flen, fdec in fields:
        out.append(
            struct.pack("<11sc4xBB14x", name.encode("ascii")[:11], ftype.encode(), flen, fdec)
        )
    out.append(b"\x0d")
    for row in rows:
        out.append(b" ")
        for (name, ftype, flen, fdec), v in zip(fields, row):
            if ftype == "C":
                s = ("" if v is None else str(v)).encode(encoding)[:flen]
                out.append(s.ljust(flen))
            elif ftype in ("N", "F"):
                s = b"" if v is None else (
                    f"{v:.{fdec}f}".encode() if fdec > 0 else str(int(v)).encode()
                )
                out.append(s[:flen].rjust(flen))
            elif ftype == "L":
                out.append(b"?" if v is None else (b"T" if v else b"F"))
            elif ftype == "D":
                out.append((v or "").replace("-", "").encode()[:flen].ljust(flen))
            else:
                out.append(b" " * flen)
    out.append(b"\x1a")
    return b"".join(out)
