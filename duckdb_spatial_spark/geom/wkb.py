"""ISO WKB reader/writer — the engine's native GEOMETRY encoding.

The reference uses a custom double-aligned serialization with a cached bbox
header (``geometry_serialization.cpp:14-37``); we standardize on ISO WKB
(what the reference's WKB_BLOB type holds, ``types.cpp:70-74``) because it is
loss-free for Z/M/EMPTY, is the interchange format of every other engine, and
Arrow moves it as plain bytes. The bbox cache becomes a materialized struct
column at the DataFrame layer (SURVEY §1.2).

Reads both ISO (type+1000/2000/3000 for Z/M/ZM) and EWKB (flag bits
0x80000000/0x40000000, SRID flag 0x20000000) in either byte order; writes
little-endian ISO.
"""

from __future__ import annotations

import struct
from typing import List, Optional

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

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self, le: bool) -> int:
        v = struct.unpack_from("<I" if le else ">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def doubles(self, n: int, le: bool) -> np.ndarray:
        arr = np.frombuffer(self.buf, dtype="<f8" if le else ">f8", count=n, offset=self.pos)
        self.pos += 8 * n
        return arr.astype(np.float64, copy=False)


def _read_geom(r: _Reader) -> Geometry:
    le = r.u8() == 1
    code = r.u32(le)
    srid = 0
    has_z = has_m = False
    if code & _EWKB_SRID:
        code &= ~_EWKB_SRID
        srid = r.u32(le)
    if code & _EWKB_Z:
        has_z = True
        code &= ~_EWKB_Z
    if code & _EWKB_M:
        has_m = True
        code &= ~_EWKB_M
    if code >= 3000:
        has_z = has_m = True
        code -= 3000
    elif code >= 2000:
        has_m = True
        code -= 2000
    elif code >= 1000:
        has_z = True
        code -= 1000
    tid = code
    dim = 2 + has_z + has_m

    if tid == POINT:
        vals = r.doubles(dim, le)
        if np.all(np.isnan(vals)):  # POINT EMPTY convention
            g = Geometry.empty(POINT, has_z, has_m)
        else:
            g = Geometry(POINT, coords=vals.copy(), has_z=has_z, has_m=has_m)
    elif tid == LINESTRING:
        n = r.u32(le)
        g = Geometry(
            LINESTRING, coords=r.doubles(n * dim, le).reshape(n, dim).copy(),
            has_z=has_z, has_m=has_m,
        )
    elif tid == POLYGON:
        nr = r.u32(le)
        rings: List[np.ndarray] = []
        for _ in range(nr):
            n = r.u32(le)
            rings.append(r.doubles(n * dim, le).reshape(n, dim).copy())
        g = Geometry(POLYGON, rings=rings, has_z=has_z, has_m=has_m)
    elif tid in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        n = r.u32(le)
        parts = [_read_geom(r) for _ in range(n)]
        g = Geometry(tid, parts=parts, has_z=has_z, has_m=has_m)
    else:
        raise ValueError(f"WKB: unsupported geometry type code {tid}")
    g.srid = srid
    return g


def from_wkb(buf: Optional[bytes]) -> Optional[Geometry]:
    if buf is None:
        return None
    if isinstance(buf, str):
        # implicit VARCHAR→GEOMETRY cast, part of the reference's cast
        # lattice (varchar_cast.cpp:370-389: the WKT cast is implicit and
        # cost-1, so every geometry function accepts strings)
        from .wkt import from_wkt

        return from_wkt(buf)
    return _read_geom(_Reader(bytes(buf)))


# ---------------------------------------------------------------- writer

def _type_code(g: Geometry) -> int:
    code = g.type_id
    if g.has_z and g.has_m:
        code += 3000
    elif g.has_z:
        code += 1000
    elif g.has_m:
        code += 2000
    return code


def _write_geom(g: Geometry, out: List[bytes]):
    out.append(b"\x01")
    out.append(struct.pack("<I", _type_code(g)))
    dim = g.dim
    if g.type_id == POINT:
        if g.coords is None:
            out.append(struct.pack("<%dd" % dim, *([float("nan")] * dim)))
        else:
            out.append(np.ascontiguousarray(g.coords, dtype="<f8").tobytes())
    elif g.type_id == LINESTRING:
        out.append(struct.pack("<I", len(g.coords)))
        out.append(np.ascontiguousarray(g.coords, dtype="<f8").tobytes())
    elif g.type_id == POLYGON:
        out.append(struct.pack("<I", len(g.rings)))
        for ring in g.rings:
            out.append(struct.pack("<I", len(ring)))
            out.append(np.ascontiguousarray(ring, dtype="<f8").tobytes())
    else:
        out.append(struct.pack("<I", len(g.parts or [])))
        for p in g.parts or []:
            _write_geom(p, out)


def to_wkb(g: Optional[Geometry]) -> Optional[bytes]:
    if g is None:
        return None
    out: List[bytes] = []
    _write_geom(g, out)
    return b"".join(out)


# ------------------------------------------------- fast header inspection

def wkb_type_id(buf: bytes) -> int:
    """Geometry type id from the 5-byte header without full parse."""
    le = buf[0] == 1
    code = struct.unpack_from("<I" if le else ">I", buf, 1)[0]
    code &= ~(_EWKB_SRID | _EWKB_Z | _EWKB_M)
    return code % 1000


def wkb_flags(buf: bytes):
    """(has_z, has_m) from the header."""
    le = buf[0] == 1
    code = struct.unpack_from("<I" if le else ">I", buf, 1)[0]
    has_z = bool(code & _EWKB_Z)
    has_m = bool(code & _EWKB_M)
    code &= ~(_EWKB_SRID | _EWKB_Z | _EWKB_M)
    base = code % 1000
    k = (code - base) // 1000
    if k == 3:
        has_z = has_m = True
    elif k == 2:
        has_m = True
    elif k == 1:
        has_z = True
    return has_z, has_m
