"""WKT reader/writer.

Parity target: the reference's native WKT parser
(``spatial/src/spatial/core/geometry/wkt_reader.cpp``, 344 LoC) and the
VARCHAR cast rendering (``varchar_cast.cpp:370-389``): Z/M/ZM suffixes,
EMPTY variants, nested collections, case-insensitive input.

Output formatting matches DuckDB/PostGIS style: shortest round-trip float
rendering with integral values printed without a trailing ``.0``.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

from .core import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    NAME_TYPES,
    POINT,
    POLYGON,
    Geometry,
)

_TOKEN = re.compile(
    r"\s*([A-Za-z]+|\(|\)|,|-?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?)"
)


class _Tokens:
    __slots__ = ("toks", "i")

    def __init__(self, s: str):
        self.toks: List[str] = []
        pos = 0
        s = s.strip()
        while pos < len(s):
            m = _TOKEN.match(s, pos)
            if not m:
                raise ValueError(f"WKT parse error at {s[pos:pos+20]!r}")
            self.toks.append(m.group(1))
            pos = m.end()
        self.i = 0

    def peek(self) -> str:
        return self.toks[self.i] if self.i < len(self.toks) else ""

    def next(self) -> str:
        t = self.peek()
        self.i += 1
        return t

    def expect(self, t: str):
        got = self.next()
        if got != t:
            raise ValueError(f"WKT: expected {t!r}, got {got!r}")


def _parse_flags(tk: _Tokens) -> Tuple[bool, bool]:
    t = tk.peek().upper()
    if t == "Z":
        tk.next()
        return True, False
    if t == "M":
        tk.next()
        return False, True
    if t == "ZM":
        tk.next()
        return True, True
    return False, False


def _parse_coord_seq(tk: _Tokens, dim: int) -> np.ndarray:
    """Parse '( x y[ z][ m], ... )' into an (n, dim) array."""
    tk.expect("(")
    rows = []
    while True:
        row = []
        while True:
            t = tk.peek()
            if t in (",", ")"):
                break
            row.append(float(tk.next()))
        if len(row) != dim:
            raise ValueError(f"WKT: expected {dim} ordinates, got {len(row)}")
        rows.append(row)
        if tk.next() == ")":
            break
    return np.asarray(rows, dtype=np.float64)


def _parse_geom(tk: _Tokens) -> Geometry:
    name = tk.next().upper()
    if name not in NAME_TYPES:
        raise ValueError(f"WKT: unknown geometry type {name!r}")
    tid = NAME_TYPES[name]
    has_z, has_m = _parse_flags(tk)
    dim = 2 + has_z + has_m
    if tk.peek().upper() == "EMPTY":
        tk.next()
        return Geometry.empty(tid, has_z, has_m)

    if tid == POINT:
        arr = _parse_coord_seq(tk, dim)
        if len(arr) != 1:
            raise ValueError("WKT: POINT must have one coordinate")
        return Geometry(POINT, coords=arr[0], has_z=has_z, has_m=has_m)
    if tid == LINESTRING:
        return Geometry(LINESTRING, coords=_parse_coord_seq(tk, dim), has_z=has_z, has_m=has_m)
    if tid == POLYGON:
        tk.expect("(")
        rings = []
        while True:
            rings.append(_parse_coord_seq(tk, dim))
            if tk.next() == ")":
                break
        return Geometry(POLYGON, rings=rings, has_z=has_z, has_m=has_m)
    if tid == MULTIPOINT:
        tk.expect("(")
        parts = []
        while True:
            if tk.peek().upper() == "EMPTY":
                tk.next()
                parts.append(Geometry.empty(POINT, has_z, has_m))
            elif tk.peek() == "(":
                arr = _parse_coord_seq(tk, dim)
                parts.append(Geometry(POINT, coords=arr[0], has_z=has_z, has_m=has_m))
            else:
                # bare coordinates variant: MULTIPOINT (1 2, 3 4)
                row = []
                for _ in range(dim):
                    row.append(float(tk.next()))
                parts.append(
                    Geometry(POINT, coords=np.asarray(row), has_z=has_z, has_m=has_m)
                )
            if tk.next() == ")":
                break
        return Geometry(MULTIPOINT, parts=parts, has_z=has_z, has_m=has_m)
    if tid == MULTILINESTRING:
        tk.expect("(")
        parts = []
        while True:
            if tk.peek().upper() == "EMPTY":
                tk.next()
                parts.append(Geometry.empty(LINESTRING, has_z, has_m))
            else:
                parts.append(
                    Geometry(
                        LINESTRING, coords=_parse_coord_seq(tk, dim), has_z=has_z, has_m=has_m
                    )
                )
            if tk.next() == ")":
                break
        return Geometry(MULTILINESTRING, parts=parts, has_z=has_z, has_m=has_m)
    if tid == MULTIPOLYGON:
        tk.expect("(")
        parts = []
        while True:
            if tk.peek().upper() == "EMPTY":
                tk.next()
                parts.append(Geometry.empty(POLYGON, has_z, has_m))
            else:
                tk.expect("(")
                rings = []
                while True:
                    rings.append(_parse_coord_seq(tk, dim))
                    if tk.next() == ")":
                        break
                parts.append(Geometry(POLYGON, rings=rings, has_z=has_z, has_m=has_m))
            if tk.next() == ")":
                break
        return Geometry(MULTIPOLYGON, parts=parts, has_z=has_z, has_m=has_m)
    # GEOMETRYCOLLECTION
    tk.expect("(")
    parts = []
    while True:
        parts.append(_parse_geom(tk))
        if tk.next() == ")":
            break
    g = Geometry(GEOMETRYCOLLECTION, parts=parts)
    g.has_z = has_z or any(p.has_z for p in parts)
    g.has_m = has_m or any(p.has_m for p in parts)
    return g


def from_wkt(s: str) -> Geometry:
    if s is None:
        return None
    s = s.strip()
    if s[:5].upper() == "SRID=":
        # EWKT prefix: the reference parses and drops the SRID
        # (test/sql/geometry/st_geomfromtext.test)
        s = s.split(";", 1)[1]
    tk = _Tokens(s)
    g = _parse_geom(tk)
    if tk.peek():
        raise ValueError(f"WKT: trailing tokens {tk.peek()!r}")
    return g


# ---------------------------------------------------------------- writer

def _fmt(v: float) -> str:
    if v != v:  # NaN
        return "nan"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_row(row: np.ndarray) -> str:
    return " ".join(_fmt(float(v)) for v in row)


def _fmt_seq(arr: np.ndarray) -> str:
    return "(" + ", ".join(_fmt_row(r) for r in arr) + ")"


def _flags_suffix(g: Geometry) -> str:
    if g.has_z and g.has_m:
        return " ZM"
    if g.has_z:
        return " Z"
    if g.has_m:
        return " M"
    return ""


def to_wkt(g: Geometry) -> str:
    if g is None:
        return None
    name = g.type_name + _flags_suffix(g)
    if g.is_empty() and g.type_id != GEOMETRYCOLLECTION:
        return f"{name} EMPTY"
    if g.type_id == POINT:
        return f"{name} ({_fmt_row(g.coords)})"
    if g.type_id == LINESTRING:
        return f"{name} {_fmt_seq(g.coords)}"
    if g.type_id == POLYGON:
        return f"{name} (" + ", ".join(_fmt_seq(r) for r in g.rings) + ")"
    if g.type_id == MULTIPOINT:
        return f"{name} (" + ", ".join(
            "EMPTY" if p.is_empty() else _fmt_row(p.coords) for p in g.parts
        ) + ")"
    if g.type_id == MULTILINESTRING:
        return f"{name} (" + ", ".join(_fmt_seq(p.coords) for p in g.parts) + ")"
    if g.type_id == MULTIPOLYGON:
        return (
            f"{name} ("
            + ", ".join("(" + ", ".join(_fmt_seq(r) for r in p.rings) + ")" for p in g.parts)
            + ")"
        )
    if not g.parts:
        return f"{name} EMPTY"
    return f"{name} (" + ", ".join(to_wkt(p) for p in g.parts) + ")"
