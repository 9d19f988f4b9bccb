"""GeoJSON ⇄ Geometry (reference: scalar/st_asgeojson.cpp, yyjson-based)."""

from __future__ import annotations

from typing import List

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

_GJ_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
_GJ_TYPES = {v: k for k, v in _GJ_NAMES.items()}


def _keep(g: Geometry) -> int:
    # GeoJSON coordinates are x,y[,z] — M is not representable and is
    # dropped, matching the reference's yyjson writer (st_asgeojson.cpp)
    return 3 if g.has_z else 2


def _coords_list(arr: np.ndarray, keep: int = 2) -> List[list]:
    return [[_num(v) for v in row[:keep]] for row in arr]


def _num(v: float):
    # always a JSON real (yyjson renders doubles as 1.0, never 1)
    return float(v)


def geometry_to_geojson(g: Geometry) -> dict:
    t = _GJ_NAMES[g.type_id]
    if g.type_id == POINT:
        return {"type": t, "coordinates": [] if g.is_empty() else [_num(v) for v in g.coords[:_keep(g)]]}
    if g.type_id == LINESTRING:
        return {"type": t, "coordinates": _coords_list(g.coords, _keep(g))}
    if g.type_id == POLYGON:
        return {"type": t, "coordinates": [_coords_list(r, _keep(g)) for r in g.rings]}
    if g.type_id == MULTIPOINT:
        return {
            "type": t,
            "coordinates": [[] if p.is_empty() else [_num(v) for v in p.coords[:_keep(g)]] for p in g.parts],
        }
    if g.type_id == MULTILINESTRING:
        return {"type": t, "coordinates": [_coords_list(p.coords, _keep(g)) for p in g.parts]}
    if g.type_id == MULTIPOLYGON:
        return {
            "type": t,
            "coordinates": [[_coords_list(r, _keep(g)) for r in p.rings] for p in g.parts],
        }
    return {"type": t, "geometries": [geometry_to_geojson(p) for p in g.parts or []]}


def _dims(coords) -> int:
    c = coords
    while c and isinstance(c[0], (list, tuple)):
        c = c[0]
    return len(c) if c else 2


def geojson_to_geometry(obj: dict) -> Geometry:
    t = obj.get("type")
    if t not in _GJ_TYPES:
        raise ValueError(f"GeoJSON: unknown type {t!r}")
    tid = _GJ_TYPES[t]
    if tid == GEOMETRYCOLLECTION:
        parts = [geojson_to_geometry(g) for g in obj.get("geometries", [])]
        return Geometry.collection(GEOMETRYCOLLECTION, parts)
    coords = obj.get("coordinates", [])
    dim = _dims(coords)
    has_z = dim >= 3  # GeoJSON has no M; 3rd ordinate is Z
    if tid == POINT:
        if not coords:
            return Geometry.empty(POINT)
        return Geometry(POINT, coords=np.asarray(coords, dtype=np.float64), has_z=has_z)
    if tid == LINESTRING:
        if not coords:
            return Geometry.empty(LINESTRING)
        return Geometry(LINESTRING, coords=np.asarray(coords, dtype=np.float64), has_z=has_z)
    if tid == POLYGON:
        return Geometry(
            POLYGON, rings=[np.asarray(r, dtype=np.float64) for r in coords], has_z=has_z
        )
    if tid == MULTIPOINT:
        parts = [
            Geometry.empty(POINT, has_z)
            if not c
            else Geometry(POINT, coords=np.asarray(c, dtype=np.float64), has_z=has_z)
            for c in coords
        ]
        return Geometry(MULTIPOINT, parts=parts, has_z=has_z)
    if tid == MULTILINESTRING:
        parts = [
            Geometry(LINESTRING, coords=np.asarray(c, dtype=np.float64), has_z=has_z)
            for c in coords
        ]
        return Geometry(MULTILINESTRING, parts=parts, has_z=has_z)
    parts = [
        Geometry(POLYGON, rings=[np.asarray(r, dtype=np.float64) for r in p], has_z=has_z)
        for p in coords
    ]
    return Geometry(MULTIPOLYGON, parts=parts, has_z=has_z)
