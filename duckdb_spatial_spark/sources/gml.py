"""Native GML source — stdlib ElementTree, no GDAL.

GML (OGC 07-036, public) encodes features as ``featureMember`` elements
whose geometry children use either GML2 ``<gml:coordinates>`` ("x,y x,y")
or GML3 ``<gml:posList>``/``<gml:pos>`` ("x y x y") text. This reader
covers Point / LineString / Polygon (outer+inner boundaries or GML3
exterior/interior) / MultiPoint / MultiLineString / MultiCurve /
MultiPolygon / MultiSurface, namespace-agnostically; non-geometry child
elements of each feature become string property columns.

Layout mirrors the KML reader: driver lists files, one executor task per
file (GML is a single-document format)."""

from __future__ import annotations

import glob
import os
import xml.etree.ElementTree as ET
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..geom.core import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    collect,
)
from ..geom.wkb import to_wkb

_GEOM_TAGS = {
    "Point", "LineString", "Polygon", "Curve", "Surface",
    "MultiPoint", "MultiLineString", "MultiCurve",
    "MultiPolygon", "MultiSurface", "MultiGeometry",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _coords_text(el) -> Optional[np.ndarray]:
    """Coordinates from a geometry element's GML2 <coordinates> (x,y pairs
    separated by whitespace) or GML3 <posList>/<pos> (flat x y list)."""
    for child in el:
        name = _local(child.tag)
        if name == "coordinates" and child.text:
            pts = []
            for tok in child.text.split():
                parts = tok.split(",")
                if len(parts) >= 2:
                    pts.append((float(parts[0]), float(parts[1])))
            return np.asarray(pts, dtype=np.float64)
        if name in ("posList", "pos") and child.text:
            vals = [float(v) for v in child.text.split()]
            return np.asarray(vals, dtype=np.float64).reshape(-1, 2)
    return None


def _ring_coords(boundary_el) -> Optional[np.ndarray]:
    for ring in boundary_el.iter():
        if _local(ring.tag) == "LinearRing":
            return _coords_text(ring)
    return None


def _parse_geom(el) -> Optional[Geometry]:
    kind = _local(el.tag)
    if kind == "Point":
        c = _coords_text(el)
        if c is None or not len(c):
            return Geometry.empty(POINT)
        return Geometry.point(float(c[0, 0]), float(c[0, 1]))
    if kind in ("LineString", "Curve"):
        if kind == "Curve":  # GML3 curve → its segments' posLists
            for seg in el.iter():
                if _local(seg.tag) == "LineStringSegment":
                    c = _coords_text(seg)
                    if c is not None:
                        return Geometry(LINESTRING, coords=c)
        c = _coords_text(el)
        if c is None or len(c) < 2:
            return Geometry.empty(LINESTRING)
        return Geometry(LINESTRING, coords=c)
    if kind in ("Polygon", "Surface"):
        rings: List[np.ndarray] = []
        for child in el.iter():
            name = _local(child.tag)
            if name in ("outerBoundaryIs", "exterior"):
                r = _ring_coords(child)
                if r is not None:
                    rings.insert(0, r)
            elif name in ("innerBoundaryIs", "interior"):
                r = _ring_coords(child)
                if r is not None:
                    rings.append(r)
        if not rings:
            return Geometry.empty(POLYGON)
        return Geometry(POLYGON, rings=rings)
    if kind in ("MultiPoint", "MultiLineString", "MultiCurve",
                "MultiPolygon", "MultiSurface", "MultiGeometry"):
        parts = []
        for member in el:
            for sub in member:
                if _local(sub.tag) in _GEOM_TAGS:
                    g = _parse_geom(sub)
                    if g is not None:
                        parts.append(g)
        target = {
            "MultiPoint": MULTIPOINT,
            "MultiLineString": MULTILINESTRING,
            "MultiCurve": MULTILINESTRING,
            "MultiPolygon": MULTIPOLYGON,
            "MultiSurface": MULTIPOLYGON,
            "MultiGeometry": GEOMETRYCOLLECTION,
        }[kind]
        if not parts:
            return Geometry.empty(target)
        return collect(parts)
    return None


def parse_gml_bytes(data: bytes, source: str) -> Tuple[List[dict], List[str]]:
    """(features, property_names): each feature is {props..., 'geom': wkb}."""
    root = ET.fromstring(data)
    feats: List[dict] = []
    prop_names: List[str] = []
    for member in root.iter():
        if _local(member.tag) not in ("featureMember", "member", "featureMembers"):
            continue
        for feature in member:
            row = {"__source": source, "geom": None}
            for child in feature:
                name = _local(child.tag)
                if name in _GEOM_TAGS:
                    g = _parse_geom(child)
                    row["geom"] = None if g is None else to_wkb(g)
                    continue
                sub_geom = None
                for sub in child:
                    if _local(sub.tag) in _GEOM_TAGS:
                        sub_geom = sub
                        break
                if sub_geom is not None:  # wrapped geometry property
                    g = _parse_geom(sub_geom)
                    row["geom"] = None if g is None else to_wkb(g)
                else:
                    if name not in prop_names:
                        prop_names.append(name)
                    row[name] = None if child.text is None else child.text.strip()
            feats.append(row)
    return feats, prop_names


def st_read_gml(spark: SparkSession, path: str, geom_col: str = "geom") -> DataFrame:
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.gml")))
    else:
        files = [path]
    # bind: parse the FIRST file driver-side for the property schema
    with open(files[0], "rb") as fh:
        _feats, props = parse_gml_bytes(fh.read(), files[0])
    fields = [T.StructField("source_file", T.StringType())]
    fields += [T.StructField(p, T.StringType()) for p in props]
    fields.append(T.StructField(geom_col, T.BinaryType()))
    schema = T.StructType(fields)

    fdf = spark.createDataFrame([(f,) for f in files], "path string").repartition(
        min(len(files), 64)
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                with open(p, "rb") as fh:
                    feats, _ = parse_gml_bytes(fh.read(), str(p))
                if feats:
                    rows = [
                        tuple([f["__source"]] + [f.get(c) for c in props]
                              + [f["geom"]])
                        for f in feats
                    ]
                    yield pd.DataFrame(
                        rows, columns=["source_file"] + props + ["__g"]
                    ).rename(columns={"__g": geom_col})

    return fdf.mapInPandas(scan, schema=schema)
