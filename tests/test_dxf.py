"""Native DXF source/sink (group-code parser, core entity set)."""

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.geom.wkb import from_wkb
from duckdb_spatial_spark.geom.wkt import from_wkt, to_wkt
from duckdb_spatial_spark.sources import read, st_write
from duckdb_spatial_spark.sources.dxf import (parse_dxf_text, st_read_dxf,
                                              st_write_dxf)

DXF = """0
SECTION
2
ENTITIES
0
POINT
8
pts
10
3.5
20
-1.25
0
LINE
8
lines
10
0.0
20
0.0
11
10.0
21
5.0
0
LWPOLYLINE
8
shapes
90
4
70
1
10
0.0
20
0.0
10
4.0
20
0.0
10
4.0
20
4.0
10
0.0
20
4.0
0
POLYLINE
8
plines
66
1
70
0
10
0.0
20
0.0
0
VERTEX
8
plines
10
1.0
20
1.0
70
32
0
VERTEX
8
plines
10
2.0
20
3.0
0
VERTEX
8
plines
10
5.0
20
3.5
0
SEQEND
0
CIRCLE
8
shapes
10
10.0
20
10.0
40
2.0
0
ARC
8
shapes
10
0.0
20
0.0
40
1.0
50
0.0
51
90.0
0
ENDSEC
0
EOF
"""


@pytest.fixture()
def dxf_file(tmp_path):
    p = tmp_path / "demo.dxf"
    p.write_text(DXF)
    return str(p)


def test_parse_entities(dxf_file):
    rows = parse_dxf_text(DXF, "demo.dxf")
    by_ent = {}
    for _, layer, ent, wkb in rows:
        by_ent.setdefault(ent, []).append((layer, from_wkb(wkb)))
    assert set(by_ent) == {"POINT", "LINE", "LWPOLYLINE", "POLYLINE",
                           "CIRCLE", "ARC"}
    pt = by_ent["POINT"][0][1]
    assert (pt.coords[0], pt.coords[1]) == (3.5, -1.25)
    line = by_ent["LINE"][0][1]
    assert to_wkt(line) == "LINESTRING (0 0, 10 5)"
    # closed LWPOLYLINE → polygon, ring auto-closed
    poly = by_ent["LWPOLYLINE"][0][1]
    assert poly.type_id == 3 and len(poly.rings[0]) == 5
    # POLYLINE: header dummy point excluded, VERTEX 70 flags ignored
    pl = by_ent["POLYLINE"][0][1]
    assert pl.type_id == 2 and pl.coords.shape == (3, 2)
    assert tuple(pl.coords[0]) == (1.0, 1.0)
    circ = by_ent["CIRCLE"][0][1]
    assert circ.type_id == 3 and len(circ.rings[0]) == 97
    arc = by_ent["ARC"][0][1]
    assert arc.type_id == 2
    assert arc.coords[0][0] == pytest.approx(1.0)   # angle 0 → (cx+r, cy)
    assert arc.coords[-1][1] == pytest.approx(1.0)  # angle 90 → (cx, cy+r)


def test_spark_scan_and_dispatch(spark, dxf_file):
    df = st_read_dxf(spark, dxf_file)
    assert df.count() == 6
    assert {r["layer"] for r in df.collect()} == {"pts", "lines", "shapes",
                                                  "plines"}
    assert read(spark, dxf_file).count() == 6


def test_dxf_roundtrip_sink(spark, tmp_path):
    import duckdb_spatial_spark.functions as ST

    df = spark.createDataFrame(
        [("a", "POINT (1 2)"),
         ("b", "LINESTRING (0 0, 3 4, 5 5)"),
         ("c", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
         ("d", "MULTIPOINT (7 7, 8 8)")],
        "layer string, wkt string",
    ).select("layer", ST.st_geomfromtext("wkt").alias("geom"))
    out = str(tmp_path / "out.dxf")
    st_write_dxf(df, out, layer_col="layer")
    back = st_read_dxf(spark, out)
    assert back.count() == 5  # multipoint exploded to 2 POINT entities
    by_layer = {}
    for r in back.collect():
        by_layer.setdefault(r["layer"], []).append(from_wkb(bytes(r["geom"])))
    assert to_wkt(by_layer["a"][0]) == "POINT (1 2)"
    assert to_wkt(by_layer["b"][0]) == "LINESTRING (0 0, 3 4, 5 5)"
    assert to_wkt(by_layer["c"][0]) == "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"
    assert len(by_layer["d"]) == 2
    # st_write dispatch by extension
    out2 = str(tmp_path / "out2.dxf")
    st_write(df.select("geom"), out2)
    assert st_read_dxf(spark, out2).count() == 5
BULGE_DXF = """0
SECTION
2
ENTITIES
0
LWPOLYLINE
8
arcs
90
2
70
0
10
0.0
20
0.0
42
1.0
10
2.0
20
0.0
0
LWPOLYLINE
8
arcs
90
4
70
1
10
0.0
20
0.0
42
-0.4142135623730951
10
2.0
20
0.0
10
2.0
20
2.0
10
0.0
20
2.0
0
ENDSEC
0
EOF
"""


def test_bulge_tessellation():
    """Group code 42 arcs are tessellated, not read as straight chords.

    Entity 1: open 2-vertex polyline with bulge 1 (semicircle) from (0,0)
    to (2,0): positive bulge = CCW arc, apex on the RIGHT of travel ->
    (1,-1), radius 1 around (1,0).
    Entity 2: closed square whose first edge carries bulge -tan(pi/8)
    (quarter-circle CW, apex on the LEFT -> bulges into the square)."""
    import math

    rows = parse_dxf_text(BULGE_DXF, "bulge.dxf")
    assert len(rows) == 2
    open_ls = from_wkb(rows[0][3])
    assert open_ls.type_id == 2
    # semicircle sampled at <=4 deg: >= 40 points, endpoints exact
    assert len(open_ls.coords) >= 40
    assert tuple(open_ls.coords[0]) == (0.0, 0.0)
    assert tuple(open_ls.coords[-1]) == (2.0, 0.0)
    # every interior point sits on the circle |p - (1,0)| = 1, below chord
    for px, py in open_ls.coords[1:-1]:
        assert math.hypot(px - 1.0, py) == pytest.approx(1.0, abs=1e-12)
        assert py < 0
    apex = min(p[1] for p in open_ls.coords)
    assert apex == pytest.approx(-1.0, abs=1e-3)

    ring = from_wkb(rows[1][3]).rings[0]
    # 4 corners + >=21 arc points (90deg/4deg) + closing vertex
    assert len(ring) >= 25
    ys = [p[1] for p in ring]
    assert min(ys) == pytest.approx(0.0, abs=1e-12)
    corner_set = {(round(px, 9), round(py, 9)) for px, py in ring}
    assert {(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0)} <= corner_set
    # arc interior points lie strictly above the bottom chord (bulge CW =
    # apex on the LEFT of travel = +y here)
    interior = [p for p in ring if 0 < p[0] < 2 and p[1] < 1.0]
    assert interior and all(0 < py for _, py in interior)
