"""Casts lattice (SURVEY §2.B) + remaining reference surface
(st_assvg, Z/M bounds, POINT_3D/4D, hilbert/quadkey geometry overloads)."""

import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.functions import (
    box2d_to_geom,
    geom_to_linestring2d,
    geom_to_point2d,
    geom_to_polygon2d,
    linestring2d_to_geom,
    point2d_to_geom,
    point3d_to_point2d,
    polygon2d_to_geom,
)


def test_point2d_roundtrip(spark):
    df = spark.createDataFrame([(1.5, -2.5), (0.0, 0.0)], ["x", "y"])
    g = ST.st_point("x", "y")
    pt = geom_to_point2d(g)
    back = point2d_to_geom(pt)
    rows = df.select(
        pt["x"].alias("px"), pt["y"].alias("py"),
        ST.st_x(back).alias("bx"), ST.st_astext(back).alias("wkt"),
    ).collect()
    assert rows[0]["px"] == 1.5 and rows[0]["py"] == -2.5
    assert rows[0]["bx"] == 1.5
    assert rows[1]["wkt"] == "POINT (0 0)"


def test_point2d_cast_nonpoint_null(spark):
    df = spark.createDataFrame([("LINESTRING (0 0, 1 1)",)], ["wkt"])
    r = df.select(geom_to_point2d(ST.st_geomfromtext("wkt")).alias("p")).collect()[0]
    assert r["p"]["x"] is None


def test_linestring2d_roundtrip(spark):
    df = spark.createDataFrame([("LINESTRING (0 0, 3 4, 6 0)",)], ["wkt"])
    g = ST.st_geomfromtext("wkt")
    arr = geom_to_linestring2d(g)
    back = linestring2d_to_geom(arr)
    r = df.select(F.size(arr).alias("n"), ST.st_length(back).alias("len")).collect()[0]
    assert r["n"] == 3
    assert r["len"] == pytest.approx(10.0)


def test_polygon2d_roundtrip(spark):
    df = spark.createDataFrame(
        [("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",)],
        ["wkt"],
    )
    g = ST.st_geomfromtext("wkt")
    rings = geom_to_polygon2d(g)
    back = polygon2d_to_geom(rings)
    r = df.select(F.size(rings).alias("nr"), ST.st_area(back).alias("a")).collect()[0]
    assert r["nr"] == 2
    assert r["a"] == pytest.approx(96.0)


def test_box2d_to_geom(spark):
    df = spark.createDataFrame([(1.0, 2.0, 4.0, 6.0)], ["a", "b", "c", "d"])
    box = F.struct(
        F.col("a").alias("xmin"), F.col("b").alias("ymin"),
        F.col("c").alias("xmax"), F.col("d").alias("ymax"),
    )
    r = df.select(
        ST.st_area(box2d_to_geom(box)).alias("area"),
        ST.st_astext(box2d_to_geom(box)).alias("wkt"),
    ).collect()[0]
    assert r["area"] == pytest.approx(12.0)
    assert r["wkt"].startswith("POLYGON ((1 2")


def test_point3d_struct_and_cast(spark):
    df = spark.createDataFrame([(1.0, 2.0, 3.0)], ["x", "y", "z"])
    p3 = ST.st_point3d("x", "y", "z")
    p2 = point3d_to_point2d(p3)
    r = df.select(p3["z"].alias("z"), p2["x"].alias("x")).collect()[0]
    assert r["z"] == 3.0 and r["x"] == 1.0
    assert df.select(p2).schema[0].dataType.fieldNames() == ["x", "y"]


def test_zm_bounds(spark):
    df = spark.createDataFrame(
        [("LINESTRING Z (0 0 5, 1 1 9, 2 2 -3)",), ("POINT (1 1)",)], ["wkt"]
    )
    g = ST.st_geomfromtext("wkt")
    rows = df.select(
        ST.st_zmin(g).alias("zmin"), ST.st_zmax(g).alias("zmax"),
        ST.st_mmin(g).alias("mmin"),
    ).collect()
    assert rows[0]["zmin"] == -3.0 and rows[0]["zmax"] == 9.0
    assert rows[0]["mmin"] is None
    assert rows[1]["zmin"] is None


def test_assvg(spark):
    df = spark.createDataFrame(
        [("POINT (1 2)",), ("LINESTRING (0 0, 3 4)",),
         ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",)], ["wkt"]
    )
    rows = df.select(ST.st_assvg(ST.st_geomfromtext("wkt")).alias("svg")).collect()
    assert rows[0]["svg"] == 'cx="1" cy="-2"'
    assert rows[1]["svg"] == "M 0 0 L 3 -4"
    assert rows[2]["svg"].startswith("M 0 0 L") and rows[2]["svg"].endswith("Z")


def test_assvg_rel(spark):
    df = spark.createDataFrame([("LINESTRING (0 0, 3 4, 5 4)",)], ["wkt"])
    r = df.select(ST.st_assvg(ST.st_geomfromtext("wkt"), rel=True).alias("svg")).collect()[0]
    assert r["svg"] == "M 0 0 l 3 -4 2 0"


def test_hilbert_geom_overload_matches_xy(spark):
    df = spark.createDataFrame([(10.0, 20.0)], ["x", "y"])
    g = ST.st_point("x", "y")
    h_geom = ST.st_hilbert(g, 0.0, 0.0, 100.0, 100.0)
    h_xy = ST.st_hilbert_xy("x", "y", 0.0, 0.0, 100.0, 100.0)
    r = df.select(h_geom.alias("a"), h_xy.alias("b")).collect()[0]
    assert r["a"] == r["b"]


def test_hilbert_box_overload(spark):
    df = spark.createDataFrame([(0.0, 0.0, 20.0, 40.0)], ["a", "b", "c", "d"])
    box = F.struct(
        F.col("a").alias("xmin"), F.col("b").alias("ymin"),
        F.col("c").alias("xmax"), F.col("d").alias("ymax"),
    )
    h_box = ST.st_hilbert_box(box, 0.0, 0.0, 100.0, 100.0)
    h_xy = ST.st_hilbert_xy(F.lit(10.0), F.lit(20.0), 0.0, 0.0, 100.0, 100.0)
    r = df.select(h_box.alias("a"), h_xy.alias("b")).collect()[0]
    assert r["a"] == r["b"]


def test_quadkey_geom_overload(spark):
    df = spark.createDataFrame([(11.08, 50.12)], ["lon", "lat"])
    g = ST.st_point("lon", "lat")
    r = df.select(
        ST.st_quadkey(g, 6).alias("a"),
        ST.st_quadkey_xy("lon", "lat", 6).alias("b"),
    ).collect()[0]
    assert r["a"] == r["b"]
    assert len(r["a"]) == 6


def test_extent_approx_conservative(spark):
    from duckdb_spatial_spark.functions import st_extent_approx, st_geomfromtext

    df = spark.createDataFrame(
        [("POLYGON ((0.1 0.2, 10.7 0.2, 10.7 5.9, 0.1 5.9, 0.1 0.2))",)], ["wkt"]
    )
    row = df.select(
        st_extent_approx(st_geomfromtext("wkt")).alias("b")
    ).collect()[0]["b"]
    # float32 struct, widened outward: box contains the exact bounds
    assert row["xmin"] <= 0.1 and row["ymin"] <= 0.2
    assert row["xmax"] >= 10.7 and row["ymax"] >= 5.9
    assert abs(row["xmin"] - 0.1) < 1e-5 and abs(row["xmax"] - 10.7) < 1e-4


def test_wkb_to_native_struct_casts(spark):
    from duckdb_spatial_spark.functions import st_geomfromtext
    from duckdb_spatial_spark.functions.casts import (
        st_linestring2dfromwkb,
        st_point2dfromwkb,
        st_polygon2dfromwkb,
    )

    df = spark.createDataFrame(
        [("POINT (3 4)", "LINESTRING (0 0, 1 1)",
          "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")],
        ["p", "l", "pg"],
    )
    row = df.select(
        st_point2dfromwkb(st_geomfromtext("p")).alias("pt"),
        st_linestring2dfromwkb(st_geomfromtext("l")).alias("ln"),
        st_polygon2dfromwkb(st_geomfromtext("pg")).alias("poly"),
    ).collect()[0]
    assert (row["pt"]["x"], row["pt"]["y"]) == (3.0, 4.0)
    assert [(p["x"], p["y"]) for p in row["ln"]] == [(0.0, 0.0), (1.0, 1.0)]
    assert len(row["poly"]) == 1 and len(row["poly"][0]) == 5


def test_list_proj_crs(spark):
    from duckdb_spatial_spark.sources.read import st_list_proj_crs

    df = st_list_proj_crs(spark)
    rows = {r["code"] for r in df.collect()}
    assert {4326, 3857, 32617, 32723, 25832, 2154, 5070} <= rows
    assert df.filter("engine = 'native'").count() >= 150


def test_geomfromhexewkb_alias(spark):
    from duckdb_spatial_spark.functions import st_astext, st_geomfromhexewkb

    # EWKB point with SRID flag: 0101000020E6100000 + coords (1.0, 2.0)
    hex_ewkb = "0101000020E6100000000000000000F03F0000000000000040"
    df = spark.createDataFrame([(hex_ewkb,)], ["h"])
    out = df.select(st_astext(st_geomfromhexewkb("h")).alias("t")).collect()[0]["t"]
    assert out == "POINT (1 2)"


def test_box2d_native_tier(spark):
    from duckdb_spatial_spark.functions.scalar import (
        st_box_area,
        st_box_contains,
        st_box_intersection,
        st_box_overlaps,
        st_box_touches,
        st_intersects_extent,
        st_makebox2d,
    )
    from pyspark.sql import functions as F

    # (a, b) rectangle pairs: overlap / contain / touch-edge / disjoint
    df = spark.createDataFrame(
        [
            (0.0, 0.0, 4.0, 4.0, 2.0, 2.0, 6.0, 6.0),   # partial overlap
            (0.0, 0.0, 4.0, 4.0, 1.0, 1.0, 2.0, 2.0),   # a contains b
            (0.0, 0.0, 4.0, 4.0, 4.0, 0.0, 8.0, 4.0),   # edge touch
            (0.0, 0.0, 4.0, 4.0, 5.0, 5.0, 6.0, 6.0),   # disjoint
        ],
        ["ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1"],
    )
    d = df.select(
        st_makebox2d("ax0", "ay0", "ax1", "ay1").alias("a"),
        st_makebox2d("bx0", "by0", "bx1", "by1").alias("b"),
    ).select(
        st_intersects_extent("a", "b").alias("i"),
        st_box_contains("a", "b").alias("c"),
        st_box_touches("a", "b").alias("t"),
        st_box_overlaps("a", "b").alias("o"),
        F.round(st_box_area(st_box_intersection("a", "b")), 6).alias("area"),
    ).collect()
    assert [(r["i"], r["c"], r["t"], r["o"], r["area"]) for r in d] == [
        (True, False, False, True, 4.0),
        (True, True, False, False, 1.0),
        (True, False, True, False, 0.0),
        (False, False, False, False, 0.0),
    ]


def test_linestring2d_native_tier(spark):
    from duckdb_spatial_spark.functions.scalar import (
        st_endpoint2d,
        st_makeline2d,
        st_point2d,
        st_pointn2d,
        st_startpoint2d,
        st_x2d,
        st_y2d,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1.0, 2.0, 3.0, 4.0)], ["x1", "y1", "x2", "y2"])
    ln = st_makeline2d(st_point2d("x1", "y1"), st_point2d("x2", "y2"))
    row = df.select(
        st_x2d(st_startpoint2d(ln)).alias("sx"),
        st_y2d(st_endpoint2d(ln)).alias("ey"),
        st_x2d(st_pointn2d(ln, -1)).alias("lx"),
        F.size(ln).alias("n"),
    ).collect()[0]
    assert (row["sx"], row["ey"], row["lx"], row["n"]) == (1.0, 4.0, 3.0, 2)
