"""Native shapefile codec + distributed source (read_shapefile.cpp analog)."""

import os

import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.geom import shp as SHP
from duckdb_spatial_spark.geom.core import Geometry
from duckdb_spatial_spark.geom.wkt import from_wkt, to_wkt
from duckdb_spatial_spark.sources.shapefile import st_read_shp, st_write_shp
from duckdb_spatial_spark.sources import st_read


@pytest.fixture()
def shp_dir(tmp_path):
    """Hand-written point + polygon shapefiles."""
    pts = [from_wkt("POINT (1 2)"), from_wkt("POINT (-3.5 4.25)"), None]
    fields = [("name", "C", 10, 0), ("val", "N", 10, 0), ("score", "N", 12, 3)]
    rows = [("alpha", 1, 1.5), ("beta", 2, -2.25), ("gamma", None, None)]
    with open(tmp_path / "pts.shp", "wb") as fh:
        fh.write(SHP.write_shp(pts))
    with open(tmp_path / "pts.dbf", "wb") as fh:
        fh.write(SHP.write_dbf(fields, rows))

    polys = [
        from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
        from_wkt("POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"),
    ]
    with open(tmp_path / "polys.shp", "wb") as fh:
        fh.write(SHP.write_shp(polys))
    with open(tmp_path / "polys.dbf", "wb") as fh:
        fh.write(SHP.write_dbf([("pid", "N", 10, 0)], [(1,), (2,)]))
    return tmp_path


def test_codec_roundtrip_points(shp_dir):
    with open(shp_dir / "pts.shp", "rb") as fh:
        geoms = SHP.parse_shp(fh.read())
    assert len(geoms) == 3
    assert to_wkt(geoms[0]) == "POINT (1 2)"
    assert geoms[2] is None
    with open(shp_dir / "pts.dbf", "rb") as fh:
        fields, rows = SHP.parse_dbf(fh.read())
    assert [f[0] for f in fields] == ["name", "val", "score"]
    assert rows[0] == ("alpha", 1, 1.5)
    assert rows[2] == ("gamma", None, None)


def test_codec_roundtrip_polygon_holes(shp_dir):
    with open(shp_dir / "polys.shp", "rb") as fh:
        geoms = SHP.parse_shp(fh.read())
    from duckdb_spatial_spark.geom import kernels as K

    assert K.area(geoms[0]) == pytest.approx(100.0)
    assert K.area(geoms[1]) == pytest.approx(60.0)  # hole respected
    assert len(geoms[1].rings) == 2


def test_spark_source(spark, shp_dir):
    df = st_read_shp(spark, str(shp_dir / "pts.shp"))
    assert df.columns == ["name", "val", "score", "geom"]
    rows = df.orderBy("name").collect()
    assert rows[0]["name"] == "alpha" and rows[0]["val"] == 1
    x = df.select(F.sum(ST.st_x("geom")).alias("sx")).collect()[0]["sx"]
    assert x == pytest.approx(1 - 3.5)


def test_replacement_scan_dispatch(spark, shp_dir):
    df = st_read(spark, str(shp_dir / "polys.shp"))
    a = df.select(F.round(F.sum(ST.st_area("geom")), 2).alias("a")).collect()[0]["a"]
    assert a == pytest.approx(160.0)


def test_write_then_read(spark, shp_dir, tmp_path):
    df = st_read_shp(spark, str(shp_dir / "pts.shp"))
    out = str(tmp_path / "out.shp")
    st_write_shp(df, out)
    back = st_read_shp(spark, out)
    assert back.count() == 3
    assert back.columns == ["name", "val", "score", "geom"]
