"""Native KML source/sink + zip container paths."""

import zipfile

import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.sources import read, st_read_kml, st_write_kml

_KML = """<?xml version="1.0" encoding="UTF-8"?>
<kml xmlns="http://www.opengis.net/kml/2.2"><Document>
<Placemark><name>pt</name><Point><coordinates>2.5,48.8</coordinates></Point></Placemark>
<Placemark><name>ln</name><LineString><coordinates>0,0 1,1 2,0</coordinates></LineString></Placemark>
<Placemark><name>pg</name><Polygon><outerBoundaryIs><LinearRing>
<coordinates>0,0 4,0 4,4 0,4 0,0</coordinates></LinearRing></outerBoundaryIs>
<innerBoundaryIs><LinearRing><coordinates>1,1 2,1 2,2 1,2 1,1</coordinates></LinearRing></innerBoundaryIs>
</Polygon></Placemark>
<Placemark><name>mg</name><MultiGeometry>
<Point><coordinates>9,9</coordinates></Point>
<Point><coordinates>8,8</coordinates></Point>
</MultiGeometry></Placemark>
</Document></kml>"""


def test_read_kml(spark, tmp_path):
    p = tmp_path / "fix.kml"
    p.write_text(_KML)
    df = st_read_kml(spark, str(p))
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"pt", "ln", "pg", "mg"}
    out = df.select(
        "name",
        ST.st_geometrytype("geom").alias("t"),
        F.round(ST.st_area("geom"), 6).alias("a"),
    ).collect()
    kinds = {r["name"]: r["t"] for r in out}
    assert kinds == {"pt": "POINT", "ln": "LINESTRING", "pg": "POLYGON",
                     "mg": "MULTIPOINT"}
    areas = {r["name"]: r["a"] for r in out}
    assert areas["pg"] == 15.0  # 16 − 1 hole


def test_kml_roundtrip(spark, tmp_path):
    p = tmp_path / "out.kml"
    src = spark.range(5).select(
        F.concat(F.lit("n"), F.col("id")).alias("nm"),
        ST.st_point(F.col("id").cast("double"),
                    (F.col("id") * 2).cast("double")).alias("geom"),
    )
    st_write_kml(src, str(p), name_col="nm")
    back = st_read_kml(spark, str(p))
    got = back.select(F.sum(ST.st_x("geom")).alias("sx"),
                      F.count("*").alias("n")).collect()[0]
    assert got["n"] == 5 and got["sx"] == 10.0


def test_zip_and_kmz(spark, tmp_path):
    kml = tmp_path / "doc.kml"
    kml.write_text(_KML)
    kmz = tmp_path / "fix.kmz"
    with zipfile.ZipFile(kmz, "w") as zf:
        zf.write(kml, "doc.kml")
    assert read(spark, str(kmz)).count() == 4
    zp = tmp_path / "fix2.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.write(kml, "inner.kml")
    assert read(spark, str(zp)).count() == 4
    assert read(spark, str(zp) + "/inner.kml").count() == 4
