"""Native GeoPackage source/sink tests. The hand-built fixture is created
with raw SQL + manually packed GP blobs so the reader is tested
independently of the writer; the roundtrip test then ties both ends."""

import sqlite3
import struct

import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.geom.wkt import from_wkt
from duckdb_spatial_spark.geom.wkb import to_wkb
from duckdb_spatial_spark.sources import (
    gpkg_layers,
    read,
    st_read_gpkg,
    st_write_gpkg,
)
from duckdb_spatial_spark.sources.gpkg import (
    gpkg_blob_envelope,
    gpkg_blob_to_wkb,
    wkb_to_gpkg_blob,
)


def _mk_fixture(path, n=100):
    con = sqlite3.connect(path)
    con.execute("PRAGMA application_id = 1196444487")
    con.execute(
        """CREATE TABLE gpkg_contents (table_name TEXT PRIMARY KEY,
           data_type TEXT, identifier TEXT, description TEXT,
           last_change DATETIME, min_x DOUBLE, min_y DOUBLE,
           max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"""
    )
    con.execute(
        """CREATE TABLE gpkg_geometry_columns (table_name TEXT,
           column_name TEXT, geometry_type_name TEXT, srs_id INTEGER,
           z TINYINT, m TINYINT)"""
    )
    con.execute(
        """CREATE TABLE pts (fid INTEGER PRIMARY KEY, name TEXT,
           val REAL, geometry BLOB)"""
    )
    rows = []
    for i in range(n):
        x, y = float(i % 10), float(i // 10)
        wkb = to_wkb(from_wkt(f"POINT ({x} {y})"))
        blob = (b"GP\x00\x03" + struct.pack("<i", 0)
                + struct.pack("<4d", x, x, y, y) + wkb)
        rows.append((i, f"p{i}", i * 0.5, blob))
    con.executemany("INSERT INTO pts VALUES (?,?,?,?)", rows)
    con.execute(
        "INSERT INTO gpkg_contents VALUES ('pts','features','pts','',NULL,0,0,9,9,0)"
    )
    con.execute("INSERT INTO gpkg_geometry_columns VALUES ('pts','geometry',"
                "'POINT',0,0,0)")
    con.commit()
    con.close()


def test_blob_codec_roundtrip():
    wkb = to_wkb(from_wkt("LINESTRING (0 0, 3 4)"))
    blob = wkb_to_gpkg_blob(wkb, srs_id=4326, envelope=(0.0, 0.0, 3.0, 4.0))
    assert gpkg_blob_to_wkb(blob) == wkb
    assert gpkg_blob_envelope(blob) == (0.0, 0.0, 3.0, 4.0)
    assert gpkg_blob_to_wkb(wkb_to_gpkg_blob(wkb)) == wkb  # no envelope


def test_read_layers_and_rows(spark, tmp_path):
    p = str(tmp_path / "fix.gpkg")
    _mk_fixture(p)
    layers = gpkg_layers(p)
    assert layers[0]["layer"] == "pts"
    assert layers[0]["geom_column"] == "geometry"
    df = st_read_gpkg(spark, p, num_partitions=7)
    assert df.count() == 100
    assert set(df.columns) == {"fid", "name", "val", "geom"}
    # geometry decodes and accessors work
    got = (
        df.select(F.round(F.sum(ST.st_x("geom")), 6).alias("sx")).collect()[0]["sx"]
    )
    assert got == sum(float(i % 10) for i in range(100))


def test_read_replacement_scan_and_columns(spark, tmp_path):
    p = str(tmp_path / "fix2.gpkg")
    _mk_fixture(p)
    df = read(spark, p, columns=["name"])
    assert set(df.columns) == {"name", "geom"}
    assert df.count() == 100


def test_read_bbox_pushdown(spark, tmp_path):
    p = str(tmp_path / "fix3.gpkg")
    _mk_fixture(p)
    df = st_read_gpkg(spark, p, bbox=(0.0, 0.0, 4.0, 4.0), num_partitions=3)
    # grid points with x<=4 and y<=4 → 5×5
    assert df.count() == 25


def test_write_read_roundtrip(spark, tmp_path):
    p = str(tmp_path / "out.gpkg")
    src = spark.range(50).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("m"),
    ).withColumn("geom", ST.st_point(F.col("k").cast("double"),
                                     F.col("m").cast("double")))
    st_write_gpkg(src, p, layer="pts2")
    meta = gpkg_layers(p)[0]
    assert meta["layer"] == "pts2"
    assert meta["bbox"] == (0.0, 0.0, 49.0, 98.0)
    back = st_read_gpkg(spark, p)
    assert back.count() == 50
    s = back.select(
        F.sum(ST.st_x("geom")).alias("sx"), F.sum("k").alias("sk")
    ).collect()[0]
    assert s["sx"] == sum(range(50))
    assert s["sk"] == sum(range(50))


def test_write_byte_guard(spark):
    src = spark.range(10).select(F.col("id")).withColumn(
        "geom", ST.st_point(F.col("id").cast("double"), F.lit(0.0))
    )
    with pytest.raises(ValueError, match="single-writer"):
        st_write_gpkg(src, "/tmp/never.gpkg", max_bytes=10)
