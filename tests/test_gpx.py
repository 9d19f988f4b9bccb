"""Native GPX source/sink (OGR 5-layer model)."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.geom.wkb import from_wkb
from duckdb_spatial_spark.sources import read, st_write
from duckdb_spatial_spark.sources.gpx import (parse_gpx_bytes, st_read_gpx,
                                              st_write_gpx)

GPX = """<?xml version="1.0" encoding="UTF-8"?>
<gpx version="1.1" creator="test" xmlns="http://www.topografix.com/GPX/1/1">
  <wpt lat="47.5" lon="8.25"><name>alpha</name><ele>402.5</ele>
    <time>2020-01-01T10:00:00Z</time></wpt>
  <wpt lat="-12.0" lon="100.125"><name>beta</name></wpt>
  <rte><name>r1</name>
    <rtept lat="0.0" lon="0.0"/><rtept lat="1.0" lon="1.0"/>
    <rtept lat="2.0" lon="1.5"/></rte>
  <trk><name>t1</name>
    <trkseg><trkpt lat="10.0" lon="20.0"><ele>5.0</ele></trkpt>
      <trkpt lat="10.5" lon="20.5"/></trkseg>
    <trkseg><trkpt lat="11.0" lon="21.0"/><trkpt lat="11.5" lon="21.5"/>
      <trkpt lat="12.0" lon="22.0"/></trkseg></trk>
</gpx>
"""


@pytest.fixture()
def gpx_file(tmp_path):
    p = tmp_path / "demo.gpx"
    p.write_text(GPX)
    return str(p)


def test_waypoints_layer(spark, gpx_file):
    rows = st_read_gpx(spark, gpx_file, layer="waypoints") \
        .orderBy("name").collect()
    assert [r["name"] for r in rows] == ["alpha", "beta"]
    g0 = from_wkb(bytes(rows[0]["geom"]))
    assert (g0.coords[0], g0.coords[1]) == (8.25, 47.5)
    assert rows[0]["ele"] == pytest.approx(402.5)
    assert rows[0]["time"] == "2020-01-01T10:00:00Z"
    assert rows[1]["ele"] is None


def test_routes_and_tracks_layers(spark, gpx_file):
    r = st_read_gpx(spark, gpx_file, layer="routes").collect()
    assert len(r) == 1 and r[0]["name"] == "r1"
    line = from_wkb(bytes(r[0]["geom"]))
    assert line.coords.shape == (3, 2) and tuple(line.coords[2]) == (1.5, 2.0)

    t = st_read_gpx(spark, gpx_file, layer="tracks").collect()
    assert len(t) == 1 and t[0]["name"] == "t1"
    ml = from_wkb(bytes(t[0]["geom"]))
    assert len(ml.parts) == 2
    assert ml.parts[0].coords.shape == (2, 2)
    assert ml.parts[1].coords.shape == (3, 2)


def test_point_layers(spark, gpx_file):
    rp = st_read_gpx(spark, gpx_file, layer="route_points").collect()
    assert len(rp) == 3
    assert {(r["route_fid"], r["route_point_id"]) for r in rp} == {
        (0, 0), (0, 1), (0, 2)}
    tp = st_read_gpx(spark, gpx_file, layer="track_points") \
        .orderBy("track_seg_id", "track_seg_point_id").collect()
    assert len(tp) == 5
    assert tp[0]["ele"] == pytest.approx(5.0)
    assert [r["track_seg_id"] for r in tp] == [0, 0, 1, 1, 1]


def test_replacement_scan_and_layer_option(spark, gpx_file):
    df = read(spark, gpx_file)  # default layer: waypoints
    assert df.count() == 2
    from duckdb_spatial_spark.sources.read import st_read

    assert st_read(spark, gpx_file, layer="tracks").count() == 1


def test_gpx_roundtrip_sink(spark, tmp_path, gpx_file):
    wpts = st_read_gpx(spark, gpx_file, layer="waypoints")
    out = str(tmp_path / "out.gpx")
    st_write_gpx(wpts, out, name_col="name")
    back = st_read_gpx(spark, out, layer="waypoints").orderBy("name").collect()
    assert [r["name"] for r in back] == ["alpha", "beta"]
    g = from_wkb(bytes(back[1]["geom"]))
    assert (g.coords[0], g.coords[1]) == (100.125, -12.0)

    # lines roundtrip through rte; multilines through trk
    trks = st_read_gpx(spark, gpx_file, layer="tracks")
    out2 = str(tmp_path / "out2.gpx")
    st_write(trks, out2, geom_col="geom")
    back2 = st_read_gpx(spark, out2, layer="tracks").collect()
    ml0 = from_wkb(bytes(back2[0]["geom"]))
    assert len(ml0.parts) == 2 and ml0.parts[1].coords.shape == (3, 2)


def test_gpx_polygon_rejected(spark, tmp_path):
    from duckdb_spatial_spark import functions as ST

    df = spark.range(1).select(
        ST.st_geomfromtext(F.lit("POLYGON ((0 0, 1 0, 1 1, 0 0))")).alias("geom"))
    with pytest.raises(ValueError, match="points/lines"):
        st_write_gpx(df, str(tmp_path / "bad.gpx"))


def test_gpx_dir_scan(spark, tmp_path):
    for i in range(3):
        (tmp_path / f"f{i}.gpx").write_text(GPX)
    df = st_read_gpx(spark, str(tmp_path), layer="waypoints")
    assert df.count() == 6
    assert df.select("source_file").distinct().count() == 3


def test_gpx_read_meta(spark, gpx_file):
    from duckdb_spatial_spark.sources.read import st_read_meta
    import json as _json

    r = st_read_meta(spark, gpx_file).collect()[0]
    assert r["driver"] == "gpx" and r["num_row_groups"] == 5
    counts = _json.loads(r["schema_json"])
    assert counts["waypoints"] == 2 and counts["track_points"] == 5
