"""Sources (generate/read/write) + streaming tests."""

import json

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.sources import (
    read,
    read_geojson,
    st_drivers,
    st_generatepoints,
    st_read_meta,
    st_read_osm,
    st_write,
)
from duckdb_spatial_spark.streaming import streaming_extent_agg
import duckdb_spatial_spark.functions as ST


def test_generatepoints_deterministic_uniform(spark):
    a = st_generatepoints(spark, 0, 0, 100, 100, 10000, seed=7)
    b = st_generatepoints(spark, 0, 0, 100, 100, 10000, seed=7).repartition(13)
    sa = a.agg(F.sum("x"), F.sum("y")).collect()[0]
    sb = b.agg(F.sum("x"), F.sum("y")).collect()[0]
    # partitioning-independent determinism (fp addition order may differ)
    assert sa[0] == pytest.approx(sb[0], rel=1e-12)
    assert sa[1] == pytest.approx(sb[1], rel=1e-12)
    stats = a.agg(F.min("x"), F.max("x"), F.avg("x"), F.avg("y")).collect()[0]
    assert 0 <= stats[0] and stats[1] <= 100
    assert abs(stats[2] - 50) < 2 and abs(stats[3] - 50) < 2
    c = st_generatepoints(spark, 0, 0, 100, 100, 10000, seed=8)
    assert c.agg(F.sum("x")).collect()[0][0] != sa[0]


def test_geojson_roundtrip(spark, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [1, 2]},
                "properties": {"name": "a", "v": 1},
            },
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": [[[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]]},
                "properties": {"name": "b", "v": 2},
            },
        ],
    }
    p = tmp_path / "x.geojson"
    p.write_text(json.dumps(fc))
    df = read_geojson(spark, str(p))
    rows = df.select(ST.st_astext("geom").alias("t"), "properties").collect()
    texts = sorted(r["t"] for r in rows)
    assert texts == ["POINT (1 2)", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"]
    # replacement-scan dispatch
    df2 = read(spark, str(p))
    assert df2.count() == 2

    out = tmp_path / "out_geojson"
    st_write(df, str(out), fmt="geojson", single_file=True)
    back = read_geojson(spark, str(out / "*.txt"))
    assert back.count() == 2


def test_write_csv_wkt(spark, tmp_path):
    df = spark.createDataFrame([(1, "POINT (1 2)")], ["id", "wkt"]).withColumn(
        "geom", ST.st_geomfromtext("wkt")
    )
    out = tmp_path / "pts_csv"
    st_write(df.select("id", "geom"), str(out), fmt="csv")
    back = spark.read.csv(str(out), header=True)
    assert back.collect()[0]["geom"] == "POINT (1 2)"


def test_read_meta_and_drivers(spark):
    meta = st_read_meta(spark, "/root/testdata/sf0.001/lineitem.parquet").collect()[0]
    assert meta["driver"] == "parquet" and meta["num_rows"] > 0
    drv = {r["short_name"]: r["can_open"] for r in st_drivers(spark).collect()}
    assert drv["parquet"] and drv["geojson"]
    assert not drv["osm.pbf"]


def test_osm_missing_file(spark):
    # OSM reading is implemented now (tests/test_osm.py); a missing path
    # fails at bind time with a filesystem error, not NotImplementedError
    with pytest.raises(FileNotFoundError):
        st_read_osm(spark, "x.osm.pbf")


def test_ogr_gated(spark, tmp_path):
    gpkg = tmp_path / "zones.gpkg"
    gpkg.write_bytes(b"\x00" * 10)
    with pytest.raises(NotImplementedError):
        read(spark, str(gpkg))


def test_shp_native_corrupt_raises(spark, tmp_path):
    # .shp no longer hits the pyogrio gate — the native reader parses it
    # and rejects garbage bytes
    shp = tmp_path / "zones.shp"
    shp.write_bytes(b"\x00" * 10)
    with pytest.raises(Exception, match="shp|truncated"):
        read(spark, str(shp)).collect()


def test_streaming_extent_agg(spark):
    from duckdb_spatial_spark.sources.tables import load_table

    batch = load_table(spark, "/root/testdata/sf0.001", "events")
    stream = (
        spark.readStream.schema(
            spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
        )
        .option("pathGlobFilter", "events.parquet")
        .parquet("/root/testdata/sf0.001")  # streaming source must be a dir
        .withColumn("ts", (F.col("ts") / F.lit(1e9)).cast("timestamp"))
        .withColumn("x", F.col("value"))
        .withColumn("y", (F.col("user_id") % 100).cast("double"))
    )
    agg = streaming_extent_agg(stream, "ts", "x", "y", window="1 day")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("ext_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("SELECT * FROM ext_out").collect()
    assert len(rows) > 0
    assert all(r["xmin"] <= r["xmax"] and r["ymin"] <= r["ymax"] for r in rows)
