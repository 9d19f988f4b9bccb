"""Native FlatGeobuf source/sink — roundtrip through the hand-rolled
flatbuffers codec, all geometry kinds + property types."""

import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.geom.wkt import from_wkt, to_wkt
from duckdb_spatial_spark.geom.wkb import to_wkb, from_wkb
from duckdb_spatial_spark.geom import fgb as FGB
from duckdb_spatial_spark.sources import read, st_read_fgb, st_write_fgb


def test_feature_codec_all_kinds():
    wkts = [
        "POINT (1 2)",
        "LINESTRING (0 0, 3 4, 6 0)",
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
        "MULTIPOINT (1 1, 2 2)",
        "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3, 4 2))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))",
        "GEOMETRYCOLLECTION (POINT (5 5), LINESTRING (0 0, 1 1))",
    ]
    cols = [{"name": "k", "type": FGB.CT_LONG},
            {"name": "s", "type": FGB.CT_STRING},
            {"name": "d", "type": FGB.CT_DOUBLE}]
    for i, w in enumerate(wkts):
        g = from_wkt(w)
        props = FGB.encode_properties([i, f"row{i}", i * 1.5],
                                      [FGB.CT_LONG, FGB.CT_STRING, FGB.CT_DOUBLE])
        buf = FGB.build_feature(g, props)
        g2, p2 = FGB.read_feature(buf, cols, FGB.GT_UNKNOWN)
        assert to_wkt(g2) == to_wkt(g), w
        assert p2 == {"k": i, "s": f"row{i}", "d": i * 1.5}


def test_spark_roundtrip(spark, tmp_path):
    p = str(tmp_path / "out.fgb")
    src = spark.range(200).select(
        F.col("id").alias("k"),
        (F.col("id") * 0.5).alias("v"),
        F.concat(F.lit("n"), F.col("id")).alias("nm"),
    ).withColumn("geom", ST.st_point(F.col("k").cast("double"),
                                     (F.col("k") % 17).cast("double")))
    st_write_fgb(src, p)
    back = st_read_fgb(spark, p)
    assert set(back.columns) == {"k", "v", "nm", "geom"}
    got = back.agg(
        F.count("*").alias("n"), F.sum("k").alias("sk"),
        F.sum(ST.st_x("geom")).alias("sx"), F.sum("v").alias("sv"),
    ).collect()[0]
    assert got["n"] == 200
    assert got["sk"] == sum(range(200))
    assert got["sx"] == float(sum(range(200)))
    assert got["sv"] == sum(i * 0.5 for i in range(200))


def test_replacement_scan_and_bbox(spark, tmp_path):
    p = str(tmp_path / "grid.fgb")
    src = spark.range(100).select(F.col("id")).withColumn(
        "geom", ST.st_point((F.col("id") % 10).cast("double"),
                            (F.col("id") / 10).cast("double").cast("int").cast("double"))
    )
    st_write_fgb(src, p)
    assert read(spark, p).count() == 100
    assert read(spark, p, bbox=(0.0, 0.0, 4.0, 4.0)).count() == 25
