"""GDAL-style creation-options passthrough on st_write — the reference's
COPY option surface (st_write.cpp:60-172): names validated per format,
unknown options rejected with the valid list, values mapped onto the
native sinks' knobs."""
import gzip
import os
import sqlite3

import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.sources.read import (_resolve_write_options,
                                               st_read, st_write)


def _pts(spark, n=10):
    return spark.range(n).select(
        F.col("id").cast("int").alias("id"),
        ST.st_point(F.col("id").cast("double"),
                    (F.col("id") * 2).cast("double")).alias("geom"),
    )


def test_unknown_option_rejected_per_format():
    with pytest.raises(ValueError, match="valid options: .*LAYER_NAME"):
        _resolve_write_options("gpkg", {"NOT_A_THING": 1})
    with pytest.raises(ValueError, match="COMPRESSION"):
        _resolve_write_options("parquet", {"ROW_GROUP_SIZE": 5})
    with pytest.raises(ValueError, match=r"\(none\)"):
        _resolve_write_options("mif", {"LAYER_NAME": "x"})


def test_option_names_case_insensitive():
    kw = _resolve_write_options("gpkg", {"layer_name": "roads", "srid": "4326"})
    assert kw == {"layer": "roads", "srs_id": 4326}


def test_bool_coercion_gdal_style():
    kw = _resolve_write_options("geoparquet", {"COVERING_BBOX": "YES"})
    assert kw == {"covering": True}
    kw = _resolve_write_options("geoparquet", {"COVERING_BBOX": "off"})
    assert kw == {"covering": False}
    with pytest.raises(ValueError, match="boolean"):
        _resolve_write_options("geoparquet", {"COVERING_BBOX": "maybe"})


def test_gpkg_layer_name_takes_effect(spark, tmp_path):
    p = str(tmp_path / "t.gpkg")
    st_write(_pts(spark), p, fmt="gpkg", options={"LAYER_NAME": "roads"})
    with sqlite3.connect(p) as con:
        names = {r[0] for r in con.execute(
            "SELECT table_name FROM gpkg_contents")}
    assert names == {"roads"}
    assert st_read(spark, p).count() == 10


def test_mvt_extent_takes_effect(spark, tmp_path):
    from duckdb_spatial_spark.sources.mvt import decode_mvt

    p = str(tmp_path / "t.mvt")
    st_write(_pts(spark), p, fmt="mvt", options={"EXTENT": 256,
                                                 "LAYER_NAME": "pts"})
    rows = decode_mvt(open(p, "rb").read())
    assert rows and all(r[0] == "pts" and r[4] == 256 for r in rows)


def test_geoparquet_row_group_size_takes_effect(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    p = str(tmp_path / "t.gpq")
    st_write(_pts(spark, 40).coalesce(1), p, fmt="geoparquet",
             options={"ROW_GROUP_SIZE": 10})
    files = glob.glob(os.path.join(p, "*.parquet"))
    assert files
    assert pq.ParquetFile(files[0]).metadata.num_row_groups >= 4


def test_parquet_compression_takes_effect(spark, tmp_path):
    import glob

    import pyarrow.parquet as pq

    p = str(tmp_path / "t.parquet")
    st_write(_pts(spark, 100), p, fmt="parquet",
             options={"COMPRESSION": "gzip"})
    f = glob.glob(os.path.join(p, "*.parquet"))[0]
    md = pq.ParquetFile(f).metadata
    assert md.row_group(0).column(0).compression.upper() == "GZIP"


def test_unknown_option_raises_through_st_write(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown creation option"):
        st_write(_pts(spark), str(tmp_path / "x.gpkg"), fmt="gpkg",
                 options={"SRS": "EPSG:3857"})
