"""GeoParquet 'geo' footer metadata: distributed writer + metadata-aware
read (spec v1.0.0, WKB encoding)."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.geom.wkb import from_wkb
from duckdb_spatial_spark.sources import geoparquet_meta, st_write_geoparquet
from duckdb_spatial_spark.sources.read import st_read, st_read_meta


@pytest.fixture()
def gpq_dir(spark, tmp_path):
    out = str(tmp_path / "pts_gpq")
    df = (spark.range(100)
          .select(F.col("id"),
                  ST.st_point(F.col("id").cast("double"),
                              (F.col("id") % 10).cast("double"))
                  .alias("geometry"))
          .repartition(3))
    st_write_geoparquet(df, out, geom_col="geometry", crs="EPSG:4326")
    return out


def test_writer_emits_spec_metadata(gpq_dir):
    parts = sorted(glob.glob(os.path.join(gpq_dir, "part-*.parquet")))
    assert len(parts) == 3  # one file per partition - distributed sink
    tot_rows = 0
    for p in parts:
        kv = pq.read_schema(p).metadata
        geo = json.loads(kv[b"geo"].decode())
        assert geo["version"] == "1.0.0"
        assert geo["primary_column"] == "geometry"
        col = geo["columns"]["geometry"]
        assert col["encoding"] == "WKB"
        assert col["geometry_types"] == ["Point"]
        assert col["crs"] == "EPSG:4326"
        bx = col["bbox"]
        assert 0.0 <= bx[0] <= bx[2] <= 99.0 and 0.0 <= bx[1] <= bx[3] <= 9.0
        tot_rows += pq.read_metadata(p).num_rows
    assert tot_rows == 100


def test_meta_reader_and_union_bbox(gpq_dir):
    gm = geoparquet_meta(gpq_dir)
    assert gm is not None and gm["primary_column"] == "geometry"
    # plain parquet (no geo footer) → None
    assert geoparquet_meta("/root/testdata/sf0.001/region.parquet") is None


def test_st_read_resolves_primary_column(spark, gpq_dir):
    # geom_col='geom' is absent from the schema; the geo footer's
    # primary_column ('geometry') is surfaced under it
    df = st_read(spark, gpq_dir, geom_col="geom")
    assert "geom" in df.columns and "geometry" not in df.columns
    assert df.count() == 100
    row = df.filter(F.col("id") == 42).collect()[0]
    g = from_wkb(bytes(row["geom"]))
    assert (g.coords[0], g.coords[1]) == (42.0, 2.0)
    # bbox pushdown through the resolved column
    sub = st_read(spark, gpq_dir, geom_col="geom", bbox=(10.0, 0.0, 19.0, 9.0))
    assert sub.count() == 10


def test_read_meta_reports_geoparquet(spark, gpq_dir):
    part = sorted(glob.glob(os.path.join(gpq_dir, "part-*.parquet")))[0]
    r = st_read_meta(spark, part).collect()[0]
    assert r["driver"] == "geoparquet"
    info = json.loads(r["schema_json"])
    assert info["geo"]["columns"]["geometry"]["encoding"] == "WKB"


def test_st_write_dispatch(spark, tmp_path):
    from duckdb_spatial_spark.sources import st_write

    df = spark.range(5).select(
        F.col("id"), ST.st_point(F.lit(1.0), F.lit(2.0)).alias("geom"))
    out = str(tmp_path / "d")
    st_write(df, out, fmt="geoparquet")
    assert geoparquet_meta(out)["primary_column"] == "geom"


def test_real_geoparquet_metadata_segments(spark):
    """The reference repo's segments.parquet is a REAL GeoParquet v1.1
    file written by other tooling — the metadata reader parses it and
    st_read resolves its primary column under the requested geom_col."""
    p = "/root/reference/test/data/segments.parquet"
    gm = geoparquet_meta(p)
    assert gm["version"].startswith("1.")
    assert gm["primary_column"] == "geometry"
    assert gm["columns"]["geometry"]["encoding"] == "WKB"
    df = st_read(spark, p, geom_col="geom")
    assert "geom" in df.columns
    n = df.count()
    assert n > 0
    # every geometry decodes and lands inside the declared bbox
    ext = df.select(ST.st_extent("geom").alias("e")) \
        .agg(F.min("e.xmin").alias("x0"), F.max("e.xmax").alias("x1")).collect()[0]
    bx = gm["columns"]["geometry"]["bbox"]
    assert bx[0] - 1e-6 <= ext["x0"] and ext["x1"] <= bx[2] + 1e-6


def test_covering_roundtrip_and_pushdown(spark, tmp_path):
    """GeoParquet 1.1 bbox covering: the writer emits the per-row bbox
    struct + covering metadata; st_read turns the bbox option into plain
    column comparisons the parquet scan can prune with (PushedFilters on
    bbox.*), and hides the covering column from the result."""
    out = str(tmp_path / "cov_gpq")
    df = (spark.range(100)
          .select(F.col("id"),
                  ST.st_point(F.col("id").cast("double"),
                              (F.col("id") % 10).cast("double"))
                  .alias("geometry"))
          .repartition(3))
    st_write_geoparquet(df, out, geom_col="geometry", covering=True)

    gm = geoparquet_meta(out)
    assert gm["version"] == "1.1.0"
    cov = gm["columns"]["geometry"]["covering"]["bbox"]
    assert cov["xmin"] == ["bbox", "xmin"] and cov["ymax"] == ["bbox", "ymax"]
    # the physical files carry the struct column
    f = glob.glob(os.path.join(out, "*.parquet"))[0]
    names = {fld.name for fld in pq.read_schema(f)}
    assert "bbox" in names

    got = st_read(spark, out, bbox=(10.0, 0.0, 20.0, 100.0), geom_col="geom")
    ids = sorted(r.id for r in got.collect())
    assert ids == list(range(10, 21))          # x in [10, 20]
    assert "bbox" not in got.columns           # covering column is hidden
    plan = got._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "bbox" in plan


def test_covering_rows_match_uncovered_read(spark, tmp_path):
    out1 = str(tmp_path / "plain")
    out2 = str(tmp_path / "covered")
    df = (spark.range(60)
          .select(F.col("id"),
                  ST.st_point((F.col("id") % 30).cast("double"),
                              F.col("id").cast("double")).alias("geometry")))
    st_write_geoparquet(df, out1, geom_col="geometry")
    st_write_geoparquet(df, out2, geom_col="geometry", covering=True)
    box = (5.0, 0.0, 9.0, 100.0)
    a = sorted(r.id for r in st_read(spark, out1, bbox=box).collect())
    b = sorted(r.id for r in st_read(spark, out2, bbox=box).collect())
    assert a == b and len(a) > 0
