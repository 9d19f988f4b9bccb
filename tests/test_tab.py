"""MapInfo TAB binary container (.tab/.dat/.map/.id) native source/sink.

Round-trip validation mirrors the GDB codec tests: write a dataset with
every supported object type, read it back distributed, and compare
against the in-memory truth. The reference reads TAB through GDAL's
MapInfo driver (spatial/src/spatial/gdal/functions/st_read.cpp:612-641).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.geom import tabmap as TM
from duckdb_spatial_spark.geom.core import Geometry
from duckdb_spatial_spark.geom.wkb import from_wkb, to_wkb
from duckdb_spatial_spark.geom.wkt import from_wkt, to_wkt
from duckdb_spatial_spark.sources import read, st_write
from duckdb_spatial_spark.sources.tab import st_read_tab, st_write_tab


def _geoms():
    return [
        from_wkt("POINT (2.5 -3.5)"),
        from_wkt("LINESTRING (0 0, 10 5)"),              # 2-pt → LINE object
        from_wkt("LINESTRING (0 0, 4 0, 4 4, 8 9)"),     # PLINE + coord block
        from_wkt("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"),
        from_wkt("MULTIPOINT ((1 1), (2 2), (3 1))"),
        from_wkt("MULTILINESTRING ((0 0, 1 1), (5 5, 6 7, 8 8))"),
        None,                                            # no-geometry row
        from_wkt("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"),
    ]


def _fields():
    return [("name", "C", 16, 0), ("kind", "N", 10, 0), ("score", "N", 12, 4)]


def _rows():
    return [(f"row{i}", i * 7, i * 0.5 - 1.0) for i in range(len(_geoms()))]


def _write(tmp_path):
    base = str(tmp_path / "t")
    TM.write_dataset(base, _fields(), _rows(), _geoms())
    return base


def test_codec_roundtrip_local(tmp_path):
    base = _write(tmp_path)
    with open(base + ".map", "rb") as fh:
        mbuf = fh.read()
    aff, n = TM.read_map_header(mbuf)
    offs = TM.read_id(base + ".id")
    assert n == len(_geoms()) and len(offs) == n
    for off, g0 in zip(offs, _geoms()):
        g1 = TM.read_object(mbuf, int(off), aff)
        if g0 is None:
            assert g1 is None
            continue
        b0, b1 = g0.bounds(), g1.bounds()
        assert np.allclose(b0, b1, atol=1e-6), (to_wkt(g0), to_wkt(g1))


def test_tab_manifest_parse_roundtrip(tmp_path):
    base = _write(tmp_path)
    with open(base + ".tab") as fh:
        text = fh.read()
    assert "!table" in text and "Definition Table" in text
    fields = TM.parse_tab_manifest(text)
    assert [f[0] for f in fields] == ["name", "kind", "score"]


def test_distributed_read(spark, tmp_path):
    base = _write(tmp_path)
    df = st_read_tab(spark, base + ".tab", num_partitions=3)
    rows = sorted(df.collect(), key=lambda r: r["kind"])
    assert len(rows) == len(_geoms())
    for r, g0, (name, kind, score) in zip(rows, _geoms(), _rows()):
        assert r["name"] == name and r["kind"] == kind
        assert abs(r["score"] - round(score, 4)) < 1e-9
        if g0 is None:
            assert r["geom"] is None
        else:
            g1 = from_wkb(bytes(r["geom"]))
            assert np.allclose(g0.bounds(), g1.bounds(), atol=1e-6)


def test_replacement_scan_and_columns(spark, tmp_path):
    base = _write(tmp_path)
    df = read(spark, base + ".tab", columns=["name"])
    assert set(df.columns) == {"name", "geom"}
    assert df.count() == len(_geoms())


def test_bbox_pushdown(spark, tmp_path):
    base = _write(tmp_path)
    df = st_read_tab(spark, base + ".tab", bbox=(-4.0, -4.0, 3.0, -0.5))
    got = {r["name"] for r in df.collect() if r["geom"] is not None}
    assert "row0" in got          # the point at (2.5, -3.5)
    assert "row3" not in got      # polygon entirely above y=-0.5
    # rows with no geometry pass through (like the gdb/gpkg readers)


def test_spark_sink_roundtrip(spark, tmp_path):
    from duckdb_spatial_spark.functions import scalar as S

    src = spark.range(0, 40).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 1.5).alias("v"),
        S.st_point(F.col("id").cast("double"),
                   (F.col("id") % 7).cast("double")).alias("geom"),
    )
    path = str(tmp_path / "sink.tab")
    st_write(src, path, fmt="tab")
    back = read(spark, path)
    assert back.count() == 40
    agg = back.agg(F.sum("k").alias("sk")).collect()[0]
    assert agg["sk"] == sum(range(40))
    one = back.filter(F.col("k") == 11).collect()[0]
    g = from_wkb(bytes(one["geom"]))
    assert np.allclose(g.coords[:2], [11.0, 4.0], atol=1e-6)
