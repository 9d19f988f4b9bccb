"""Native TopoJSON source: arc topology, quantized deltas, negative arc
indices, layer selection."""

import json

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.geom.wkb import from_wkb
from duckdb_spatial_spark.geom.wkt import to_wkt
from duckdb_spatial_spark.sources import read
from duckdb_spatial_spark.sources.topojson import (parse_topojson_text,
                                                   st_read_topojson,
                                                   topojson_layers)

# Unquantized topology: two polygons SHARING arc 0 (the classic TopoJSON
# example shape: two squares side by side sharing their middle edge).
#   arc0: shared edge (1,0)->(1,1)
#   arc1: left square's outer path (1,1)->(0,1)->(0,0)->(1,0)
#   arc2: right square's outer path (1,0)->(2,0)->(2,1)->(1,1)
TOPO = {
    "type": "Topology",
    "arcs": [
        [[1.0, 0.0], [1.0, 1.0]],
        [[1.0, 1.0], [0.0, 1.0], [0.0, 0.0], [1.0, 0.0]],
        [[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0]],
    ],
    "objects": {
        "squares": {
            "type": "GeometryCollection",
            "geometries": [
                {"type": "Polygon", "arcs": [[0, 1]], "id": "L",
                 "properties": {"name": "left"}},
                # right square uses the shared edge REVERSED (~0)
                {"type": "Polygon", "arcs": [[~0, 2]], "id": "R"},
            ],
        },
        "path": {
            "type": "LineString", "arcs": [0],
        },
    },
}

# Quantized topology: same line twice, delta-encoded with a transform.
QUANT = {
    "type": "Topology",
    "transform": {"scale": [0.5, 0.25], "translate": [10.0, 20.0]},
    "arcs": [[[0, 0], [2, 4], [2, 4]]],  # deltas → (0,0),(2,4),(4,8)
    "objects": {"lines": {"type": "LineString", "arcs": [0]}},
}


def test_shared_arc_polygons():
    rows = parse_topojson_text(json.dumps(TOPO), "t", layer="squares")
    assert len(rows) == 2
    by_id = {r[2]: from_wkb(r[4]) for r in rows}
    left, right = by_id["L"], by_id["R"]
    assert left.type_id == 3 and right.type_id == 3
    # both rings closed, 5 vertices, share the (1,0)-(1,1) edge
    assert len(left.rings[0]) == 5 and len(right.rings[0]) == 5
    from duckdb_spatial_spark.geom import kernels as K

    assert K.area(left) == pytest.approx(1.0)
    assert K.area(right) == pytest.approx(1.0)
    props = {r[2]: r[3] for r in rows}
    assert json.loads(props["L"]) == {"name": "left"}


def test_quantized_deltas():
    rows = parse_topojson_text(json.dumps(QUANT), "t")
    g = from_wkb(rows[0][4])
    # (0,0),(2,4),(4,8) scaled (0.5,0.25) translated (10,20)
    assert to_wkt(g) == "LINESTRING (10 20, 11 21, 12 22)"


def test_layers_and_spark_scan(spark, tmp_path):
    p = str(tmp_path / "demo.topojson")
    with open(p, "w") as fh:
        json.dump(TOPO, fh)
    assert topojson_layers(p) == ["path", "squares"]
    df = st_read_topojson(spark, p)
    assert df.count() == 3
    assert st_read_topojson(spark, p, layer="squares").count() == 2
    # replacement scan by extension
    assert read(spark, p).count() == 3
    # not-a-topology rejects
    bad = str(tmp_path / "bad.topojson")
    with open(bad, "w") as fh:
        json.dump({"type": "FeatureCollection"}, fh)
    with pytest.raises(Exception):
        st_read_topojson(spark, bad).collect()
