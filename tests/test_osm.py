"""OSM PBF reader (st_read_osm.cpp analog) — codec round trip and the
distributed blob scan."""

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.geom import pbf as PBF
from duckdb_spatial_spark.sources import st_read, st_read_osm

NODES = [
    (101, 52.5200, 13.4050, {"name": "berlin", "place": "city"}),
    (102, 48.8566, 2.3522, {}),
    (103, 51.5074, -0.1278, {"name": "london"}),
]
WAYS = [(201, [101, 102, 103], {"highway": "primary"})]
RELS = [(301, [(101, "node", "stop"), (201, "way", "route")], {"type": "route"})]


@pytest.fixture()
def pbf_file(tmp_path):
    p = str(tmp_path / "mini.osm.pbf")
    PBF.write_osm_pbf(p, NODES, WAYS, RELS)
    return p


def test_blob_scan(pbf_file):
    blobs = PBF.scan_blobs(pbf_file)
    assert [b[0] for b in blobs] == ["OSMHeader", "OSMData"]


def test_codec_roundtrip(pbf_file):
    btype, off, size = PBF.scan_blobs(pbf_file)[1]
    rows = PBF.read_blob_rows(pbf_file, off, size)
    assert len(rows) == 5
    node = rows[0]
    assert node["kind"] == "node" and node["id"] == 101
    assert node["lat"] == pytest.approx(52.52, abs=1e-6)
    assert node["lon"] == pytest.approx(13.405, abs=1e-6)
    assert node["tags"] == {"name": "berlin", "place": "city"}
    assert rows[1]["tags"] is None
    way = rows[3]
    assert way["kind"] == "way" and way["refs"] == [101, 102, 103]
    assert way["tags"] == {"highway": "primary"}
    rel = rows[4]
    assert rel["kind"] == "relation"
    assert rel["refs"] == [101, 201]
    assert rel["ref_types"] == ["node", "way"]
    assert rel["ref_roles"] == ["stop", "route"]


def test_spark_read(spark, pbf_file):
    df = st_read_osm(spark, pbf_file)
    assert df.columns == ["kind", "id", "tags", "refs", "lat", "lon", "ref_roles", "ref_types"]
    counts = {r["kind"]: r["n"] for r in df.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert counts == {"node": 3, "way": 1, "relation": 1}
    berlin = df.filter(F.col("tags")["name"] == "berlin").collect()
    assert len(berlin) == 1 and berlin[0]["id"] == 101


def test_replacement_scan(spark, pbf_file):
    import shutil
    target = pbf_file  # already *.osm.pbf
    df = st_read(spark, target)
    assert df.count() == 5


def test_uncompressed_blob(tmp_path):
    p = str(tmp_path / "raw.osm.pbf")
    PBF.write_osm_pbf(p, NODES[:1], compress=False)
    _, off, size = PBF.scan_blobs(p)[1]
    rows = PBF.read_blob_rows(p, off, size)
    assert rows[0]["id"] == 101
