"""Native GML reader — GML2 coordinates and GML3 posList encodings."""

from pyspark.sql import functions as F

import duckdb_spatial_spark.functions as ST
from duckdb_spatial_spark.sources import read, st_read_gml

_GML2 = """<?xml version="1.0"?>
<wfs:FeatureCollection xmlns:wfs="http://www.opengis.net/wfs"
  xmlns:gml="http://www.opengis.net/gml" xmlns:app="http://example.com/app">
 <gml:featureMember>
  <app:zone>
   <app:name>a</app:name>
   <app:the_geom>
    <gml:Polygon><gml:outerBoundaryIs><gml:LinearRing>
     <gml:coordinates>0,0 4,0 4,4 0,4 0,0</gml:coordinates>
    </gml:LinearRing></gml:outerBoundaryIs></gml:Polygon>
   </app:the_geom>
  </app:zone>
 </gml:featureMember>
 <gml:featureMember>
  <app:zone>
   <app:name>b</app:name>
   <app:the_geom>
    <gml:Point><gml:coordinates>2.5,3.5</gml:coordinates></gml:Point>
   </app:the_geom>
  </app:zone>
 </gml:featureMember>
</wfs:FeatureCollection>"""

_GML3 = """<?xml version="1.0"?>
<gml:FeatureCollection xmlns:gml="http://www.opengis.net/gml/3.2"
  xmlns:app="http://example.com/app">
 <gml:member>
  <app:road>
   <app:rid>7</app:rid>
   <gml:LineString><gml:posList>0 0 3 4 6 0</gml:posList></gml:LineString>
  </app:road>
 </gml:member>
 <gml:member>
  <app:road>
   <app:rid>8</app:rid>
   <gml:Polygon>
    <gml:exterior><gml:LinearRing>
      <gml:posList>0 0 10 0 10 10 0 10 0 0</gml:posList>
    </gml:LinearRing></gml:exterior>
    <gml:interior><gml:LinearRing>
      <gml:posList>1 1 2 1 2 2 1 2 1 1</gml:posList>
    </gml:LinearRing></gml:interior>
   </gml:Polygon>
  </app:road>
 </gml:member>
</gml:FeatureCollection>"""


def test_gml2(spark, tmp_path):
    p = tmp_path / "z.gml"
    p.write_text(_GML2)
    df = st_read_gml(spark, str(p))
    rows = {r["name"]: r for r in df.collect()}
    assert set(rows) == {"a", "b"}
    out = df.select("name", ST.st_geometrytype("geom").alias("t"),
                    F.round(ST.st_area("geom"), 6).alias("ar")).collect()
    kinds = {r["name"]: (r["t"], r["ar"]) for r in out}
    assert kinds["a"] == ("POLYGON", 16.0)
    assert kinds["b"][0] == "POINT"


def test_gml3_and_dispatch(spark, tmp_path):
    p = tmp_path / "r.gml"
    p.write_text(_GML3)
    df = read(spark, str(p))
    got = df.select(
        "rid",
        F.round(ST.st_length("geom"), 6).alias("ln"),
        F.round(ST.st_area("geom"), 6).alias("ar"),
    ).collect()
    by = {r["rid"]: r for r in got}
    assert by["7"]["ln"] == 10.0  # 5 + 5
    assert by["8"]["ar"] == 99.0  # 100 − 1 hole
