"""Arrow IPC / Feather V2 native source/sink (batch-range parallel scan)."""

import glob
import os

import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.ipc as ipc
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.geom.wkb import from_wkb, to_wkb
from duckdb_spatial_spark.geom.core import Geometry
from duckdb_spatial_spark.sources import read, st_write
from duckdb_spatial_spark.sources.arrow import st_read_arrow, st_write_arrow


@pytest.fixture()
def arrow_file(tmp_path):
    """A multi-batch IPC file (4 record batches of 25 rows) with a WKB
    geometry column."""
    p = str(tmp_path / "pts.arrow")
    schema = pa.schema([("id", pa.int64()), ("tag", pa.string()),
                        ("geom", pa.binary())])
    with ipc.new_file(p, schema) as w:
        for b in range(4):
            ids = list(range(b * 25, b * 25 + 25))
            w.write_batch(pa.record_batch([
                pa.array(ids),
                pa.array([f"t{i % 3}" for i in ids]),
                pa.array([to_wkb(Geometry.point(float(i), float(-i)))
                          for i in ids]),
            ], schema=schema))
    return p


def test_batch_range_scan(spark, arrow_file):
    df = st_read_arrow(spark, arrow_file, batches_per_task=1)
    assert df.count() == 100
    rows = df.orderBy("id").collect()
    g = from_wkb(bytes(rows[42]["geom"]))
    assert (g.coords[0], g.coords[1]) == (42.0, -42.0)
    # batches_per_task=1 → 4 independent tasks over ONE file
    from duckdb_spatial_spark.sources.arrow import _arrow_files
    assert _arrow_files(arrow_file) == [arrow_file]


def test_column_pushdown_and_replacement_scan(spark, arrow_file):
    df = st_read_arrow(spark, arrow_file, columns=["id"])
    assert df.columns == ["id"]
    assert df.count() == 100
    with pytest.raises(ValueError, match="columns not in"):
        st_read_arrow(spark, arrow_file, columns=["nope"])
    # extension dispatch incl. columns option
    df2 = read(spark, arrow_file)
    assert df2.columns == ["id", "tag", "geom"]
    from duckdb_spatial_spark.sources.read import st_read
    assert st_read(spark, arrow_file, columns=["tag"]).columns == ["tag"]


def test_feather_v2_compat(spark, tmp_path):
    """Feather V2 files ARE Arrow IPC files — the same scan reads them."""
    p = str(tmp_path / "t.feather")
    tb = pa.table({"a": list(range(10)), "b": [float(i) for i in range(10)]})
    feather.write_feather(tb, p, compression="uncompressed")
    df = st_read_arrow(spark, p)
    assert df.count() == 10
    assert df.agg(F.sum("a")).collect()[0][0] == 45


def test_distributed_sink_roundtrip(spark, tmp_path, arrow_file):
    src = st_read_arrow(spark, arrow_file).repartition(4)
    out = str(tmp_path / "outdir")
    st_write_arrow(src, out)
    parts = glob.glob(os.path.join(out, "part-*.arrow"))
    assert len(parts) >= 2  # one file per non-empty partition
    back = st_read_arrow(spark, out)
    assert back.count() == 100
    assert back.agg(F.sum("id")).collect()[0][0] == 4950
    # st_write dispatch by format name
    out2 = str(tmp_path / "outdir2")
    st_write(src, out2, fmt="arrow")
    assert read(spark, os.path.join(
        out2, os.path.basename(glob.glob(out2 + "/*.arrow")[0]))).count() > 0


def test_arrow_read_meta(spark, arrow_file):
    from duckdb_spatial_spark.sources.read import st_read_meta

    r = st_read_meta(spark, arrow_file).collect()[0]
    assert r["driver"] == "arrow" and r["num_row_groups"] == 4
    assert "geom" in r["schema_json"]


def test_directory_scan_schema_mismatch_raises(spark, tmp_path):
    """ADVICE r3: a directory whose files disagree on schema must fail
    driver-side with the offending file named, not deep in the executor."""
    import pandas as pd

    d = tmp_path / "mixed"
    d.mkdir()
    feather.write_feather(
        pa.table({"a": [1, 2], "b": ["x", "y"]}), str(d / "f1.feather"))
    feather.write_feather(
        pa.table({"a": [1.5], "c": [True]}), str(d / "f2.feather"))
    from duckdb_spatial_spark.sources.arrow import st_read_arrow

    with pytest.raises(ValueError, match="schema mismatch.*f2"):
        st_read_arrow(spark, str(d))
