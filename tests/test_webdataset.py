"""WebDataset tar-shard source/sink tests."""

import os
import tarfile

from pyspark.sql import functions as F

from duckdb_spatial_spark.sources.webdataset import (
    group_samples,
    st_read_webdataset,
    st_write_webdataset,
)


def _build(spark, n=40):
    return spark.createDataFrame(
        [(f"{i:06d}", bytes([i % 251]) * (i + 1), f"text {i}".encode())
         for i in range(n)],
        "key string, img binary, txt binary",
    )


def test_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wds")
    df = _build(spark)
    shards = st_write_webdataset(
        df, out, "key", {"img": "img.bin", "txt": "txt"}, num_shards=4)
    assert len(shards) == 4
    back = st_read_webdataset(spark, out)
    assert back.count() == 80  # 40 samples x 2 members
    g = group_samples(back)
    rows = {r.key: r for r in g.collect()}
    assert len(rows) == 40
    r7 = rows["000007"]
    assert r7.n_parts == 2
    assert bytes(r7.parts["img.bin"]) == bytes([7]) * 8
    assert bytes(r7.parts["txt"]) == b"text 7"


def test_sample_never_split_across_shards(spark, tmp_path):
    out = str(tmp_path / "wds2")
    st_write_webdataset(_build(spark), out, "key",
                        {"img": "a", "txt": "b"}, num_shards=5)
    seen = {}
    for p in sorted(os.listdir(out)):
        with tarfile.open(os.path.join(out, p)) as tf:
            for m in tf:
                k = m.name.split(".", 1)[0]
                seen.setdefault(k, set()).add(p)
    assert all(len(s) == 1 for s in seen.values())


def test_ext_filter_and_key_rule(spark, tmp_path):
    out = str(tmp_path / "wds3")
    st_write_webdataset(_build(spark, 10), out, "key",
                        {"img": "seg.png", "txt": "txt"}, num_shards=2)
    only = st_read_webdataset(spark, out, exts=["seg.png"])
    rows = only.collect()
    assert len(rows) == 10
    assert {r.ext for r in rows} == {"seg.png"}  # multi-dot ext preserved


def test_reproducible_shards(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _build(spark, 20)
    st_write_webdataset(df, a, "key", {"img": "x"}, num_shards=2)
    st_write_webdataset(df, b, "key", {"img": "x"}, num_shards=2)
    for p in os.listdir(a):
        assert open(os.path.join(a, p), "rb").read() == \
               open(os.path.join(b, p), "rb").read()


def test_gzip_shards(spark, tmp_path):
    import gzip, shutil
    out = str(tmp_path / "wdsz")
    st_write_webdataset(_build(spark, 12), out, "key",
                        {"img": "a", "txt": "b"}, num_shards=2)
    for p in list(os.listdir(out)):
        src = os.path.join(out, p)
        with open(src, "rb") as fi, gzip.open(src + ".gz", "wb") as fo:
            shutil.copyfileobj(fi, fo)
        os.remove(src)
    back = st_read_webdataset(spark, out)
    assert back.count() == 24
