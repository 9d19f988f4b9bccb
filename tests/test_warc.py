"""WARC source/sink + HTML text extraction.

Reference parity target: the reference reads web-archive-class containers
through its ST_Read driver tier (spatial/src/spatial/gdal/functions/
st_read.cpp — one task per file for record-sequential formats); WARC is the
training-data-pipeline counterpart (Common Crawl's container), so the same
scan model applies.
"""
import gzip
import os

import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.textops import (escape_html,
                                                    html_to_text,
                                                    html_to_text_sql)
from duckdb_spatial_spark.sources.warc import st_read_warc, st_write_warc


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "https://a.test/p1", "plain words here"),
        (2, "https://a.test/p2", "x < y & y > z \"quoted\" 'apos'"),
        (3, "https://b.test/p1", "unicode éü中文 text"),
        (4, "https://b.test/p2", "  collapse   runs\t\tand\nnewlines  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, uri string, text string")


def test_warc_roundtrip(spark, corpus, tmp_path):
    html = F.concat(
        F.lit("<html><head><title>t</title><style>p{color:red}</style>"
              "</head><body><!-- note --><p>"),
        escape_html(F.col("text")),
        F.lit("</p><script>var x = '<p>';</script></body></html>"),
    )
    pages = corpus.select("uri", F.encode(html, "UTF-8").alias("body"))
    files = st_write_warc(pages, str(tmp_path), "uri", "body", num_files=2)
    assert len(files) >= 1 and all(f.endswith(".warc.gz") for f in files)

    back = st_read_warc(spark, str(tmp_path))
    got = (
        back.select(
            "target_uri", "http_status", "http_content_type",
            html_to_text(F.decode(F.col("payload"), "UTF-8")).alias("text"),
        )
        .orderBy("target_uri")
        .collect()
    )
    want = {
        r["uri"]: " ".join(r["text"].split()) for r in corpus.collect()
    }
    assert len(got) == 4
    for row in got:
        assert row.http_status == 200
        assert row.http_content_type.startswith("text/html")
        assert row.text == want[row.target_uri], row.target_uri


def test_warc_gzip_one_member_per_record(spark, corpus, tmp_path):
    pages = corpus.select("uri", F.encode(F.col("text"), "UTF-8").alias("b"))
    files = st_write_warc(pages, str(tmp_path), "uri", "b", num_files=1)
    raw = open(files[0], "rb").read()
    # Common Crawl layout: each record its own gzip member → magic appears
    # once per record
    assert raw.count(b"\x1f\x8b\x08") == 4
    # stdlib reads concatenated members transparently
    data = gzip.decompress(raw)
    assert data.count(b"WARC/1.0\r\n") == 4
    assert data.count(b"WARC-Type: response") == 4


def test_warc_record_type_filter_and_determinism(spark, corpus, tmp_path):
    pages = corpus.select("uri", F.encode(F.col("text"), "UTF-8").alias("b"))
    st_write_warc(pages, str(tmp_path / "a"), "uri", "b", num_files=1)
    st_write_warc(pages, str(tmp_path / "b"), "uri", "b", num_files=1)
    fa = sorted(os.listdir(tmp_path / "a"))[0]
    assert (open(tmp_path / "a" / fa, "rb").read()
            == open(tmp_path / "b" / fa, "rb").read())  # byte-reproducible

    all_types = st_read_warc(spark, str(tmp_path / "a"), record_types=None)
    assert all_types.count() == 4
    none = st_read_warc(spark, str(tmp_path / "a"), record_types=["metadata"])
    assert none.count() == 0


def test_warc_plain_uncompressed_and_non_http(spark, tmp_path):
    block = b"just metadata bytes"
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: metadata\r\n"
           b"WARC-Record-ID: <urn:uuid:x>\r\n"
           b"Content-Type: application/warc-fields\r\n"
           b"Content-Length: %d\r\n\r\n" % len(block)) + block + b"\r\n\r\n"
    p = tmp_path / "meta.warc"
    p.write_bytes(rec * 3)
    df = st_read_warc(spark, str(p), record_types=None)
    rows = df.collect()
    assert len(rows) == 3
    assert all(r.record_type == "metadata" for r in rows)
    assert all(bytes(r.payload) == block for r in rows)
    assert all(r.http_status is None for r in rows)


def test_html_to_text_duckdb_parity(spark):
    """The SQL replica chain produces byte-identical text in DuckDB — the
    property the q82 oracle depends on."""
    import duckdb

    samples = [
        "<html><body><p>hello &amp; goodbye</p></body></html>",
        "<ScRiPt>alert('<p>')</ScRiPt>after",
        "<style type='text/css'>a{}</style>kept",
        "a<!-- <p>comment</p> -->b",
        "&lt;tag&gt; &quot;q&quot; &#39;a&#39; &nbsp; &amp;lt;",
        "no markup at all",
        "broken <tag never closes",
        "spaces   and\t\ttabs\nnewlines",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "h string")
    got = [r.t for r in
           df.select(html_to_text(F.col("h")).alias("t")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {html_to_text_sql('?')}", [s]).fetchone()[0]
        for s in samples
    ]
    assert got == want
    # and the escape→extract composition inverts exactly
    inv = spark.createDataFrame(
        [("x < y & z > w \"q\"",)], "s string"
    ).select(
        html_to_text(F.concat(F.lit("<p>"), escape_html(F.col("s")),
                              F.lit("</p>"))).alias("t"),
        F.col("s"),
    ).collect()[0]
    assert inv.t == " ".join(inv.s.split())
