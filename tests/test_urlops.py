"""URL operators: parse/normalize/registrable-domain + DuckDB twin parity."""
import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators import urlops as U

URLS = [
    "https://Example.COM/path/page?a=1&utm_source=x&b=2#frag",
    "http://example.com:80/",
    "https://example.com:443/x",
    "https://example.com:8443/x?utm_campaign=y",
    "http://user:pw@sub.Example.co.uk:8080/a/b?fbclid=z&q=ok",
    "https://a.b.c.example.com/deep?gclid=1&msclkid=2&mc_eid=3",
    "ftp://files.example.org/pub/file.txt",
    "https://example.com",
    "https://example.com/?",
    "https://xn--bcher-kva.example/path",
    "https://example.gov.au/svc?x=1&y=2",
    "not a url at all",
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


def test_parse_and_normalize_values(spark, df):
    rows = {r.url: r for r in df.select(
        "url",
        U.url_scheme(F.col("url")).alias("s"),
        U.url_host(F.col("url")).alias("h"),
        U.url_path(F.col("url")).alias("p"),
        U.url_normalize(F.col("url")).alias("n"),
        U.registrable_domain(U.url_host(F.col("url"))).alias("d"),
    ).collect()}
    r = rows["https://Example.COM/path/page?a=1&utm_source=x&b=2#frag"]
    assert (r.s, r.h, r.p) == ("https", "example.com", "/path/page")
    assert r.n == "https://example.com/path/page?a=1&b=2"
    assert r.d == "example.com"
    assert rows["http://example.com:80/"].n == "http://example.com/"
    assert rows["https://example.com:443/x"].n == "https://example.com/x"
    assert rows["https://example.com:8443/x?utm_campaign=y"].n == \
        "https://example.com:8443/x"
    r = rows["http://user:pw@sub.Example.co.uk:8080/a/b?fbclid=z&q=ok"]
    assert r.h == "sub.example.co.uk"
    assert r.n == "http://sub.example.co.uk:8080/a/b?q=ok"
    assert r.d == "example.co.uk"
    assert rows["https://a.b.c.example.com/deep?gclid=1&msclkid=2&mc_eid=3"] \
        .d == "example.com"
    assert rows["https://example.com"].n == "https://example.com/"
    assert rows["https://example.com/?"].n == "https://example.com/"
    assert rows["https://example.gov.au/svc?x=1&y=2"].d == "example.gov.au"
    assert rows["not a url at all"].s == ""


def test_duckdb_twin_parity(spark, df):
    got = df.select(
        U.url_scheme(F.col("url")).alias("s"),
        U.url_host(F.col("url")).alias("h"),
        U.url_path(F.col("url")).alias("p"),
        U.url_query(F.col("url")).alias("q"),
        U.url_normalize(F.col("url")).alias("n"),
        U.registrable_domain(U.url_host(F.col("url"))).alias("d"),
    ).collect()
    con = duckdb.connect()
    for url, row in zip(URLS, got):
        sql = (
            f"SELECT {U.url_scheme_sql('u')}, {U.url_host_sql('u')}, "
            f"{U.url_path_sql('u')}, {U.url_query_sql('u')}, "
            f"{U.url_normalize_sql('u')}, "
            f"{U.registrable_domain_sql(U.url_host_sql('u'))} "
            f"FROM (SELECT ? AS u)"
        )
        want = con.execute(sql, [url]).fetchone()
        assert tuple(row) == tuple(want), url
