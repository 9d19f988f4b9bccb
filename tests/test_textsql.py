"""SQL-surface parity: the CREATE FUNCTION bodies must equal the Column
API on every sample (same constants, same engine)."""
from pyspark.sql import functions as F

from duckdb_spatial_spark.functions.textsql import register_text_sql_functions
from duckdb_spatial_spark.operators import urlops as U
from duckdb_spatial_spark.operators.textops import (clean_text, escape_html,
                                                    html_to_text,
                                                    split_sentences)

HTML = [
    "<html><body><p>hello &amp; bye</p><script>x('<p>')</script></body>",
    "<ScRiPt>a</ScRiPt>kept<style>s{}</style><!-- c -->",
    "plain & <unclosed",
    "",
]
URLS = [
    "https://Example.COM:443/p?a=1&utm_source=x#f",
    "http://u@sub.example.co.uk:8080/a?fbclid=1&q=2",
    "ftp://files.example.org/x",
    "not a url",
]


def test_sql_functions_match_column_api(spark):
    register_text_sql_functions(spark)
    df = spark.createDataFrame([(h, u) for h, u in zip(HTML, URLS)],
                               "h string, u string")
    df.createOrReplaceTempView("tv")
    got = spark.sql("""
        SELECT html_to_text(h) AS ht, escape_html(h) AS eh,
               clean_text_ascii(h) AS ct, split_sentences(h) AS ss,
               url_scheme(u) AS us, url_host(u) AS uh, url_path(u) AS up,
               url_query(u) AS uq, url_normalize(u) AS un,
               registrable_domain(url_host(u)) AS ud
        FROM tv
    """).collect()
    want = df.select(
        html_to_text(F.col("h")).alias("ht"),
        escape_html(F.col("h")).alias("eh"),
        clean_text(F.col("h"), nfc=False).alias("ct"),
        split_sentences(F.col("h")).alias("ss"),
        U.url_scheme(F.col("u")).alias("us"),
        U.url_host(F.col("u")).alias("uh"),
        U.url_path(F.col("u")).alias("up"),
        U.url_query(F.col("u")).alias("uq"),
        U.url_normalize(F.col("u")).alias("un"),
        U.registrable_domain(U.url_host(F.col("u"))).alias("ud"),
    ).collect()
    for g, w in zip(got, want):
        assert tuple(g) == tuple(w)
    # registration is idempotent
    register_text_sql_functions(spark)
