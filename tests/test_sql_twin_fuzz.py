"""Randomized cross-engine parity for the SQL-twin operators: Spark (Java
regex) vs DuckDB (RE2) must agree byte-for-byte on html_to_text,
url_normalize/host/domain, and quality_score — these twins ARE the oracle
definitions for q82/q83/q84, so any engine divergence is a correctness gap.

Seeded RNG (no hypothesis-Spark churn): one batched DataFrame per family.
"""
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators import urlops as U
from duckdb_spatial_spark.operators.textops import (html_to_text,
                                                    html_to_text_sql,
                                                    quality_score,
                                                    quality_score_sql)

N = 300


def _con():
    return duckdb.connect()


def test_html_to_text_fuzz_parity(spark):
    rng = random.Random(42)
    frags = [
        "<p>", "</p>", "<div class='x'>", "</div>", "<br>", "<BR/>",
        "<script>", "</script>", "<ScRiPt type=x>", "</sCrIpT >",
        "<style>", "</style>", "<title>", "</title>", "<!--", "-->",
        "&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&apos;", "&nbsp;",
        "&amp;lt;", "plain", "words", "  ", "\t", "\n", "<", ">", "&",
        "é", "中文", "'", '"', "a<b", "x>y", "<tag attr=\">\">",
        "<unclosed", "1234", ".,;:!?",
    ]
    samples = [
        "".join(rng.choice(frags) for _ in range(rng.randint(0, 25)))
        for _ in range(N)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "h string")
    got = [r.t for r in
           df.select(html_to_text(F.col("h")).alias("t")).collect()]
    con = _con()
    sql = f"SELECT {html_to_text_sql('?')}"
    for s, g in zip(samples, got):
        assert g == con.execute(sql, [s]).fetchone()[0], repr(s)


def test_url_twins_fuzz_parity(spark):
    rng = random.Random(7)
    schemes = ["http", "https", "HTTPS", "ftp", "s3"]
    hosts = ["Example.COM", "a.b.co.uk", "x.example.gov.au", "localhost",
             "sub.Example.org", "a.b.c.d.e.net", "xn--kva.de", "no-dot"]
    ports = ["", ":80", ":443", ":8080", ":0"]
    users = ["", "user@", "u:p@"]
    paths = ["", "/", "/a/b", "/a%20b", "/trailing/"]
    queries = ["", "?", "?a=1", "?utm_source=x", "?a=1&utm_medium=y&b=2",
               "?fbclid=z", "?gclid=1&mc_eid=2&q=ok", "?&&a=1"]
    frags = ["", "#", "#frag", "#a?b"]
    samples = []
    for _ in range(N):
        samples.append(
            rng.choice(schemes) + "://" + rng.choice(users)
            + rng.choice(hosts) + rng.choice(ports) + rng.choice(paths)
            + rng.choice(queries) + rng.choice(frags))
    samples += ["", "no url", "http:/broken", "://nohost", "a b c"]
    df = spark.createDataFrame([(s,) for s in samples], "u string")
    got = df.select(
        U.url_scheme(F.col("u")).alias("s"),
        U.url_host(F.col("u")).alias("h"),
        U.url_path(F.col("u")).alias("p"),
        U.url_query(F.col("u")).alias("q"),
        U.url_normalize(F.col("u")).alias("n"),
        U.registrable_domain(U.url_host(F.col("u"))).alias("d"),
    ).collect()
    con = _con()
    sql = (f"WITH t(u) AS (SELECT ?) "
           f"SELECT {U.url_scheme_sql('u')}, {U.url_host_sql('u')}, "
           f"{U.url_path_sql('u')}, {U.url_query_sql('u')}, "
           f"{U.url_normalize_sql('u')}, "
           f"{U.registrable_domain_sql(U.url_host_sql('u'))} FROM t")
    for s, row in zip(samples, got):
        want = con.execute(sql, [s]).fetchone()
        assert tuple(row) == tuple(want), repr(s)


def test_quality_score_fuzz_parity(spark):
    rng = random.Random(99)
    words = ["the", "and", "data", "spark", "row", "batch", "x1", "9",
             "...", "!!!", "a", "supercalifragilistic", "中文", "",
             "UPPER", "miXed", "12.5%", "end."]
    samples = [
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 60)))
        for _ in range(N)
    ]
    samples += ["", " ", "a" * 250, ("w " * 6000).strip()]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r.q for r in
           df.select(quality_score(F.col("t")).alias("q")).collect()]
    con = _con()
    sql = f"WITH t(x) AS (SELECT ?) SELECT {quality_score_sql('x')} FROM t"
    for s, g in zip(samples, got):
        want = con.execute(sql, [s]).fetchone()[0]
        assert g == pytest.approx(want, abs=1e-12), repr(s[:60])


def test_char_entropy_fuzz_parity(spark):
    """char_entropy_per_doc vs its DuckDB twin on adversarial strings
    (runs, unicode, whitespace-only, empties, long alphabets)."""
    rng = random.Random(13)
    alphabets = ["a", "ab", "abc", "abcdefgh", " .,!?", "é中ß", "a b\tc\n"]
    samples = [""]
    for _ in range(150):
        alpha = rng.choice(alphabets)
        samples.append("".join(rng.choice(alpha)
                               for _ in range(rng.randint(0, 80))))
    from duckdb_spatial_spark.operators.textops import (char_entropy_per_doc,
                                                        char_entropy_sql)

    rows = [(i, s) for i, s in enumerate(samples)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["entropy"]
           for r in char_entropy_per_doc(df).collect()}
    con = _con()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    want = dict(con.execute(
        char_entropy_sql("docs", "doc_id", "text")).fetchall())
    assert set(got) == set(want)
    for k in got:
        assert abs(got[k] - want[k]) < 1e-9, (k, repr(samples[k]))


def test_bpe_twin_fuzz_parity(spark):
    """bpe_doc_tokens_sql vs the Python train+apply on random small
    corpora — greedy runs, repeated words, single-char words, empties."""
    rng = random.Random(99)
    words = ["a", "aa", "aaa", "ab", "ba", "abab", "banana", "bandana",
             "x", "xyzzy", "na"]
    from duckdb_spatial_spark.operators.tokenize import (
        apply_bpe, bpe_doc_tokens_sql, train_bpe, word_frequencies)

    for trial in range(3):
        rows = [(i, " ".join(rng.choice(words)
                             for _ in range(rng.randint(0, 9))))
                for i in range(25)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        wf = [(r.word, r.freq) for r in
              word_frequencies(df, "text", max_words=50).collect()]
        merges = train_bpe(wf, num_merges=15)
        tok = apply_bpe(df, "text", merges)
        want = {r["doc_id"]: r["nt"] for r in tok.select(
            "doc_id", F.size("tokens").alias("nt")).collect()}
        con = _con()
        con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
        got = {d: n for d, n, _f in con.execute(
            bpe_doc_tokens_sql("docs", "text", "doc_id",
                               num_merges=15, max_words=50)).fetchall()}
        assert got == want, trial
