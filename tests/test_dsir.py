"""DSIR importance resampling (operators/dsir.py): semantics, portable
bucket-hash parity with DuckDB, and Spark-vs-SQL-twin log-weight parity.

The driver-facing oracle (q105) re-checks the full pipeline against
testdata; these tests pin the pieces on small controlled corpora so a
regression localizes.
"""
import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators import dsir


def _con():
    return duckdb.connect()


# --------------------------------------------------------------------------
# bucket hash
# --------------------------------------------------------------------------

def test_hashed_bucket_range_and_parity(spark):
    rng = random.Random(7)
    words = ["alpha", "beta", "gamma", "中文", "é", "x y", "", "a" * 40]
    samples = list({
        " ".join(rng.choice(words) for _ in range(rng.randint(1, 4)))
        for _ in range(200)
    })
    for buckets in (1, 16, 2048, 65536):
        df = spark.createDataFrame([(s,) for s in samples], "g string")
        got = dict(
            df.select("g", dsir.hashed_bucket(F.col("g"), buckets)
                      .alias("b")).collect()
        )
        con = _con()
        sql = (f"SELECT {dsir.bucket_sql('g', buckets)} "
               f"FROM (SELECT ? AS g)")
        for s in samples:
            want = con.execute(sql, [s]).fetchone()[0]
            assert got[s] == want, (s, buckets)
            assert 0 <= got[s] < buckets


def test_hashed_bucket_rejects_wide():
    with pytest.raises(ValueError):
        dsir.hashed_bucket(F.lit("x"), 65537)


# --------------------------------------------------------------------------
# gram bag
# --------------------------------------------------------------------------

def test_doc_bucket_counts_uni_and_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, "solo")], "doc_id long, text string"
    )
    out = dsir.doc_bucket_counts(df, buckets=65536)
    rows = out.groupBy("doc_id").agg(F.sum("cnt").alias("n")).collect()
    got = {r.doc_id: r.n for r in rows}
    # doc 1: unigrams a,b,a + bigrams "a b","b a" = 5; doc 2 empty → no
    # rows; doc 3: one unigram, no bigrams
    assert got == {1: 5, 3: 1}


def test_doc_bucket_counts_no_bigrams(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    out = dsir.doc_bucket_counts(df, buckets=65536, bigrams=False)
    assert out.agg(F.sum("cnt")).collect()[0][0] == 3


# --------------------------------------------------------------------------
# log-weights: semantics + SQL-twin parity
# --------------------------------------------------------------------------

def _toy_corpus():
    rng = random.Random(11)
    target_vocab = ["theorem", "proof", "lemma", "axiom", "integral"]
    noise_vocab = ["pizza", "goal", "match", "score", "team"]

    def doc(vocab, n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    rows = []
    for i in range(20):
        vocab = target_vocab if i % 2 == 0 else noise_vocab
        rows.append((i, doc(vocab, rng.randint(5, 15))))
    tgt = [(100 + i, doc(target_vocab, 10)) for i in range(10)]
    return rows, tgt


def test_dsir_prefers_target_like_docs(spark):
    rows, tgt = _toy_corpus()
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(tgt, "doc_id long, text string")
    top = dsir.dsir_sample(raw, target, k=8, buckets=2048).collect()
    ids = [r.doc_id for r in top]
    # even ids are math-vocab (target-like) docs
    assert all(i % 2 == 0 for i in ids), ids
    # weights are descending
    keys = [r.key for r in top]
    assert keys == sorted(keys, reverse=True)


def test_dsir_logw_sql_twin_parity(spark):
    rows, tgt = _toy_corpus()
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(tgt, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.logw)
        for r in dsir.dsir_log_weights(raw, target, buckets=512,
                                       alpha=0.5).collect()
    }
    con = _con()
    con.execute(
        "CREATE TABLE raw_docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {s!r})" for i, s in rows)
        + ") t(doc_id, text)"
    )
    con.execute(
        "CREATE TABLE tgt_docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {s!r})" for i, s in tgt)
        + ") t(doc_id, text)"
    )
    want = con.execute(
        dsir.dsir_logw_sql("raw_docs", "tgt_docs", "doc_id", "text",
                           buckets=512, alpha=0.5)
    ).fetchall()
    assert len(want) == len(got)
    for doc_id, n_grams, logw in want:
        gn, gl = got[doc_id]
        assert gn == n_grams
        assert math.isclose(gl, logw, rel_tol=1e-9, abs_tol=1e-9)


def test_dsir_gumbel_sample_replayable(spark):
    rows, tgt = _toy_corpus()
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(tgt, "doc_id long, text string")
    a = dsir.dsir_sample(raw, target, k=5, buckets=512, gumbel_seed=3,
                         temperature=2.0).collect()
    b = dsir.dsir_sample(raw, target, k=5, buckets=512, gumbel_seed=3,
                         temperature=2.0).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]
    # a different seed perturbs the draw but stays deterministic
    c = dsir.dsir_sample(raw, target, k=5, buckets=512, gumbel_seed=4,
                         temperature=2.0).collect()
    assert len(c) == 5
