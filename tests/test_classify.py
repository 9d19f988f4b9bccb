"""Multinomial NB quality classifier (operators/classify.py): separation
semantics, smoothing-floor decomposition, and Spark-vs-SQL-twin parity.
"""
import math
import random

import duckdb

from pyspark.sql import functions as F

from duckdb_spatial_spark.operators import classify


def _corpus():
    rng = random.Random(5)
    good = ["theorem", "proof", "integral", "matrix", "vector"]
    bad = ["click", "subscribe", "free", "winner", "prize"]

    def doc(vocab, n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    train = [(i, doc(good if i % 2 == 0 else bad, rng.randint(6, 14)),
              i % 2 == 0) for i in range(30)]
    score = [(100 + i, doc(good if i % 2 == 0 else bad, rng.randint(6, 14)))
             for i in range(16)]
    return train, score


def test_nb_separates_classes(spark):
    train, score = _corpus()
    tdf = spark.createDataFrame(train, "doc_id long, text string, label boolean")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    model, stats = classify.nb_train(tdf, buckets=1024)
    assert stats["n_pos"] == 15 and stats["n_neg"] == 15
    got = {r.doc_id: r.nb_score
           for r in classify.nb_score(sdf, model, stats).collect()}
    for i, _t in score:
        if i % 2 == 0:
            assert got[i] > 0, (i, got[i])
        else:
            assert got[i] < 0, (i, got[i])


def test_nb_untrained_bucket_is_floor_exact(spark):
    # a score doc made ONLY of unseen grams must land exactly on
    # prior + n_grams * floor (the delta cancels to literal 0.0)
    tdf = spark.createDataFrame(
        [(1, "aaa bbb", True), (2, "ccc ddd", False)],
        "doc_id long, text string, label boolean")
    sdf = spark.createDataFrame([(9, "zzz yyy xxx")],
                                "doc_id long, text string")
    model, stats = classify.nb_train(tdf, buckets=512)
    row = classify.nb_score(sdf, model, stats).collect()[0]
    a, ab = stats["alpha"], stats["alpha"] * 512
    floor = (math.log(a) - math.log(stats["tot_pos"] + ab)) \
        - (math.log(a) - math.log(stats["tot_neg"] + ab))
    prior = math.log(stats["n_pos"] + 1.0) - math.log(stats["n_neg"] + 1.0)
    # 3 unigrams + 2 bigrams = 5 grams
    assert row.n_grams == 5
    assert math.isclose(row.nb_score, prior + 5 * floor,
                        rel_tol=1e-9, abs_tol=1e-9)


def test_nb_sql_twin_parity(spark):
    train, score = _corpus()
    tdf = spark.createDataFrame(train, "doc_id long, text string, label boolean")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    model, stats = classify.nb_train(tdf, buckets=256, alpha=0.5)
    got = {r.doc_id: (r.n_grams, r.nb_score)
           for r in classify.nb_score(sdf, model, stats).collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE tr AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {s!r}, {l})" for i, s, l in train)
        + ") t(doc_id, text, label)"
    )
    con.execute(
        "CREATE TABLE sc AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {s!r})" for i, s in score)
        + ") t(doc_id, text)"
    )
    want = con.execute(classify.nb_score_sql(
        "tr", "sc", "label", "doc_id", "text", buckets=256, alpha=0.5,
    )).fetchall()
    assert len(want) == len(got)
    for doc_id, n_grams, sc in want:
        gn, gs = got[doc_id]
        assert gn == n_grams
        assert math.isclose(gs, sc, rel_tol=1e-9, abs_tol=1e-9), doc_id
