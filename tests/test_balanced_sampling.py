"""cluster_balanced_sample + group_sample: determinism, balance,
bounded-pool semantics."""
import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators import (cluster_balanced_sample,
                                            group_sample)


def test_group_sample_exact_k_and_deterministic(spark):
    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("g"))
    a = group_sample(df, "g", k=5, id_col="doc_id", seed=2)
    rows = a.collect()
    per = {}
    for r in rows:
        per.setdefault(r["g"], []).append(r["rk"])
    assert set(per) == {"0", "1", "2", "3"}
    for g, rks in per.items():
        assert sorted(rks) == [1, 2, 3, 4, 5]
    b = {(r["doc_id"], r["g"], r["rk"]) for r in
         group_sample(df, "g", k=5, id_col="doc_id", seed=2).collect()}
    assert {(r["doc_id"], r["g"], r["rk"]) for r in rows} == b
    c = {(r["doc_id"], r["g"], r["rk"]) for r in
         group_sample(df, "g", k=5, id_col="doc_id", seed=3).collect()}
    assert b != c


def test_group_sample_small_group(spark):
    # a group smaller than k yields all its rows, ranked
    df = spark.createDataFrame(
        [(i, "big") for i in range(200)] + [(1000, "tiny"), (1001, "tiny")],
        "doc_id long, g string")
    out = group_sample(df, "g", k=10, id_col="doc_id", seed=0,
                       oversample=50.0)
    tiny = sorted(r["rk"] for r in out.collect() if r["g"] == "tiny")
    assert tiny == [1, 2]


def test_cluster_balanced_sample_balances_skew(spark):
    # two well-separated clusters with 10:1 mass skew -> equal k each
    rng = np.random.RandomState(0)
    rows = []
    for i in range(440):
        base = np.array([10.0, 0.0]) if i < 400 else np.array([0.0, 10.0])
        v = base + rng.normal(0, 0.1, 2)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = np.array([[10.0, 0.0], [0.0, 10.0]])
    out = cluster_balanced_sample(df, "vec_id", "embedding",
                                  centroids=C, k=6, seed=1,
                                  oversample=8.0)
    got = out.collect()
    per = {}
    for r in got:
        per.setdefault(r["cluster"], set()).add(r["vec_id"])
    assert set(per) == {0, 1}
    assert len(per[0]) == 6 and len(per[1]) == 6
    # members actually belong to the cluster they were sampled from
    assert all(v < 400 for v in per[0]) and all(v >= 400 for v in per[1])


def test_token_budget_mix(spark):
    from duckdb_spatial_spark.operators import token_budget_mix

    rows = ([(i, "big", "one two three four") for i in range(500)]
            + [(1000 + i, "small", "a b") for i in range(10)]
            + [(2000, "empty", "")])
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = token_budget_mix(df, "source",
                            budgets={"big": 200.0},
                            id_col="doc_id", text_col="text",
                            seed=1, default_budget=1_000_000.0)
    got = {r["source"]: r for r in
           kept.groupBy("source").agg(
               F.count("*").alias("n"),
               F.sum("tokens").alias("tok"),
               F.max("keep_frac").alias("f")).collect()}
    # big: 2000 tokens total, budget 200 -> f = 0.1, ~50 docs in expectation
    assert abs(got["big"]["f"] - 0.1) < 1e-12
    assert 20 <= got["big"]["n"] <= 90
    # small: under budget -> passes whole at f == 1.0
    assert got["small"]["n"] == 10 and got["small"]["f"] == 1.0
    # zero-token domain: f = 0, dropped entirely
    assert "empty" not in got
    # deterministic
    a = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in token_budget_mix(
        df, "source", budgets={"big": 200.0}, id_col="doc_id",
        text_col="text", seed=1, default_budget=1_000_000.0).collect())
    assert a == b


def test_ngram_novelty(spark):
    from duckdb_spatial_spark.operators import ngram_novelty

    rows = [
        (1, "a b c d e f g h unique tail one"),    # shares the 8-gram head
        (2, "a b c d e f g h unique tail two"),    # with doc 1
        (3, "totally different words in this doc span here"),
        (4, "tiny"),                                # < n words: one gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           ngram_novelty(df, n=8, rare_max_df=1).collect()}
    assert set(got) == {1, 2, 3, 4}
    # docs 1/2 share every gram except the last (they differ only at
    # the final word): 4 grams, exactly 1 unique each
    assert got[1]["n_grams"] == 4 and got[1]["n_rare"] == 1
    assert got[2]["n_rare"] == 1
    assert got[3]["novelty"] == 1.0
    assert got[4]["n_grams"] == 1 and got[4]["novelty"] == 1.0


def test_collocations_pmi(spark):
    import math

    from duckdb_spatial_spark.operators.textops import collocations

    # "alpha beta" always adjacent; "noise" words are independent
    rows = [(i, "alpha beta x" + str(i % 7) + " y" + str(i % 3))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["pair"]: r for r in
           collocations(df, "text", min_count=5, k=50).collect()}
    assert "alpha beta" in got
    r = got["alpha beta"]
    # c_ab=60, N2=180, c_a=c_b=60, N1=240
    want = math.log((60 / 180) / ((60 / 240) * (60 / 240)))
    assert abs(r["pmi"] - round(want, 6)) < 1e-9 and r["c_ab"] == 60
    # the strongly-associated pair beats every frequency-driven one
    assert r["pmi"] == max(v["pmi"] for v in got.values())


def test_weighted_sample(spark):
    from duckdb_spatial_spark.operators import weighted_sample

    # one giant-weight row must essentially always be picked into top-k;
    # zero/negative weights are excluded; deterministic across runs
    rows = [(i, 1.0) for i in range(200)] + [(900, 1e9), (901, 0.0),
                                             (902, -3.0)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = weighted_sample(df, "w", k=10, id_col="doc_id", seed=4).collect()
    ids = [r["doc_id"] for r in a]
    assert 900 in ids and 901 not in ids and 902 not in ids
    assert len(a) == 10
    b = weighted_sample(df, "w", k=10, id_col="doc_id", seed=4).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    c = [r["doc_id"] for r in
         weighted_sample(df, "w", k=10, id_col="doc_id", seed=5).collect()]
    assert ids != c


def test_collocations_short_docs(spark):
    """Docs with 0/1 tokens must not crash the pair explode (sequence
    steps DOWN when start > stop → element_at index 0) and their words
    still count toward the unigram totals."""
    import math

    from duckdb_spatial_spark.operators.textops import collocations

    rows = [(i, "alpha beta") for i in range(10)]
    rows += [(100, "solo"), (101, ""), (102, "   "), (103, "alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["pair"]: r for r in
           collocations(df, "text", min_count=5, k=10).collect()}
    assert set(got) == {"alpha beta"}
    r = got["alpha beta"]
    # c_ab=10, N2=10; unigrams INCLUDE the short docs:
    # c_alpha=11, c_beta=10, N1=22 ("solo" + "alpha" count, blanks don't)
    want = math.log((10 / 10) / ((11 / 22) * (10 / 22)))
    assert r["c_ab"] == 10
    assert abs(r["pmi"] - round(want, 6)) < 1e-9
