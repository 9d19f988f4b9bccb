"""Tests for the session's corpus-prep additions: substring (repeated-span)
dedup, C4 heuristic cleaning, TF-IDF / BM25 ranking, SemDeDup."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ------------------------------------------------------------ substring dedup

def test_substring_dedup_removes_second_occurrence(spark):
    from duckdb_spatial_spark.operators.dedup import substring_dedup

    span = "a b c d"  # k=4 span shared by docs 1 and 2
    df = spark.createDataFrame(
        [(1, f"x {span} y"), (2, f"p q {span} r"), (3, "u v w z")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           substring_dedup(df, "doc_id", "text", k=4).collect()}
    # doc 1 holds the canonical (first) occurrence — untouched
    assert out[1].text == f"x {span} y"
    assert out[1].n_removed == 0
    # doc 2's copy is excised, surrounding words survive
    assert out[2].text == "p q r"
    assert out[2].n_removed == 4
    # doc 3 shares nothing
    assert out[3].text == "u v w z"
    assert out[3].n_removed == 0


def test_substring_dedup_internal_repeat_and_short_doc(spark):
    from duckdb_spatial_spark.operators.dedup import substring_dedup

    df = spark.createDataFrame(
        [(1, "m n o p QQ m n o p"),  # same 4-window twice within one doc
         (2, "t u")],                # shorter than k: no windows at all
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           substring_dedup(df, "doc_id", "text", k=4).collect()}
    assert out[1].text == "m n o p qq"
    assert out[1].n_removed == 4
    assert out[2].text == "t u"
    assert out[2].n_removed == 0


def test_substring_dedup_overlapping_spans_union(spark):
    from duckdb_spatial_spark.operators.dedup import substring_dedup

    # doc 2 repeats a 5-word run of doc 1 → two overlapping duplicated
    # 4-windows in doc 2; their kill ranges union to the whole run
    df = spark.createDataFrame(
        [(1, "a b c d e tail1"), (2, "head a b c d e")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           substring_dedup(df, "doc_id", "text", k=4).collect()}
    assert out[1].n_removed == 0
    assert out[2].text == "head"
    assert out[2].n_removed == 5


def test_substring_dedup_sql_twin_parity(spark):
    """Operator vs its DuckDB twin on the real documents table — also the
    xxhash64-vs-gram-string collision check."""
    from duckdb_spatial_spark.operators.dedup import (substring_dedup,
                                                      substring_dedup_sql)

    docs = spark.read.parquet(SF_DIR + "/documents.parquet")
    got = {r.doc_id: (r.text, r.n_words, r.n_removed)
           for r in substring_dedup(docs, "doc_id", "text", k=8)
           .select("doc_id", "text", "n_words", "n_removed").collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = {r[0]: (r[1], r[2], r[3])
            for r in con.sql(substring_dedup_sql("documents", k=8)).fetchall()}
    assert got == want
    assert sum(v[2] for v in got.values()) > 0  # dedup actually fired


# ------------------------------------------------------------ C4 cleaning

def test_c4_line_and_page_rules(spark):
    from duckdb_spatial_spark.operators.pipeline import c4_clean

    # published C4 rules (Raffel et al. 2020 §2.2): lines need a terminal
    # punctuation mark AND >= 5 words; pages need >= 3 surviving lines
    good = "\n".join(f"alpha beta gamma delta line{i}." for i in range(5))
    two = "alpha beta gamma delta one.\nalpha beta gamma delta two."
    pages = [
        (1, good),                                    # keeps all 5 lines
        (2, good + "\nno terminal punct here"),       # line dropped, page ok
        (3, good + "\nshort words here."),            # <5 words line dropped
        (4, good + "\nuses javascript everywhere ok more."),  # js line out
        (5, good.replace("line4.", "line4")),         # 4 lines >= 3 → kept
        (6, good + "\nlorem ipsum dolor sit."),       # page blocklisted
        (7, good + "\ncss { color: red; }"),          # '{' → page out
        (8, two),                                     # 2 lines < 3 → page out
    ]
    df = spark.createDataFrame(pages, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_clean(df).collect()}
    assert out[1].c4_keep and out[1].n_lines_kept == 5
    assert out[2].c4_keep and out[2].n_lines_kept == 5
    assert out[3].c4_keep and out[3].n_lines_kept == 5
    assert out[4].c4_keep and out[4].n_lines_kept == 5
    assert out[5].c4_keep and out[5].n_lines_kept == 4
    assert not out[6].c4_keep          # blocklist hits the raw page
    assert not out[7].c4_keep
    assert not out[8].c4_keep and out[8].n_lines_kept == 2
    assert out[2].clean_text == good


def test_c4_sql_twin_parity(spark):
    from duckdb_spatial_spark.operators.pipeline import c4_clean, c4_clean_sql

    rows = [
        (1, 'one two three.\nfour five six!\nseven eight nine?\n'
            'ten eleven twelve."\na b c.\nno punct line'),
        (2, 'tiny.\nlorem ipsum x y z.'),
        (3, 'brace { here }.\nalpha beta gamma.'),
        (4, ''),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_lines, r.n_lines_kept, r.c4_keep)
           for r in c4_clean(df).collect()}
    con = duckdb.connect()
    con.sql("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    c4 = c4_clean_sql("text")
    want = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.sql(
        f"SELECT doc_id, {c4['clean_text']}, {c4['n_lines']},"
        f" {c4['n_lines_kept']}, {c4['c4_keep']} FROM t").fetchall()}
    assert got == want


# ------------------------------------------------------------ TF-IDF / BM25

def _toy_corpus(spark):
    return spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple date")],
        "doc_id long, text string",
    )


def test_tf_idf_values(spark):
    from duckdb_spatial_spark.operators.rank import tf_idf

    out = {(r.doc_id, r.term): r for r in _toy_corpus(spark)
           .transform(lambda d: tf_idf(d)).collect()}
    n = 3
    assert out[(1, "apple")].tf == 2
    assert out[(1, "apple")].dfreq == 2
    exp = 2 * (math.log((1 + n) / (1 + 2)) + 1)
    assert out[(1, "apple")].score == pytest.approx(exp, rel=1e-12)
    exp_cherry = 1 * (math.log((1 + n) / (1 + 1)) + 1)
    assert out[(2, "cherry")].score == pytest.approx(exp_cherry, rel=1e-12)


def test_bm25_values_and_topk_determinism(spark):
    from duckdb_spatial_spark.operators.rank import bm25, bm25_topk

    out = {(r.doc_id, r.term): r for r in bm25(_toy_corpus(spark)).collect()}
    n, k1, b = 3, 1.2, 0.75
    avgdl = (3 + 2 + 2) / 3
    r = out[(1, "apple")]
    assert r.dl == 3
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))
    exp = idf * 2 * (k1 + 1) / (2 + k1 * (1 - b + b * 3 / avgdl))
    assert r.score == pytest.approx(exp, rel=1e-12)
    top = bm25_topk(_toy_corpus(spark), k=1).collect()
    assert {(t.doc_id, t.rank) for t in top} == {(1, 1), (2, 1), (3, 1)}
    by_doc = {t.doc_id: t.term for t in top}
    # doc 2: banana (df 2) vs cherry (df 1) — cherry is rarer → wins
    assert by_doc[2] == "cherry"


def test_tf_idf_topk_tie_break_on_term(spark):
    from duckdb_spatial_spark.operators.rank import tf_idf_topk

    df = spark.createDataFrame(
        [(1, "zebra apple"), (2, "zebra apple")], "doc_id long, text string"
    )
    # both terms have identical tf and df in both docs → identical scores;
    # the term-asc tie-break must pick 'apple' first, deterministically
    top = tf_idf_topk(df, k=1).collect()
    assert {(r.doc_id, r.term) for r in top} == {(1, "apple"), (2, "apple")}


# ------------------------------------------------------------ SemDeDup

def test_semdedup_drops_later_near_duplicates(spark):
    import numpy as np

    from duckdb_spatial_spark.operators.similarity import semdedup

    base = np.eye(4)
    rows = [
        (0, base[0].tolist()),
        (1, (base[0] * 0.99 + base[1] * 0.01).tolist()),  # ~dup of 0
        (2, base[1].tolist()),
        (3, base[2].tolist()),
        (4, (base[0] * 0.98 + base[3] * 0.02).tolist()),  # ~dup of 0 too
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = np.eye(4)  # one centroid per axis → 0,1,4 share a cell
    kept = sorted(r.vec_id for r in
                  semdedup(df, threshold=0.95, centroids=C).collect())
    assert kept == [0, 2, 3]
    flagged = {r.vec_id: r.semdedup_drop for r in
               semdedup(df, threshold=0.95, centroids=C,
                        mode="flag").collect()}
    assert flagged == {0: False, 1: True, 2: False, 3: False, 4: True}


def test_semdedup_cross_cluster_pairs_not_compared(spark):
    import numpy as np

    from duckdb_spatial_spark.operators.similarity import semdedup

    # two identical vectors assigned to DIFFERENT cells never pair — the
    # documented cluster-local approximation of SemDeDup
    rows = [(0, [1.0, 0.001]), (1, [1.0, -0.001])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = np.array([[1.0, 1.0], [1.0, -1.0]])
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    kept = sorted(r.vec_id for r in
                  semdedup(df, threshold=0.5, centroids=C).collect())
    assert kept == [0, 1]


def test_semdedup_trained_centroids_smoke(spark):
    from duckdb_spatial_spark.operators.similarity import semdedup

    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    out = semdedup(emb, threshold=0.45, n_centroids=8)
    assert out.count() <= emb.count()


def test_corpus_divergence_properties(spark):
    """KL ≥ 0, = 0 for identical corpora; JS symmetric and bounded by
    ln 2; drift between disjoint-vocabulary corpora is large."""
    from duckdb_spatial_spark.operators.textops import corpus_divergence
    import math

    a = spark.createDataFrame(
        [(1, "apple banana cherry apple"), (2, "banana apple")],
        "id long, text string")
    same = corpus_divergence(a, a).collect()[0]
    assert abs(same["kl_ab"]) < 1e-12 and abs(same["js"]) < 1e-12
    b = spark.createDataFrame(
        [(1, "xylophone zebra quartz"), (2, "zebra quartz")],
        "id long, text string")
    drift = corpus_divergence(a, b).collect()[0]
    assert drift["kl_ab"] > 0.5 and drift["kl_ba"] > 0.5
    assert 0.0 < drift["js"] <= math.log(2) + 1e-9
    sym = corpus_divergence(b, a).collect()[0]
    assert abs(sym["js"] - drift["js"]) < 1e-9
