"""Product quantization: encode correctness, ADC vs exact, IVF-PQ tier."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.pq import (ann_ivfpq_topk, ann_pq_topk,
                                               pq_codebook_df, pq_encode,
                                               subvectors_from_rows, train_pq)

D, M, KS = 32, 4, 16


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.RandomState(5)
    # 6 well-separated cluster centers + noise → PQ can actually rank
    centers = rng.randn(6, D) * 5
    X = np.vstack([
        centers[i % 6] + rng.randn(D) * 0.3 for i in range(400)
    ])
    return X


@pytest.fixture(scope="module")
def corpus(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<double>")


def _brute_l2_topk(vecs, q, k):
    d2 = ((vecs - q[None, :]) ** 2).sum(axis=1)
    return list(np.argsort(d2, kind="stable")[:k])


def test_encode_matches_numpy_argmin(spark, corpus, vecs):
    books = train_pq(corpus, "embedding", m=M, ks=KS, iters=0)
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(corpus, "embedding", books).collect()
    }
    subs = vecs.reshape(len(vecs), M, D // M)
    for i in range(0, 400, 37):
        for j in range(M):
            d2 = ((subs[i, j][None, :] - books[j]) ** 2).sum(axis=1)
            assert got[i][j] == int(d2.argmin())


def test_trained_codebooks_reduce_distortion(spark, corpus, vecs):
    b0 = train_pq(corpus, "embedding", m=M, ks=KS, iters=0)
    b8 = train_pq(corpus, "embedding", m=M, ks=KS, iters=8)

    def distortion(books):
        codes = {r["vec_id"]: r["pq_code"] for r in
                 pq_encode(corpus, "embedding", books).collect()}
        subs = vecs.reshape(len(vecs), M, D // M)
        return sum(
            ((subs[i, j] - books[j][codes[i][j]]) ** 2).sum()
            for i in range(len(vecs)) for j in range(M))

    assert distortion(b8) < distortion(b0)


def test_adc_topk_recall_vs_exact(spark, corpus, vecs):
    books = train_pq(corpus, "embedding", m=M, ks=KS, iters=8)
    queries = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(5)],
        "query_id long, query_vec array<double>")
    res = ann_pq_topk(corpus, queries, books, k=10).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    # PQ quantization collapses same-cluster points onto near-equal codes,
    # so fine ordering inside a cluster is not guaranteed — the contract is
    # CLUSTER-level: every retrieved neighbor comes from the query's own
    # (well-separated) cluster, same as the exact top-10 does.
    for q in range(5):
        exact_clusters = {i % 6 for i in _brute_l2_topk(vecs, vecs[q], 10)}
        got_clusters = {int(v) % 6 for v in by_q[q]}
        assert got_clusters == exact_clusters == {q % 6}
    # rank 1 must be the query itself (distance 0 to own codes)
    for r in res:
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"]


def test_ivfpq_matches_pq_inside_probed_cells(spark, corpus, vecs):
    from duckdb_spatial_spark.operators.similarity import train_ivf_centroids

    books = train_pq(corpus, "embedding", m=M, ks=KS, iters=8)
    cents = train_ivf_centroids(corpus, "embedding", n_centroids=6)
    queries = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(3)],
        "query_id long, query_vec array<double>")
    full = ann_pq_topk(corpus, queries, books, k=5).collect()
    ivf = ann_ivfpq_topk(corpus, queries, books, cents, k=5,
                         nprobe=6).collect()
    # with nprobe == n_centroids every cell is probed → identical result
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["adc_d2"])
    assert sorted(map(key, ivf)) == sorted(map(key, full))


def test_codebook_roundtrip(spark, corpus, tmp_path):
    books = train_pq(corpus, "embedding", m=M, ks=KS, iters=2)
    p = str(tmp_path / "books.parquet")
    pq_codebook_df(spark, books).write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p).orderBy("j", "c").collect()
    restored = np.asarray(
        [r["centroid"] for r in back], dtype=np.float64
    ).reshape(M, KS, D // M)
    assert np.allclose(restored, books)


def test_precoded_corpus_skips_encode(spark, corpus):
    books = train_pq(corpus, "embedding", m=M, ks=KS, iters=0)
    coded = pq_encode(corpus, "embedding", books)
    queries = spark.createDataFrame(
        [(0, [0.0] * D)], "query_id long, query_vec array<double>")
    a = ann_pq_topk(coded, queries, books, k=3, code_col="pq_code").collect()
    b = ann_pq_topk(corpus, queries, books, k=3).collect()
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_string_query_ids(spark, corpus, vecs):
    """Review regression: the ADC LUT must follow the query-id column's
    actual type, not assume long."""
    books = train_pq(corpus, "embedding", m=M, ks=KS, iters=0)
    queries = spark.createDataFrame(
        [("qA", [float(v) for v in vecs[0]]),
         ("qB", [float(v) for v in vecs[1]])],
        "query_id string, query_vec array<double>")
    res = ann_pq_topk(corpus, queries, books, k=3).collect()
    assert {r["query_id"] for r in res} == {"qA", "qB"}


def test_refine_rerank_recovers_exact_topk(spark, corpus, vecs):
    """IVFPQ+R: with a generous refine multiplier the exact re-rank must
    reproduce the true top-k (ADC only shortlists)."""
    books = train_pq(corpus, "embedding", m=M, ks=KS, iters=8)
    queries = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(3)],
        "query_id long, query_vec array<double>")
    res = ann_pq_topk(corpus, queries, books, k=5, refine=20).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for q in range(3):
        got = [v for _, v in sorted(by_q[q])]
        exact = _brute_l2_topk(vecs, vecs[q], 5)
        assert got == exact, (q, got, exact)


# ---------------------------------------------------------------------------
# PCA-rotation PQ (OPQ-lite)
# ---------------------------------------------------------------------------

def _total_distortion(df, vec_col, books):
    """Σ||x - c(x)||² over the encoded corpus, computed driver-side from
    the collected codes (test-scale only)."""
    m, ks, dsub = books.shape
    rows = pq_encode(df, vec_col, books).select(vec_col, "pq_code").collect()
    tot = 0.0
    for r in rows:
        x = np.asarray(r[vec_col]).reshape(m, dsub)
        for j, c in enumerate(r["pq_code"]):
            tot += float(((x[j] - books[j][c]) ** 2).sum())
    return tot


def test_pca_rotation_reduces_distortion_on_correlated_vectors(spark):
    """The OPQ claim: on correlated data, rotating into the balanced
    PCA basis before PQ strictly reduces quantization distortion at the
    same code budget (m, ks). Low-rank latent signal mixed into 8 dims:
    raw subspaces are mutually correlated (product quantizer wastes
    bits); the rotation decorrelates and round-robin balances them."""
    from duckdb_spatial_spark.operators.pq import (rotate_vectors,
                                                   train_pca_rotation)

    rng = np.random.RandomState(17)
    Z = rng.randn(500, 2) * [6.0, 3.0]          # strong 2-dim latent
    W = rng.randn(2, 8)                          # mixing to 8 dims
    X = Z @ W + rng.randn(500, 8) * 0.05
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>")

    m, ks = 2, 8
    raw_books = train_pq(df, "embedding", m=m, ks=ks, iters=4)
    raw_d = _total_distortion(df, "embedding", raw_books)

    mean, R, lams = train_pca_rotation(df, "embedding", dim=8, k=8, m=m)
    rot = rotate_vectors(df, "embedding", mean, R, round_digits=None)
    rot_books = train_pq(rot, "rot", m=m, ks=ks, iters=4)
    rot_d = _total_distortion(rot, "rot", rot_books)

    # eigenvalues come back descending within the round-robin permutation
    assert lams[0] == max(lams)
    # the rotation is orthonormal-ish (deflated power iteration), so the
    # distortions are comparable in one space; demand a real win
    assert rot_d < 0.7 * raw_d, (rot_d, raw_d)


def test_train_pca_rotation_shapes_and_interleave(spark):
    from duckdb_spatial_spark.operators.pq import train_pca_rotation
    from duckdb_spatial_spark.operators.vectors import pca_power_train

    rng = np.random.RandomState(3)
    X = rng.randn(60, 8)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>")
    mean, R, lams = train_pca_rotation(df, "embedding", dim=8, k=8, m=4)
    assert R.shape == (8, 8) and len(lams) == 8 and len(mean) == 8
    _, comps, lams0 = pca_power_train(df, "embedding", dim=8, k=8)
    # subspace j rows are components j, j+4 (round-robin by rank)
    perm = [0, 4, 1, 5, 2, 6, 3, 7]
    assert np.allclose(R, comps[perm])
    assert lams == [float(lams0[c]) for c in perm]
    with pytest.raises(ValueError):
        train_pca_rotation(df, "embedding", dim=8, k=6, m=4)


def test_rotate_vectors_rounds_and_propagates_nulls(spark):
    from duckdb_spatial_spark.operators.pq import (rotate_vectors,
                                                   train_pca_rotation)

    rng = np.random.RandomState(9)
    X = rng.randn(40, 4)
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    mean, R, _ = train_pca_rotation(df, "embedding", dim=4, k=4, m=2)
    out = {r["vec_id"]: r["rot"]
           for r in rotate_vectors(df, "embedding", mean, R).collect()}
    assert out[99] is None
    v = np.asarray(out[0])
    want = (X[0] - mean) @ R.T
    assert np.allclose(v, np.round(want, 6), atol=5e-7)
