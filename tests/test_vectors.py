"""Embedding infrastructure: distributed PCA vs numpy reference, int8
quantization round-trip + DuckDB twin parity."""
import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.vectors import (dequantize_vec,
                                                    dequantize_vec_sql,
                                                    pca_apply, pca_train,
                                                    quantize_vec,
                                                    quantize_vec_sql)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_pca_matches_numpy(spark, emb):
    k = 8
    mean, comps, var = pca_train(emb, "embedding", k)
    x = np.asarray([list(r.embedding) for r in emb.collect()],
                   dtype=np.float64)
    # reference: eigh of the same biased covariance, same sign rule
    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    ref = evecs[:, order].T
    for i in range(k):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    assert mean == pytest.approx(x.mean(axis=0), rel=1e-9)
    assert var == pytest.approx(evals[order], rel=1e-6)
    assert comps == pytest.approx(ref, abs=1e-6)
    # components are orthonormal; variances are in decreasing order
    assert comps @ comps.T == pytest.approx(np.eye(k), abs=1e-8)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(k - 1))


def test_pca_apply_projection(spark, emb):
    mean, comps, var = pca_train(emb, "embedding", 4)
    rows = pca_apply(emb, "embedding", mean, comps).select(
        "vec_id", "pca").collect()
    x = {r.vec_id: np.asarray(list(r.embedding))
         for r in emb.collect()}
    for r in rows[:20]:
        want = (x[r.vec_id] - mean) @ comps.T
        assert np.asarray(r.pca) == pytest.approx(want, abs=1e-9)
    # projected variance per axis ≈ explained variance
    p = np.asarray([r.pca for r in rows])
    assert p.var(axis=0, ddof=0) == pytest.approx(var, rel=1e-6)


def test_quantize_roundtrip_and_twin(spark, emb):
    q = emb.select(
        "vec_id", "embedding",
        quantize_vec(F.col("embedding")).alias("q"),
    ).withColumn("deq", dequantize_vec(F.col("q")))
    rows = q.collect()
    for r in rows[:50]:
        v = np.asarray(list(r.embedding), dtype=np.float64)
        d = np.asarray(list(r.deq))
        assert np.max(np.abs(v)) == 0 or \
            np.max(np.abs(v - d)) <= np.max(np.abs(v)) / 127.0 + 1e-12
        assert all(-127 <= c <= 127 for c in r.q.codes)
    # DuckDB twin parity on the same parquet
    con = duckdb.connect()
    got = {r.vec_id: (r.q.scale, list(r.q.codes), list(r.deq))
           for r in rows}
    qs = quantize_vec_sql("embedding")
    sql = (f"SELECT vec_id, {qs} AS q, "
           f"{dequantize_vec_sql(f'({qs})')} AS deq "
           f"FROM '{SF}/embeddings.parquet'")
    for vid, qq, deq in con.execute(sql).fetchall():
        s, codes, d = got[vid]
        assert qq["scale"] == pytest.approx(s, rel=1e-12)
        assert list(qq["codes"]) == codes, vid
        assert d == pytest.approx(deq, rel=1e-12)


def test_power_iteration_matches_eigh(spark):
    """8 pinned power-iteration steps land on the eigh top component
    (|cos| ≈ 1) and the Rayleigh quotient on its eigenvalue."""
    import numpy as np

    from duckdb_spatial_spark.operators.vectors import (pca_train,
                                                        power_iteration_top1)

    rng = np.random.default_rng(12)
    # anisotropic cloud with a dominant axis (gap keeps convergence fast)
    base = rng.normal(0, 1, (400, 8))
    base[:, 0] *= 6.0
    base[:, 1] *= 2.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v, lam = power_iteration_top1(df, "embedding", dim=8, iters=8)
    _mean, comps, var = pca_train(df, "embedding", k=1)
    cos = abs(float(np.dot(np.asarray(v), comps[0])))
    assert cos > 0.9999, cos
    assert lam == pytest.approx(float(var[0]), rel=1e-3)


def test_power_iteration_sql_twin_parity(spark):
    import duckdb
    import numpy as np

    from duckdb_spatial_spark.operators.vectors import (power_iteration_sql,
                                                        power_iteration_top1)

    rng = np.random.default_rng(5)
    base = rng.normal(0, 1, (60, 6))
    base[:, 2] *= 4.0
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    v, lam = power_iteration_top1(df, "embedding", dim=6, iters=6)

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE emb AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {vec!r}::DOUBLE[])" for i, vec in rows)
        + ") t(vec_id, embedding)")
    got = con.execute(
        power_iteration_sql("emb", "embedding", 6, iters=6)).fetchall()
    by_i = {r[0]: (r[1], r[2]) for r in got}
    for i in range(6):
        assert by_i[i + 1][0] == pytest.approx(v[i], rel=1e-9, abs=1e-9)
        assert by_i[i + 1][1] == pytest.approx(lam, rel=1e-9)


def test_pca_power_train_matches_sql_twin(spark):
    """pca_power_train's pinned deflated recurrence must replay in
    DuckDB (pca_power_sql) to ~1e-9 on loadings and eigenvalues."""
    import duckdb
    import numpy as np

    from duckdb_spatial_spark.operators.vectors import (pca_power_sql,
                                                        pca_power_train)

    rng = np.random.RandomState(7)
    base = rng.randn(120, 6) * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])
    rows = [(i, [float(x) for x in base[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    mean, comps, lams = pca_power_train(df, "v", dim=6, k=3, iters=8)

    con = duckdb.connect()
    con.execute("CREATE TABLE t (vid BIGINT, v DOUBLE[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = con.execute(pca_power_sql("t", "v", dim=6, k=3, iters=8)
                      + " ORDER BY comp, i").fetchall()
    for comp, i, loading, eig in got:
        assert abs(loading - comps[comp - 1][i - 1]) < 1e-9, (comp, i)
        assert abs(eig - lams[comp - 1]) < 1e-9, comp


def test_pca_power_train_approximates_eigh(spark):
    """With a well-separated spectrum the deflated power iteration must
    land on the eigh components (up to sign), and its Rayleigh
    eigenvalues on the explained variances."""
    import numpy as np

    from duckdb_spatial_spark.operators.vectors import (pca_power_train,
                                                        pca_train)

    rng = np.random.RandomState(11)
    base = rng.randn(300, 5) * np.array([8.0, 4.0, 2.0, 0.3, 0.05])
    rows = [(i, [float(x) for x in base[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    _, comps_p, lams = pca_power_train(df, "v", dim=5, k=2, iters=30)
    _, comps_e, var = pca_train(df, "v", k=2)
    for c in range(2):
        cos = abs(float(np.dot(comps_p[c], comps_e[c])))
        assert cos > 1.0 - 1e-6, (c, cos)
        assert abs(lams[c] - var[c]) < 1e-4 * max(1.0, var[c]), c
