"""HLL / count-min sketches: cross-engine bit parity + accuracy bounds."""

import duckdb
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.operators.sketch import (
    cms_bucket_sql, count_min_estimate, count_min_sketch, hll_estimate,
    hll_estimate_sql, hll_register_sql, hll_registers)


@pytest.fixture(scope="module")
def corpus():
    # 3000 distinct per group, skewed multiplicity
    return [(f"item-{i % 3000}", i % 4) for i in range(20000)]


def _duck(corpus):
    con = duckdb.connect()
    con.execute("create table t(w varchar, grp int)")
    con.executemany("insert into t values (?,?)", corpus)
    return con


def test_hll_cross_engine_exact(spark, corpus):
    P = 10
    df = spark.createDataFrame(corpus, "w string, grp int")
    got = {
        r["grp"]: round(r["est"], 6)
        for r in hll_estimate(
            hll_registers(df, F.col("w"), P, by=["grp"]), P, by=["grp"]
        ).collect()
    }
    bucket, rho = hll_register_sql("w", P)
    q = f"""
    with regs as (
      select grp, {bucket} as bucket, max({rho}) as reg from t group by 1,2
    ), g as (
      select grp, sum(cast(1 as bigint) << (49 - reg)) as s_present,
             cast(count(*) as bigint) as n_present
      from regs group by 1)
    select grp, {hll_estimate_sql(P)} as est from g order by grp
    """
    duck = {g: round(e, 6) for g, e in _duck(corpus).execute(q).fetchall()}
    assert got == duck


def test_hll_accuracy_and_merge(spark, corpus):
    P = 10
    df = spark.createDataFrame(corpus, "w string, grp int")
    ests = hll_estimate(
        hll_registers(df, F.col("w"), P), P).collect()
    # 3000 true distinct; σ ≈ 1.04/sqrt(1024) ≈ 3.3% → 5σ bound
    assert abs(ests[0]["est"] - 3000) / 3000 < 0.17
    # decomposability: registers of two halves max-merge to the whole
    h1 = spark.createDataFrame(corpus[:10000], "w string, grp int")
    h2 = spark.createDataFrame(corpus[10000:], "w string, grp int")
    merged = (
        hll_registers(h1, F.col("w"), P)
        .unionByName(hll_registers(h2, F.col("w"), P))
        .groupBy("bucket").agg(F.max("reg").alias("reg"))
    )
    whole = hll_registers(df, F.col("w"), P)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, whole.collect()))


def test_hll_small_range_linear_counting(spark):
    P = 10
    df = spark.createDataFrame([(f"x{i}",) for i in range(40)], "w string")
    est = hll_estimate(hll_registers(df, F.col("w"), P), P).collect()[0]
    # linear-counting regime: must be very close at 40 ≪ m
    assert abs(est["est"] - 40) < 3


def test_cms_cross_engine_and_bounds(spark, corpus):
    D, W = 4, 512
    df = spark.createDataFrame(corpus, "w string, grp int")
    sk = count_min_sketch(df, F.col("w"), depth=D, width=W)
    cand = spark.createDataFrame(
        [("item-0",), ("item-1",), ("item-2999",), ("missing",)], "w string")
    got = {
        r["w"]: r["est"]
        for r in count_min_estimate(sk, cand, F.col("w"),
                                    depth=D, width=W).collect()
    }
    cells = " union all ".join(
        f"select {d} as row, {cms_bucket_sql('w', d, W)} as col, 1 as w8 "
        f"from t" for d in range(D))
    probes = " union all ".join(
        f"select w, {d} as row, {cms_bucket_sql('w', d, W)} as col "
        f"from cand" for d in range(D))
    q = f"""
    with cells as ({cells}),
     sk as (select row, col, cast(sum(w8) as bigint) as cnt
            from cells group by 1,2),
     cand(w) as (values ('item-0'),('item-1'),('item-2999'),('missing')),
     probes as ({probes})
    select probes.w, cast(min(coalesce(cnt,0)) as bigint) as est
    from probes left join sk using (row, col) group by 1
    """
    duck = dict(_duck(corpus).execute(q).fetchall())
    assert got == duck
    # CMS never underestimates; overshoot bounded by e*N/W w.h.p.
    from collections import Counter
    true = Counter(w for w, _ in corpus)
    for w, est in got.items():
        assert est >= true.get(w, 0)
        assert est - true.get(w, 0) <= 3 * len(corpus) / W


def test_cms_sketch_size_is_bounded(spark, corpus):
    D, W = 4, 128
    df = spark.createDataFrame(corpus, "w string, grp int")
    assert count_min_sketch(df, F.col("w"), depth=D, width=W).count() \
        <= D * W


def test_histogram_quantiles_cross_engine_and_accuracy(spark):
    import random

    rng = random.Random(3)
    rows = [(rng.expovariate(0.02), ["a", "b", "c"][i % 3])
            for i in range(5000)]
    from duckdb_spatial_spark.operators.sketch import (
        histogram_bin_sql, histogram_quantile_sql, histogram_quantiles,
        histogram_sketch)

    df = spark.createDataFrame(rows, "v double, g string")
    sk = histogram_sketch(df, F.col("v"), 0.0, 300.0, 64, by=["g"])
    got = sorted(
        (r["g"], r["q"], round(r["est"], 6))
        for r in histogram_quantiles(
            sk, [0.5, 0.9], 0.0, 300.0, 64, by=["g"]).collect())
    con = duckdb.connect()
    con.execute("create table t(v double, g string)")
    con.executemany("insert into t values (?,?)", rows)
    b = histogram_bin_sql("v", 0.0, 300.0, 64)
    parts = " UNION ALL ".join(
        f"({histogram_quantile_sql(q, 0.0, 300.0, 64, 'sk', ['g'])})"
        for q in (0.5, 0.9))
    duck = sorted(
        (g, q, round(e, 6)) for g, q, e in con.execute(
            f"WITH sk AS (SELECT g, {b} AS bin, "
            f"CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY 1,2) {parts}"
        ).fetchall())
    assert got == duck
    # accuracy: within one bin width of the true quantile
    import numpy as np
    vs = np.array([v for v, g in rows if g == "a"])
    width = 300.0 / 64
    est = {(g, q): e for g, q, e in got}
    for q in (0.5, 0.9):
        assert abs(est[("a", q)] - float(np.quantile(vs, q))) <= width


def test_histogram_sketch_merges_and_clamps(spark):
    from duckdb_spatial_spark.operators.sketch import (histogram_quantiles,
                                                       histogram_sketch)

    rows = [(float(i % 100),) for i in range(2000)] + [(-5.0,), (1e9,)]
    df = spark.createDataFrame(rows, "v double")
    sk = histogram_sketch(df, F.col("v"), 0.0, 100.0, 50)
    bins = {r["bin"]: r["cnt"] for r in sk.collect()}
    assert min(bins) == 0 and max(bins) == 49  # out-of-range clamps
    # merge two halves by summing bins == whole
    h1 = histogram_sketch(spark.createDataFrame(rows[:1000], "v double"),
                          F.col("v"), 0.0, 100.0, 50)
    h2 = histogram_sketch(spark.createDataFrame(rows[1000:], "v double"),
                          F.col("v"), 0.0, 100.0, 50)
    merged = {
        r["bin"]: r["cnt"]
        for r in h1.unionByName(h2).groupBy("bin")
        .agg(F.sum("cnt").alias("cnt")).collect()
    }
    assert merged == bins


def test_hll_union_and_overlap(spark):
    from duckdb_spatial_spark.operators.sketch import (hll_overlap_estimate,
                                                       hll_registers,
                                                       hll_union)

    a = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "w string")
    b = spark.createDataFrame([(f"x{i}",) for i in range(1000, 4000)],
                              "w string")
    ra = hll_registers(a, F.col("w"), 10)
    rb = hll_registers(b, F.col("w"), 10)
    # union sketch ≡ sketch of the union
    whole = hll_registers(a.unionByName(b), F.col("w"), 10)
    assert sorted(map(tuple, hll_union(ra, rb).collect())) == \
        sorted(map(tuple, whole.collect()))
    row = hll_overlap_estimate(ra, rb, 10).collect()[0]
    # true: |A|=2000 |B|=3000 |A∪B|=4000 |A∩B|=1000; σ≈3.3% of each
    assert abs(row["est_union"] - 4000) / 4000 < 0.15
    # inclusion-exclusion compounds three errors — generous bound
    assert abs(row["est_intersect"] - 1000) < 600
