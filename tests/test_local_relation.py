"""local_relation: inline-VALUES LocalRelation builder.

The contract under test: (1) values round-trip BIT-EXACTLY (floats via
shortest-repr string casts, strings via escaping or unbase64), (2) the
result is a true LocalRelation — collect() and broadcast builds answer
from executeCollect with zero jobs, unlike createDataFrame's
parallelized-RDD scan."""

import math

import pytest
from pyspark.sql import types as T

from duckdb_spatial_spark.sources.tables import local_relation


def test_roundtrip_floats_exact(spark):
    import struct

    # awkward doubles: denormal, shortest-repr tie, huge, negative zero
    vals = [0.1, 0.30000000000000004, 5e-324, 1.7976931348623157e308,
            -0.0, 123456.789e-30, float("nan"), float("inf"),
            float("-inf"), None]
    rows = [(i, v) for i, v in enumerate(vals)]
    out = local_relation(
        spark, rows, "i int, v double").orderBy("i").collect()
    for (_, want), got in zip(rows, out):
        if want is None:
            assert got.v is None
        elif math.isnan(want):
            assert math.isnan(got.v)
        else:
            assert struct.pack("d", got.v) == struct.pack("d", want)


def test_roundtrip_float32_array(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vec = rng.standard_normal(64).astype(np.float32)
    rows = [(1, [float(x) for x in vec]), (2, None),
            (3, [1.0, None, -2.5])]
    out = {r.i: r.v for r in local_relation(
        spark, rows, "i int, v array<float>").collect()}
    assert np.array_equal(np.asarray(out[1], dtype=np.float32), vec)
    assert out[2] is None
    assert out[3] == [1.0, None, -2.5]


def test_roundtrip_strings_and_ints(spark):
    rows = [
        (1, "plain"),
        (2, "it's \"quoted\" \\ back\\slash"),
        (3, "unié中文 \U0001f600"),
        (4, "tab\tnewline\n"),
        (5, None),
        (-(1 << 62), "big negative key"),
    ]
    got = {r.k: r.s for r in local_relation(
        spark, rows, "k bigint, s string").collect()}
    for k, s in rows:
        assert got[k] == s


def test_empty_rows_keeps_schema(spark):
    df = local_relation(spark, [], "a int, v array<float>")
    assert df.count() == 0
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "int", "array<float>"]


def test_plan_is_local_relation_zero_job_collect(spark):
    rows = [(i, float(i) / 7.0) for i in range(100)]
    df = local_relation(spark, rows, "i int, v double")
    # true LocalRelation: the optimized plan is a single LocalRelation
    # node (no RDD scan), so collect() runs zero Spark jobs
    assert "LocalRelation" in df._jdf.queryExecution().optimizedPlan().toString()
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    assert len(df.collect()) == 100
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before


def test_unsupported_type_raises(spark):
    with pytest.raises(TypeError):
        local_relation(spark, [(b"x",)], T.StructType(
            [T.StructField("b", T.BinaryType())]))
