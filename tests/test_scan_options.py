"""st_read scan-tuning option parity (st_read.cpp:153-240):
max_threads / sequential_layer_scan / max_batch_size."""
import pytest
from pyspark.sql import functions as F

from duckdb_spatial_spark.sources.read import st_read


@pytest.fixture
def dataset(spark, tmp_path):
    path = str(tmp_path / "pts.parquet")
    (spark.range(4000).select(
        F.col("id"),
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") % 50).cast("double").alias("y"))
     .repartition(8).write.parquet(path))
    return path


def test_max_threads_caps_scan_tasks(spark, dataset):
    base = st_read(spark, dataset)
    assert base.rdd.getNumPartitions() > 2
    capped = st_read(spark, dataset, max_threads=2)
    assert capped.rdd.getNumPartitions() <= 2
    assert capped.count() == 4000


def test_sequential_layer_scan_single_task(spark, dataset):
    seq = st_read(spark, dataset, sequential_layer_scan=True)
    assert seq.rdd.getNumPartitions() == 1
    assert seq.count() == 4000


def test_max_batch_size_validated(spark, dataset):
    # accepted (documented no-op: Spark's Arrow config owns batching)
    assert st_read(spark, dataset, max_batch_size=10_000).count() == 4000
    with pytest.raises(ValueError, match="max_batch_size"):
        st_read(spark, dataset, max_batch_size=0)
    with pytest.raises(ValueError, match="max_threads"):
        st_read(spark, dataset, max_threads=-1)
