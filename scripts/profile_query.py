"""Per-query profiler for the optimization rounds.

Runs named queries() entries under the EXACT bench.py Spark config and
reports, per query: wall seconds for each attempt, the number of Spark
jobs the attempt launched (statusTracker job-group count — the local-mode
job-floor currency), and optionally writes the returned DataFrame's
explain("formatted") to a file.

Usage:
  python scripts/profile_query.py [--plans DIR] [--attempts N] q91_... q138_...
  python scripts/profile_query.py --all            # every query, 1 attempt

The returned-DataFrame plan is the plan of the FINAL projection only; for
operators that run internal actions (writes, streaming, iterations) the
job count is the honest whole-query measure.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "64k")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "16g")
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .appName("profile-query")
        .getOrCreate()
    )


def warm(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    spark.range(1000).count()
    _warm = pandas_udf(lambda s: s * 1.0, "double", PandasUDFType.SCALAR)
    wdf = spark.range(0, 10_000, 1, int(CPUS)).withColumn(
        "v", _warm(F.col("id").cast("double")))
    wdf.agg(F.sum("v")).collect()

    def _imports(it):
        import duckdb_spatial_spark.functions.scalar  # noqa: F401
        import duckdb_spatial_spark.operators.dedup  # noqa: F401
        import time as _t
        _t.sleep(0.2)
        yield from it

    spark.range(0, int(CPUS), 1, int(CPUS)).mapInPandas(
        _imports, schema="id long").count()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
        except Exception:
            pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans", default=None,
                    help="directory for explain('formatted') dumps")
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entry

    qs = entry.queries()
    names = list(qs) if args.all else [
        n for pat in args.names for n in qs if n == pat or n.startswith(pat)]
    if not names:
        print("no queries matched", file=sys.stderr)
        sys.exit(1)

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    warm(spark)
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    results = {}
    for name in names:
        fn = qs[name]
        times, jobs = [], []
        for att in range(args.attempts):
            group = f"prof_{name}_{att}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            rows = df.collect()
            dt = time.perf_counter() - t0
            sc.setJobGroup("idle", "idle")
            nj = len(tracker.getJobIdsForGroup(group))
            times.append(round(dt, 3))
            jobs.append(nj)
            if args.plans and att == 0:
                os.makedirs(args.plans, exist_ok=True)
                with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            import gc
            gc.collect()
        results[name] = {"times": times, "min": min(times),
                         "jobs": jobs, "rows": len(rows)}
        print(f"{name}: min={min(times):.3f}s times={times} jobs={jobs}",
              flush=True)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
