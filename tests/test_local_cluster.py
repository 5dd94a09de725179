"""Multi-executor smoke: the flagship pipeline on ``local-cluster`` mode
(separate executor JVMs + separate Python workers) — catches closure
serialization, broadcast distribution, and pandas-UDF issues that
``local[*]`` (single JVM) can hide. The sandbox stand-in for
``spark-submit --py-files`` on a real multi-executor cluster.
"""

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def cluster_spark():
    import os
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = (SparkSession.builder.master("local-cluster[2,2,2048]")
         .appName("geohash-dotnet-spark-cluster-smoke")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.executor.memory", "1500m")
         # the sandbox analogue of spark-submit --py-files: executor
         # Python workers run in separate processes and must import the
         # package themselves (the single-JVM local[*] mode hides this)
         .config("spark.executorEnv.PYTHONPATH", repo)
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_flagship_on_two_executors(cluster_spark):
    import __spark_entry__ as E

    out = E.entry(cluster_spark)
    rows = out.collect()
    assert len(rows) > 0
    assert out.columns == ["tile1", "lang", "n_pages", "avg_quality"]
    assert sum(r["n_pages"] for r in rows) > 0


def test_pandas_udf_and_coverage_across_executors(cluster_spark):
    from geohash_dotnet_spark.functions.udfs import gh_decode
    from geohash_dotnet_spark.operators import cover_polygons

    cov = cover_polygons(
        cluster_spark,
        [("box", "POLYGON((10 50, 15 50, 15 53, 10 53, 10 50))", 4,
          "intersects")])
    n = cov.count()
    assert n > 0
    # Arrow UDF round-trip on executor Python workers
    dec = cov.withColumn("d", gh_decode(F.col("cell")))
    r = dec.agg(F.min("d.lat"), F.max("d.lat")).collect()[0]
    assert 49.0 < r[0] < 54.0 and 49.0 < r[1] < 54.0
