"""Partitioning-reuse plan shapes (SURVEY.md §4.3): pre-partitioning a
table by the cell key makes downstream joins and aggregations on that key
exchange-free — the single-box stand-in for geohash-prefix bucketing of a
persisted 100TB table, where the scan itself carries the distribution.
"""

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import tag_pages
from geohash_dotnet_spark.sources.pages import pages


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_aqe_no_broadcast(spark):
    """Force the shuffle-join regime with stable plan text."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)


def test_agg_on_prepartitioned_key_is_exchange_free(spark, sf_small,
                                                    no_aqe_no_broadcast):
    pg = tag_pages(pages(spark, sf_small), precision=3)
    pre = pg.repartition(8, "gh")
    plan = _executed(pre.groupBy("gh").agg(F.count(F.lit(1))))
    # exactly the one explicit repartition; the aggregation reuses it
    assert plan.count("Exchange") == 1, plan


def test_join_of_copartitioned_sides_adds_no_exchange(spark, sf_small,
                                                      no_aqe_no_broadcast):
    pg = tag_pages(pages(spark, sf_small), precision=2)
    a = pg.repartition(8, "gh")
    b = (pg.groupBy("gh").agg(F.count(F.lit(1)).alias("n"))
         .repartition(8, "gh"))
    plan = _executed(a.join(b, on="gh"))
    # b's lineage needs its own agg exchange; the JOIN itself adds none:
    # two explicit repartitions + one agg shuffle, nothing else
    assert plan.count("Exchange") <= 3, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_unpartitioned_shuffle_join_baseline(spark, sf_small,
                                             no_aqe_no_broadcast):
    """Sanity: without pre-partitioning the same join inserts exchanges on
    BOTH sides — what co-location removes."""
    pg = tag_pages(pages(spark, sf_small), precision=2)
    b = pg.groupBy("gh").agg(F.count(F.lit(1)).alias("n"))
    plan = _executed(pg.join(b, on="gh"))
    assert plan.count("Exchange") >= 2, plan
