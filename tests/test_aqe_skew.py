"""Runtime evidence for the docstring claim "AQE handles the skewed
case": a planted hot key must make AQE split the skewed partition
(SortMergeJoin(skew=true) + AQEShuffleRead skewed in the FINAL adaptive
plan), and the identical job with skew handling disabled must not.

This is the engine-level guarantee several operators lean on for their
100 TB story (link_locality's viral-page key, score_calibration's
mega-domain histogram partial, site_footprint's mega-site) — asserted
here once against a synthetic hot key rather than per-operator, because
the mechanism is a property of the shuffle layer, not of any operator's
plan shape.

Threshold note: AQE sizes partitions by COMPRESSED shuffle bytes — a
hot key of identical values compresses below any realistic threshold
and never looks skewed, so the fixture's payload is md5(id)
(incompressible), which is also the honest model of real skew (a viral
page's rows differ in everything but the key).
"""

import pyspark.sql.functions as F

_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def _hot_key_join(spark):
    """208k-row left side with 200k rows on ONE key (md5 payload so the
    hot partition's compressed bytes clear the lowered threshold),
    joined to a 10k-key dim — broadcast disabled so the join is SMJ."""
    left = spark.range(208_000).select(
        F.when(F.col("id") < 200_000, F.lit(7))
        .otherwise(F.col("id")).alias("k"),
        F.md5(F.col("id").cast("string")).alias("payload"))
    right = spark.range(10_000).select(F.col("id").alias("k"),
                                       F.lit("dim").alias("v"))
    return left.join(right, "k")


def _final_plan(df):
    """Execute df and return its FINAL adaptive plan section (the same
    DataFrame object must be collected — count()/write() would execute
    a different QueryExecution and leave this one non-final)."""
    rows = df.collect()
    assert len(rows) == 200_000
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return plan.split("== Initial Plan ==")[0]


def _with_confs(spark, confs, fn):
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        return fn()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_the_planted_hot_key(spark):
    final = _with_confs(spark, _SKEW_CONFS,
                        lambda: _final_plan(_hot_key_join(spark)))
    assert "SortMergeJoin(skew=true)" in final, final
    assert "AQEShuffleRead skewed" in final, final


def test_same_job_without_skew_handling_stays_skewed(spark):
    confs = dict(_SKEW_CONFS, **{
        "spark.sql.adaptive.skewJoin.enabled": "false"})
    final = _with_confs(spark, confs,
                        lambda: _final_plan(_hot_key_join(spark)))
    assert "skew=true" not in final and "skewed" not in final, final
