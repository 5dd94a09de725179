"""Physical-plan shape checks — the 100TB-scale properties must be visible
in the plan, not just asserted in prose:

* spatial joins broadcast the covering (no shuffle of the pages side);
* tile aggregations are partial+final hash aggs;
* filters/projections reach the parquet scan (pushdown / pruning);
* native paths contain no Python evaluation nodes.
"""

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.functions import with_geohash
from geohash_dotnet_spark.kernels import cover_polygon
from geohash_dotnet_spark.operators import spatial_join, tile_stats
from geohash_dotnet_spark.sources.pages import pages

RECT = "POLYGON((-85 -60, 85 -60, 85 60, -85 60, -85 -60))"


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df):
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_spatial_join_broadcasts_coverage(spark, sf_small):
    pg = pages(spark, sf_small)
    cov = spark.createDataFrame(
        [(c,) for c in cover_polygon(RECT, 2, "intersects")], "cell string")
    plan = _executed(spatial_join(pg, cov, precision=2))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # pages side must not shuffle


def test_tile_stats_partial_final_agg(spark, sf_small):
    plan = _executed(tile_stats(pages(spark, sf_small), precision=3))
    # partial_count before the exchange, final after: two HashAggregates
    assert plan.count("HashAggregate") >= 2
    # shuffle keyed by the tile (Catalyst may collapse the alias back to gh)
    assert ("Exchange hashpartitioning(tile" in plan
            or "Exchange hashpartitioning(gh" in plan)


def test_parquet_filter_pushdown(spark, sf_med):
    li = spark.read.parquet(f"{sf_med}/lineitem.parquet")
    q = li.filter(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity")
    plan = _executed(q)
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_native_paths_no_python_nodes(spark, sf_small):
    pg = with_geohash(pages(spark, sf_small), "lat", "lon", 7)
    stats = tile_stats(pg, precision=7)
    plan = _executed(stats)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas",
                   "MapInPandas"):
        assert marker not in plan, marker


def test_bucketed_layout_eliminates_exchanges(spark, sf_small, tmp_path):
    """SURVEY §4.3 end-to-end: a pages table persisted bucketBy(gh2) must
    aggregate per tile AND join against a same-bucketed stats table with
    ZERO shuffle exchanges — the scan itself carries the distribution."""
    from geohash_dotnet_spark.plans.bucketing import (
        bucketed_tile_stats, persist_bucketed, with_prefix)

    pg = with_prefix(with_geohash(pages(spark, sf_small), "lat", "lon", 5))
    t_pages = persist_bucketed(pg.select("url", "lang", "gh", "gh2"),
                               "t_bucket_pages", str(tmp_path / "bp"),
                               n_buckets=8)
    agg = bucketed_tile_stats(t_pages)
    plan = _executed(agg)
    assert "Exchange" not in plan, plan[:3000]
    # sanity: values identical to the unbucketed rollup
    want = (pg.groupBy("gh2").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("gh2").collect())
    got = agg.select(F.col("tile").alias("gh2"), F.col("n_pages").alias("n")) \
        .orderBy("gh2").collect()
    assert got == want

    # full-precision rollup: grouping by (gh2, gh) is semantically the
    # p5 tile_stats but shuffle-free on this layout
    agg5 = bucketed_tile_stats(t_pages, tile_col="gh")
    plan5 = _executed(agg5)
    assert "Exchange" not in plan5, plan5[:3000]
    want5 = sorted((r["gh"], r["n"]) for r in
                   pg.groupBy("gh").agg(F.count(F.lit(1)).alias("n")).collect())
    got5 = sorted((r["tile"], r["n_pages"]) for r in agg5.collect())
    assert got5 == want5

    # co-located join: per-tile enrichment against a same-bucketed dim
    stats = agg.select(F.col("tile").alias("gh2"), "n_pages")
    t_stats = persist_bucketed(stats, "t_bucket_stats",
                               str(tmp_path / "bs"), n_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = t_pages.join(t_stats, on="gh2")
        jplan = _executed(j)
        assert "Exchange" not in jplan, jplan[:3000]
        assert j.count() == t_pages.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS t_bucket_pages")
    spark.sql("DROP TABLE IF EXISTS t_bucket_stats")


def test_ivf_assignment_is_shuffle_free(spark, sf_med):
    """IVF centroid assignment must be a single projection over the corpus
    — no Exchange keyed by the vector id (the round-2 form shuffled the
    N x C cross-join through a window), and the probe join must broadcast
    so the corpus side never shuffles before the output-bounded rank."""
    from geohash_dotnet_spark.operators.similarity import ivf_cosine_topk

    emb = spark.read.parquet(f"{sf_med}/embeddings.parquet")
    q = (emb.filter(F.col("vec_id").isin(3, 7))
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_vec")))
    plan = _executed(ivf_cosine_topk(emb, q, k=5))
    assert "Exchange hashpartitioning(vec_id" not in plan, plan[:4000]
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # the only corpus-wide shuffle left is the final q_id rank window +
    # the tiny probe-side window: no more than 2 exchanges in total
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:4000]


def test_whole_stage_codegen_covers_encode(spark, sf_small):
    pg = with_geohash(pages(spark, sf_small), "lat", "lon", 7)
    plan = _executed(pg.select("gh"))
    # toString renders whole-stage-codegen stages as "*(n) Op"
    assert "WholeStageCodegen" in plan or "*(1)" in plan


def test_quality_projection_pinned_form(spark, sf_small):
    """with_quality evaluates as an interpreted Project (higher-order
    functions are CodegenFallback — inherent, not a bug), so the scale
    property is keeping that interpreted expression SMALL on the common
    path. Pin the optimized form PLANS.md documents: exactly ONE
    aggregate() traversal of the token array (the packed bit-field
    accumulator), and the union stopword membership test rewritten by
    OptimizeIn to a single hash-set INSET (four per-language In chains
    would stay linear scans)."""
    from geohash_dotnet_spark.operators import with_quality

    q = with_quality(pages(spark, sf_small))
    opt = _optimized(q)
    assert opt.count("aggregate(") == 1, "packed path must traverse once"
    assert opt.count("INSET") == 1, "union stopword test must be an InSet"


def test_latest_snapshot_partial_agg_no_window(spark, sf_small):
    """Snapshot dedup must be a partial+final struct-max aggregation —
    never a Window (which would shuffle the full fetch history and only
    then discard losers). The struct carries a string (url), so Spark
    plans SortAggregate rather than HashAggregate — the load-bearing
    property is the partial_max BEFORE the exchange: the shuffle carries
    per-map-partition winners, not fetches."""
    from geohash_dotnet_spark.operators import latest_snapshot

    plan = _executed(latest_snapshot(pages(spark, sf_small, replicate=3)))
    assert "partial_max" in plan          # map-side combine
    assert "Window" not in plan
    # exactly one agg exchange (hashpartitioning on the key); the round-
    # robin repartition inside pages() is the only other exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_quadkey_tiles_native_single_exchange(spark, sf_small):
    """The quadkey tile rollup is pure native expressions (no Python
    evaluation nodes) and one partial+final agg around one Exchange."""
    from geohash_dotnet_spark.functions.tiles import with_tiles

    t = with_tiles(pages(spark, sf_small), "lat", "lon", z=6)
    agg = t.groupBy("z", "x", "y", "quadkey").count()
    plan = _executed(agg)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas"):
        assert marker not in plan
    assert plan.count("Exchange") == 1
    assert plan.count("HashAggregate") >= 2


def test_connected_components_joins_are_bounded(spark):
    """Each CC round shuffles edges + labels only — the executed first
    round must not cross-join or carry a Window over the full edge set."""
    from geohash_dotnet_spark.operators import (
        connected_components, release_dedup_cache)

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 200, 2)], "id_a long, id_b long")
    out = connected_components(pairs)
    plan = _optimized(out)
    assert "CartesianProduct" not in plan and "crossJoin" not in plan
    # the only Window is the final n_members count over cluster_id
    assert plan.count("Window") <= 1
    out.count()
    release_dedup_cache()


def test_contamination_stitch_never_broadcasts_doc_keyed_agg(spark, sf_small):
    """The base⋈overlap stitch in contamination_stats joins two doc-keyed
    sides — at 100 TB the overlap aggregate is O(corpus), so only the
    benchmark-gram set may carry a broadcast hint (round-3 VERDICT
    item 3): exactly ONE broadcast strategy in the optimized plan."""
    from geohash_dotnet_spark.operators import contamination_stats

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    tr = docs.filter(F.col("doc_id") % 17 != 0)
    plan = _optimized(contamination_stats(tr, ev, n=3, threshold=0.2))
    assert plan.count("strategy=broadcast") == 1, plan[:4000]


def test_ngram_capped_adds_no_exchange_over_exact(spark, sf_small):
    """The r4 df-cap rides a count window on exchanges the exact form
    already pays — same Exchange count, no second aggregation+join-back
    pass over the shingle universe, and no distinct() Exchange anywhere
    (shingles are array_distinct per doc)."""
    from geohash_dotnet_spark.operators import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")

    def shape(**kw):
        p = (ngram_jaccard_pairs(docs, threshold=0.5, **kw)
             ._jdf.queryExecution().executedPlan().toString())
        return p.split("Initial Plan")[0]

    exact, capped = shape(), shape(max_df=0.05)
    n_ex = exact.count("Exchange hashpartitioning")
    assert capped.count("Exchange hashpartitioning") == n_ex, capped[:4000]
    assert "Window" in capped and "Window" not in exact


def test_dup_spans_hashes_before_exchange_and_reuses_h_partitioning(
        spark, sf_small):
    """duplicate_spans' scale claims, visible in the plan: (1) the span
    TEXT never crosses an exchange — every Exchange key set is (h,id),
    (h), or (id), and no exchange input carries a concat_ws span column;
    (2) the doc-frequency join back reuses the h-keyed partitioning of
    the (h,id) aggregation (no extra exchange on the probe side)."""
    from geohash_dotnet_spark.operators import duplicate_spans

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    plan = _executed(duplicate_spans(docs, width=8))
    body = plan.split("Initial Plan")[0]
    # the md5 projection happens below the first exchange: the exploded
    # relation that is shuffled must already be hashed (no raw span
    # strings in any Exchange's output attributes)
    for line in body.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "concat_ws" not in line, line
    # exchanges: (h,id) partial agg, (h) docfreq, (id) final — the join
    # back must not add a fourth hash exchange
    assert body.count("Exchange hashpartitioning") <= 4, body[:4000]


def test_pagerank_stats_and_dangling_are_broadcast(spark):
    """The one-row stats/dangling relations reach each iteration as
    broadcasts; the rank vector is never collected to the driver (no
    LocalTableScan of ranks) and edge contributions get map-side
    partial aggregation."""
    from geohash_dotnet_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 3) % 11}") for i in range(11)],
        "src string, dst string")
    df = pagerank(e, n_iter=1)
    try:
        plan = _executed(df)
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" \
            in plan, plan[:3000]
        assert "partial_sum" in plan, plan[:3000]
    finally:
        # pagerank persists intermediates; drop them so later tests
        # measure their own storage
        spark.catalog.clearCache()


def test_tile_anomaly_single_corpus_aggregation(spark, sf_med):
    """Everything after the first (tile, day) aggregation runs on the
    reduced table: exactly one exchange keys on the raw-event derived
    (gh, day) pair; the moment agg and join back are tile-keyed."""
    from geohash_dotnet_spark.functions.native import geocode_from_url
    from geohash_dotnet_spark.operators import tile_anomaly

    ev = (spark.read.parquet(f"{sf_med}/events.parquet")
          .withColumn("__eid", F.col("event_id").cast("string")))
    ev = geocode_from_url(ev, url="__eid")
    plan = _executed(tile_anomaly(ev, precision=1))
    body = plan.split("Initial Plan")[0]
    assert body.count("Exchange hashpartitioning") <= 3, body[:4000]
    assert "partial_count" in body or "partial_sum" in body
