"""Distributed Lloyd k-means (operators/kmeans.py)."""

from geohash_dotnet_spark.operators import kmeans_assign, kmeans_fit


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_two_blobs_converge(spark):
    """Two separated blobs with one seed in each: every vector lands in
    its blob's cluster and centroids are the blob means (micro-unit
    exact)."""
    blob_a = [(0, [0.0, 0.0]), (2, [0.2, 0.0]), (3, [0.0, 0.2])]
    blob_b = [(1, [10.0, 10.0]), (4, [10.2, 10.0]), (5, [10.0, 10.2])]
    df = _vecs(spark, blob_a + blob_b)
    out = {(r["cluster"], r["pos"]): r
           for r in kmeans_fit(df, n_clusters=2, n_iter=2).collect()}
    assert out[(0, 0)]["n_vecs"] == 3 and out[(1, 0)]["n_vecs"] == 3
    # blob means, quantized: mean([0, .2, 0]) etc.
    assert abs(out[(0, 0)]["comp"] - 0.2 / 3) < 1e-6
    assert abs(out[(1, 0)]["comp"] - (30.2 / 3)) < 1e-6


def test_assignment_ties_to_lowest_cluster(spark):
    df = _vecs(spark, [(7, [0.5, 0.5])])
    cents = [(0, [0.0, 0.0]), (1, [1.0, 1.0])]
    out = kmeans_assign(df, cents).collect()
    assert out[0]["cid"] == 0  # equidistant -> lowest cid


def test_empty_cluster_keeps_previous_centroid(spark):
    """A seed with no nearby mass loses all members; the next round
    must still assign against its ORIGINAL centroid, not crash or
    drift."""
    rows = [(0, [0.0, 0.0]), (1, [100.0, 100.0]),
            (2, [0.1, 0.0]), (3, [0.0, 0.1]), (4, [0.1, 0.1])]
    # cluster 1's seed is vector 1; vector 1 itself is closer to its
    # own seed, so the cluster is NOT empty -- make it empty by putting
    # every vector near origin except the unreachable seed itself.
    df = _vecs(spark, rows)
    out = kmeans_fit(df, n_clusters=2, n_iter=3).collect()
    sizes = {r["cluster"]: r["n_vecs"] for r in out if r["pos"] == 0}
    assert sizes[0] == 4 and sizes[1] == 1


def test_assignment_is_shuffle_free(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    cents = [(i, [0.01 * i] * 64) for i in range(4)]
    out = kmeans_assign(emb, cents)
    out.collect()
    head = (out._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0])
    assert "Exchange" not in head


def test_layout_independent(spark, sf_small):
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    a = sorted(map(tuple, kmeans_fit(emb, 4, 2).collect()))
    b = sorted(map(tuple, kmeans_fit(emb.repartition(7), 4, 2).collect()))
    assert a == b and a
