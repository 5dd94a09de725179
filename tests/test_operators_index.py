"""Inverted index + BM25 retrieval (operators/index.py)."""

import math

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import bm25_topk, build_postings


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "apple banana apple"),
         (2, "banana cherry"),
         (3, "apple cherry cherry date")],
        "doc_id long, text string")


def test_postings_known_corpus(spark, tiny):
    out = {(r["term"], ): r.asDict()
           for r in build_postings(tiny, n_shards=1).collect()}
    assert out[("apple",)]["df"] == 2
    assert out[("apple",)]["postings"] == "1:2,3:1"
    assert out[("banana",)]["postings"] == "1:1,2:1"
    assert out[("cherry",)]["df"] == 2
    assert out[("cherry",)]["postings"] == "2:1,3:2"
    assert out[("cherry",)]["tf_total"] == 3
    assert out[("date",)]["postings"] == "3:1"


def test_postings_max_df_elides_stopwords(spark, tiny):
    """Terms above the df cap must vanish BEFORE lists exist."""
    out = {r["term"] for r in
           build_postings(tiny, n_shards=1, max_df=1).collect()}
    assert out == {"date"}


def test_postings_shards_partition_docs(spark, tiny):
    """Sharding splits a term's docs; union of shards = the n_shards=1
    list, and term-level df is identical on every shard row."""
    rows = build_postings(tiny, n_shards=4).collect()
    apple = [r for r in rows if r["term"] == "apple"]
    ids = sorted(
        int(e.split(":")[0]) for r in apple
        for e in r["postings"].split(","))
    assert ids == [1, 3]
    assert all(r["df"] == 2 for r in apple)


def test_postings_single_corpus_exchange(spark, sf_small):
    """The repartition(term) is the ONLY Exchange: the tf agg, the df
    window, and the (term, shard) aggregation all ride it."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = build_postings(docs, n_shards=4, max_df=50)
    out.collect()
    head = (out._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0])
    assert head.count("Exchange") == 1


def test_bm25_rewards_tf_and_rarity(spark):
    docs = spark.createDataFrame(
        [(1, "rare rare common"),
         (2, "rare common common"),
         (3, "common common common"),
         (4, "other words entirely")],
        "doc_id long, text string")
    out = bm25_topk(docs, {"q": "rare"}, k=10).collect()
    # only docs containing the term are returned, higher tf first
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"] > 0
    # a rarer term outscores a common one at equal tf
    both = {r["doc_id"]: r["score"]
            for r in bm25_topk(docs, {"q": "rare common"}, k=10).collect()}
    assert both[1] > both[3]


def test_bm25_matches_reference_formula(spark):
    """One hand-computed cell: doc 2 scored for 'rare' must equal the
    textbook BM25 value under the micro-unit quantization."""
    docs = spark.createDataFrame(
        [(1, "rare rare common"),
         (2, "rare common common"),
         (3, "common common common"),
         (4, "other words entirely")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["score"]
           for r in bm25_topk(docs, {"q": "rare"}, k=10).collect()}
    n_docs, df, tf, dl, avgdl, k1, b = 4, 2, 1, 3, 12 / 4, 1.2, 0.75
    idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    sat = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert out[2] == math.floor(idf * sat * 1e6 + 0.5) / 1e6


def test_bm25_query_terms_are_broadcast(spark, sf_small):
    """The qid stitch must be a broadcast join — the corpus side is
    never shuffled to meet the (tiny) query-term table."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    out = bm25_topk(docs, {"q1": "data quality"}, k=5)
    out.collect()
    head = (out._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0])
    assert "BroadcastHashJoin" in head


def test_bm25_rank_deterministic_under_layout(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    q = {"q1": "data quality pipeline"}
    a = [(r["qid"], r["rank"], r["doc_id"], r["score"])
         for r in bm25_topk(docs, q, k=8).orderBy("qid", "rank").collect()]
    b = [(r["qid"], r["rank"], r["doc_id"], r["score"])
         for r in bm25_topk(docs.repartition(7), q, k=8)
         .orderBy("qid", "rank").collect()]
    assert a == b
