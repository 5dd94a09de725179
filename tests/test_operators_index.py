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


# ---------------------------------------------------------------------------
# doc_keywords
# ---------------------------------------------------------------------------

def test_doc_keywords_hand_scores(spark, tiny):
    """doc 1 = 'apple banana apple': dl=3, share_fp(apple) = 2e6 div 3 =
    666666, df(apple)=2 -> score 333333.0; banana 333333/2 = 166666.5."""
    from geohash_dotnet_spark.operators.index import doc_keywords

    out = {(r["id"], r["term"]): r.asDict()
           for r in doc_keywords(tiny, k=4).collect()}
    a = out[(1, "apple")]
    assert (a["tf"], a["dl"], a["df"]) == (2, 3, 2)
    assert a["score"] == 333333.0 and a["rank"] == 1
    assert out[(1, "banana")]["score"] == 166666.5


def test_doc_keywords_tie_breaks_term_asc(spark, tiny):
    """doc 3 = 'apple cherry cherry date': cherry and date tie at
    250000.0 -> cherry (term asc) takes rank 1, date rank 2."""
    from geohash_dotnet_spark.operators.index import doc_keywords

    d3 = {r["rank"]: r["term"] for r in
          doc_keywords(tiny, k=3).collect() if r["id"] == 3}
    assert d3 == {1: "cherry", 2: "date", 3: "apple"}


def test_doc_keywords_max_df_cut(spark, tiny):
    """max_df=1 removes every term present in 2+ docs before the
    doc-side shuffle; only 'date' survives."""
    from geohash_dotnet_spark.operators.index import doc_keywords

    rows = doc_keywords(tiny, k=3, max_df=1).collect()
    assert [(r["id"], r["term"]) for r in rows] == [(3, "date")]


def test_doc_keywords_no_python_in_plan(spark, tiny):
    from geohash_dotnet_spark.operators.index import doc_keywords

    out = doc_keywords(tiny, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# geo_text_search
# ---------------------------------------------------------------------------

def _geo_pages(spark):
    rows = [
        ("https://x/a/1/0", 5.0, 5.0, "hello spark world"),
        ("https://x/a/2/0", 10.0, 10.0, "spark spark engine"),
        ("https://x/a/3/0", 15.0, 15.0, "no match here"),
        ("https://x/a/4/0", 55.0, 5.0, "spark outside bbox"),
        ("https://x/a/5/0", 5.0, 55.0, "spark also outside"),
        ("https://x/a/6/0", 20.0, 20.0, "edge Spark inclusive"),
    ]
    return spark.createDataFrame(
        rows, "url string, lat double, lon double, text string")


def test_geo_text_search_bbox_and_tf(spark):
    """Only in-bbox pages containing the term, ranked tf desc then url
    asc; the closed bbox keeps the (20, 20) edge page; matching is
    case-normalized on BOTH sides (term strip/lower, tokens lower)."""
    from geohash_dotnet_spark.operators.index import geo_text_search

    out = geo_text_search(_geo_pages(spark), " SPARK ", 0.0, 20.0,
                          0.0, 20.0, k=10, precision=2).collect()
    assert [(r["url"], r["tf"]) for r in out] == [
        ("https://x/a/2/0", 2), ("https://x/a/1/0", 1),
        ("https://x/a/6/0", 1)]


def test_geo_text_search_k_truncates(spark):
    from geohash_dotnet_spark.operators.index import geo_text_search

    out = geo_text_search(_geo_pages(spark), "spark", 0.0, 20.0,
                          0.0, 20.0, k=1, precision=2).collect()
    assert [(r["url"], r["tf"]) for r in out] == [("https://x/a/2/0", 2)]


def test_geo_text_search_validation(spark):
    from geohash_dotnet_spark.operators.index import geo_text_search

    with pytest.raises(ValueError):
        geo_text_search(None, "x", 10.0, 0.0, 0.0, 20.0)
    with pytest.raises(ValueError):
        geo_text_search(None, "x", 0.0, 10.0, 170.0, -170.0)


def test_geo_text_search_plan_semi_join_no_python(spark):
    """The covering prune is a broadcast LEFT SEMI join (no InSet blowup
    of the encode tree) and the whole pipeline stays JVM-side."""
    from geohash_dotnet_spark.operators.index import geo_text_search

    out = geo_text_search(_geo_pages(spark), "spark", 0.0, 20.0,
                          0.0, 20.0, k=5, precision=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
