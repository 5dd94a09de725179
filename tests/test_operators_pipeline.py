"""Training-data pipeline operators: decontamination, repetition stats,
stratified sampling (operators/pipeline.py)."""

import pytest
from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import (
    contamination_stats,
    repetition_stats,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet")


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------

def test_contamination_flags_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    train = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),   # heavy overlap
         (11, "umber vole wren xeno yak zebu"),         # clean
         (12, "tiny")],                                 # no 3-grams at all
        ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in contamination_stats(train, bench, n=3,
                                        threshold=0.2).collect()}
    # doc 10: grams 1-4 of 4 hit the benchmark's 3 grams
    assert out[10]["n_overlap"] == 3 and out[10]["contaminated"] == 1
    assert out[11]["n_overlap"] == 0 and out[11]["contaminated"] == 0
    assert out[12]["n_grams"] == 0 and out[12]["contamination"] == 0.0


def test_contamination_corpus_not_shuffled(docs):
    """The only exchanges carry overlap hits / per-doc counts — the
    corpus-side gram explode must feed a BroadcastHashJoin, never a
    SortMergeJoin (which would shuffle the corpus on the gram key)."""
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    tr = docs.filter(F.col("doc_id") % 17 != 0)
    plan = (contamination_stats(tr, ev)._jdf.queryExecution()
            .executedPlan().toString())
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_contamination_self_overlap_is_total(docs):
    """Every doc scored against the whole corpus as benchmark is fully
    contaminated (its own grams are benchmark grams)."""
    some = docs.limit(50)
    out = contamination_stats(some, docs, n=3, threshold=0.2)
    bad = out.filter((F.col("n_grams") > 0)
                     & (F.col("n_overlap") != F.col("n_grams"))).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# repetition
# ---------------------------------------------------------------------------

def test_repetition_known_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"),       # 6 tokens, 2 distinct; "a b" 3 of 5 grams
         (2, "v w x y z"),         # all distinct; every bigram unique
         (3, "solo")],             # 1 token, no bigrams
        ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in repetition_stats(df, n=2).collect()}
    assert out[1]["dup_word_frac"] == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert out[1]["n_total_ngrams"] == 5
    assert out[1]["top_ngram_share"] == pytest.approx(3 / 5, abs=1e-6)
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["top_ngram_share"] == pytest.approx(1 / 4, abs=1e-6)
    assert out[3]["n_total_ngrams"] == 0
    assert out[3]["top_ngram_share"] == 0.0


def test_repetition_partial_aggregation(docs):
    """Word-count shape: the (id, gram) count must run map-side partial
    aggregation before the exchange."""
    plan = (repetition_stats(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "partial_count" in plan or "partial count" in plan.lower()


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def test_stratified_rates_and_determinism(docs):
    rates = {"en": 0.5, "de": 0.2}
    kept = stratified_sample(docs, rates, default_rate=0.0)
    got = {r["lang"]: r["n"] for r in
           kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # only configured strata survive; frequencies near the rate
    assert set(got) <= {"en", "de"}
    for lang, rate in rates.items():
        if totals.get(lang, 0) >= 50:
            assert abs(got.get(lang, 0) / totals[lang] - rate) < 0.2
    # same ids regardless of layout (repartition shouldn't change the set)
    a = {r["doc_id"] for r in kept.select("doc_id").collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs.repartition(17), rates, default_rate=0.0)
         .select("doc_id").collect()}
    assert a == b and len(a) > 0


def test_stratified_salt_decorrelates(docs):
    rates = {"en": 0.5}
    a = {r["doc_id"] for r in
         stratified_sample(docs, rates, salt="mixA").select("doc_id").collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs, rates, salt="mixB").select("doc_id").collect()}
    assert a != b  # different draws
    # but overlap is ~rate^2 of the stratum, i.e. both still near-half
    n_en = docs.filter(F.col("lang") == "en").count()
    if n_en >= 100:
        assert 0.1 < len(a & b) / n_en < 0.45


def test_stratified_zero_shuffle(docs):
    """Pure projection + filter: no Exchange anywhere in the plan."""
    plan = (stratified_sample(docs, {"en": 0.5})
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

def test_pii_scrub_known_values(spark):
    from geohash_dotnet_spark.operators import with_pii_scrubbed

    df = spark.createDataFrame(
        [(1, "mail a.b-c_d@sub.example.org now"),
         (2, "server at 192.168.0.1 and 10.0.0.255"),
         (3, "call +44-123-4567 twice +1-555-0000"),
         (4, "clean text, no pii 1.2.3 not-an-ip")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in with_pii_scrubbed(df).collect()}
    assert out[1]["n_emails"] == 1
    assert out[1]["text_scrubbed"] == "mail <EMAIL> now"
    assert out[2]["n_ipv4"] == 2
    assert out[2]["text_scrubbed"] == "server at <IP> and <IP>"
    assert out[3]["n_phones"] == 2
    assert out[4]["n_emails"] == 0 and out[4]["n_ipv4"] == 0
    assert out[4]["text_scrubbed"] == out[4]["text"]


def test_pii_scrub_zero_shuffle(docs):
    from geohash_dotnet_spark.operators import with_pii_scrubbed

    plan = (with_pii_scrubbed(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# shard packing / vocabulary
# ---------------------------------------------------------------------------

def test_pack_shards_budget_rule(spark):
    from geohash_dotnet_spark.operators import pack_shards

    df = spark.createDataFrame(
        [(i, 600) for i in range(10)] + [(100, 5000)],
        ["doc_id", "n_tokens"])
    out = pack_shards(df, budget=1000, n_buckets=1).collect()
    by_id = {r["doc_id"]: r["shard"] for r in out}
    # exclusive cumsum: docs 0,1 -> shard 0 (0,600); doc 2 starts at 1200
    assert by_id[0] == 0 and by_id[1] == 0 and by_id[2] == 1
    # the oversized doc still gets exactly one shard (no spill/split)
    assert len({r["shard"] for r in out if r["doc_id"] == 100}) == 1


def test_pack_shards_layout_independent(docs):
    from geohash_dotnet_spark.operators import pack_shards
    from geohash_dotnet_spark.operators.text import with_token_stats

    d = with_token_stats(docs)
    a = {(r["doc_id"], r["bucket"], r["shard"])
         for r in pack_shards(d, budget=2000).select(
             "doc_id", "bucket", "shard").collect()}
    b = {(r["doc_id"], r["bucket"], r["shard"])
         for r in pack_shards(d.repartition(13), budget=2000).select(
             "doc_id", "bucket", "shard").collect()}
    assert a == b and len(a) > 0


def test_pack_shards_auto_buckets_default_parallelism(spark):
    """n_buckets=None auto-sizes to defaultParallelism so the per-bucket
    sort never bottlenecks on a handful of tasks (round-3 VERDICT)."""
    from geohash_dotnet_spark.operators import pack_shards

    df = spark.createDataFrame([(i, 100) for i in range(1000)],
                               ["doc_id", "n_tokens"])
    out = pack_shards(df, budget=500)
    dp = spark.sparkContext.defaultParallelism
    buckets = {r["bucket"] for r in out.select("bucket").distinct().collect()}
    # 1000 md5-spread ids over 8 buckets: every bucket is hit, none exceeds
    assert buckets == set(range(dp))


def test_vocab_topk_no_global_sort_of_corpus(docs):
    """Top-k must be TakeOrderedAndProject over the vocabulary counts,
    never a full Sort of the exploded corpus."""
    from geohash_dotnet_spark.operators import vocab_topk

    plan = (vocab_topk(docs, k=50)._jdf.queryExecution()
            .executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------

def test_semantic_dedup_planted_duplicate(spark):
    from geohash_dotnet_spark.operators import semantic_dedup

    import numpy as np
    rng = np.random.RandomState(7)
    base = rng.randn(40, 8).astype("float32")
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    # plant: vec 35 is a near-copy of vec 3
    rows[35] = (35, [float(x) for x in (base[3] + 0.01 * base[35] * 0)])
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r.asDict()
           for r in semantic_dedup(df, threshold=0.99,
                                   n_centroids=4).collect()}
    assert 35 in out and out[35]["dup_of"] == 3
    assert out[35]["cosine"] >= 0.99


def test_semantic_dedup_cluster_guard_bounds_candidates(spark):
    """Degenerate all-one-cluster corpus (round-3 VERDICT item 4): 200
    identical vectors collapse onto centroid 0; the md5 sub-bucket guard
    must keep the candidate-pair count near C * max² instead of the
    unguarded quadratic C(200,2)=19900, with every sub-bucket bounded."""
    from pyspark.sql import functions as F

    from geohash_dotnet_spark.operators.similarity import (
        _coarse_assign, _semantic_candidates, _sub_bucketed, semantic_dedup)

    emb = spark.createDataFrame([(i, [1.0, 0.0]) for i in range(200)],
                                "vec_id long, embedding array<double>")
    cents = (emb.filter(F.col("vec_id") < 16)
             .select(F.col("vec_id").alias("cid"),
                     F.col("embedding").alias("c_vec")))
    cent_rows = sorted(cents.collect(), key=lambda r: r["cid"])
    assigned = _coarse_assign(emb, cent_rows, "embedding", "vec_id")
    # identical vectors tie on cosine -> lowest cid wins -> one cluster
    assert assigned.select("cid").distinct().count() == 1

    free = _semantic_candidates(
        _sub_bucketed(assigned, "vec_id", 10**9), "embedding", "vec_id")
    assert free.count() == 200 * 199 // 2  # unguarded quadratic

    guarded_tagged = _sub_bucketed(assigned, "vec_id", 10)
    sizes = [r["n"] for r in guarded_tagged.groupBy("cid", "sub")
             .agg(F.count(F.lit(1)).alias("n")).collect()]
    assert len(sizes) == 20 and max(sizes) <= 30  # ceil(200/10) buckets
    guarded = _semantic_candidates(guarded_tagged, "embedding", "vec_id")
    n_guard = guarded.count()
    assert n_guard < free.count() / 5  # bounded, not quadratic

    # the guard still finds duplicates (identical vectors in-bucket)
    dups = semantic_dedup(emb, threshold=0.99, max_cluster_size=10)
    assert dups.count() == 200 - 20  # every non-minimum id per sub-bucket


def test_semantic_dedup_no_cross_join(spark, sf_small):
    from geohash_dotnet_spark.operators import semantic_dedup

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    plan = (semantic_dedup(emb, threshold=0.4)._jdf.queryExecution()
            .executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# URL canonicalization
# ---------------------------------------------------------------------------

def test_canonical_url_known_forms(spark):
    from geohash_dotnet_spark.operators import with_canonical_url

    df = spark.createDataFrame(
        [(1, "HTTPS://WWW.Ex.com/p?b=2&a=1#frag"),
         (2, "https://ex.com/p?a=1&b=2"),
         (3, "https://ex.com/p/"),
         (4, "http://ex.com/")],
        ["i", "url"])
    out = {r["i"]: r["canon_url"]
           for r in with_canonical_url(df).collect()}
    assert out[1] == out[2] == "https://ex.com/p?a=1&b=2"
    assert out[3] == "https://ex.com/p"
    assert out[4] == "http://ex.com"


def test_canonical_url_zero_shuffle(docs):
    from geohash_dotnet_spark.operators import with_canonical_url
    from pyspark.sql import functions as F

    d = docs.withColumn("url", F.concat(F.lit("https://x.com/"),
                                        F.col("doc_id").cast("string")))
    plan = (with_canonical_url(d)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) — re-normalizing must be a no-op."""
    from geohash_dotnet_spark.operators import with_canonical_url

    urls = [(i, u) for i, u in enumerate([
        "HTTPS://WWW.Ex.com/p?b=2&a=1#frag",
        "https://ex.com/a/b/?z=1&y=2&x=3",
        "http://WWW.site.org/#top",
        "ftp://Host.Net/Dir/",
    ])]
    df = spark.createDataFrame(urls, ["i", "url"])
    once = with_canonical_url(df).select(
        "i", F.col("canon_url").alias("url"))
    twice = with_canonical_url(once)
    diff = twice.filter(F.col("url") != F.col("canon_url")).count()
    assert diff == 0


# ---------------------------------------------------------------------------
# cross-document boilerplate
# ---------------------------------------------------------------------------

def test_boilerplate_planted_banner(spark):
    """A banner shared by most docs is flagged; unique tails are not."""
    from geohash_dotnet_spark.operators import boilerplate_stats

    banner = "accept all cookies to continue"
    rows = [(i, f"{banner} unique{i} tail{i} words{i}") for i in range(10)]
    rows.append((99, "totally unrelated text about nothing shared here"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in boilerplate_stats(df, n=2, min_df=0.5).collect()}
    # banner bigrams (4 of them) appear in 10 of 11 docs >= ceil(5.5)=6;
    # every other bigram is doc-unique
    assert out[0]["n_boiler"] == 4
    assert out[0]["n_shingles"] == 7
    assert out[99]["n_boiler"] == 0
    assert out[99]["boiler_frac"] == 0.0


def test_boilerplate_hot_set_is_broadcast(docs):
    """The per-doc recount joins against a BROADCAST hot set — the
    pairs side must not be shuffled into a sort-merge/hash exchange
    for that join."""
    from geohash_dotnet_spark.operators import boilerplate_stats

    plan = (boilerplate_stats(docs, n=2, min_df=0.05)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


# ---------------------------------------------------------------------------
# per-domain quota (skew-proof top-k per key)
# ---------------------------------------------------------------------------

def test_domain_topk_matches_naive_window(spark):
    """Two-level tournament is EXACT: equals the one-stage window on a
    skewed corpus (one domain holding 90% of rows), with ties on score
    broken by the tiebreak column."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from geohash_dotnet_spark.operators import domain_topk

    rows = [("big.example", f"u{i:04d}", i % 7) for i in range(900)]
    rows += [(f"site{i}.example", f"v{i:04d}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "domain string, url string, score long")

    got = {(r["domain"], r["rk"], r["url"])
           for r in domain_topk(df, k=3, n_salt=8).collect()}
    w = Window.partitionBy("domain").orderBy(F.col("score").desc(),
                                             F.col("url").asc())
    want = {(r["domain"], r["rk"], r["url"])
            for r in df.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3).collect()}
    assert got == want and len(got) == 3 + 100


def test_domain_topk_stage2_input_is_bounded(spark):
    """Stage 1 must cut a hot domain to <= k*n_salt survivors before the
    per-domain ranking — the property that removes the mega-site
    straggler at 10^12 pages."""
    from pyspark.sql import functions as F

    from geohash_dotnet_spark.operators import domain_topk
    from geohash_dotnet_spark.operators.dedup import md5_60bit

    k, n_salt = 2, 4
    df = spark.createDataFrame(
        [("hot.example", f"u{i:05d}", i) for i in range(5000)],
        "domain string, url string, score long")
    # replicate stage 1 and count survivors per domain
    from pyspark.sql import Window
    w1 = (Window.partitionBy("domain", "__salt")
          .orderBy(F.col("score").desc(), F.col("url").asc()))
    survivors = (df.withColumn("__salt",
                               F.pmod(md5_60bit(F.col("url").cast("string")),
                                      F.lit(n_salt)))
                 .withColumn("__r1", F.row_number().over(w1))
                 .filter(F.col("__r1") <= k).count())
    assert survivors <= k * n_salt
    out = domain_topk(df, k=k, n_salt=n_salt).collect()
    assert [r["url"] for r in sorted(out, key=lambda r: r["rk"])] == \
        ["u04999", "u04998"]


def test_mixture_weights_known_values(spark):
    """alpha=0.5 weights on a 40/10/1 corpus: sqrt masses 2e6/1e6 + the
    singleton; weights sum to 1 and the tail domain is boosted."""
    from geohash_dotnet_spark.operators import mixture_weights

    rows = ([("a",)] * 40) + ([("b",)] * 10) + [("c",)]
    df = spark.createDataFrame(rows, "domain string")
    out = {r["domain"]: r for r in mixture_weights(df).collect()}
    wq = {d: round((n ** 0.5) * 1e6) for d, n in
          {"a": 40, "b": 10, "c": 1}.items()}
    s = sum(wq.values())
    for d in "abc":
        assert out[d]["weight"] == wq[d] / s
        assert out[d]["natural_share"] == {"a": 40, "b": 10, "c": 1}[d] / 51
    assert abs(sum(r["weight"] for r in out.values()) - 1.0) < 1e-12
    assert out["c"]["boost"] > 1.0 > out["a"]["boost"]


def test_mixture_weights_alpha1_is_proportional(spark):
    """alpha=1 must reproduce natural shares EXACTLY (quantization is
    lossless for integer masses), boost == 1 for every domain."""
    from geohash_dotnet_spark.operators import mixture_weights

    df = spark.range(300).selectExpr("CAST(id % 7 AS STRING) AS domain")
    for r in mixture_weights(df, alpha=1.0).collect():
        assert r["weight"] == r["natural_share"]
        assert r["boost"] == 1.0


def test_mixture_weights_size_col_mass(spark):
    """size_col switches the mass from doc count to token mass."""
    from geohash_dotnet_spark.operators import mixture_weights

    df = spark.createDataFrame(
        [("a", 90), ("a", 10), ("b", 25)], "domain string, n_tokens int")
    out = {r["domain"]: r for r in
           mixture_weights(df, alpha=1.0, size_col="n_tokens").collect()}
    assert out["a"]["n_docs"] == 100 and out["b"]["n_docs"] == 25
    assert out["a"]["weight"] == 0.8 and out["b"]["weight"] == 0.2


def test_mixture_weights_single_corpus_scan(spark):
    """The domain agg must be computed ONCE: the global-total branch
    reuses the domain exchange (ReusedExchange in the final adaptive
    plan), so the corpus is scanned exactly once at 100 TB."""
    from geohash_dotnet_spark.operators import mixture_weights

    df = spark.range(500).selectExpr("CAST(id % 13 AS STRING) AS domain")
    out = mixture_weights(df)
    out.collect()
    head = (out._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0])
    assert head.count("Range (0, 500") == 1
    assert "ReusedExchange" in head


# ---------------------------------------------------------------------------
# sample_exact_n
# ---------------------------------------------------------------------------

def test_sample_exact_n_matches_naive_order(docs):
    """The bucketed two-stage rank must equal the naive global
    orderBy(hash).limit(n) — same rows, same ranks."""
    from geohash_dotnet_spark.operators import sample_exact_n
    from geohash_dotnet_spark.operators.dedup import md5_60bit

    n = 23
    got = {(r["doc_id"], r["rnk"])
           for r in sample_exact_n(docs.select("doc_id"), n).collect()}
    h = md5_60bit(F.concat(F.lit("sample1"),
                           F.col("doc_id").cast("string")))
    naive = (docs.select("doc_id").withColumn("__h", h)
             .orderBy("__h", "doc_id").limit(n).collect())
    want = {(r["doc_id"], i + 1) for i, r in enumerate(naive)}
    assert got == want and len(got) == n


def test_sample_exact_n_layout_independent(docs):
    """Same rows + ranks regardless of input partitioning."""
    from geohash_dotnet_spark.operators import sample_exact_n

    d = docs.select("doc_id")
    a = {(r["doc_id"], r["rnk"])
         for r in sample_exact_n(d, 31).collect()}
    b = {(r["doc_id"], r["rnk"])
         for r in sample_exact_n(d.repartition(7), 31).collect()}
    assert a == b


def test_sample_exact_n_frac_hint_exact(docs):
    """The frac_hint scan-side cut must not change the result when the
    hint is honest (true frac <= hint)."""
    from geohash_dotnet_spark.operators import sample_exact_n

    d = docs.select("doc_id")
    total = d.count()
    n = max(1, total // 10)
    a = {(r["doc_id"], r["rnk"])
         for r in sample_exact_n(d, n).collect()}
    b = {(r["doc_id"], r["rnk"])
         for r in sample_exact_n(d, n, frac_hint=n / total).collect()}
    assert a == b and len(a) == n


def test_sample_exact_n_oversized_n_returns_all(spark):
    """n beyond the corpus returns every row with contiguous ranks."""
    from geohash_dotnet_spark.operators import sample_exact_n

    d = spark.range(40).withColumnRenamed("id", "doc_id")
    out = sample_exact_n(d, 10_000).collect()
    assert len(out) == 40
    assert sorted(r["rnk"] for r in out) == list(range(1, 41))


def test_sample_exact_n_no_driver_side_topk(docs):
    """Scale shape: the plan must NOT contain TakeOrderedAndProject (a
    driver-side merge of per-partition top-n) nor a global
    single-partition sort of the corpus; the only unpartitioned window
    runs over the <=2**bucket_bits-row per-bucket totals."""
    from geohash_dotnet_spark.operators import sample_exact_n

    out = sample_exact_n(docs.select("doc_id"), 23)
    out.collect()
    head = (out._jdf.queryExecution().executedPlan().toString()
            .split("Initial Plan")[0])
    assert "TakeOrderedAndProject" not in head


def test_sample_exact_n_grouped_quota(docs):
    """group_col: exactly n per group, ranks restarting per group,
    equal to the per-group naive window."""
    from pyspark.sql import Window
    from geohash_dotnet_spark.operators import sample_exact_n
    from geohash_dotnet_spark.operators.dedup import md5_60bit

    d = docs.select("doc_id", "lang")
    n = 7
    got = {(r["lang"], r["doc_id"], r["rnk"])
           for r in sample_exact_n(d, n, group_col="lang").collect()}
    h = md5_60bit(F.concat(F.lit("sample1"),
                           F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    want = {(r["lang"], r["doc_id"], r["rnk"]) for r in
            d.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= n).collect()}
    assert got == want
    per_group = {}
    for lang, _, _ in got:
        per_group[lang] = per_group.get(lang, 0) + 1
    assert all(v == n for v in per_group.values())
