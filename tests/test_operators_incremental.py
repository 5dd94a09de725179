"""Cross-snapshot MinHash dedup (operators/dedup.py
minhash_lsh_pairs_cross) and the hashed-ngram linear classifier
(operators/lm.py hashed_linear_score)."""

from pyspark.sql import functions as F

from geohash_dotnet_spark.operators import hashed_linear_score
from geohash_dotnet_spark.operators.dedup import minhash_lsh_pairs_cross

BASE = ("the quick brown fox jumps over the lazy dog while seventeen "
        "geese migrate south across the wide cold river every autumn")


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_minhash_planted_dups(spark):
    old = _corpus(spark, [
        (1, BASE),
        (2, "completely unrelated text about spark catalyst optimizer "
            "plans and adaptive query execution at terabyte scale"),
        (3, BASE + " with a tiny suffix"),
    ])
    new = _corpus(spark, [
        (101, BASE),                          # exact dup of 1, near 3
        (102, "nothing like anything else here at all in any words "
              "zebra quartz lantern"),
    ])
    got = {(r["id_new"], r["id_old"]): r["jaccard"]
           for r in minhash_lsh_pairs_cross(new, old,
                                            threshold=0.5).collect()}
    assert got[(101, 1)] == 1.0
    assert got[(101, 3)] >= 0.5
    assert all(k[0] == 101 for k in got), got  # 102 matches nothing


def test_cross_minhash_no_old_old_pairs(spark):
    """The band join is new x old only: old-corpus near-dup pairs must
    NOT appear (that's the self-join operator's job)."""
    old = _corpus(spark, [(1, BASE), (2, BASE)])     # old-side exact dups
    new = _corpus(spark, [(50, "entirely different words everywhere "
                               "nothing shared with the base text")])
    assert minhash_lsh_pairs_cross(new, old, threshold=0.5).count() == 0


def test_classifier_feature_count_and_bounds(spark):
    docs = _corpus(spark, [(1, "alpha beta gamma"), (2, "solo")])
    out = {r["doc_id"]: r for r in hashed_linear_score(docs).collect()}
    # unigrams + bigrams: 3 + 2 and 1 + 0
    assert out[1]["n_feats"] == 5
    assert out[2]["n_feats"] == 1
    for r in out.values():
        assert -1.0 <= r["logit"] <= 1.0
        assert r["label"] == (1 if r["logit"] >= 0 else 0)


def test_classifier_deterministic_across_layouts(spark):
    rows = [(i, f"word{i} word{(i * 7) % 13} word{(i * 3) % 5} end")
            for i in range(40)]
    df = _corpus(spark, rows)
    a = sorted(map(tuple, hashed_linear_score(df.coalesce(1)).collect()))
    b = sorted(map(tuple, hashed_linear_score(df.repartition(9)).collect()))
    assert a == b


def test_classifier_no_weight_table_join(spark):
    """The frozen-weight lookup compiles into the projection: no join
    node, and the only exchange is the final id-keyed aggregation."""
    docs = _corpus(spark, [(1, "a b c"), (2, "d e")])
    plan = (hashed_linear_score(docs)
            ._jdf.queryExecution().executedPlan().toString())
    for node in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct"):
        assert node not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_prep_bands_drops_shingleless_docs(spark):
    """Docs shorter than n tokens have no shingles; they must not reach
    the banding stage at all (they would all share the identity MinHash
    signature and band-match each other quadratically — the verify join
    discards the pairs, but only after paying for them)."""
    from geohash_dotnet_spark.operators.dedup import _prep_bands

    df = _corpus(spark, [(1, "one two"), (2, "so short"), (3, ""),
                         (4, BASE)])
    sh, banded = _prep_bands(df, "doc_id", "text", n=3,
                             num_hashes=128, bands=32,
                             persist_shingles=False)
    assert sh.count() == 4                       # shingle arrays keep all
    assert banded.select("id").distinct().collect() == [  # bands: only 4
        spark.createDataFrame([(4,)], "id long").collect()[0]]


def test_cross_minhash_short_docs_no_pairs(spark):
    """All-short snapshots: zero candidates, zero pairs (not |new|x|old|)."""
    old = _corpus(spark, [(i, "tiny doc") for i in range(1, 6)])
    new = _corpus(spark, [(100 + i, "also tiny") for i in range(5)])
    assert minhash_lsh_pairs_cross(new, old, threshold=0.5).count() == 0
