"""Product quantization ANN (operators/similarity.py: pq_encode /
pq_topk): hand-verifiable codes and ADC distances on a 4-vector corpus,
plan shapes, validation."""

import pytest

from geohash_dotnet_spark.operators import pq_encode, pq_topk


@pytest.fixture(scope="module")
def emb4(spark):
    """ids 0-1 double as the codebook (n_codes=2), dim 4, n_sub=2:
    sub-centroids are [0,0]/[1,1] in both subspaces."""
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 1.0, 1.0, 1.0]),
        (2, [0.1, 0.0, 0.9, 1.0]),
        (3, [1.0, 1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_encode_hand_codes(spark, emb4):
    out = {r["vec_id"]: list(r["codes"])
           for r in pq_encode(emb4, n_sub=2, n_codes=2).collect()}
    # centroids encode to themselves; the others to the nearer sub-centroid
    assert out == {0: [0, 0], 1: [1, 1], 2: [0, 1], 3: [1, 0]}


def test_pq_topk_adc_hand_distances(spark, emb4):
    """Query = vector 0: per-subspace LUT distances are 0 (code 0) and
    2.0 (code 1), so ADC = 0 / 4.0 / 2.0 / 2.0 for ids 0/1/2/3; the
    2.0-tie breaks by vec_id asc."""
    qs = (emb4.filter("vec_id = 0")
          .selectExpr("vec_id as q_id", "embedding as q_vec"))
    out = [(r["rank"], r["vec_id"], r["adc_fp"], r["adc"])
           for r in pq_topk(emb4, qs, k=4, n_sub=2, n_codes=2)
           .orderBy("rank").collect()]
    assert out == [(1, 0, 0, 0.0), (2, 2, 2_000_000, 2.0),
                   (3, 3, 2_000_000, 2.0), (4, 1, 4_000_000, 4.0)]


def test_pq_encode_zero_exchange_projection(spark, emb4):
    """Codebook folds in as literals: encoding is a pure projection —
    no Exchange, no Python eval nodes."""
    out = pq_encode(emb4, n_sub=2, n_codes=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("Initial Plan")[0]
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_pq_topk_matches_exact_on_separable_corpus(spark):
    """On a corpus whose vectors sit exactly on distinct codebook
    points, ADC ranking equals exact L2 ranking (quantization error is
    zero by construction)."""
    rows = [(i, [float(i), float(i), 10.0 - i, 10.0 - i]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = (emb.filter("vec_id = 3")
          .selectExpr("vec_id as q_id", "embedding as q_vec"))
    out = [r["vec_id"] for r in
           pq_topk(emb, qs, k=8, n_sub=2, n_codes=8)
           .orderBy("rank").collect()]
    # exact L2 order from q=3: distance grows with |i-3|, ties -> id asc
    assert out == [3, 2, 4, 1, 5, 0, 6, 7]


def test_pq_validation(spark, emb4):
    with pytest.raises(ValueError):
        pq_encode(emb4, n_sub=3, n_codes=2)  # dim 4 not divisible
    with pytest.raises(ValueError):
        pq_encode(emb4, n_sub=2, n_codes=16)  # too few codebook vectors
