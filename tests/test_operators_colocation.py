"""Co-travel pair detection (operators/colocation.py)."""

from datetime import datetime

import pytest

from geohash_dotnet_spark.operators import cotravel_pairs

SCHEMA = "user_id long, ts timestamp, lat double, lon double"

# distinct geohash p1 cells
BERLIN = (52.5, 13.4)     # u
NYC = (40.7, -74.0)       # d
TOKYO = (35.7, 139.7)     # x


def _ev(uid, minute, lat, lon):
    return (uid, datetime(2024, 1, 1, 0, minute), lat, lon)


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    return {(r["user_a"], r["user_b"]): (r["n_cobuckets"], r["n_tiles"])
            for r in cotravel_pairs(df, **kw).collect()}


def test_planted_pair(spark):
    """Users 1+2 share three 15-min buckets (two tiles); user 3 shares
    only one bucket with user 1 and is filtered by min_cobuckets=2."""
    rows = [
        # bucket 0 (minutes 0-14), Berlin: users 1, 2, 3
        _ev(1, 0, *BERLIN), _ev(2, 5, *BERLIN), _ev(3, 9, *BERLIN),
        # bucket 1 (minutes 15-29), Berlin: users 1, 2
        _ev(1, 16, *BERLIN), _ev(2, 20, *BERLIN),
        # bucket 2 (minutes 30-44), NYC: users 1, 2
        _ev(1, 31, *NYC), _ev(2, 40, *NYC),
        # bucket 2, Tokyo: user 3 alone (singleton cell, never paired)
        _ev(3, 33, *TOKYO),
    ]
    out = _pairs(spark, rows, precision=1, bucket_s=900, min_cobuckets=2)
    assert out == {(1, 2): (3, 2)}


def test_duplicate_pings_collapse(spark):
    """A user pinging 10x in one cell+bucket counts as ONE presence —
    co-bucket counts are presence-based, not event-volume-based."""
    rows = ([_ev(1, m, *BERLIN) for m in range(10)]
            + [_ev(2, 3, *BERLIN)]
            + [_ev(1, 20, *NYC), _ev(2, 25, *NYC)])
    out = _pairs(spark, rows, precision=1, bucket_s=900, min_cobuckets=1)
    assert out == {(1, 2): (2, 2)}


def test_crowd_cell_excluded(spark):
    """A cell above max_cell_users contributes no pairs at all."""
    crowd = [_ev(u, 1, *BERLIN) for u in range(10)]          # 10 users
    quiet = [_ev(1, 20, *NYC), _ev(2, 22, *NYC),
             _ev(1, 35, *TOKYO), _ev(2, 40, *TOKYO)]
    out = _pairs(spark, crowd + quiet, precision=1, bucket_s=900,
                 min_cobuckets=1, max_cell_users=5)
    # the Berlin crowd cell is dropped: only NYC+Tokyo evidence remains
    assert out == {(1, 2): (2, 2)}
    # with the cap lifted, the crowd cell floods in 10*9/2 extra pairs
    out2 = _pairs(spark, crowd + quiet, precision=1, bucket_s=900,
                  min_cobuckets=1, max_cell_users=200)
    assert len(out2) == 45 and out2[(1, 2)] == (3, 3)


def test_layout_independent(spark):
    rows = [_ev(u, m, *(BERLIN if (u + m) % 3 else NYC))
            for u in range(6) for m in range(0, 50, 7)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, cotravel_pairs(df, precision=1,
                                         bucket_s=900).collect()))
    b = sorted(map(tuple, cotravel_pairs(df.repartition(7, "ts"),
                                         precision=1,
                                         bucket_s=900).collect()))
    assert a == b and len(a) > 0


def test_no_nested_loop_join(spark):
    """The pair stage must be an equi-join on (tile, bucket) — never a
    cartesian/BNLJ — and the plan carries no raw-event window."""
    rows = [_ev(u, m, *BERLIN) for u in range(3) for m in range(3)]
    df = spark.createDataFrame(rows, SCHEMA)
    plan = cotravel_pairs(df, precision=1,
                          bucket_s=900)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_param_validation(spark):
    df = spark.createDataFrame([_ev(1, 0, *BERLIN)], SCHEMA)
    with pytest.raises(ValueError):
        cotravel_pairs(df, min_cobuckets=0)
    with pytest.raises(ValueError):
        cotravel_pairs(df, max_cell_users=1)


def test_place_profiles_known_jaccard(spark):
    """Hand-built profiles (p3 cells ~1.4 deg; coordinates placed in
    distinct cells): u1={A,B,C}, u2={A,B,D}, u3={E}.
    J(u1,u2)=2/4=0.5, u3 shares nothing."""
    from geohash_dotnet_spark.operators.colocation import (
        place_profile_pairs)

    A, B, C, D, E = ((10.0, 10.0), (10.0, 20.0), (10.0, 30.0),
                     (10.0, 40.0), (-50.0, -120.0))
    rows = ([(1, *p) for p in (A, B, C)] + [(2, *p) for p in (A, B, D)]
            + [(3, *E)])
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    out = place_profile_pairs(df, precision=3, threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["user_a"], r["user_b"]) == (1, 2)
    assert (r["n_common"], r["n_a"], r["n_b"]) == (2, 3, 3)
    assert r["jaccard"] == 0.5
    # threshold just above 0.5 excludes the pair (integer boundary test)
    assert not place_profile_pairs(df, precision=3,
                                   threshold=0.500001).collect()


def test_place_profiles_crowd_cell_excluded(spark):
    """A cell visited by more than max_cell_users contributes to
    neither pairing nor profile sizes."""
    from geohash_dotnet_spark.operators.colocation import (
        place_profile_pairs)

    HOT = (0.0, 0.0)
    A, B = (10.0, 10.0), (10.0, 20.0)
    rows = ([(u, *HOT) for u in range(1, 8)]          # 7 users in HOT
            + [(1, *A), (1, *B), (2, *A), (2, *B)])
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    out = place_profile_pairs(df, precision=3, threshold=0.9,
                              max_cell_users=3).collect()
    # HOT dropped: u1={A,B}, u2={A,B} -> J=1.0; all other users have
    # empty profiles and appear in no pair
    assert [(r["user_a"], r["user_b"], r["n_common"], r["jaccard"])
            for r in out] == [(1, 2, 2, 1.0)]


def test_place_profiles_duplicates_collapse(spark):
    """Repeated visits to the same cell count once (set semantics)."""
    from geohash_dotnet_spark.operators.colocation import (
        place_profile_pairs)

    A = (10.0, 10.0)
    rows = [(1, *A)] * 50 + [(2, *A)]
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    out = place_profile_pairs(df, precision=3, threshold=0.5).collect()
    assert [(r["n_common"], r["n_a"], r["n_b"]) for r in out] == [(1, 1, 1)]


def test_place_profiles_validation(spark):
    from geohash_dotnet_spark.operators.colocation import (
        place_profile_pairs)

    with pytest.raises(ValueError):
        place_profile_pairs(None, threshold=0.0)
    with pytest.raises(ValueError):
        place_profile_pairs(None, threshold=1.5)
    with pytest.raises(ValueError):
        place_profile_pairs(None, max_cell_users=1)


def test_place_profiles_threshold_below_micro_unit(spark):
    """A threshold that rounds to 0 in the exact micro-unit integer
    comparison (thr_us = 0 admits EVERY pair) is rejected up front."""
    from geohash_dotnet_spark.operators.colocation import (
        place_profile_pairs)

    with pytest.raises(ValueError, match="micro-unit"):
        place_profile_pairs(None, threshold=1e-9)
    # 1e-6 is the smallest expressible threshold and must be accepted
    # (validation only — df=None never reaches the plan builder here)
    with pytest.raises(AttributeError):
        place_profile_pairs(None, threshold=1e-6)
