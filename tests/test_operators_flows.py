"""OD tile flows (operators/flows.py)."""

from datetime import datetime

from geohash_dotnet_spark.operators import tile_flows


def _ev(uid, second, lat, lon, eid):
    return (uid, datetime(2024, 1, 1, 0, 0, second), lat, lon, eid)


SCHEMA = "user_id long, ts timestamp, lat double, lon double, event_id long"

# p1-cell anchor points (distinct geohash p1 cells)
BERLIN = (52.5, 13.4)     # u
NYC = (40.7, -74.0)       # d
TOKYO = (35.7, 139.7)     # x


def test_known_transitions(spark):
    rows = [
        _ev(1, 0, *BERLIN, 10), _ev(1, 1, *NYC, 11),   # u -> d
        _ev(1, 2, *NYC, 12),                            # d -> d (self)
        _ev(1, 3, *TOKYO, 13),                          # d -> x
        _ev(2, 0, *BERLIN, 20), _ev(2, 1, *NYC, 21),   # u -> d again
    ]
    out = {(r["from_tile"], r["to_tile"]): (r["n_moves"], r["n_users"])
           for r in tile_flows(spark.createDataFrame(rows, SCHEMA),
                               precision=1,
                               tiebreak="event_id").collect()}
    assert out == {("u", "d"): (2, 2), ("d", "x"): (1, 1)}


def test_tiebreak_orders_equal_timestamps(spark):
    """Same-ts events must order by the tiebreak, not arrival order."""
    rows = [
        _ev(1, 0, *NYC, 2),      # second by event_id
        _ev(1, 0, *BERLIN, 1),   # first by event_id
        _ev(1, 1, *TOKYO, 3),
    ]
    out = {(r["from_tile"], r["to_tile"])
           for r in tile_flows(spark.createDataFrame(rows, SCHEMA),
                               precision=1,
                               tiebreak="event_id").collect()}
    assert out == {("u", "d"), ("d", "x")}


def test_layout_independent(spark):
    rows = ([_ev(u, s, *(BERLIN if (u + s) % 2 else NYC), u * 100 + s)
             for u in range(5) for s in range(6)])
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, tile_flows(df, precision=1,
                                     tiebreak="event_id").collect()))
    b = sorted(map(tuple, tile_flows(df.repartition(7), precision=1,
                                     tiebreak="event_id").collect()))
    assert a == b and a


def test_user_mobility_known_values(spark):
    """Hand-check: centroid and rog of two symmetric points."""
    from geohash_dotnet_spark.operators import user_mobility

    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (1, 12.0, 22.0),   # centroid (11, 21), rog = sqrt(2)
         (2, 5.0, 5.0)],                     # single point: rog 0
        "user_id long, lat double, lon double")
    out = {r["user_id"]: r for r in user_mobility(df).collect()}
    assert out[1]["c_lat"] == 11.0 and out[1]["c_lon"] == 21.0
    assert abs(out[1]["rog_deg"] - 2.0 ** 0.5) < 1e-9
    assert out[2]["rog_deg"] == 0.0 and out[2]["n_events"] == 1


def test_user_mobility_layout_independent(spark):
    from geohash_dotnet_spark.operators import user_mobility

    rows = [(u, 10.0 + 0.01 * s, -40.0 + 0.02 * s)
            for u in range(10) for s in range(20)]
    df = spark.createDataFrame(rows, "user_id long, lat double, lon double")
    a = sorted(map(tuple, user_mobility(df).collect()))
    b = sorted(map(tuple, user_mobility(df.repartition(7)).collect()))
    assert a == b
