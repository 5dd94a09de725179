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
