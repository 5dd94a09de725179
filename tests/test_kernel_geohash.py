"""Golden-vector tests for the geohash kernels.

Vectors come from /root/reference/tests/GeohasherTests.cs (cited per test).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geohash_dotnet_spark.kernels import geohash as K


# --- reference midpoint-halving encode (slow twin used only as an oracle;
#     mirrors src/Geohasher.cs:62-105 bit-for-bit) ---
def _encode_halving(lat: float, lng: float, precision: int) -> str:
    lat = min(max(lat, -90.0), 90.0)
    lng = ((lng + 180.0) % 360.0)
    if lng < 0:
        lng += 360.0
    lng -= 180.0
    lat_min, lat_max, lon_min, lon_max = -90.0, 90.0, -180.0, 180.0
    is_lon, ch, bit = True, 0, 0
    out = []
    while len(out) < precision:
        if is_lon:
            mid = (lon_min + lon_max) * 0.5
            if lng >= mid:
                ch = (ch << 1) | 1
                lon_min = mid
            else:
                ch <<= 1
                lon_max = mid
        else:
            mid = (lat_min + lat_max) * 0.5
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_min = mid
            else:
                ch <<= 1
                lat_max = mid
        is_lon = not is_lon
        bit += 1
        if bit == 5:
            out.append(K.BASE32[ch])
            bit, ch = 0, 0
    return "".join(out)


# tests/GeohasherTests.cs:161-175
ENCODE_GOLDENS = [
    (0, 0, 6, "s00000"),
    (40.7128, -74.0060, 6, "dr5reg"),
    (-33.8688, 151.2093, 6, "r3gx2f"),
    (35.6895, 139.6917, 6, "xn774c"),
    (-22.9083, -43.1964, 6, "75cm9j"),
    (-33.9249, 18.4241, 6, "k3vp52"),
    (89.99999999, 0, 6, "upbpbp"),
    (0, 179.99999999, 6, "xbpbpb"),
    (40.390943, -75.937500, 12, "dr4jb0bn2180"),
]


@pytest.mark.parametrize("lat,lng,p,expected", ENCODE_GOLDENS)
def test_encode_goldens(lat, lng, p, expected):
    assert K.encode([lat], [lng], p)[0] == expected


# tests/GeohasherTests.cs:126-136
DECODE_GOLDENS = [
    ("ezs434y", 42.59880066, -5.57212830),
    ("9q8yyk8", 37.77442932, -122.41996765),
    ("u4png7x", 57.45643616, 9.99687195),
]


@pytest.mark.parametrize("gh,lat,lng", DECODE_GOLDENS)
def test_decode_goldens(gh, lat, lng):
    got_lat, got_lng = K.decode([gh])
    assert got_lat[0] == pytest.approx(lat, abs=5e-6)
    assert got_lng[0] == pytest.approx(lng, abs=5e-6)


# tests/GeohasherTests.cs:111-124
@pytest.mark.parametrize("inp,expected", [(-360, 0), (-540, -180), (-270, 90)])
def test_normalize_longitude_via_encode(inp, expected):
    assert K.encode([0], [inp], 6)[0] == K.encode([0], [expected], 6)[0]


def test_encode_lon180_equals_neg180():
    # tests/GeohasherTests.cs:39-55
    assert K.encode([0], [180], 6)[0] == K.encode([0], [-180], 6)[0]


def test_encode_nan_raises():
    with pytest.raises(ValueError):
        K.encode([np.nan], [0], 6)
    with pytest.raises(ValueError):
        K.encode([0], [np.nan], 6)


def test_encode_bad_precision_raises():
    with pytest.raises(ValueError):
        K.encode([0], [0], 13)
    with pytest.raises(ValueError):
        K.encode([0], [0], 0)


# tests/GeohasherTests.cs:208-224
def test_children_golden():
    expected = [
        "s0000", "s0001", "s0002", "s0003", "s0004", "s0005", "s0006", "s0007",
        "s0008", "s0009", "s000b", "s000c", "s000d", "s000e", "s000f", "s000g",
        "s000h", "s000j", "s000k", "s000m", "s000n", "s000p", "s000q", "s000r",
        "s000s", "s000t", "s000u", "s000v", "s000w", "s000x", "s000y", "s000z",
    ]
    assert K.children("s000") == expected


def test_children_validation():
    with pytest.raises(ValueError):
        K.children("")
    with pytest.raises(ValueError):
        K.children("abcdefghijkl")  # precision 12 has no children


def test_parent():
    assert K.parent("dr5reg") == "dr5re"
    with pytest.raises(ValueError):
        K.parent("s")  # tests/GeohasherTests.cs:58-61


def test_is_valid():
    good = ["s", "dr5reg", "DR5REG", "0123456789bc"]
    bad = ["", "invalid1", "a?b%c^d", "1234567890123", "aaa"]
    assert K.is_valid(good).tolist() == [True, True, True, True]
    assert K.is_valid(bad).tolist() == [False, False, False, False, False]


def test_decode_validation():
    for bad in ["", "1234567890123", "invalid1", "a?b%c^d"]:
        with pytest.raises(ValueError):
            K.decode([bad])


# --- neighbors (tests/GeohasherTests.cs:17-109) ---
def test_west_neighbor_wraps_antimeridian():
    west = K.neighbor(["8"], "w")[0]
    _, lng = K.decode([west])
    assert lng[0] > 0


def test_north_then_south_returns_near_original():
    orig = K.encode([89.5], [45], 3)[0]
    north = K.neighbor([orig], "n")[0]
    back = K.neighbor([north], "s")[0]
    lat_o, _ = K.decode([orig])
    lat_b, _ = K.decode([back])
    assert abs(lat_o[0] - lat_b[0]) < 10


def test_pole_bounce():
    near_n = K.encode([89.9], [0], 4)[0]
    lat, _ = K.decode([K.neighbor([near_n], "n")[0]])
    assert lat[0] > 0
    near_s = K.encode([-89.9], [0], 4)[0]
    lat, _ = K.decode([K.neighbor([near_s], "s")[0]])
    assert lat[0] < 0


def test_neighbor_accepts_reference_enum_names():
    # src/Direction.cs:11-39 names (North, NorthEast, ...) alias the short codes
    for full, short in [("north", "n"), ("northeast", "ne"), ("NorthEast", "ne"),
                        ("south_west", "sw"), ("East", "e")]:
        assert K.neighbor(["dr5reg"], full)[0] == K.neighbor(["dr5reg"], short)[0]


def test_neighbor_scalar_string_input():
    # reference Decode/Neighbor take a single string (src/Geohasher.cs:108)
    assert K.neighbor("dr5reg", "n")[0] == K.neighbor(["dr5reg"], "n")[0]
    lat, lng = K.decode("dr5reg")
    lat2, lng2 = K.decode(["dr5reg"])
    assert lat[0] == lat2[0] and lng[0] == lng2[0]


def test_neighbors_all_eight():
    result = K.neighbors(["dr5reg"])
    assert set(result.keys()) == set(K.DIRECTIONS)
    # interior cell: all neighbors distinct from source and each other
    vals = [result[d][0] for d in K.DIRECTIONS]
    assert len(set(vals)) == 8 and "dr5reg" not in vals


def test_bounding_box_midpoint_is_decode():
    min_lat, min_lng, max_lat, max_lng = K.bounding_box(["u4png7x"])
    lat, lng = K.decode(["u4png7x"])
    assert (min_lat + max_lat)[0] * 0.5 == lat[0]
    assert (min_lng + max_lng)[0] * 0.5 == lng[0]


def test_roundtrip_encode_decode_identity():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-90, 90, 2000)
    lng = rng.uniform(-180, 180, 2000)
    for p in (1, 5, 9, 12):
        gh = K.encode(lat, lng, p)
        gh2 = K.encode(*K.decode(gh), p)
        assert (gh == gh2).all()


@settings(max_examples=300, deadline=None)
@given(
    lat=st.floats(min_value=-91, max_value=91, allow_nan=False),
    lng=st.floats(min_value=-1000, max_value=1000, allow_nan=False),
    p=st.integers(min_value=1, max_value=12),
)
def test_encode_matches_reference_halving(lat, lng, p):
    """The integer-path encode must agree with the reference's
    midpoint-halving algorithm everywhere (src/Geohasher.cs:76-102)."""
    assert K.encode([lat], [lng], p)[0] == _encode_halving(lat, lng, p)


def test_encode_matches_halving_bulk_random():
    rng = np.random.default_rng(12345)
    lat = rng.uniform(-90, 90, 5000)
    lng = rng.uniform(-540, 540, 5000)
    got = K.encode(lat, lng, 12)
    for i in range(0, 5000, 7):  # sampled cross-check (halving twin is slow)
        assert got[i] == _encode_halving(lat[i], lng[i], 12)


def test_encode_exact_cell_boundaries():
    """Values exactly on dyadic cell boundaries go to the upper cell
    (the '>= mid' rule, src/Geohasher.cs:84,90)."""
    for p in (1, 4, 6, 9, 12):
        lat_step, lng_step = K.lat_lng_steps(p)
        lats = np.array([0.0, lat_step * 3, -lat_step * 5, 90.0, -90.0])
        lngs = np.array([0.0, lng_step * 7, -lng_step * 2, 180.0 - lng_step, -180.0])
        got = K.encode(lats, lngs, p)
        want = [_encode_halving(a, b, p) for a, b in zip(lats, lngs)]
        assert got.tolist() == want
