"""Compressor kernel goldens from /root/reference/tests/GeohashCompressorTests.cs."""

import time

import numpy as np
import pytest

from geohash_dotnet_spark.kernels import children, compress, encode


def test_no_compression_possible():
    # GeohashCompressorTests.cs:12-25
    assert compress(["wbcd", "wbce", "wbcf", "wxyz"]) == ["wbcd", "wbce", "wbcf", "wxyz"]


def test_empty_input():
    assert compress([]) == []


def test_32_siblings_merge_to_parent():
    # GeohashCompressorTests.cs:57-76
    siblings = children("tdnu2")
    assert compress(siblings) == ["tdnu2"]


def test_1024_grandchildren_merge_to_grandparent():
    # GeohashCompressorTests.cs:89-110
    hashes = [g for c in children("y") for g in children(c)]
    assert compress(hashes) == ["y"]


def test_real_subhashes_merge():
    # GeohashCompressorTests.cs:113-128
    assert compress(children("u4pruydqqv")) == ["u4pruydqqv"]


def test_short_geohashes_kept_as_is():
    # GeohashCompressorTests.cs:131-146
    assert sorted(compress(["y0", "z1"], min_level=2)) == ["y0", "z1"]


def test_long_geohashes_truncated():
    # GeohashCompressorTests.cs:149-163
    result = compress(["bcdefg", "bcdekj"], max_level=4)
    assert all(len(g) <= 4 for g in result)
    assert "bcde" in result


def test_varying_lengths():
    # GeohashCompressorTests.cs:166-186
    hashes = children("y0") + ["y1"]
    assert sorted(compress(hashes)) == ["y0", "y1"]


def test_min_level_geohashes():
    # GeohashCompressorTests.cs:232-248
    assert sorted(compress(["d", "e", "f"], min_level=1)) == ["d", "e", "f"]


def test_duplicates():
    # GeohashCompressorTests.cs:252-266
    assert sorted(compress(["y000", "y000", "y001"])) == ["y000", "y001"]


def test_prune_child_if_parent_exists():
    # GeohashCompressorTests.cs:268-284
    result = compress(["y0", "y01", "z2"])
    assert sorted(result) == ["y0", "z2"]


def test_real_183_hashes_compress_to_152():
    # GeohashCompressorTests.cs:42-54 with the 183-hash set at :292-316
    # (the reference asserts the compressed output has exactly 152 cells)
    hashes = _real_183()
    result = compress(hashes)
    assert len(result) == 152
    assert compress(result) == result  # idempotent


def test_output_ordinally_sorted():
    result = compress(["z1", "y0", "b2", "09"])
    assert result == sorted(result)


def test_null_raises():
    with pytest.raises(ValueError):
        compress(None)


def test_invalid_hash_raises():
    with pytest.raises(ValueError):
        compress(["y0", "a1"])  # 'a' not in base-32


def test_performance_10k_random_p9_under_2s():
    # GeohashCompressorTests.cs:188-214 (reference bound: < 2,000 ms)
    rng = np.random.default_rng(12345)
    lat = rng.uniform(-90, 90, 10_000)
    lon = rng.uniform(-180, 180, 10_000)
    hashes = encode(lat, lon, 9).tolist()
    t0 = time.perf_counter()
    compress(hashes)
    assert time.perf_counter() - t0 < 2.0


def _real_183():
    # the 183-geohash scattered set from GeohashCompressorTests.cs:292-316
    return (
        "u2uk u2fm u2c7 u2gw u2dx u2gv u2gu u2um u2u4 u2f7 u349 u2gh u350 u2dq "
        "u2dh u2cu u2f4 u34b u2cd u2u7 u2sx u2cs u2ff u2c3 u2sq u2fh u2sw u2c6 "
        "u2en u31b u2sz u2f0 u2cg u2fv u2bv u2g5 u2sh u2bu u2fr u2ch u2cm u2gn "
        "u2gm u2bt u2cx u2c2 u2g8 u2ub u2dr u2u1 u2cv u2gy u2fe u2cb u29x u2ge "
        "u2u3 u2fz u2gf u2u6 u2gk u2gd u2dj u2fy u2g4 u2sj u2v4 u2fu u2ft u2fw "
        "u352 u2un u343 u2g7 u2gr u2uj u2ue u2g2 u2dk u2gq u2ud u2er u2u9 u2ct "
        "u2ez u2dy u2sr u348 u2f3 u2ey u2g6 u2cf u2dn u2fd u2ep u2gg u2f9 u2gb "
        "u2ug u2gp u2em u2sn u29w u342 u2dp u2ce u2ew u34c u2gj u2ev u29y u2fg "
        "u2cw u2g1 u2bg u2cz u2v5 u2c9 u2v3 u2f8 u2fk u2gs u2fq u2f2 u318 u2bs "
        "u2uc u2c4 u2f1 u2cc u340 u2v0 u341 u29z u2dm u2dt u2f5 u2ck u2g9 u2sm "
        "u2cq u2dw u2fb u351 u2c8 u2u2 u29u u2cn u2u5 u2sp u2fn u2v6 u2eq u2gc "
        "u2uf u2uh u2cr u2fp u2v1 u2c5 u2u0 u2fs u2c1 u2fc u29v u346 u2gx u2u8 "
        "u2g0 u2us u2cy u2fx u2dz u2by u2uu u2fj u34d u2g3 u2cj u2f6 u2gt u2et "
        "u2ex"
    ).split()
